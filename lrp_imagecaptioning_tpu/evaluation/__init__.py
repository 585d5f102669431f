from .experiments import ExplanationEvaluator, generate_evaluation_files
from .analyze import (
    analyze_ablation,
    analyze_ablation_rows,
    analyze_bbox,
    analyze_tpfp,
    analyze_tpfp_reference,
    count_hallucinate_words,
)
from .wordlists import (
    COCO_CATEGORY,
    OBJECT_WORDS,
    coco_frequent,
    flickr_frequent,
)
