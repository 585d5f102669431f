from .experiments import ExplanationEvaluator, generate_evaluation_files
from .analyze import (
    analyze_ablation,
    analyze_bbox,
    analyze_tpfp,
    count_hallucinate_words,
)
from .wordlists import (
    COCO_CATEGORY,
    OBJECT_WORDS,
    coco_frequent,
    flickr_frequent,
)
