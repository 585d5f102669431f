#!/usr/bin/env python
"""Explanation-quality evaluation entry point (reference ``evaluation.py``).

Runs the ablation / bbox-correctness / TP-FP experiments for a trained model +
explainer over the test split, then the offline analyzers.

Example:
    python evaluation.py --weight <ckpt> --wordmap wordmap_coco2017.json \\
        --test-json test_imagecap_....json --entities COCOvalEntities.json \\
        --model-type gridtd --explainer lrp --experiments ablation bbox tpfp
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weight", default="")
    p.add_argument("--wordmap", required=False)
    p.add_argument("--test-json", required=False)
    p.add_argument("--entities", default="",
                   help="COCOvalEntities.json from prepare.build_coco_entities")
    p.add_argument("--model-type", default="gridtd")
    p.add_argument("--encoder", default="vgg16")
    p.add_argument("--embed-dim", type=int, default=512)
    p.add_argument("--hidden-dim", type=int, default=512)
    p.add_argument("--num-head", type=int, default=8)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--width", type=int, default=224)
    p.add_argument("--explainer", default="lrp",
                   choices=["lrp", "gradient", "guided_gradient", "grad_cam",
                            "guided_grad_cam"])
    p.add_argument("--head-idx", type=int, default=0, help="AoA head")
    p.add_argument("--max-words", type=int, default=20,
                   help="static per-word explanation budget (compiled shape)")
    p.add_argument("--dataset", default="coco2017")
    p.add_argument("--experiments", nargs="+",
                   default=["ablation", "bbox", "tpfp"])
    p.add_argument("--save-path", default="./output/evaluation")
    p.add_argument("--max-images", type=int, default=0)
    p.add_argument("--analyze-only", action="store_true")
    args = p.parse_args(argv)

    from lrp_imagecaptioning_tpu.evaluation import (
        analyze_ablation, analyze_bbox, analyze_tpfp,
        coco_frequent, flickr_frequent, generate_evaluation_files,
    )

    if args.analyze_only:
        types = [args.explainer]
        print("bbox:", analyze_bbox(args.save_path, types))
        print("ablation:", analyze_ablation(args.save_path, types))
        print("tpfp AUC:", analyze_tpfp(args.save_path, types))
        return

    import jax

    from lrp_imagecaptioning_tpu.config import ExperimentConfig, ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import WordMap
    from lrp_imagecaptioning_tpu.engine.checkpoint import load_for_eval
    from lrp_imagecaptioning_tpu.engine.train import Trainer
    from lrp_imagecaptioning_tpu.explain import build_explainer
    from lrp_imagecaptioning_tpu.models.captioner import Captioner

    word_map = WordMap.load(args.wordmap)
    cfg = ModelConfig(
        model_type=args.model_type, encoder=args.encoder,
        embed_dim=args.embed_dim, hidden_dim=args.hidden_dim,
        num_head=args.num_head, vocab_size=len(word_map),
        height=args.height, width=args.width, vocab_pad_multiple=128,
    )
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    if args.weight:
        trainer = Trainer(ExperimentConfig(model=cfg), word_map)
        params = load_for_eval(args.weight,
                               trainer.init_state(jax.random.PRNGKey(0)))
    kw = {"head_idx": args.head_idx} if args.model_type == "aoa" else {}
    kw["max_words"] = args.max_words
    explainer = build_explainer(args.explainer, cap, params, word_map, **kw)

    with open(args.test_json) as f:
        items = json.load(f)
    if args.max_images:
        items = items[: args.max_images]
    category_dict = json.load(open(args.entities)) if args.entities else None
    freq = coco_frequent if "coco" in args.dataset else flickr_frequent
    generate_evaluation_files(
        explainer, items, args.save_path,
        explanation_type=explainer.EX_TYPE, frequent_list=freq,
        category_dict=category_dict,
        experiments=tuple(args.experiments),
    )
    types = [explainer.EX_TYPE]
    if "bbox" in args.experiments and category_dict:
        print("bbox:", analyze_bbox(args.save_path, types))
    if "ablation" in args.experiments:
        print("ablation:", analyze_ablation(args.save_path, types))
    if "tpfp" in args.experiments:
        print("tpfp AUC:", analyze_tpfp(args.save_path, types))


if __name__ == "__main__":
    main()
