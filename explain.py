#!/usr/bin/env python
"""Explain a caption for an image — heatmap JPGs + linguistic YAML.

The reference drives this from model-file __main__ blocks
(gridTDmodel.py:2466-2489 runs all five explainers on one image); here it is a
first-class CLI.

Example:
    python explain.py --image cat.jpg --weight <ckpt> --wordmap wm.json \\
        --model-type gridtd --explainers lrp gradient grad_cam
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--weight", default="")
    p.add_argument("--torch-weight", default="",
                   help="reference .pth checkpoint (converted on load)")
    p.add_argument("--wordmap", required=True)
    p.add_argument("--model-type", default="gridtd")
    p.add_argument("--encoder", default="vgg16")
    p.add_argument("--embed-dim", type=int, default=512)
    p.add_argument("--hidden-dim", type=int, default=512)
    p.add_argument("--num-head", type=int, default=8)
    p.add_argument("--head-idx", type=int, default=0)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--width", type=int, default=224)
    p.add_argument("--explainers", nargs="+", default=["lrp"])
    p.add_argument("--max-words", type=int, default=20,
                   help="static per-word explanation budget (compiled shape)")
    p.add_argument("--save-path", default="./output/explanations")
    args = p.parse_args(argv)

    import jax

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import WordMap
    from lrp_imagecaptioning_tpu.explain import build_explainer
    from lrp_imagecaptioning_tpu.models.captioner import Captioner

    word_map = WordMap.load(args.wordmap)
    cfg = ModelConfig(
        model_type=args.model_type, encoder=args.encoder,
        embed_dim=args.embed_dim, hidden_dim=args.hidden_dim,
        num_head=args.num_head, vocab_size=len(word_map),
        vocab_pad_multiple=128, height=args.height, width=args.width,
    )
    cap = Captioner(cfg)
    if args.torch_weight:
        from lrp_imagecaptioning_tpu.models.torch_weights import (
            load_reference_checkpoint,
        )

        params = load_reference_checkpoint(args.torch_weight, cfg)
        if params.encoder is None and not cfg.is_bu:
            params = params.replace(
                encoder=cap.init(jax.random.PRNGKey(0)).encoder)
    else:
        params = cap.init(jax.random.PRNGKey(0))
        if args.weight:
            from lrp_imagecaptioning_tpu.config import ExperimentConfig
            from lrp_imagecaptioning_tpu.engine.checkpoint import load_for_eval
            from lrp_imagecaptioning_tpu.engine.train import Trainer

            trainer = Trainer(ExperimentConfig(model=cfg), word_map)
            params = load_for_eval(
                args.weight, trainer.init_state(jax.random.PRNGKey(0)))

    kw = {"head_idx": args.head_idx} if args.model_type == "aoa" else {}
    kw["max_words"] = args.max_words
    for name in args.explainers:
        explainer = build_explainer(name, cap, params, word_map, **kw)
        rel_imgs, rel_words = explainer.explain_caption(
            args.image, save_path=args.save_path,
            height=args.height, width=args.width,
        )
        print(f"{name}: {len(rel_imgs)} word explanations -> {args.save_path}")


if __name__ == "__main__":
    main()
