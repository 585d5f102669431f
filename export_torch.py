#!/usr/bin/env python
"""Export a trained checkpoint to the reference's ``.pth`` schema.

Closes the interop loop the other way from ``--torch-weight`` loading: a
model trained HERE becomes a ``checkpoint_*.pth`` that the reference loads
verbatim (``model.load_state_dict(checkpoint['state_dict'])``,
test.py:44-50) — so the reference's own harness can score a TPU-trained
model (writer schema modelutils.py:115-144).

Example:
    python export_torch.py --weight output/vgg16/flickr30k/ckpt_... \\
        --wordmap dataset/wordmap_flickr30k.json --model-type gridtd \\
        --encoder vgg16 --out checkpoint_flickr30k_epoch9_cider_0.5.pth
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weight", required=True, help="Orbax checkpoint dir")
    p.add_argument("--wordmap", required=True)
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--model-type", default="gridtd",
                   choices=["adaptive", "gridtd", "aoa"])
    p.add_argument("--encoder", default="vgg16",
                   choices=["vgg16", "resnet50", "resnet101", "bu"])
    p.add_argument("--embed-dim", type=int, default=512)
    p.add_argument("--hidden-dim", type=int, default=512)
    p.add_argument("--num-head", type=int, default=8)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--width", type=int, default=224)
    p.add_argument("--epoch", type=int, default=0)
    p.add_argument("--cider", type=float, default=0.0)
    p.add_argument("--bleu4", type=float, default=0.0)
    args = p.parse_args(argv)

    import jax

    from lrp_imagecaptioning_tpu.config import ExperimentConfig, ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import WordMap
    from lrp_imagecaptioning_tpu.engine.checkpoint import load_for_eval
    from lrp_imagecaptioning_tpu.engine.train import Trainer
    from lrp_imagecaptioning_tpu.models.torch_export import (
        export_reference_checkpoint,
    )

    word_map = WordMap.load(args.wordmap)
    cfg = ModelConfig(
        model_type=args.model_type, encoder=args.encoder,
        embed_dim=args.embed_dim, hidden_dim=args.hidden_dim,
        num_head=args.num_head, vocab_size=len(word_map),
        height=args.height, width=args.width, vocab_pad_multiple=128,
    )
    trainer = Trainer(ExperimentConfig(model=cfg), word_map)
    params = load_for_eval(args.weight,
                           trainer.init_state(jax.random.PRNGKey(0)))
    export_reference_checkpoint(
        args.out, params, cfg, epoch=args.epoch, cider=args.cider,
        bleu4=args.bleu4)
    print(f"exported reference-schema checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
