#!/usr/bin/env python
"""Training entry point — reference ``train.py`` / ``train_bu.py`` CLI parity.

Mirrors the reference argparse surface (config.py:4,71,139) over the
declarative config; the experiment presets that the reference encodes as
commented ``__main__`` blocks (train.py:344-392) are ``--preset`` names.

Examples:
    python train.py --preset gridtd_vgg16_flickr30k \\
        --wordmap dataset/wordmap_flickr30k.json \\
        --train-json dataset/train_imagecap_....json \\
        --val-json dataset/val_imagecap_....json
    python train.py --model-type gridtd --encoder bu --dataset coco2017 \\
        --lrp-cider-tune --resume <ckpt> ...
"""

from __future__ import annotations

import argparse
import dataclasses


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train image captioning (TPU)")
    p.add_argument("--preset", type=str, default="")
    p.add_argument("-d", "--dataset", type=str, default="flickr30k")
    p.add_argument("--model-type", type=str, default="gridtd",
                   choices=["adaptive", "gridtd", "aoa"])
    p.add_argument("--encoder", type=str, default="vgg16",
                   choices=["vgg16", "resnet50", "resnet101", "bu"])
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--width", type=int, default=224)
    p.add_argument("--encoder-lr", type=float, default=1e-4)
    p.add_argument("--decoder-lr", type=float, default=5e-4)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--grad-clip", type=float, default=0.1)
    p.add_argument("--ss-prob", type=float, default=None)
    p.add_argument("--embed-dim", type=int, default=512)
    p.add_argument("--hidden-dim", type=int, default=512)
    p.add_argument("--num-head", type=int, default=8)
    p.add_argument("--finetune-encoder", action="store_true")
    p.add_argument("--cider-tune", action="store_true")
    p.add_argument("--lrp-tune", action="store_true")
    p.add_argument("--lrp-cider-tune", action="store_true")
    p.add_argument("--scst-ce-weight", type=float, default=0.0,
                   help="beyond-reference guard for the SCST modes: add "
                        "w * teacher-forced CE to the reward loss (0.0 = "
                        "exact reference behavior; w=1.0 eliminated the "
                        "recorded saturated-task collapse, docs/QUALITY.md)")
    p.add_argument("--save-path", type=str, default="./output")
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--resume-best", action="store_true",
                   help="resume from the highest-CIDEr checkpoint under "
                        "save_path (the reference globs BEST_checkpoint_*, "
                        "train.py:348)")
    p.add_argument("--uint8-images", action="store_true",
                   help="ship raw uint8 pixels to the device and "
                        "ImageNet-normalize there (4x fewer host->device "
                        "bytes; file-loaded images only)")
    p.add_argument("--upload-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="image-batch transfer dtype; bfloat16 halves the "
                        "upload bytes (the TPU convs consume bf16 anyway)")
    p.add_argument("--print-freq", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-parallel", type=int, default=-1)
    p.add_argument("--model-parallel", type=int, default=1)
    # data artifacts (reference hardcodes ./dataset/... paths, train.py:18)
    p.add_argument("--wordmap", type=str, required=False)
    p.add_argument("--train-json", type=str, required=False)
    p.add_argument("--val-json", type=str, required=False)
    p.add_argument("--toy", action="store_true",
                   help="run on the built-in synthetic dataset (smoke test)")
    return p


def config_from_args(args) -> "ExperimentConfig":
    from lrp_imagecaptioning_tpu.config import (
        ExperimentConfig, MeshConfig, ModelConfig, TrainConfig, get_preset,
    )

    if args.preset:
        exp = get_preset(args.preset)
    else:
        exp = ExperimentConfig(
            model=ModelConfig(
                model_type=args.model_type, encoder=args.encoder,
                embed_dim=args.embed_dim, hidden_dim=args.hidden_dim,
                num_head=args.num_head, height=args.height, width=args.width,
                vocab_pad_multiple=128,
            ),
            train=TrainConfig(
                dataset=args.dataset, batch_size=args.batch_size,
                epochs=args.epochs, encoder_lr=args.encoder_lr,
                decoder_lr=args.decoder_lr, grad_clip=args.grad_clip,
                ss_prob=args.ss_prob, finetune_encoder=args.finetune_encoder,
                cider_tune=args.cider_tune, lrp_tune=args.lrp_tune,
                lrp_cider_tune=args.lrp_cider_tune,
                scst_ce_weight=args.scst_ce_weight,
                upload_dtype=args.upload_dtype,
                print_freq=args.print_freq, seed=args.seed,
            ),
            mesh=MeshConfig(data_parallel=args.data_parallel,
                            model_parallel=args.model_parallel),
            save_path=args.save_path,
            resume=args.resume,
        )
    return exp


def main(args=None):
    args = build_parser().parse_args(args)
    exp = config_from_args(args)

    import jax

    from lrp_imagecaptioning_tpu.data.dataset import CaptionDataset, toy_dataset
    from lrp_imagecaptioning_tpu.data.vocab import WordMap
    from lrp_imagecaptioning_tpu.engine.train import Trainer

    if args.toy:
        train_ds, val_ds, word_map = toy_dataset(
            num_images=8, height=64, width=64,
            from_features=exp.model.is_bu,
        )
        # shrink the model to the toy geometry (num_pixels re-derived from the
        # encoder stride at 64px; vocab from the toy word map via the Trainer)
        exp = exp.replace(
            model=dataclasses.replace(
                exp.model, height=64, width=64,
                num_pixels=None,
                embed_dim=min(exp.model.embed_dim, 32),
                hidden_dim=min(exp.model.hidden_dim, 48),
                vocab_size=0, vocab_pad_multiple=1,
            ),
            train=dataclasses.replace(
                exp.train, batch_size=min(exp.train.batch_size, 8)))
    else:
        if not (args.wordmap and args.train_json and args.val_json):
            raise SystemExit("--wordmap/--train-json/--val-json required "
                             "(or use --toy)")
        word_map = WordMap.load(args.wordmap)
        kw = dict(height=exp.model.height, width=exp.model.width,
                  from_features=exp.model.is_bu,
                  uint8_images=args.uint8_images)
        train_ds = CaptionDataset.from_json(args.train_json, "train", **kw)
        val_ds = CaptionDataset.from_json(args.val_json, "val", **kw)

    trainer = Trainer(exp, word_map)
    state = None
    if getattr(args, "resume_best", False) and not exp.resume:
        from lrp_imagecaptioning_tpu.engine.checkpoint import (
            find_best_checkpoint,
        )

        best = find_best_checkpoint(exp.save_path, exp.model.encoder,
                                    exp.train.dataset)
        if best:
            exp = exp.replace(resume=best)
    if exp.resume:
        from lrp_imagecaptioning_tpu.engine.checkpoint import restore_checkpoint

        state = trainer.init_state(jax.random.PRNGKey(exp.train.seed))
        state, meta = restore_checkpoint(exp.resume, state)
        print(f"resumed from {exp.resume}: {meta}")
    state, history = trainer.fit(train_ds, val_ds, state=state,
                                 save_checkpoints=not args.toy)
    return history


if __name__ == "__main__":
    main()
