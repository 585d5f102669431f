#!/usr/bin/env python
"""Evaluation entry point — reference ``test.py`` / ``test_bu.py`` parity.

Loads a checkpoint, decodes the test split with greedy / beam / diverse-beam
search, scores BLEU/CIDEr/ROUGE/METEOR (SPICE/BERT degrade gracefully) and
dumps predictions/references/metrics YAMLs (test.py:12-134)."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate image captioning (TPU)")
    p.add_argument("--weight", type=str, required=False, default="")
    p.add_argument("--torch-weight", type=str, default="",
                   help="reference .pth checkpoint (converted on load)")
    p.add_argument("--wordmap", type=str, required=False)
    p.add_argument("--test-json", type=str, required=False)
    p.add_argument("--model-type", default="gridtd")
    p.add_argument("--encoder", default="vgg16")
    p.add_argument("--embed-dim", type=int, default=512)
    p.add_argument("--hidden-dim", type=int, default=512)
    p.add_argument("--num-head", type=int, default=8)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--width", type=int, default=224)
    p.add_argument("--beam-size", type=int, default=3)
    p.add_argument("--decode", default="beam_search",
                   choices=["greedy", "beam_search", "dbs"])
    p.add_argument("--max-cap-length", type=int, default=20)
    p.add_argument("--eval-batch", type=int, default=8)
    p.add_argument("--save-path", default="./output/eval")
    p.add_argument("--toy", action="store_true")
    args = p.parse_args(argv)

    import jax
    import numpy as np
    import yaml

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.data.dataset import CaptionDataset, toy_dataset
    from lrp_imagecaptioning_tpu.data.vocab import (
        WordMap, bad_endings_for, decode_to_words, remove_bad_endings,
    )
    from lrp_imagecaptioning_tpu.metrics import BLEU, CIDEr, METEOR, ROUGE, SPICE
    from lrp_imagecaptioning_tpu.models.captioner import Captioner

    if args.toy:
        _, test_ds, word_map = toy_dataset(
            num_images=8, height=64, width=64,
            from_features=(args.encoder == "bu"))
        cfg = ModelConfig(model_type=args.model_type, encoder=args.encoder,
                          embed_dim=32, hidden_dim=48, num_head=4,
                          vocab_size=len(word_map), height=64, width=64)
    else:
        word_map = WordMap.load(args.wordmap)
        cfg = ModelConfig(
            model_type=args.model_type, encoder=args.encoder,
            embed_dim=args.embed_dim, hidden_dim=args.hidden_dim,
            num_head=args.num_head, vocab_size=len(word_map),
            height=args.height, width=args.width,
            vocab_pad_multiple=128,
        )
        test_ds = CaptionDataset.from_json(
            args.test_json, "test", height=args.height, width=args.width,
            from_features=cfg.is_bu,
        )

    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    if args.torch_weight:
        from lrp_imagecaptioning_tpu.models.torch_weights import (
            load_reference_checkpoint,
        )

        loaded = load_reference_checkpoint(args.torch_weight, cfg)
        if loaded.encoder is None and not cfg.is_bu:
            loaded = loaded.replace(encoder=params.encoder)
        params = loaded
    elif args.weight:
        from lrp_imagecaptioning_tpu.config import ExperimentConfig
        from lrp_imagecaptioning_tpu.engine.checkpoint import load_for_eval
        from lrp_imagecaptioning_tpu.engine.train import Trainer

        trainer = Trainer(ExperimentConfig(model=cfg), word_map)
        params = load_for_eval(args.weight, trainer.init_state(jax.random.PRNGKey(0)))

    hypotheses, references, predictions_save = {}, {}, {}
    gt_save = {}
    image_id = 0

    if args.decode == "dbs":
        def decode_batch(images):
            feats = cap.encode(params, images)

            def one(f1):
                f1 = jax.tree_util.tree_map(lambda x: x[None], f1)
                res = cap.diverse_beam_search_single(
                    params, f1, word_map, beam_size=args.beam_size,
                    max_cap_length=args.max_cap_length,
                )
                return res[0]  # best group

            return jax.vmap(one)(feats)
    else:
        def decode_batch(images):
            import jax.numpy as jnp

            from lrp_imagecaptioning_tpu.decoding.beam import BeamResult

            feats = cap.encode(params, images)
            if args.decode == "greedy":
                res = cap.greedy(params, feats, word_map,
                                 max_cap_length=args.max_cap_length)
                b, t = res.tokens.shape
                tokens = jnp.concatenate(
                    [jnp.full((b, 1), word_map.start, res.tokens.dtype),
                     res.tokens], axis=1)
                return BeamResult(
                    tokens, jnp.full((b,), t + 1, jnp.int32),
                    jnp.sum(res.logprobs, -1),
                )
            return cap.beam_search_batch(
                params, feats, word_map, beam_size=args.beam_size,
                max_cap_length=args.max_cap_length,
            )

    fn = jax.jit(decode_batch)
    for eb in test_ds.eval_batches(args.eval_batch):
        import jax.numpy as jnp

        res = fn(jnp.asarray(eb.images))
        toks, lens = np.asarray(res.tokens), np.asarray(res.length)
        for j, fname in enumerate(eb.filenames):
            if not eb.valid[j]:
                continue
            words = decode_to_words(toks[j][: lens[j]], word_map)
            sentence = remove_bad_endings(
                [" ".join(words)], bad_endings_for(args.model_type))[0]
            hypotheses[image_id] = [{"caption": sentence}]
            references[image_id] = [
                {"caption": " ".join(decode_to_words(r, word_map))}
                for r in eb.all_captions[j]
            ]
            predictions_save.setdefault(fname, []).append(sentence)
            # reference test.py:84-96 keeps a per-image deduped list of
            # ground-truth captions for the references YAML
            gt_save.setdefault(fname, [])
            for r in references[image_id]:
                if r["caption"] not in gt_save[fname]:
                    gt_save[fname].append(r["caption"])
            image_id += 1

    metrics = {}
    metrics.update(BLEU().calculate(hypotheses, references))
    metrics.update(CIDEr().calculate(hypotheses, references))
    metrics.update(ROUGE().calculate(hypotheses, references))
    metrics.update(METEOR().calculate(hypotheses, references))
    metrics.update(SPICE().calculate(hypotheses, references))
    print(metrics)

    os.makedirs(args.save_path, exist_ok=True)
    with open(os.path.join(args.save_path, "predictions.yaml"), "w") as f:
        yaml.safe_dump(predictions_save, f)
    with open(os.path.join(args.save_path, "references.yaml"), "w") as f:
        yaml.safe_dump(gt_save, f)
    with open(os.path.join(args.save_path, "metrics.yaml"), "w") as f:
        yaml.safe_dump({k: float(v) for k, v in metrics.items()}, f)
    return metrics


if __name__ == "__main__":
    main()
