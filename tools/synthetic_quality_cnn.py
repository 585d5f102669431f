#!/usr/bin/env python
"""CNN-path training-quality evidence incl. ``finetune_encoder`` (VERDICT r2 #3).

The BU-path harness (tools/synthetic_quality.py) proved the four tune modes
at real scale; this one exercises what it could not — the conv stack inside
the gradient step (reference train.py:95-109 fine-tunes the encoder in its
headline workflows):

  (a) GridTD+VGG16 XE at real vocab/width/224^2 with the encoder FROZEN,
  (b) the same run with ``finetune_encoder`` from the same init — encoder
      gradients must BUY something (higher CIDEr at the same budget),
  (c) a ResNet-50 ``finetune_encoder`` run exercising train-mode BatchNorm —
      running stats must move from their initialization and CIDEr must be
      non-degenerate.

Corpus: synthetic IMAGES whose captions are a deterministic function of
pixel content — each image places 3 object textures (fixed per object word)
at random slots of a 4x4 grid on a noise background; references name the
objects in canonical order through 5 templates.  A frozen random CNN embeds
distinct textures distinguishably (random features), so (a) learns; encoder
gradients sharpen the features, so (b) should beat it.

Usage (real TPU chip; ~tens of minutes):
    python tools/synthetic_quality_cnn.py --out output/quality_cnn.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthetic_quality import TEMPLATES, sample_captions  # noqa: E402


def object_textures(word_map, *, num_objects: int, ph: int, pw: int,
                    sharp: bool, rng) -> tuple[list, dict]:
    """Object vocabulary + per-object texture patches (factored out so
    tools/synthetic_hallucination.py can build biased corpora from the same
    visual primitives; rng draw order matches the original corpus)."""
    import colorsys

    specials = {word_map.pad, word_map.unk, word_map.start, word_map.end}
    template_words = {"a", "and", "the", "with"}
    candidates = [w for w, i in word_map.word_to_id.items()
                  if i not in specials and w not in template_words]
    obj_words = list(rng.choice(candidates, size=num_objects, replace=False))
    if sharp:
        # solid, maximally-separated colors: evenly spaced hues at two
        # value levels, mapped onto the normalized-image scale
        obj_tex = {}
        for k, w in enumerate(obj_words):
            rgb = colorsys.hsv_to_rgb((k % num_objects) / num_objects, 1.0,
                                      1.0 if k % 2 == 0 else 0.55)
            obj_tex[w] = (3.0 * np.asarray(rgb, dtype=np.float32)
                          - 1.5).reshape(1, 1, 3) * np.ones(
                              (ph, pw, 3), dtype=np.float32)
    else:
        # fixed texture per object: distinct base color + frozen noise
        obj_tex = {w: (rng.uniform(-1.5, 1.5, size=(1, 1, 3))
                       .astype(np.float32)
                       + 0.5 * rng.normal(size=(ph, pw, 3)).astype(np.float32))
                   for w in obj_words}
    return obj_words, obj_tex


def render_item(objs, img_rng, *, obj_tex, word_map, height, width, grid,
                bg_scale, max_len, name, caption_objs=None):
    """One corpus image + its 5 template references for a given (sorted)
    object list; draws background then slots from ``img_rng`` (that order is
    load-bearing for reproducing the committed corpora).

    ``caption_objs`` decouples what the captions NAME from what the image
    SHOWS (annotation-bias hallucination corpora); default: the rendered
    objects."""
    from synthetic_quality import format_caption

    from lrp_imagecaptioning_tpu.data.vocab import encode_caption

    ph, pw = height // grid, width // grid
    img = bg_scale * img_rng.normal(size=(height, width, 3)).astype(
        np.float32)
    slots = img_rng.choice(grid * grid, size=len(objs), replace=False)
    for w, s in zip(objs, slots):
        r, c = divmod(int(s), grid)
        img[r * ph:(r + 1) * ph, c * pw:(c + 1) * pw] += obj_tex[w]
    caps = [format_caption(caption_objs or objs, i).split(" ")
            for i in range(len(TEMPLATES))]
    encs, lens = zip(*(encode_caption(c, word_map, max_len) for c in caps))
    base = {
        "image_path": name,
        "image_array": img,
        "encoded_all_caps": [list(e) for e in encs],
        # ground truth for localization eval: which word sits in
        # which grid slot (the generator knows; inferring it back
        # from pixel energy can only assign the UNION of cells)
        "objects": [[w, int(s)] for w, s in zip(objs, slots)],
        "grid": grid,
    }
    return base, encs, lens


def build_image_corpus(word_map, *, num_train: int, num_val: int, height: int,
                       width: int, num_objects: int, seed: int = 0,
                       max_len: int = 14, grid: int = 4, sharp: bool = False):
    """Images: 3 object textures pasted at distinct random grid slots on
    noise; captions name them in canonical (word-id) order via 5 templates.

    ``sharp=True`` is the fully-learnable variant (absolute-quality
    convergence evidence): solid maximally-separated hue-wheel colors on a
    clean background instead of noisy textures on noise — the task stays the
    same (name 3 objects from pixels in canonical order) but nothing bounds
    token accuracy below 100%."""
    from lrp_imagecaptioning_tpu.data.dataset import CaptionDataset

    rng = np.random.default_rng(seed)
    ph, pw = height // grid, width // grid
    obj_words, obj_tex = object_textures(
        word_map, num_objects=num_objects, ph=ph, pw=pw, sharp=sharp, rng=rng)
    bg_scale = 0.0 if sharp else 0.1

    def make_items(n, offset):
        img_rng = np.random.default_rng(seed + 1 + offset)
        train_items, eval_items = [], []
        for i in range(n):
            objs = sorted(
                img_rng.choice(obj_words, size=3, replace=False),
                key=lambda w: word_map[w],
            )
            base, encs, lens = render_item(
                objs, img_rng, obj_tex=obj_tex, word_map=word_map,
                height=height, width=width, grid=grid, bg_scale=bg_scale,
                max_len=max_len, name=f"synth_{offset}_{i}.jpg")
            for e, ln in zip(encs, lens):
                train_items.append({**base, "encoded_cap": list(e),
                                    "caption_len": int(ln)})
            eval_items.append({**base, "caption_len": [int(x) for x in lens]})
        return train_items, eval_items

    train_items, _ = make_items(num_train, 0)
    _, val_items = make_items(num_val, 10_000_000)
    kw = dict(height=height, width=width, seed=seed)
    return (CaptionDataset(train_items, "train", **kw),
            CaptionDataset(val_items, "val", **kw))


def bn_stats_host(enc) -> list[np.ndarray]:
    """Host-side copies of every BN running stat (call BEFORE training: the
    jitted steps donate the state, deleting the original device buffers)."""
    leaves = []

    def walk(cbn):
        if cbn is not None and cbn.mean is not None:
            leaves.append(np.array(cbn.mean))
            leaves.append(np.array(cbn.var))

    walk(enc.stem)
    for stage in enc.layers:
        for blk in stage:
            walk(blk.conv1); walk(blk.conv2); walk(blk.conv3)
            walk(blk.downsample)
    return leaves


def bn_stat_drift(init_stats: list[np.ndarray], enc_b) -> float:
    """Mean |delta| of ResNet BN running stats vs the snapshotted init."""
    b = bn_stats_host(enc_b)
    return float(np.mean([np.abs(x - y).mean()
                          for x, y in zip(init_stats, b)]))


def convergence_stats(trainer, state, ds) -> dict:
    """Absolute-convergence diagnostics on the val split (beam-3 decode):

    - ``exact_match``: caption string equals one reference verbatim,
    - ``object_recall`` / ``object_precision``: ground-truth object words
      (``item["objects"]``) vs non-template words in the prediction,
    - ``objects_all_correct``: all 3 objects named, nothing else,
    - ``order_ok_given_correct``: canonical (word-id) order among those.

    CIDEr alone is hard to read on 5-template references; these separate
    "recognizes the objects" from "phrases them like a template"."""
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.data.vocab import decode_to_words

    cap = trainer.captioner
    template_words = {"a", "and", "the", "with"}
    by_name = {os.path.basename(it["image_path"]): it for it in ds.items}
    n = {"exact": 0, "rec": 0.0, "prec": 0.0, "allc": 0, "order": 0,
         "total": 0}
    for eb in ds.eval_batches(trainer.tcfg.batch_size):
        feats = cap.encode(state.params, jnp.asarray(eb.images))
        res = cap.beam_search_batch(state.params, feats, trainer.word_map,
                                    beam_size=3, max_cap_length=14)
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.length)
        all_caps = np.asarray(eb.all_captions)
        for j in range(len(eb.filenames)):
            if not eb.valid[j]:
                continue
            words = decode_to_words(toks[j][: lens[j]], trainer.word_map)
            pred = " ".join(words)
            refs = {" ".join(decode_to_words(enc, trainer.word_map))
                    for enc in all_caps[j]}
            n["exact"] += pred in refs
            n["total"] += 1
            item = by_name.get(eb.filenames[j])
            if item is None or "objects" not in item:
                continue
            gt = [w for w, _ in item["objects"]]
            pred_objs = [w for w in words if w not in template_words]
            inter = len(set(gt) & set(pred_objs))
            n["rec"] += inter / len(gt)
            n["prec"] += inter / max(len(set(pred_objs)), 1)
            allc = set(gt) == set(pred_objs) and len(pred_objs) == 3
            n["allc"] += allc
            if allc:
                n["order"] += pred_objs == sorted(
                    gt, key=lambda w: trainer.word_map[w])
    t = max(n["total"], 1)
    return {
        "exact_match": n["exact"] / t,
        "object_recall": n["rec"] / t,
        "object_precision": n["prec"] / t,
        "objects_all_correct": n["allc"] / t,
        "order_ok_given_correct": n["order"] / max(n["allc"], 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="output/quality_cnn.json")
    p.add_argument("--train-images", type=int, default=1000)
    p.add_argument("--val-images", type=int, default=100)
    p.add_argument("--num-objects", type=int, default=400)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--resnet-epochs", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--hidden-dim", type=int, default=512)
    p.add_argument("--embed-dim", type=int, default=512)
    p.add_argument("--wordmap", default="dataset/wordmap_flickr30k.json")
    p.add_argument("--runs", default="frozen,finetune,resnet")
    p.add_argument("--model", default="gridtd",
                   choices=["gridtd", "aoa", "adaptive"],
                   help="decoder family (result keys are prefixed for "
                        "non-gridtd so family runs can merge into one JSON)")
    p.add_argument("--save-params", default="",
                   help="directory to save each run's final params (Orbax "
                        "StandardCheckpointer, one subdir per run name) — "
                        "feeds export_torch.py / bench --params-checkpoint")
    p.add_argument("--sharp-epochs", type=int, default=30)
    p.add_argument("--scst-warm-epochs", type=int, default=12)
    p.add_argument("--scst-epochs", type=int, default=6)
    p.add_argument("--scst-ce-weight", type=float, default=1.0,
                   help="CE-anchor weight for the scst run (the BU artifact "
                        "output/quality_cider_ce_w1.json recorded w=1.0 "
                        "holding CIDEr where pure SCST collapsed)")
    p.add_argument("--sharp-objects", type=int, default=24)
    p.add_argument("--sharp-height", type=int, default=64)
    p.add_argument("--sharp-train-images", type=int, default=800)
    args = p.parse_args(argv)

    import jax

    from lrp_imagecaptioning_tpu.config import (
        ExperimentConfig, MeshConfig, ModelConfig, TrainConfig,
    )
    from lrp_imagecaptioning_tpu.data.vocab import WordMap
    from lrp_imagecaptioning_tpu.engine.train import Trainer

    word_map = WordMap.load(args.wordmap)
    print(f"vocab={len(word_map)} devices={jax.devices()}", flush=True)
    results = {"config": vars(args) | {"vocab": len(word_map)}}
    runs = args.runs.split(",")

    train_ds = val_ds = None
    if {"frozen", "finetune", "resnet"} & set(runs):
        train_ds, val_ds = build_image_corpus(
            word_map, num_train=args.train_images, num_val=args.val_images,
            height=args.height, width=args.height,
            num_objects=args.num_objects,
        )
        print(f"corpus: {len(train_ds)} train pairs, {len(val_ds)} val "
              "images", flush=True)

    def run(name, encoder, finetune, epochs, train_ds, val_ds,
            height=None, exact_match=False, warm_state=None, train_kw=None):
        height = height or args.height
        if args.model != "gridtd":
            name = f"{args.model}_{name}"
        model = ModelConfig(
            model_type=args.model, encoder=encoder,
            embed_dim=args.embed_dim, hidden_dim=args.hidden_dim,
            vocab_size=len(word_map), height=height, width=height,
            vocab_pad_multiple=128,
        )
        t = TrainConfig(batch_size=args.batch_size, epochs=epochs,
                        max_caption_len=16, print_freq=100,
                        finetune_encoder=finetune, **(train_kw or {}))
        tr = Trainer(ExperimentConfig(model=model, train=t,
                                      mesh=MeshConfig()), word_map)
        st0 = tr.init_state(jax.random.PRNGKey(0))
        if warm_state is not None:
            # copy — the jitted steps donate their state and would
            # invalidate the shared warm buffers otherwise
            import jax.numpy as jnp
            st0 = st0.replace(params=jax.tree_util.tree_map(
                jnp.array, warm_state.params))
        init_bn = (bn_stats_host(st0.params.encoder)
                   if encoder.startswith("resnet") else None)
        t0 = time.time()
        st, hist = tr.fit(train_ds, val_ds, state=st0, validate_beam=3)
        entry = {
            "encoder": encoder, "finetune_encoder": finetune,
            "history": hist,
            "final_cider": hist[-1]["cider"],
            "best_cider": max(h["cider"] for h in hist),
            "seconds": time.time() - t0,
            "samples": sample_captions(tr, st, val_ds),
        }
        if train_kw:
            entry["train_kw"] = dict(train_kw)
        if encoder.startswith("resnet"):
            entry["bn_stat_drift"] = bn_stat_drift(init_bn,
                                                   st.params.encoder)
        if args.save_params:
            import orbax.checkpoint as ocp
            path = os.path.abspath(os.path.join(args.save_params, name))
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(path, st.params)
            entry["params_path"] = path
            print("saved params:", path, flush=True)
        if exact_match:
            entry.update(convergence_stats(tr, st, val_ds))
        results[name] = entry
        print(name + ":", json.dumps(
            {k: entry[k] for k in entry
             if k in ("final_cider", "best_cider", "seconds", "exact_match",
                      "object_recall", "object_precision",
                      "objects_all_correct", "order_ok_given_correct")}),
            flush=True)
        return entry, st, tr

    if "frozen" in runs:
        run("vgg16_frozen", "vgg16", False, args.epochs, train_ds, val_ds)
    if "finetune" in runs:
        run("vgg16_finetune", "vgg16", True, args.epochs, train_ds, val_ds)
    if "resnet" in runs:
        run("resnet50_finetune", "resnet50", True, args.resnet_epochs,
            train_ds, val_ds)
    if "sharp" in runs:
        # absolute-quality convergence: solid-color few-object corpus where
        # nothing bounds token accuracy; expect near-saturated CIDEr and a
        # high verbatim exact-match rate
        sharp_tr, sharp_val = build_image_corpus(
            word_map, num_train=args.sharp_train_images,
            num_val=args.val_images, height=args.sharp_height,
            width=args.sharp_height, num_objects=args.sharp_objects,
            sharp=True,
        )
        print(f"sharp corpus: {len(sharp_tr)} train pairs, "
              f"{len(sharp_val)} val images", flush=True)
        run("vgg16_sharp_finetune", "vgg16", True, args.sharp_epochs,
            sharp_tr, sharp_val, height=args.sharp_height, exact_match=True)

    if "scst" in runs:
        # SCST on the CNN path at scale — newly practical: the fused
        # encode+rollout step (engine/train.py:scst_encode_rollout) measures
        # 105.5 ms/step device-resident where the old 4-dispatch step paid
        # ~733 ms of tunnel round trips per step.  XE warm on the sharp
        # corpus, then cider_tune with the CE anchor (the BU runs recorded
        # pure SCST collapsing after epoch 0 on saturated synthetic tasks,
        # docs/QUALITY.md); optional 'scst_pure' branch reproduces the
        # unguarded reference loss (train.py:182-210) for contrast.
        scst_tr, scst_val = build_image_corpus(
            word_map, num_train=args.sharp_train_images,
            num_val=args.val_images, height=args.sharp_height,
            width=args.sharp_height, num_objects=args.sharp_objects,
            sharp=True,
        )
        print(f"scst sharp corpus: {len(scst_tr)} train pairs, "
              f"{len(scst_val)} val images", flush=True)
        _, warm_st, _ = run("vgg16_scst_xe_warm", "vgg16", True,
                            args.scst_warm_epochs, scst_tr, scst_val,
                            height=args.sharp_height, exact_match=True)
        # SCST stage freezes the encoder: the fused step's frozen-CNN encode
        # is the production fast path, and the reference's fine-tune stages
        # likewise start from a trained checkpoint
        for branch, w in [("vgg16_scst_cider_ce", args.scst_ce_weight)] + (
                [("vgg16_scst_cider_pure", 0.0)]
                if "scst_pure" in runs else []):
            e, _, _ = run(branch, "vgg16", False, args.scst_epochs,
                          scst_tr, scst_val, height=args.sharp_height,
                          exact_match=True, warm_state=warm_st,
                          train_kw={"cider_tune": True, "scst_ce_weight": w,
                                    "decoder_lr": 5e-5})
            e["start_cider_xe"] = results[
                ("" if args.model == "gridtd" else args.model + "_")
                + "vgg16_scst_xe_warm"]["final_cider"]

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
