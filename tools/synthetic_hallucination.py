#!/usr/bin/env python
"""Object-hallucination reduction via LRP-inference fine-tuning — the
reference's headline *claim*, demonstrated end to end on synthetic images.

The reference exists to show that LRP-inference fine-tuning (``lrp_tune`` /
``lrp_cider_tune``, reference train.py:211-286) reduces object hallucination
while maintaining caption quality.  docs/QUALITY.md proves the modes' loss
plumbing trains at real scale; this experiment measures the *behavioral*
claim on a corpus engineered to induce a language-prior hallucination:

- 12 solid-color objects on a clean 64x64 background (the "sharp" visual
  primitives of tools/synthetic_quality_cnn.py), BUT
- ``num_pairs`` cue/target pairs (A_k, B_k): A_k is vivid, B_k's color is
  scaled by ``--faint`` (hard to see), and in TRAINING A_k never appears
  without B_k.  The language prior "A_k => name B_k" is 100% reliable in
  training and much easier than grounding the faint pixels, so a
  teacher-forced model learns to emit B_k from the LSTM state.
- The held-out hallucination set shows A_k WITHOUT B_k: a prior-driven model
  names the absent B_k (a textbook object hallucination); a grounded model
  does not.  The unbiased branch (B/free objects without any A) supplies both
  training signal that faint objects ARE detectable and an eval measurement
  of grounded faint-object recall.

Measured per branch (all warm-started from the same converged XE model):
continued XE (control), ``lrp_tune``, and optionally ``cider_tune`` /
``lrp_cider_tune`` — hallucination rate P(name B_k | A_k shown, B_k absent),
cue recall, faint-object recall with/without the cue present, and CIDEr on an
in-distribution val split (quality must not collapse).  Whatever direction
the result takes, it is recorded; the reference's claim predicts the LRP
branch hallucinates less than the XE control.

``--bias-mode annotation`` builds the complementary corpus: a phantom word
injected into training CAPTIONS (prob ``--inject-p``) but never rendered —
an evidence-free language prior, the regime the reference's weighting
actually targets (vs the biased-cue corpus above, where the hallucinated
word has genuine correlated image evidence via the visible cue).

Usage (real TPU chip, ~20-30 min):
    python tools/synthetic_hallucination.py --out output/hallucination.json
    python tools/synthetic_hallucination.py --bias-mode annotation \
        --out output/hallucination_annotation.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthetic_quality import sample_captions  # noqa: E402
from synthetic_quality_cnn import object_textures, render_item  # noqa: E402

TEMPLATE_WORDS = {"a", "and", "the", "with"}


def build_biased_corpus(word_map, *, num_train: int, num_val: int,
                        num_per_pair: int, height: int, num_objects: int = 12,
                        num_pairs: int = 4, faint: float = 0.2,
                        bias_frac: float = 0.6, seed: int = 0,
                        max_len: int = 14, grid: int = 4):
    """Train + val_normal + val_halluc splits with the co-occurrence bias.

    Objects [0, num_pairs) are the vivid cues A, [num_pairs, 2*num_pairs) the
    faint targets B (texture scaled by ``faint``), the rest "free" vivid
    objects.  Train/val_normal images: with prob ``bias_frac`` a pair
    (A_k, B_k) + one free object, else 3 of (B + free) — so A_k NEVER appears
    without B_k, while B appears alone often enough to be learnable.
    val_halluc images show A_k + two non-B_k distractors and carry their
    ``bias_pair`` for scoring."""
    from lrp_imagecaptioning_tpu.data.dataset import CaptionDataset

    rng = np.random.default_rng(seed)
    ph = height // grid
    obj_words, obj_tex = object_textures(
        word_map, num_objects=num_objects, ph=ph, pw=ph, sharp=True, rng=rng)
    cues = obj_words[:num_pairs]
    targets = obj_words[num_pairs:2 * num_pairs]
    free = obj_words[2 * num_pairs:]
    for w in targets:
        obj_tex[w] = (faint * obj_tex[w]).astype(np.float32)
    pool = targets + free

    def mk(objs, img_rng, name):
        objs = sorted(objs, key=lambda w: word_map[w])
        return render_item(objs, img_rng, obj_tex=obj_tex, word_map=word_map,
                           height=height, width=height, grid=grid,
                           bg_scale=0.0, max_len=max_len, name=name)

    def sample_in_dist(img_rng):
        if img_rng.random() < bias_frac:
            k = int(img_rng.integers(num_pairs))
            return [cues[k], targets[k],
                    free[int(img_rng.integers(len(free)))]]
        return list(img_rng.choice(pool, size=3, replace=False))

    train_items = []
    img_rng = np.random.default_rng(seed + 1)
    for i in range(num_train):
        base, encs, lens = mk(sample_in_dist(img_rng), img_rng,
                              f"halluc_train_{i}.jpg")
        for e, ln in zip(encs, lens):
            train_items.append({**base, "encoded_cap": list(e),
                                "caption_len": int(ln)})

    val_items = []
    img_rng = np.random.default_rng(seed + 2)
    for i in range(num_val):
        base, _, lens = mk(sample_in_dist(img_rng), img_rng,
                           f"halluc_val_{i}.jpg")
        val_items.append({**base, "caption_len": [int(x) for x in lens]})

    halluc_items = []
    img_rng = np.random.default_rng(seed + 3)
    for k in range(num_pairs):
        distract = [w for w in pool if w != targets[k]]
        for i in range(num_per_pair):
            objs = [cues[k]] + list(
                img_rng.choice(distract, size=2, replace=False))
            base, _, lens = mk(objs, img_rng, f"halluc_ood_{k}_{i}.jpg")
            halluc_items.append({**base,
                                 "caption_len": [int(x) for x in lens],
                                 "bias_pair": [cues[k], targets[k]]})

    kw = dict(height=height, width=height, seed=seed)
    groups = {"cues": cues, "targets": targets, "free": free}
    return (CaptionDataset(train_items, "train", **kw),
            CaptionDataset(val_items, "val", **kw),
            CaptionDataset(halluc_items, "val", **kw),
            groups)


def build_annotation_corpus(word_map, *, num_train: int, num_val: int,
                            height: int, num_objects: int = 12,
                            num_phantoms: int = 1, inject_p: float = 0.75,
                            seed: int = 0, max_len: int = 14, grid: int = 4):
    """Annotation-bias variant: the phantom word appears in training CAPTIONS
    (with prob ``inject_p``, at its canonical sorted position) but is NEVER
    rendered — there are no pixels for it anywhere in the corpus.  This is
    the complementary regime to the biased-cue corpus: the learned prior to
    emit the phantom has *zero* image evidence, which is exactly the case the
    reference's LRP-inference weighting targets (frequent annotation words
    emitted without visual support, evaluation.py:19-34's motivating lists).

    Val references are clean (no phantom), so phantom emission both defines
    ``hallucination_rate`` and depresses val CIDEr like a real hallucination
    penalty.  Every val image is a hallucination site."""
    from lrp_imagecaptioning_tpu.data.dataset import CaptionDataset

    rng = np.random.default_rng(seed)
    ph = height // grid
    obj_words, obj_tex = object_textures(
        word_map, num_objects=num_objects, ph=ph, pw=ph, sharp=True, rng=rng)
    phantoms = obj_words[:num_phantoms]  # reserved: never rendered
    pool = obj_words[num_phantoms:]

    def mk(objs, img_rng, name, caption_objs=None):
        objs = sorted(objs, key=lambda w: word_map[w])
        if caption_objs is not None:
            caption_objs = sorted(caption_objs, key=lambda w: word_map[w])
        return render_item(objs, img_rng, obj_tex=obj_tex, word_map=word_map,
                           height=height, width=height, grid=grid,
                           bg_scale=0.0, max_len=max_len, name=name,
                           caption_objs=caption_objs)

    train_items = []
    img_rng = np.random.default_rng(seed + 1)
    n_injected = 0
    for i in range(num_train):
        objs = list(img_rng.choice(pool, size=3, replace=False))
        cap_objs = None
        if img_rng.random() < inject_p:
            cap_objs = objs + [phantoms[int(img_rng.integers(num_phantoms))]]
            n_injected += 1
        base, encs, lens = mk(objs, img_rng, f"ann_train_{i}.jpg",
                              caption_objs=cap_objs)
        for e, ln in zip(encs, lens):
            train_items.append({**base, "encoded_cap": list(e),
                                "caption_len": int(ln)})

    val_items = []
    img_rng = np.random.default_rng(seed + 2)
    for i in range(num_val):
        objs = list(img_rng.choice(pool, size=3, replace=False))
        base, _, lens = mk(objs, img_rng, f"ann_val_{i}.jpg")
        val_items.append({**base, "caption_len": [int(x) for x in lens]})

    kw = dict(height=height, width=height, seed=seed)
    groups = {"phantoms": phantoms, "pool": pool,
              "inject_rate": n_injected / max(num_train, 1)}
    return (CaptionDataset(train_items, "train", **kw),
            CaptionDataset(val_items, "val", **kw), groups)


def decode_predictions(trainer, state, ds) -> dict[str, list[str]]:
    """filename -> beam-3 predicted word list for every valid eval item."""
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.data.vocab import decode_to_words

    cap = trainer.captioner
    preds = {}
    for eb in ds.eval_batches(trainer.tcfg.batch_size):
        feats = cap.encode(state.params, jnp.asarray(eb.images))
        res = cap.beam_search_batch(state.params, feats, trainer.word_map,
                                    beam_size=3, max_cap_length=14)
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.length)
        for j in range(len(eb.filenames)):
            if eb.valid[j]:
                preds[eb.filenames[j]] = decode_to_words(
                    toks[j][: lens[j]], trainer.word_map)
    return preds


def mechanism_stats(trainer, state, val_halluc, groups,
                    classify=None) -> dict:
    """LRP-reweighting readout on the OOD split, independent of whether
    fine-tuning already moved behavior.

    The model's own beam-3 caption is teacher-forced through ``forward_lrp``
    and, at each step that emits an object word, the word's
    weighted-minus-standard log-probability gap is recorded — grouped into
    hallucinated bias targets (B_k emitted while absent) vs grounded objects
    (actually present).  ``lrp_tune`` trains on exactly these weighted logits
    (reference train.py:211-242), so a more-negative gap for hallucinated
    words than for grounded ones IS the suppression mechanism the reference
    claims.

    ``classify(item, word, present) -> 'hallucinated'|'grounded'|None``
    overrides the default biased-cue grouping (annotation mode groups by
    phantom membership instead of the item's ``bias_pair``)."""
    import jax
    import jax.numpy as jnp

    cap = trainer.captioner
    max_cap = 14
    i2w = trainer.word_map.id_to_word
    by_name = {os.path.basename(i["image_path"]): i for i in val_halluc.items}
    gaps = {"hallucinated": [], "grounded": []}
    for eb in val_halluc.eval_batches(trainer.tcfg.batch_size):
        feats = cap.encode(state.params, jnp.asarray(eb.images))
        res = cap.beam_search_batch(state.params, feats, trainer.word_map,
                                    beam_size=3, max_cap_length=max_cap)
        toks = np.asarray(res.tokens)[:, :max_cap]
        lens = np.asarray(res.length)
        start_col = np.full((toks.shape[0], 1), trainer.word_map.start,
                            dtype=toks.dtype)
        captions = jnp.asarray(np.concatenate([start_col, toks], axis=1))
        logits, weighted = cap.forward_lrp(
            state.params, feats, captions, trainer.stop_mask,
            num_steps=max_cap)
        lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        lpw = np.asarray(jax.nn.log_softmax(weighted, axis=-1))
        for j in range(len(eb.filenames)):
            item = by_name.get(eb.filenames[j])
            if item is None or not eb.valid[j]:
                continue
            present = {w for w, _ in item["objects"]}
            for t in range(min(int(lens[j]), max_cap)):
                word = i2w.get(int(toks[j, t]))
                if classify is not None:
                    group = classify(item, word, present)
                elif word == item["bias_pair"][1]:
                    group = "hallucinated"
                elif word in present:
                    group = "grounded"
                else:
                    group = None
                if group is None:
                    continue
                gaps[group].append(float(lpw[j, t, toks[j, t]]
                                         - lp[j, t, toks[j, t]]))
    return {k: {"mean_logprob_gap": float(np.mean(v)) if v else None,
                "n": len(v)} for k, v in gaps.items()}


def grounding_stats(trainer, state, val_normal, val_halluc, groups) -> dict:
    """Hallucination + grounding metrics for one model.

    - ``hallucination_rate``: P(B_k named | A_k shown, B_k ABSENT) on the
      out-of-distribution split — the headline number,
    - ``cue_recall``: the vivid A_k itself is still named there,
    - ``other_false_rate``: non-B_k absent objects named there (generic
      hallucination, should stay ~0 for everyone),
    - on val_normal: ``faint_recall_with_cue`` (B_k present AND its A_k
      present — the prior alone suffices) vs ``faint_recall_no_cue`` (B
      present without its cue — requires grounding), plus overall object
      recall/precision."""
    targets = set(groups["targets"])
    pair_of = dict(zip(groups["cues"], groups["targets"]))

    n = {"halluc": 0, "halluc_n": 0, "cue": 0, "other_false": 0,
         "with_cue": 0, "with_cue_n": 0, "no_cue": 0, "no_cue_n": 0,
         "rec": 0.0, "prec": 0.0, "norm_n": 0}

    preds = decode_predictions(trainer, state, val_halluc)
    for item in val_halluc.items:
        words = preds.get(os.path.basename(item["image_path"]))
        if words is None:
            continue
        pred_objs = set(w for w in words if w not in TEMPLATE_WORDS)
        cue, target = item["bias_pair"]
        present = {w for w, _ in item["objects"]}
        n["halluc"] += target in pred_objs
        n["halluc_n"] += 1
        n["cue"] += cue in pred_objs
        n["other_false"] += bool(pred_objs - present - {target})

    preds = decode_predictions(trainer, state, val_normal)
    for item in val_normal.items:
        words = preds.get(os.path.basename(item["image_path"]))
        if words is None:
            continue
        pred_objs = set(w for w in words if w not in TEMPLATE_WORDS)
        present = {w for w, _ in item["objects"]}
        n["rec"] += len(pred_objs & present) / len(present)
        n["prec"] += len(pred_objs & present) / max(len(pred_objs), 1)
        n["norm_n"] += 1
        for t in present & targets:
            cued = any(pair_of.get(c) == t for c in present)
            key = "with_cue" if cued else "no_cue"
            n[key] += t in pred_objs
            n[key + "_n"] += 1

    hn = max(n["halluc_n"], 1)
    return {
        "hallucination_rate": n["halluc"] / hn,
        "cue_recall": n["cue"] / hn,
        "other_false_rate": n["other_false"] / hn,
        "faint_recall_with_cue": n["with_cue"] / max(n["with_cue_n"], 1),
        "faint_recall_no_cue": n["no_cue"] / max(n["no_cue_n"], 1),
        "object_recall": n["rec"] / max(n["norm_n"], 1),
        "object_precision": n["prec"] / max(n["norm_n"], 1),
        "counts": {k: n[k] for k in ("halluc_n", "with_cue_n", "no_cue_n",
                                     "norm_n")},
    }


def annotation_stats(trainer, state, val_ds, groups) -> dict:
    """Hallucination + grounding metrics for the annotation-bias corpus.

    Every val image is a hallucination site (phantoms are never rendered):
    ``hallucination_rate`` = P(any phantom named), plus per-phantom rates and
    object recall/precision over the rendered objects."""
    phantoms = set(groups["phantoms"])
    n = {"halluc": 0, "n": 0, "rec": 0.0, "prec": 0.0}
    per_phantom = {w: 0 for w in phantoms}

    preds = decode_predictions(trainer, state, val_ds)
    for item in val_ds.items:
        words = preds.get(os.path.basename(item["image_path"]))
        if words is None:
            continue
        pred_objs = set(w for w in words if w not in TEMPLATE_WORDS)
        present = {w for w, _ in item["objects"]}
        named = pred_objs & phantoms
        n["halluc"] += bool(named)
        for w in named:
            per_phantom[w] += 1
        n["rec"] += len(pred_objs & present) / len(present)
        n["prec"] += len((pred_objs - phantoms) & present) / max(
            len(pred_objs - phantoms), 1)
        n["n"] += 1

    nn = max(n["n"], 1)
    return {
        "hallucination_rate": n["halluc"] / nn,
        "per_phantom_rate": {w: c / nn for w, c in per_phantom.items()},
        "object_recall": n["rec"] / nn,
        "object_precision": n["prec"] / nn,
        "counts": {"n": n["n"]},
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="output/hallucination.json")
    p.add_argument("--train-images", type=int, default=2000)
    p.add_argument("--val-images", type=int, default=100)
    p.add_argument("--halluc-per-pair", type=int, default=25)
    p.add_argument("--num-objects", type=int, default=12)
    p.add_argument("--num-pairs", type=int, default=4)
    p.add_argument("--faint", type=float, default=0.2)
    p.add_argument("--bias-frac", type=float, default=0.6)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--warm-epochs", type=int, default=25)
    p.add_argument("--tune-epochs", type=int, default=8)
    p.add_argument("--hidden-dim", type=int, default=512)
    p.add_argument("--embed-dim", type=int, default=512)
    p.add_argument("--wordmap", default="dataset/wordmap_flickr30k.json")
    p.add_argument("--modes", default="xe_cont,lrp",
                   help="branches from the XE warm start: xe_cont,lrp,"
                        "cider,lrp_cider")
    p.add_argument("--bias-mode", default="cue", choices=["cue", "annotation"],
                   help="cue: vivid cue co-occurs with a faint target "
                        "(correlated-evidence hallucination); annotation: a "
                        "phantom word appears in captions but never in "
                        "pixels (evidence-free prior — the regime the "
                        "reference's weighting targets)")
    p.add_argument("--num-phantoms", type=int, default=1)
    p.add_argument("--seed", type=int, default=0,
                   help="corpus + training seed (replicate cells of the "
                        "phase sweep under a different draw)")
    p.add_argument("--inject-p", type=float, default=0.75)
    p.add_argument("--save-params", default="",
                   help="directory to save params-only Orbax checkpoints "
                        "(warm_params + <mode>_params) — e.g. for "
                        "bench.py --params-checkpoint")
    p.add_argument("--warm-params", default="",
                   help="params-only Orbax dir of a previously saved warm "
                        "XE model (a prior run's <save-params>/warm_params): "
                        "load it instead of re-training the warm start, so "
                        "branch invocations can share one warm model")
    p.add_argument("--scst-ce-weight", type=float, default=1.0,
                   help="teacher-forced CE anchor weight for the SCST "
                        "branches (cider / lrp_cider).  The pure reference "
                        "loss (0.0) collapses on synthetic corpora "
                        "(docs/QUALITY.md SCST guard table: CIDEr 5.1 -> "
                        "0.0); w=1.0 holds quality while the reward "
                        "gradient acts — use 0.0 to reproduce the recorded "
                        "collapse")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.config import (
        ExperimentConfig, MeshConfig, ModelConfig, TrainConfig,
    )
    from lrp_imagecaptioning_tpu.data.vocab import WordMap
    from lrp_imagecaptioning_tpu.engine.train import Trainer

    word_map = WordMap.load(args.wordmap)
    print(f"vocab={len(word_map)} devices={jax.devices()}", flush=True)

    if args.bias_mode == "cue":
        train_ds, val_ds, halluc_ds, groups = build_biased_corpus(
            word_map, num_train=args.train_images, num_val=args.val_images,
            num_per_pair=args.halluc_per_pair, height=args.height,
            num_objects=args.num_objects, num_pairs=args.num_pairs,
            faint=args.faint, bias_frac=args.bias_frac, seed=args.seed)
        classify = None
    else:
        train_ds, val_ds, groups = build_annotation_corpus(
            word_map, num_train=args.train_images, num_val=args.val_images,
            height=args.height, num_objects=args.num_objects,
            num_phantoms=args.num_phantoms, inject_p=args.inject_p,
            seed=args.seed)
        halluc_ds = val_ds  # every clean val image is a hallucination site
        phantoms = set(groups["phantoms"])

        def classify(item, word, present):
            if word in phantoms:
                return "hallucinated"
            return "grounded" if word in present else None

    print(f"corpus: {len(train_ds)} train pairs, {len(val_ds)} val, "
          f"{len(halluc_ds)} halluc images; groups={groups}", flush=True)

    model = ModelConfig(
        model_type="gridtd", encoder="vgg16",
        embed_dim=args.embed_dim, hidden_dim=args.hidden_dim,
        vocab_size=len(word_map), height=args.height, width=args.height,
        vocab_pad_multiple=128,
    )
    results = {"config": vars(args) | {"vocab": len(word_map)},
               "groups": groups}

    def make_trainer(epochs, finetune_encoder=True, **tkw):
        t = TrainConfig(batch_size=args.batch_size, epochs=epochs,
                        max_caption_len=16, print_freq=100,
                        finetune_encoder=finetune_encoder, seed=args.seed,
                        **tkw)
        return Trainer(ExperimentConfig(model=model, train=t,
                                        mesh=MeshConfig()), word_map)

    def save_params(tag, params):
        if not args.save_params:
            return
        import shutil

        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(args.save_params, tag))
        shutil.rmtree(path, ignore_errors=True)  # orbax refuses overwrite
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, params)
        print("saved params:", path, flush=True)

    def branch_report(tr_, st_):
        if args.bias_mode == "cue":
            stats = grounding_stats(tr_, st_, val_ds, halluc_ds, groups)
        else:
            stats = annotation_stats(tr_, st_, val_ds, groups)
        return {
            "stats": stats,
            "mechanism": mechanism_stats(tr_, st_, halluc_ds, groups,
                                         classify=classify),
            "samples": sample_captions(tr_, st_, halluc_ds),
        }

    tr = make_trainer(args.warm_epochs)
    t0 = time.time()
    if args.warm_params and os.path.isdir(args.warm_params):
        import orbax.checkpoint as ocp

        template = tr.init_state(jax.random.PRNGKey(0))
        with ocp.StandardCheckpointer() as ckptr:
            warm_p = ckptr.restore(os.path.abspath(args.warm_params),
                                   template.params)
        warm_state = template.replace(params=warm_p)
        hist = []
        _bleu, warm_cider = tr.validate(warm_state, val_ds, beam_size=3)
        print(f"loaded warm params from {args.warm_params}; "
              f"val CIDEr={warm_cider:.4f}", flush=True)
    else:
        warm_state, hist = tr.fit(train_ds, val_ds, validate_beam=3)
        save_params("warm_params", warm_state.params)
        warm_cider = hist[-1]["cider"]
    results["xe_warm"] = {
        "history": hist, "final_cider": warm_cider,
        "seconds": time.time() - t0,
        **branch_report(tr, warm_state),
    }
    print("xe_warm:", json.dumps(results["xe_warm"]["stats"]), flush=True)
    print("xe_warm mechanism:",
          json.dumps(results["xe_warm"]["mechanism"]), flush=True)

    MODE_FLAGS = {"xe_cont": {}, "lrp": {"lrp_tune": True},
                  "cider": {"cider_tune": True},
                  "lrp_cider": {"lrp_cider_tune": True}}
    for mode in args.modes.split(","):
        scst = mode in ("cider", "lrp_cider")
        # SCST branches: CE anchor + FROZEN encoder (decoder-only policy
        # gradient).  Measured: even with the w=1.0 anchor, pushing the
        # policy gradient through the CNN at 5e-5 collapses the model
        # (annotation corpus: 2.19 -> 0.48/0.19 CIDEr, recall 0.94 -> 0.21)
        # while the frozen-encoder guard run holds 5.05 on the sharp corpus
        # (docs/QUALITY.md).  Matches the reference practice of starting
        # the cider stages from a trained checkpoint.
        extra = ({"scst_ce_weight": args.scst_ce_weight,
                  "finetune_encoder": False} if scst else {})
        tr2 = make_trainer(args.tune_epochs, decoder_lr=5e-5,
                           encoder_lr=5e-5, **MODE_FLAGS[mode], **extra)
        st = tr2.init_state(jax.random.PRNGKey(0))
        # warm-start copy — the jitted steps donate their buffers
        st = st.replace(params=jax.tree_util.tree_map(
            jnp.array, warm_state.params))
        t0 = time.time()
        st, hist = tr2.fit(train_ds, val_ds, state=st, validate_beam=3)
        save_params(f"{mode}_params", st.params)
        results[mode] = {
            "history": hist, "final_cider": hist[-1]["cider"],
            "seconds": time.time() - t0,
            **branch_report(tr2, st),
        }
        print(f"{mode}:", json.dumps(results[mode]["stats"]), flush=True)
        print(f"{mode} mechanism:", json.dumps(results[mode]["mechanism"]),
              flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
