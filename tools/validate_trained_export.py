#!/usr/bin/env python
"""The living reference validates a TRAINED checkpoint from this framework.

``tests/test_torch_export.py`` proves the export schema with random-init
params; this tool closes the loop the round-2 verdict actually asked for
("the reference itself scores our trained weights identically"): take a
VGG16 captioner (GridTD / AoA / adaptive via ``--model``) TRAINED here
(sharp-corpus run of tools/synthetic_quality_cnn.py at 224^2 with
``--save-params``), export it to
the reference's ``state_dict`` schema (modelutils.py:115-144), strict-load it
into the actual reference model on CPU (loader semantics test.py:44-50), and
require the reference's own greedy decode to reproduce our captions
token-exactly (plus teacher-forced logits MAE <= 1e-4) on regenerated
sharp-corpus val images.

Everything runs on forced CPU (the f32 parity guarantees hold there; the
trained params were produced on TPU — so this also demonstrates
TPU-trained -> CPU-reference portability).

Usage:
    python tools/synthetic_quality_cnn.py --runs sharp --sharp-height 224 \
        --sharp-objects 12 --sharp-train-images 1000 --sharp-epochs 12 \
        --save-params output/sharp224_params --out output/quality_cnn_sharp224.json
    python tools/validate_trained_export.py \
        --params output/sharp224_params/vgg16_sharp_finetune \
        --out output/trained_export_validation.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "tests"))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--params", required=True,
                   help="Orbax params dir saved by synthetic_quality_cnn "
                        "--save-params (VGG16 family at --height geometry)")
    p.add_argument("--model", default="gridtd",
                   choices=["gridtd", "aoa", "adaptive"],
                   help="decoder family (must match the training run)")
    p.add_argument("--num-head", type=int, default=8,
                   help="AoA head count (reference config.py:150 default)")
    p.add_argument("--wordmap", default=os.path.join(
        REPO, "dataset/wordmap_flickr30k.json"))
    p.add_argument("--out", default="output/trained_export_validation.json")
    p.add_argument("--height", type=int, default=224,
                   help="train-time image size; the reference hardcodes its "
                        "196-pixel attention projection, so only 224 "
                        "strict-loads (gridTDmodel.py:127)")
    p.add_argument("--num-objects", type=int, default=12)
    p.add_argument("--num-images", type=int, default=16)
    p.add_argument("--embed-dim", type=int, default=512)
    p.add_argument("--hidden-dim", type=int, default=512)
    p.add_argument("--max-cap-length", type=int, default=14)
    args = p.parse_args(argv)

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    import torch

    from synthetic_quality_cnn import build_image_corpus
    from test_reference_parity import _install_stubs

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import WordMap, decode_to_words
    from lrp_imagecaptioning_tpu.models.captioner import Captioner
    from lrp_imagecaptioning_tpu.models.torch_export import export_state_dict

    word_map = WordMap.load(args.wordmap)

    # --- our side: restore the trained params, greedy-decode val images ----
    cfg = ModelConfig(
        model_type=args.model, encoder="vgg16", embed_dim=args.embed_dim,
        hidden_dim=args.hidden_dim, num_head=args.num_head,
        vocab_size=len(word_map),
        height=args.height, width=args.height, vocab_pad_multiple=128,
    )
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(os.path.abspath(args.params), params)
    print("restored", args.params, flush=True)

    # same generator the training run used (sharp corpus, seed 0): val images
    # are independent of num_train (separate rng stream, offset 10_000_000)
    _, val_ds = build_image_corpus(
        word_map, num_train=1, num_val=args.num_images, height=args.height,
        width=args.height, num_objects=args.num_objects, sharp=True)
    eb = next(val_ds.eval_batches(args.num_images))
    imgs = np.asarray(eb.images[: args.num_images], np.float32)

    feats = cap.encode(params, jnp.asarray(imgs))
    res = cap.greedy(params, feats, word_map,
                     max_cap_length=args.max_cap_length)
    our_tokens = np.asarray(res.tokens)  # zeroed after <end>
    our_lens = (our_tokens != 0).sum(axis=1)
    our_caps = [" ".join(decode_to_words(our_tokens[b][: our_lens[b]],
                                         word_map))
                for b in range(args.num_images)]

    # teacher-forced logits on the first reference caption of each image
    caps_np = np.asarray(eb.all_captions)[:, 0].astype(np.int64)
    num_steps = caps_np.shape[1] - 1
    our_logits, *_ = cap.forward(params, feats,
                                 jnp.asarray(caps_np, jnp.int32),
                                 num_steps=num_steps, train=False)
    our_logits = np.asarray(our_logits)[..., : len(word_map)]

    # --- reference side: export -> strict load -> its own decode ----------
    sd = export_state_dict(params, cfg)
    _install_stubs()
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models.vgg as ref_vgg

    orig_vgg = ref_vgg.vgg16
    ref_vgg.vgg16 = lambda pretrained=True, **kw: orig_vgg(
        pretrained=False, **kw)
    try:
        if args.model == "gridtd":
            import models.gridTDmodel as ref_mod
            model = ref_mod.GridTDModel(args.embed_dim, args.hidden_dim,
                                        len(word_map), "vgg16")
        elif args.model == "aoa":
            import models.aoamodel as ref_mod
            model = ref_mod.AOAModel(args.embed_dim, args.hidden_dim,
                                     args.num_head, len(word_map), "vgg16")
        else:
            import models.adaptiveattention as ref_mod
            model = ref_mod.AdaptiveAttentionCaptioningModel(
                args.embed_dim, args.hidden_dim, len(word_map), "vgg16")
    finally:
        ref_vgg.vgg16 = orig_vgg
    load = model.load_state_dict(sd, strict=True)
    assert not load.missing_keys and not load.unexpected_keys
    model.eval()
    print("reference strict-load ok", flush=True)

    t_imgs = torch.tensor(imgs.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref_sents, ref_seqs = model.greedy_search(
            t_imgs, word_map.word_to_id,
            max_cap_length=args.max_cap_length)
        ref_logits = model(t_imgs, torch.tensor(caps_np),
                           [num_steps + 1] * args.num_images,
                           None)[0].numpy()

    mae = float(np.abs(our_logits - ref_logits).mean())
    matches, rows = 0, []
    if args.model == "aoa":
        # reference QUIRK: AOAModel.greedy_search returns only the LAST
        # image's token ids (aoamodel.py:530 returns the loop-local sen_idx),
        # so compare its rendered sentences instead — they carry the same
        # per-step argmax stream through <unk>/special filtering +
        # remove_bad_endings; we replicate that rendering on our tokens
        from lrp_imagecaptioning_tpu.data.vocab import (
            bad_endings_for, remove_bad_endings)

        specials = {word_map.start, word_map.end, word_map.pad,
                    word_map.unk}
        ours_rendered = remove_bad_endings(
            [" ".join(decode_to_words(
                [t for t in our_tokens[b] if int(t) not in specials],
                word_map)) for b in range(args.num_images)],
            bad_endings_for("aoa"))
        for b in range(args.num_images):
            ok = ours_rendered[b] == ref_sents[b]
            matches += ok
            rows.append({"ours": ours_rendered[b],
                         "reference": ref_sents[b],
                         "token_exact": bool(ok)})
    else:
        for b in range(args.num_images):
            want = [int(t) for t in ref_seqs[b][1:]]  # ref strips <start>
            got = [int(t) for t in our_tokens[b]]
            ok = got == want
            matches += ok
            rows.append({"ours": our_caps[b],
                         "reference": " ".join(decode_to_words(
                             np.asarray(ref_seqs[b][1:]), word_map)),
                         "token_exact": bool(ok)})
    out = {
        "params": os.path.abspath(args.params),
        "num_images": args.num_images,
        "token_exact_captions": matches,
        "teacher_forced_logits_mae": mae,
        "captions": rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("token_exact_captions", "num_images",
                       "teacher_forced_logits_mae")}))
    print("wrote", args.out)
    assert matches == args.num_images, "reference decode diverged"
    assert mae <= 1e-4, f"logits MAE {mae}"


if __name__ == "__main__":
    main()
