"""Invariants of the synthetic quality/hallucination corpora (tools/).

The quality evidence in docs/QUALITY.md rests on these generators; the
hallucination experiment (tools/synthetic_hallucination.py) additionally
depends on structural guarantees — the cue/target co-occurrence bias in
training, cue-without-target composition of the OOD split, and the faint
target textures — which these tests pin down without any training.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")  # repo-root CLIs
sys.path.insert(0, "tools")

from lrp_imagecaptioning_tpu.data.vocab import WordMap  # noqa: E402

WORDMAP = os.path.join(os.path.dirname(__file__), "..", "dataset",
                       "wordmap_flickr30k.json")


@pytest.fixture(scope="module")
def word_map():
    return WordMap.load(WORDMAP)


@pytest.fixture(scope="module")
def biased(word_map):
    from synthetic_hallucination import build_biased_corpus

    return build_biased_corpus(
        word_map, num_train=60, num_val=30, num_per_pair=5, height=64,
        num_objects=12, num_pairs=4, faint=0.2, bias_frac=0.6)


def objset(item):
    return {w for w, _ in item["objects"]}


def test_biased_corpus_group_partition(biased, word_map):
    *_, groups = biased
    cues, targets, free = (set(groups[k]) for k in ("cues", "targets",
                                                    "free"))
    assert len(cues) == len(targets) == len(free) == 4
    assert not (cues & targets or cues & free or targets & free)


def test_train_cue_never_without_target(biased):
    train_ds, *_, groups = biased
    pair_of = dict(zip(groups["cues"], groups["targets"]))
    cue_seen = 0
    for item in train_ds.items:
        objs = objset(item)
        for cue in objs & set(groups["cues"]):
            cue_seen += 1
            assert pair_of[cue] in objs, (
                "training must never show a cue without its target — that "
                "co-occurrence prior is the experiment's premise")
    assert cue_seen > 0  # the biased branch actually fired


def test_halluc_split_shows_cue_without_target(biased):
    *_, halluc_ds, groups = biased
    assert len(halluc_ds.items) == 4 * 5
    for item in halluc_ds.items:
        cue, target = item["bias_pair"]
        objs = objset(item)
        assert cue in objs and target not in objs
        assert cue in groups["cues"] and target in groups["targets"]
        # distractors come from the unbiased pool: no other cue appears
        assert len(objs & set(groups["cues"])) == 1


def test_faint_targets_are_scaled(biased, word_map):
    train_ds, *_, groups = biased
    # locate one target-object cell and one vivid-object cell and compare
    # pixel magnitudes: targets carry the --faint factor
    def cell_max(item, word):
        grid = item["grid"]
        ph = item["image_array"].shape[0] // grid
        slot = dict((w, s) for w, s in item["objects"])[word]
        r, c = divmod(slot, grid)
        return np.abs(item["image_array"][r * ph:(r + 1) * ph,
                                          c * ph:(c + 1) * ph]).max()

    target_max, vivid_max = [], []
    for item in train_ds.items:
        for w in objset(item):
            (target_max if w in set(groups["targets"]) else
             vivid_max).append(cell_max(item, w))
    assert max(target_max) <= 0.2 * 1.5 + 1e-6
    assert max(vivid_max) > 1.0


def test_references_name_objects_in_canonical_order(biased, word_map):
    train_ds, *_ = biased
    item = train_ds.items[0]
    ids = [word_map[w] for w, _ in item["objects"]]
    assert ids == sorted(ids)
    # every reference contains the object ids in that order
    for enc in item["encoded_all_caps"]:
        obj_pos = [enc.index(i) for i in ids]
        assert obj_pos == sorted(obj_pos)


def test_grounding_stats_math(biased, word_map):
    """grounding_stats on hand-made predictions (no model): one hallucinated
    target of two, one missed cue, one extra word on the normal split."""
    from synthetic_hallucination import grounding_stats

    _, val_ds, halluc_ds, groups = biased

    class FakeTrainer:
        class tcfg:
            batch_size = 8
        word_map = word_map
        captioner = None

    h0, h1 = halluc_ds.items[0], halluc_ds.items[1]
    n0 = val_ds.items[0]
    preds = {}
    # h0: names cue + the ABSENT target -> hallucination, cue recalled
    preds[os.path.basename(h0["image_path"])] = [h0["bias_pair"][0],
                                                 h0["bias_pair"][1]]
    # h1: names neither -> no hallucination, cue missed
    preds[os.path.basename(h1["image_path"])] = ["a"]
    # n0: perfect objects + one absent vivid word
    extra = next(w for w in groups["free"] if w not in objset(n0))
    preds[os.path.basename(n0["image_path"])] = (
        sorted(objset(n0), key=lambda w: word_map[w]) + [extra])

    import synthetic_hallucination as sh
    real_decode = sh.decode_predictions
    sh.decode_predictions = lambda tr, st, ds: {
        k: v for k, v in preds.items()
        if any(os.path.basename(i["image_path"]) == k for i in ds.items)}
    try:
        limited_halluc = type(halluc_ds)(
            [h0, h1], "val", height=64, width=64, seed=0)
        limited_val = type(val_ds)([n0], "val", height=64, width=64, seed=0)
        stats = sh.grounding_stats(FakeTrainer(), None, limited_val,
                                   limited_halluc, groups)
    finally:
        sh.decode_predictions = real_decode

    assert stats["hallucination_rate"] == 0.5
    assert stats["cue_recall"] == 0.5
    assert stats["object_recall"] == 1.0
    assert stats["object_precision"] == pytest.approx(3 / 4)


# ---------------------------------------------------------------- annotation


def test_format_caption_matches_templates_for_three():
    from synthetic_quality import TEMPLATES, format_caption

    objs = ["wok", "stir", "fare"]
    for i, t in enumerate(TEMPLATES):
        assert format_caption(objs, i) == t.format(*objs)


def test_format_caption_four_objects_within_max_len(word_map):
    from synthetic_quality import format_caption

    from lrp_imagecaptioning_tpu.data.vocab import encode_caption

    objs = ["fare", "railing", "fold", "nail"]
    for i in range(5):
        toks = format_caption(objs, i).split(" ")
        assert all(w in objs or w in {"a", "and", "the", "with"}
                   for w in toks)
        enc, ln = encode_caption(toks, word_map, 14)  # must not raise
        assert ln == len(toks) + 2


@pytest.fixture(scope="module")
def annotation(word_map):
    from synthetic_hallucination import build_annotation_corpus

    return build_annotation_corpus(
        word_map, num_train=80, num_val=30, height=64, num_objects=12,
        num_phantoms=1, inject_p=0.75)


def test_annotation_phantom_never_rendered(annotation):
    train_ds, val_ds, groups = annotation
    phantoms = set(groups["phantoms"])
    for ds in (train_ds, val_ds):
        for item in ds.items:
            assert not (objset(item) & phantoms), (
                "phantoms must have zero pixel support anywhere")


def test_annotation_phantom_injected_in_captions_only(annotation, word_map):
    train_ds, val_ds, groups = annotation
    phantom_ids = {word_map[w] for w in groups["phantoms"]}
    n_inj = sum(bool(set(item["encoded_cap"]) & phantom_ids)
                for item in train_ds.items)
    frac = n_inj / len(train_ds.items)
    assert 0.55 <= frac <= 0.95, frac  # ~inject_p, over 5 caps/image
    assert abs(frac - groups["inject_rate"]) < 1e-9
    for item in val_ds.items:  # val references are clean
        for enc in item["encoded_all_caps"]:
            assert not (set(enc) & phantom_ids)


def test_annotation_injected_caption_names_rendered_plus_phantom(
        annotation, word_map):
    train_ds, _, groups = annotation
    phantom_ids = {word_map[w] for w in groups["phantoms"]}
    template_ids = {word_map[w] for w in ("a", "and", "the", "with")}
    specials = {word_map.pad, word_map.start, word_map.end}
    for item in train_ds.items:
        enc = set(item["encoded_cap"]) - template_ids - specials
        rendered = {word_map[w] for w in objset(item)}
        extra = enc - rendered
        assert extra <= phantom_ids, (
            "caption words must be the rendered objects plus at most the "
            "phantom")
        assert rendered <= enc, "every rendered object is named"


# ------------------------------------------------------------- BU phantoms


@pytest.fixture(scope="module")
def bu_reserved(word_map):
    from synthetic_quality import build_corpus

    return build_corpus(
        word_map, num_train=60, num_val=30, feat_dim=32, num_regions=36,
        num_objects=12, num_phantoms=1, inject_p=0.8)


@pytest.fixture(scope="module")
def bu_frequent(word_map):
    from synthetic_quality import build_corpus

    return build_corpus(
        word_map, num_train=80, num_val=40, feat_dim=32, num_regions=36,
        num_objects=12, num_phantoms=1, inject_p=0.8,
        phantom_present_p=0.3)


def _caption_ids(item):
    return {int(t) for t in item["encoded_cap"]}


def test_bu_default_has_no_phantoms(word_map):
    from synthetic_quality import build_corpus

    train_ds, val_ds, groups = build_corpus(
        word_map, num_train=4, num_val=2, feat_dim=16, num_regions=36,
        num_objects=9)
    assert groups["phantoms"] == [] and groups["inject_rate"] == 0.0
    # every caption word is a template word, special, or pool object
    ok = ({word_map[w] for w in groups["pool"]}
          | {word_map[w] for w in ("a", "and", "the", "with")}
          | {word_map.pad, word_map.start, word_map.end})
    for item in train_ds.items:
        assert _caption_ids(item) <= ok


def test_bu_reserved_phantom_in_train_captions_only(bu_reserved, word_map):
    train_ds, val_ds, groups = bu_reserved
    ph_ids = {word_map[w] for w in groups["phantoms"]}
    assert 0.5 < groups["inject_rate"] <= 1.0
    n_inj = sum(bool(_caption_ids(item) & ph_ids)
                for item in train_ds.items)
    assert n_inj > 0, "phantom must appear in train captions"
    for item in val_ds.items:
        for cap in item["encoded_all_caps"]:
            assert not (set(map(int, cap)) & ph_ids), (
                "reserved-mode val references must stay clean")


def test_bu_frequent_phantom_rendered_and_injected(bu_frequent, word_map):
    """Frequent mode: the phantom is genuinely present (features + truthful
    refs) in ~present_p of val images, and injected into captions of
    phantom-absent train images — so P(present | emitted) is measurable."""
    train_ds, val_ds, groups = bu_frequent
    ph = groups["phantoms"][0]
    ph_id = word_map[ph]
    n_val_present = sum(
        any(ph_id in set(map(int, cap)) for cap in item["encoded_all_caps"])
        for item in val_ds.items)
    assert 0.1 * len(val_ds.items) <= n_val_present <= 0.6 * len(
        val_ds.items), "phantom must be genuinely present in ~30% of val"
    # train: injected captions exist on phantom-absent images; per-item
    # features of present images must carry the phantom's vector region
    # (approximate check: presence in the FIRST reference caption implies
    # it was rendered OR injected — count both kinds exist)
    first_cap_present = [ph_id in set(map(int, item["encoded_all_caps"][0]))
                         for item in train_ds.items]
    assert any(first_cap_present) and not all(first_cap_present)


def test_bu_phantom_modes_leave_pool_stream_unchanged(word_map):
    """num_phantoms=0 must reproduce the exact legacy corpus stream; adding
    phantoms must not disturb which POOL objects a given image renders when
    the phantom draw does not fire (spot-check via shared seed)."""
    from synthetic_quality import build_corpus

    kw = dict(num_train=5, num_val=3, feat_dim=16, num_regions=36,
              num_objects=9, seed=7)
    a = build_corpus(word_map, **kw)
    b = build_corpus(word_map, **kw)
    for x, y in zip(a[0].items, b[0].items):
        assert x["encoded_cap"] == y["encoded_cap"]
        np.testing.assert_array_equal(x["image_array"], y["image_array"])
