"""Living-reference parity for the drive-only prep builders:
``create_input_robust_coco`` (preparedataset.py:204-336) and
``create_input_files_noc`` (:338-472).

Runs the ACTUAL reference functions on a synthetic Karpathy JSON and
compares every output artifact (word map + three split JSONs) to ours,
byte-semantically.  The corpus exercises the edge semantics: split-priority
for ids listed in both val and test (reference: test wins for robust),
duplicate robust ids, captions over max_len, an image whose captions are
all too long, caption-deficit sampling (rng.choice padding), images in no
split list, and the NOC builder's all-images vocabulary."""

import importlib.util
import json
import os
import sys

import pytest

from lrp_imagecaptioning_tpu.data.prepare import (
    create_input_files_noc,
    create_input_robust_coco,
)

CPI, MINFREQ, MAXLEN = 3, 2, 6


def _karpathy(tmp_path):
    """Synthetic Karpathy-style JSON + dummy image files."""
    words = ["a", "dog", "runs", "cat", "sits", "man", "walks", "rare1",
             "rare2", "street", "field", "fast"]

    def sent(toks):
        return {"tokens": toks, "raw": " ".join(toks)}

    images = []

    def img(cocoid, sents):
        name = f"img{cocoid}.jpg"
        images.append({"filepath": "train2017", "filename": name,
                       "cocoid": cocoid, "imgid": cocoid, "split": "train",
                       "sentids": [], "sentences": [sent(s) for s in sents]})

    img(1, [["a", "dog", "runs"], ["a", "dog", "runs", "fast"],
            ["the", "dog"], ["a", "dog"]])          # 4 caps: sample(k=3)
    img(2, [["a", "cat", "sits"]])                   # deficit: choice pads
    img(3, [["a", "man", "walks"], ["man", "walks", "street"]])
    img(4, [["a"] * (MAXLEN + 1)])                   # all caps too long: skip
    img(5, [["rare1", "street", "field"],
            ["a"] * (MAXLEN + 2), ["field", "cat"]])  # long cap filtered
    img(6, [["a", "dog", "sits"], ["dog", "sits"]])
    img(7, [["rare2", "rare2", "cat"], ["cat", "street"]])
    img(8, [["man", "runs", "field"]])               # in NO list: dropped
    img(9, [["a", "street", "dog"], ["street", "dog", "runs"]])

    os.makedirs(tmp_path / "images" / "train2017", exist_ok=True)
    for im in images:
        (tmp_path / "images" / "train2017" / im["filename"]).write_bytes(b"x")
    data = {"dataset": "coco", "images": images}
    kp = tmp_path / "dataset_coco.json"
    kp.write_text(json.dumps(data))
    _ = words
    return str(kp), str(tmp_path / "images")


def _import_reference():
    sys.path.insert(0, "/root/reference/dataset")
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_preparedataset", "/root/reference/dataset/preparedataset.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove("/root/reference/dataset")


def _compare_dirs(ref_dir, our_dir, base):
    ref_wm = json.load(open(os.path.join(ref_dir, f"wordmap_{base}.json")))
    our_wm = json.load(open(os.path.join(our_dir, f"wordmap_{base}.json")))
    assert ref_wm == our_wm
    for split in ("train", "val", "test"):
        name = f"{split}_imagecap_{base}.json"
        ref = json.load(open(os.path.join(ref_dir, name)))
        ours = json.load(open(os.path.join(our_dir, name)))
        assert ours == ref, (split, ours, ref)
    return ref_wm


@pytest.mark.slow
def test_robust_coco_matches_reference(tmp_path, monkeypatch):
    kp, imgs = _karpathy(tmp_path)
    # robust split: id 3 in BOTH val and test (test must win); id 1
    # duplicated in train (clean_id dedups); id 8 in no list
    robust = {
        "train_id": [{"img_id": i} for i in (1, 1, 2, 6, 9)],
        "val_id": [{"img_id": i} for i in (3, 5)],
        "test_id": [{"img_id": i} for i in (3, 7, 4)],
    }
    (tmp_path / "split_robust_coco.json").write_text(json.dumps(robust))

    ref_out = tmp_path / "ref_out"
    our_out = tmp_path / "our_out"
    ref_out.mkdir()
    our_out.mkdir()
    ref = _import_reference()
    # the reference opens 'split_robust_coco.json' relative to CWD
    monkeypatch.chdir(tmp_path)
    ref.create_input_robust_coco(kp, imgs, CPI, MINFREQ,
                                 output_folder=str(ref_out), max_len=MAXLEN)
    create_input_robust_coco(kp, str(tmp_path / "split_robust_coco.json"),
                             imgs, CPI, MINFREQ,
                             output_folder=str(our_out), max_len=MAXLEN)
    base = f"cocorobust_{CPI}_cap_per_img_{MINFREQ}_min_word_freq"
    wm = _compare_dirs(str(ref_out), str(our_out), base)
    # the corpus really exercised the interesting branches
    ref_test = json.load(open(ref_out / f"test_imagecap_{base}.json"))
    test_paths = {it["image_path"] for it in ref_test}
    assert any("img3.jpg" in p for p in test_paths)  # val∩test -> test
    assert not any("img4.jpg" in p for p in test_paths)  # all-long: skipped
    ref_train = json.load(open(ref_out / f"train_imagecap_{base}.json"))
    assert len(ref_train) == 4 * CPI  # 4 train images x one item per caption
    # 'rare2' appears twice but only in img7 (test split): the robust vocab
    # counts TRAIN tokens only, so it must be out-of-vocab here (the NOC
    # test below pins the opposite behavior)
    assert "rare2" not in wm


@pytest.mark.slow
def test_noc_matches_reference(tmp_path):
    kp, imgs = _karpathy(tmp_path)
    held = tmp_path / "held"
    held.mkdir()
    (held / "coco2014_cocoid.train.txt").write_text("1\n2\n6\n9\n")
    (held / "coco2014_cocoid.val_val.txt").write_text("3\n5\n")
    (held / "coco2014_cocoid.val_test.txt").write_text("7\n4\n")

    ref_out = tmp_path / "ref_out_noc"
    our_out = tmp_path / "our_out_noc"
    ref_out.mkdir()
    our_out.mkdir()
    ref = _import_reference()
    ref.create_input_files_noc("coco2014_held_out", kp, str(held), imgs,
                               CPI, MINFREQ, output_folder=str(ref_out),
                               max_len=MAXLEN)
    create_input_files_noc("coco2014_held_out", kp, str(held), imgs,
                           CPI, MINFREQ, output_folder=str(our_out),
                           max_len=MAXLEN)
    base = f"coco2014_held_out_{CPI}_cap_per_img_{MINFREQ}_min_word_freq"
    wm = _compare_dirs(str(ref_out), str(our_out), base)
    # NOC vocabulary counts EVERY image's tokens — img8 is in no split list
    # but its words still count; 'rare2' (img7, twice) must be in-vocab
    assert "rare2" in wm
