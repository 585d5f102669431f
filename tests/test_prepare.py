"""Dataset preparation: create_input_files artifacts, coco2017 json builder,
entities builder, BU extractor sweep with a fake detector."""

import json

import numpy as np

from lrp_imagecaptioning_tpu.data.bu_features import create_bu_features, extract_single
from lrp_imagecaptioning_tpu.data.prepare import (
    build_coco_entities,
    create_input_files,
    generate_coco2017_jsonfile,
)
from lrp_imagecaptioning_tpu.data.vocab import WordMap


def _karpathy_json(tmp_path, n_train=3, n_val=1, n_test=1):
    images = []
    idx = 0
    for split, n in [("train", n_train), ("val", n_val), ("test", n_test)]:
        for _ in range(n):
            images.append({
                "filepath": "", "filename": f"img{idx}.jpg", "imgid": idx,
                "split": split, "sentids": [idx * 10, idx * 10 + 1],
                "sentences": [
                    {"tokens": ["a", "dog", "runs"], "raw": "a dog runs",
                     "imgid": idx, "sentid": idx * 10},
                    {"tokens": ["a", "cat", "sits"], "raw": "a cat sits",
                     "imgid": idx, "sentid": idx * 10 + 1},
                ],
            })
            idx += 1
    path = tmp_path / "karpathy.json"
    path.write_text(json.dumps({"dataset": "flickr30k", "images": images}))
    return str(path)


def test_create_input_files(tmp_path):
    kj = _karpathy_json(tmp_path)
    wm = create_input_files(
        "flickr30k", kj, str(tmp_path), captions_per_image=2, min_word_freq=1,
        output_folder=str(tmp_path), max_len=10, check_image_files=False,
    )
    base = "flickr30k_2_cap_per_img_1_min_word_freq"
    wm2 = WordMap.load(str(tmp_path / f"wordmap_{base}.json"))
    assert wm2.word_to_id == wm.word_to_id
    assert wm["<pad>"] == 0
    train = json.loads((tmp_path / f"train_imagecap_{base}.json").read_text())
    # 3 train images x 2 captions each -> 6 per-pair items
    assert len(train) == 6
    it = train[0]
    assert it["encoded_cap"][0] == wm.start
    assert len(it["encoded_cap"]) == 12  # max_len + 2
    assert it["caption_len"] == 5  # 3 tokens + start/end
    val = json.loads((tmp_path / f"val_imagecap_{base}.json").read_text())
    assert len(val) == 1 and len(val[0]["encoded_all_caps"]) == 2


def test_generate_coco2017_jsonfile(tmp_path):
    def anns(prefix, n_imgs):
        return {
            "images": [{"id": i, "file_name": f"{prefix}{i}.jpg"}
                       for i in range(n_imgs)],
            "annotations": [
                {"image_id": i, "id": i * 100 + j,
                 "caption": f"A dog number {i}!"}
                for i in range(n_imgs) for j in range(2)
            ],
        }

    tr = tmp_path / "train.json"
    va = tmp_path / "val.json"
    tr.write_text(json.dumps(anns("t", 5)))
    va.write_text(json.dumps(anns("v", 2)))
    out = generate_coco2017_jsonfile(str(tr), str(va),
                                     str(tmp_path / "out.json"), train_count=3)
    splits = [im["split"] for im in out["images"]]
    assert splits.count("train") == 3
    assert splits.count("val") == 2
    assert splits.count("test") == 2
    toks = out["images"][0]["sentences"][0]["tokens"]
    assert toks == ["a", "dog", "number", "0"]  # lowercased, punctuation-free


def test_build_coco_entities(tmp_path):
    inst = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 448, "height": 224}],
        "categories": [{"id": 7, "name": "dog"}],
        "annotations": [
            {"image_id": 1, "category_id": 7, "bbox": [10, 20, 30, 40]}
        ],
    }
    p = tmp_path / "inst.json"
    p.write_text(json.dumps(inst))
    out = build_coco_entities(str(p))
    e = out["a.jpg"]
    assert e["categories"] == {"dog": "7"}
    assert e["bbox"]["7"] == [[10, 20, 40, 60]]  # xywh -> xyxy
    assert e["resize_ratio"] == (0.5, 1.0)


def test_bu_extractor_sweep(tmp_path):
    calls = []

    def fake_detector(path, thresh):
        calls.append(thresh)
        # returns 40 boxes until threshold 0.7, then exactly 36
        n = 36 if thresh >= 0.7 else 40
        return (np.ones((n, 8), np.float32) * thresh,
                np.ones((n, 4), np.float32))

    feats, boxes = extract_single("x.jpg", fake_detector, num_regions=36,
                                  feat_dim=8)
    assert feats.shape == (36, 8) and boxes.shape == (36, 4)
    assert calls == [0.5, 0.6, 0.7]  # stopped at exactly-36

    written = create_bu_features(["img0.jpg"], str(tmp_path), fake_detector,
                                 num_regions=36, feat_dim=8)
    import h5py

    with h5py.File(written[0]) as f:
        assert f["image_features"].shape == (36, 8)
        assert f["image_boxes"].shape == (36, 4)
