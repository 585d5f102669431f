"""Offline dataset preparation (reference ``dataset/preparedataset.py``).

- :func:`create_input_files` — Karpathy-split JSON -> word map + per-split
  item lists (preparedataset.py:85-201), byte-compatible encoding,
- :func:`generate_coco2017_jsonfile` — raw COCO2017 annotations -> a
  Karpathy-style JSON with the 110k/rest/val2017 split
  (preparedataset.py:474-555); paths are arguments instead of hardcoded,
- :func:`build_coco_entities` — per-image bbox/category dict for the
  explanation-correctness evaluation (``COCOCategory``,
  preparedataset.py:9-82).

Pure host-side Python; the tokenizer is the same ``\\w+`` regexp the reference
uses (preparedataset.py:481) with lowercasing.
"""

from __future__ import annotations

import json
import os
import random
from collections import defaultdict

from .vocab import WordMap, build_word_map, encode_caption, simple_tokenize


def create_input_files(
    dataset: str,
    karpathy_json_path: str,
    image_folder: str,
    captions_per_image: int,
    min_word_freq: int,
    output_folder: str = "./",
    max_len: int = 100,
    *,
    check_image_files: bool = True,
    seed: int = 123,
) -> WordMap:
    """Write ``wordmap_*.json`` and per-split ``{split}_imagecap_*.json`` item
    lists with the reference's exact sampling and encoding rules."""
    assert dataset in {"coco2014", "flickr8k", "flickr30k", "coco2017"}
    with open(karpathy_json_path) as f:
        data = json.load(f)

    split_paths: dict[str, list] = {"train": [], "val": [], "test": []}
    split_caps: dict[str, list] = {"train": [], "val": [], "test": []}
    freq_source = []
    for img in data["images"]:
        captions = []
        for c in img["sentences"]:
            if img["split"] in ("train", "restval"):
                freq_source.append(c["tokens"])
            if len(c["tokens"]) <= max_len:
                captions.append(c["tokens"])
        if not captions:
            continue
        if "coco" in dataset:
            path = os.path.join(image_folder, img["filepath"], img["filename"])
        else:
            path = os.path.join(image_folder, img["filename"])
        split = img["split"]
        if split == "restval":
            split = "train"
        if split in split_paths:
            split_paths[split].append(path)
            split_caps[split].append(captions)

    word_map = build_word_map(freq_source, min_word_freq)
    base = f"{dataset}_{captions_per_image}_cap_per_img_{min_word_freq}_min_word_freq"
    os.makedirs(output_folder, exist_ok=True)
    word_map.save(os.path.join(output_folder, f"wordmap_{base}.json"))

    rng = random.Random(seed)  # reference calls seed(123) (preparedataset.py:169)
    for split in ("train", "val", "test"):
        items = []
        for path, caps in zip(split_paths[split], split_caps[split]):
            if check_image_files and not os.path.isfile(path):
                raise FileNotFoundError(path)
            if len(caps) < captions_per_image:
                captions = caps + [rng.choice(caps)
                                   for _ in range(captions_per_image - len(caps))]
            else:
                captions = rng.sample(caps, k=captions_per_image)
            encs, lens = zip(*(encode_caption(c, word_map, max_len)
                               for c in captions))
            if split == "train":
                # one item per (image, caption) pair (preparedataset.py:192-195)
                for e, ln in zip(encs, lens):
                    items.append({
                        "image_path": path, "encoded_cap": list(e),
                        "encoded_all_caps": [list(x) for x in encs],
                        "caption_len": int(ln),
                    })
            else:
                items.append({
                    "image_path": path,
                    "encoded_all_caps": [list(x) for x in encs],
                    "caption_len": [int(x) for x in lens],
                })
        with open(os.path.join(output_folder, f"{split}_imagecap_{base}.json"),
                  "w") as f:
            json.dump(items, f)
    return word_map


def _create_from_split_assignment(
    dataset, data, image_folder, captions_per_image, min_word_freq,
    output_folder, max_len, assign_split, *, check_image_files=True, seed=123,
    freq_all_images=False,
) -> WordMap:
    """Shared artifact generation with an arbitrary image->split assignment.

    ``freq_all_images`` builds the vocabulary from EVERY image's tokens
    (including images assigned to no split) instead of the train split only
    — the NOC builder's behavior (preparedataset.py:390-398)."""
    split_paths: dict[str, list] = {"train": [], "val": [], "test": []}
    split_caps: dict[str, list] = {"train": [], "val": [], "test": []}
    freq_source = []
    for img in data["images"]:
        split = assign_split(img)
        if freq_all_images:
            freq_source.extend(c["tokens"] for c in img["sentences"])
        if split is None:
            continue
        captions = []
        for c in img["sentences"]:
            if split == "train" and not freq_all_images:
                freq_source.append(c["tokens"])
            if len(c["tokens"]) <= max_len:
                captions.append(c["tokens"])
        if not captions:
            continue
        if "coco" in dataset:
            path = os.path.join(image_folder, img.get("filepath", ""),
                                img["filename"])
        else:
            path = os.path.join(image_folder, img["filename"])
        split_paths[split].append(path)
        split_caps[split].append(captions)

    word_map = build_word_map(freq_source, min_word_freq)
    base = f"{dataset}_{captions_per_image}_cap_per_img_{min_word_freq}_min_word_freq"
    os.makedirs(output_folder, exist_ok=True)
    word_map.save(os.path.join(output_folder, f"wordmap_{base}.json"))
    rng = random.Random(seed)
    for split in ("train", "val", "test"):
        items = []
        for path, caps in zip(split_paths[split], split_caps[split]):
            if check_image_files and not os.path.isfile(path):
                raise FileNotFoundError(path)
            if len(caps) < captions_per_image:
                captions = caps + [rng.choice(caps)
                                   for _ in range(captions_per_image - len(caps))]
            else:
                captions = rng.sample(caps, k=captions_per_image)
            encs, lens = zip(*(encode_caption(c, word_map, max_len)
                               for c in captions))
            if split == "train":
                for e, ln in zip(encs, lens):
                    items.append({"image_path": path, "encoded_cap": list(e),
                                  "encoded_all_caps": [list(x) for x in encs],
                                  "caption_len": int(ln)})
            else:
                items.append({"image_path": path,
                              "encoded_all_caps": [list(x) for x in encs],
                              "caption_len": [int(x) for x in lens]})
        with open(os.path.join(output_folder, f"{split}_imagecap_{base}.json"),
                  "w") as f:
            json.dump(items, f)
    return word_map


def create_input_robust_coco(
    karpathy_json_path: str,
    robust_split_json_path: str,
    image_folder: str,
    captions_per_image: int,
    min_word_freq: int,
    output_folder: str = "./",
    max_len: int = 100,
    **kw,
) -> WordMap:
    """Robust-COCO split (``create_input_robust_coco``,
    preparedataset.py:204-336): image ids come from an external
    ``split_robust_coco.json`` with train_id/val_id/test_id lists."""
    with open(karpathy_json_path) as f:
        data = json.load(f)
    with open(robust_split_json_path) as f:
        robust = json.load(f)

    def ids(key):
        return {item["img_id"] for item in robust[key]}

    train, val, test = ids("train_id"), ids("val_id"), ids("test_id")

    def assign(img):
        # reference priority: train, then TEST, then val
        # (preparedataset.py:248-255)
        img_id = img.get("cocoid", img.get("imgid"))
        if img_id in train:
            return "train"
        if img_id in test:
            return "test"
        if img_id in val:
            return "val"
        return None

    # reference base name: 'cocorobust' (preparedataset.py:295)
    return _create_from_split_assignment(
        "cocorobust", data, image_folder, captions_per_image,
        min_word_freq, output_folder, max_len, assign, **kw,
    )


def create_input_files_noc(
    dataset: str,
    karpathy_json_path: str,
    held_out_lists_folder: str,
    image_folder: str,
    captions_per_image: int,
    min_word_freq: int,
    output_folder: str = "./",
    max_len: int = 100,
    **kw,
) -> WordMap:
    """Novel-object-captioning held-out split (``create_input_files_noc``,
    preparedataset.py:338-472): train/val/test image-id lists come from .txt
    files in ``held_out_lists_folder``."""
    assert dataset in {"coco2014_held_out"}
    with open(karpathy_json_path) as f:
        data = json.load(f)

    def read_ids(name):
        path = os.path.join(held_out_lists_folder, name)
        with open(path) as f:
            return {int(line.strip()) for line in f if line.strip()}

    # the reference's exact held-out list file names
    # (preparedataset.py:367-378)
    train = read_ids("coco2014_cocoid.train.txt")
    val = read_ids("coco2014_cocoid.val_val.txt")
    test = read_ids("coco2014_cocoid.val_test.txt")

    def assign(img):
        img_id = int(img.get("cocoid", img.get("imgid")))
        if img_id in train:
            return "train"
        if img_id in val:
            return "val"
        if img_id in test:
            return "test"
        return None

    # the NOC builder's vocabulary counts EVERY image's tokens (the
    # reference updates word_freq before checking split membership,
    # preparedataset.py:390-398) — unlike the train-split-only vocab of
    # the other builders
    return _create_from_split_assignment(
        dataset, data, image_folder, captions_per_image, min_word_freq,
        output_folder, max_len, assign, freq_all_images=True, **kw,
    )


def generate_coco2017_jsonfile(
    annotation_train_path: str,
    annotation_val_path: str,
    output_path: str = "./dataset_coco2017.json",
    train_count: int = 110000,
) -> dict:
    """Karpathy-style JSON from raw COCO2017 captions: first ``train_count``
    sorted train image-ids -> 'train', the rest -> 'val', all of val2017 ->
    'test' (preparedataset.py:526-553)."""

    def collect(ann_path, filepath):
        anns = json.load(open(ann_path))
        caps = defaultdict(lambda: {"sentids": [], "sentences": []})
        names = {}
        for ann in anns["annotations"]:
            raw = ann["caption"].lower()
            tokens = simple_tokenize(raw)
            d = caps[ann["image_id"]]
            d["sentids"].append(ann["id"])
            d["sentences"].append({
                "tokens": tokens, "raw": raw,
                "imgid": ann["image_id"], "sentid": ann["id"],
            })
        for img in anns["images"]:
            names[img["id"]] = img["file_name"]
        return dict(caps), names, filepath

    out = {"dataset": "coco2017", "images": []}
    train_caps, train_names, _ = collect(annotation_train_path, "train2017")
    val_caps, val_names, _ = collect(annotation_val_path, "val2017")

    ids = sorted(train_caps)
    for i, img_id in enumerate(ids):
        out["images"].append({
            "filepath": "train2017", "filename": train_names[img_id],
            "sentids": train_caps[img_id]["sentids"],
            "sentences": train_caps[img_id]["sentences"],
            "imgid": img_id, "cocoid": img_id,
            "split": "train" if i < train_count else "val",
        })
    for img_id in val_caps:
        out["images"].append({
            "filepath": "val2017", "filename": val_names[img_id],
            "sentids": val_caps[img_id]["sentids"],
            "sentences": val_caps[img_id]["sentences"],
            "imgid": img_id, "cocoid": img_id, "split": "test",
        })
    with open(output_path, "w") as f:
        json.dump(out, f)
    return out


def build_coco_entities(
    instances_json_path: str,
    output_path: str | None = None,
    resize_to: int = 224,
) -> dict:
    """Per-image {categories, bbox, shape, resize_ratio} dict for the bbox
    correctness evaluation (COCOCategory, preparedataset.py:9-82).  bboxes are
    converted to [xmin, ymin, xmax, ymax]."""
    with open(instances_json_path) as f:
        ds = json.load(f)
    id_to_name = {im["id"]: (im["file_name"], (im["width"], im["height"]))
                  for im in ds["images"]}
    cat_names = {c["id"]: c["name"] for c in ds["categories"]}
    img_cats: dict = defaultdict(dict)
    img_boxes: dict = defaultdict(lambda: defaultdict(list))
    for ann in ds["annotations"]:
        img_id, cat_id = ann["image_id"], ann["category_id"]
        img_cats[img_id][cat_names[cat_id]] = str(cat_id)
        x, y, w, h = ann["bbox"]
        img_boxes[img_id][cat_id].append([x, y, x + w, y + h])
    out = {}
    for img_id, cats in img_cats.items():
        name, shape = id_to_name[img_id]
        out[name] = {
            "categories": cats,
            "bbox": {str(k): v for k, v in img_boxes[img_id].items()},
            "shape": shape,
            "resize_ratio": (resize_to / shape[0], resize_to / shape[1]),
        }
    if output_path:
        with open(output_path, "w") as f:
            json.dump(out, f)
    return out
