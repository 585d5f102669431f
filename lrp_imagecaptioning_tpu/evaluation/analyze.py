"""Offline aggregation of the per-image experiment JSONs
(reference ``evaluation.py:869-1494``)."""

from __future__ import annotations

import glob
import json
import os
from collections import defaultdict

import numpy as np

THRESH_KEYS = [str(i / 10) for i in range(10)]


def analyze_bbox(save_root: str, explanation_types: list[str], *,
                 output_csv: str | None = None) -> dict[str, np.ndarray]:
    """Mean relevance-in-bbox ratio per threshold per explainer
    (analyze_bbox, evaluation.py:869-908)."""
    out = {}
    for ex in explanation_types:
        if ex == "attention":
            files = glob.glob(os.path.join(save_root, "bbox", "lrp",
                                           "*attention_correctness.json"))
        elif ex.endswith("_merge"):
            # merged AoA head files keep the base type in their name
            # (analyze_bbox_aoa globs *.json, evaluation.py:1119-1123)
            files = glob.glob(os.path.join(save_root, "bbox", ex, "*.json"))
        else:
            files = glob.glob(os.path.join(save_root, "bbox", ex,
                                           f"*{ex}correctness.json"))
        acc = np.zeros(10)
        count = 0
        for file in files:
            data = json.load(open(file))
            for value in data.values():
                for item in value.values():
                    count += 1
                    for idx, th in enumerate(item):
                        acc[idx] += float(item[th])
        out[ex] = acc / max(count, 1)
    if output_csv:
        rows = [["th"] + THRESH_KEYS]
        for ex, vals in out.items():
            rows.append([ex] + [str(v) for v in vals])
        np.savetxt(output_csv, np.array(rows), delimiter=",", fmt="%s")
    return out


def analyze_ablation(save_root: str, explanation_types: list[str]) -> dict:
    """Mean word/image ablation score drops + disappearance counts
    (analyze_ablation, evaluation.py:913-1006)."""
    out = {}
    for ex in explanation_types:
        sub = "lrp" if ex in ("attention", "random") else ex
        files = glob.glob(os.path.join(save_root, "ablation", sub,
                                       f"*{ex}_ablation.json"))
        agg = defaultdict(float)
        cnt = defaultdict(int)
        disappear = 0
        total_img = 0
        for file in files:
            data = json.load(open(file))[0]
            for section in data.get("words_ablation", []):
                for kind, diffs in section.items():
                    for t, vals in diffs.items():
                        for v in vals:
                            key = f"word_{kind}_{'pos' if v >= 0 else 'neg'}"
                            agg[key] += v
                            cnt[key] += 1
            img = data.get("image_ablation", [])
            if img:
                disappear += len(img[0].get("stop_words", []))
                for row in img[1].get("category_words", []):
                    v = float(row[2])
                    key = f"img_{'pos' if v >= 0 else 'neg'}"
                    agg[key] += v
                    cnt[key] += 1
                    total_img += 1
        res = {k: agg[k] / cnt[k] for k in agg if cnt[k]}
        res["img_disappear_count"] = disappear
        res["img_category_count"] = total_img + disappear
        out[ex] = res
    return out


def analyze_tpfp(save_root: str, explanation_types: list[str], *,
                 stats=("mean", "mean_pos", "max")) -> dict:
    """ROC-AUC of TP-vs-FP relevance statistics (analyze_TPFP_20,
    evaluation.py:1147-1400; sklearn roc_curve/auc)."""
    from sklearn.metrics import auc, roc_curve

    out = {}
    for ex in explanation_types:
        sub = "lrp" if ex in ("attention", "beta") else ex
        tag = ex if ex in ("attention", "beta") else ex
        tp_files = glob.glob(os.path.join(save_root, "tpfp", sub,
                                          f"*{tag}_TP_statistics.json"))
        fp_files = glob.glob(os.path.join(save_root, "tpfp", sub,
                                          f"*{tag}_FP_statistics.json"))
        per_stat = {}
        if ex == "beta":
            scores, labels = [], []
            for files, lab in [(tp_files, 1), (fp_files, 0)]:
                for file in files:
                    for item in json.load(open(file)):
                        scores.append(float(item["1-beta"]))
                        labels.append(lab)
            if len(set(labels)) == 2:
                fpr, tpr, _ = roc_curve(labels, scores)
                per_stat["1-beta"] = float(auc(fpr, tpr))
        else:
            for stat in stats:
                scores, labels = [], []
                for files, lab in [(tp_files, 1), (fp_files, 0)]:
                    for file in files:
                        for item in json.load(open(file)):
                            scores.append(float(item[stat]))
                            labels.append(lab)
                if len(set(labels)) == 2:
                    fpr, tpr, _ = roc_curve(labels, scores)
                    per_stat[stat] = float(auc(fpr, tpr))
        out[ex] = per_stat
    return out


def ground_truth_word_frequency(karpathy_json_path: str,
                                words: list[str] | None = None) -> dict:
    """Training-split word frequencies (ground_truth_work_frequency,
    evaluation.py:1498-1536).  Returns {word: count}, optionally filtered to
    the given frequent-word list."""
    data = json.load(open(karpathy_json_path))
    freq: dict = defaultdict(float)
    for img in data["images"]:
        if img["split"] not in ("train", "restval"):
            continue
        for c in img["sentences"]:
            for w in c["tokens"]:
                freq[w] += 1
    if words is not None:
        return {w: freq.get(w, 0.0) for w in words}
    return dict(sorted(freq.items(), key=lambda kv: kv[1]))


def merge_multihead_bbox(save_root: str, explanation_type: str,
                         num_head: int = 8) -> str:
    """Merge per-head AoA bbox-correctness files by max over heads
    (process_multihead_attention_bbox_aoa, evaluation.py:1078-1108).
    Expects files named ``<img>_<h><type>correctness.json`` under
    ``bbox/<type>/``; writes merged files to ``bbox/<type>_merge/``."""
    src = os.path.join(save_root, "bbox", explanation_type)
    dst = os.path.join(save_root, "bbox", f"{explanation_type}_merge")
    os.makedirs(dst, exist_ok=True)
    by_img: dict = defaultdict(dict)
    for file in glob.glob(os.path.join(src, f"*{explanation_type}correctness.json")):
        name = os.path.basename(file)
        stem = name[: -len(f"{explanation_type}correctness.json")]
        # strip the trailing head index + '_' separator
        img = stem.rstrip("0123456789").rstrip("_")
        data = json.load(open(file))
        for value in data.values():
            for category, ths in value.items():
                merged = by_img[img].setdefault(
                    category, {th: 0.0 for th in THRESH_KEYS})
                for th, v in ths.items():
                    if float(v) > merged[th]:
                        merged[th] = float(v)
    for img, merged in by_img.items():
        with open(os.path.join(
                dst, f"{img}_{explanation_type}correctness.json"), "w") as f:
            json.dump({img: merged}, f)
    return dst


def count_hallucinate_words(predictions: dict, references: dict,
                            category_list: list[str]):
    """Per-category precision/recall/F1 of object words vs the reference
    vocabulary, macro-averaged (count_hallucinate_words,
    evaluation.py:1426-1494).  Inputs: {img: [prediction]} and
    {img: [ref, ...]} sentence dicts (the reference loads them from YAML)."""
    tp = defaultdict(float)
    fp = defaultdict(float)
    fn = defaultdict(float)
    for category in category_list:
        for key, preds in predictions.items():
            pred_words = preds[0].split(" ")
            gt_vocab = {w for s in references[key] for w in s.split(" ")}
            in_pred = category in pred_words
            in_gt = category in gt_vocab
            if in_gt and in_pred:
                tp[category] += 1
            elif in_gt:
                fn[category] += 1
            elif in_pred:
                fp[category] += 1
    mpa = mrc = mf1 = 0.0
    for c in category_list:
        p = tp[c] / (tp[c] + fp[c]) if tp[c] + fp[c] > 0 else 0.0
        r = tp[c] / (tp[c] + fn[c]) if tp[c] + fn[c] > 0 else 0.0
        f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
        mpa += p
        mrc += r
        mf1 += f1
    n = len(category_list)
    return mpa / n, mrc / n, mf1 / n
