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


def analyze_ablation_rows(save_root: str,
                          explanation_types: list[str]) -> list[list]:
    """The reference's EXACT ``analyze_ablation`` aggregate rows
    (evaluation.py:913-1006): per explainer, a ``['total_num', ...]`` row of
    [word-stop, word-category, image, image] populations, a positive-fraction
    row and a mean-score row — the numbers its published tables are built
    from.  :func:`analyze_ablation` keeps the richer per-sign means; this
    variant exists so repo artifacts and reference artifacts aggregate to
    identical CSV rows (pinned against the living reference's analyzer by
    tests/test_reference_analyzers.py)."""
    rows: list[list] = []
    for ex in explanation_types:
        sub = "lrp" if ex in ("attention", "random") else ex
        files = glob.glob(os.path.join(save_root, "ablation", sub,
                                       f"*{ex}_ablation.json"))
        c_ws_pos = c_ws_neg = c_wc_pos = c_wc_neg = 0
        s_ws_pos = s_ws_neg = s_wc_pos = s_wc_neg = 0.0
        c_dis = c_ic_pos = c_ic_neg = 0
        s_ic_pos = s_ic_neg = 0.0
        for file in files:
            data = json.load(open(file))[0]
            if ex != "attention":
                word_stop = data["words_ablation"][0]["stop_words"]
                word_cat = data["words_ablation"][1]["category_words"]
            else:
                word_stop, word_cat = [], []
            img_stop = data["image_ablation"][0]["stop_words"]
            img_cat = data["image_ablation"][1]["category_words"]
            for key in word_stop:
                v = word_stop[key][0]
                if v >= 0:
                    c_ws_pos += 1
                    s_ws_pos += v
                else:
                    c_ws_neg += 1
                    s_ws_neg += v
            for key in word_cat:
                v = word_cat[key][0]
                if v >= 0:
                    c_wc_pos += 1
                    s_wc_pos += v
                else:
                    c_wc_neg += 1
                    s_wc_neg += v
            c_dis += len(img_stop)
            for item in img_cat:
                v = item[2]
                if v >= 0:
                    c_ic_pos += 1
                    s_ic_pos += v
                else:
                    c_ic_neg += 1
                    s_ic_neg += v
        total = np.array([c_ws_pos + c_ws_neg, c_wc_pos + c_wc_neg,
                          c_dis + c_ic_pos + c_ic_neg,
                          c_dis + c_ic_pos + c_ic_neg])
        count_pos = np.array([c_ws_pos, c_wc_pos, c_ic_pos, c_dis])
        score = np.array([s_ws_pos + s_ws_neg, s_wc_pos + s_wc_neg,
                          s_ic_pos + s_ic_neg])
        for i in range(3):
            if total[i] > 0:
                score[i] = score[i] / total[i]
        rows.append(["total_num"] + total.tolist())
        with np.errstate(divide="ignore", invalid="ignore"):
            rows.append([ex] + (count_pos / total).tolist())
        rows.append([ex] + score.tolist())
    return rows


def analyze_tpfp_reference(save_root: str,
                           explanation_types: list[str]) -> dict[str, str]:
    """The reference's EXACT ``analyze_TPFP_20`` AUC dict
    (evaluation.py:1147-1400, the ``full_auc.json`` it writes): per
    explainer-statistic, the TP-vs-FP ROC-AUC **after the reference's
    per-file per-word collapse** — within each image's file, a word's TP
    statistic is the max over its occurrences and its FP statistic the min
    (so a word contributes one point per image, optimistic for TPs and
    pessimistic for FPs).  Two reference quirks transcribed faithfully:

    - the quantile collapse indexes ``statistics[word]`` (the LAST word seen
      in the file) instead of the iterated key, so all per-word quantile
      rows of a file duplicate the last word's values
      (evaluation.py:1233-1237 and the other three copies),
    - ``mean``/``max``/... skip items whose value serialized as the string
      "nan" but quantiles are still read from them.

    :func:`analyze_tpfp` keeps the straightforward per-item AUC; this
    variant exists for row-identical parity with the living reference's
    analyzer (tests/test_reference_analyzers.py)."""
    from sklearn.metrics import auc, roc_curve

    quantile_list = [i / 100 for i in range(0, 51)]
    results_tp: dict[str, list] = {}
    results_fp: dict[str, list] = {}
    for ex in explanation_types:
        sub = "lrp" if ex in ("attention", "beta", "lrp") else ex
        tp_files = glob.glob(os.path.join(save_root, "tpfp", sub,
                                          f"*{ex}_TP_statistics.json"))
        fp_files = glob.glob(os.path.join(save_root, "tpfp", sub,
                                          f"*{ex}_FP_statistics.json"))
        if ex == "beta":
            tp: dict[str, list] = {"1-beta": []}
            fp: dict[str, list] = {"1-beta": []}
            for files, out, init, pick in (
                    (tp_files, tp, float("-inf"), np.maximum),
                    (fp_files, fp, float("inf"), np.minimum)):
                for file in files:
                    data = json.load(open(file))
                    if data == []:
                        continue
                    statistics: dict = {}
                    for item in data:
                        word = item["word"]
                        statistics.setdefault(word, {"1-beta": init})
                        if item["1-beta"] != "nan":
                            statistics[word]["1-beta"] = pick(
                                float(item["1-beta"]),
                                statistics[word]["1-beta"])
                    for key in statistics:
                        out["1-beta"].append(statistics[key]["1-beta"])
        else:
            stats = (["mean", "max"] if ex == "attention"
                     else ["mean", "mean_pos", "max", "mean_abs"])
            tp = {ex + s: [] for s in stats}
            fp = {ex + s: [] for s in stats}
            for q in quantile_list:
                tp[ex + "quantile" + str(q)] = []
                fp[ex + "quantile" + str(q)] = []
            for files, out, init, pick in (
                    (tp_files, tp, float("-inf"), np.maximum),
                    (fp_files, fp, float("inf"), np.minimum)):
                for file in files:
                    data = json.load(open(file))
                    if data == []:
                        continue
                    statistics = {}
                    word = None
                    for item in data:
                        word = item["word"]
                        if word not in statistics:
                            statistics[word] = {s: init for s in stats}
                            for q in quantile_list:
                                statistics[word]["quantile" + str(q)] = init
                        # reference quirk: a "nan" stat `continue`s the WHOLE
                        # item — later stats and the quantiles are skipped
                        # too, not just the nan one (evaluation.py:1318-1337)
                        if any(item[s] == "nan" for s in stats):
                            for s in stats:
                                if item[s] == "nan":
                                    break
                                statistics[word][s] = pick(
                                    statistics[word][s], float(item[s]))
                            continue
                        for s in stats:
                            statistics[word][s] = pick(
                                statistics[word][s], float(item[s]))
                        for i, q in enumerate(quantile_list):
                            statistics[word]["quantile" + str(q)] = pick(
                                statistics[word]["quantile" + str(q)],
                                float(item["quantile"][i]))
                    for key in statistics:
                        for s in stats:
                            out[ex + s].append(statistics[key][s])
                        for q in quantile_list:
                            # reference quirk: reads `word` (last item's
                            # word), not `key`
                            out[ex + "quantile" + str(q)].append(
                                statistics[word]["quantile" + str(q)])
        for key in tp:
            results_tp[key] = tp[key]
            results_fp[key] = fp[key]
    auc_score = {}
    for key in results_fp:
        labels = [1] * len(results_tp[key]) + [0] * len(results_fp[key])
        fpr, tpr, _ = roc_curve(labels, results_tp[key] + results_fp[key])
        auc_score[key] = str(auc(fpr, tpr))
    return auc_score


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
