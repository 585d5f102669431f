"""Explanation-quality experiments (reference ``evaluation.py:44-773``).

Three per-image experiments over any explainer family:

- **ablation** (evaluation.py:82-311): delete the top-3 most relevant
  preceding words (t >= 6) or mask the top-20 most relevant 8x8 image patches
  for object words (t >= 1), re-decode / teacher-force, and record the softmax
  score drops and disappearance counts; optional random / attention controls,
- **bbox correctness** (evaluation.py:313-448): fraction of positive relevance
  mass inside the COCO bounding boxes of matching categories, across 10
  relevance thresholds, best-box per category,
- **TP/FP statistics** (evaluation.py:450-573): relevance statistics
  (mean / mean_abs / mean_pos / max / percentiles and 1-beta) for frequent
  words that appear in the references (TP) vs hallucinated (FP).

The per-image JSON output schema matches the reference so the analyzers are
interchangeable.
"""

from __future__ import annotations

import json
import os
import random

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lrp_tuning import STOP_WORDS
from ..utils.viz import upscale_attention
from .wordlists import is_object_word, matches_category

STOP_WORDS_SET = set(STOP_WORDS)

QUANTILES = [i / 100 for i in range(100)]
THRESHOLDS = [i / 10 for i in range(10)]


def _project_maxabs(x: np.ndarray) -> np.ndarray:
    m = np.max(np.abs(x))
    return np.zeros_like(x) if m == 0 else x / m


def overlapped_ratio(bbox, relevance: np.ndarray, threshold: float) -> float:
    """Positive-relevance mass inside the (resized) bbox
    (_calculate_overlaped_pixels, evaluation.py:313-335)."""
    rel = relevance.copy()
    mask = np.zeros(rel.shape)
    mask[bbox[1]:bbox[3], bbox[0]:bbox[2]] = 1
    rel[rel <= threshold] = 0
    total = rel.sum()
    if total == 0:
        return 0.0
    return float(min(1.0, (mask * rel).sum() / total))


def block_image_mask(relevance: np.ndarray, *, patch_size: int = 8,
                     num_delete: int = 20) -> np.ndarray:
    """1/0 mask deleting the top-k relevant patches (block_image,
    evaluation.py:57-80)."""
    h, w = relevance.shape
    assert h % patch_size == 0 and w % patch_size == 0
    nh, nw = h // patch_size, w // patch_size
    patches = relevance.reshape(nh, patch_size, nw, patch_size).sum(axis=(1, 3))
    flat = patches.reshape(-1)
    top = np.argpartition(-flat, num_delete)[:num_delete]
    keep = np.ones(nh * nw)
    keep[top] = 0
    keep = keep.reshape(nh, nw)
    return np.kron(keep, np.ones((patch_size, patch_size)))


class ExplanationEvaluator:
    """Runs the three experiments for one explainer (EvaluationExperiments /
    EvaluationExperimentsAOA, evaluation.py:44,576)."""

    def __init__(self, explainer, *, patch_size: int = 8,
                 num_delete_patches: int = 20, seed: int = 0,
                 object_list: list[str] | None = None):
        self.explainer = explainer
        self.cap = explainer.cap
        self.word_map = explainer.word_map
        self.patch_size = patch_size
        self.num_delete = num_delete_patches
        self.height = None  # inferred from the image
        self.rng = random.Random(seed)
        self._tf_fn = None
        self._beam_fn = None
        # which words count as objects for the image-ablation branch: the
        # reference hardcodes its COCO-ish OBJECT_WORDS (evaluation.py:19-34,
        # matching its datasets); synthetic corpora pass their own vocabulary
        # or the experiment silently records zero image-ablation events
        if object_list is not None:
            vocab = set(object_list)
            self._is_object = lambda w: w in vocab
        else:
            self._is_object = is_object_word

    # -- jitted helpers --------------------------------------------------
    def _teacherforce_scores(self, image: np.ndarray, prefix: list[int]):
        """Raw logits at the last position of a teacher-forced prefix
        (teacherforce_forward, gridTDmodel.py:892-931).  Fixed-shape: the
        prefix is padded and the score row indexed at len-1."""
        max_len = self.explainer.max_words + 1
        if self._tf_fn is None:
            cap = self.cap

            def f(params, image, tokens):
                feats = cap.encode(params, image)
                logits, _, _ = cap.forward(
                    params, feats, tokens[None], num_steps=max_len, train=False
                )
                return logits[0]

            self._tf_fn = jax.jit(f)
        toks = np.zeros(max_len + 1, np.int32)
        toks[: len(prefix)] = prefix
        logits = self._tf_fn(self.explainer.params, jnp.asarray(image),
                             jnp.asarray(toks))
        return np.asarray(logits)[len(prefix) - 1]

    def _beam_decode(self, image: np.ndarray) -> list[str]:
        if self._beam_fn is None:
            cap = self.cap

            def f(params, image):
                feats = cap.encode(params, image)
                return cap.beam_search_single(
                    params, feats, self.word_map, beam_size=3,
                    max_cap_length=20,
                )

            self._beam_fn = jax.jit(f)
        res = self._beam_fn(self.explainer.params, jnp.asarray(image))
        from ..data.vocab import decode_to_words

        toks = np.asarray(res.tokens)[: int(res.length)]
        return decode_to_words(toks, self.word_map)

    # -- relevance post-processing --------------------------------------
    def _spatial_relevance(self, rel_img: np.ndarray, explanation_type: str,
                           height: int) -> np.ndarray:
        """(H, W, 3) or (P,) relevance -> (H, W) map with the reference's
        per-type handling (evaluation.py:123-135, 404-417)."""
        if rel_img.ndim == 1:  # GradCam over the grid
            size = int(np.sqrt(rel_img.shape[-1]))
            scale = height // size
            return upscale_attention(rel_img, (size, size), upscale=scale,
                                     sigma=2 * scale / 6.0 * 10)
        return rel_img.mean(axis=-1)

    def _bbox_relevance(self, rel_img: np.ndarray, explanation_type: str,
                        height: int) -> np.ndarray:
        if rel_img.ndim == 1:  # GradCam
            size = int(np.sqrt(rel_img.shape[-1]))
            return _project_maxabs(
                upscale_attention(rel_img, (size, size),
                                  upscale=height // size)
            )
        if "neg" in explanation_type:
            rel = np.maximum(-rel_img, 0).mean(axis=-1)
        else:
            rel = np.maximum(rel_img, 0).mean(axis=-1)
        return _project_maxabs(rel)

    def _attention_map(self, alpha: np.ndarray, height: int) -> np.ndarray:
        if alpha.ndim == 2:  # multi-head
            alpha = alpha.mean(axis=0)
        size = int(np.sqrt(alpha.shape[0]))
        return _project_maxabs(
            upscale_attention(alpha, (size, size), upscale=height // size)
        )

    # -- experiments -----------------------------------------------------
    def ablation_experiment(self, item: dict, explanation_type: str,
                            save_path: str, *, do_attention: bool = False,
                            image: np.ndarray | None = None) -> dict:
        image = self._load(item, image)
        height = image.shape[1]
        exp = self.explainer.explain_caption_arrays(image)
        wm = self.word_map

        stop_word_diff: dict = {}
        category_diff: dict = {}
        img_disappear: list = []
        img_cat_diff: list = []
        controls = {"random": dict(word_stop={}, word_cat={}, img_dis=[], img_diff=[]),
                    "attention": dict(img_dis=[], img_diff=[])}

        def softmax_score(logits, word):
            e = np.exp(logits - logits.max())
            return float(e[word] / e.sum())

        for t, word_str in enumerate(exp.caption):
            word_t = int(exp.tokens[t + 1])
            obj = self._is_object(word_str)
            if t >= 1 and obj:
                orig = softmax_score(exp.predictions[t], word_t)

                def run_image_ablation(spatial, dis_list, diff_list):
                    mask = block_image_mask(
                        spatial, patch_size=self.patch_size,
                        num_delete=self.num_delete,
                    )
                    modified = image * mask[None, :, :, None]
                    new_words = self._beam_decode(modified)
                    if word_str in new_words:
                        idx = new_words.index(word_str)
                        prefix = [wm.start] + [wm.get(w) for w in new_words[:idx]]
                        new_logits = self._teacherforce_scores(modified, prefix)
                        diff = orig - softmax_score(new_logits, word_t)
                        diff_list.append([str(t), word_str, diff])
                    else:
                        dis_list.append([str(t), word_str])

                spatial = self._spatial_relevance(
                    exp.relevance_images[t], explanation_type, height
                )
                run_image_ablation(spatial, img_disappear, img_cat_diff)
                if do_attention:
                    rand = np.asarray(
                        self.rng.sample(range(spatial.size), spatial.size)
                    ).reshape(spatial.shape).astype(np.float64)
                    run_image_ablation(rand, controls["random"]["img_dis"],
                                       controls["random"]["img_diff"])
                    att = self._attention_map(exp.alphas[t], height)
                    run_image_ablation(att, controls["attention"]["img_dis"],
                                       controls["attention"]["img_diff"])
            if t >= 6 and (word_str in STOP_WORDS_SET or obj):
                orig = softmax_score(exp.predictions[t], word_t)
                rel_words = exp.relevance_words[t][: t + 1]
                top3 = np.argsort(-rel_words[1:])[:3] + 1  # skip <start>
                sub = list(exp.tokens[: t + 1])
                deleted = [x for i, x in enumerate(sub) if i not in set(top3)]
                new_logits = self._teacherforce_scores(image, deleted)
                diff = orig - softmax_score(new_logits, word_t)
                target = stop_word_diff if word_str in STOP_WORDS_SET else category_diff
                target.setdefault(t, []).append(diff)
                if do_attention and t > 1:
                    del_ids = self.rng.sample(range(1, t), min(3, t - 1))
                    deleted_r = [x for i, x in enumerate(sub)
                                 if i not in set(del_ids)]
                    nl = self._teacherforce_scores(image, deleted_r)
                    d = orig - softmax_score(nl, word_t)
                    tr = (controls["random"]["word_stop"]
                          if word_str in STOP_WORDS_SET
                          else controls["random"]["word_cat"])
                    tr.setdefault(t, []).append(d)

        result = [{
            "words_ablation": [{"stop_words": stop_word_diff},
                               {"category_words": category_diff}],
            "image_ablation": [{"stop_words": img_disappear},
                               {"category_words": img_cat_diff}],
        }]
        name = os.path.basename(item["image_path"])
        os.makedirs(save_path, exist_ok=True)
        with open(os.path.join(save_path,
                               f"{name}_{explanation_type}_ablation.json"),
                  "w") as f:
            json.dump(result, f)
        if do_attention:
            rnd = [{
                "words_ablation": [
                    {"stop_words": controls["random"]["word_stop"]},
                    {"category_words": controls["random"]["word_cat"]}],
                "image_ablation": [
                    {"stop_words": controls["random"]["img_dis"]},
                    {"category_words": controls["random"]["img_diff"]}],
            }]
            with open(os.path.join(save_path, f"{name}_random_ablation.json"),
                      "w") as f:
                json.dump(rnd, f)
            att = [{
                "image_ablation": [
                    {"stop_words": controls["attention"]["img_dis"]},
                    {"category_words": controls["attention"]["img_diff"]}],
            }]
            with open(os.path.join(save_path, f"{name}_attention_ablation.json"),
                      "w") as f:
                json.dump(att, f)
        return result[0]

    def bbox_experiment(self, category_dict: dict, item: dict, save_path: str,
                        explanation_type: str = "lrp", *,
                        do_attention: bool = False,
                        image: np.ndarray | None = None,
                        file_tag: str | None = None) -> dict:
        image = self._load(item, image)
        height = image.shape[1]
        exp = self.explainer.explain_caption_arrays(image)
        name = os.path.basename(item["image_path"])
        entry = category_dict[name]
        categories, bboxes = entry["categories"], entry["bbox"]
        ratio = entry["resize_ratio"]

        correctness: dict = {name: {}}
        att_correct: dict = {name: {}}
        for t, word_str in enumerate(exp.caption):
            for key in categories:
                if not matches_category(word_str, key):
                    continue
                rel = self._bbox_relevance(exp.relevance_images[t],
                                           explanation_type, height)
                correctness[name].setdefault(key, {})
                if do_attention:
                    att_correct[name].setdefault(key, {})
                    att = self._attention_map(exp.alphas[t], height)
                for box in bboxes[categories[key]]:
                    nb = [int(box[0] * ratio[0]), int(box[1] * ratio[1]),
                          int(box[2] * ratio[0]), int(box[3] * ratio[1])]
                    for th in THRESHOLDS:
                        cur = correctness[name][key].setdefault(str(th), 0)
                        sc = overlapped_ratio(nb, rel, th)
                        if sc > cur:
                            correctness[name][key][str(th)] = sc
                        if do_attention:
                            cur_a = att_correct[name][key].setdefault(str(th), 0)
                            sa = overlapped_ratio(nb, att, th)
                            if sa > cur_a:
                                att_correct[name][key][str(th)] = sa
        os.makedirs(save_path, exist_ok=True)
        tag = file_tag if file_tag is not None else explanation_type
        with open(os.path.join(save_path, f"{name}_{tag}correctness.json"),
                  "w") as f:
            json.dump(correctness, f)
        if do_attention:
            with open(os.path.join(save_path,
                                   f"{name}_attention_correctness.json"),
                      "w") as f:
                json.dump(att_correct, f)
        return correctness

    def tpfp_experiment(self, item: dict, explanation_type: str,
                        save_path: str, frequent_list: list[str], *,
                        do_attention: bool = False,
                        image: np.ndarray | None = None):
        image = self._load(item, image)
        height = image.shape[1]
        exp = self.explainer.explain_caption_arrays(image)
        wm = self.word_map
        specials = {wm.start, wm.pad, wm.end, wm.unk}
        ref_vocab = {int(t) for cap in item["encoded_all_caps"] for t in cap
                     if int(t) not in specials}

        tp, fp, tp_beta, fp_beta = [], [], [], []
        tp_att, fp_att = [], []
        for t, word_str in enumerate(exp.caption):
            if word_str not in frequent_list:
                continue
            rel = exp.relevance_images[t]
            if rel.ndim == 1:  # GradCam grid
                size = int(np.sqrt(rel.shape[-1]))
                rel = upscale_attention(rel, (size, size),
                                        upscale=height // size)
            else:
                rel = rel.mean(axis=-1)
            pos = rel > 0
            mean_pos = float(np.maximum(rel, 0).sum() / pos.sum()) if pos.sum() else 0.0
            stats = {
                "word": word_str,
                "mean": str(float(rel.mean())),
                "mean_abs": str(float(np.abs(rel).mean())),
                "mean_pos": str(mean_pos),
                "max": str(float(rel.max())),
                "quantile": [str(q) for q in np.quantile(rel, QUANTILES)],
            }
            beta_stat = {"word": word_str, "1-beta": str(1 - float(exp.betas[t]))}
            att_stat = None
            if do_attention:
                # raw (unnormalized) pyramid-expanded attention stats — the
                # reference records mean/max/quantile of the expanded alpha
                # map itself for its attention-vs-relevance AUC comparison
                # (tpfp_experiment, evaluation.py:484-494,516-531)
                alpha = exp.alphas[t]
                if alpha.ndim == 2:  # multi-head: mean over heads
                    alpha = alpha.mean(axis=0)
                size = int(np.sqrt(alpha.shape[0]))
                att = upscale_attention(alpha, (size, size),
                                        upscale=height // size)
                att_stat = {
                    "word": word_str,
                    "mean": str(float(att.mean())),
                    "max": str(float(att.max())),
                    "quantile": [str(q) for q in np.quantile(att, QUANTILES)],
                }
            if int(exp.tokens[t + 1]) in ref_vocab:
                tp.append(stats)
                tp_beta.append(beta_stat)
                if att_stat is not None:
                    tp_att.append(att_stat)
            else:
                fp.append(stats)
                fp_beta.append(beta_stat)
                if att_stat is not None:
                    fp_att.append(att_stat)
        name = os.path.basename(item["image_path"])
        os.makedirs(save_path, exist_ok=True)
        outputs = [
            (f"{explanation_type}_TP_statistics", tp),
            (f"{explanation_type}_FP_statistics", fp),
            ("beta_TP_statistics", tp_beta),
            ("beta_FP_statistics", fp_beta),
        ]
        if do_attention:
            outputs += [("attention_TP_statistics", tp_att),
                        ("attention_FP_statistics", fp_att)]
        for tag, payload in outputs:
            with open(os.path.join(save_path, f"{name}_{tag}.json"), "w") as f:
                json.dump(payload, f)
        return tp, fp

    # -- misc ------------------------------------------------------------
    def _load(self, item: dict, image: np.ndarray | None) -> np.ndarray:
        if image is not None:
            return np.asarray(image)
        if "image_array" in item:
            return np.asarray(item["image_array"])[None]
        from ..data.dataset import load_image

        cfg = self.explainer.cap.cfg
        return load_image(item["image_path"], cfg.height, cfg.width)[None]


class _PrecomputedExplainer:
    """Shim so ExplanationEvaluator can consume an explanation computed
    elsewhere (the all-heads fast path below); every other attribute
    delegates to the source explainer."""

    def __init__(self, exp, source):
        self._exp = exp
        self._source = source

    def explain_caption_arrays(self, image):
        return self._exp

    def __getattr__(self, name):
        return getattr(self._source, name)


def generate_evaluation_files_aoa_heads(
    make_explainer,  # head_idx -> explainer, OR an AOAAllHeadsLrpExplainer
    items: list[dict],
    save_root: str,
    *,
    num_head: int,
    explanation_type: str = "lrp",
    category_dict: dict | None = None,
):
    """Per-head AoA bbox-correctness files named ``<img>_<h><type>...`` so
    :func:`..analyze.merge_multihead_bbox` can max-merge them
    (EvaluationExperimentsAOA, evaluation.py:576-773).

    Pass an :class:`..explain.AOAAllHeadsLrpExplainer` instead of a factory
    to explain EVERY head in one compiled program per image (the reference
    re-runs beam decode + stash + CNN forward per head; the all-heads core
    shares them — ``num_head`` x fewer compilations and decode passes)."""
    from ..explain.explainer import AOAAllHeadsLrpExplainer

    if isinstance(make_explainer, AOAAllHeadsLrpExplainer):
        all_heads = make_explainer
        for item in items:
            name = os.path.basename(item["image_path"])
            if category_dict is None or name not in category_dict:
                continue
            image = ExplanationEvaluator(all_heads)._load(item, None)
            exps = all_heads.explain_caption_arrays(image)
            for h, exp in enumerate(exps):
                ev = ExplanationEvaluator(
                    _PrecomputedExplainer(exp, all_heads))
                ev.bbox_experiment(
                    category_dict, item,
                    os.path.join(save_root, "bbox", explanation_type),
                    explanation_type, file_tag=f"{h}{explanation_type}",
                    image=image,
                )
        return
    for h in range(num_head):
        explainer = make_explainer(h)
        ev = ExplanationEvaluator(explainer)
        for item in items:
            name = os.path.basename(item["image_path"])
            if category_dict is None or name not in category_dict:
                continue
            ev.bbox_experiment(
                category_dict, item,
                os.path.join(save_root, "bbox", explanation_type),
                explanation_type, file_tag=f"{h}{explanation_type}",
            )


def generate_evaluation_files(
    explainer, items: list[dict], save_root: str, *,
    explanation_type: str = "lrp",
    frequent_list: list[str] | None = None,
    category_dict: dict | None = None,
    do_attention: bool = False,
    experiments: tuple[str, ...] = ("ablation", "bbox", "tpfp"),
    object_list: list[str] | None = None,
):
    """Per-test-image driver (generate_evaluation_files, evaluation.py:775-866)."""
    from .wordlists import coco_frequent

    ev = ExplanationEvaluator(explainer, object_list=object_list)
    freq = frequent_list or coco_frequent
    for item in items:
        if "ablation" in experiments:
            ev.ablation_experiment(
                item, explanation_type,
                os.path.join(save_root, "ablation", explanation_type),
                do_attention=do_attention,
            )
        if "bbox" in experiments and category_dict is not None:
            name = os.path.basename(item["image_path"])
            if name in category_dict:
                ev.bbox_experiment(
                    category_dict, item,
                    os.path.join(save_root, "bbox", explanation_type),
                    explanation_type, do_attention=do_attention,
                )
        if "tpfp" in experiments:
            ev.tpfp_experiment(
                item, explanation_type,
                os.path.join(save_root, "tpfp", explanation_type),
                freq, do_attention=do_attention,
            )
    return ev
