"""ROUGE-L (Lin & Hovy 2004) — behavior-compatible with
``pycocoevalcap/rouge/rouge.py``: max precision/recall over references
combined with beta = 1.2."""

from __future__ import annotations

import numpy as np


def _lcs_len(a: list[str], b: list[str]) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        ai = a[i - 1]
        for j in range(1, len(b) + 1):
            cur[j] = prev[j - 1] + 1 if ai == b[j - 1] else max(prev[j], cur[j - 1])
        prev = cur
    return prev[len(b)]


def rouge_l(
    hypotheses: list[str], references: list[list[str]], beta: float = 1.2
) -> tuple[float, np.ndarray]:
    scores = []
    for hyp, refs in zip(hypotheses, references):
        h = hyp.split(" ")
        precs, recs = [], []
        for r in refs:
            rw = r.split(" ")
            lcs = _lcs_len(rw, h)
            precs.append(lcs / float(len(h)) if len(h) else 0.0)
            recs.append(lcs / float(len(rw)) if len(rw) else 0.0)
        p, r = max(precs), max(recs)
        if p != 0 and r != 0:
            scores.append(((1 + beta**2) * p * r) / float(r + beta**2 * p))
        else:
            scores.append(0.0)
    return float(np.mean(scores)), np.asarray(scores)
