"""Pure-Python METEOR with exact + Porter-stem match stages.

The reference depends on the METEOR 1.5 Java jar which is *absent* from its
repo and degrades to 0.0 when missing (``models/metrics.py:62-67``).  We do
strictly better: unigram alignment in the standard module order — exact
matches first, then Porter-stem matches over the leftovers (WordNet
synonymy/paraphrase stages are omitted: no corpora in a self-contained
build) — scored with the harmonic mean (alpha=0.9) and chunk fragmentation
penalty (gamma=0.5, beta=3.0 — the METEOR defaults)."""

from __future__ import annotations

import numpy as np

from .porter import porter_stem


def _align(h: list[str], r: list[str]) -> tuple[int, int]:
    """Greedy left-to-right staged alignment (exact, then Porter stem);
    returns (#matches, #chunks)."""
    used = [False] * len(r)
    match_pos: list[int | None] = [None] * len(h)
    for i, w in enumerate(h):
        for j, rw in enumerate(r):
            if not used[j] and rw == w:
                used[j] = True
                match_pos[i] = j
                break
    h_stem = [porter_stem(w) for w in h]
    r_stem = [porter_stem(w) for w in r]
    for i, ws in enumerate(h_stem):
        if match_pos[i] is not None:
            continue
        for j, rs in enumerate(r_stem):
            if not used[j] and rs == ws:
                used[j] = True
                match_pos[i] = j
                break
    matches = sum(1 for p in match_pos if p is not None)
    # chunks: maximal runs of adjacent matches (contiguous in both strings)
    chunks = 0
    prev = None
    for p in match_pos:
        if p is None:
            prev = None
            continue
        if prev is None or p != prev + 1:
            chunks += 1
        prev = p
    return matches, chunks


def meteor_score(
    hypotheses: list[str],
    references: list[list[str]],
    alpha: float = 0.9,
    beta: float = 3.0,
    gamma: float = 0.5,
) -> tuple[float, np.ndarray]:
    scores = []
    for hyp, refs in zip(hypotheses, references):
        h = hyp.split()
        best = 0.0
        for ref in refs:
            r = ref.split()
            if not h or not r:
                continue
            m, ch = _align(h, r)
            if m == 0:
                continue
            p = m / len(h)
            q = m / len(r)
            fmean = p * q / (alpha * p + (1 - alpha) * q)
            frag = ch / m
            penalty = gamma * (frag**beta)
            best = max(best, fmean * (1 - penalty))
        scores.append(best)
    return float(np.mean(scores)) if scores else 0.0, np.asarray(scores)
