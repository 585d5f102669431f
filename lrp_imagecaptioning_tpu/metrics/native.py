"""ctypes bindings for the native C++ n-gram scorers
(``native/cider_scorer.cpp``, ``native/bleu_scorer.cpp``) — SURVEY §2's
"native n-gram scorers".

Builds the shared libraries on first use with g++ (cached next to the
source); falls back to the pure-Python scorers when a toolchain is
unavailable.  The native paths consume token-id sequences directly — no
string round trip — and match the Python/pycocoevalcap semantics exactly
(tested in tests/test_native_cider.py)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "cider_scorer.cpp",
)


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.splitext(_SRC)[0] + ".so"
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _SRC, "-o", so_path],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.cider_score_ids.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ]
        lib.cider_score_ids.restype = None
        _LIB = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        warnings.warn(f"native CIDEr unavailable ({e}); using pure Python")
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def _flatten(seqs: list[np.ndarray]):
    offsets = np.zeros(len(seqs) + 1, np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    flat = (np.concatenate(seqs) if seqs and offsets[-1] > 0
            else np.zeros(0, np.int32)).astype(np.int32)
    return flat, offsets


def cider_score_ids(
    hyp_ids: list[np.ndarray],
    ref_ids: list[list[np.ndarray]],
    sigma: float = 6.0,
) -> np.ndarray:
    """Per-hypothesis CIDEr over token-id sequences.  ``ref_ids[i]`` are the
    references of hypothesis i."""
    lib = _build_and_load()
    if lib is None:
        return _python_fallback(hyp_ids, ref_ids, sigma)
    n = len(hyp_ids)
    hyp_flat, hyp_off = _flatten([np.asarray(h, np.int32) for h in hyp_ids])
    all_refs, groups = [], []
    for i, refs in enumerate(ref_ids):
        for r in refs:
            all_refs.append(np.asarray(r, np.int32))
            groups.append(i)
    ref_flat, ref_off = _flatten(all_refs)
    groups_arr = np.asarray(groups, np.int64)
    scores = np.zeros(n, np.float64)

    def ptr(a, t):
        if a.size == 0:
            a = np.zeros(1, dtype=a.dtype)
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.cider_score_ids(
        ptr(hyp_flat, ctypes.c_int32), ptr(hyp_off, ctypes.c_int64),
        ctypes.c_int64(n),
        ptr(ref_flat, ctypes.c_int32), ptr(ref_off, ctypes.c_int64),
        ptr(groups_arr, ctypes.c_int64), ctypes.c_int64(len(all_refs)),
        ctypes.c_double(sigma), ptr(scores, ctypes.c_double),
    )
    return scores


def _python_fallback(hyp_ids, ref_ids, sigma):
    from .cider import cider_score

    hyps = [" ".join(map(str, map(int, h))) for h in hyp_ids]
    refs = [[" ".join(map(str, map(int, r))) for r in rr] for rr in ref_ids]
    _, scores = cider_score(hyps, refs, sigma=sigma)
    return scores


# ----------------------------------------------------------- native BLEU ----

_BLEU_LIB = None
_BLEU_TRIED = False

_BLEU_SRC = os.path.join(os.path.dirname(_SRC), "bleu_scorer.cpp")


def _build_and_load_bleu():
    global _BLEU_LIB, _BLEU_TRIED
    if _BLEU_TRIED:
        return _BLEU_LIB
    _BLEU_TRIED = True
    so_path = os.path.splitext(_BLEU_SRC)[0] + ".so"
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_BLEU_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _BLEU_SRC, "-o", so_path],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.bleu_score_ids.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        lib.bleu_score_ids.restype = None
        _BLEU_LIB = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        warnings.warn(f"native BLEU unavailable ({e}); using pure Python")
        _BLEU_LIB = None
    return _BLEU_LIB


def bleu_native_available() -> bool:
    return _build_and_load_bleu() is not None


_BLEU_OPTIONS = {"closest": 0, "shortest": 1, "average": 2}


def bleu_score_ids(
    hyp_ids: list[np.ndarray],
    ref_ids: list[list[np.ndarray]],
    n: int = 4,
    option: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """BLEU-1..n over token-id sequences (corpus_bleu's exact semantics,
    incl. the 'average'-when-single-item option default).  Returns
    ``(corpus [n], per_sentence [len(hyp_ids), n])``."""
    if option is None:
        option = "average" if len(ref_ids) == 1 else "closest"
    lib = _build_and_load_bleu()
    if lib is None:
        return _bleu_python_fallback(hyp_ids, ref_ids, n, option)
    n_hyp = len(hyp_ids)
    hyp_flat, hyp_off = _flatten([np.asarray(h, np.int32) for h in hyp_ids])
    all_refs, groups = [], []
    for i, refs in enumerate(ref_ids):
        for r in refs:
            all_refs.append(np.asarray(r, np.int32))
            groups.append(i)
    ref_flat, ref_off = _flatten(all_refs)
    groups_arr = np.asarray(groups, np.int64)
    per = np.zeros((n_hyp, n), np.float64)
    corpus = np.zeros(n, np.float64)

    def ptr(a, t):
        if a.size == 0:
            a = np.zeros(1, dtype=a.dtype)
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.bleu_score_ids(
        ptr(hyp_flat, ctypes.c_int32), ptr(hyp_off, ctypes.c_int64),
        ctypes.c_int64(n_hyp),
        ptr(ref_flat, ctypes.c_int32), ptr(ref_off, ctypes.c_int64),
        ptr(groups_arr, ctypes.c_int64), ctypes.c_int64(len(all_refs)),
        ctypes.c_int32(n), ctypes.c_int32(_BLEU_OPTIONS[option]),
        ptr(per, ctypes.c_double), ptr(corpus, ctypes.c_double),
    )
    return corpus, per


def _bleu_python_fallback(hyp_ids, ref_ids, n, option):
    from .bleu import corpus_bleu

    hyps = [" ".join(map(str, map(int, h))) for h in hyp_ids]
    refs = [[" ".join(map(str, map(int, r))) for r in rr] for rr in ref_ids]
    bleus, per_lists = corpus_bleu(hyps, refs, n=n, option=option)
    return (np.asarray(bleus),
            np.asarray(per_lists, np.float64).T.reshape(len(hyps), n))


# ---------------------------------------------------------- native ROUGE ----

_ROUGE_LIB = None
_ROUGE_TRIED = False

_ROUGE_SRC = os.path.join(os.path.dirname(_SRC), "rouge_scorer.cpp")


def _build_and_load_rouge():
    global _ROUGE_LIB, _ROUGE_TRIED
    if _ROUGE_TRIED:
        return _ROUGE_LIB
    _ROUGE_TRIED = True
    so_path = os.path.splitext(_ROUGE_SRC)[0] + ".so"
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_ROUGE_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _ROUGE_SRC, "-o", so_path],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.rouge_score_ids.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ]
        lib.rouge_score_ids.restype = None
        _ROUGE_LIB = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        warnings.warn(f"native ROUGE unavailable ({e}); using pure Python")
        _ROUGE_LIB = None
    return _ROUGE_LIB


def rouge_native_available() -> bool:
    return _build_and_load_rouge() is not None


def rouge_score_ids(
    hyp_ids: list[np.ndarray],
    ref_ids: list[list[np.ndarray]],
    beta: float = 1.2,
) -> np.ndarray:
    """Per-hypothesis ROUGE-L over token-id sequences (rouge_l semantics)."""
    lib = _build_and_load_rouge()
    if lib is None:
        return _rouge_python_fallback(hyp_ids, ref_ids, beta)
    n_hyp = len(hyp_ids)
    hyp_flat, hyp_off = _flatten([np.asarray(h, np.int32) for h in hyp_ids])
    all_refs, groups = [], []
    for i, refs in enumerate(ref_ids):
        for r in refs:
            all_refs.append(np.asarray(r, np.int32))
            groups.append(i)
    ref_flat, ref_off = _flatten(all_refs)
    groups_arr = np.asarray(groups, np.int64)
    out = np.zeros(n_hyp, np.float64)

    def ptr(a, t):
        if a.size == 0:
            a = np.zeros(1, dtype=a.dtype)
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.rouge_score_ids(
        ptr(hyp_flat, ctypes.c_int32), ptr(hyp_off, ctypes.c_int64),
        ctypes.c_int64(n_hyp),
        ptr(ref_flat, ctypes.c_int32), ptr(ref_off, ctypes.c_int64),
        ptr(groups_arr, ctypes.c_int64), ctypes.c_int64(len(all_refs)),
        ctypes.c_double(beta), ptr(out, ctypes.c_double),
    )
    return out


def _rouge_python_fallback(hyp_ids, ref_ids, beta):
    from .rouge import rouge_l

    hyps = [" ".join(map(str, map(int, h))) for h in hyp_ids]
    refs = [[" ".join(map(str, map(int, r))) for r in rr] for rr in ref_ids]
    _, per = rouge_l(hyps, refs, beta=beta)
    return np.asarray(per)
