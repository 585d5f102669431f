"""ctypes bindings for the native C++ CIDEr scorer (``native/cider_scorer.cpp``).

Builds the shared library on first use with g++ (cached next to the source);
falls back to the pure-Python scorer when a toolchain is unavailable.  The
native path consumes token-id sequences directly — no string round trip — and
matches the Python/pycocoevalcap semantics exactly (tested)."""

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
