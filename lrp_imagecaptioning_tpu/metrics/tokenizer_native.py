"""ctypes bindings for the native C++ PTB tokenizer
(``native/ptb_tokenizer.cpp``) — the second half of SURVEY.md §2's "C++ PTB
tokenizer + native n-gram scorers" mandate (CIDEr: ``native.py``).

Builds with g++ on first use (cached ``.so`` next to the source) and degrades
to ``None`` when no toolchain exists; ``tokenizer.py`` falls back to the
pure-Python scanner.  Both implementations are held equal by the golden
suite plus a randomized cross-check in ``tests/test_ptb_golden.py``."""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

_LIB = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "ptb_tokenizer.cpp",
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
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", so_path],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.ptb_tokenize_sentence_c.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.ptb_tokenize_sentence_c.restype = ctypes.c_int64
        _LIB = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        warnings.warn(f"native PTB tokenizer unavailable ({e}); using pure Python")
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def ptb_tokenize_sentence_native(sentence: str) -> str:
    """Tokenize one sentence via the C++ scanner.  Caller guarantees
    :func:`native_available`."""
    lib = _build_and_load()
    raw = sentence.encode("utf-8")
    # tokenized output is at most ~2x the input (clitic spaces, bracket
    # escapes); retry with the exact size on the rare overflow
    cap = 2 * len(raw) + 64
    buf = ctypes.create_string_buffer(cap)
    need = lib.ptb_tokenize_sentence_c(raw, len(raw), buf, cap)
    if need > cap:  # pragma: no cover - pathological escape-heavy input
        buf = ctypes.create_string_buffer(need)
        lib.ptb_tokenize_sentence_c(raw, len(raw), buf, need)
    return buf.raw[: min(need, len(buf.raw))].decode("utf-8")
