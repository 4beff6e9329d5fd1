"""ctypes bindings for the native C++ tokenizer/parser.

Builds ``libsc_native.so`` on first use with g++ (no pybind11 in the image;
the C ABI + ctypes keeps the binding dependency-free).  Every entry point
degrades gracefully to the pure-Python implementations when the toolchain or
the .so is unavailable, so the framework never hard-depends on native code.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / 'src' / 'formula_tokenizer.cpp'
_SO = _DIR / 'libsc_native.so'

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_init_done = False


def build(force: bool = False) -> bool:
    """Compile the shared library. Returns True on success."""
    if _SO.exists() and not force:
        return True
    try:
        subprocess.run(
            ['g++', '-O3', '-std=c++17', '-shared', '-fPIC',
             str(_SRC), '-o', str(_SO)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _SO.exists() and not build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            if not build(force=True):
                return None
            lib = ctypes.CDLL(str(_SO))
        lib.sc_init.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int]
        lib.sc_tokenize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        lib.sc_tokenize_batch.restype = ctypes.c_int
        lib.sc_parse_compositions.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8)]
        lib.sc_parse_compositions.restype = ctypes.c_int
        _lib = lib
        return _lib


def _c_strings(strings: List[str]):
    arr = (ctypes.c_char_p * len(strings))()
    encoded = [s.encode() for s in strings]
    arr[:] = encoded
    return arr, encoded  # keep encoded alive


def available() -> bool:
    return _load() is not None


def ensure_init(tokenizer) -> bool:
    """Load + initialize the native vocab from a FractionAwareTokenizer."""
    global _init_done
    lib = _load()
    if lib is None:
        return False
    with _lock:
        if _init_done:
            return True
        fr, _k1 = _c_strings(tokenizer.fractions)
        iso, _k2 = _c_strings(tokenizer.isotopes)
        lib.sc_init(fr, len(tokenizer.fractions), iso,
                    len(tokenizer.isotopes))
        _init_done = True
        return True


def tokenize_batch(formulas: List[str], tokenizer,
                   max_len: Optional[int] = None) -> Optional[np.ndarray]:
    """Native batch encode; None when native path unavailable."""
    if not ensure_init(tokenizer):
        return None
    lib = _load()
    max_len = max_len or tokenizer.max_len
    out = np.zeros((len(formulas), max_len), np.int32)
    arr, _keep = _c_strings(formulas)
    rc = lib.sc_tokenize_batch(
        arr, len(formulas), max_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out if rc == 0 else None


def parse_compositions(formulas: List[str], tokenizer,
                       max_elements: int = 12
                       ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native batch composition parse; None when unavailable."""
    if not ensure_init(tokenizer):
        return None
    lib = _load()
    n = len(formulas)
    idx = np.zeros((n, max_elements), np.int32)
    frac = np.zeros((n, max_elements), np.float32)
    mask = np.zeros((n, max_elements), np.uint8)
    arr, _keep = _c_strings(formulas)
    rc = lib.sc_parse_compositions(
        arr, n, max_elements,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        frac.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return idx, frac, mask.astype(bool)
