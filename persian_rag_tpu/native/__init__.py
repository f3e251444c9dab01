"""ctypes loader for the native lexical builder.

Compiles persian_rag_tpu/native/lexical_native.cpp to liblexical.so on
first use (g++ is in the base image; ~2 s) and exposes
`bm25_build_ell(texts, k1, b, epsilon)`. Falls back gracefully: callers
check `available()` and keep the pure-Python path when compilation or
loading fails.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lexical_native.cpp")
_LIB_PATH = os.path.join(_HERE, "liblexical.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _compile() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                _SRC, "-o", _LIB_PATH,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            if not _compile():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None
        lib.bm25_build.restype = ctypes.c_void_p
        lib.bm25_build.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_double,
        ]
        for name, restype in (
            ("bm25_ell_width", ctypes.c_int64),
            ("bm25_vocab_size", ctypes.c_int64),
            ("bm25_vocab_bytes", ctypes.c_int64),
            ("bm25_avgdl", ctypes.c_double),
        ):
            fn = getattr(lib, name)
            fn.restype = restype
            fn.argtypes = [ctypes.c_void_p]
        lib.bm25_fill_ell.restype = None
        lib.bm25_fill_ell.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.bm25_export_vocab.restype = None
        lib.bm25_export_vocab.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.bm25_export_idf.restype = None
        lib.bm25_export_idf.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.bm25_free.restype = None
        lib.bm25_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def bm25_build_ell(
    texts: List[str], k1: float = 1.5, b: float = 0.75, epsilon: float = 0.25
) -> Tuple[np.ndarray, np.ndarray, Dict[str, int], Dict[str, float], float]:
    """Build BM25 ELL arrays natively.

    Returns (doc_ids (N, L) int32, doc_vals (N, L) float32,
             vocab term->id, idf term->value, avgdl).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native lexical library unavailable")

    encoded = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(len(encoded) + 1, np.int64)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    buffer = b"".join(encoded)

    handle = lib.bm25_build(
        buffer,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(encoded),
        k1,
        b,
        epsilon,
    )
    try:
        ell = lib.bm25_ell_width(handle)
        vocab_size = lib.bm25_vocab_size(handle)
        avgdl = lib.bm25_avgdl(handle)
        ids = np.empty((len(encoded), ell), np.int32)
        vals = np.empty((len(encoded), ell), np.float32)
        lib.bm25_fill_ell(
            handle,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        nbytes = lib.bm25_vocab_bytes(handle)
        vocab_buf = ctypes.create_string_buffer(max(nbytes, 1))
        vocab_offsets = np.empty(vocab_size + 1, np.int64)
        lib.bm25_export_vocab(
            handle,
            vocab_buf,
            vocab_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        idf_arr = np.empty(vocab_size, np.float64)
        lib.bm25_export_idf(
            handle, idf_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        )
        raw = vocab_buf.raw
        vocab: Dict[str, int] = {}
        idf: Dict[str, float] = {}
        for i in range(vocab_size):
            term = raw[vocab_offsets[i] : vocab_offsets[i + 1]].decode("utf-8")
            vocab[term] = i
            idf[term] = float(idf_arr[i])
        return ids, vals, vocab, idf, float(avgdl)
    finally:
        lib.bm25_free(handle)
