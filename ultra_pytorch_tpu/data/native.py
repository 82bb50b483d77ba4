"""ctypes bindings for the native LETOR parser (native/letor_parser.cpp).

Builds the shared library on first use (g++ is part of the toolchain) and
exposes :func:`parse_letor_file`. All loaders fall back to pure Python when
the native build is unavailable, so this is a pure acceleration layer for
MSLR/Istella-scale ingestion.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libletor_parser.so")

ID_BYTES = 48

FORMAT_LIBSVM = 0
FORMAT_ULTRA = 1


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "letor_parser.cpp")
    if not os.path.isfile(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             "-o", _SO_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.isfile(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.letor_count.restype = ctypes.c_int64
        lib.letor_count.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64)]
        lib.letor_parse.restype = ctypes.c_int64
        lib.letor_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_char_p, ctypes.c_int64]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return get_lib() is not None


def parse_letor_file(path: str, fmt: int,
                     feature_size: Optional[int] = None
                     ) -> Optional[Tuple[np.ndarray, np.ndarray, list]]:
    """Parse a LETOR text file natively.

    Args:
      path: file path.
      fmt: FORMAT_LIBSVM (label qid:X idx:val...) or FORMAT_ULTRA
        (did idx:val...).
      feature_size: dense width; inferred from the file when None.

    Returns:
      (features [rows, feature_size] float32,
       labels [rows] float32 (zeros for ULTRA format),
       ids list of str (qids for libsvm, dids for ULTRA)),
      or None when the native library is unavailable / IO failed.
    """
    lib = get_lib()
    if lib is None:
        return None
    max_feat = ctypes.c_int64(0)
    rows = lib.letor_count(path.encode(), fmt, ctypes.byref(max_feat))
    if rows < 0:
        return None
    n_feat = int(feature_size or max_feat.value)
    features = np.zeros((rows, n_feat), dtype=np.float32)
    labels = np.zeros((rows,), dtype=np.float32)
    ids = np.zeros((rows * ID_BYTES,), dtype=np.uint8)
    got = lib.letor_parse(
        path.encode(), fmt, n_feat,
        features.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ids.ctypes.data_as(ctypes.c_char_p), ID_BYTES)
    if got != rows:
        return None
    id_list = [
        ids[i * ID_BYTES:(i + 1) * ID_BYTES].tobytes().rstrip(b"\0").decode()
        for i in range(rows)
    ]
    return features, labels, id_list
