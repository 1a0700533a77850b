"""Native (C++) host-side components, built on demand and bound via ctypes.

``imageops``: PIL-bit-parity batched bilinear resize + eval transform
(Resize + CenterCrop) with OpenMP across images — the native replacement for
the reference's per-sample torchvision/PIL calls (see imageops.cpp). The
shared library is compiled with g++ on first use and cached beside the source
(rebuilt when the source is newer).

Falls back gracefully: ``available()`` is False when no compiler is present,
and callers (vitef_tpu.data.images.loader) use the PIL path instead.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger("vitef")

_SRC = Path(__file__).parent / "imageops.cpp"
_LIB = Path(__file__).parent / "_imageops.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as e:
        err = getattr(e, "stderr", b"")
        logger.warning("native imageops build failed: %s %s", e,
                       err.decode() if isinstance(err, bytes) else err)
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(str(_LIB))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.resize_bilinear_batch.argtypes = [u8p, u8p] + [ctypes.c_int] * 6
        lib.resize_bilinear_batch.restype = None
        lib.eval_transform_batch.argtypes = [u8p, u8p] + [ctypes.c_int] * 5
        lib.eval_transform_batch.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear_batch(batch: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(N, H, W, C) uint8 → (N, out_h, out_w, C) uint8, PIL-BILINEAR-exact."""
    lib = _load()
    assert lib is not None, "native imageops unavailable"
    batch = np.ascontiguousarray(batch, dtype=np.uint8)
    n, h, w, c = batch.shape
    out = np.empty((n, out_h, out_w, c), np.uint8)
    lib.resize_bilinear_batch(_as_u8p(batch), _as_u8p(out), n, h, w, c,
                              out_h, out_w)
    return out


def eval_transform_batch(batch: np.ndarray, size: int) -> np.ndarray:
    """(N, H, W, C) uint8 → (N, size, size, C) uint8: torchvision
    Resize(shorter→size) + CenterCrop(size), PIL-parity, OpenMP over images."""
    lib = _load()
    assert lib is not None, "native imageops unavailable"
    batch = np.ascontiguousarray(batch, dtype=np.uint8)
    n, h, w, c = batch.shape
    out = np.empty((n, size, size, c), np.uint8)
    lib.eval_transform_batch(_as_u8p(batch), _as_u8p(out), n, h, w, c, size)
    return out
