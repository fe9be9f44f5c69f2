"""Native host-path acceleration: compile-on-first-import C++ converters.

Mirrors the reference's JIT-at-import native ops (reference:
op/fused_act.py:11-17 torch.utils.cpp_extension.load) with a dependency-free
recipe: g++ -O3 -march=native -fopenmp -shared, cached by source hash under
~/.cache/maua_tpu, bound via ctypes. All entry points fall back to numpy when
no compiler is available, so the package works everywhere and accelerates
where it can.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "convert.cpp")
_LIB = None
_TRIED = False


def _build() -> "ctypes.CDLL | None":
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "maua_tpu")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"native_{digest}.so")
        if not os.path.exists(so_path):
            cmd = [
                "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
                _SRC, "-o", so_path + ".tmp",
            ]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(so_path + ".tmp", so_path)
        lib = ctypes.CDLL(so_path)
        for name, argtypes in {
            "hwc_u8_to_chw_f32": [ctypes.c_void_p, ctypes.c_void_p] + [ctypes.c_int64] * 3,
            "chw_f32_to_hwc_u8": [ctypes.c_void_p, ctypes.c_void_p] + [ctypes.c_int64] * 3,
            "flip_chw_f32": [ctypes.c_void_p] + [ctypes.c_int64] * 4,
        }.items():
            fn = getattr(lib, name)
            fn.argtypes = argtypes
            fn.restype = None
        return lib
    except Exception as e:  # no compiler / unsupported platform -> numpy fallback
        print(f"maua_tpu.native: C++ build unavailable ({e}); using numpy fallback", file=sys.stderr)
        return None


def _lib():
    global _LIB, _TRIED
    if not _TRIED:
        _LIB = _build()
        _TRIED = True
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def hwc_u8_to_chw_f32(batch: np.ndarray) -> np.ndarray:
    """uint8 [N,H,W,3] -> float32 [N,3,H,W] in [-1,1]."""
    batch = np.ascontiguousarray(batch, dtype=np.uint8)
    n, h, w, c = batch.shape
    assert c == 3
    lib = _lib()
    if lib is None:
        return batch.astype(np.float32).transpose(0, 3, 1, 2) / 127.5 - 1.0
    out = np.empty((n, 3, h, w), np.float32)
    lib.hwc_u8_to_chw_f32(
        batch.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p), n, h, w
    )
    return out


def chw_f32_to_hwc_u8(batch: np.ndarray) -> np.ndarray:
    """float32 [N,3,H,W] in [-1,1] -> uint8 [N,H,W,3] (renderer host fallback)."""
    batch = np.ascontiguousarray(batch, dtype=np.float32)
    n, c, h, w = batch.shape
    assert c == 3
    lib = _lib()
    if lib is None:
        clipped = np.clip(batch, -1.0, 1.0)
        return ((clipped.transpose(0, 2, 3, 1) + 1.0) * 127.5 + 0.5).astype(np.uint8)
    out = np.empty((n, h, w, 3), np.uint8)
    lib.chw_f32_to_hwc_u8(
        batch.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p), n, h, w
    )
    return out


def flip_chw_f32(batch: np.ndarray) -> np.ndarray:
    """In-place horizontal flip of float32 [N,C,H,W]; returns the array."""
    assert batch.dtype == np.float32 and batch.flags.c_contiguous
    lib = _lib()
    if lib is None:
        batch[:] = batch[:, :, :, ::-1]
        return batch
    n, c, h, w = batch.shape
    lib.flip_chw_f32(batch.ctypes.data_as(ctypes.c_void_p), n, c, h, w)
    return batch
