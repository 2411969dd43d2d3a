"""ctypes bridge to the native data-loading core (nesie_tpu/native/).

Falls back to the pure-Python path transparently when the shared library
hasn't been built (``make -C nesie_tpu/native``)."""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libdataio.so"
_lib = None


def _load_lib(build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and build:
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.load_scene.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.load_scene.restype = ctypes.c_int
    lib.scene_num_points.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.scene_num_points.restype = ctypes.c_long
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def load_scene_native(path, axis_align, num_points: int, seed: int,
                      load_dim: int = 6):
    """One-pass load + align + height + sample -> (num_points, 4) float32.

    Returns None when the native library is unavailable (caller falls back
    to the Python pipeline).
    """
    lib = _load_lib()
    if lib is None:
        return None
    out = np.empty((num_points, 4), np.float32)
    aam = None
    if axis_align is not None:
        aam_arr = np.ascontiguousarray(axis_align, np.float32).reshape(16)
        aam = aam_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.load_scene(
        str(path).encode(),
        load_dim,
        aam,
        num_points,
        ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"native load_scene({path}) failed with code {rc}")
    return out
