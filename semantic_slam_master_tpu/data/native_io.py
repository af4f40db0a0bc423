"""ctypes bindings for the native C++ frame loader (native/semslam_io.cpp).

The TPU frontend sustains >10k frames/sec, so host PNG decoding is the
input-pipeline bottleneck; the native loader decodes a whole batch with
a C++ thread pool in one call. Falls back to PIL transparently when the
shared library is missing; `ensure_built()` compiles it on demand with
the repo Makefile (g++ + libpng, both baked into the image).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libsemslam_io.so"
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def ensure_built(quiet: bool = True) -> bool:
    """Build the shared library if absent. Returns availability."""
    if _LIB_PATH.exists():
        return True
    if not (_NATIVE_DIR / "semslam_io.cpp").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return _LIB_PATH.exists()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not ensure_built():
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _lib_failed = True
        return None
    lib.ssm_png_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ssm_png_info.restype = ctypes.c_int
    lib.ssm_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.ssm_load_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def png_info(path: str | Path):
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    rc = lib.ssm_png_info(str(path).encode(), w, h, c, b)
    if rc != 0:
        raise IOError(f"cannot decode {path}")
    return w.value, h.value, c.value, b.value


def _paths_array(paths: Optional[Sequence]):
    if paths is None:
        return None
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [str(p).encode() for p in paths]
    return arr


def load_batch(
    rgb_paths: Optional[Sequence],
    depth_paths: Optional[Sequence],
    width: int = 640,
    height: int = 480,
    depth_scale: float = 5000.0,
    num_threads: int = 8,
):
    """Decode a batch of frames natively.

    Returns (rgb (N, H, W, 3) float32 [0,1] or None,
             depth (N, H, W) float32 meters or None).
    """
    lib = _load()
    n = len(rgb_paths) if rgb_paths is not None else len(depth_paths)
    if lib is None:
        return _load_batch_pil(rgb_paths, depth_paths, depth_scale)

    rgb_out = np.empty((n, height, width, 3), np.float32) if rgb_paths else None
    depth_out = np.empty((n, height, width), np.float32) if depth_paths else None
    rc = lib.ssm_load_batch(
        _paths_array(rgb_paths),
        _paths_array(depth_paths),
        n,
        width,
        height,
        depth_scale,
        rgb_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if rgb_out is not None else None,
        depth_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if depth_out is not None else None,
        num_threads,
    )
    if rc != 0:
        idx = -rc - 1
        bad = (rgb_paths or depth_paths)[idx]
        raise IOError(f"native decode failed at frame {idx}: {bad}")
    return rgb_out, depth_out


def _load_batch_pil(rgb_paths, depth_paths, depth_scale):
    """Pure-Python fallback (same output contract)."""
    from PIL import Image

    rgb_out = depth_out = None
    if rgb_paths is not None:
        rgb_out = np.stack(
            [
                np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
                for p in rgb_paths
            ]
        )
    if depth_paths is not None:
        depth_out = np.stack(
            [np.asarray(Image.open(p), np.float32) / depth_scale for p in depth_paths]
        )
    return rgb_out, depth_out
