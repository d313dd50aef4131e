"""ctypes wrapper for the native C++ clip loader.

Builds/loads ``native/libclip_loader.so`` — JPEG decode + top crop +
bilinear resize + ImageNet normalize, OpenMP-parallel over a clip's
frames, materialising the float32 NHWC tensor in one C call (the native
equivalent of the reference's DataLoader-worker cv2 loop,
``dataV3.py:154-176``). Decode uses the system libjpeg and resize follows
cv2.INTER_LINEAR geometry, so outputs match the cv2 path to ~1e-3.

Opt-in fast path: readers fall back to cv2 when the toolchain or .so is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

from .transforms import IMAGENET_MEAN, IMAGENET_STD

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libclip_loader.so")
_lib = None


def build(force: bool = False) -> bool:
    if os.path.exists(_SO_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.decode_clip_rgb.restype = ctypes.c_int
    lib.decode_clip_rgb.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, fp, fp, fp,
    ]
    lib.decode_clip_gray.restype = ctypes.c_int
    lib.decode_clip_gray.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, fp,
    ]
    if hasattr(lib, "decode_clip_rgb_s2d"):
        lib.decode_clip_rgb_s2d.restype = ctypes.c_int
        lib.decode_clip_rgb_s2d.argtypes = lib.decode_clip_rgb.argtypes
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def decode_clip(paths: Sequence[str], cut_px: int, out_h: int, out_w: int,
                mean: Optional[np.ndarray] = None,
                std: Optional[np.ndarray] = None) -> np.ndarray:
    """Decode+crop+resize+normalize RGB JPEGs -> [n, out_h, out_w, 3] f32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native clip loader unavailable")
    mean = np.ascontiguousarray(
        IMAGENET_MEAN if mean is None else mean, np.float32)
    std = np.ascontiguousarray(
        IMAGENET_STD if std is None else std, np.float32)
    out = np.empty((len(paths), out_h, out_w, 3), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.decode_clip_rgb(
        _paths_array(paths), len(paths), cut_px, out_h, out_w,
        mean.ctypes.data_as(fp), std.ctypes.data_as(fp),
        out.ctypes.data_as(fp),
    )
    if rc:
        raise IOError(f"failed to decode frame {rc - 1}: {paths[rc - 1]}")
    return out


def decode_clip_s2d(paths: Sequence[str], cut_px: int, out_h: int,
                    out_w: int,
                    mean: Optional[np.ndarray] = None,
                    std: Optional[np.ndarray] = None) -> np.ndarray:
    """Like :func:`decode_clip` but emitting the 2x2 space-to-depth
    layout -> [n, out_h/2, out_w/2, 12] f32 — the TPU serving stem's
    input (``ModelConfig.packed_frames="s2d"``). The decoder writes
    every pixel anyway, so the packed layout costs nothing here and
    saves the device a thin-channel layout copy per tick."""
    lib = _load()
    if lib is None or not hasattr(lib, "decode_clip_rgb_s2d"):
        raise RuntimeError("native clip loader unavailable (rebuild: "
                           "make -C phnet_tpu/data/native)")
    mean = np.ascontiguousarray(
        IMAGENET_MEAN if mean is None else mean, np.float32)
    std = np.ascontiguousarray(
        IMAGENET_STD if std is None else std, np.float32)
    out = np.empty((len(paths), out_h // 2, out_w // 2, 12), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.decode_clip_rgb_s2d(
        _paths_array(paths), len(paths), cut_px, out_h, out_w,
        mean.ctypes.data_as(fp), std.ctypes.data_as(fp),
        out.ctypes.data_as(fp),
    )
    if rc == -1:
        raise ValueError("out_h/out_w must be even for s2d decode")
    if rc:
        raise IOError(f"failed to decode frame {rc - 1}: {paths[rc - 1]}")
    return out


def decode_clip_gray(paths: Sequence[str], cut_px: int, out_h: int,
                     out_w: int) -> np.ndarray:
    """Decode+crop+resize grayscale JPEGs -> [n, out_h, out_w] f32 bytes."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native clip loader unavailable")
    out = np.empty((len(paths), out_h, out_w), np.float32)
    rc = lib.decode_clip_gray(
        _paths_array(paths), len(paths), cut_px, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc:
        raise IOError(f"failed to decode frame {rc - 1}: {paths[rc - 1]}")
    return out
