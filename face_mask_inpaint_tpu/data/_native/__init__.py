"""Native (C++) host-side data-path kernels, loaded via ctypes.

Build: ``python -m face_mask_inpaint_tpu.data._native`` (or it builds lazily
on first use). Falls back to numpy transparently when no compiler is
available — every consumer works either way.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import sysconfig
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_DIR = Path(__file__).parent
_SRC = _DIR / "collate.cpp"
_SO = _DIR / "libfmi_collate.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> Optional[Path]:
    """Compile the extension with g++; returns the .so path or None."""
    if _SO.exists() and not force and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", str(_SRC), "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _SO
    except (OSError, subprocess.CalledProcessError) as e:
        log.warning("native collate build failed (%s); using numpy fallback", e)
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = build()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    lib.collate_images_u8.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.collate_masks_i64.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.collate_f32.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.native_collate_abi_version.restype = ctypes.c_int
    assert lib.native_collate_abi_version() == 1
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr_array(arrays: list[np.ndarray]):
    ptrs = (ctypes.c_void_p * len(arrays))()
    for i, a in enumerate(arrays):
        ptrs[i] = a.ctypes.data_as(ctypes.c_void_p)
    return ptrs


def collate_images_u8(images: list[np.ndarray], normalize: bool) -> np.ndarray:
    """uint8 HWC images -> float32 NHWC batch (/255, optional +-1 norm)."""
    lib = _load()
    h, w, c = images[0].shape
    if lib is None:
        batch = np.stack(images).astype(np.float32) / 255.0
        return (batch - 0.5) / 0.5 if normalize else batch
    images = [np.ascontiguousarray(a) for a in images]
    out = np.empty((len(images), h, w, c), np.float32)
    lib.collate_images_u8(
        _ptr_array(images), len(images), h, w, c, int(normalize),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def collate_masks_i64(masks: list[np.ndarray], binarize: bool = True) -> np.ndarray:
    """int64 HW masks -> int32 batch, optionally binarized (mask > 0)."""
    lib = _load()
    if lib is None:
        batch = np.stack(masks)
        return (batch > 0).astype(np.int32) if binarize else batch.astype(np.int32)
    masks = [np.ascontiguousarray(a, np.int64) for a in masks]
    h, w = masks[0].shape
    out = np.empty((len(masks), h, w), np.int32)
    lib.collate_masks_i64(
        _ptr_array(masks), len(masks), h, w, int(binarize),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def collate_f32(items: list[np.ndarray]) -> np.ndarray:
    """Stack contiguous float32 items along a new batch axis."""
    lib = _load()
    if lib is None:
        return np.stack(items)
    items = [np.ascontiguousarray(a, np.float32) for a in items]
    out = np.empty((len(items), *items[0].shape), np.float32)
    lib.collate_f32(
        _ptr_array(items), len(items), items[0].size,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


if __name__ == "__main__":
    print("built:", build(force=True))
