"""Host-side image save/convert helpers shared by the inference CLIs."""

from __future__ import annotations

import numpy as np
from PIL import Image

__all__ = ["tensor2im", "tensor2im_pm1", "mask2im"]


def tensor2im(img_hwc: np.ndarray) -> Image.Image:
    """[H, W, C] float in [0, 1] -> PIL (PICNet_inference.py:112-117)."""
    var = np.asarray(img_hwc, np.float32).copy()
    var[var < 0] = 0
    var[var > 1] = 1
    return Image.fromarray((var * 255).astype("uint8"))


def tensor2im_pm1(img_hwc: np.ndarray) -> Image.Image:
    """[H, W, C] float in [-1, 1] -> PIL (psp_inference.py:106-112)."""
    return tensor2im((np.asarray(img_hwc, np.float32) + 1.0) / 2.0)


def mask2im(mask_hw: np.ndarray) -> Image.Image:
    """[H, W] float mask -> 3-channel PIL."""
    return tensor2im(np.repeat(np.asarray(mask_hw)[..., None], 3, axis=-1))
