"""SSIM / MS-SSIM, compatible with the external ``pytorch_msssim`` package the
reference uses everywhere (PICNet_inference.py:8, dataloader.py:16).

Semantics pinned to pytorch_msssim defaults: gaussian window 11, sigma 1.5,
K=(0.01, 0.03), valid (no-pad) filtering, separable gaussian; MS-SSIM with
weights (0.0448, 0.2856, 0.3001, 0.2363, 0.1333), avg-pool 2 downsampling with
odd-size padding, relu on intermediate cs terms.

Inputs are NHWC float arrays in [0, data_range]. Everything is jittable and
runs on-device (the reference computes these on GPU tensors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from face_mask_inpaint_tpu.ops.conv import depthwise_conv2d

__all__ = ["ssim", "ms_ssim"]

_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.lru_cache(maxsize=None)
def _gauss_1d(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_filter(x: jax.Array, win: jax.Array) -> jax.Array:
    """Separable valid-mode gaussian blur over NHWC."""
    k = win.shape[0]
    x = depthwise_conv2d(x, win.reshape(k, 1), padding=0)
    return depthwise_conv2d(x, win.reshape(1, k), padding=0)


def _ssim_and_cs(x, y, win, data_range, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu1 = _gaussian_filter(x, win)
    mu2 = _gaussian_filter(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter(x * y, win) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    # per-sample means over spatial+channel (pytorch_msssim flattens from dim 1)
    ssim_per = jnp.mean(ssim_map, axis=(1, 2, 3))
    cs_per = jnp.mean(cs_map, axis=(1, 2, 3))
    return ssim_per, cs_per


def ssim(
    x: jax.Array,
    y: jax.Array,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    size_average: bool = True,
) -> jax.Array:
    """SSIM over NHWC images; size_average collapses the batch mean."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    win = jnp.asarray(_gauss_1d(win_size, win_sigma))
    s, _ = _ssim_and_cs(x, y, win, data_range)
    return jnp.mean(s) if size_average else s


def _avg_pool_pad_odd(x: jax.Array) -> jax.Array:
    """pytorch_msssim downsample: avg_pool2d(kernel=2, padding=shape%2)."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    y = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return y / 4.0


def ms_ssim(
    x: jax.Array,
    y: jax.Array,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    size_average: bool = True,
    weights=_MS_WEIGHTS,
) -> jax.Array:
    """MS-SSIM over NHWC images (5 scales by default).

    Requires spatial dims > (win_size - 1) * 2**4, as pytorch_msssim asserts.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    win = jnp.asarray(_gauss_1d(win_size, win_sigma))
    w = jnp.asarray(weights, jnp.float32)
    levels = len(weights)
    mcs = []
    s = None
    for i in range(levels):
        s, cs = _ssim_and_cs(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _avg_pool_pad_odd(x)
            y = _avg_pool_pad_odd(y)
    s = jax.nn.relu(s)
    mcs_stack = jnp.stack(mcs, axis=0)  # [levels-1, N]
    out = jnp.prod(mcs_stack ** w[:-1, None], axis=0) * (s ** w[-1])
    return jnp.mean(out) if size_average else out
