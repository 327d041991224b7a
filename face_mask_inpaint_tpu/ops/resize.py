"""Exact-PyTorch-semantics spatial resampling, expressed as MXU matmuls.

The reference uses three torch resamplers whose numerics we must match:

- ``F.interpolate(mode='bilinear', align_corners=True)``
  (reference modules/model.py:10-12 ``scale_img``; unet_parts.py Up)
- ``nn.AdaptiveAvgPool2d`` (reference modules/model.py:79; psp.py:33)
- ``F.pad`` / ``nn.ReflectionPad2d`` (reference base_function.py Output)

JAX's ``jax.image.resize`` implements the half-pixel (align_corners=False)
convention only, and has no adaptive pooling. Instead of gather-based
emulation we build small dense interpolation matrices at trace time (shapes
are static under jit) and apply them as two matmuls over the spatial axes:

    out[n, i, j, c] = sum_{h,w} A_h[i, h] * x[n, h, w, c] * A_w[j, w]

Each row of A has at most two non-zeros (bilinear) or a contiguous averaging
window (adaptive pool), so the matrices are tiny (H_out x H_in); on TPU the
einsum maps straight onto the MXU and XLA fuses the two contractions. This is
both exact and faster than gathers for the feature-map sizes in this model
family (<= 1024).

All functions take NHWC arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "bilinear_resize",
    "scale_img",
    "adaptive_avg_pool2d",
    "nearest_resize",
    "reflection_pad2d",
    "avg_pool2d",
    "max_pool2d",
    "upsample2x_nearest",
]


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense [out_size, in_size] bilinear interpolation matrix.

    align_corners=True:  src = i * (in-1)/(out-1)            (torch semantics)
    align_corners=False: src = (i + 0.5) * in/out - 0.5, clamped to [0, in-1]
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float64)
    idx = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros(1, dtype=np.float64)
        else:
            src = idx * (in_size - 1) / (out_size - 1)
    else:
        src = np.clip((idx + 0.5) * in_size / out_size - 0.5, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), 1.0 - frac)
    np.add.at(mat, (rows, hi), frac)
    return mat


@functools.lru_cache(maxsize=None)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out_size, in_size] adaptive average-pooling matrix.

    Matches torch.nn.AdaptiveAvgPool2d: output bin i averages input indices
    [floor(i*in/out), ceil((i+1)*in/out)).
    """
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil((i+1)*in/out)
        mat[i, start:end] = 1.0 / (end - start)
    return mat


@functools.lru_cache(maxsize=None)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out_size, in_size] nearest-neighbour matrix (torch 'nearest')."""
    idx = np.arange(out_size, dtype=np.float64)
    src = np.floor(idx * in_size / out_size).astype(np.int64)
    src = np.clip(src, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    mat[np.arange(out_size), src] = 1.0
    return mat


def _apply_spatial_matrices(x: jax.Array, mat_h: np.ndarray, mat_w: np.ndarray) -> jax.Array:
    """out[n,i,j,c] = sum_{h,w} mat_h[i,h] x[n,h,w,c] mat_w[j,w]."""
    dtype = x.dtype
    if dtype == jnp.bfloat16:
        # bf16 MXU matmuls with f32 accumulation — 6x cheaper than f32
        # HIGHEST and well within interpolation tolerance.
        ah = jnp.asarray(mat_h, dtype=jnp.bfloat16)
        aw = jnp.asarray(mat_w, dtype=jnp.bfloat16)
        y = jnp.einsum("ih,nhwc->niwc", ah, x, preferred_element_type=jnp.float32)
        y = jnp.einsum(
            "jw,niwc->nijc", aw, y.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return y.astype(dtype)
    # f32 path: exact-as-possible contraction for parity with torch.
    cdtype = jnp.promote_types(dtype, jnp.float32)
    ah = jnp.asarray(mat_h, dtype=cdtype)
    aw = jnp.asarray(mat_w, dtype=cdtype)
    y = jnp.einsum(
        "ih,nhwc->niwc", ah, x.astype(cdtype), precision=jax.lax.Precision.HIGHEST
    )
    y = jnp.einsum("jw,niwc->nijc", aw, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(dtype)


def bilinear_resize(x: jax.Array, size: tuple[int, int], align_corners: bool = True) -> jax.Array:
    """Bilinear resize of an NHWC array, exactly matching
    ``F.interpolate(mode='bilinear', align_corners=...)``."""
    h_out, w_out = int(size[0]), int(size[1])
    n, h, w, c = x.shape
    if (h, w) == (h_out, w_out):
        return x
    return _apply_spatial_matrices(
        x, _bilinear_matrix(h, h_out, align_corners), _bilinear_matrix(w, w_out, align_corners)
    )


def scale_img(img: jax.Array, size: tuple[int, int]) -> jax.Array:
    """NHWC equivalent of the reference's ``scale_img``
    (modules/model.py:10-12): bilinear, align_corners=True."""
    return bilinear_resize(img, size, align_corners=True)


def adaptive_avg_pool2d(x: jax.Array, output_size: tuple[int, int] | int) -> jax.Array:
    """NHWC equivalent of torch.nn.AdaptiveAvgPool2d."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    h_out, w_out = int(output_size[0]), int(output_size[1])
    n, h, w, c = x.shape
    if (h, w) == (h_out, w_out):
        return x
    return _apply_spatial_matrices(
        x, _adaptive_avg_matrix(h, h_out), _adaptive_avg_matrix(w, w_out)
    )


def nearest_resize(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize of an NHWC array (torch 'nearest' convention)."""
    h_out, w_out = int(size[0]), int(size[1])
    n, h, w, c = x.shape
    if (h, w) == (h_out, w_out):
        return x
    return _apply_spatial_matrices(x, _nearest_matrix(h, h_out), _nearest_matrix(w, w_out))


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Fast 2x nearest upsampling (pure reshape/broadcast, no matmul)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def reflection_pad2d(x: jax.Array, pad: int) -> jax.Array:
    """NHWC equivalent of nn.ReflectionPad2d(pad)."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def avg_pool2d(x: jax.Array, window: int = 2, stride: int | None = None) -> jax.Array:
    """NHWC average pool (torch AvgPool2d, count_include_pad irrelevant: no pad)."""
    stride = window if stride is None else stride
    y = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1), "VALID"
    )
    return y / float(window * window)


def max_pool2d(x: jax.Array, window: int = 2, stride: int | None = None) -> jax.Array:
    """NHWC max pool (torch MaxPool2d, no padding)."""
    stride = window if stride is None else stride
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), "VALID"
    )
