"""Pallas TPU kernel for upfirdn2d — the StyleGAN2 resampling primitive.

TPU-native replacement for the reference CUDA kernel
(modules/psp/stylegan2/op/upfirdn2d_kernel.cu): the 2-D FIR is separable for
every StyleGAN2 blur kernel (make_kernel outer-products a 1-D tap vector), so
the op runs as two 1-D passes. Each pass is one ``pallas_call``:

- the filtered axis is kept ENTIRELY inside the VMEM block, so there are no
  halo exchanges or manual DMA: the grid tiles the batch and the *other*
  spatial axis, and Mosaic's automatic pipelining streams blocks HBM->VMEM;
- zero-insertion upsampling / strided downsampling / edge padding reduce to
  static shifted-slice multiply-adds on the VMEM block (pure VPU work), with
  polyphase decomposition for up=2 (even/odd output rows use disjoint taps);
- each pass moves input once and output once — the bandwidth floor.

Supported modes: (up, down) in {(1,1), (2,1), (1,2)} with arbitrary taps and
pads — exactly the reference kernel's specializations (upfirdn2d_kernel.cu:
177-268 covers the same envelope). Other modes fall back to the lax
formulation (ops/upfirdn2d.py), which is also the autodiff path: the pallas
op carries a custom_vjp whose backward is the transposed resampling with the
flipped kernel (mirroring op/upfirdn2d.py:98-117).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from face_mask_inpaint_tpu.ops import upfirdn2d as lax_ref

__all__ = ["upfirdn2d_pallas", "upfirdn1d_axis"]


def _out_len(n: int, up: int, down: int, pad0: int, pad1: int, k: int) -> int:
    return (n * up + pad0 + pad1 - k) // down + 1


def upfirdn1d_axis(
    x: jax.Array,
    kernel1d: jax.Array,
    axis: int,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] = (0, 0),
    tile: int = 128,
) -> jax.Array:
    """1-D up-FIR-down along ``axis`` (1=H or 2=W) of an NHWC array."""
    assert axis in (1, 2)
    n, h, w, c = x.shape
    ktaps = int(kernel1d.shape[0])
    pad0, pad1 = int(pad[0]), int(pad[1])

    if axis == 1:
        # move H to block axis 1 by gridding W
        l_in, other = h, w
    else:
        l_in, other = w, h
    l_out = _out_len(l_in, up, down, pad0, pad1, ktaps)

    # VMEM-aware tile: the kernel body holds the (double-buffered) input and
    # output blocks, a padded copy, per-phase accumulators and the stacked
    # phases, all in f32 — ~3*(l_in+l_out) live rows per tile column. Lanes
    # pad to 128 on TPU, so small-c inputs cost as much as c=128 (this is
    # what OOM'd the c=8 up=2 validation shape at the old estimate).
    c_eff = -(-c // 128) * 128
    rows = 3 * (l_in + l_out) + 4 * ktaps
    bytes_per_col = rows * c_eff * 4
    budget = 6 * 1024 * 1024
    t = max(8, min(tile, budget // max(bytes_per_col, 1)))
    t = min(t, other)
    # Mosaic sublane constraint: a partial block's second-to-last dim (= t in
    # the H pass) must be a multiple of 8; a block equal to the full axis is
    # always fine.
    if t != other and t % 8:
        t = max(8, t - t % 8)
    grid = (n, -(-other // t))
    other_pad = grid[1] * t - other
    if other_pad:
        pad_cfg = [(0, 0)] * 4
        pad_cfg[2 if axis == 1 else 1] = (0, other_pad)
        x = jnp.pad(x, pad_cfg)

    if axis == 1:
        in_block = (1, l_in, t, c)
        out_block = (1, l_out, t, c)
        in_map = lambda i, j: (i, 0, j, 0)
        out_map = lambda i, j: (i, 0, j, 0)
        filt_axis = 1
    else:
        in_block = (1, t, l_in, c)
        out_block = (1, t, l_out, c)
        in_map = lambda i, j: (i, j, 0, 0)
        out_map = lambda i, j: (i, j, 0, 0)
        filt_axis = 2

    taps = tuple(float(v) for v in np.asarray(kernel1d, np.float64))

    def kernel(x_ref, o_ref):
        xb = x_ref[0]  # [l_in, t, c] for the H pass, [t, l_in, c] for W
        if filt_axis == 1:
            xb = jnp.swapaxes(xb, 0, 1)  # -> [t, l_in, c]
        res = _axis_kernel_body(
            xb, taps, o_ref.dtype, up=up, down=down, pad0=pad0,
            pad1=pad1, ktaps=ktaps,
        )
        if filt_axis == 1:
            res = jnp.swapaxes(res, 0, 1)
        o_ref[0] = res

    out_shape_arr = (
        (n, l_out, grid[1] * t, c) if axis == 1 else (n, grid[1] * t, l_out, c)
    )
    # interpret mode on non-TPU backends (the CPU test mesh)
    interpret = jax.default_backend() != "tpu" and jax.devices()[0].platform not in ("tpu", "axon")
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(in_block, in_map, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(out_block, out_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape_arr, x.dtype),
        interpret=interpret,
    )(x)
    if other_pad:
        if axis == 1:
            out = out[:, :, :other, :]
        else:
            out = out[:, :other, :, :]
    return out


def _axis_kernel_body(x, taps, out_dtype, *, up, down, pad0, pad1, ktaps):
    """Filter block axis 1 of x [T, L_in, C]; returns [T, L_out, C].

    Static shifted-slice multiply-adds only — pure VPU work:
      up=1:       out[o] = sum_t k[t] x[o*down - pad0 + t]
      up=2,down=1 (polyphase): output parity phi reads taps with
                  (phi - pad0 + t) even at input row (phi - pad0 + t)//2 + o//2.
    """
    x = x.astype(jnp.float32)
    k = taps
    t_dim, l_in, c = x.shape
    l_out = _out_len(l_in, up, down, pad0, pad1, ktaps)

    if up == 1:
        lo = max(pad0, 0)
        hi = max(pad1, 0) + down + ktaps
        xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
        acc = jnp.zeros((t_dim, l_out, c), jnp.float32)
        if down == 1:
            for t in range(ktaps):
                acc = acc + k[t] * jax.lax.slice_in_dim(xp, t, t + l_out, axis=1)
        else:  # down == 2: split taps by parity over ONE strided view each —
            # per-tap 2*l_out-row copies would blow the VMEM budget.
            l2 = xp.shape[1] // 2
            pairs = jax.lax.slice_in_dim(xp, 0, 2 * l2, axis=1).reshape(
                t_dim, l2, 2, c)
            even = pairs[:, :, 0, :]  # xp[2j]
            odd = pairs[:, :, 1, :]   # xp[2j+1]
            for t in range(ktaps):
                src = even if t % 2 == 0 else odd
                acc = acc + k[t] * jax.lax.slice_in_dim(
                    src, t // 2, t // 2 + l_out, axis=1)
        return acc.astype(out_dtype)

    assert up == 2 and down == 1
    half = (l_out + 1) // 2 + 1
    slack = ktaps
    # exact right slack: the largest slice needs rows up to
    # slack + ktaps//2 + half; anything more wastes VMEM.
    right = max(0, slack + ktaps // 2 + half - (l_in + slack)) + 1
    xp = jnp.pad(x, ((0, 0), (slack, right), (0, 0)))
    phases = []
    for phase in range(2):
        acc = jnp.zeros((t_dim, half, c), jnp.float32)
        for t in range(ktaps):
            b0 = phase - pad0 + t
            if b0 % 2 != 0:
                continue
            j0 = b0 // 2 + slack
            acc = acc + k[t] * jax.lax.slice_in_dim(xp, j0, j0 + half, axis=1)
        phases.append(acc)
    inter = jnp.stack(phases, axis=2).reshape(t_dim, 2 * half, c)
    return inter[:, :l_out, :].astype(out_dtype)


def _separable_taps(kernel2d: jax.Array):
    """Decompose a rank-1 2-D FIR kernel into (kh, kw) 1-D taps, or None."""
    k = np.asarray(kernel2d, np.float64)
    if k.ndim != 2:
        return None
    u, s, vt = np.linalg.svd(k)
    if s.shape[0] > 1 and s[1] > 1e-6 * s[0]:
        return None
    kh = u[:, 0] * math.sqrt(s[0])
    kw = vt[0] * math.sqrt(s[0])
    # fix sign so taps are positive-sum (blur kernels are nonnegative)
    if kh.sum() < 0:
        kh, kw = -kh, -kw
    return np.asarray(kh, np.float32), np.asarray(kw, np.float32)


@functools.lru_cache(maxsize=None)
def _make_op(kh_taps, kw_taps, up, down, pad, tile):
    """Cached custom_vjp op for one STATIC (taps, mode) signature — the taps
    close over the kernel so only x is traced."""
    kh = np.asarray(kh_taps, np.float32)
    kw = np.asarray(kw_taps, np.float32)
    kernel2d = np.outer(kh, kw)

    @jax.custom_vjp
    def op(x):
        # true convolution = correlation with flipped taps
        y = upfirdn1d_axis(x, kh[::-1], axis=1, up=up, down=down, pad=pad, tile=tile)
        return upfirdn1d_axis(y, kw[::-1], axis=2, up=up, down=down, pad=pad, tile=tile)

    def fwd(x):
        return op(x), x.shape

    def bwd(x_shape, g):
        """Gradient = upfirdn2d with swapped up/down, flipped kernel, and the
        transposed pads (op/upfirdn2d.py:98-117)."""
        ktaps = kh.shape[0]
        pad0, _ = pad
        g_pad0 = ktaps - pad0 - 1
        g_pad1 = x_shape[1] * up - g.shape[1] * down + pad0 - up + 1
        dx = upfirdn2d_pallas(
            g, kernel2d[::-1, ::-1], down, up, (g_pad0, g_pad1), tile
        )
        return (dx,)

    op.defvjp(fwd, bwd)
    return op


def upfirdn2d_pallas(x, kernel, up=1, down=1, pad=(0, 0), tile=128):
    """Pallas-accelerated upfirdn2d on NHWC.

    ``kernel`` must be CONCRETE (numpy or a non-traced jax array) — blur
    kernels are compile-time constants. Falls back to the lax path for traced
    kernels, non-separable kernels, or unsupported modes.
    """
    if isinstance(kernel, jax.core.Tracer):
        return lax_ref.upfirdn2d_lax(x, kernel, up=up, down=down, pad=pad)
    taps = _separable_taps(kernel)
    if taps is None or (up, down) not in ((1, 1), (2, 1), (1, 2)):
        return lax_ref.upfirdn2d_lax(x, kernel, up=up, down=down, pad=pad)
    kh, kw = taps
    op = _make_op(
        tuple(float(v) for v in np.asarray(kh)),
        tuple(float(v) for v in np.asarray(kw)),
        int(up), int(down), (int(pad[0]), int(pad[1])), int(tile),
    )
    return op(x)
