"""Pallas TPU kernel for fused_bias_act (bias + LeakyReLU(0.2) * sqrt(2)).

Counterpart of the reference CUDA op (op/fused_bias_act_kernel.cu). On TPU
XLA fuses this epilogue on its own, so the kernel exists for use inside
larger hand-written kernels and to mirror the reference's native-op surface;
the custom_vjp reproduces the CUDA backward's saved-output-sign trick
(fused_bias_act_kernel.cu:36-45): d/dx = scale * (1 if y >= 0 else slope),
d/dbias = channel-sum of d/dx.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_leaky_relu_pallas"]

_SQRT2 = math.sqrt(2.0)


def _interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


def _fwd_kernel(x_ref, b_ref, o_ref, *, slope, scale):
    v = x_ref[...] + b_ref[...]
    o_ref[...] = jnp.where(v >= 0, v, v * slope) * scale


def _bwd_kernel(y_ref, g_ref, o_ref, *, slope, scale):
    factor = jnp.where(y_ref[...] >= 0, scale, slope * scale)
    o_ref[...] = g_ref[...] * factor


def _run_fwd(x2, b2, slope, scale, rows):
    return pl.pallas_call(
        functools.partial(_fwd_kernel, slope=slope, scale=scale),
        grid=(pl.cdiv(x2.shape[0], rows),),
        in_specs=[
            pl.BlockSpec((rows, x2.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, x2.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, x2.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        interpret=_interpret(),
    )(x2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_leaky_relu_pallas(
    x: jax.Array,
    bias: jax.Array,
    negative_slope: float = 0.2,
    scale: float = _SQRT2,
) -> jax.Array:
    """y = leaky_relu(x + bias) * scale; bias broadcast over the last axis."""
    return _forward(x, bias, negative_slope, scale)


def _forward(x, bias, slope, scale):
    c = x.shape[-1]
    rows_total = max(1, x.size // c)
    x2 = x.reshape(rows_total, c)
    b2 = bias.astype(x.dtype).reshape(1, c)
    rows = min(1024, rows_total)
    pad = (-rows_total) % rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    y2 = _run_fwd(x2, b2, slope, scale, rows)
    if pad:
        y2 = y2[:rows_total]
    return y2.reshape(x.shape)


def _vjp_fwd(x, bias, slope, scale):
    # recurse through the custom op (not the raw pallas forward): grad-of-
    # grad linearizes this fwd rule, so the residual's dependence on x must
    # itself be differentiable
    y = fused_leaky_relu_pallas(x, bias, slope, scale)
    return y, y  # save the OUTPUT, not the input (the CUDA trick)


def _run_mask(y, g, slope, scale):
    c = y.shape[-1]
    rows_total = max(1, y.size // c)
    y2 = y.reshape(rows_total, c)
    g2 = g.reshape(rows_total, c)
    rows = min(1024, rows_total)
    pad = (-rows_total) % rows
    if pad:
        y2 = jnp.pad(y2, ((0, pad), (0, 0)))
        g2 = jnp.pad(g2, ((0, pad), (0, 0)))
    dx2 = pl.pallas_call(
        functools.partial(_bwd_kernel, slope=slope, scale=scale),
        grid=(pl.cdiv(y2.shape[0], rows),),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(y2.shape, y2.dtype),
        interpret=_interpret(),
    )(y2, g2)
    if pad:
        dx2 = dx2[:rows_total]
    return dx2.reshape(g.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _mask_apply(y, g, slope, scale):
    """g scaled by the output-sign mask of y — the backward's core, itself a
    custom_vjp so GRAD-OF-GRAD works (the reference ships a full double
    backward, op/fused_act.py:18-69): d/dg re-applies the same mask; d/dy is
    zero almost everywhere (the sign's derivative is a null measure), exactly
    as the CUDA FusedLeakyReLUFunctionBackward routes gradgrad."""
    return _run_mask(y, g, slope, scale)


def _mask_fwd(y, g, slope, scale):
    return _run_mask(y, g, slope, scale), y


def _mask_bwd(slope, scale, y, gg):
    return jnp.zeros_like(y), _mask_apply(y, gg, slope, scale)


_mask_apply.defvjp(_mask_fwd, _mask_bwd)


def _vjp_bwd(slope, scale, y, g):
    dx = _mask_apply(y, g, slope, scale)
    dbias = jnp.sum(
        dx.astype(jnp.float32).reshape(-1, dx.shape[-1]), axis=0
    ).astype(g.dtype)
    return dx, dbias


fused_leaky_relu_pallas.defvjp(_vjp_fwd, _vjp_bwd)
