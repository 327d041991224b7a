"""Pallas TPU flash attention for the PICNet [HW, HW] self-similarity maps.

The XLA scan formulation (ops/attention.py) still materializes each
[Lq, block] score tile in HBM — at the flagship 256² decode (L = 128² =
16384 tokens) that's ~4 GB of f32 traffic per block and ~45% of the whole
forward. This kernel keeps the score tile in VMEM: canonical flash attention
with the k-axis as the innermost grid dimension and running max/denominator
in VMEM scratch, extended to apply ONE shared attention map to SEVERAL value
tensors (ExampleGuidedAttention reuses the map for src and ref features,
example_guided_att.py:31-32).

Semantics: out_j[i] = sum_k softmax_k(q_i . q_k) v_j[k] — no 1/sqrt(d)
scale, matching the reference. Forward-only: the training-time maps are
<= 64² tokens and use the materialized path; autodiff falls back to the
XLA formulation via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, nk, tk, lk):
    """Grid (N, nq, nk); one shared map, V may stack several value tensors
    along the channel axis (they share the softmax)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [tq, d]
    k = k_ref[0]  # [tk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [tq, tk]

    # mask padded keys on the last block
    pad = nk * tk - lk
    if pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * tk
        s = jnp.where(col < lk, s, -jnp.inf)

    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tq, c_total]
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[...] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)


def _forward(q, values, tq, tk):
    n, l, d = q.shape
    v = jnp.concatenate(values, axis=-1) if len(values) > 1 else values[0]
    c_total = v.shape[-1]

    nq = -(-l // tq)
    nk = -(-l // tk)
    lq_pad = nq * tq - l
    lk_pad = nk * tk - l
    qp = jnp.pad(q, ((0, 0), (0, lq_pad), (0, 0))) if lq_pad else q
    kp = jnp.pad(q, ((0, 0), (0, lk_pad), (0, 0))) if lk_pad else q
    vp = jnp.pad(v, ((0, 0), (0, lk_pad), (0, 0))) if lk_pad else v

    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk, tk=tk, lk=l),
        grid=(n, nq, nk),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, c_total), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, c_total), lambda b, qi, ki: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nq * tq, c_total), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, c_total), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    out = out[:, :l, :]
    if len(values) == 1:
        return [out]
    splits = []
    off = 0
    for vv in values:
        splits.append(out[..., off : off + vv.shape[-1]])
        off += vv.shape[-1]
    return splits


def flash_attention(
    q: jax.Array,
    values,
    tq: int = 512,
    tk: int = 1024,
):
    """out_j = softmax(q q^T) @ v_j with the map computed once in VMEM.

    q: [N, L, D]; values: list of [N, L, C_j]. Forward-only fast path —
    gradients route through the XLA streaming formulation.
    """
    from face_mask_inpaint_tpu.ops.attention import blockwise_attention

    @jax.custom_vjp
    def _op(q, vs):
        return tuple(_forward(q, list(vs), tq, tk))

    def _fwd(q, vs):
        return _op(q, vs), (q, vs)

    def _bwd(res, g):
        q, vs = res
        # differentiate the (numerically identical) XLA formulation
        def ref(q, vs):
            return tuple(blockwise_attention(q, q, list(vs)))

        _, vjp = jax.vjp(ref, q, vs)
        return vjp(g)

    _op.defvjp(_fwd, _bwd)
    return list(_op(q, tuple(values)))
