"""Experimental flash-attention forward variants (solo perf A/B).

V2: l accumulated via an MXU ones-matmul (kills the VPU row-sum pass),
    dimension_semantics=(parallel, parallel, arbitrary).
V3: V2 + exp2 computed in bf16 (precision-policy experiment).
"""
import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634


def _interpret():
    return jax.devices()[0].platform not in ("tpu", "axon")


def _fwd_kernel_v2(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                   *, nk, tk, lk, bf16_p):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    pad = nk * tk - lk
    if pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * tk
        s = jnp.where(col < lk, s, -jnp.inf)

    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_new)
    if bf16_p:
        p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
        p_mm = p
    else:
        p = jnp.exp2(s - m_new)
        p_mm = p.astype(v_ref.dtype)
    # l-sum as an MXU matvec: p @ ones — frees a full VPU reduce pass over
    # the [tq, tk] tile (the kernel's VPU work is the bottleneck over the
    # MXU floor)
    ones = jnp.ones((tk, 8), p_mm.dtype)
    lsum = jax.lax.dot_general(
        p_mm, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[:, :1]
    l_scr[...] = l_scr[...] * alpha + lsum
    pv = jax.lax.dot_general(
        p_mm, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[...] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)
        lse_ref[0] = m_scr[...] + jnp.log2(l_scr[...])


def forward_v2(q, values, tq=512, tk=1024, bf16_p=False):
    n, l, d = q.shape
    v = jnp.concatenate(values, axis=-1) if len(values) > 1 else values[0]
    c_total = v.shape[-1]
    nq = -(-l // tq)
    nk = -(-l // tk)
    assert nq * tq == l and nk * tk == l
    q2 = (q.astype(jnp.float32) * _LOG2E).astype(q.dtype)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_v2, nk=nk, tk=tk, lk=l, bf16_p=bf16_p),
        grid=(n, nq, nk),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, c_total), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, c_total), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, l, c_total), v.dtype),
            jax.ShapeDtypeStruct((n, l, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, c_total), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q2, q, v)
    if len(values) == 1:
        return [out]
    outs, off = [], 0
    for vv in values:
        outs.append(out[..., off:off + vv.shape[-1]])
        off += vv.shape[-1]
    return outs
