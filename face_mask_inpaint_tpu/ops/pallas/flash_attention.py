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
scale, matching the reference. The backward is fused Pallas too (round 2):
the forward additionally writes the per-row logsumexp, and two kernels
recompute P = exp(S - lse) blockwise to form dV_j = P^T dO_j,
dS = P * (sum_j dO_j V_j^T - D), dQ = dS K, dK = dS^T Q, with the q == k
self-attention tying dq = dQ + dK (cost center: the [N,HW,HW] map of
base_function.py:429-436 under the GAN training step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

# All kernels run the softmax in base 2: the score matmul takes q pre-scaled
# by log2(e) (one tiny [N, L, d] multiply outside the kernel) so the VPU
# skips the per-element x*log2(e) multiply inside every exp lowering — the
# exp over the [N, L, L] map is the kernel's VPU bottleneck. The stashed
# "lse" residual is base-2 as well (m2 + log2(l)); the backward recomputes
# p = exp2(s2 - lse2) with the same one-sided q scaling, and only dk needs
# the 1/log2(e) contraction correction (it contracts dS against scaled q).
_LOG2E = 1.4426950408889634


def _interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, nk, tk, lk):
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
    # NOTE (measured, round 3): bf16 scores end-to-end are NOT a win here —
    # Mosaic requires a 32-bit matmul accumulator, so bf16 scores can only
    # be a post-dot convert, which merely moves the existing f32->bf16
    # probability convert earlier (A/B'd 5.02 vs 4.91 ms at the flagship
    # 16k-token shape) while costing ~0.14% output error. f32 it stays.
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
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
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
        lse_ref[0] = m_scr[...] + jnp.log2(l_scr[...])


def _forward(q, values, tq, tk, with_lse=False):
    n, l, d = q.shape
    v = jnp.concatenate(values, axis=-1) if len(values) > 1 else values[0]
    c_total = v.shape[-1]

    nq = -(-l // tq)
    nk = -(-l // tk)
    lq_pad = nq * tq - l
    lk_pad = nk * tk - l
    q2 = (q.astype(jnp.float32) * _LOG2E).astype(q.dtype)  # base-2 scores
    qp = jnp.pad(q2, ((0, 0), (0, lq_pad), (0, 0))) if lq_pad else q2
    kp = jnp.pad(q, ((0, 0), (0, lk_pad), (0, 0))) if lk_pad else q
    vp = jnp.pad(v, ((0, 0), (0, lk_pad), (0, 0))) if lk_pad else v

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, nk=nk, tk=tk, lk=l),
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
            jax.ShapeDtypeStruct((n, nq * tq, c_total), v.dtype),
            jax.ShapeDtypeStruct((n, nq * tq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, c_total), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, kp, vp)
    out = out[:, :l, :]
    if len(values) == 1:
        outs = [out]
    else:
        outs, off = [], 0
        for vv in values:
            outs.append(out[..., off : off + vv.shape[-1]])
            off += vv.shape[-1]
    if with_lse:
        return outs, lse[:, :l, :]
    return outs


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dq_ref,
               acc_scr, *, nk, tk, lk):
    """Grid (N, nq, nk): dq[qblk] = sum_k  P*(dO V^T - D) @ K."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    pad = nk * tk - lk
    if pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * tk
        s = jnp.where(col < lk, s, -jnp.inf)
    p = jnp.exp2(s - lse_ref[0])  # exact probabilities (exp2(-inf) = 0 on pads)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [tq, tk]
    ds = p * (dp - dsum_ref[0])
    acc_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0] = acc_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, nq, tq, lq):
    """Grid (N, nk, nq): dv[kblk] = P^T dO;  dk[kblk] = dS^T Q."""
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]  # [tq, d]
    k = k_ref[0]  # [tk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    pad = nq * tq - lq
    if pad:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * tq
        s = jnp.where(row < lq, s, -jnp.inf)
        p = jnp.where(row < lq, jnp.exp2(s - lse_ref[0]), 0.0)
    else:
        p = jnp.exp2(s - lse_ref[0])  # [tq, tk]
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [tk, c]
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [tq, tk]
    ds = p * (dp - dsum_ref[0])
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [tk, d]

    @pl.when(qi == nq - 1)
    def _finish():
        # dS was contracted against the log2(e)-scaled q — undo the scale
        dk_ref[0] = (dk_scr[...] * (1.0 / 1.4426950408889634)).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _fused_bwd_kernel(q2_ref, k_ref, vj_ref, vi_ref, doi_ref, doj_ref,
                      lsei_ref, lsej_ref, di_ref, dj_ref,
                      dq_ref, dv_ref, dq_scr, dv_scr, *, nj, tj, lk, lq, ti):
    """Fused backward for the TIED q == k self-attention: grid (N, I, J),
    J innermost. The score tile s2_IJ is symmetric across the pair (the
    log2(e) scaling is scalar), so ONE matmul yields both probability
    blocks:

        p_IJ  (i, j) = exp2(s2_ij - lse2_i)   (row-broadcast lse)
        p_JI^T(i, j) = exp2(s2_ij - lse2_j)   (col-broadcast lse)

    and the tied gradient needs no separate dK pass:

        dq_total[I] = sum_J (ds_IJ + ds_JI^T) K_J,   dv[I] = sum_J p_JI^T dO_J

    with ds_JI^T(i, j) = p_JI^T(i, j) * (dp_JI^T(i, j) - D_j) and
    dp_JI^T = V_I dO_J^T computed transpose-free. Per pair this costs
    2d + 3c tile-matmul units vs the split kernels' 4d + 3c (the score
    matmul runs once, not twice, and dK folds into dq) in a single pass."""
    ji = pl.program_id(2)

    @pl.when(ji == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q2 = q2_ref[0]  # [ti, d]  log2(e)-scaled
    k = k_ref[0]   # [tj, d]  unscaled
    s = jax.lax.dot_general(
        q2, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    row_pad = 0 if lq % ti == 0 else 1
    col_pad = 0 if lk % tj == 0 else 1
    if col_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ji * tj
        s = jnp.where(col < lk, s, -jnp.inf)
    p_ij = jnp.exp2(s - lsei_ref[0])          # [ti, tj]
    p_jit = jnp.exp2(s - lsej_ref[0][:, 0][None, :])
    if row_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + \
            pl.program_id(1) * ti
        p_jit = jnp.where(row < lq, p_jit, 0.0)

    dp_ij = jax.lax.dot_general(
        doi_ref[0], vj_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)   # [ti, tj]
    dp_jit = jax.lax.dot_general(
        vi_ref[0], doj_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)   # [ti, tj]

    ds = p_ij * (dp_ij - di_ref[0]) + p_jit * (dp_jit - dj_ref[0][:, 0][None, :])
    dq_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)   # [ti, d]
    dv_scr[...] += jax.lax.dot_general(
        p_jit.astype(doj_ref.dtype), doj_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)   # [ti, c]

    @pl.when(ji == nj - 1)
    def _finish():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _backward_fused(q, v, lse, do_cat, dsum, ti, tj):
    """Single-kernel tied backward. Returns (dq_total f32, dv f32)."""
    n, l, d = q.shape
    c_total = v.shape[-1]
    ni = -(-l // ti)
    nj = -(-l // tj)
    li_pad = ni * ti - l
    lj_pad = nj * tj - l

    q2 = (q.astype(jnp.float32) * _LOG2E).astype(q.dtype)
    q2p = jnp.pad(q2, ((0, 0), (0, li_pad), (0, 0))) if li_pad else q2
    kp = jnp.pad(q, ((0, 0), (0, lj_pad), (0, 0))) if lj_pad else q
    vip = jnp.pad(v, ((0, 0), (0, li_pad), (0, 0))) if li_pad else v
    vjp = jnp.pad(v, ((0, 0), (0, lj_pad), (0, 0))) if lj_pad else v
    doip = jnp.pad(do_cat, ((0, 0), (0, li_pad), (0, 0))) if li_pad else do_cat
    dojp = jnp.pad(do_cat, ((0, 0), (0, lj_pad), (0, 0))) if lj_pad else do_cat
    lseip = jnp.pad(lse, ((0, 0), (0, li_pad), (0, 0))) if li_pad else lse
    lsejp = jnp.pad(lse, ((0, 0), (0, lj_pad), (0, 0))) if lj_pad else lse
    dip = jnp.pad(dsum, ((0, 0), (0, li_pad), (0, 0))) if li_pad else dsum
    djp = jnp.pad(dsum, ((0, 0), (0, lj_pad), (0, 0))) if lj_pad else dsum

    dq, dv = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, nj=nj, tj=tj, lk=l, lq=l, ti=ti),
        grid=(n, ni, nj),
        in_specs=[
            pl.BlockSpec((1, ti, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj, c_total), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, c_total), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, c_total), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj, c_total), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj, 1), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj, 1), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ti, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, c_total), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ni * ti, d), jnp.float32),
            jax.ShapeDtypeStruct((n, ni * ti, c_total), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ti, d), jnp.float32),
            pltpu.VMEM((ti, c_total), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(q2p, kp, vjp, vip, doip, dojp, lseip, lsejp, dip, djp)
    return dq[:, :l], dv[:, :l]


def _backward(q, v, outs_cat, lse, do_cat, tq, tk):
    """q: [N, L, d]; v/outs/do: [N, L, C_total]; lse: [N, L, 1].

    Returns (dq_total = dQ + dK for the tied q == k, dV_cat)."""
    n, l, d = q.shape
    c_total = v.shape[-1]
    nq = -(-l // tq)
    nk = -(-l // tk)
    lq_pad = nq * tq - l
    lk_pad = nk * tk - l

    # D_i = sum_jc dO_jc O_jc — tiny elementwise reduction, XLA-side
    dsum = jnp.sum(do_cat.astype(jnp.float32) * outs_cat.astype(jnp.float32),
                   axis=-1, keepdims=True)

    q2 = (q.astype(jnp.float32) * _LOG2E).astype(q.dtype)  # base-2 scores
    qp = jnp.pad(q2, ((0, 0), (0, lq_pad), (0, 0))) if lq_pad else q2
    kp = jnp.pad(q, ((0, 0), (0, lk_pad), (0, 0))) if lk_pad else q
    vp = jnp.pad(v, ((0, 0), (0, lk_pad), (0, 0))) if lk_pad else v
    dop = jnp.pad(do_cat, ((0, 0), (0, lq_pad), (0, 0))) if lq_pad else do_cat
    # padded-row lse stays finite to keep exp() well-defined; the row mask in
    # the dkv kernel (and the zero dO rows in dq) kill their contributions
    lsep = (jnp.pad(lse, ((0, 0), (0, lq_pad), (0, 0))) if lq_pad else lse)
    dsump = jnp.pad(dsum, ((0, 0), (0, lq_pad), (0, 0))) if lq_pad else dsum

    interpret = _interpret()
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, nk=nk, tk=tk, lk=l),
        grid=(n, nq, nk),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, c_total), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, c_total), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda b, qi, ki: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nq * tq, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, dsump)[:, :l]

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, nq=nq, tq=tq, lq=l),
        grid=(n, nk, nq),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, ki, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda b, ki, qi: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, c_total), lambda b, ki, qi: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, c_total), lambda b, ki, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda b, ki, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda b, ki, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tk, d), lambda b, ki, qi: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, c_total), lambda b, ki, qi: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, nk * tk, d), jnp.float32),
            jax.ShapeDtypeStruct((n, nk * tk, c_total), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, d), jnp.float32),
            pltpu.VMEM((tk, c_total), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, dsump)
    dk = dk[:, :l]
    dv = dv[:, :l]
    return (dq + dk).astype(q.dtype), dv


def flash_attention(
    q: jax.Array,
    values,
    tq: int | None = None,
    tk: int | None = None,
):
    """out_j = softmax(q q^T) @ v_j with the map computed once in VMEM.

    q: [N, L, D]; values: list of [N, L, C_j]. Fully fused forward AND
    backward (dq/dk/dv Pallas kernels; the q == k tie sums both roles).

    Tile defaults (overridable via FMI_FLASH_TQ / FMI_FLASH_TK): forward
    (1024, 1024) — measured ~1.2 ms/step better than (512, 1024) at the
    flagship's bf16 16k-token map — except f32 inputs keep tq=512 (the
    f32 train path regressed with the bigger tile)."""
    import os

    if tk is None:
        tk = int(os.environ.get("FMI_FLASH_TK", "1024"))
    if tq is None:
        tq = int(os.environ.get(
            "FMI_FLASH_TQ", "512" if q.dtype == jnp.float32 else "1024"))

    @jax.custom_vjp
    def _op(q, vs):
        return tuple(_forward(q, list(vs), tq, tk))

    def _fwd(q, vs):
        outs, lse = _forward(q, list(vs), tq, tk, with_lse=True)
        return tuple(outs), (q, vs, tuple(outs), lse)

    def _bwd(res, g):
        q, vs, outs, lse = res
        v_cat = jnp.concatenate(list(vs), axis=-1) if len(vs) > 1 else vs[0]
        o_cat = jnp.concatenate(list(outs), axis=-1) if len(outs) > 1 else outs[0]
        do_cat = (jnp.concatenate([x.astype(v_cat.dtype) for x in g], axis=-1)
                  if len(g) > 1 else g[0].astype(v_cat.dtype))
        # backward tiles capped at 512 (FMI_FLASH_BWD_TQ overrides): the
        # dq/dkv kernels hold ~2x the forward's live tiles, and (tq=1024,
        # f32 values) exceeds the 16M scoped-vmem limit; the measured
        # 1024-tile win is forward-only (bwd tq=1024 also A/B'd slower at
        # the bf16 train shape)
        # Fused tied backward is the default (measured: 64.2 vs 61.4 imgs/s
        # on the bs8 bf16 GAN-train bench, round 3) — one kernel pass with
        # 2d+3c tile-matmuls per pair instead of the split kernels' 4d+3c.
        # FMI_FLASH_FUSED_BWD=0 restores the split dq/dkv kernels.
        tq_b = int(os.environ.get("FMI_FLASH_BWD_TQ", min(tq, 512)))
        if os.environ.get("FMI_FLASH_FUSED_BWD", "1") == "1":
            dsum = jnp.sum(
                do_cat.astype(jnp.float32) * o_cat.astype(jnp.float32),
                axis=-1, keepdims=True)
            dq_f, dv_f = _backward_fused(q, v_cat, lse, do_cat, dsum,
                                         tq_b, min(tk, 512))
            dq, dv_cat = dq_f.astype(q.dtype), dv_f
        else:
            dq, dv_cat = _backward(q, v_cat, o_cat, lse, do_cat, tq_b, tk)
        dvs, off = [], 0
        for vv in vs:
            c = vv.shape[-1]
            dvs.append(dv_cat[..., off : off + c].astype(vv.dtype))
            off += c
        return dq, tuple(dvs)

    _op.defvjp(_fwd, _bwd)
    return list(_op(q, tuple(values)))
