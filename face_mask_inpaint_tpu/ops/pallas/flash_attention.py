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


def _sym_fwd_kernel(q2i_ref, kj_ref, vi_ref, vj_ref, o_ref, lse_ref,
                    m_scr, l_scr, acc_scr, *, ni, njj, t, lq):
    """Triangular forward for the TIED q == k map: grid (N, I, JJ) with the
    round-robin pairing J = (I + JJ) % ni, so each unordered tile pair is
    visited ONCE and the symmetric score tile S_IJ (the log2(e) scale is
    scalar, S_IJ = S_JI^T) serves both orders:

        rows I:  online-softmax update from S_IJ against keys J
        rows J:  online-softmax update from S_IJ^T against keys I
                 (column max/sum — transpose-free)

    vs the rectangular kernel this halves the score matmuls: d + 2c
    tile-matmul units per unordered pair instead of 2(d + c). The price is
    full-length accumulators (acc/m/l for ALL rows) resident in VMEM
    scratch across the sweep — fine for the model's 16k-token maps
    (~L*(4c+8) bytes; the wrapper guards the fit)."""
    i = pl.program_id(1)
    jj = pl.program_id(2)
    j = jax.lax.rem(i + jj, ni)

    @pl.when((i == 0) & (jj == 0))
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    pad = ni * t - lq

    def _work():
        s = jax.lax.dot_general(
            q2i_ref[0], kj_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [t, t]

        # --- rows I: keys are the J columns (mask padded keys) ---
        s_cm = s
        if pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * t
            s_cm = jnp.where(col < lq, s, -jnp.inf)
        ri = pl.ds(i * t, t)
        m_old = m_scr[ri, :]
        m_new = jnp.maximum(m_old, jnp.max(s_cm, axis=-1, keepdims=True))
        alpha = jnp.exp2(m_old - m_new)
        p = jnp.exp2(s_cm - m_new)
        l_scr[ri, :] = l_scr[ri, :] * alpha + jnp.sum(p, axis=-1,
                                                      keepdims=True)
        acc_scr[ri, :] = acc_scr[ri, :] * alpha + jax.lax.dot_general(
            p.astype(vj_ref.dtype), vj_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[ri, :] = m_new

        # --- rows J (mirror): queries are the columns of S, keys the I
        # rows; column max/sum stand in for the transpose ---
        @pl.when(jj != 0)
        def _mirror():
            s_rm = s
            if pad:
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * t
                s_rm = jnp.where(row < lq, s, -jnp.inf)
            rj = pl.ds(j * t, t)
            mj_old = m_scr[rj, :]
            mj_new = jnp.maximum(mj_old,
                                 jnp.max(s_rm, axis=0)[:, None])
            alpha_j = jnp.exp2(mj_old - mj_new)
            pj = jnp.exp2(s_rm - mj_new[:, 0][None, :])  # [t(keys), t(qry)]
            if pad:
                # padded mirror queries (j*t+b >= lq): zero them so the
                # l/acc updates stay finite (their rows are sliced off)
                colq = jax.lax.broadcasted_iota(jnp.int32, pj.shape, 1) + j * t
                pj = jnp.where(colq < lq, pj, 0.0)
            l_scr[rj, :] = l_scr[rj, :] * alpha_j + jnp.sum(
                pj, axis=0)[:, None]
            acc_scr[rj, :] = acc_scr[rj, :] * alpha_j + jax.lax.dot_general(
                pj.astype(vi_ref.dtype), vi_ref[0], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[rj, :] = mj_new

    if ni % 2 == 0:
        # the last round-robin column pairs {i, i+ni/2} twice; keep i < ni/2
        pl.when((jj != njj - 1) | (i < ni // 2))(_work)
    else:
        _work()

    @pl.when((i == ni - 1) & (jj == njj - 1))
    def _finish():
        # padded rows have l > 0 (their zero-q scores are finite), so the
        # divide is safe; they are sliced off by the caller
        o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)
        lse_ref[0] = m_scr[...] + jnp.log2(l_scr[...])


def _sym_forward(q, values, t, with_lse=False):
    """Triangular-sweep forward. Same contract as _forward (tq == tk == t)."""
    n, l, d = q.shape
    v = jnp.concatenate(values, axis=-1) if len(values) > 1 else values[0]
    c_total = v.shape[-1]
    ni = -(-l // t)
    njj = ni // 2 + 1 if ni % 2 == 0 else (ni + 1) // 2
    lpad = ni * t - l

    q2 = (q.astype(jnp.float32) * _LOG2E).astype(q.dtype)
    qp = jnp.pad(q2, ((0, 0), (0, lpad), (0, 0))) if lpad else q2
    kp = jnp.pad(q, ((0, 0), (0, lpad), (0, 0))) if lpad else q
    vp = jnp.pad(v, ((0, 0), (0, lpad), (0, 0))) if lpad else v

    def _rr(b, i, jj):
        return (b, jax.lax.rem(i + jj, ni), 0)

    out, lse = pl.pallas_call(
        functools.partial(_sym_fwd_kernel, ni=ni, njj=njj, t=t, lq=l),
        grid=(n, ni, njj),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda b, i, jj: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), _rr, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c_total), lambda b, i, jj: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c_total), _rr, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ni * t, c_total), lambda b, i, jj: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ni * t, 1), lambda b, i, jj: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ni * t, c_total), v.dtype),
            jax.ShapeDtypeStruct((n, ni * t, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ni * t, 1), jnp.float32),
            pltpu.VMEM((ni * t, 1), jnp.float32),
            pltpu.VMEM((ni * t, c_total), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(qp, kp, vp, vp)
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


def _sym_bwd_kernel(q2i_ref, kj_ref, vi_ref, vj_ref, doi_ref, doj_ref,
                    lsei_ref, lsej_ref, di_ref, dj_ref, dq_ref, dv_ref,
                    *, ni, njj, t, lq):
    """Triangular tied backward: the fused-kernel recurrence (see
    _fused_bwd_kernel) swept over unordered pairs only, accumulating BOTH
    sides of each pair from the one score tile:

        dq[I] += (ds_IJ + ds_JI^T) K_J          dv[I] += p_JI^T dO_J
        dq[J] += (ds_IJ + ds_JI^T)^T K_I        dv[J] += p_IJ^T dO_I

    3d + 4c tile-matmul units per unordered pair vs the rectangular fused
    kernel's 4d + 6c (and the split kernels' 8d + 6c). Accumulates straight
    into the full-length f32 out refs (VMEM-resident per batch item)."""
    i = pl.program_id(1)
    jj = pl.program_id(2)
    j = jax.lax.rem(i + jj, ni)

    @pl.when((i == 0) & (jj == 0))
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    pad = ni * t - lq

    def _work():
        s = jax.lax.dot_general(
            q2i_ref[0], kj_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [t, t]
        s_cm = s
        s_rm = s
        if pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * t
            s_cm = jnp.where(col < lq, s, -jnp.inf)
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * t
            s_rm = jnp.where(row < lq, s, -jnp.inf)
        p_ij = jnp.exp2(s_cm - lsei_ref[0])                 # [t, t]
        p_jit = jnp.exp2(s_rm - lsej_ref[0][:, 0][None, :])  # p_JI^T

        dp_ij = jax.lax.dot_general(
            doi_ref[0], vj_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp_jit = jax.lax.dot_general(
            vi_ref[0], doj_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # padded-query columns of p_jit are garbage (lse padded with 0) but
        # multiply (dp_jit - dj) whose padded entries are exactly 0 (zero
        # dO rows, zero-padded dsum) — so ds stays clean, like the
        # rectangular fused kernel
        ds = (p_ij * (dp_ij - di_ref[0])
              + p_jit * (dp_jit - dj_ref[0][:, 0][None, :]))

        ri = pl.ds(i * t, t)
        dq_ref[0, ri, :] += jax.lax.dot_general(
            ds.astype(kj_ref.dtype), kj_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv_ref[0, ri, :] += jax.lax.dot_general(
            p_jit.astype(doj_ref.dtype), doj_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(jj != 0)
        def _mirror():
            rj = pl.ds(j * t, t)
            # K_I is the log2(e)-scaled block; undo the scale on the way out
            dq_ref[0, rj, :] += jax.lax.dot_general(
                ds.astype(q2i_ref.dtype), q2i_ref[0],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * (1.0 / _LOG2E)
            dv_ref[0, rj, :] += jax.lax.dot_general(
                p_ij.astype(doi_ref.dtype), doi_ref[0],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    if ni % 2 == 0:
        pl.when((jj != njj - 1) | (i < ni // 2))(_work)
    else:
        _work()


def _backward_sym(q, v, lse, do_cat, dsum, t):
    """Triangular single-kernel tied backward. Returns (dq_total, dv) f32."""
    n, l, d = q.shape
    c_total = v.shape[-1]
    ni = -(-l // t)
    njj = ni // 2 + 1 if ni % 2 == 0 else (ni + 1) // 2
    lpad = ni * t - l

    q2 = (q.astype(jnp.float32) * _LOG2E).astype(q.dtype)
    pads = ((0, 0), (0, lpad), (0, 0))
    q2p = jnp.pad(q2, pads) if lpad else q2
    kp = jnp.pad(q, pads) if lpad else q
    vp = jnp.pad(v, pads) if lpad else v
    dop = jnp.pad(do_cat, pads) if lpad else do_cat
    lsep = jnp.pad(lse, pads) if lpad else lse
    dp = jnp.pad(dsum, pads) if lpad else dsum

    def _bi(b, i, jj):
        return (b, i, 0)

    def _rr(b, i, jj):
        return (b, jax.lax.rem(i + jj, ni), 0)

    dq, dv = pl.pallas_call(
        functools.partial(_sym_bwd_kernel, ni=ni, njj=njj, t=t, lq=l),
        grid=(n, ni, njj),
        in_specs=[
            pl.BlockSpec((1, t, d), _bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), _rr, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c_total), _bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c_total), _rr, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c_total), _bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c_total), _rr, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), _bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), _rr, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), _bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), _rr, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ni * t, d), lambda b, i, jj: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ni * t, c_total), lambda b, i, jj: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ni * t, d), jnp.float32),
            jax.ShapeDtypeStruct((n, ni * t, c_total), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(q2p, kp, vp, vp, dop, dop, lsep, lsep, dp, dp)
    return dq[:, :l], dv[:, :l]


def _sym_fwd_fits(l, d, c_total, t, v_esize):
    """Forward triangular-kernel VMEM footprint gate (bytes): f32 acc + m/l
    scratch + f32 lse block + the out block at the VALUE dtype's width +
    double-buffered input tiles, against the 100MB kernel limit with
    headroom for Mosaic overheads."""
    lp = -(-l // t) * t
    fwd = (lp * (4 * c_total + 12)          # acc (f32) + m + l + lse
           + lp * c_total * v_esize         # out block
           + 4 * t * (2 * d + 2 * c_total) * v_esize)  # streamed tiles
    return fwd < 80 * 1024 * 1024


def _sym_bwd_fits(l, d, c_total, t, esize):
    """Backward triangular-kernel VMEM gate: f32 dq + dv out blocks (the
    accumulators) + double-buffered input tiles."""
    lp = -(-l // t) * t
    bwd = (lp * 4 * (d + c_total)
           + 4 * t * (2 * d + 4 * c_total + 12) * esize)
    return bwd < 80 * 1024 * 1024


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

    # FMI_FLASH_SYM=1 switches to the triangular-sweep kernels (score tile
    # computed once per unordered pair; see _sym_fwd_kernel/_sym_bwd_kernel).
    # FMI_FLASH_SYM_BWD enables just the backward (the model's d = C/4 is
    # tiny, so the forward's saving is ~d/(2(d+c)) ≈ 5% while the backward
    # drops two of six c-unit matmuls AND halves the exp2 tiles — the
    # asymmetric win). On-chip A/B (r3): sym backward 67.84 vs 64.46 imgs/s
    # on the bs8 bf16 GAN-train bench → default ON; the sym FORWARD lost
    # on the flagship (199.7 vs 225.5, t=1024 222.9) → default off. Falls
    # back automatically when the full-length accumulators would not fit
    # VMEM. Tile default 1024: A/B'd 69.4 (t=1024) vs 68.6 (512) vs 64.4
    # (256) on the GAN-train bench; the fits guards drop oversized tiles.
    c_total = sum(v.shape[-1] for v in values)
    t_sym = int(os.environ.get("FMI_FLASH_SYM_T", "1024"))
    esize = max(jnp.dtype(v.dtype).itemsize for v in values)
    sym_flag = os.environ.get("FMI_FLASH_SYM", "0") == "1"
    use_sym = sym_flag and _sym_fwd_fits(
        q.shape[1], q.shape[-1], c_total, t_sym, esize)
    use_sym_bwd = (
        (sym_flag or os.environ.get("FMI_FLASH_SYM_BWD", "1") == "1")
        and _sym_bwd_fits(q.shape[1], q.shape[-1], c_total, t_sym, esize))

    @jax.custom_vjp
    def _op(q, vs):
        if use_sym:
            return tuple(_sym_forward(q, list(vs), t_sym))
        return tuple(_forward(q, list(vs), tq, tk))

    def _fwd(q, vs):
        if use_sym:
            outs, lse = _sym_forward(q, list(vs), t_sym, with_lse=True)
        else:
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
        # D_i = sum_c dO_c O_c — shared by the sym and fused kernels (the
        # split path recomputes its own inside _backward)
        dsum = jnp.sum(
            do_cat.astype(jnp.float32) * o_cat.astype(jnp.float32),
            axis=-1, keepdims=True)
        if use_sym_bwd:
            dq_s, dv_s = _backward_sym(q, v_cat, lse, do_cat, dsum, t_sym)
            dq, dv_cat = dq_s.astype(q.dtype), dv_s
        elif os.environ.get("FMI_FLASH_FUSED_BWD", "1") == "1":
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
