"""Streaming (flash-style) attention for the PICNet [HW, HW] maps.

Auto_Attn (base_function.py:401-448) and ExampleGuidedAttention
(example_guided_att.py:5-41) materialize softmax(Q Q^T) over all pixels. At
the reference's CelebA sizes (HW <= 64^2) that's fine, but the flagship
256^2 decode path puts Auto_Attn at 128^2 resolution — a 16384 x 16384 map
(1 GB/sample in f32) that dominates HBM. This module computes

    out_j = softmax(Q K^T) @ V_j      (several V under ONE shared map)

with the standard streaming-softmax recurrence over key blocks: O(L * block)
memory, numerically identical (f32 accumulation, exact softmax via running
max). No 1/sqrt(d) scaling — the reference applies none.

``blockwise_attention`` is the lax.scan XLA formulation; a fused Pallas
kernel can slot in behind the same signature.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["blockwise_attention", "attention_apply"]


def blockwise_attention(
    q: jax.Array,
    k: jax.Array,
    values: Sequence[jax.Array],
    block_size: int = 4096,
    transpose_map: bool = False,
) -> list[jax.Array]:
    """softmax over the last axis of (Q K^T), applied to each V.

    q: [N, Lq, D]; k: [N, Lk, D]; values: each [N, Lk, C].
    transpose_map: apply softmax(QK^T)^T instead — i.e. out[i] = sum_j
    A[j, i] V[j] with A row-softmaxed over j's keys. (Auto_Attn multiplies by
    attention^T, base_function.py:436; with q == k the map is what the torch
    code computes either way — see note in AutoAttention.)
    """
    if transpose_map:
        # out = A^T V with A = softmax_rows(q k^T)  <=>  standard attention
        # with roles of q and k swapped and softmax over the *query* axis —
        # handled by the caller via algebra; not needed for q == k paths.
        raise NotImplementedError("transpose_map is handled by callers")

    n, lq, d = q.shape
    lk = k.shape[1]
    bs = min(block_size, lk)
    nb = -(-lk // bs)
    pad = nb * bs - lk

    # Matmuls run in the input dtype (bf16 on the MXU) with f32 accumulation
    # via preferred_element_type; the softmax recurrence stays in f32.
    qf = q
    kf = k
    vfs = list(values)
    if pad:
        kf = jnp.pad(kf, ((0, 0), (0, pad), (0, 0)))
        vfs = [jnp.pad(v, ((0, 0), (0, pad), (0, 0))) for v in vfs]
    valid = (jnp.arange(nb * bs) < lk).reshape(nb, 1, bs)

    k_blocks = kf.reshape(n, nb, bs, d).transpose(1, 0, 2, 3)
    v_blocks = [v.reshape(n, nb, bs, -1).transpose(1, 0, 2, 3) for v in vfs]

    m0 = jnp.full((n, lq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((n, lq, 1), jnp.float32)
    acc0 = tuple(jnp.zeros((n, lq, v.shape[-1]), jnp.float32) for v in vfs)

    # remat: without it, differentiating the scan stores every per-block
    # probability tile ([N, Lq, block] f32 per step) — tens of GB at 16k
    # tokens. Recomputing them in the backward keeps residuals to the carry.
    @jax.checkpoint
    def body(carry, blk):
        m, l, accs = carry
        k_b, v_bs, mask = blk
        s = jnp.einsum(
            "nqd,nbd->nqb", qf, k_b, preferred_element_type=jnp.float32
        )  # [N, Lq, bs] f32
        s = jnp.where(mask, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        p_mm = p.astype(q.dtype)
        accs = tuple(
            acc * alpha + jnp.einsum(
                "nqb,nbc->nqc", p_mm, v_b, preferred_element_type=jnp.float32
            )
            for acc, v_b in zip(accs, v_bs)
        )
        return (m_new, l, accs), None

    (m, l, accs), _ = jax.lax.scan(body, (m0, l0, acc0), (k_blocks, tuple(v_blocks), valid))
    return [(acc / l).astype(values[i].dtype) for i, acc in enumerate(accs)]


def attention_apply(
    query: jax.Array,
    values: Sequence[jax.Array],
    block_threshold: int = 4096,
    block_size: int = 4096,
) -> list[jax.Array]:
    """out_j[n, i, c] = sum_k softmax_k(q_i . q_k) v_j[n, k, c].

    query: [N, L, D] (query == key, as in both reference attentions);
    values: each [N, L, C]. Below block_threshold tokens the map is
    materialized (one big MXU matmul — fastest for small L); above it the
    streaming formulation bounds memory.
    """
    n, l, d = query.shape
    if l <= block_threshold:
        energy = jnp.einsum(
            "nic,njc->nij", query, query, preferred_element_type=jnp.float32
        )
        att = jax.nn.softmax(energy, axis=-1).astype(query.dtype)
        return [
            jnp.einsum(
                "nij,njc->nic", att, v, preferred_element_type=jnp.float32
            ).astype(v.dtype)
            for v in values
        ]
    if jax.devices()[0].platform in ("tpu", "axon"):
        from face_mask_inpaint_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(query, values)
    return blockwise_attention(query, query, values, block_size=block_size)
