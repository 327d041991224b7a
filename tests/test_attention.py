"""Blockwise attention must match the materialized map exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.ops.attention import attention_apply, blockwise_attention


def _materialized(q, values):
    energy = jnp.einsum("nic,njc->nij", q, q)
    att = jax.nn.softmax(energy, axis=-1)
    return [jnp.einsum("nij,njc->nic", att, v) for v in values]


def test_blockwise_matches_materialized():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 100, 8).astype(np.float32)) * 3.0
    v1 = jnp.asarray(rng.randn(2, 100, 16).astype(np.float32))
    v2 = jnp.asarray(rng.randn(2, 100, 16).astype(np.float32))
    ref = _materialized(q, [v1, v2])
    # block size that doesn't divide L exercises padding/masking
    out = blockwise_attention(q, q, [v1, v2], block_size=33)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_attention_apply_thresholds_agree():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 64, 4).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 64, 8).astype(np.float32))
    small = attention_apply(q, [v], block_threshold=4096)[0]
    big = attention_apply(q, [v], block_threshold=1, block_size=16)[0]
    np.testing.assert_allclose(np.asarray(small), np.asarray(big), rtol=1e-5, atol=1e-5)


def test_blockwise_grad_matches():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 50, 4).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 50, 6).astype(np.float32))

    def f_block(q, v):
        return jnp.sum(blockwise_attention(q, q, [v], block_size=16)[0] ** 2)

    def f_mat(q, v):
        return jnp.sum(_materialized(q, [v])[0] ** 2)

    g1 = jax.grad(f_block, argnums=(0, 1))(q, v)
    g2 = jax.grad(f_mat, argnums=(0, 1))(q, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_flash_attention_matches_blockwise():
    from face_mask_inpaint_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, 300, 16).astype(np.float32)) * 2
    v1 = jnp.asarray(rng.randn(2, 300, 24).astype(np.float32))
    v2 = jnp.asarray(rng.randn(2, 300, 8).astype(np.float32))
    ref = blockwise_attention(q, q, [v1, v2], block_size=64)
    got = flash_attention(q, [v1, v2], tq=128, tk=128)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=2e-5)

    def loss_f(q, v):
        return jnp.sum(flash_attention(q, [v], tq=128, tk=128)[0] ** 2)

    def loss_r(q, v):
        return jnp.sum(blockwise_attention(q, q, [v], block_size=64)[0] ** 2)

    g1 = jax.grad(loss_f, argnums=(0, 1))(q, v1)
    g2 = jax.grad(loss_r, argnums=(0, 1))(q, v1)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4)


def test_flash_attention_multivalue_grads_match():
    """Shared-map multi-value backward (dq sums the q and k roles; each dV_j
    comes through the one recomputed P)."""
    from face_mask_inpaint_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(2, 200, 8).astype(np.float32)) * 2
    v1 = jnp.asarray(rng.randn(2, 200, 24).astype(np.float32))
    v2 = jnp.asarray(rng.randn(2, 200, 16).astype(np.float32))

    def loss_f(q, v1, v2):
        a, b = flash_attention(q, [v1, v2], tq=64, tk=128)
        return jnp.sum(a ** 2) + jnp.sum(jnp.abs(b))

    def loss_r(q, v1, v2):
        a, b = blockwise_attention(q, q, [v1, v2], block_size=64)
        return jnp.sum(a ** 2) + jnp.sum(jnp.abs(b))

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(q, v1, v2)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q, v1, v2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)


def test_flash_attention_fused_backward_matches_split(monkeypatch):
    """The single-kernel tied backward (FMI_FLASH_FUSED_BWD=1,
    _backward_fused: dq_total = sum_J (ds_IJ + ds_JI^T) K_J from ONE
    symmetric score tile per pair, dv from p_JI^T) must equal the split
    dq/dkv kernels — including ragged tails (l % tile != 0)."""
    from face_mask_inpaint_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(11)
    q = jnp.asarray(rng.randn(2, 200, 8).astype(np.float32)) * 2
    v1 = jnp.asarray(rng.randn(2, 200, 24).astype(np.float32))
    v2 = jnp.asarray(rng.randn(2, 200, 16).astype(np.float32))

    def loss(q, v1, v2):
        a, b = flash_attention(q, [v1, v2], tq=64, tk=128)
        return (jnp.sum(a ** 2) + jnp.sum(jnp.abs(b))
                + jnp.sum(jnp.sin(a[..., :16] * b)))

    monkeypatch.setenv("FMI_FLASH_FUSED_BWD", "0")
    g_split = jax.grad(loss, argnums=(0, 1, 2))(q, v1, v2)
    monkeypatch.setenv("FMI_FLASH_FUSED_BWD", "1")
    g_fused = jax.grad(loss, argnums=(0, 1, 2))(q, v1, v2)
    for a, b in zip(g_split, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("l,t", [
    (200, 64),   # ni=4 even: exercises the round-robin dup guard + ragged
    (320, 64),   # ni=5 odd: no dup column + exact tail
    (256, 64),   # ni=4 even, no padding
    (64, 64),    # ni=1: diagonal-only degenerate sweep
])
def test_flash_attention_sym_matches_rect(monkeypatch, l, t):
    """FMI_FLASH_SYM=1 (triangular sweep: one score tile per unordered pair
    feeding both orders via round-robin pairing J=(I+JJ)%ni) must match the
    rectangular kernels in values AND grads, including ragged tails and the
    even-ni duplicate-pair guard."""
    from face_mask_inpaint_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(2, l, 8).astype(np.float32)) * 2
    v1 = jnp.asarray(rng.randn(2, l, 24).astype(np.float32))
    v2 = jnp.asarray(rng.randn(2, l, 16).astype(np.float32))

    def run(q, v1, v2):
        return flash_attention(q, [v1, v2], tq=t, tk=t)

    def loss(q, v1, v2):
        a, b = run(q, v1, v2)
        return (jnp.sum(a ** 2) + jnp.sum(jnp.abs(b))
                + jnp.sum(jnp.sin(a[..., :16] * b)))

    monkeypatch.setenv("FMI_FLASH_SYM", "0")
    o_rect = run(q, v1, v2)
    g_rect = jax.grad(loss, argnums=(0, 1, 2))(q, v1, v2)
    monkeypatch.setenv("FMI_FLASH_SYM", "1")
    monkeypatch.setenv("FMI_FLASH_SYM_T", str(t))
    o_sym = run(q, v1, v2)
    g_sym = jax.grad(loss, argnums=(0, 1, 2))(q, v1, v2)
    for a, b in zip(o_rect, o_sym):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
    # grads accumulate tile contributions in a different ORDER (triangular
    # vs row-major sweep), so f32 rounding differs by up to ~4e-4 absolute
    # at these shapes (exactly 0 for the single-tile case) — not a formula
    # difference
    for a, b in zip(g_rect, g_sym):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=5e-4)


def test_flash_attention_sym_bwd_only_matches(monkeypatch):
    """FMI_FLASH_SYM_BWD=1 (triangular backward under the rectangular
    forward — the production A/B configuration, since d = C/4 makes the
    forward saving marginal) must match the rectangular grads."""
    from face_mask_inpaint_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(3)
    l, t = 200, 64
    q = jnp.asarray(rng.randn(2, l, 8).astype(np.float32)) * 2
    v1 = jnp.asarray(rng.randn(2, l, 24).astype(np.float32))

    def loss(q, v1):
        a, = flash_attention(q, [v1], tq=t, tk=t)
        return jnp.sum(a ** 2) + jnp.sum(jnp.sin(a))

    monkeypatch.setenv("FMI_FLASH_SYM", "0")
    monkeypatch.setenv("FMI_FLASH_SYM_BWD", "0")
    g_rect = jax.grad(loss, argnums=(0, 1))(q, v1)
    monkeypatch.setenv("FMI_FLASH_SYM_BWD", "1")
    monkeypatch.setenv("FMI_FLASH_SYM_T", str(t))
    g_sym = jax.grad(loss, argnums=(0, 1))(q, v1)
    for a, b in zip(g_rect, g_sym):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=5e-4)
