"""Pallas kernel parity vs the lax reference implementations (interpret mode
on the CPU test backend; the same code compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.ops.fused_act import fused_leaky_relu
from face_mask_inpaint_tpu.ops.pallas.fused_act_pallas import fused_leaky_relu_pallas
from face_mask_inpaint_tpu.ops.pallas.upfirdn2d_pallas import upfirdn2d_pallas
from face_mask_inpaint_tpu.ops.upfirdn2d import make_kernel, upfirdn2d

MODES = {
    "blur": (1, 1, (2, 1)),
    "blur_sym": (1, 1, (1, 1)),
    "up2": (2, 1, (2, 1)),
    "up2_conv": (2, 1, (1, 1)),
    "down2": (1, 2, (2, 2)),
}


@pytest.mark.parametrize("mode", list(MODES))
def test_upfirdn2d_pallas_matches_lax(mode):
    up, down, pad = MODES[mode]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 17, 23, 8).astype(np.float32))
    k = make_kernel([1, 3, 3, 1]) * (up**2)
    ref = upfirdn2d(x, k, up=up, down=down, pad=pad)
    got = upfirdn2d_pallas(x, k, up, down, pad)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_upfirdn2d_pallas_grad_matches_lax():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 12, 12, 4).astype(np.float32))
    k = make_kernel([1, 3, 3, 1]) * 4

    g1 = jax.grad(lambda x: jnp.sum(upfirdn2d_pallas(x, k, 2, 1, (2, 1)) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(upfirdn2d(x, k, up=2, down=1, pad=(2, 1)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)

    g3 = jax.grad(lambda x: jnp.sum(upfirdn2d_pallas(x, k, 1, 2, (2, 2)) ** 2))(x)
    g4 = jax.grad(lambda x: jnp.sum(upfirdn2d(x, k, up=1, down=2, pad=(2, 2)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g4), rtol=1e-5, atol=1e-5)


def test_upfirdn2d_pallas_fallback_nonseparable():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    k = jnp.asarray(rng.rand(3, 3).astype(np.float32))  # rank > 1
    ref = upfirdn2d(x, k, up=1, down=1, pad=(1, 1))
    got = upfirdn2d_pallas(x, k, 1, 1, (1, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_act_pallas_matches():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 5, 7, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    ref = fused_leaky_relu(x, b)
    got = fused_leaky_relu_pallas(x, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)

    def loss_p(x, b):
        return jnp.sum(fused_leaky_relu_pallas(x, b) ** 2)

    def loss_r(x, b):
        return jnp.sum(fused_leaky_relu(x, b) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(x, b)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, b)
    for a, c in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-5)


def test_instance_norm_act_pallas_matches_reference():
    from face_mask_inpaint_tpu.ops.pallas.norm_act import (
        instance_norm_act, instance_norm_act_reference)

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 35, 17, 8).astype(np.float32)) * 3 + 1
    s = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    for act in ("LeakyReLU", "ReLU", "none"):
        ref = instance_norm_act_reference(x, s, b, act)
        got = instance_norm_act(x, s, b, act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    g1 = jax.grad(lambda x, s, b: jnp.sum(instance_norm_act(x, s, b) ** 2),
                  argnums=(0, 1, 2))(x, s, b)
    g2 = jax.grad(lambda x, s, b: jnp.sum(
        instance_norm_act_reference(x, s, b) ** 2), argnums=(0, 1, 2))(x, s, b)
    for a_, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)


def test_upfirdn2d_pallas_grad_of_grad_matches_lax():
    """Second-order gradients through the Pallas custom_vjp must match the
    natively-differentiable lax path (the reference ships full double
    backward for this op, op/upfirdn2d.py:98-139); this is the surface a
    gradient-penalty objective (losses/gan.py cal_gradient_penalty) hits."""
    from face_mask_inpaint_tpu.ops.pallas.upfirdn2d_pallas import upfirdn2d_pallas
    from face_mask_inpaint_tpu.ops.upfirdn2d import upfirdn2d_lax

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 8, 4), jnp.float32)
    k = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32)
    k /= k.sum()
    w = jnp.asarray(rs.randn(2, 8, 8, 4), jnp.float32)

    def scalar(op):
        def f(x):
            return jnp.sum(op(x) * w)

        def h(x):
            return jnp.sum(jax.grad(f)(x) ** 2)

        return jax.grad(h)(x)

    gg_p = scalar(lambda x: upfirdn2d_pallas(x, k, 1, 1, (2, 1)))
    gg_l = scalar(lambda x: upfirdn2d_lax(x, jnp.asarray(k), 1, 1, (2, 1)))
    np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_l),
                               rtol=1e-4, atol=1e-5)


def test_fused_act_pallas_grad_of_grad_matches_reference():
    """Grad-of-grad through fused_leaky_relu_pallas: the backward's mask
    apply is itself a custom_vjp mirroring the CUDA double backward
    (op/fused_act.py:18-69) — gradgrad routes through grad_output with the
    same output-sign mask, zero into the saved output."""
    from face_mask_inpaint_tpu.ops.pallas.fused_act_pallas import (
        fused_leaky_relu_pallas)

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 8, 4), jnp.float32)
    b = jnp.asarray(rs.randn(4), jnp.float32)
    w = jnp.asarray(rs.randn(2, 8, 8, 4), jnp.float32)

    def ref_op(x, b):
        v = x + b
        return jnp.where(v >= 0, v, 0.2 * v) * np.sqrt(2.0)

    def second(op):
        def f(x):
            return jnp.sum(op(x) * w)

        def h(x):
            return jnp.sum(jax.grad(f)(x) ** 2)

        return jax.grad(h)(x)

    gg_p = second(lambda x: fused_leaky_relu_pallas(x, b))
    gg_r = second(lambda x: ref_op(x, b))
    np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_r),
                               rtol=1e-5, atol=1e-6)
