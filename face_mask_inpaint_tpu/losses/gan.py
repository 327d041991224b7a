"""Adversarial objectives — lsgan / vanilla / hinge / wgangp.

Functional rebuild of reference external_function.py:80-131 (GANLoss). Stack A
trains with 'lsgan' (loss.py:72); the other modes are part of the public
surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gan_loss", "cal_gradient_penalty"]


def gan_loss(
    prediction: jax.Array,
    target_is_real: bool,
    is_disc: bool = False,
    gan_mode: str = "lsgan",
    target_real_label: float = 1.0,
    target_fake_label: float = 0.0,
) -> jax.Array:
    """Compute the adversarial loss for a discriminator prediction map.

    Mirrors GANLoss.__call__: lsgan = MSE to the real/fake label; vanilla =
    BCE-with-logits; hinge/wgangp switch on is_disc exactly as the reference.
    """
    pred = prediction.astype(jnp.float32)
    if gan_mode in ("lsgan", "vanilla"):
        label = target_real_label if target_is_real else target_fake_label
        labels = jnp.full_like(pred, label)
        if gan_mode == "lsgan":
            return jnp.mean((pred - labels) ** 2)
        # BCEWithLogits
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * labels + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    if gan_mode in ("hinge", "wgangp"):
        if is_disc:
            if target_is_real:
                pred = -pred
            if gan_mode == "hinge":
                return jnp.mean(jax.nn.relu(1.0 + pred))
            return jnp.mean(pred)
        return -jnp.mean(pred)
    raise NotImplementedError(f"gan mode {gan_mode} not implemented")


def cal_gradient_penalty(
    disc_fn,
    real_data: jax.Array,
    fake_data: jax.Array,
    rng: jax.Array,
    penalty_type: str = "mixed",
    constant: float = 1.0,
    lambda_gp: float = 10.0,
):
    """WGAN-GP gradient penalty (external_function.py:134-166 — defined but
    never called in the reference; provided for the wgangp mode).

    disc_fn: params-closed callable image -> prediction. Returns
    (penalty, gradients) like the reference.
    """
    if lambda_gp <= 0.0:
        return 0.0, None
    if penalty_type == "real":
        interpolates = real_data
    elif penalty_type == "fake":
        interpolates = fake_data
    elif penalty_type == "mixed":
        alpha = jax.random.uniform(rng, (real_data.shape[0], 1, 1, 1), real_data.dtype)
        interpolates = alpha * real_data + (1 - alpha) * fake_data
    else:
        raise NotImplementedError(f"{penalty_type} not implemented")

    def disc_sum(x):
        return jnp.sum(disc_fn(x))

    grads = jax.grad(disc_sum)(interpolates)
    flat = grads.reshape(real_data.shape[0], -1)
    norms = jnp.linalg.norm(flat + 1e-16, axis=1)
    penalty = jnp.mean((norms - constant) ** 2) * lambda_gp
    return penalty, grads
