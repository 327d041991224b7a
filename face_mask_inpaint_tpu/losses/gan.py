"""Adversarial objectives — lsgan / vanilla / hinge / wgangp.

Functional rebuild of reference external_function.py:80-131 (GANLoss). Stack A
trains with 'lsgan' (loss.py:72); the other modes are part of the public
surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gan_loss"]


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
