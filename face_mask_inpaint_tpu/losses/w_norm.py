"""W-norm latent regularizer (reference modules/psp/criteria/w_norm.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["w_norm_loss"]


def w_norm_loss(
    latent: jax.Array,
    latent_avg: jax.Array | None = None,
    start_from_latent_avg: bool = True,
) -> jax.Array:
    """sum_n ||latent_n - latent_avg||_2 / N over the [N, n_styles, 512] block."""
    if start_from_latent_avg:
        latent = latent - latent_avg
    norms = jnp.sqrt(jnp.sum(latent.astype(jnp.float32) ** 2, axis=(1, 2)))
    return jnp.sum(norms) / latent.shape[0]
