"""Dice coefficient / loss for the UNet mask-detector trainer.

Rebuild of reference modules/loss.py:148-186. The reference's per-sample
Python loop becomes a vectorized reduction; the ``sets_sum == 0 -> 2*inter``
guard is expressed with jnp.where (it keeps dice == 1 when both masks are
empty).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["dice_coeff", "multiclass_dice_coeff", "dice_loss"]


def _dice_flat(inp: jax.Array, tgt: jax.Array, epsilon: float = 1e-6) -> jax.Array:
    """Dice over all elements of inp/tgt (already flattened batch-first)."""
    inter = jnp.sum(inp * tgt)
    sets_sum = jnp.sum(inp) + jnp.sum(tgt)
    sets_sum = jnp.where(sets_sum == 0, 2 * inter, sets_sum)
    return (2 * inter + epsilon) / (sets_sum + epsilon)


def dice_coeff(
    inp: jax.Array, tgt: jax.Array, reduce_batch_first: bool = False,
    epsilon: float = 1e-6,
) -> jax.Array:
    """Average Dice over the batch (or single global Dice when
    reduce_batch_first). inp/tgt: [N, ...] with matching shapes."""
    if inp.ndim == 2 or reduce_batch_first:
        return _dice_flat(inp, tgt, epsilon)
    n = inp.shape[0]
    per = jax.vmap(lambda a, b: _dice_flat(a, b, epsilon))(
        inp.reshape(n, -1), tgt.reshape(n, -1)
    )
    return jnp.mean(per)


def multiclass_dice_coeff(
    inp: jax.Array, tgt: jax.Array, reduce_batch_first: bool = False,
    epsilon: float = 1e-6,
) -> jax.Array:
    """Average Dice over classes. inp/tgt: [N, H, W, C] one-hot (NHWC — the
    reference's channel axis 1 becomes the trailing axis)."""
    c = inp.shape[-1]
    per = jnp.stack([
        dice_coeff(inp[..., i], tgt[..., i], reduce_batch_first, epsilon)
        for i in range(c)
    ])
    return jnp.mean(per)


def dice_loss(inp: jax.Array, tgt: jax.Array, multiclass: bool = False) -> jax.Array:
    fn = multiclass_dice_coeff if multiclass else dice_coeff
    return 1.0 - fn(inp, tgt, reduce_batch_first=True)
