"""Optimizers: Adam (torch-default), Ranger, ReduceLROnPlateau scheduling.

Ranger (reference modules/psp/ranger.py:29-184) = RAdam + Lookahead(k=6,
alpha=0.5) + gradient centralization, rebuilt as a single optax
GradientTransformation (betas=(0.95, 0.999), eps=1e-5, N_sma_threshold=5,
GC over all dims but the first for rank>1 tensors — the reference applies GC
to both conv and fc by default).

Plateau scheduling wraps optax.contrib.reduce_on_plateau with the torch
ReduceLROnPlateau defaults the reference relies on (factor=0.1, patience=10).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax

__all__ = ["adam", "ranger", "plateau_scheduler"]


def adam(learning_rate) -> optax.GradientTransformation:
    """torch.optim.Adam defaults (train_reference_fill.py:309-312)."""
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)


class RangerState(NamedTuple):
    count: chex.Array
    exp_avg: chex.ArrayTree
    exp_avg_sq: chex.ArrayTree
    slow: chex.ArrayTree


def ranger(
    learning_rate: float = 1e-3,
    alpha: float = 0.5,
    k: int = 6,
    n_sma_threshold: int = 5,
    b1: float = 0.95,
    b2: float = 0.999,
    eps: float = 1e-5,
    weight_decay: float = 0.0,
    use_gc: bool = True,
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return RangerState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
            slow=params,
        )

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("ranger requires params")
        count = state.count + 1
        t = count.astype(jnp.float32)

        def centralize(g):
            if use_gc and g.ndim > 1:
                return g - jnp.mean(g, axis=tuple(range(1, g.ndim)), keepdims=True)
            return g

        grads = jax.tree.map(centralize, updates)
        exp_avg = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, grads)
        exp_avg_sq = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.exp_avg_sq, grads
        )

        beta2_t = b2**t
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt(
            (1.0 - beta2_t)
            * (n_sma - 4.0) / (n_sma_max - 4.0)
            * (n_sma - 2.0) / n_sma
            * n_sma_max / (n_sma_max - 2.0)
        ) / (1.0 - b1**t)
        plain = 1.0 / (1.0 - b1**t)
        variance_ok = n_sma > n_sma_threshold
        step_size = jnp.where(variance_ok, rect, plain)

        def fast_step(p, m, v):
            adaptive = m / (jnp.sqrt(v) + eps)
            direction = jnp.where(variance_ok, adaptive, m)
            delta = -learning_rate * step_size * direction
            if weight_decay:
                delta = delta - weight_decay * learning_rate * p
            return delta

        deltas = jax.tree.map(fast_step, params, exp_avg, exp_avg_sq)

        # Lookahead: every k steps pull fast weights toward the slow buffer.
        sync = (count % k) == 0

        def lookahead(p, d, s):
            fast = p + d
            new_slow = jnp.where(sync, s + alpha * (fast - s), s)
            new_fast = jnp.where(sync, new_slow, fast)
            return new_fast - p, new_slow

        pairs = jax.tree.map(lookahead, params, deltas, state.slow)
        treedef = jax.tree.structure(params)
        flat = treedef.flatten_up_to(pairs)
        final_updates = treedef.unflatten([u for u, _ in flat])
        new_slow = treedef.unflatten([s for _, s in flat])

        return final_updates, RangerState(count, exp_avg, exp_avg_sq, new_slow)

    return optax.GradientTransformation(init_fn, update_fn)


def get_scheduler(
    lr_policy: str,
    base_lr: float,
    niter: int = 100,
    niter_decay: int = 100,
    iter_count: int = 0,
    lr_decay_iters: int = 50,
):
    """LR schedule registry matching get_scheduler (base_function.py:69-88).

    'lambda': linear decay  1 - max(0, epoch+2+iter_count-niter)/(niter_decay+1)
    'step':   x0.1 every lr_decay_iters epochs
    'exponent': x0.95 per epoch
    Returns an optax schedule mapping epoch -> lr.
    """
    if lr_policy == "lambda":
        def sched(epoch):
            factor = 1.0 - jnp.maximum(
                0.0, epoch + 2.0 + iter_count - niter) / float(niter_decay + 1)
            return base_lr * factor
        return sched
    if lr_policy == "step":
        return optax.exponential_decay(
            base_lr, transition_steps=lr_decay_iters, decay_rate=0.1, staircase=True)
    if lr_policy == "exponent":
        return optax.exponential_decay(base_lr, transition_steps=1, decay_rate=0.95)
    raise NotImplementedError(f"learning rate policy [{lr_policy}] is not implemented")


def plateau_scheduler(
    factor: float = 0.1,
    patience: int = 10,
    mode: str = "min",
    rtol: float = 1e-4,
    cooldown: int = 0,
    min_scale: float = 0.0,
):
    """torch ReduceLROnPlateau equivalent. Returns an optax transformation to
    chain after the optimizer; feed the monitored metric via
    ``update(..., value=metric)``. For mode='max' pass the negated metric.
    """
    del mode  # caller negates for 'max'
    return optax.contrib.reduce_on_plateau(
        factor=factor,
        patience=patience,
        rtol=rtol,
        cooldown=cooldown,
        min_scale=min_scale,
    )
