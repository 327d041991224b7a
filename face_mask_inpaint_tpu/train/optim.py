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

__all__ = [
    "adam",
    "ranger",
    "plateau_scheduler",
    "adam_injected",
    "ranger_injected",
    "set_learning_rate",
    "PlateauTracker",
]


def adam(learning_rate) -> optax.GradientTransformation:
    """torch.optim.Adam defaults (train_reference_fill.py:309-312)."""
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)


def adam_injected(learning_rate) -> optax.GradientTransformation:
    """Adam with the learning rate held in the optimizer state
    (optax.inject_hyperparams), so a host-side plateau tracker can change it
    between steps without recompiling — the functional analog of torch's
    ReduceLROnPlateau mutating optimizer.param_groups."""
    return optax.inject_hyperparams(adam)(learning_rate=learning_rate)


def ranger_injected(learning_rate) -> optax.GradientTransformation:
    """Ranger with an injected (state-carried) learning rate."""
    return optax.inject_hyperparams(
        lambda learning_rate: ranger(learning_rate=learning_rate)
    )(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr):
    """Return an inject_hyperparams opt state with a new learning rate.

    Unwraps optax.multi_transform / masked wrappers (the pSp trainer's
    encoder-only partitioning) to find the InjectHyperparamsState."""
    import jax.numpy as _jnp

    if hasattr(opt_state, "inner_states"):  # multi_transform
        inner = opt_state.inner_states["train"]
        return opt_state._replace(
            inner_states={**opt_state.inner_states,
                          "train": set_learning_rate(inner, lr)})
    if hasattr(opt_state, "inner_state") and not hasattr(opt_state, "hyperparams"):
        return opt_state._replace(
            inner_state=set_learning_rate(opt_state.inner_state, lr))
    cur = opt_state.hyperparams["learning_rate"]
    return opt_state._replace(
        hyperparams={**opt_state.hyperparams,
                     "learning_rate": _jnp.asarray(lr, cur.dtype)}
    )


class PlateauTracker:
    """Host-side torch.optim.lr_scheduler.ReduceLROnPlateau.

    The trainers call ``step(metric)`` once per validation round (as the
    reference does, train_reference_fill.py:403-404) and write the returned
    lr into the optimizer state via set_learning_rate. Matches torch
    semantics: threshold_mode='rel', cooldown=0, min_lr=0; the reference uses
    mode='max', patience=2, factor=0.8 (train_reference_fill.py:310-319).
    """

    def __init__(self, base_lr: float, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4):
        assert mode in ("min", "max")
        self.lr = float(base_lr)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best: Optional[float] = None
        self.num_bad = 0

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.lr *= self.factor
            self.num_bad = 0
        return self.lr

    def state_dict(self) -> dict:
        import numpy as _np

        return {
            "lr": _np.float64(self.lr),
            "best": _np.float64(self.best if self.best is not None else _np.nan),
            "num_bad": _np.int64(self.num_bad),
        }

    def load_state_dict(self, d: dict) -> None:
        import numpy as _np

        self.lr = float(d["lr"])
        best = float(d["best"])
        self.best = None if _np.isnan(best) else best
        self.num_bad = int(d["num_bad"])


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
        # canonical float type: f64 under jax_enable_x64 (the trajectory
        # parity test runs there), f32 otherwise
        t = count.astype(jnp.result_type(float))

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
