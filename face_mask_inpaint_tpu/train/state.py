"""Training state pytrees.

The reference keeps its mutable training state implicit in nn.Module objects
and two torch optimizers (train_reference_fill.py:309-321). Here everything is
an explicit pytree so a whole GAN step jits as one function and shards with
GSPMD: params, optimizer state, auxiliary flax collections (spectral-norm u/v,
BatchNorm running stats), and PRNG key.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import optax


@flax.struct.dataclass
class ModuleState:
    """Parameters + auxiliary variable collections for one network.

    ``extra`` carries any further collections a model defines (e.g. the pSp
    ``latent_avg`` buffer and StyleGAN2 ``noises`` buffers) keyed by
    collection name.
    """

    params: Any
    spectral: Any = flax.struct.field(default_factory=dict)
    batch_stats: Any = flax.struct.field(default_factory=dict)
    extra: Any = flax.struct.field(default_factory=dict)

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.spectral:
            v["spectral"] = self.spectral
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        for name, tree in self.extra.items():
            v[name] = tree
        return v

    @classmethod
    def from_variables(cls, variables: dict) -> "ModuleState":
        extra = {
            k: v
            for k, v in variables.items()
            if k not in ("params", "spectral", "batch_stats")
        }
        return cls(
            params=variables["params"],
            spectral=variables.get("spectral", {}),
            batch_stats=variables.get("batch_stats", {}),
            extra=extra,
        )

    def merged(self, mutated: dict) -> "ModuleState":
        """Return a copy with mutated collections (from mutable apply) folded in."""
        new_extra = dict(self.extra)
        for k, v in mutated.items():
            if k not in ("params", "spectral", "batch_stats"):
                new_extra[k] = v
        return self.replace(
            spectral=mutated.get("spectral", self.spectral),
            batch_stats=mutated.get("batch_stats", self.batch_stats),
            extra=new_extra,
        )


@flax.struct.dataclass
class TrainState:
    """Single-network train state (UNet / pSp trainers)."""

    step: jax.Array
    model: ModuleState
    opt_state: optax.OptState
    rng: jax.Array


@flax.struct.dataclass
class GANTrainState:
    """Two-optimizer GAN train state (Stack A)."""

    step: jax.Array
    generator: ModuleState
    discriminator: ModuleState
    g_opt_state: optax.OptState
    d_opt_state: optax.OptState
    rng: jax.Array
