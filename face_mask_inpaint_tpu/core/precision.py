"""Mixed-precision policy.

TPU convention: parameters and optimizer state in float32, compute (matmuls,
convs, attention) in bfloat16. bf16 shares float32's exponent range, so no
loss scaling is needed — the reference's AMP GradScaler
(train_mask_detector.py:108) has no TPU counterpart by design.

Models take a ``dtype`` attribute; this module centralizes the mapping from
a CLI-ish policy string to that dtype.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

__all__ = ["Policy", "get_policy"]


@dataclass(frozen=True)
class Policy:
    param_dtype: object
    compute_dtype: object

    @property
    def dtype(self):
        return self.compute_dtype


_POLICIES = {
    "float32": Policy(jnp.float32, jnp.float32),
    "bfloat16": Policy(jnp.float32, jnp.bfloat16),
    "amp": Policy(jnp.float32, jnp.bfloat16),
}


def get_policy(name: str) -> Policy:
    if name not in _POLICIES:
        raise ValueError(f"unknown precision policy {name!r}; options: {list(_POLICIES)}")
    return _POLICIES[name]
