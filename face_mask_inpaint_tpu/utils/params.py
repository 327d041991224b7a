"""Parameter inspection helpers (print_network parity,
base_function.py:91-97)."""

from __future__ import annotations

import jax

__all__ = ["count_params", "describe_params"]


def count_params(params) -> int:
    """Total number of parameters in a pytree."""
    return sum(int(x.size) for x in jax.tree.leaves(params))


def describe_params(params, name: str = "network") -> str:
    """One-line summary matching print_network's 'total number of
    parameters: X M' output."""
    return f"{name}: total number of parameters: {count_params(params) / 1e6:.3f} M"
