"""fused_bias_act — bias-add + LeakyReLU(0.2) + sqrt(2) gain.

TPU-native equivalent of the reference CUDA op
(modules/psp/stylegan2/op/fused_bias_act_kernel.cu, fused_act.py): the whole
thing is elementwise, so under jit XLA fuses it into the producing matmul /
conv epilogue — exactly what the handwritten CUDA kernel buys on GPU. The
function is still given a ``custom_jvp``-free autodiff path; JAX reproduces
the reference's saved-output-sign backward analytically.

A Pallas variant lives in ops/pallas for use inside hand-written kernels.

Layout: channel-last (bias broadcasts over the trailing axis).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["fused_leaky_relu", "scaled_leaky_relu"]

_SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(
    x: jax.Array,
    bias: jax.Array | None = None,
    negative_slope: float = 0.2,
    scale: float = _SQRT2,
) -> jax.Array:
    """y = leaky_relu(x + bias) * scale, bias broadcast over the channel axis.

    Matches reference op/fused_act.py:72-85 (FusedLeakyReLU /
    fused_leaky_relu).
    """
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(scale, x.dtype)


def scaled_leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    """ScaledLeakyReLU (stylegan2/model.py:174-184): leaky_relu * sqrt(2)."""
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(_SQRT2, x.dtype)
