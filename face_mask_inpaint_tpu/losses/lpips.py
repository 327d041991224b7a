"""LPIPS — Learned Perceptual Image Patch Similarity (v0.1).

Rebuild of reference modules/psp/criteria/lpips/ (lpips.py, networks.py,
utils.py): a frozen AlexNet / SqueezeNet-1.1 / VGG16 feature trunk, unit
normalization of activations, frozen 1x1 "lin" convs, spatial mean, summed
over layers and averaged over the batch.

The torch version hard-codes .to("cuda") (lpips.py:24-27); this one is
device-agnostic. Backbone + lin weights come from tools/convert_torch.py
(torchvision weights + the richzhang lin weights); with random weights the
module still runs for tests.

Inputs NHWC, LPIPS's [-1, 1] convention (the pSp trainer feeds normalized
images).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.nn.layers import Conv2d
from face_mask_inpaint_tpu.ops.resize import max_pool2d

Dtype = Any

__all__ = ["LPIPSNet", "lpips", "N_CHANNELS"]

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

N_CHANNELS = {
    "alex": (64, 192, 384, 256, 256),
    "vgg": (64, 128, 256, 512, 512),
    "squeeze": (64, 128, 256, 384, 384, 512, 512),
}


def _normalize_activation(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


def _max_pool3_2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel=3, stride=2) — valid padding."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


class _Fire(nn.Module):
    """SqueezeNet Fire module."""

    squeeze: int
    expand: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jax.nn.relu(Conv2d(self.squeeze, 1, dtype=self.dtype, name="squeeze")(x))
        e1 = jax.nn.relu(Conv2d(self.expand, 1, dtype=self.dtype, name="expand1x1")(s))
        e3 = jax.nn.relu(
            Conv2d(self.expand, 3, padding=1, dtype=self.dtype, name="expand3x3")(s)
        )
        return jnp.concatenate([e1, e3], axis=-1)


class _Trunk(nn.Module):
    """Shared feature trunk; one instance is applied to both images so the
    conv parameters are created once."""

    net_type: str = "alex"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        taps = []
        if self.net_type == "alex":
            x = Conv2d(64, 11, stride=4, padding=2, dtype=self.dtype, name="conv1")(x)
            x = jax.nn.relu(x); taps.append(x)
            x = _max_pool3_2(x)
            x = Conv2d(192, 5, padding=2, dtype=self.dtype, name="conv2")(x)
            x = jax.nn.relu(x); taps.append(x)
            x = _max_pool3_2(x)
            x = Conv2d(384, 3, padding=1, dtype=self.dtype, name="conv3")(x)
            x = jax.nn.relu(x); taps.append(x)
            x = Conv2d(256, 3, padding=1, dtype=self.dtype, name="conv4")(x)
            x = jax.nn.relu(x); taps.append(x)
            x = Conv2d(256, 3, padding=1, dtype=self.dtype, name="conv5")(x)
            x = jax.nn.relu(x); taps.append(x)
        elif self.net_type == "vgg":
            cfg = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))
            for b, (n_convs, ch) in enumerate(cfg):
                if b > 0:
                    x = max_pool2d(x, 2)
                for c in range(n_convs):
                    x = Conv2d(ch, 3, padding=1, dtype=self.dtype,
                               name=f"conv{b + 1}_{c + 1}")(x)
                    x = jax.nn.relu(x)
                taps.append(x)
        elif self.net_type == "squeeze":
            x = jax.nn.relu(Conv2d(64, 3, stride=2, dtype=self.dtype, name="conv1")(x))
            taps.append(x)
            x = _max_pool3_2(x)
            x = _Fire(16, 64, dtype=self.dtype, name="fire3")(x)
            x = _Fire(16, 64, dtype=self.dtype, name="fire4")(x)
            taps.append(x)
            x = _max_pool3_2(x)
            x = _Fire(32, 128, dtype=self.dtype, name="fire6")(x)
            x = _Fire(32, 128, dtype=self.dtype, name="fire7")(x)
            taps.append(x)
            x = _max_pool3_2(x)
            x = _Fire(48, 192, dtype=self.dtype, name="fire9")(x)
            taps.append(x)
            x = _Fire(48, 192, dtype=self.dtype, name="fire10")(x)
            taps.append(x)
            x = _Fire(64, 256, dtype=self.dtype, name="fire11")(x)
            taps.append(x)
            x = _Fire(64, 256, dtype=self.dtype, name="fire12")(x)
            taps.append(x)
        else:
            raise NotImplementedError("choose net_type from [alex, squeeze, vgg].")
        return taps


class LPIPSNet(nn.Module):
    """Feature trunk + frozen lin heads. Returns the scalar LPIPS distance."""

    net_type: str = "alex"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        trunk = _Trunk(self.net_type, dtype=self.dtype, name="trunk")
        fx = trunk((x - shift) / scale)
        fy = trunk((y - shift) / scale)
        total = jnp.float32(0.0)
        n = x.shape[0]
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_normalize_activation(a) - _normalize_activation(b)) ** 2
            lin = Conv2d(1, 1, use_bias=False, dtype=self.dtype, name=f"lin{i}")(d)
            total = total + jnp.sum(jnp.mean(lin, axis=(1, 2))) / n
        return total


def lpips(params, x: jax.Array, y: jax.Array, net_type: str = "alex") -> jax.Array:
    return LPIPSNet(net_type=net_type).apply({"params": params}, x, y)
