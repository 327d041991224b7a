"""FID — Fréchet Inception Distance, TPU-native.

Rebuild of reference modules/evaluations/fid.py: a partial InceptionV3
(torchvision architecture) evaluated to the Mixed_7c block, global-average-
pooled to [N, 2048]; activation statistics and the Fréchet distance with the
same eps-regularized scipy sqrtm retry (fid.py:106-156, kept on host — sqrtm
has no stable device kernel).

Inputs to get_activations are NHWC float in [0, 1] at 299x299; the network
rescales to [-1, 1] internally exactly like PartialInceptionNetwork
(fid.py:46). Weights convert from torchvision via
tools/convert_torch.convert_inception_v3.

Note: the reference's *in-training* FID call is broken (argument misorder,
train_reference_fill.py:237-239 vs fid.py:159). This implementation fixes the
signature; dataset-level FID matches test_evaluate.py:96-116 semantics.
"""

from __future__ import annotations

import warnings
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from face_mask_inpaint_tpu.nn.layers import BatchNorm2d, Conv2d
from face_mask_inpaint_tpu.ops.resize import max_pool2d

Dtype = Any

__all__ = [
    "InceptionV3Features",
    "get_activations",
    "calculate_activation_statistics",
    "calculate_frechet_distance",
    "calculate_fid",
]


class BasicConv2d(nn.Module):
    out_channels: int
    kernel_size: tuple[int, int] | int
    stride: int = 1
    padding: tuple[int, int] | int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.out_channels, self.kernel_size, stride=self.stride,
                   padding=self.padding, use_bias=False, dtype=self.dtype,
                   name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=0.001, dtype=self.dtype, name="bn")(x)
        return jax.nn.relu(x)


def _avg_pool3_1_pad1(x):
    y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID")
    # torch avg_pool2d(count_include_pad=True) divides by 9 everywhere
    return y / 9.0


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = BasicConv2d(64, 1, dtype=d, name="branch1x1")(x, train)
        b5 = BasicConv2d(48, 1, dtype=d, name="branch5x5_1")(x, train)
        b5 = BasicConv2d(64, 5, padding=2, dtype=d, name="branch5x5_2")(b5, train)
        b3 = BasicConv2d(64, 1, dtype=d, name="branch3x3dbl_1")(x, train)
        b3 = BasicConv2d(96, 3, padding=1, dtype=d, name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv2d(96, 3, padding=1, dtype=d, name="branch3x3dbl_3")(b3, train)
        bp = _avg_pool3_1_pad1(x)
        bp = BasicConv2d(self.pool_features, 1, dtype=d, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b3 = BasicConv2d(384, 3, stride=2, dtype=d, name="branch3x3")(x, train)
        bd = BasicConv2d(64, 1, dtype=d, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(96, 3, padding=1, dtype=d, name="branch3x3dbl_2")(bd, train)
        bd = BasicConv2d(96, 3, stride=2, dtype=d, name="branch3x3dbl_3")(bd, train)
        bp = max_pool2d(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, 1, dtype=d, name="branch1x1")(x, train)
        b7 = BasicConv2d(c7, 1, dtype=d, name="branch7x7_1")(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7_3")(b7, train)
        bd = BasicConv2d(c7, 1, dtype=d, name="branch7x7dbl_1")(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_2")(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_3")(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_4")(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_5")(bd, train)
        bp = _avg_pool3_1_pad1(x)
        bp = BasicConv2d(192, 1, dtype=d, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b3 = BasicConv2d(192, 1, dtype=d, name="branch3x3_1")(x, train)
        b3 = BasicConv2d(320, 3, stride=2, dtype=d, name="branch3x3_2")(b3, train)
        b7 = BasicConv2d(192, 1, dtype=d, name="branch7x7x3_1")(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7x3_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7x3_3")(b7, train)
        b7 = BasicConv2d(192, 3, stride=2, dtype=d, name="branch7x7x3_4")(b7, train)
        bp = max_pool2d(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = BasicConv2d(320, 1, dtype=d, name="branch1x1")(x, train)
        b3 = BasicConv2d(384, 1, dtype=d, name="branch3x3_1")(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3_2a")(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, 1, dtype=d, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(384, 3, padding=1, dtype=d, name="branch3x3dbl_2")(bd, train)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3dbl_3a")(bd, train)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avg_pool3_1_pad1(x)
        bp = BasicConv2d(192, 1, dtype=d, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """torchvision Inception3 trunk through Mixed_7c -> [N, 2048] pooled
    activations. Input NHWC in [0, 1] at 299x299 (rescaled to [-1, 1] inside,
    matching PartialInceptionNetwork.forward, fid.py:37-55)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert x.shape[1:] == (299, 299, 3), (
            f"Expected input shape to be: (N,299,299,3), but got {x.shape}")
        d = self.dtype
        x = x * 2 - 1
        x = BasicConv2d(32, 3, stride=2, dtype=d, name="Conv2d_1a_3x3")(x, train)
        x = BasicConv2d(32, 3, dtype=d, name="Conv2d_2a_3x3")(x, train)
        x = BasicConv2d(64, 3, padding=1, dtype=d, name="Conv2d_2b_3x3")(x, train)
        x = max_pool2d(x, 3, 2)
        x = BasicConv2d(80, 1, dtype=d, name="Conv2d_3b_1x1")(x, train)
        x = BasicConv2d(192, 3, dtype=d, name="Conv2d_4a_3x3")(x, train)
        x = max_pool2d(x, 3, 2)
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x, train)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x, train)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x, train)
        x = InceptionB(dtype=d, name="Mixed_6a")(x, train)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x, train)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x, train)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x, train)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x, train)
        x = InceptionD(dtype=d, name="Mixed_7a")(x, train)
        x = InceptionE(dtype=d, name="Mixed_7b")(x, train)
        x = InceptionE(dtype=d, name="Mixed_7c")(x, train)
        return jnp.mean(x, axis=(1, 2))  # adaptive_avg_pool2d((1,1)) -> [N, 2048]


def get_activations(images, batch_size: int, inception_variables, dtype=jnp.float32):
    """[N, 299, 299, 3] in [0,1] -> [N, 2048] activations (fid.py:58-85)."""
    model = InceptionV3Features(dtype=dtype)
    apply = jax.jit(lambda v, x: model.apply(v, x, train=False))
    num = images.shape[0]
    out = np.zeros((num, 2048), np.float32)
    for start in range(0, num, batch_size):
        chunk = jnp.asarray(images[start : start + batch_size])
        out[start : start + chunk.shape[0]] = np.asarray(
            apply(inception_variables, chunk), np.float32)
    return out


def calculate_activation_statistics(images, batch_size, inception_variables):
    act = get_activations(images, batch_size, inception_variables)
    return np.mean(act, axis=0), np.cov(act, rowvar=False)


def statistics_from_activations(act: np.ndarray):
    return np.mean(act, axis=0), np.cov(act, rowvar=False)


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """Numpy Fréchet distance with the reference's eps-regularized sqrtm
    retry and imaginary-component check (fid.py:106-156). Host-side."""
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape
    assert sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        warnings.warn(
            f"fid calculation produces singular product; adding {eps} to the "
            "diagonal of cov estimates")
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def calculate_fid(images1, images2, batch_size, inception_variables) -> float:
    """Dataset-level FID between two [N, 299, 299, 3] image sets in [0,1]."""
    mu1, s1 = calculate_activation_statistics(images1, batch_size, inception_variables)
    mu2, s2 = calculate_activation_statistics(images2, batch_size, inception_variables)
    return calculate_frechet_distance(mu1, s1, mu2, s2)
