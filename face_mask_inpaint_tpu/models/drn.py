"""Dilated Residual Network (DRN-C) encoder, TPU-native.

Rebuild of reference modules/drn.py (arch 'C' path only — the reference uses
``drn_c_42(out_map=True)`` with a replaced 1x1-conv head as the alternative
src/ref encoder in ReferenceFill, modules/model.py:48-62).

DRN-C-42: BasicBlock, layer config [1, 1, 3, 4, 6, 3, 1, 1], channels
(16, 32, 64, 128, 256, 512, 512, 512); strides 1/2/2/2 then dilation 2/4/2/1
with residual=False on the last two layer groups. Total stride 8.

Layout: NHWC. BatchNorm stats in ``batch_stats``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.nn.layers import BatchNorm2d, Conv2d

Dtype = Any

__all__ = ["DRN", "drn_c_42", "drn_c_26", "drn_c_58", "drn_d_22", "drn_d_38"]


class BasicBlock(nn.Module):
    """DRN BasicBlock (drn.py:33-66): conv3x3-BN-ReLU-conv3x3-BN (+residual),
    final ReLU; dilation per conv; optional non-residual mode."""

    planes: int
    stride: int = 1
    dilation: tuple[int, int] = (1, 1)
    residual: bool = True
    use_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        out = Conv2d(
            self.planes, 3, stride=self.stride, padding=self.dilation[0],
            dilation=self.dilation[0], use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        out = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn1")(out)
        out = jax.nn.relu(out)
        out = Conv2d(
            self.planes, 3, padding=self.dilation[1], dilation=self.dilation[1],
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn2")(out)

        res = x
        if self.use_downsample:
            res = Conv2d(
                self.planes, 1, stride=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            res = BatchNorm2d(
                use_running_average=not train, dtype=self.dtype, name="downsample_bn"
            )(res)
        if self.residual:
            out = out + res
        return jax.nn.relu(out)


class Bottleneck(nn.Module):
    """DRN Bottleneck (drn.py:69-107): 1x1 -> 3x3(stride, dilated) -> 1x1 x4,
    used by drn_c_58 / drn_d_54+."""

    planes: int
    stride: int = 1
    dilation: tuple[int, int] = (1, 1)
    residual: bool = True  # unused by torch Bottleneck (always residual)
    use_downsample: bool = False
    dtype: Dtype = jnp.float32

    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        out = Conv2d(self.planes, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn1")(out)
        out = jax.nn.relu(out)
        out = Conv2d(
            self.planes, 3, stride=self.stride, padding=self.dilation[1],
            dilation=self.dilation[1], use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn2")(out)
        out = jax.nn.relu(out)
        out = Conv2d(self.planes * 4, 1, use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn3")(out)

        res = x
        if self.use_downsample:
            res = Conv2d(
                self.planes * 4, 1, stride=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            res = BatchNorm2d(
                use_running_average=not train, dtype=self.dtype, name="downsample_bn"
            )(res)
        return jax.nn.relu(out + res)


class _ConvLayers(nn.Module):
    """DRN._make_conv_layers (drn.py:312-322): plain conv-BN-ReLU stack
    (arch 'D' layer1/2/7/8)."""

    channels: int
    convs: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        for i in range(self.convs):
            x = Conv2d(
                self.channels, 3, stride=self.stride if i == 0 else 1,
                padding=self.dilation, dilation=self.dilation, use_bias=False,
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = BatchNorm2d(use_running_average=not train, dtype=self.dtype,
                            name=f"bn{i}")(x)
            x = jax.nn.relu(x)
        return x


class _LayerGroup(nn.Module):
    """DRN._make_layer (drn.py:288-310)."""

    planes: int
    blocks: int
    stride: int = 1
    dilation: int = 1
    new_level: bool = True
    residual: bool = True
    in_planes: int = 0
    block: type = BasicBlock
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        expansion = getattr(self.block, "expansion", 1)
        use_down = self.stride != 1 or self.in_planes != self.planes * expansion
        if self.dilation == 1:
            first_dil = (1, 1)
        else:
            first_dil = (
                self.dilation // 2 if self.new_level else self.dilation,
                self.dilation,
            )
        x = self.block(
            self.planes, self.stride, first_dil, self.residual, use_down,
            dtype=self.dtype, name="block0",
        )(x, train=train)
        for i in range(1, self.blocks):
            x = self.block(
                self.planes, 1, (self.dilation, self.dilation), self.residual,
                False, dtype=self.dtype, name=f"block{i}",
            )(x, train=train)
        return x


class DRN(nn.Module):
    """DRN trunk (arch 'C' or 'D') with an optional 1x1 conv head
    (out_map=True).

    ``head_features`` replaces the classifier with a 1x1 conv producing the
    encoder feature map (the ReferenceFill usage, modules/model.py:50-55).
    arch 'C': residual layer1/2 and non-residual BasicBlock layer7/8;
    arch 'D': plain conv-BN-ReLU stacks at layer0/1/2/7/8 (drn.py:120-163).
    """

    layers: Sequence[int] = (1, 1, 3, 4, 6, 3, 1, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512, 512, 512)
    arch: str = "C"
    block: type = BasicBlock
    head_features: Optional[int] = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        ch = self.channels
        ly = self.layers
        exp = getattr(self.block, "expansion", 1)
        x = Conv2d(ch[0], 7, stride=1, padding=3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = jax.nn.relu(x)

        if self.arch == "C":
            x = _LayerGroup(ch[0], ly[0], 1, in_planes=ch[0], dtype=self.dtype, name="layer1")(x, train=train)
            x = _LayerGroup(ch[1], ly[1], 2, in_planes=ch[0], dtype=self.dtype, name="layer2")(x, train=train)
        elif self.arch == "D":
            x = _ConvLayers(ch[0], ly[0], 1, dtype=self.dtype, name="layer1")(x, train=train)
            x = _ConvLayers(ch[1], ly[1], 2, dtype=self.dtype, name="layer2")(x, train=train)
        else:
            raise NotImplementedError(f"DRN arch [{self.arch}]")

        x = _LayerGroup(ch[2], ly[2], 2, in_planes=ch[1], block=self.block,
                        dtype=self.dtype, name="layer3")(x, train=train)
        x = _LayerGroup(ch[3], ly[3], 2, in_planes=ch[2] * exp, block=self.block,
                        dtype=self.dtype, name="layer4")(x, train=train)
        x = _LayerGroup(ch[4], ly[4], 1, dilation=2, new_level=False,
                        in_planes=ch[3] * exp, block=self.block,
                        dtype=self.dtype, name="layer5")(x, train=train)
        in_planes = ch[4] * exp
        if ly[5]:
            x = _LayerGroup(ch[5], ly[5], 1, dilation=4, new_level=False,
                            in_planes=in_planes, block=self.block,
                            dtype=self.dtype, name="layer6")(x, train=train)
            in_planes = ch[5] * exp
        if ly[6]:
            if self.arch == "C":
                x = _LayerGroup(ch[6], ly[6], 1, dilation=2, new_level=False,
                                residual=False, in_planes=in_planes,
                                dtype=self.dtype, name="layer7")(x, train=train)
            else:
                x = _ConvLayers(ch[6], ly[6], dilation=2, dtype=self.dtype,
                                name="layer7")(x, train=train)
            in_planes = ch[6]
        if ly[7]:
            if self.arch == "C":
                x = _LayerGroup(ch[7], ly[7], 1, dilation=1, new_level=False,
                                residual=False, in_planes=in_planes,
                                dtype=self.dtype, name="layer8")(x, train=train)
            else:
                x = _ConvLayers(ch[7], ly[7], dilation=1, dtype=self.dtype,
                                name="layer8")(x, train=train)

        if self.head_features is not None:
            x = Conv2d(self.head_features, 1, dtype=self.dtype, name="fc")(x)
        return x


def drn_c_42(head_features: Optional[int] = 128, dtype: Dtype = jnp.float32) -> DRN:
    return DRN(layers=(1, 1, 3, 4, 6, 3, 1, 1), head_features=head_features, dtype=dtype)


def drn_c_26(head_features: Optional[int] = 128, dtype: Dtype = jnp.float32) -> DRN:
    return DRN(layers=(1, 1, 2, 2, 2, 2, 1, 1), head_features=head_features, dtype=dtype)


def drn_c_58(head_features: Optional[int] = 128, dtype: Dtype = jnp.float32) -> DRN:
    return DRN(layers=(1, 1, 3, 4, 6, 3, 1, 1), block=Bottleneck,
               head_features=head_features, dtype=dtype)


def drn_d_22(head_features: Optional[int] = 128, dtype: Dtype = jnp.float32) -> DRN:
    return DRN(layers=(1, 1, 2, 2, 2, 2, 1, 1), arch="D",
               head_features=head_features, dtype=dtype)


def drn_d_38(head_features: Optional[int] = 128, dtype: Dtype = jnp.float32) -> DRN:
    return DRN(layers=(1, 1, 3, 4, 6, 3, 1, 1), arch="D",
               head_features=head_features, dtype=dtype)
