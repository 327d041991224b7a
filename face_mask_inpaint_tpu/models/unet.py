"""UNet mask detector (Stack C).

TPU-native rebuild of reference modules/unet/{unet_model.py,unet_parts.py}
and modules/mask_detector.py: classic 4-down/4-up UNet (64..1024//factor
channels), bilinear (align_corners=True) or transposed-conv upsampling,
odd-size padding on skip concat, 1x1 output head.

Layout: NHWC. BatchNorm running stats live in ``batch_stats``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.nn.layers import BatchNorm2d, Conv2d, ConvTranspose2d
from face_mask_inpaint_tpu.ops.resize import bilinear_resize, max_pool2d

Dtype = Any

__all__ = ["UNet", "MaskDetector"]


class DoubleConv(nn.Module):
    """(conv 3x3 -> BN -> ReLU) x 2 (unet_parts.py:8-25)."""

    out_channels: int
    mid_channels: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True, concat_with=None) -> jax.Array:
        """concat_with: second input semantically concatenated on channels
        (the UNet skip) — executed as summed convs so the concat never
        materializes in a conv-hostile layout (saves a full-map copy)."""
        mid = self.out_channels if self.mid_channels is None else self.mid_channels
        x = Conv2d(mid, 3, padding=1, dtype=self.dtype, name="conv1")(
            x, concat_with=concat_with)
        x = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = jax.nn.relu(x)
        x = Conv2d(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv2")(x)
        x = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn2")(x)
        return jax.nn.relu(x)


class Down(nn.Module):
    """maxpool(2) + DoubleConv (unet_parts.py:28-39)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        return DoubleConv(self.out_channels, dtype=self.dtype, name="conv")(
            max_pool2d(x, 2), train=train
        )


class Up(nn.Module):
    """Upsample (bilinear align_corners=True, or convtranspose k=2 s=2), pad
    to match odd skip sizes, concat skip, DoubleConv (unet_parts.py:42-68)."""

    out_channels: int
    bilinear: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = True) -> jax.Array:
        in_ch = x1.shape[-1]
        if self.bilinear:
            x1 = bilinear_resize(x1, (2 * x1.shape[1], 2 * x1.shape[2]), align_corners=True)
            # torch: DoubleConv(in_channels, out, in_channels // 2) where
            # in_channels is the POST-concat width == 2 * x1 channels here.
            mid = in_ch
        else:
            x1 = ConvTranspose2d(
                in_ch // 2, kernel_size=2, stride=2, padding=0, output_padding=0,
                dtype=self.dtype, name="up",
            )(x1)
            mid = None
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            x1 = jnp.pad(
                x1,
                ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
            )
        # conv(concat([x2, x1])) as two summed convs — no materialized concat
        return DoubleConv(self.out_channels, mid, dtype=self.dtype, name="conv")(
            x2, train=train, concat_with=x1
        )


class UNet(nn.Module):
    """Full UNet (unet_model.py:6-36). Returns [N, H, W, n_classes] logits."""

    n_classes: int = 2
    bilinear: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        factor = 2 if self.bilinear else 1
        x1 = DoubleConv(64, dtype=self.dtype, name="inc")(x, train=train)
        x2 = Down(128, dtype=self.dtype, name="down1")(x1, train=train)
        x3 = Down(256, dtype=self.dtype, name="down2")(x2, train=train)
        x4 = Down(512, dtype=self.dtype, name="down3")(x3, train=train)
        x5 = Down(1024 // factor, dtype=self.dtype, name="down4")(x4, train=train)
        y = Up(512 // factor, self.bilinear, dtype=self.dtype, name="up1")(x5, x4, train=train)
        y = Up(256 // factor, self.bilinear, dtype=self.dtype, name="up2")(y, x3, train=train)
        y = Up(128 // factor, self.bilinear, dtype=self.dtype, name="up3")(y, x2, train=train)
        y = Up(64, self.bilinear, dtype=self.dtype, name="up4")(y, x1, train=train)
        return Conv2d(self.n_classes, 1, dtype=self.dtype, name="outc")(y)


class MaskDetector(nn.Module):
    """Mask detector wrapper (modules/mask_detector.py:7-30).

    mode='train': raw logits [N, H, W, 2].
    mode='eval': softmax(logits) > threshold, bool [N, H, W, 2].

    Note: all real call sites in the reference use mode='train' followed by
    argmax over the class axis (PICNet_inference.py:100-101); use
    ``predict_mask`` for that primary path.
    """

    n_channels: int = 3
    bilinear: bool = True
    threshold: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, mode: str = "train", train: bool = False):
        logits = UNet(2, self.bilinear, dtype=self.dtype, name="model")(
            image, train=train
        )
        if mode == "train":
            return logits
        return jax.nn.softmax(logits, axis=-1) > self.threshold

    def predict_mask(self, image: jax.Array) -> jax.Array:
        """argmax path used by every inference harness: [N, H, W] float mask.

        With exactly two classes, argmax(logits) == (logits[1] > logits[0])
        including the tie (both pick class 0) — the comparison avoids XLA's
        iota+reduce argmax lowering (~0.5 ms/step at bs16 256² on v5e).
        """
        logits = self(image, mode="train", train=False)
        return (logits[..., 1] > logits[..., 0]).astype(jnp.float32)
