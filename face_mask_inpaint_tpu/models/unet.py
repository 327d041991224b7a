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


def _bn_packed(bn: nn.Module, x: jax.Array, pack: int) -> jax.Array:
    """BatchNorm on an r-packed map via the contiguous [N, Hp, Wp·r², C]
    view — a pure reshape (packed channel index is (slot)·C + c), so both
    eval (running-stat affine) and train (batch stats over all pixels)
    match the dense op exactly."""
    if pack == 1:
        return bn(x)
    n, hp, wp, cc = x.shape
    c = cc // (pack * pack)
    y = bn(x.reshape(n, hp, wp * pack * pack, c))
    return y.reshape(n, hp, wp, cc)


class DoubleConv(nn.Module):
    """(conv 3x3 -> BN -> ReLU) x 2 (unet_parts.py:8-25)."""

    out_channels: int
    mid_channels: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True, concat_with=None,
                 pack: int = 1) -> jax.Array:
        """concat_with: second input semantically concatenated on channels
        (the UNet skip) — executed as summed convs so the concat never
        materializes in a conv-hostile layout (saves a full-map copy).
        pack > 1: input (and concat_with) arrive space-to-depth packed; the
        whole block runs on the packed layout (ops/packed.py)."""
        mid = self.out_channels if self.mid_channels is None else self.mid_channels
        x = Conv2d(mid, 3, padding=1, dtype=self.dtype, name="conv1")(
            x, concat_with=concat_with, pack=pack)
        x = _bn_packed(BatchNorm2d(
            use_running_average=not train, dtype=self.dtype, name="bn1"),
            x, pack)
        x = jax.nn.relu(x)
        x = Conv2d(self.out_channels, 3, padding=1, dtype=self.dtype,
                   name="conv2")(x, pack=pack)
        x = _bn_packed(BatchNorm2d(
            use_running_average=not train, dtype=self.dtype, name="bn2"),
            x, pack)
        return jax.nn.relu(x)


class Down(nn.Module):
    """maxpool(2) + DoubleConv (unet_parts.py:28-39)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 pre_pooled: bool = False) -> jax.Array:
        """pre_pooled: the caller already applied the 2x maxpool (the packed
        stem pools as a channel-slot max, ops/packed layout)."""
        if not pre_pooled:
            x = max_pool2d(x, 2)
        return DoubleConv(self.out_channels, dtype=self.dtype, name="conv")(
            x, train=train
        )


class Up(nn.Module):
    """Upsample (bilinear align_corners=True, or convtranspose k=2 s=2), pad
    to match odd skip sizes, concat skip, DoubleConv (unet_parts.py:42-68)."""

    out_channels: int
    bilinear: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = True,
                 pack_skip: int = 1) -> jax.Array:
        """pack_skip > 1: the skip x2 arrives space-to-depth packed; x1 is
        upsampled dense then packed to match, and the DoubleConv runs on the
        packed layout (the 256² up4 stage is otherwise lane-starved at
        C=64/128 — packing fills the 128-wide MXU/VPU lanes)."""
        in_ch = x1.shape[-1]
        if self.bilinear:
            x1 = bilinear_resize(x1, (2 * x1.shape[1], 2 * x1.shape[2]), align_corners=True)
            if pack_skip > 1:
                from face_mask_inpaint_tpu.ops.packed import space_to_depth

                x1 = space_to_depth(x1, pack_skip)
            # torch: DoubleConv(in_channels, out, in_channels // 2) where
            # in_channels is the POST-concat width == 2 * x1 channels here.
            mid = in_ch
        else:
            assert pack_skip == 1
            x1 = ConvTranspose2d(
                in_ch // 2, kernel_size=2, stride=2, padding=0, output_padding=0,
                dtype=self.dtype, name="up",
            )(x1)
            mid = None
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            assert pack_skip == 1, "packed Up requires matching even sizes"
            x1 = jnp.pad(
                x1,
                ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
            )
        # conv(concat([x2, x1])) as two summed convs — no materialized concat
        return DoubleConv(self.out_channels, mid, dtype=self.dtype, name="conv")(
            x2, train=train, concat_with=x1, pack=pack_skip
        )


class UNet(nn.Module):
    """Full UNet (unet_model.py:6-36). Returns [N, H, W, n_classes] logits."""

    n_classes: int = 2
    bilinear: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 pack: int = 1, diff_head: bool = False) -> jax.Array:
        """pack == 2 runs the full-resolution stages (inc, up4, outc) on a
        space-to-depth packed layout — identical math (packed convs build
        their kernels from the same weights; BatchNorm runs on a reshaped
        view), but C=64 maps at 256² waste half of every 128-wide
        MXU/VPU lane pass, while the packed form runs 256-wide. Requires
        bilinear upsampling and even H/W; returns logits PACKED at r=pack
        ([N, H/r, W/r, r²·n_classes]) — depth_to_space for the dense form."""
        factor = 2 if self.bilinear else 1
        assert pack in (1, 2)
        if pack > 1:
            from face_mask_inpaint_tpu.ops.packed import space_to_depth

            assert self.bilinear and x.shape[1] % pack == 0 and x.shape[2] % pack == 0
            x = space_to_depth(x, pack)
        x1 = DoubleConv(64, dtype=self.dtype, name="inc")(x, train=train,
                                                          pack=pack)
        if pack == 2:
            # 2x maxpool of the r=2-packed map == max over the 4 channel
            # slots; lands the dense half-resolution map for the down path
            n, hp, wp, cc = x1.shape
            pooled = jnp.max(x1.reshape(n, hp, wp, 4, cc // 4), axis=3)
            x2 = Down(128, dtype=self.dtype, name="down1")(
                pooled, train=train, pre_pooled=True)
        else:
            x2 = Down(128, dtype=self.dtype, name="down1")(x1, train=train)
        x3 = Down(256, dtype=self.dtype, name="down2")(x2, train=train)
        x4 = Down(512, dtype=self.dtype, name="down3")(x3, train=train)
        x5 = Down(1024 // factor, dtype=self.dtype, name="down4")(x4, train=train)
        y = Up(512 // factor, self.bilinear, dtype=self.dtype, name="up1")(x5, x4, train=train)
        y = Up(256 // factor, self.bilinear, dtype=self.dtype, name="up2")(y, x3, train=train)
        y = Up(128 // factor, self.bilinear, dtype=self.dtype, name="up3")(y, x2, train=train)
        y = Up(64, self.bilinear, dtype=self.dtype, name="up4")(
            y, x1, train=train, pack_skip=pack)
        if diff_head:
            # two-class decision head: logits[1] - logits[0] as ONE
            # channel-reduce (same outc params) instead of the 2-channel 1x1
            # conv — the [N, 256, 256, 2] output lands in a T(2,128) layout
            # that pads 2 lanes to 128 (measured 1.10 ms/step at bs16 for
            # ~0.2 ms of bandwidth, round-5 flagship trace, fusion.46)
            assert pack == 1 and self.n_classes == 2
            w, b = Conv2d(self.n_classes, 1, dtype=self.dtype, name="outc")(
                y, return_weights=True)
            dw = (w[0, 0, :, 1] - w[0, 0, :, 0]).astype(y.dtype)
            db = (b[1] - b[0]).astype(y.dtype)
            return jnp.einsum("nhwc,c->nhw", y, dw) + db
        return Conv2d(self.n_classes, 1, dtype=self.dtype, name="outc")(
            y, pack=pack)


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
    def __call__(self, image: jax.Array, mode: str = "train",
                 train: bool = False, pack: int = 1, diff_head: bool = False):
        """pack > 1 (mode='train' only): run the UNet's packed execution and
        return PACKED logits [N, H/r, W/r, r²·2] (predict_mask consumes).
        diff_head (mode='train' only): [N, H, W] logits[1]-logits[0]."""
        logits = UNet(2, self.bilinear, dtype=self.dtype, name="model")(
            image, train=train, pack=pack, diff_head=diff_head
        )
        if mode == "train":
            return logits
        assert pack == 1
        return jax.nn.softmax(logits, axis=-1) > self.threshold

    def predict_mask(self, image: jax.Array) -> jax.Array:
        """argmax path used by every inference harness: [N, H, W] float mask.

        With exactly two classes, argmax(logits) == (logits[1] > logits[0])
        including the tie (both pick class 0) — the comparison avoids XLA's
        iota+reduce argmax lowering (~0.5 ms/step at bs16 256² on v5e).

        FMI_PACKED_UNET=1 opts into the packed (space-to-depth) execution
        of the full-resolution stages (UNet.__call__ pack=2) — identical
        logits (parity-pinned), but MEASURED SLOWER on v5e (17.5 vs 13.6
        ms at bs16 256² bf16): unlike the 32/3-channel decoder tail, the
        C=64 UNet convs are not MXU-starved, so the packed form's 1.78x
        executed-FLOP inflation dominates."""
        import os

        pack = (2 if image.shape[1] % 2 == 0 and image.shape[2] % 2 == 0
                and self.bilinear
                and os.environ.get("FMI_PACKED_UNET") == "1" else 1)
        if pack == 1 and os.environ.get("FMI_UNET_DIFF_HEAD", "1") == "1":
            # one-channel decision head (logits[1]-logits[0] as a channel
            # reduce, same outc params): identical decision except at
            # float-rounding near-ties on the mask boundary; skips the
            # 2-lane padded [N, H, W, 2] intermediate (see UNet.__call__)
            d = self(image, mode="train", train=False, diff_head=True)
            return (d > 0).astype(jnp.float32)
        logits = self(image, mode="train", train=False, pack=pack)
        if pack == 1:
            return (logits[..., 1] > logits[..., 0]).astype(jnp.float32)
        from face_mask_inpaint_tpu.ops.packed import depth_to_space

        m = (logits[..., 1::2] > logits[..., 0::2])  # [N, Hp, Wp, r²]
        return depth_to_space(m.astype(jnp.float32), pack)[..., 0]
