"""StyleGAN2 generator + discriminator, TPU-native.

Rebuild of reference modules/psp/stylegan2/model.py. The two CUDA ops it
JIT-compiles (upfirdn2d, fused_bias_act) are ops/upfirdn2d.py and
ops/fused_act.py here.

TPU-first redesign of ModulatedConv2d (reference model.py:187-279): the torch
version materializes per-sample weights and runs a groups=batch convolution —
a poor fit for the MXU. Because convolution is linear and the style scale
broadcasts over input channels, we refactor algebraically:

    conv(x, scale*W*style_b)        == conv(x * style_b, scale*W)
    demod_b,o * conv(x, W')[...,o]  == per-(sample,channel) output scale

so the MXU sees ONE large batched convolution with shared weights; the style
modulation and demodulation become cheap elementwise scalings XLA fuses into
the conv epilogue. Numerics are identical (same products, same demod factor
computed from scale*W*style).

Stateful torch idioms made explicit:
- per-layer noise buffers live in the ``noises`` variable collection;
  randomize_noise draws from the flax 'noise' PRNG stream instead.
- style-mixing inject_index is an explicit argument (torch used
  random.randint, model.py:521).

Layout: NHWC. Style vectors: [N, 512].
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.ops.conv import conv2d, conv_transpose2d
from face_mask_inpaint_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from face_mask_inpaint_tpu.ops.upfirdn2d import blur, make_kernel, upsample_2d

Dtype = Any

__all__ = [
    "PixelNorm",
    "EqualConv2d",
    "EqualLinear",
    "ModulatedConv2d",
    "StyledConv",
    "ToRGB",
    "Generator",
    "Discriminator",
    "ConvLayer",
    "channels_for",
]


def _packed_synth_max_ch() -> int:
    """Channel threshold at or below which a synthesis stage executes
    space-to-depth packed (ops/packed.py). 0 disables. Env knobs:
    FMI_PACKED_SYNTH=0 turns packing off; FMI_PACKED_SYNTH_MAX_CH overrides
    the threshold (tests force small generators onto the packed path)."""
    import os

    if os.environ.get("FMI_PACKED_SYNTH", "1") == "0":
        return 0
    # Default 32: only the 1024² stage (ch 32) packs. Packing the 512² stage
    # too (threshold 64) LOSES on-chip — its packed conv_b
    # ([16,256,256,256]⊛[3,3,256,256]) draws an XLA emitter tiling at 108
    # TF/s vs the 182 the same-FLOP 1024²-stage form gets, and the 4×
    # executed-FLOP inflation then outweighs the lane fill (r4 sweep @ bs16:
    # max_ch 16 → 137.6 imgs/s, 32 → 188.3, 64 → 180.2).
    return int(os.environ.get("FMI_PACKED_SYNTH_MAX_CH", "32"))


def channels_for(size: int, channel_multiplier: int = 2,
                 base_channels: int = 512) -> dict[int, int]:
    """Per-resolution channel table (model.py:398-408).

    base_channels is a TPU-rebuild extra (not in the reference, which fixes
    the base at 512): it scales every entry proportionally so CI / the
    driver dryrun can execute full pSp training-step SEMANTICS (DP psum,
    encoder-only partitioning, frozen decoder) on a single CPU core without
    paying 512-wide conv FLOPs. Production paths always use the default."""
    scale = base_channels / 512
    return {
        4: int(512 * scale), 8: int(512 * scale),
        16: int(512 * scale), 32: int(512 * scale),
        64: int(256 * channel_multiplier * scale),
        128: int(128 * channel_multiplier * scale),
        256: int(64 * channel_multiplier * scale),
        512: int(32 * channel_multiplier * scale),
        1024: int(16 * channel_multiplier * scale),
    }


class PixelNorm(nn.Module):
    def __call__(self, x: jax.Array) -> jax.Array:
        return x * jax.lax.rsqrt(jnp.mean(x**2, axis=-1, keepdims=True) + 1e-8)


class EqualLinear(nn.Module):
    """Equalized-lr linear (model.py:135-171): weight stored N(0,1)/lr_mul,
    used scaled by (1/sqrt(in))*lr_mul; bias scaled by lr_mul."""

    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_weights: bool = False):
        in_dim = x.shape[-1]
        w = self.param(
            "weight",
            lambda k, s: jax.random.normal(k, s, jnp.float32) / self.lr_mul,
            (in_dim, self.out_dim),
        )
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        b = None
        if self.use_bias:
            b = self.param(
                "bias", lambda k, s: jnp.full(s, self.bias_init, jnp.float32),
                (self.out_dim,),
            )
        if return_weights:
            # effective (w, b) with the equalized-lr scaling folded in
            # (y = x @ w + b); for stacked/vmapped consumers
            assert self.activation is None
            return ((w * scale).astype(self.dtype),
                    (b * self.lr_mul).astype(self.dtype) if b is not None else None)
        y = x.astype(self.dtype) @ (w * scale).astype(self.dtype)
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(y, (b * self.lr_mul).astype(y.dtype) if b is not None else None)
        if b is not None:
            y = y + (b * self.lr_mul).astype(y.dtype)
        return y


class EqualConv2d(nn.Module):
    """Equalized-lr conv (model.py:94-132)."""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_channel = x.shape[-1]
        w = self.param(
            "weight", nn.initializers.normal(stddev=1.0),
            (self.kernel_size, self.kernel_size, in_channel, self.out_channel),
        )
        scale = 1.0 / math.sqrt(in_channel * self.kernel_size**2)
        b = self.param("bias", nn.initializers.zeros, (self.out_channel,)) if self.use_bias else None
        return conv2d(
            x.astype(self.dtype), (w * scale).astype(self.dtype),
            b.astype(self.dtype) if b is not None else None,
            stride=self.stride, padding=self.padding,
        )


class ModulatedConv2d(nn.Module):
    """Style-modulated conv (model.py:187-279), input/output-scaling form."""

    out_channel: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, style: jax.Array, pack_in: int = 1,
                 packed_out: bool = False) -> jax.Array:
        """x: [N, H, W, Cin] (pack_in == 1) or the space-to-depth packed
        [N, H/r, W/r, r²Cin] (ops/packed.py); style: [N, style_dim].

        Packed execution (pack_in > 1 and/or packed_out) is an execution
        strategy only — identical math, same param tree. With packed_out the
        upsample path's convT+blur pipeline is fused into one packed stencil
        (packed_upsample_conv) and the output lands packed at 2*pack_in on
        the same grid; non-upsample packed convs keep pack_in."""
        from face_mask_inpaint_tpu.ops.packed import (
            pack_conv1x1_kernel, packed_channel_scale, packed_conv3x3,
            packed_upsample_conv)

        in_channel = x.shape[-1] // (pack_in * pack_in)
        k = self.kernel_size
        w = self.param(
            "weight", nn.initializers.normal(stddev=1.0),
            (k, k, in_channel, self.out_channel),
        )
        scale = 1.0 / math.sqrt(in_channel * k**2)
        # style -> per-sample input-channel scale, bias_init=1 (model.py:232)
        s = EqualLinear(in_channel, bias_init=1.0, dtype=jnp.float32, name="modulation")(
            style.astype(jnp.float32)
        )  # [N, Cin]

        ws = (w * scale).astype(jnp.float32)
        if self.demodulate:
            # demod[b, o] = rsqrt(sum_hwi (scale*W*style_b)^2 + 1e-8)
            demod = jax.lax.rsqrt(
                jnp.einsum("hwio,bi->bo", ws * ws, s * s) + 1e-8
            )

        if pack_in > 1:
            xs = packed_channel_scale(x, s, pack_in)
        else:
            xs = x * s[:, None, None, :].astype(x.dtype)
        # FMI_MODCONV_BARRIER=1 materializes the style-scaled input instead
        # of letting XLA input-fuse the scale into the convolution — input
        # fusion recomputes x*s once per kernel tap (9x for a 3x3; suspected
        # cause of the 1024²-stage conv running 112 TF/s vs the unmodulated
        # packed convs' 190). Identity numerically; pending on-chip A/B.
        import os as _os

        if _os.environ.get("FMI_MODCONV_BARRIER", "0") == "1":
            xs = jax.lax.optimization_barrier(xs)
        wd = ws.astype(self.dtype)
        if self.upsample and (packed_out or pack_in > 1):
            assert k == 3, "packed upsample stencil is derived for k == 3"
            out = packed_upsample_conv(
                xs, wd, pack_in, blur_taps=tuple(self.blur_kernel))
            if self.demodulate:
                out = packed_channel_scale(out, demod, 2 * pack_in)
            return out
        if pack_in > 1:
            assert not self.downsample
            if k == 1:
                # FMI_PACKED_1X1_GROUP=g fuses g adjacent w-cells into one
                # matmul row (kron(I_g, W) kernel): the packed ToRGB's
                # r²·3 = 12 output lanes measured 1.3-3.7 TF/s; grouping
                # trades g× executed MACs for g× lane fill. Default 1
                # (off) pending the on-chip A/B.
                from face_mask_inpaint_tpu.ops.packed import conv1x1_w_grouped

                g = int(_os.environ.get("FMI_PACKED_1X1_GROUP", "1"))
                out = conv1x1_w_grouped(
                    xs, pack_conv1x1_kernel(wd, pack_in).astype(xs.dtype), g)
            else:
                out = packed_conv3x3(xs, wd, None, pack_in)
            if self.demodulate:
                out = packed_channel_scale(out, demod, pack_in)
            return out
        if self.upsample:
            out = conv_transpose2d(xs, wd, stride=2, padding=0, output_padding=0)
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad0 = (p + 1) // 2 + factor - 1
            pad1 = p // 2 + 1
            bk = make_kernel(self.blur_kernel) * (factor**2)
            out = blur(out, bk, pad=(pad0, pad1))
        elif self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            bk = make_kernel(self.blur_kernel)
            out = blur(xs, bk, pad=(pad0, pad1))
            out = conv2d(out, wd, stride=2, padding=0)
        elif (k == 1 and self.out_channel <= 8
              and xs.shape[1] * xs.shape[2] >= 128 * 128
              and int(_os.environ.get("FMI_TORGB_1X1_GROUP", "1")) > 1):
            # unpacked ToRGB 1x1: co=3 fills 3 of 128 output lanes — the
            # 512² site measured 2.24 ms/step at the pSp bs16 bench for
            # ~0.36 ms of bandwidth (round-5 fused trace, fusion.112).
            # Group g adjacent pixels into one matmul row (kron(I_g, W)).
            # Measured LOSING at g=16 (84.6 -> 90.3 ms/step: the reshape
            # breaks the modulation/bias/skip epilogue fusion and every
            # to_rgb site regressed) — default off, kept for the record.
            from face_mask_inpaint_tpu.ops.packed import conv1x1_w_grouped

            out = conv1x1_w_grouped(
                xs, wd, int(_os.environ.get("FMI_TORGB_1X1_GROUP", "1")))
        else:
            out = conv2d(xs, wd, padding=k // 2)

        if self.demodulate:
            out = out * demod[:, None, None, :].astype(out.dtype)
        return out


class NoiseInjection(nn.Module):
    """model.py:282-294; per-layer scalar weight starting at zero.

    packed_r > 1: ``image`` is the FLAT packed activation [N, G, G, r²C]
    (ops/packed.py slot-major layout; packed_c gives C); ``noise`` is the
    full-resolution [*, G*r, G*r, 1] map (drawn here with the SAME rng
    stream as the unpacked path when None), space-to-depth'd and repeated
    per original channel — bit-identical to broadcasting over a 5-D
    [N, G, G, r², C] view, but the add stays in the conv's own flat layout
    (the 5-D broadcast made XLA pick a transposed layout for the 1024²
    stages and pay ~4.9 ms/iter of relayout copies per stage at the pSp
    bs16 bench; trace: copy.117/112 + broadcast.150/159)."""

    @nn.compact
    def __call__(self, image: jax.Array, noise: Optional[jax.Array] = None,
                 packed_r: int = 1, packed_c: int = 0) -> jax.Array:
        w = self.param("weight", nn.initializers.zeros, (1,))
        if packed_r > 1:
            import os

            from face_mask_inpaint_tpu.ops.packed import (
                noise_expand_packed, space_to_depth)

            n, g1, g2, _ = image.shape
            h, wd = g1 * packed_r, g2 * packed_r
            if noise is None:
                noise = jax.random.normal(
                    self.make_rng("noise"), (n, h, wd, 1), image.dtype)
            # keep the noise map at ITS OWN batch (1 for the fixed per-layer
            # buffers): the expansion conv then runs and materializes at
            # batch 1 and the `image + w*noise_flat` add broadcasts for free
            # — pre-broadcasting to n ran the 1024²-stage expansion 16x
            # redundantly and wrote a ~1 GB intermediate at the pSp bench
            noise_b = noise.astype(image.dtype)
            if os.environ.get("FMI_PACKED_NOISE_CONV", "1") == "1":
                # bit-exact conv form of s2d+repeat: lands in the stage's
                # conv layout instead of forcing a transposed elementwise
                # chain + full-tensor relayout copies (see
                # ops/packed.py:noise_expand_packed)
                noise_flat = noise_expand_packed(noise_b, packed_r, packed_c)
            else:
                noise_p = space_to_depth(noise_b, packed_r)  # [n, g1, g2, r²]
                noise_flat = jnp.repeat(noise_p, packed_c, axis=-1)
            return image + w.astype(image.dtype) * noise_flat
        if noise is None:
            n, h, wd, _ = image.shape
            noise = jax.random.normal(self.make_rng("noise"), (n, h, wd, 1), image.dtype)
        return image + w.astype(image.dtype) * noise.astype(image.dtype)


class StyledConv(nn.Module):
    """ModulatedConv2d + NoiseInjection + FusedLeakyReLU (model.py:311-346)."""

    out_channel: int
    kernel_size: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    demodulate: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style, noise=None, pack_in: int = 1,
                 packed_out: bool = False):
        out = ModulatedConv2d(
            self.out_channel, self.kernel_size, demodulate=self.demodulate,
            upsample=self.upsample, blur_kernel=self.blur_kernel,
            dtype=self.dtype, name="conv",
        )(x, style, pack_in=pack_in, packed_out=packed_out)
        r = pack_in * (2 if self.upsample and (packed_out or pack_in > 1) else 1)
        bias = self.param("activate_bias", nn.initializers.zeros, (self.out_channel,))
        if r > 1:
            # packed noise + bias + leaky, all in the conv's FLAT layout
            # (per-slot noise repeated over the original channel axis,
            # bias tiled per slot — see NoiseInjection's layout note)
            out = NoiseInjection(name="noise")(
                out, noise, packed_r=r, packed_c=self.out_channel)
            return fused_leaky_relu(out, jnp.tile(bias, r * r))
        out = NoiseInjection(name="noise")(out, noise)
        return fused_leaky_relu(out, bias)


class ToRGB(nn.Module):
    """model.py:349-369: 1x1 modulated conv (no demod) + bias, skip upsample."""

    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style, skip=None, pack_in: int = 1,
                 skip_pack_in: int = 1):
        """pack_in: packing of x (output inherits it). skip_pack_in: packing
        of the incoming skip; it is upsampled on the packed grid to land at
        2*skip_pack_in, which must equal the output packing (the caller
        depth_to_spaces the skip by 2 first when grids differ)."""
        from face_mask_inpaint_tpu.ops.packed import packed_skip_upsample

        out = ModulatedConv2d(
            3, 1, demodulate=False, dtype=self.dtype, name="conv"
        )(x, style, pack_in=pack_in)
        bias = self.param("bias", nn.initializers.zeros, (3,))
        if pack_in > 1:
            bias_p = jnp.tile(bias, pack_in * pack_in)
            out = out + bias_p.astype(out.dtype)
        else:
            out = out + bias.astype(out.dtype)
        if skip is not None:
            if pack_in > 1:
                assert 2 * skip_pack_in == pack_in, (skip_pack_in, pack_in)
                skip = packed_skip_upsample(
                    skip, skip_pack_in, blur_taps=tuple(self.blur_kernel))
            elif (skip.shape[1] * skip.shape[2] >= 128 * 128
                  and os.environ.get("FMI_SKIP_UP_VPU", "1") == "1"):
                # same FIR as upsample_2d, but as VPU shifted adds on the
                # packed grid + the slice+stack unpack (rrc=12): the conv
                # form's 12-lane emit measured 1.2 ms/step at the 256²->512²
                # site for ~0.1 ms of bandwidth (round-5 pSp trace)
                from face_mask_inpaint_tpu.ops.packed import (
                    depth_to_space, packed_skip_upsample as _psu)
                skip = depth_to_space(
                    _psu(skip, 1, blur_taps=tuple(self.blur_kernel)), 2)
            else:
                skip = upsample_2d(skip, make_kernel(self.blur_kernel), factor=2)
            out = out + skip
        return out


class Generator(nn.Module):
    """StyleGAN2 synthesis network (model.py:372-550)."""

    size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    # TPU-rebuild CI/dryrun knob (see channels_for); reference is always 512.
    base_channels: int = 512
    dtype: Dtype = jnp.float32

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    def setup(self):
        self.channels = channels_for(self.size, self.channel_multiplier,
                                     self.base_channels)
        self.style = [
            EqualLinear(
                self.style_dim, lr_mul=self.lr_mlp, activation="fused_lrelu",
                dtype=self.dtype, name=f"style_{i + 1}",
            )
            for i in range(self.n_mlp)
        ]
        self.pixel_norm = PixelNorm()
        self.input_const = self.param(
            "input", nn.initializers.normal(stddev=1.0), (1, 4, 4, self.channels[4])
        )
        self.conv1 = StyledConv(
            self.channels[4], 3, blur_kernel=self.blur_kernel, dtype=self.dtype
        )
        self.to_rgb1 = ToRGB(upsample=False, dtype=self.dtype)

        convs = []
        to_rgbs = []
        in_ch = self.channels[4]
        for i in range(3, self.log_size + 1):
            out_ch = self.channels[2**i]
            convs.append(StyledConv(
                out_ch, 3, upsample=True, blur_kernel=self.blur_kernel,
                dtype=self.dtype,
            ))
            convs.append(StyledConv(
                out_ch, 3, blur_kernel=self.blur_kernel, dtype=self.dtype
            ))
            to_rgbs.append(ToRGB(dtype=self.dtype))
            in_ch = out_ch
        self.convs = convs
        self.to_rgbs = to_rgbs

        # Fixed per-layer noise buffers (model.py:428-431), collection 'noises'.
        noise_vars = []
        for layer_idx in range(self.num_layers):
            res = (layer_idx + 5) // 2
            shape = (1, 2**res, 2**res, 1)
            noise_vars.append(self.variable(
                "noises", f"noise_{layer_idx}",
                lambda s=shape: jax.random.normal(self.make_rng("params"), s),
            ))
        self._noise_vars = noise_vars

    def _noise_buffers(self):
        return [v.value for v in self._noise_vars]

    def map_style(self, z: jax.Array) -> jax.Array:
        """The 8-layer style MLP (PixelNorm + EqualLinear stack)."""
        h = self.pixel_norm(z)
        for layer in self.style:
            h = layer(h)
        return h

    def make_noise(self, rng: jax.Array) -> list[jax.Array]:
        """Fresh per-layer noise list (model.py:459-468), NHWC [1, H, W, 1]."""
        keys = jax.random.split(rng, self.num_layers)
        noises = [jax.random.normal(keys[0], (1, 4, 4, 1))]
        idx = 1
        for i in range(3, self.log_size + 1):
            for _ in range(2):
                noises.append(jax.random.normal(keys[idx], (1, 2**i, 2**i, 1)))
                idx += 1
        return noises

    def mean_latent(self, rng: jax.Array, n_latent: int) -> jax.Array:
        latent_in = jax.random.normal(rng, (n_latent, self.style_dim), jnp.float32)
        return jnp.mean(self.map_style(latent_in), axis=0, keepdims=True)

    def get_latent(self, z: jax.Array) -> jax.Array:
        return self.map_style(z)

    def __call__(
        self,
        styles: Sequence[jax.Array],
        return_latents: bool = False,
        return_features: bool = False,
        inject_index: Optional[int] = None,
        truncation: float = 1.0,
        truncation_latent: Optional[jax.Array] = None,
        input_is_latent: bool = False,
        noise: Optional[Sequence[Optional[jax.Array]]] = None,
        randomize_noise: bool = True,
    ):
        if not input_is_latent:
            styles = [self.map_style(s) for s in styles]

        if noise is None:
            if randomize_noise:
                noise = [None] * self.num_layers
            else:
                noise = self._noise_buffers()

        if truncation < 1:
            styles = [
                truncation_latent + truncation * (s - truncation_latent)
                for s in styles
            ]

        if len(styles) < 2:
            inject_index = self.n_latent
            if styles[0].ndim < 3:
                latent = jnp.repeat(styles[0][:, None, :], inject_index, axis=1)
            else:
                latent = styles[0]
        else:
            if inject_index is None:
                raise ValueError(
                    "style mixing requires an explicit inject_index "
                    "(the torch version drew random.randint at trace time)"
                )
            latent = jnp.concatenate([
                jnp.repeat(styles[0][:, None, :], inject_index, axis=1),
                jnp.repeat(styles[1][:, None, :], self.n_latent - inject_index, axis=1),
            ], axis=1)

        batch = latent.shape[0]
        out = jnp.broadcast_to(
            self.input_const.astype(self.dtype),
            (batch, *self.input_const.shape[1:]),
        )
        out = self.conv1(out, latent[:, 0], noise=noise[0])
        skip = self.to_rgb1(out, latent[:, 1])

        # Packed execution of the high-resolution tail (ops/packed.py): the
        # 512²/1024² stages have 64/32 channels — lane-starved and
        # layout-copy-bound on TPU (measured ~11 ms/iter of pure relayout
        # copies at the config-4 bench, round 3). Stages whose channel count
        # is <= the threshold (default: the 1024² stage only, see
        # _packed_synth_max_ch) run space-to-depth packed at r=2 (4x channels):
        # the upsample conv+blur is one fused stencil with zero FLOP
        # inflation, the 3x3 convs pay 4x executed FLOPs but run at MXU
        # peak, and the r=2-everywhere policy (depth_to_space between
        # stages) keeps inflation from compounding. Identical math, same
        # param tree; FMI_PACKED_SYNTH=0 disables.
        from face_mask_inpaint_tpu.ops.packed import depth_to_space

        max_ch = _packed_synth_max_ch()
        r = 1  # current packing of `out` (and `skip`)
        i = 1
        for idx in range(len(self.to_rgbs)):
            conv_a = self.convs[2 * idx]
            conv_b = self.convs[2 * idx + 1]
            packed = conv_a.out_channel <= max_ch
            if r > 1:
                # r=2-everywhere: unpack onto the doubled grid before the
                # next upsample (packed stages only ever see r in {1, 2})
                out = depth_to_space(out, r)
                skip = depth_to_space(skip, r)
                r = 1
            if packed:
                out = conv_a(out, latent[:, i], noise=noise[1 + 2 * idx],
                             pack_in=1, packed_out=True)
                out = conv_b(out, latent[:, i + 1], noise=noise[2 + 2 * idx],
                             pack_in=2)
                skip = self.to_rgbs[idx](out, latent[:, i + 2], skip,
                                         pack_in=2, skip_pack_in=1)
                r = 2
            else:
                out = conv_a(out, latent[:, i], noise=noise[1 + 2 * idx])
                out = conv_b(out, latent[:, i + 1], noise=noise[2 + 2 * idx])
                skip = self.to_rgbs[idx](out, latent[:, i + 2], skip)
            i += 2

        if r > 1:
            skip = depth_to_space(skip, r)
            if return_features:
                out = depth_to_space(out, r)

        image = skip
        if return_latents:
            return image, latent
        if return_features:
            return image, out
        return image, None


class ConvLayer(nn.Module):
    """Discriminator conv layer (model.py:553-599): optional blur+stride-2
    downsample, EqualConv2d, fused or scaled leaky relu."""

    out_channel: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (self.kernel_size - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            x = blur(x, make_kernel(self.blur_kernel), pad=(pad0, pad1))
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        x = EqualConv2d(
            self.out_channel, self.kernel_size, stride=stride, padding=padding,
            use_bias=self.use_bias and not self.activate, dtype=self.dtype,
            name="conv",
        )(x)
        if self.activate:
            if self.use_bias:
                bias = self.param("activate_bias", nn.initializers.zeros, (self.out_channel,))
                x = fused_leaky_relu(x, bias)
            else:
                x = scaled_leaky_relu(x)
        return x


class DResBlock(nn.Module):
    """Discriminator residual block (model.py:602-624)."""

    in_channel: int
    out_channel: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = ConvLayer(self.in_channel, 3, dtype=self.dtype, name="conv1")(x)
        out = ConvLayer(self.out_channel, 3, downsample=True, dtype=self.dtype, name="conv2")(out)
        skip = ConvLayer(
            self.out_channel, 1, downsample=True, activate=False, use_bias=False,
            dtype=self.dtype, name="skip",
        )(x)
        return (out + skip) / math.sqrt(2)


class Discriminator(nn.Module):
    """StyleGAN2 discriminator with minibatch stddev (model.py:627-685)."""

    size: int = 1024
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    stddev_group: int = 4
    stddev_feat: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        channels = channels_for(self.size, self.channel_multiplier)
        log_size = int(math.log2(self.size))
        out = ConvLayer(channels[self.size], 1, dtype=self.dtype, name="conv_in")(x)
        in_ch = channels[self.size]
        for i in range(log_size, 2, -1):
            out_ch = channels[2 ** (i - 1)]
            out = DResBlock(in_ch, out_ch, dtype=self.dtype, name=f"res_{i}")(out)
            in_ch = out_ch

        # minibatch stddev (model.py:671-678) on NHWC: split the batch into
        # `group`-sized chunks, per-chunk feature stddev appended as a channel.
        n, h, w, c = out.shape
        group = min(n, self.stddev_group)
        feat = self.stddev_feat
        stddev = out.reshape(group, n // group, h, w, feat, c // feat)
        stddev = jnp.sqrt(jnp.var(stddev, axis=0) + 1e-8)  # [n/g, h, w, feat, c/f]
        stddev = jnp.mean(stddev, axis=(1, 2, 4))  # -> [n/g, feat]
        stddev = jnp.tile(stddev[:, None, None, :], (group, h, w, 1))  # [n, h, w, feat]
        out = jnp.concatenate([out, stddev], axis=-1)

        out = ConvLayer(channels[4], 3, dtype=self.dtype, name="final_conv")(out)
        out = out.reshape(n, -1)
        out = EqualLinear(
            channels[4], activation="fused_lrelu", dtype=self.dtype, name="final_linear1",
        )(out)
        return EqualLinear(1, dtype=self.dtype, name="final_linear2")(out)
