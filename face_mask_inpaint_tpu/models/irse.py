"""IR / IR-SE ResNet backbones and the pSp encoders.

Rebuild of reference modules/psp/encoders/helpers.py (bottleneck_IR[_SE],
SEModule, block specs), psp_encoders.py (GradualStyleBlock/Encoder + the two
last-layer backbone encoders with the reference-fusion contribution), and
model_irse.py (the ArcFace Backbone used by the ID loss).

Layout: NHWC. BatchNorm stats in ``batch_stats``.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.nn.blocks import ExampleGuidedAttention
from face_mask_inpaint_tpu.nn.layers import BatchNorm2d, Conv2d, Dense, PReLU
from face_mask_inpaint_tpu.models.stylegan2 import EqualLinear
from face_mask_inpaint_tpu.ops.resize import adaptive_avg_pool2d, bilinear_resize, scale_img

Dtype = Any

__all__ = [
    "get_blocks",
    "BottleneckIR",
    "GradualStyleEncoder",
    "BackboneEncoderUsingLastLayerIntoW",
    "BackboneEncoderUsingLastLayerIntoWPlus",
    "Backbone",
]


class BlockSpec(NamedTuple):
    in_channel: int
    depth: int
    stride: int


def _block(in_channel, depth, num_units, stride=2):
    return [BlockSpec(in_channel, depth, stride)] + [
        BlockSpec(depth, depth, 1) for _ in range(num_units - 1)
    ]


def get_blocks(num_layers: int) -> list[list[BlockSpec]]:
    """Layer specs (helpers.py:28-53).

    num_layers=4 is a TPU-rebuild extra (not in the reference): one unit per
    stage with the same channel ladder/strides, so the CI / driver dryrun can
    compile the full pSp training-step semantics on a single CPU core without
    paying for 24 bottleneck units."""
    if num_layers == 50:
        units = (3, 4, 14, 3)
    elif num_layers == 100:
        units = (3, 13, 30, 3)
    elif num_layers == 152:
        units = (3, 8, 36, 3)
    elif num_layers == 4:  # tiny CI/dryrun spec (net-new, see docstring)
        units = (1, 1, 1, 1)
    else:
        raise ValueError(f"Invalid number of layers: {num_layers}")
    chans = ((64, 64), (64, 128), (128, 256), (256, 512))
    return [_block(i, d, u) for (i, d), u in zip(chans, units)]


def _tap_indices(num_layers: int) -> tuple[int, int, int]:
    """Flat body indices of the last unit of stages 2/3/4 — the feature-
    pyramid taps. For IR-50 this reproduces the reference's hard-coded
    modulelist indices 6/20/23 (psp_encoders.py:104-112)."""
    cum = 0
    ends = []
    for block in get_blocks(num_layers):
        cum += len(block)
        ends.append(cum - 1)
    return ends[1], ends[2], ends[3]


class SEModule(nn.Module):
    """Squeeze-excite (helpers.py:57-73)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv2d(c // self.reduction, 1, use_bias=False, dtype=self.dtype, name="fc1")(s)
        s = jax.nn.relu(s)
        s = Conv2d(c, 1, use_bias=False, dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class BottleneckIR(nn.Module):
    """bottleneck_IR / bottleneck_IR_SE (helpers.py:76-119).

    shortcut: MaxPool2d(1, stride) (i.e. stride slicing) when in==depth, else
    1x1 conv + BN. res: BN - conv3x3 - PReLU(depth) - conv3x3(stride) - BN
    [- SE].
    """

    depth: int
    stride: int
    use_se: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        in_channel = x.shape[-1]
        if in_channel == self.depth:
            shortcut = x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = Conv2d(
                self.depth, 1, stride=self.stride, use_bias=False,
                dtype=self.dtype, name="shortcut_conv",
            )(x)
            shortcut = BatchNorm2d(
                use_running_average=not train, dtype=self.dtype, name="shortcut_bn"
            )(shortcut)

        res = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn0")(x)
        res = Conv2d(self.depth, 3, padding=1, use_bias=False, dtype=self.dtype, name="conv1")(res)
        res = PReLU(self.depth, dtype=self.dtype, name="prelu")(res)
        res = Conv2d(
            self.depth, 3, stride=self.stride, padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(res)
        res = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn2")(res)
        if self.use_se:
            res = SEModule(dtype=self.dtype, name="se")(res)
        return res + shortcut


class _IRBody(nn.Module):
    """Flat stack of bottleneck units, mirroring the torch Sequential body so
    tap indices 6/20/23 (psp_encoders.py:104-112) line up."""

    num_layers: int = 50
    mode: str = "ir_se"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True,
        tap_indices: Sequence[int] = (),
    ):
        use_se = self.mode == "ir_se"
        taps = {}
        idx = 0
        for block in get_blocks(self.num_layers):
            for spec in block:
                x = BottleneckIR(
                    spec.depth, spec.stride, use_se=use_se, dtype=self.dtype,
                    name=f"body_{idx}",
                )(x, train=train)
                if idx in tap_indices:
                    taps[idx] = x
                idx += 1
        return x, taps


class _InputLayer(nn.Module):
    """conv3x3(64) + BN + PReLU(64) stem shared by every IR encoder."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = Conv2d(64, 3, padding=1, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="bn")(x)
        return PReLU(64, dtype=self.dtype, name="prelu")(x)


class GradualStyleBlock(nn.Module):
    """Stride-2 conv chain to 1x1 + EqualLinear (psp_encoders.py:13-37)."""

    out_c: int
    spatial: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_weights: bool = False):
        """return_weights: create this block's parameters and return their
        effective values ([(w, b) per conv], (w, b) of the linear) instead of
        computing — the encoder stacks same-shaped sibling blocks and runs
        them as ONE scanned conv chain (18 unrolled heads = 98 large convs
        otherwise, which stalls the XLA compile; see GradualStyleEncoder)."""
        num_pools = int(math.log2(self.spatial))
        if return_weights:
            conv_ws = []
            h = x
            for i in range(num_pools):
                conv_ws.append(Conv2d(
                    self.out_c, 3, stride=2, padding=1, dtype=self.dtype,
                    name=f"conv{i}")(h, return_weights=True))
                h = jnp.zeros((1, 1, 1, self.out_c), x.dtype)
            lin = EqualLinear(
                self.out_c, lr_mul=1, dtype=self.dtype, name="linear")(
                jnp.zeros((1, self.out_c), x.dtype), return_weights=True)
            return conv_ws, lin
        for i in range(num_pools):
            x = Conv2d(self.out_c, 3, stride=2, padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            x = jax.nn.leaky_relu(x, 0.01)  # torch nn.LeakyReLU() default slope
        x = x.reshape(x.shape[0], self.out_c)
        return EqualLinear(self.out_c, lr_mul=1, dtype=self.dtype, name="linear")(x)


class GradualStyleEncoder(nn.Module):
    """FPN-style pSp encoder with reference fusion (psp_encoders.py:40-152).

    Taps c1/c2/c3 at body indices 6/20/23; when a reference image + mask are
    given, fuses ref features at each level (ExampleGuidedAttention on c3/c2
    when use_attention, mask lerp otherwise; c1 always lerped); 18 style
    heads read the FPN pyramid (coarse from c3, middle from p2, fine from p1).
    """

    num_layers: int = 50
    mode: str = "ir_se"
    n_styles: int = 18
    use_attention: bool = False
    dtype: Dtype = jnp.float32

    coarse_ind: int = 3
    middle_ind: int = 7

    def setup(self):
        # setup-style (not compact) so serving/benchmarks can jit
        # backbone_taps and fuse_styles as separate programs — the fused
        # two-backbone encode graph stalls/crashes the remote AOT compile
        # helper (ROUND2_NOTES relay gotchas)
        self.input_layer = _InputLayer(dtype=self.dtype)
        self.body = _IRBody(self.num_layers, self.mode, dtype=self.dtype)
        self.latlayer1 = Conv2d(512, 1, dtype=self.dtype)
        self.latlayer2 = Conv2d(512, 1, dtype=self.dtype)
        if self.use_attention:
            self.attention1 = ExampleGuidedAttention(
                out_channels=512, dtype=self.dtype)
            self.attention2 = ExampleGuidedAttention(
                out_channels=256, dtype=self.dtype)
        for j in range(self.n_styles):
            spatial = (16 if j < self.coarse_ind
                       else 32 if j < self.middle_ind else 64)
            setattr(self, f"styles_{j}",
                    GradualStyleBlock(512, spatial, dtype=self.dtype))

    def backbone_taps(self, x: jax.Array, train: bool = False):
        """One IR-SE backbone pass -> (c1, c2, c3) pyramid taps. Jittable on
        its own; src and ref reuse the same compiled program."""
        h = self.input_layer(x, train=train)
        t1, t2, t3 = _tap_indices(self.num_layers)
        _, taps = self.body(h, train=train, tap_indices=(t1, t2, t3))
        return taps[t1], taps[t2], taps[t3]

    def fuse_pyramid(self, src_taps, ref_taps=None, mask=None,
                     train: bool = False):
        """Reference fusion + FPN only -> (c3, p2, p1) style-head inputs.
        Split out so serving/benchmarks can jit it separately from the
        style-head levels: the combined fuse_styles graph compiles in
        seconds piecewise but blows up super-linearly as one program on the
        remote AOT compiler (measured 25 s in pieces vs 10+ min whole)."""
        del train
        c1, c2, c3 = self._fused_taps(src_taps, ref_taps, mask)
        lat1 = self.latlayer1(c2)
        p2 = bilinear_resize(c3, lat1.shape[1:3], align_corners=True) + lat1
        lat2 = self.latlayer2(c1)
        p1 = bilinear_resize(p2, lat2.shape[1:3], align_corners=True) + lat2
        return c3, p2, p1

    def styles_level(self, level: int, x: jax.Array) -> jax.Array:
        """One pyramid level's style heads: 0 coarse(c3) / 1 middle(p2) /
        2 fine(p1) -> [N, G_level, 512]."""
        if level == 0:
            return self._stacked_styles(range(self.coarse_ind), x, 16)
        if level == 1:
            return self._stacked_styles(
                range(self.coarse_ind, self.middle_ind), x, 32)
        return self._stacked_styles(
            range(self.middle_ind, self.n_styles), x, 64)

    def _fused_taps(self, src_taps, ref_taps, mask):
        c1, c2, c3 = src_taps
        if ref_taps is not None:
            assert mask is not None, "ref and mask should both be provided"
            m = mask[..., None].astype(c3.dtype)  # [N, H, W, 1]
            r1, r2, r3 = ref_taps

            mask_3 = scale_img(m, r3.shape[1:3])
            mask_2 = scale_img(m, r2.shape[1:3])
            mask_1 = scale_img(m, r1.shape[1:3])

            if self.use_attention:
                c3 = self.attention1(mask_3, c3, r3)
                c2 = self.attention2(mask_2, c2, r2)
            else:
                c3 = mask_3 * r3 + (1 - mask_3) * c3
                c2 = mask_2 * r2 + (1 - mask_2) * c2
            c1 = mask_1 * r1 + (1 - mask_1) * c1
        return c1, c2, c3

    def fuse_styles(self, src_taps, ref_taps=None, mask=None,
                    train: bool = False) -> jax.Array:
        """Reference fusion + FPN + the 18 style heads -> [N, 18, 512].
        Each pyramid level's style heads are same-shaped sibling blocks fed
        the SAME input — their parameters stack and the level runs as ONE
        scanned conv chain (identical math and parameter tree to 18
        unrolled GradualStyleBlocks; see _stacked_styles)."""
        c3, p2, p1 = self.fuse_pyramid(src_taps, ref_taps, mask, train=train)
        return jnp.concatenate(
            [self.styles_level(0, c3), self.styles_level(1, p2),
             self.styles_level(2, p1)], axis=1)  # [N, 18, 512]

    def __call__(
        self,
        x: jax.Array,
        ref: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        train: bool = True,
    ) -> jax.Array:
        src_taps = self.backbone_taps(x, train=train)
        ref_taps = (self.backbone_taps(ref, train=train)
                    if ref is not None else None)
        return self.fuse_styles(src_taps, ref_taps, mask, train=train)

    def _stacked_styles(self, idxs, x, spatial):
        """Run the group's GradualStyleBlocks as ONE lax.scan over their
        stacked parameters: the graph holds a single conv chain regardless
        of group size (vs 18 unrolled heads = 98 large convs, which stalls
        the remote AOT compile; a vmapped variant lowers to batch-grouped
        convs that stall it too — scanned plain convs compile fast and the
        serial G iterations are real MXU work either way)."""
        from face_mask_inpaint_tpu.ops.conv import conv2d

        weights = [
            getattr(self, f"styles_{j}")(x, return_weights=True)
            for j in idxs
        ]
        num_pools = int(math.log2(spatial))
        stacked = {
            f"w{i}": jnp.stack([w[0][i][0] for w in weights])
            for i in range(num_pools)
        }
        stacked.update({
            f"b{i}": jnp.stack([w[0][i][1] for w in weights])
            for i in range(num_pools)
        })
        stacked["wl"] = jnp.stack([w[1][0] for w in weights])
        stacked["bl"] = jnp.stack([w[1][1] for w in weights])
        xd = x.astype(self.dtype)
        n = xd.shape[0]

        def one_block(carry, ws):
            h = xd
            for i in range(num_pools):
                h = conv2d(h, ws[f"w{i}"], ws[f"b{i}"], stride=2, padding=1)
                h = jax.nn.leaky_relu(h, 0.01)
            out = h.reshape(n, 512) @ ws["wl"] + ws["bl"][None]
            return carry, out

        # FMI_STYLE_SCAN_UNROLL > 1 unrolls the scan body (same math, same
        # params): the while-loop overhead costs ~7 ms/step at the config-4
        # bench; unrolling trades compile time for it. On-chip sweep
        # (round 4, pSp bs16): 1 → 163.6* / 4 → 167.4 / 8 → 178.1 /
        # 11 (full) → 175.4 imgs/s (*at the then-current tree) — default 8;
        # very large unrolled graphs can stall the remote AOT compiler, so
        # full unroll stays opt-in.
        import os

        unroll = int(os.environ.get("FMI_STYLE_SCAN_UNROLL", "8"))
        _, outs = jax.lax.scan(one_block, None, stacked,
                               unroll=max(1, unroll))  # [G, N, 512]
        return outs.transpose(1, 0, 2)  # [N, G, 512]


class BackboneEncoderUsingLastLayerIntoW(nn.Module):
    """psp_encoders.py:155-185: pool last feature map to one w vector."""

    num_layers: int = 50
    mode: str = "ir_se"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ref=None, mask=None, train: bool = True) -> jax.Array:
        del ref, mask  # the reference variants ignore fusion
        h = _InputLayer(dtype=self.dtype, name="input_layer")(x, train=train)
        h, _ = _IRBody(self.num_layers, self.mode, dtype=self.dtype, name="body")(h, train=train)
        h = jnp.mean(h, axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        return EqualLinear(512, lr_mul=1, dtype=self.dtype, name="linear")(h)


class BackboneEncoderUsingLastLayerIntoWPlus(nn.Module):
    """psp_encoders.py:188-221: last feature map -> n_styles w vectors."""

    num_layers: int = 50
    mode: str = "ir_se"
    n_styles: int = 18
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ref=None, mask=None, train: bool = True) -> jax.Array:
        del ref, mask
        h = _InputLayer(dtype=self.dtype, name="input_layer")(x, train=train)
        h, _ = _IRBody(self.num_layers, self.mode, dtype=self.dtype, name="body")(h, train=train)
        h = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="out_bn")(h)
        h = adaptive_avg_pool2d(h, (7, 7))
        h = h.reshape(h.shape[0], -1)
        h = Dense(512, dtype=self.dtype, name="out_linear")(h)
        h = EqualLinear(512 * self.n_styles, lr_mul=1, dtype=self.dtype, name="linear")(h)
        return h.reshape(-1, self.n_styles, 512)


class Backbone(nn.Module):
    """ArcFace recognition net for the ID loss (model_irse.py:8-46):
    input 112 (or 224), output l2-normalized 512-d embedding.

    Dropout is identity at inference (the ID loss always runs the facenet in
    eval mode, id_loss.py:18).
    """

    input_size: int = 112
    num_layers: int = 50
    mode: str = "ir_se"
    drop_ratio: float = 0.6
    affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert self.input_size in (112, 224)
        h = _InputLayer(dtype=self.dtype, name="input_layer")(x, train=train)
        h, _ = _IRBody(self.num_layers, self.mode, dtype=self.dtype, name="body")(h, train=train)
        h = BatchNorm2d(use_running_average=not train, dtype=self.dtype, name="out_bn")(h)
        if train and self.drop_ratio > 0:
            h = nn.Dropout(self.drop_ratio, deterministic=False)(h)
        h = h.reshape(h.shape[0], -1)
        h = Dense(512, dtype=self.dtype, name="out_linear")(h)
        # BatchNorm1d(512, affine=affine)
        mean = self.variable("batch_stats", "out_bn1d_mean", lambda: jnp.zeros(512))
        var = self.variable("batch_stats", "out_bn1d_var", lambda: jnp.ones(512))
        h32 = h.astype(jnp.float32)
        if train:
            m = jnp.mean(h32, axis=0)
            v = jnp.var(h32, axis=0)
            if self.is_mutable_collection("batch_stats"):
                mean.value = 0.9 * mean.value + 0.1 * m
                var.value = 0.9 * var.value + 0.1 * v * h32.shape[0] / max(h32.shape[0] - 1, 1)
        else:
            m, v = mean.value, var.value
        h = ((h32 - m) * jax.lax.rsqrt(v + 1e-5)).astype(h.dtype)
        if self.affine:
            scale = self.param("out_bn1d_scale", nn.initializers.ones, (512,))
            bias = self.param("out_bn1d_bias", nn.initializers.zeros, (512,))
            h = h * scale.astype(h.dtype) + bias.astype(h.dtype)
        # l2_norm (helpers.py:16-19)
        return h / jnp.linalg.norm(h, axis=1, keepdims=True)
