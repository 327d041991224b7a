"""PICNet-style building blocks and the attention modules.

TPU-native re-design of reference modules/pluralistic_model/base_function.py
(ResBlock family, Auto_Attn, CoordConv) and modules/example_guided_att.py
(ExampleGuidedAttention). Attention maps up to 4096 tokens are materialized
as plain batched MXU matmuls; larger ones (the 256^2 decode path puts
Auto_Attn at 128^2 = 16k tokens) stream through the flash-attention Pallas
kernel / blockwise softmax in ops/attention.py.

Layout: NHWC.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from face_mask_inpaint_tpu.nn.layers import (
    Activation,
    Conv2d,
    ConvTranspose2d,
    InstanceNorm2d,
    make_norm,
)
from face_mask_inpaint_tpu.ops.conv import pixel_shuffle
from face_mask_inpaint_tpu.ops.pallas.packed_convt import use_packed_convt_kernel
from face_mask_inpaint_tpu.ops.resize import avg_pool2d, reflection_pad2d


def _norm_act(h, norm, activation, name, train, act_module, pack: int = 1):
    """Apply [norm -> activation]; for instance norm + (Leaky)ReLU this is
    ONE fused pass (InstanceNorm2d.fuse_act -> the Pallas norm-act kernel on
    TPU), otherwise the registry norm followed by the activation module.
    pack > 1 executes on the space-to-depth packed layout (instance/none
    norms only; the decoder-tail gating in ResGenerator guarantees this)."""
    if norm == "instance" and activation in ("LeakyReLU", "ReLU"):
        return InstanceNorm2d(fuse_act=activation, name=name)(h, pack=pack)
    if pack > 1:
        assert norm == "none" and activation != "PReLU", (
            "packed norm-act supports instance/none norms, non-PReLU acts")
        return act_module(h)
    norm_mod = make_norm(norm, name, train)
    if norm_mod is not None:
        h = norm_mod(h)
    return act_module(h)


Dtype = Any

__all__ = [
    "AddCoords",
    "CoordConvWrap",
    "ResBlock",
    "ResBlockEncoderOptimized",
    "ResBlockDecoder",
    "Output",
    "AutoAttention",
    "ExampleGuidedAttention",
]


def add_coords(x: jax.Array, with_r: bool = False) -> jax.Array:
    """AddCoords (base_function.py:152-184) on NHWC: append normalized
    height/width index channels (and optionally radius)."""
    n, h, w, _ = x.shape
    hh = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)[None, :, None, None]
    ww = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)[None, None, :, None]
    hh = jnp.broadcast_to(hh, (n, h, w, 1))
    ww = jnp.broadcast_to(ww, (n, h, w, 1))
    feats = [x, hh, ww]
    if with_r:
        feats.append(jnp.sqrt(hh**2 + ww**2))
    return jnp.concatenate(feats, axis=-1)


class AddCoords(nn.Module):
    with_r: bool = False

    def __call__(self, x: jax.Array) -> jax.Array:
        return add_coords(x, self.with_r)


class CoordConvWrap(nn.Module):
    """coord_conv factory (base_function.py:136-146): plain (optionally
    spectral-normalized) conv, or AddCoords + conv when use_coord."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    use_spect: bool = False
    use_coord: bool = False
    with_r: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pack: int = 1,
                 fuse_avgpool2: bool = False,
                 return_weights: bool = False) -> jax.Array:
        if self.use_coord:
            assert pack == 1, "CoordConv is incompatible with packed execution"
            x = add_coords(x, self.with_r)
        return Conv2d(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            use_bias=self.use_bias,
            use_spect=self.use_spect,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x, pack=pack, fuse_avgpool2=fuse_avgpool2,
          return_weights=return_weights)


class ResBlock(nn.Module):
    """Pre-activation residual block with none/up/down sampling
    (base_function.py:207-268).

    up: both branches output 4*output_nc channels, then PixelShuffle(2).
    down: both branches AvgPool2d(2) after their convs.
    """

    output_nc: int
    hidden_nc: Optional[int] = None
    norm: str = "none"
    activation: str = "LeakyReLU"
    sample_type: str = "none"
    use_spect: bool = False
    use_coord: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        hidden_nc = self.output_nc if self.hidden_nc is None else self.hidden_nc
        out_nc = self.output_nc
        if self.sample_type == "up":
            out_nc = out_nc * 4
        elif self.sample_type not in ("none", "down"):
            raise NotImplementedError(f"sample type [{self.sample_type}] is not found")

        act = Activation(self.activation, name="act")

        def cc(feats, ks, pad, name):
            return CoordConvWrap(
                features=feats,
                kernel_size=ks,
                padding=pad,
                use_spect=self.use_spect,
                use_coord=self.use_coord,
                kernel_init=self.kernel_init,
                dtype=self.dtype,
                name=name,
            )

        down = self.sample_type == "down"
        h = _norm_act(x, self.norm, self.activation, "norm1", train, act)
        h = cc(hidden_nc, 3, 1, "conv1")(h)
        h = _norm_act(h, self.norm, self.activation, "norm2", train, act)
        # conv→AvgPool tails fold into one stride-2 conv (exact; layers.py)
        h = cc(out_nc, 3, 1, "conv2")(h, fuse_avgpool2=down)

        s = cc(out_nc, 1, 0, "bypass")(x, fuse_avgpool2=down)

        if self.sample_type == "up":
            return pixel_shuffle(h, 2) + pixel_shuffle(s, 2)
        if down:
            return h + s
        return h + s


class ResBlockEncoderOptimized(nn.Module):
    """Stem block (base_function.py:271-305): convs first (no pre-activation),
    AvgPool at the end of the residual branch; shortcut pools then 1x1."""

    output_nc: int
    norm: str = "none"
    activation: str = "LeakyReLU"
    use_spect: bool = False
    use_coord: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        act = Activation(self.activation, name="act")

        def cc(feats, ks, pad, name):
            return CoordConvWrap(
                features=feats,
                kernel_size=ks,
                padding=pad,
                use_spect=self.use_spect,
                use_coord=self.use_coord,
                kernel_init=self.kernel_init,
                dtype=self.dtype,
                name=name,
            )

        h = cc(self.output_nc, 3, 1, "conv1")(x)
        norm1 = make_norm(self.norm, "norm1", train)
        if norm1 is not None:
            h = norm1(h)
        h = act(h)
        # conv2→AvgPool folds into one stride-2 conv (exact; layers.py) —
        # the full-resolution conv2 output is never materialized
        h = cc(self.output_nc, 3, 1, "conv2")(h, fuse_avgpool2=True)

        s = cc(self.output_nc, 1, 0, "bypass")(avg_pool2d(x, 2))
        return h + s


class ResBlockDecoder(nn.Module):
    """Upsampling decoder block (base_function.py:308-364): 3x3 conv then
    stride-2 ConvTranspose (k=3, p=1, op=1); transposed-conv shortcut."""

    output_nc: int
    hidden_nc: Optional[int] = None
    norm: str = "instance"
    activation: str = "LeakyReLU"
    use_spect: bool = False
    use_coord: bool = False  # unused by the reference block; kept for parity
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True,
        pack_in: int = 1, pack_output: bool = False,
        fuse_act: Optional[str] = None,
        in_stats=None, want_stats: bool = False,
        return_pair: bool = False,
        half_output: bool = False,
    ):
        """pack_in: the input's space-to-depth factor (1 = plain NHWC).
        pack_output: emit the upsampled result packed at 2*pack_in on the
        same block grid instead of materializing the doubled resolution.
        fuse_act: activation the CONSUMER would apply first thing (the Output
        head's leading act) — fused into the Pallas epilogue when the
        stencil kernel runs; applied here in the dense path so the returned
        tensor is pre-activated either way.
        in_stats / want_stats (fused-kernel path): per-(sample, channel)
        f32 (Σx, Σx²) of this block's INPUT from the previous stage's kernel
        epilogue, and whether to emit the same for this block's output.
        return_pair (dense path only): return the (h, bypass) streams
        PRE-add and PRE-fuse_act — the packed Output-head kernel sums and
        activates them in-VMEM, skipping the full-size act(h+s) round-trip.
        The fused stencil path ignores it (its epilogue already fuses the
        add+act) and returns the single activated tensor as usual.
        Returns out, or (out, stats or None) when want_stats."""
        hidden_nc = self.output_nc if self.hidden_nc is None else self.hidden_nc
        act = Activation(self.activation, name="act")

        conv1 = Conv2d(
            hidden_nc, 3, padding=1, use_spect=self.use_spect,
            kernel_init=self.kernel_init, dtype=self.dtype, name="conv1",
        )
        conv2 = ConvTranspose2d(
            self.output_nc, 3, stride=2, padding=1, output_padding=1,
            use_spect=self.use_spect, kernel_init=self.kernel_init,
            dtype=self.dtype, name="conv2",
        )
        bypass = ConvTranspose2d(
            self.output_nc, 3, stride=2, padding=1, output_padding=1,
            use_spect=self.use_spect, kernel_init=self.kernel_init,
            dtype=self.dtype, name="bypass",
        )

        fuse_kernel = (
            pack_output
            and not half_output
            and self.norm in ("instance", "none")
            and self.activation in ("LeakyReLU", "ReLU")
            and not self.use_coord
            and use_packed_convt_kernel(train, pack_in)
        )
        if fuse_kernel:
            # The whole block runs as TWO Pallas stencil kernels at true
            # FLOPs (the dense packed forms pay r²-ish inflation), with the
            # instance norms folded in as affine prologues / stats epilogues
            # so no standalone normalize or stats pass survives between them
            # (ops/pallas/packed_convt.py).
            out, stats = self._fused_tail(
                x, conv1, conv2, bypass, pack_in, fuse_act,
                in_stats, want_stats)
            return (out, stats) if want_stats else out

        h = _norm_act(x, self.norm, self.activation, "norm1", train, act,
                      pack=pack_in)
        h = conv1(h, pack=pack_in)
        h = _norm_act(h, self.norm, self.activation, "norm2", train, act,
                      pack=pack_in)
        if half_output and pack_output and pack_in > 1:
            # r-capped emission: unpack the operands to the true double grid
            # and run the convTs at r_in=1, so the output lands HALF-packed
            # (r=2 on the doubled grid) instead of (2*pack_in)-packed on
            # this grid. Executed convT FLOPs stop scaling with pack_in²
            # (decoder4 at the flagship: 549+1097 GF -> 137+275 GF) while
            # channel widths stay MXU-lane-full; the Output head consumes
            # the half form directly (packed_conv3x3_half_in).
            from face_mask_inpaint_tpu.ops.packed import depth_to_space

            h = conv2(depth_to_space(h, pack_in), pack_in=1, packed_out=True)
            s = bypass(depth_to_space(x, pack_in), pack_in=1, packed_out=True)
        else:
            h = conv2(h, pack_in=pack_in, packed_out=pack_output)
            s = bypass(x, pack_in=pack_in, packed_out=pack_output)
        if return_pair:
            return ((h, s), None) if want_stats else (h, s)
        out = h + s
        if fuse_act is not None:
            out = act(out)
        if want_stats:
            return out, None
        return out

    def _fused_tail(self, x, conv1, conv2, bypass, r, fuse_act,
                    in_stats, want_stats):
        from face_mask_inpaint_tpu.nn.layers import InstanceNorm2d
        from face_mask_inpaint_tpu.ops.pallas.packed_convt import (
            instance_affine_from_stats, packed_conv3x3_stats,
            packed_convt_pair)

        n, hp, wp, sc = x.shape
        count = hp * wp * r * r  # per-channel element count at full res
        instance = self.norm == "instance"

        def affine(name, stats, c):
            """(A, B) for y·A + B == InstanceNorm(name)(y) (or identity)."""
            if not instance:
                return (jnp.ones((n, c), jnp.float32),
                        jnp.zeros((n, c), jnp.float32))
            g, be = InstanceNorm2d(name=name)(
                jnp.zeros((1, 1, 1, c), x.dtype), return_affine=True)
            return instance_affine_from_stats(stats[0], stats[1], count, g, be)

        c_in = sc // (r * r)
        if instance and in_stats is None:
            xf = x.astype(jnp.float32).reshape(n, hp, wp, r * r, c_in)
            in_stats = (jnp.sum(xf, axis=(1, 2, 3)),
                        jnp.sum(jnp.square(xf), axis=(1, 2, 3)))
        a1, b1 = affine("norm1", in_stats, c_in)

        w1, c1b = conv1(x, pack=r, return_weights=True)
        h = packed_conv3x3_stats(
            x.astype(self.dtype), w1, c1b, r,
            prologue=(a1, b1, self.activation),
            with_stats=instance, act=None)
        h_stats = None
        if instance:
            h, h_stats = h
        a2, b2 = affine("norm2", h_stats, h.shape[-1] // (r * r))

        wh, bh = conv2(h, pack_in=r, return_weights=True)
        wx, bx = bypass(x, pack_in=r, return_weights=True)
        res = packed_convt_pair(
            [(h, wh, bh, (a2, b2, self.activation)),
             (x.astype(self.dtype), wx, bx)],
            r, act=fuse_act, with_stats=want_stats)
        if want_stats:
            return res
        return res, None


class Output(nn.Module):
    """Output head (base_function.py:367-398): [norm] act, reflection pad,
    conv (valid), tanh."""

    output_nc: int
    kernel_size: int = 3
    norm: str = "none"
    activation: str = "LeakyReLU"
    use_spect: bool = False
    use_coord: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True,
        pack_in: int = 1, fuse_pool: bool = False,
        pre_activated: bool = False, half_in: bool = False,
    ) -> jax.Array:
        """pack_in > 1: the input arrives space-to-depth packed; the head then
        runs entirely on the packed layout (the reference decodes 512²-1024²
        maps here, network.py:269-272) with an exact reflection-pad border
        correction. fuse_pool additionally folds the caller's integer-factor
        adaptive avg-pool (modules/model.py:79) into a channel-group mean so
        the full-resolution image is never materialized. pre_activated: the
        producer already applied this head's leading activation (fused into
        the decoder block's epilogue) — requires norm == 'none'."""
        act = Activation(self.activation, name="act")
        if pre_activated:
            assert self.norm == "none"
            act = lambda v: v  # noqa: E731 — act already applied upstream
        conv = CoordConvWrap(
            features=self.output_nc,
            kernel_size=self.kernel_size,
            padding=0,
            use_spect=self.use_spect,
            use_coord=self.use_coord,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="conv1",
        )
        streams = None
        if isinstance(x, (tuple, list)):
            # the decoder handed its (h, bypass) pre-add pair: the whole
            # act(h + s) -> conv -> tanh -> pool tail runs as ONE Pallas pass
            # (the full-size act(h+s) is the decoder tail's biggest remaining
            # elementwise round-trip, ~5.8 ms at the flagship bs16)
            from face_mask_inpaint_tpu.ops.pallas.packed_convt import (
                use_packed_output_kernel)

            assert pack_in > 1 and self.norm == "none" and not pre_activated
            kern_ok = (
                fuse_pool and self.kernel_size == 3 and not self.use_coord
                and self.activation in ("LeakyReLU", "ReLU")
                and use_packed_output_kernel(train))
            if kern_ok:
                streams = [s for s in x]
            else:
                from face_mask_inpaint_tpu.nn.layers import get_activation

                x = get_activation(self.activation)(x[0] + x[1])
                act = lambda v: v  # noqa: E731 — applied just above

        if streams is not None:
            from face_mask_inpaint_tpu.ops.pallas.packed_convt import (
                packed_output_head)

            w_eff, b_eff = conv(streams[0], pack=pack_in, return_weights=True)
            pooled, edges = packed_output_head(
                [s.astype(self.dtype) for s in streams], w_eff, b_eff,
                pack_in, act=self.activation)
            return self._ring_correct(
                pooled, edges, streams, conv, pack_in)

        if half_in and pack_in > 1:
            # r-capped tail: x arrives HALF-packed ([N, 2Hp, 2Wp, (r/2)²c],
            # r/2 on the doubled grid) from ResBlockDecoder(half_output).
            # The conv consumes it via the stride-2 4x4-window form
            # (packed_conv3x3_half_in) and emits the usual r-packed output,
            # so the ring correction / tanh / pool tail below is shared.
            if (self.norm == "none" and self.activation != "PReLU"
                    and not self.use_coord and self.kernel_size == 3
                    and pack_in == 4):  # rh == 2: the only half form the
                # decoder emits (convTs at r_in=1 always land 2-packed on
                # the doubled grid), and the ring strips need 2 rows/cell
                return self._half_in_tail(x, conv, act, pack_in, fuse_pool)
            from face_mask_inpaint_tpu.ops.packed import depth_to_space

            x = depth_to_space(x, 2)  # half form is ALWAYS 2-packed
            pack_in = 1

        if pack_in > 1 and (
            self.norm != "none" or self.activation == "PReLU"
            or self.use_coord or self.kernel_size != 3
        ):
            from face_mask_inpaint_tpu.ops.packed import depth_to_space

            x = depth_to_space(x, pack_in)
            pack_in = 1

        if pack_in == 1:
            norm1 = make_norm(self.norm, "norm1", train)
            h = x
            if norm1 is not None:
                h = norm1(h)
            h = act(h)
            h = reflection_pad2d(h, self.kernel_size // 2)
            return jnp.tanh(conv(h))

        from face_mask_inpaint_tpu.ops.packed import (
            depth_to_space, packed_block_mean)

        r = pack_in
        n, hp, wp, _ = x.shape
        co = self.output_nc
        h = act(x)
        y = conv(h, pack=r)  # 'same' zero-pad conv on the packed grid

        # Exact reflection-pad border: recompute the outermost output ring
        # from thin strips at original resolution (reflect maps row -1 -> 1,
        # row H -> H-2; same for columns).
        def row_strip(block_row, offsets):
            strip = depth_to_space(h[:, block_row:block_row + 1], r)  # [N,r,W,C]
            t = strip[:, offsets]
            t = jnp.pad(t, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
            return conv(t)[:, 0]  # VALID k3 -> [N, W, co]

        def col_strip(block_col, offsets):
            strip = depth_to_space(h[:, :, block_col:block_col + 1], r)  # [N,H,r,C]
            t = strip[:, :, offsets]
            t = jnp.pad(t, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
            return conv(t)[:, :, 0]  # [N, H, co]

        top = row_strip(0, [1, 0, 1]).reshape(n, wp, r, co)
        bot = row_strip(hp - 1, [r - 2, r - 1, r - 2]).reshape(n, wp, r, co)
        left = col_strip(0, [1, 0, 1]).reshape(n, hp, r, co)
        right = col_strip(wp - 1, [r - 2, r - 1, r - 2]).reshape(n, hp, r, co)

        yv = y.reshape(n, hp, wp, r, r, co)
        yv = yv.at[:, 0, :, 0, :, :].set(top)
        yv = yv.at[:, -1, :, r - 1, :, :].set(bot)
        yv = yv.at[:, :, 0, :, 0, :].set(left)
        yv = yv.at[:, :, -1, :, r - 1, :].set(right)
        y = jnp.tanh(yv.reshape(n, hp, wp, r * r * co))

        if fuse_pool:
            return packed_block_mean(y, r)
        return depth_to_space(y, r)

    def _half_in_tail(self, x, conv, act, r, fuse_pool):
        """Output tail on a HALF-packed input (r/2 on the doubled grid):
        act -> stride-2 half-in conv to the r-packed map -> exact
        reflection ring from thin unpacked strips -> tanh -> pool/unpack.
        Identical math to the r-packed dense path; only the conv
        formulation (and strip extraction) differ."""
        from face_mask_inpaint_tpu.ops.packed import (
            depth_to_space, packed_block_mean, packed_conv3x3_half_in)

        rh = r // 2
        n, hp2, wp2, _ = x.shape
        hp, wp = hp2 // 2, wp2 // 2
        co = self.output_nc
        h = act(x)
        w_eff, b_eff = conv(h, pack=rh, return_weights=True)
        y = packed_conv3x3_half_in(h, w_eff, b_eff, r)  # [N, hp, wp, r²co]

        # reflection border: recompute the outermost output ring from thin
        # strips at original resolution (reflect maps row -1 -> 1, H -> H-2);
        # the needed rows {0, 1} / {H-2, H-1} live in one half-cell.
        def row_strip(half_row, offsets):
            strip = depth_to_space(h[:, half_row:half_row + 1], rh)
            t = strip[:, offsets]
            t = jnp.pad(t, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
            return conv(t)[:, 0]

        def col_strip(half_col, offsets):
            strip = depth_to_space(h[:, :, half_col:half_col + 1], rh)
            t = strip[:, :, offsets]
            t = jnp.pad(t, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
            return conv(t)[:, :, 0]

        top = row_strip(0, [1, 0, 1]).reshape(n, wp, r, co)
        bot = row_strip(hp2 - 1, [rh - 2, rh - 1, rh - 2]).reshape(n, wp, r, co)
        left = col_strip(0, [1, 0, 1]).reshape(n, hp, r, co)
        right = col_strip(wp2 - 1, [rh - 2, rh - 1, rh - 2]).reshape(n, hp, r, co)

        yv = y.reshape(n, hp, wp, r, r, co)
        yv = yv.at[:, 0, :, 0, :, :].set(top)
        yv = yv.at[:, -1, :, r - 1, :, :].set(bot)
        yv = yv.at[:, :, 0, :, 0, :].set(left)
        yv = yv.at[:, :, -1, :, r - 1, :].set(right)
        y = jnp.tanh(yv.reshape(n, hp, wp, r * r * co))

        if fuse_pool:
            return packed_block_mean(y, r)
        return depth_to_space(y, r)

    def _ring_correct(self, pooled, edges, streams, conv, r):
        """Rebuild the reflection-pad border on the POOLED ring: the fused
        kernel's zero-pad conv is exact everywhere except the outermost
        full-resolution pixel ring (base_function.py:378 pads by reflection).
        Recompute that ring from thin strips (same math as the dense packed
        path above) and re-pool the edge blocks from the kernel's pre-tanh
        edge outputs."""
        from face_mask_inpaint_tpu.nn.layers import get_activation
        from face_mask_inpaint_tpu.ops.packed import depth_to_space

        act_fn = get_activation(self.activation)
        n, hp, wp, _ = streams[0].shape
        co = self.output_nc
        top_e, bot_e, left_e, right_e = edges

        def thin(sl):
            v = streams[0][sl]
            for s in streams[1:]:
                v = v + s[sl]
            return act_fn(v)

        def row_strip(block_row, offsets):
            strip = depth_to_space(
                thin(np.s_[:, block_row:block_row + 1]), r)  # [N, r, W, C]
            t = strip[:, offsets]
            t = jnp.pad(t, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
            return conv(t)[:, 0]  # [N, W, co]

        def col_strip(block_col, offsets):
            strip = depth_to_space(
                thin(np.s_[:, :, block_col:block_col + 1]), r)  # [N, H, r, C]
            t = strip[:, :, offsets]
            t = jnp.pad(t, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
            return conv(t)[:, :, 0]  # [N, H, co]

        f32 = jnp.float32
        top = row_strip(0, [1, 0, 1]).reshape(n, wp, r, co).astype(f32)
        bot = row_strip(hp - 1, [r - 2, r - 1, r - 2]).reshape(
            n, wp, r, co).astype(f32)
        left = col_strip(0, [1, 0, 1]).reshape(n, hp, r, co).astype(f32)
        right = col_strip(wp - 1, [r - 2, r - 1, r - 2]).reshape(
            n, hp, r, co).astype(f32)

        def view(e, length):
            return e.reshape(n, length, r, r, co).astype(f32)

        # scatter order matches the dense path (top, bot, then left/right win
        # the corners); corner BLOCKS are finally written from yl/yr, which
        # carry both their own and the top/bot corrections
        yt = view(top_e, wp).at[:, :, 0].set(top)
        yb = view(bot_e, wp).at[:, :, r - 1].set(bot)
        yl = view(left_e, hp)
        yl = yl.at[:, 0, 0].set(top[:, 0])
        yl = yl.at[:, -1, r - 1].set(bot[:, 0])
        yl = yl.at[:, :, :, 0].set(left)
        yr = view(right_e, hp)
        yr = yr.at[:, 0, 0].set(top[:, -1])
        yr = yr.at[:, -1, r - 1].set(bot[:, -1])
        yr = yr.at[:, :, :, r - 1].set(right)

        def pool(v):
            return jnp.mean(jnp.tanh(v), axis=(2, 3)).astype(pooled.dtype)

        pooled = pooled.at[:, 0].set(pool(yt))
        pooled = pooled.at[:, -1].set(pool(yb))
        pooled = pooled.at[:, :, 0].set(pool(yl))
        pooled = pooled.at[:, :, -1].set(pool(yr))
        return pooled


class AutoAttention(nn.Module):
    """Short+long-term self-attention (Auto_Attn, base_function.py:401-448).

    Query and key share the same 1x1 projection. The [N, HW, HW] map is
    materialized as one MXU matmul for small feature maps and computed with
    the streaming-softmax formulation above ``block_threshold`` tokens
    (ops/attention.py) — numerically identical, O(HW * block) memory.

    Torch note: the code right-multiplies by attention^T for both the short
    branch (:436) and the long branch (:443) — with query == key the map is
    symmetric in construction only pre-softmax, so we reproduce the exact
    semantics out[i] = sum_j softmax_j(q_i . q_j) v[j], which is what
    bmm(value, att^T) computes.
    """

    norm: str = "none"
    block_threshold: int = 4096
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        pre: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        train: bool = True,
    ):
        from face_mask_inpaint_tpu.ops.attention import attention_apply

        n, h, w, c = x.shape
        q = Conv2d(
            c // 4, 1, kernel_init=self.kernel_init, dtype=self.dtype,
            name="query_conv",
        )(x)
        q = q.reshape(n, h * w, c // 4)

        vals = [x.reshape(n, h * w, c)]
        if pre is not None:
            vals.append(pre.reshape(n, h * w, -1))
        outs = attention_apply(q, vals, block_threshold=self.block_threshold)
        att_x = outs[0].reshape(n, h, w, c)

        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        out = gamma.astype(x.dtype) * att_x + x

        if pre is not None:
            alpha = self.param("alpha", nn.initializers.zeros, (1,))
            context_flow = outs[1].reshape(n, h, w, -1)
            context_flow = (
                alpha.astype(x.dtype) * (1.0 - mask) * context_flow + mask * pre
            )
            out = ResBlock(
                output_nc=c,
                hidden_nc=c,
                norm=self.norm,
                use_spect=True,
                kernel_init=self.kernel_init,
                dtype=self.dtype,
                name="model",
            )(jnp.concatenate([out, context_flow], axis=-1), train=train)

        return out, None


class ExampleGuidedAttention(nn.Module):
    """The paper's example-guided cross attention
    (modules/example_guided_att.py:5-41), NHWC.

    A self-similarity map computed from masked-source features re-assembles
    both source and reference features; inside the mask the raw reference
    features pass through. Output is channel-concat [ex_guide_flow, src_att],
    optionally projected by a 1x1 conv.
    """

    out_channels: Optional[int] = None
    block_threshold: int = 4096
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, src_mask: jax.Array, src_feature: jax.Array, ref_feature: jax.Array
    ) -> jax.Array:
        """src_mask: [N, H, W, 1]; src/ref_feature: [N, H, W, C]."""
        from face_mask_inpaint_tpu.ops.attention import attention_apply

        n, h, w, c = src_feature.shape
        q = Conv2d(
            c // 4, 1, use_bias=False, kernel_init=self.kernel_init,
            dtype=self.dtype, name="conv",
        )(src_feature)
        q = q.reshape(n, h * w, c // 4)
        # one shared map, two value streams (src + ref) in a single pass
        src_att, ref_att = attention_apply(
            q,
            [src_feature.reshape(n, h * w, c), ref_feature.reshape(n, h * w, c)],
            block_threshold=self.block_threshold,
        )
        src_att = src_att.reshape(n, h, w, c)
        ref_att = ref_att.reshape(n, h, w, c)

        ex_guide_flow = (1.0 - src_mask) * ref_att + src_mask * ref_feature
        out = jnp.concatenate([ex_guide_flow, src_att], axis=-1)

        if self.out_channels is not None:
            out = Conv2d(
                self.out_channels, 1, kernel_init=self.kernel_init,
                dtype=self.dtype, name="out_conv",
            )(out)
        return out
