"""PICNet-style pluralistic networks (Stack A sub-networks).

TPU-native rebuild of reference modules/pluralistic_model/network.py:
ResEncoder (prior/posterior paths), ResGenerator (latent-z + upsampling
decoder with optional short/long self-attention), ResDiscriminator and
PatchDiscriminator, plus the define_e/define_g/define_d factory surface.

Functional deltas from torch:
- input channel counts are inferred from the data (flax lazy shapes), which
  also resolves the reference's flag inconsistencies (e.g. use_att=1 needs
  decoder img_f = 2 * encoder img_f; see scripts/train_on_hq.sh).
- the posterior/prior reparameterized sample (network.py:275-307 get_z) takes
  an explicit PRNG key instead of torch's global RNG.

Layout: NHWC.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.nn.blocks import (
    AutoAttention,
    CoordConvWrap,
    Output,
    ResBlock,
    ResBlockDecoder,
    ResBlockEncoderOptimized,
)
from face_mask_inpaint_tpu.nn.layers import Activation, get_initializer

Dtype = Any

__all__ = [
    "ResEncoder",
    "ResGenerator",
    "ResDiscriminator",
    "PatchDiscriminator",
    "define_e",
    "define_g",
    "define_d",
]


class ResEncoder(nn.Module):
    """ResNet encoder (network.py:76-178).

    Returns ((mu, std), features); std passes through softplus. encoder_type
    'src' routes through L infer_prior blocks + prior head; 'ref' through a
    single posterior head.
    """

    ngf: int = 64
    z_nc: int = 512
    img_f: int = 512
    L: int = 6
    layers: int = 5
    norm: str = "none"
    activation: str = "ReLU"
    use_spect: bool = True
    use_coord: bool = False
    encoder_type: str = "src"
    kernel_init: Callable = get_initializer("orthogonal")
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, train: bool = True):
        kw = dict(
            norm=self.norm,
            activation=self.activation,
            use_spect=self.use_spect,
            use_coord=self.use_coord,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
        )
        out = ResBlockEncoderOptimized(
            self.ngf,
            norm=self.norm,
            activation=self.activation,
            use_spect=self.use_spect,
            use_coord=self.use_coord,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="block0",
        )(img, train=train)

        mult = 1
        for i in range(self.layers - 1):
            mult_prev = mult
            mult = min(2 ** (i + 1), self.img_f // self.ngf)
            out = ResBlock(
                output_nc=self.ngf * mult,
                hidden_nc=self.ngf * mult_prev,
                sample_type="none" if i % 2 == 0 else "down",
                name=f"encoder{i}",
                **kw,
            )(out, train=train)

        if self.encoder_type == "src":
            h = out
            for i in range(self.L):
                h = ResBlock(
                    output_nc=self.ngf * mult,
                    hidden_nc=self.ngf * mult,
                    sample_type="none",
                    name=f"infer_prior{i}",
                    **kw,
                )(h, train=train)
            o = ResBlock(
                output_nc=2 * self.z_nc,
                hidden_nc=self.ngf * mult,
                sample_type="none",
                name="prior",
                **kw,
            )(h, train=train)
        elif self.encoder_type == "ref":
            o = ResBlock(
                output_nc=2 * self.z_nc,
                hidden_nc=self.ngf * mult,
                sample_type="none",
                name="posterior",
                **kw,
            )(out, train=train)
        else:
            raise NotImplementedError(f"encoder_type [{self.encoder_type}]")

        mu, std = jnp.split(o, 2, axis=-1)
        return (mu, jax.nn.softplus(std)), out


def sample_z(
    src_distribution,
    ref_distribution,
    rng: jax.Array,
    return_zq: bool = False,
) -> jax.Array:
    """Reparameterized sample matching ResGenerator.get_z (network.py:275-307).

    z = concat([z_q ~ N(src), z_p ~ N(ref)]) on the channel axis.
    """
    q_mu, q_sigma = src_distribution
    p_mu, p_sigma = ref_distribution
    rng_q, rng_p = jax.random.split(rng)
    z_q = q_mu + q_sigma * jax.random.normal(rng_q, q_mu.shape, q_mu.dtype)
    if return_zq:
        return z_q
    z_p = p_mu + p_sigma * jax.random.normal(rng_p, p_mu.shape, p_mu.dtype)
    return jnp.concatenate([z_q, z_p], axis=-1)


class ResGenerator(nn.Module):
    """ResNet generator (network.py:181-273).

    z (optional) feeds a ResBlock chain added to the fused encoder features;
    `layers` ResBlockDecoder blocks upsample x2 each; optional short-term
    self-attention after decoder1; tanh Output head(s) on the last layer.
    """

    output_nc: int = 3
    ngf: int = 64
    z_nc: int = 512
    img_f: int = 512
    L: int = 1
    layers: int = 5
    norm: str = "instance"
    activation: str = "ReLU"
    use_spect: bool = True
    use_coord: bool = False
    use_attn: bool = True
    kernel_init: Callable = get_initializer("orthogonal")
    dtype: Dtype = jnp.float32
    # Decoder stages whose output resolution exceeds this run space-to-depth
    # packed (ops/packed.py): identical math, MXU/lane-friendly layouts. The
    # reference flagship decodes to 1024² with 32 channels (network.py:269)
    # where plain NHWC execution is layout-bound on TPU.
    pack_threshold: int = 256

    @nn.compact
    def __call__(
        self,
        encoded: jax.Array,
        z: Optional[jax.Array] = None,
        f_e: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        train: bool = True,
        fuse_pool: Optional[int] = None,
    ) -> jax.Array:
        """fuse_pool: when it equals the tail's final packing factor, the
        Output head folds the caller's integer-factor adaptive avg-pool into
        the packed form and returns the pooled image directly."""
        kw = dict(
            activation=self.activation,
            use_spect=self.use_spect,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
        )
        mult = min(2 ** (self.layers - 1), self.img_f // self.ngf)
        ch = int(self.ngf * mult)

        if z is not None:
            # "latent z to feature" blocks use norm=None (network.py:216-222).
            f = ResBlock(
                output_nc=ch, hidden_nc=ch, norm="none",
                use_coord=self.use_coord, name="generator", **kw,
            )(z, train=train)
            for i in range(self.L):
                f = ResBlock(
                    output_nc=ch, hidden_nc=ch, norm="none",
                    use_coord=self.use_coord, name=f"generator{i}", **kw,
                )(f, train=train)
            out = encoded + f
        else:
            out = encoded

        # packing is legal for the norms/acts the packed ops support and
        # only useful when spatial dims stay block-aligned
        packable = (
            self.norm in ("instance", "none")
            and self.activation != "PReLU"
            and not self.use_coord
        )
        output = None
        r = 1  # current space-to-depth factor of `out`
        stats = None  # per-(sample, channel) (Σ, Σ²) of `out` from a fused
        # decoder kernel epilogue — feeds the next block's norm1 prologue
        for i in range(self.layers):
            mult = min(2 ** (self.layers - i - 1), self.img_f // self.ngf)
            ch = int(self.ngf * mult)
            h_next = out.shape[1] * r * 2
            w_next = out.shape[2] * r * 2
            pack_out = r > 1 or (
                packable and min(h_next, w_next) > self.pack_threshold
            )
            # The Output head on the last layer leads with an activation
            # (base_function.py:378) — fuse it into the decoder block's
            # epilogue so the full-resolution tensor is written pre-activated
            # exactly once (skipped ahead of the i==1 AutoAttention, which
            # needs the raw map).
            fuse_act = (
                self.activation
                if (i == self.layers - 1 and not (i == 1 and self.use_attn)
                    and self.activation in ("LeakyReLU", "ReLU"))
                else None
            )
            want_stats = (pack_out and i < self.layers - 1
                          and self.norm == "instance")
            # last layer: hand the Output head the decoder's (h, bypass)
            # pre-add pair so the packed Output-head kernel fuses
            # act(h + s) -> conv -> tanh -> pool into one pass (the stencil
            # path, when enabled, keeps its own fused epilogue instead)
            from face_mask_inpaint_tpu.ops.pallas.packed_convt import (
                use_packed_output_kernel)

            pair_req = (
                i == self.layers - 1 and pack_out
                and fuse_act in ("LeakyReLU", "ReLU")
                and fuse_pool == 2 * r and not self.use_coord
                and use_packed_output_kernel(train))
            # r-capped ("half") emission on the last block: convTs run at
            # r_in=1 so executed FLOPs stop paying the r² packing inflation;
            # the Output head consumes the 2-packed-on-doubled-grid form
            # directly (ops/packed.py:use_half_tail for the full story).
            from face_mask_inpaint_tpu.ops.packed import use_half_tail

            half_req = (
                i == self.layers - 1 and pack_out and r == 2
                and not pair_req and self.activation != "PReLU"
                and not self.use_coord and use_half_tail())
            res = ResBlockDecoder(
                output_nc=ch, hidden_nc=ch, norm=self.norm,
                name=f"decoder{i}", **kw,
            )(out, train=train, pack_in=r, pack_output=pack_out,
              fuse_act=fuse_act, in_stats=stats, want_stats=want_stats,
              return_pair=pair_req, half_output=half_req)
            out, stats = res if want_stats else (res, None)
            if pack_out:
                r *= 2
            if i == 1 and self.use_attn:
                stats = None  # attention rewrites `out`; stats are stale
                if r > 1:  # attention needs the full-resolution map
                    from face_mask_inpaint_tpu.ops.packed import depth_to_space

                    out = depth_to_space(out, r)
                    r = 1
                out, _ = AutoAttention(
                    norm=self.norm, kernel_init=self.kernel_init,
                    dtype=self.dtype, name=f"attn{i}",
                )(out, f_e, mask, train=train)
            if i > self.layers - 2:
                output = Output(
                    output_nc=self.output_nc, kernel_size=3, norm="none",
                    activation=self.activation, use_spect=self.use_spect,
                    use_coord=self.use_coord, kernel_init=self.kernel_init,
                    dtype=self.dtype, name=f"out{i}",
                )(out, train=train, pack_in=r,
                  fuse_pool=fuse_pool == r and r > 1,
                  pre_activated=(fuse_act is not None and i == self.layers - 1
                                 and not isinstance(out, tuple)),
                  half_in=half_req)
                if i < self.layers - 1:
                    # the reference also concatenates after the LAST layer
                    # (network.py:272) where the result is never consumed —
                    # skipping saves a full-resolution concat + copy.
                    out = jnp.concatenate([out, output], axis=-1)
        return output


class ResDiscriminator(nn.Module):
    """ResNet discriminator (network.py:310-370): stem + downsampling blocks
    with self-attention at i==2, final spectral-norm 3x3 valid conv."""

    ndf: int = 64
    img_f: int = 512
    layers: int = 6
    norm: str = "none"
    activation: str = "LeakyReLU"
    use_spect: bool = True
    use_coord: bool = False
    use_attn: bool = True
    kernel_init: Callable = get_initializer("orthogonal")
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        kw = dict(
            norm=self.norm,
            activation=self.activation,
            use_spect=self.use_spect,
            use_coord=self.use_coord,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
        )
        out = ResBlockEncoderOptimized(self.ndf, name="block0", **kw)(x, train=train)
        mult = 1
        for i in range(self.layers - 1):
            mult_prev = mult
            mult = min(2 ** (i + 1), self.img_f // self.ndf)
            if i == 2 and self.use_attn:
                out, _ = AutoAttention(
                    norm=self.norm, kernel_init=self.kernel_init,
                    dtype=self.dtype, name=f"attn{i}",
                )(out, train=train)
            out = ResBlock(
                output_nc=self.ndf * mult,
                hidden_nc=self.ndf * mult_prev,
                sample_type="down",
                name=f"encoder{i}",
                **kw,
            )(out, train=train)
        out = ResBlock(
            output_nc=self.ndf * mult,
            hidden_nc=self.ndf * mult,
            sample_type="none",
            name="block1",
            **kw,
        )(out, train=train)
        out = Activation(self.activation, name="act")(out)
        from face_mask_inpaint_tpu.nn.layers import Conv2d

        return Conv2d(
            1, 3, padding=0, use_spect=True, kernel_init=self.kernel_init,
            dtype=self.dtype, name="conv",
        )(out)


class PatchDiscriminator(nn.Module):
    """70x70 PatchGAN discriminator (network.py:373-430)."""

    ndf: int = 64
    img_f: int = 512
    layers: int = 3
    norm: str = "batch"
    activation: str = "LeakyReLU"
    use_spect: bool = True
    use_coord: bool = False
    use_attn: bool = False
    kernel_init: Callable = get_initializer("orthogonal")
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        act = Activation(self.activation, name="act")

        def cc(feats, stride, name):
            return CoordConvWrap(
                features=feats, kernel_size=4, stride=stride, padding=1,
                use_bias=False, use_spect=self.use_spect, use_coord=self.use_coord,
                kernel_init=self.kernel_init, dtype=self.dtype, name=name,
            )

        out = act(cc(self.ndf, 2, "conv0")(x))
        mult = 1
        for i in range(1, self.layers):
            mult = min(2**i, self.img_f // self.ndf)
            out = act(cc(self.ndf * mult, 2, f"conv{i}")(out))
        out = act(cc(self.ndf * mult, 1, "conv_pre")(out))
        return cc(1, 1, "conv_out")(out)


# ---------------------------------------------------------------------------
# Factory surface (network.py:10-70). init_type feeds the weight initializer
# (init_net/init_weights applied orthogonal(gain=.02) by default).
# ---------------------------------------------------------------------------

def define_e(
    encoder_type: str = "src",
    input_nc: int = 3,
    ngf: int = 64,
    z_nc: int = 512,
    img_f: int = 512,
    L: int = 6,
    layers: int = 5,
    norm: str = "none",
    activation: str = "ReLU",
    use_spect: bool = True,
    use_coord: bool = False,
    init_type: str = "orthogonal",
    dtype: Dtype = jnp.float32,
    **_unused,
) -> ResEncoder:
    del input_nc  # inferred from data
    return ResEncoder(
        ngf=ngf, z_nc=z_nc, img_f=img_f, L=L, layers=layers, norm=norm,
        activation=activation, use_spect=use_spect, use_coord=use_coord,
        encoder_type=encoder_type, kernel_init=get_initializer(init_type),
        dtype=dtype,
    )


def define_g(
    output_nc: int = 3,
    ngf: int = 64,
    z_nc: int = 512,
    img_f: int = 512,
    L: int = 1,
    layers: int = 5,
    norm: str = "instance",
    activation: str = "ReLU",
    use_spect: bool = True,
    use_coord: bool = False,
    use_attn: bool = True,
    init_type: str = "orthogonal",
    dtype: Dtype = jnp.float32,
    pack_threshold: int = 256,
    **_unused,
) -> ResGenerator:
    return ResGenerator(
        output_nc=output_nc, ngf=ngf, z_nc=z_nc, img_f=img_f, L=L, layers=layers,
        norm=norm, activation=activation, use_spect=use_spect, use_coord=use_coord,
        use_attn=use_attn, kernel_init=get_initializer(init_type), dtype=dtype,
        pack_threshold=pack_threshold,
    )


def define_d(
    input_nc: int = 3,
    ndf: int = 64,
    img_f: int = 512,
    layers: int = 6,
    norm: str = "none",
    activation: str = "LeakyReLU",
    use_spect: bool = True,
    use_coord: bool = False,
    use_attn: bool = True,
    model_type: str = "ResDis",
    init_type: str = "orthogonal",
    dtype: Dtype = jnp.float32,
    **_unused,
):
    del input_nc
    kernel_init = get_initializer(init_type)
    if model_type == "ResDis":
        return ResDiscriminator(
            ndf=ndf, img_f=img_f, layers=layers, norm=norm, activation=activation,
            use_spect=use_spect, use_coord=use_coord, use_attn=use_attn,
            kernel_init=kernel_init, dtype=dtype,
        )
    if model_type == "PatchDis":
        return PatchDiscriminator(
            ndf=ndf, img_f=img_f, layers=layers, norm=norm, activation=activation,
            use_spect=use_spect, use_coord=use_coord, use_attn=use_attn,
            kernel_init=kernel_init, dtype=dtype,
        )
    raise NotImplementedError(f"model_type [{model_type}]")
