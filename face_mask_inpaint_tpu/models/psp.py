"""pSp — the Stack B composite (encoder -> StyleGAN2), TPU-native.

Rebuild of reference modules/psp/psp.py:21-130: a GradualStyleEncoder (or one
of the two last-layer backbone encoders) produces n_styles w vectors,
optionally offset by the average latent; the StyleGAN2 generator decodes with
optional latent-mask style mixing; the output is adaptive-avg-pooled to 256.

n_styles = 2*log2(output_size) - 2 (psp.py:27). The decoder-freeze flag
(train_decoder) is enforced by the *training step* via parameter partitioning
(the functional analog of _freeze at psp.py:31-32).

The latent_avg buffer lives in the ``latent_avg`` variable collection so it
checkpoints with the model; it comes from a converted torch ckpt or
Generator.mean_latent.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.models.irse import (
    BackboneEncoderUsingLastLayerIntoW,
    BackboneEncoderUsingLastLayerIntoWPlus,
    GradualStyleEncoder,
)
from face_mask_inpaint_tpu.models.stylegan2 import Generator
from face_mask_inpaint_tpu.ops.resize import adaptive_avg_pool2d

Dtype = Any

__all__ = ["PSP"]


class PSP(nn.Module):
    encoder_type: str = "GradualStyleEncoder"
    output_size: int = 1024
    start_from_latent_avg: bool = False
    learn_in_w: bool = False
    use_attention: bool = False
    # Reference always uses 50 (psp_encoders.py); 4 is the TPU-rebuild tiny
    # CI/dryrun spec (see irse.get_blocks).
    num_layers: int = 50
    # TPU-rebuild CI/dryrun knob: proportional StyleGAN2 width (see
    # stylegan2.channels_for). Reference decoder is always 512-base.
    decoder_base_channels: int = 512
    dtype: Dtype = jnp.float32

    @property
    def n_styles(self) -> int:
        import math

        return int(math.log2(self.output_size)) * 2 - 2

    def setup(self):
        if self.encoder_type == "GradualStyleEncoder":
            self.encoder = GradualStyleEncoder(
                self.num_layers, "ir_se", n_styles=self.n_styles,
                use_attention=self.use_attention, dtype=self.dtype,
            )
        elif self.encoder_type == "BackboneEncoderUsingLastLayerIntoW":
            self.encoder = BackboneEncoderUsingLastLayerIntoW(
                self.num_layers, "ir_se", dtype=self.dtype)
        elif self.encoder_type == "BackboneEncoderUsingLastLayerIntoWPlus":
            self.encoder = BackboneEncoderUsingLastLayerIntoWPlus(
                self.num_layers, "ir_se", n_styles=self.n_styles, dtype=self.dtype
            )
        else:
            raise ValueError(f"{self.encoder_type} is not a valid encoders")
        self.decoder = Generator(self.output_size, 512, 8,
                                 base_channels=self.decoder_base_channels,
                                 dtype=self.dtype)
        # average face latent (psp.py:124-130); zeros until loaded/computed.
        rep = 1 if self.learn_in_w else self.n_styles
        self.latent_avg = self.variable(
            "latent_avg", "value", lambda: jnp.zeros((rep, 512), jnp.float32)
        )

    def __call__(
        self,
        x: jax.Array,
        ref: Optional[jax.Array] = None,
        src_mask: Optional[jax.Array] = None,
        resize: bool = True,
        latent_mask: Optional[Sequence[int]] = None,
        input_code: bool = False,
        randomize_noise: bool = True,
        inject_latent: Optional[jax.Array] = None,
        return_latents: bool = False,
        alpha: Optional[float] = None,
        train: bool = True,
    ):
        if self.is_initializing():
            # pSp always feeds w-latents (input_is_latent=True), so the
            # decoder's style MLP would never materialize its params during
            # init — but mean_latent / non-latent inputs need it. Touch it.
            self.decoder.map_style(jnp.zeros((1, 512), self.dtype))

        if input_code:
            codes = x
        else:
            codes = self.encoder(x, ref=ref, mask=src_mask, train=train)
            if self.start_from_latent_avg:
                avg = self.latent_avg.value.astype(codes.dtype)
                if self.learn_in_w:
                    codes = codes + avg[0][None, :]
                else:
                    codes = codes + avg[None, :, :]

        if latent_mask is not None:
            for i in latent_mask:
                if inject_latent is not None:
                    if alpha is not None:
                        mixed = alpha * inject_latent[:, i] + (1 - alpha) * codes[:, i]
                    else:
                        mixed = inject_latent[:, i]
                else:
                    mixed = jnp.zeros_like(codes[:, i])
                codes = codes.at[:, i].set(mixed)

        input_is_latent = not input_code
        images, result_latent = self.decoder(
            [codes],
            input_is_latent=input_is_latent,
            randomize_noise=randomize_noise,
            return_latents=return_latents,
        )
        if resize:
            images = adaptive_avg_pool2d(images, (256, 256))
        if return_latents:
            return images, result_latent
        return images

    def encode(
        self,
        x: jax.Array,
        ref: Optional[jax.Array] = None,
        src_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        """Encoder half only: image(s) -> [N, n_styles, 512] w+ codes
        (+ latent_avg offset). Lets serving/benchmarks jit the encoder and
        decoder as two programs — the single fused graph exceeds some
        remote-compile budgets (ROUND1_NOTES item 6)."""
        codes = self.encoder(x, ref=ref, mask=src_mask, train=train)
        return self._add_latent_avg(codes)

    def _add_latent_avg(self, codes: jax.Array) -> jax.Array:
        if self.start_from_latent_avg:
            avg = self.latent_avg.value.astype(codes.dtype)
            if self.learn_in_w:
                codes = codes + avg[0][None, :]
            else:
                codes = codes + avg[None, :, :]
        return codes

    def encode_taps(self, x: jax.Array, train: bool = False):
        """One backbone pass -> pyramid taps (GradualStyleEncoder only).
        Serving/benchmarks jit this once and call it for src AND ref — the
        fused two-backbone encode graph stalls the remote AOT compiler."""
        return self.encoder.backbone_taps(x, train=train)

    def encode_from_taps(self, src_taps, ref_taps=None,
                         src_mask=None, train: bool = False) -> jax.Array:
        """Fusion + FPN + style heads + latent_avg offset -> w+ codes."""
        codes = self.encoder.fuse_styles(
            src_taps, ref_taps, src_mask, train=train)
        return self._add_latent_avg(codes)

    def encode_pyramid(self, src_taps, ref_taps=None, src_mask=None,
                       train: bool = False):
        """Fusion + FPN -> (c3, p2, p1); finest-grained split for the
        remote AOT compiler, which blows up super-linearly on the combined
        encode_from_taps graph (its pieces compile in seconds)."""
        return self.encoder.fuse_pyramid(
            src_taps, ref_taps, src_mask, train=train)

    def encode_styles_level(self, level: int, x: jax.Array) -> jax.Array:
        """One style-head level over its pyramid input -> [N, G, 512]."""
        return self.encoder.styles_level(level, x)

    def finalize_codes(self, coarse, middle, fine) -> jax.Array:
        """Concat the level outputs + latent_avg offset -> w+ codes."""
        return self._add_latent_avg(
            jnp.concatenate([coarse, middle, fine], axis=1))

    def decode(
        self,
        codes: jax.Array,
        resize: bool = True,
        randomize_noise: bool = True,
    ) -> jax.Array:
        """Decoder half: w+ codes -> image (adaptive-pooled to 256 when
        resize, psp.py:113-114)."""
        images, _ = self.decoder(
            [codes], input_is_latent=True, randomize_noise=randomize_noise,
            return_latents=False,
        )
        if resize:
            images = adaptive_avg_pool2d(images, (256, 256))
        return images

    def compute_latent_avg(self, rng: jax.Array, n_latent: int = 100_000):
        """decoder.mean_latent (train_psp.py:133-134); returns [1 or n_styles, 512]."""
        avg = self.decoder.mean_latent(rng, n_latent)  # [1, 512]
        rep = 1 if self.learn_in_w else self.n_styles
        return jnp.repeat(avg, rep, axis=0)
