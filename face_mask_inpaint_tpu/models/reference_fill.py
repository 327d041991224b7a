"""ReferenceFill — the Stack A composite generator.

TPU-native rebuild of reference modules/model.py:15-113: two encoders
(pluralistic ResEncoder prior/posterior, or DRN-C-42 with a 1x1 head), fused
by ExampleGuidedAttention or a mask lerp; latent z sampled from both
distributions feeds the ResGenerator; output resized by adaptive avg-pool to
``out_size`` (or bilinear to 218x178 in the no_prior/old_model CelebA path).

Differences from torch, by design:
- the mask is an explicit input ([N, H, W] float; callers run the frozen
  MaskDetector themselves — the reference's internal mode='eval' fallback at
  model.py:86 is dead code that would crash, see SURVEY.md §7).
- the reparameterized sample uses the flax 'sample' PRNG stream.

Layout: NHWC.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.models.drn import drn_c_42
from face_mask_inpaint_tpu.models.picnet import define_e, define_g, sample_z
from face_mask_inpaint_tpu.nn.blocks import ExampleGuidedAttention
from face_mask_inpaint_tpu.nn.layers import Conv2d, get_initializer
from face_mask_inpaint_tpu.ops.resize import adaptive_avg_pool2d, scale_img

Dtype = Any

__all__ = ["ReferenceFill"]


class ReferenceFill(nn.Module):
    """Composite inpainting generator (modules/model.py:15-113).

    encoder_params / decoder_params mirror the reference dicts produced by
    process_params (train_reference_fill.py:88-104); only the keys used by the
    architecture are consumed.
    """

    encoder_params: dict
    decoder_params: dict
    use_att: bool = True
    out_size: tuple[int, int] = (256, 256)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src_image: jax.Array,
        ref_image: jax.Array,
        src_mask: jax.Array,
        resize: bool = True,
        no_prior: bool = False,
        train: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """src/ref_image: [N, H, W, 3]; src_mask: [N, H, W] float in {0,1}."""
        enc_p = dict(self.encoder_params)
        encoder_type = enc_p.pop("type", "pluralistic")
        dec_p = dict(self.decoder_params)

        src_dist = ref_dist = None
        if encoder_type == "drn":
            src_features = drn_c_42(
                head_features=enc_p.get("img_f", 128), dtype=self.dtype
            ).copy(name="src_encoder")(src_image, train=train)
            ref_features = drn_c_42(
                head_features=enc_p.get("img_f", 128), dtype=self.dtype
            ).copy(name="ref_encoder")(ref_image, train=train)
        elif encoder_type == "pluralistic":
            src_dist, src_features = define_e(
                **enc_p, encoder_type="src", dtype=self.dtype
            ).copy(name="src_encoder")(src_image, train=train)
            ref_dist, ref_features = define_e(
                **enc_p, encoder_type="ref", dtype=self.dtype
            ).copy(name="ref_encoder")(ref_image, train=train)
        else:
            raise NotImplementedError(f"encoder_type [{encoder_type}]")

        scaled_mask = scale_img(
            src_mask[..., None].astype(src_features.dtype), src_features.shape[1:3]
        )
        if self.use_att:
            enc_features = ExampleGuidedAttention(
                kernel_init=get_initializer(
                    self.encoder_params.get("init_type", "orthogonal")
                ),
                dtype=self.dtype,
                name="attention",
            )(scaled_mask, src_features, ref_features)
        else:
            enc_features = (1.0 - scaled_mask) * src_features + scaled_mask * ref_features

        decoder = define_g(**dec_p, dtype=self.dtype).copy(name="decoder")
        # When the decode upsamples to an integer multiple of out_size, ask
        # the decoder to fold the adaptive avg-pool into its packed tail
        # (ops/packed.py) — the full-resolution image is never materialized.
        fuse_pool = None
        if resize and not no_prior:
            h_dec = enc_features.shape[1] * 2 ** dec_p.get("layers", 5)
            w_dec = enc_features.shape[2] * 2 ** dec_p.get("layers", 5)
            if (h_dec % self.out_size[0] == 0 and w_dec % self.out_size[1] == 0
                    and h_dec // self.out_size[0] == w_dec // self.out_size[1]):
                fuse_pool = h_dec // self.out_size[0]
        if encoder_type == "drn" or no_prior:
            dec_image = decoder(enc_features, train=train, fuse_pool=fuse_pool)
        else:
            if rng is None:
                rng = self.make_rng("sample")
            z = sample_z(src_dist, ref_dist, rng, return_zq=not self.use_att)
            dec_image = decoder(enc_features, z=z, train=train,
                                fuse_pool=fuse_pool)

        if resize:
            if no_prior:
                dec_image = scale_img(dec_image, (218, 178))
            else:
                # identity when the decoder already emitted the pooled size
                dec_image = adaptive_avg_pool2d(dec_image, self.out_size)
        return dec_image
