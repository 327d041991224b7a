"""Model factories — the TPU-native analog of the reference's torch-hub
packaging (modules/unet/extra/hubconf.py:1-15 exposes `unet_carvana`;
torch.hub itself is torch-specific, so the JAX equivalent is a factory that
returns (module, variables) ready to `module.apply`).

Each factory initializes with a fixed PRNG seed and, when a torch `.pth`
checkpoint path is given, loads the weights through the numeric-parity
converters in tools/convert_torch.py (this container has no network egress —
the reference's download-by-URL becomes load-by-path).

>>> from face_mask_inpaint_tpu import hub
>>> net, variables = hub.unet_carvana()
>>> mask = net.apply(variables, images, method=type(net).predict_mask)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["unet_carvana", "mask_detector", "reference_fill", "psp"]


def unet_carvana(checkpoint: Optional[str] = None, seed: int = 0):
    """The reference hub entry (hubconf.py:5-15): UNet(3, 2, bilinear).

    checkpoint: optional path to the torch `.pth` state dict (the reference
    downloads unet_carvana_scale0.5_epoch1.pth; here it must be local)."""
    from face_mask_inpaint_tpu.models.unet import UNet

    net = UNet(n_classes=2, bilinear=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(seed), x)
    if checkpoint:
        from face_mask_inpaint_tpu.tools.convert_torch import (
            convert_unet, load_torch_state_dict)

        variables = convert_unet(load_torch_state_dict(checkpoint),
                                 bilinear=True)
    return net, variables


def mask_detector(checkpoint: Optional[str] = None, seed: int = 0):
    """MaskDetector (UNet + argmax predict path) ready for predict_mask."""
    from face_mask_inpaint_tpu.models.unet import MaskDetector

    net = MaskDetector()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(seed), x)
    if checkpoint:
        from face_mask_inpaint_tpu.tools.convert_torch import (
            convert_unet, load_torch_state_dict)

        variables = convert_unet(load_torch_state_dict(checkpoint),
                                 bilinear=True)
    return net, variables


def reference_fill(seed: int = 0, out_size: int = 256):
    """Flagship ReferenceFill at the reference CLI defaults (use_att)."""
    from face_mask_inpaint_tpu.models.reference_fill import ReferenceFill

    enc = dict(type="pluralistic", ngf=32, z_nc=128, img_f=128, L=6, layers=5,
               norm="none", activation="LeakyReLU", init_type="orthogonal")
    dec = dict(ngf=32, z_nc=128, img_f=256, L=0, layers=5, norm="instance",
               activation="LeakyReLU", init_type="orthogonal")
    net = ReferenceFill(encoder_params=enc, decoder_params=dec, use_att=True,
                        out_size=(out_size, out_size))
    n, hw = 1, out_size
    variables = jax.jit(
        lambda k, s, r, m: net.init({"params": k, "sample": k}, s, r, m,
                                    train=False)
    )(jax.random.PRNGKey(seed), jnp.zeros((n, hw, hw, 3), jnp.float32),
      jnp.zeros((n, hw, hw, 3), jnp.float32),
      jnp.zeros((n, hw, hw), jnp.float32))
    return net, variables


def psp(checkpoint: Optional[str] = None, seed: int = 0,
        output_size: int = 1024):
    """pSp (GradualStyleEncoder + StyleGAN2) with optional combined-ckpt
    loading via convert_psp."""
    from face_mask_inpaint_tpu.models.psp import PSP

    net = PSP(output_size=output_size, use_attention=True)
    n, hw = 1, 256
    z = jnp.zeros((n, hw, hw, 3), jnp.float32)
    m = jnp.zeros((n, hw, hw, 1), jnp.float32)
    variables = jax.jit(
        lambda k: net.init({"params": k, "noise": k}, z, z, m, train=False)
    )(jax.random.PRNGKey(seed))
    if checkpoint:
        from face_mask_inpaint_tpu.tools.convert_torch import (
            convert_psp, load_torch_state_dict)

        variables = convert_psp(load_torch_state_dict(checkpoint),
                                output_size=output_size)
    return net, variables
