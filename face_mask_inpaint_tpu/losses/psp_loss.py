"""Composite pSp training loss.

Rebuild of reference modules/psp/criteria/__init__.py:9-99 (pSpLoss):
lambda-gated sum of ID / masked-L2 / masked-LPIPS vs GT, ref-side LPIPS/L2
inside the mask, W-norm — with the reference's two quirks preserved for
training parity: the style and contextual terms are COMPUTED (logged) but
NEVER ADDED to the loss (criteria/__init__.py:74-76, 88-90).

All pretrained sub-nets (LPIPS trunk+lin, ArcFace, VGG) are passed in as
parameter pytrees; lambdas of 0 skip the corresponding computation entirely
(the reference only constructs those sub-nets when lambda > 0).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.losses.id_loss import id_loss
from face_mask_inpaint_tpu.losses.lpips import lpips
from face_mask_inpaint_tpu.losses.vgg import vgg_loss
from face_mask_inpaint_tpu.losses.w_norm import w_norm_loss

__all__ = ["PSPLossConfig", "psp_loss"]


@dataclass(frozen=True)
class PSPLossConfig:
    """Loss lambdas, mirroring the train_psp.py flag surface (:71-96)."""

    id_lambda: float = 0.0
    lpips_lambda: float = 0.8
    l2_lambda: float = 1.0
    style_lambda: float = 250.0
    lpips_lambda_ref: float = 0.0
    l2_lambda_ref: float = 0.0
    cx_lambda: float = 1.0
    w_norm_lambda: float = 0.0
    start_from_latent_avg: bool = False
    lpips_net: str = "alex"


def psp_loss(
    cfg: PSPLossConfig,
    nets: dict,
    x: jax.Array,
    y: jax.Array,
    y_hat: jax.Array,
    latent: Optional[jax.Array],
    latent_avg: Optional[jax.Array] = None,
    ref: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
):
    """Returns (loss, loss_dict, id_logs).

    nets: {'lpips': params, 'facenet': variables, 'vgg': params} — only the
    entries whose lambdas are active are required.
    """
    loss_dict: dict[str, jax.Array] = {}
    loss = jnp.float32(0.0)
    id_logs = None

    m = mask[..., None].astype(y_hat.dtype) if mask is not None else None

    if cfg.id_lambda > 0:
        loss_id, sim_improvement, id_logs = id_loss(nets["facenet"], y_hat, y, x)
        loss_dict["loss_id"] = loss_id
        loss_dict["id_improve"] = sim_improvement
        loss = loss_id * cfg.id_lambda
    if cfg.l2_lambda > 0:
        if m is not None:
            inv = 1.0 - m
            loss_l2 = jnp.mean((y_hat * inv - y * inv) ** 2)
        else:
            loss_l2 = jnp.mean((y_hat - y) ** 2)
        loss_dict["loss_l2"] = loss_l2
        loss = loss + loss_l2 * cfg.l2_lambda
    if cfg.lpips_lambda > 0:
        if m is not None:
            inv = 1.0 - m
            loss_lp = lpips(nets["lpips"], y_hat * inv, y * inv, cfg.lpips_net)
        else:
            loss_lp = lpips(nets["lpips"], y_hat, y, cfg.lpips_net)
        loss_dict["loss_lpips"] = loss_lp
        loss = loss + loss_lp * cfg.lpips_lambda
    if cfg.style_lambda > 0 and m is not None:
        # computed + logged but NOT added (criteria/__init__.py:74-76)
        style = vgg_loss(nets["vgg"], y_hat * (1.0 - m), x, "style") * cfg.style_lambda
        loss_dict["loss_style"] = style

    if ref is not None:
        if cfg.lpips_lambda_ref > 0:
            loss_lp_ref = lpips(nets["lpips"], y_hat * m, ref * m, cfg.lpips_net)
            loss_dict["loss_lpips_ref"] = loss_lp_ref
            loss = loss + loss_lp_ref * cfg.lpips_lambda_ref
        if cfg.l2_lambda_ref > 0:
            loss_l2_ref = jnp.mean((y_hat * m - ref * m) ** 2)
            loss_dict["loss_l2_ref"] = loss_l2_ref
            loss = loss + loss_l2_ref * cfg.l2_lambda_ref
        if cfg.cx_lambda > 0:
            # computed + logged but NOT added (criteria/__init__.py:88-90)
            cx = vgg_loss(nets["vgg"], y_hat * m, ref * m, "contextual") * cfg.cx_lambda
            loss_dict["loss_context"] = cx

    if cfg.w_norm_lambda > 0 and latent_avg is not None:
        loss_w = w_norm_loss(latent, latent_avg, cfg.start_from_latent_avg)
        loss_dict["loss_w_norm"] = loss_w
        loss = loss + loss_w * cfg.w_norm_lambda

    loss_dict["loss"] = loss
    return loss, loss_dict, id_logs
