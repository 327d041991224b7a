"""ArcFace identity loss.

Rebuild of reference modules/psp/criteria/id_loss.py: crop the face region
([35:223, 32:220]), adaptive-pool to 112, embed with a frozen IR-SE-50
Backbone, loss = mean(1 - <e(y_hat), sg(e(y))>); also reports the similarity
improvement over the masked input and per-sample logs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.models.irse import Backbone
from face_mask_inpaint_tpu.ops.resize import adaptive_avg_pool2d

__all__ = ["make_backbone", "extract_feats", "id_loss"]


def make_backbone() -> Backbone:
    """IDLoss facenet config (id_loss.py:12-16)."""
    return Backbone(input_size=112, num_layers=50, mode="ir_se", drop_ratio=0.6)


def extract_feats(facenet_vars, x: jax.Array) -> jax.Array:
    """Crop + pool + embed (id_loss.py:20-24). x: NHWC in [-1, 1]."""
    x = x[:, 35:223, 32:220, :]
    x = adaptive_avg_pool2d(x, (112, 112))
    return make_backbone().apply(facenet_vars, x, train=False)


def id_loss(facenet_vars, y_hat: jax.Array, y: jax.Array, x: jax.Array):
    """Returns (loss, sim_improvement, id_logs) — id_logs as stacked arrays
    (diff_target / diff_input / diff_views), host code can dict-ify them."""
    x_feats = extract_feats(facenet_vars, x)
    y_feats = jax.lax.stop_gradient(extract_feats(facenet_vars, y))
    y_hat_feats = extract_feats(facenet_vars, y_hat)

    diff_target = jnp.sum(y_hat_feats * y_feats, axis=1)
    diff_input = jnp.sum(y_hat_feats * x_feats, axis=1)
    diff_views = jnp.sum(y_feats * x_feats, axis=1)

    loss = jnp.mean(1.0 - diff_target)
    sim_improvement = jnp.mean(diff_target - diff_views)
    id_logs = {
        "diff_target": diff_target,
        "diff_input": diff_input,
        "diff_views": diff_views,
    }
    return loss, sim_improvement, id_logs
