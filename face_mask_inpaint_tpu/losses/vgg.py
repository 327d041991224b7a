"""VGG16 feature losses: perceptual / style (Gram) / contextual.

Rebuild of reference modules/loss.py:16-65 (VGGLoss) and
external_function.py:180-192 (StyleLoss), 231-273 (contextual_loss).

The VGG16 trunk is a flax module covering torchvision ``vgg16().features[:23]``
with taps after relu1_2 / relu2_2 / relu3_3 / relu4_3 — the four blocks the
reference splits at ([0:4], [4:9], [9:16], [16:23], loss.py:22-25). Pretrained
ImageNet weights are loaded through tools/convert_torch.py; with random
weights the module is still exercise-able for tests.

Inputs are NHWC in [0, 1]; images larger than 224 are bilinearly rescaled
(align_corners=True) to 224 and ImageNet-normalized, as in the reference.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.nn.layers import Conv2d
from face_mask_inpaint_tpu.ops.resize import max_pool2d, scale_img

Dtype = Any

__all__ = ["VGG16Features", "vgg_loss", "gan_vgg_losses", "style_loss_gram",
           "contextual_loss", "normalization", "VGG16SplitFeatures",
           "get_features"]

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)

# (convs per block, channels) for the four tapped VGG16 blocks.
_BLOCKS: Sequence[tuple[int, int]] = ((2, 64), (2, 128), (3, 256), (3, 512))


class VGG16Features(nn.Module):
    """VGG16 trunk up to relu4_3, returning the four tap activations."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        # conv1_1's input gradient (the only grad that must reach the
        # generator through this trunk) is a ci=3-lane conv traced at 21.7
        # TF/s; Conv2d's FMI_PACKED_DX_CI3=1 hook (nn/layers.py) reroutes
        # it through the half-in packed stencil — applies here automatically
        taps = []
        for b, (n_convs, ch) in enumerate(_BLOCKS):
            if b > 0:
                x = max_pool2d(x, 2)
            for c in range(n_convs):
                x = Conv2d(ch, 3, padding=1, dtype=self.dtype,
                           name=f"conv{b + 1}_{c + 1}")(x)
                x = jax.nn.relu(x)
            taps.append(x)
        return taps


def gram_matrix(feats: jax.Array) -> jax.Array:
    """GramMatrix (external_function.py:180-185) on NHWC: [N, C, C] / (C*H*W)."""
    n, h, w, c = feats.shape
    f = feats.reshape(n, h * w, c)
    g = jnp.einsum("npc,npd->ncd", f, f, preferred_element_type=jnp.float32)
    return g / (c * h * w)


def style_loss_gram(x: jax.Array, y: jax.Array) -> jax.Array:
    """StyleLoss: L1 between Gram matrices, target detached."""
    return jnp.mean(jnp.abs(gram_matrix(x) - jax.lax.stop_gradient(gram_matrix(y))))


def contextual_loss(x: jax.Array, y: jax.Array, h: float = 0.5) -> jax.Array:
    """Contextual loss (external_function.py:231-273) on NHWC feature maps."""
    n, hh, ww, c = x.shape
    y_mu = jnp.mean(y, axis=(0, 1, 2), keepdims=True)  # mean over N,H,W per channel
    x_c = x - y_mu
    y_c = y - y_mu
    # eps-guarded norms: an all-zero feature vector (e.g. a fully-masked
    # region after ReLU) would otherwise produce 0/0 = NaN; the reference
    # divides unguarded (external_function.py:250-251) and simply never
    # hits the case in f32 torch
    x_n = x_c / jnp.maximum(jnp.linalg.norm(x_c, axis=-1, keepdims=True), 1e-12)
    y_n = y_c / jnp.maximum(jnp.linalg.norm(y_c, axis=-1, keepdims=True), 1e-12)
    x_n = x_n.reshape(n, hh * ww, c)
    y_n = y_n.reshape(n, hh * ww, c)
    cos = jnp.einsum("nic,njc->nij", x_n, y_n, preferred_element_type=jnp.float32)
    # clamp d >= 0: the reference relies on cos <= 1 so d_min + 1e-5 > 0,
    # but the TPU MXU's bf16 f32-matmul passes carry ~1e-3 error, so cos can
    # exceed 1 -> d_min + 1e-5 goes NEGATIVE -> d_tilde is hugely negative
    # for ordinary pairs -> exp overflows -> inf/inf = NaN (observed on-chip
    # at GAN step 2). max(d, 0) restores the invariant the math assumes.
    d = jnp.maximum(1.0 - cos, 0.0)
    d_min = jnp.min(d, axis=2, keepdims=True)
    d_tilde = d / (d_min + 1e-5)
    w = jnp.exp((1.0 - d_tilde) / h)
    cx_ij = w / jnp.sum(w, axis=2, keepdims=True)
    cx = jnp.mean(jnp.max(cx_ij, axis=1), axis=1)
    return jnp.mean(-jnp.log(cx + 1e-5))


def _preprocess(img: jax.Array) -> jax.Array:
    if img.shape[1] > 224:  # "Filter HQ" (loss.py:48-49)
        img = scale_img(img, (224, 224))
    mean = jnp.asarray(_IMAGENET_MEAN, img.dtype)
    std = jnp.asarray(_IMAGENET_STD, img.dtype)
    return (img - mean) / std


def normalization(x: jax.Array, mean, std) -> jax.Array:
    """Normalization module (external_function.py:205-213), functional: per-
    channel (x - mean) / std on NHWC (the reference broadcasts over CHW)."""
    mean = jnp.asarray(mean, x.dtype).reshape(1, 1, 1, -1)
    std = jnp.asarray(std, x.dtype).reshape(1, 1, 1, -1)
    return (x - mean) / std


# conv counts per block for the FULL vgg16 trunk; get_features
# (external_function.py:215-229) splits at POOL boundaries
# (vgg[0:5], [5:10], [10:17], [17:24], [24:31]), unlike VGGLoss's relu taps.
_SPLIT_BLOCKS: Sequence[tuple[int, int]] = (
    (2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class VGG16SplitFeatures(nn.Module):
    """get_features (external_function.py:215-229): the full 13-conv VGG16
    trunk tapped AFTER each maxpool. Unused by the reference's main path but
    part of its public surface; params convert via
    tools/convert_torch.convert_vgg16_split_features."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, layers: int = 6) -> list[jax.Array]:
        # img_crop (external_function.py:195-197): ALWAYS bilinear
        # align_corners resize to 224, up- or down-sampling
        x = scale_img(x, (224, 224))
        outs = []
        for b, (n_convs, ch) in enumerate(_SPLIT_BLOCKS):
            if b + 1 >= layers:
                break
            for c in range(n_convs):
                x = Conv2d(ch, 3, padding=1, dtype=self.dtype,
                           name=f"conv{b + 1}_{c + 1}")(x)
                x = jax.nn.relu(x)
            x = max_pool2d(x, 2)
            outs.append(x)
        return outs


def get_features(params, x: jax.Array, layers: int = 6,
                 dtype: Dtype = jnp.float32) -> list[jax.Array]:
    """Functional wrapper matching get_features.forward(input, layers):
    outputs of conv blocks 1..layers-1 (each after its pool)."""
    return VGG16SplitFeatures(dtype=dtype).apply({"params": params}, x, layers)


def vgg_loss(
    vgg_params,
    input_img: jax.Array,
    target_img: jax.Array,
    loss_type: str = "perceptual",
    dtype: Dtype = jnp.float32,
) -> jax.Array:
    """VGGLoss.forward (loss.py:45-65): sum of per-block normalized losses.

    perceptual: sum_i L1(x_i, y_i) / dim_i
    style:      sum_i StyleLoss / (C_i^2 * dim_i)
    contextual: contextual_loss on block 3 only, / dim_3
    """
    model = VGG16Features(dtype=dtype)
    xs = model.apply({"params": vgg_params}, _preprocess(input_img))
    ys = model.apply({"params": vgg_params}, _preprocess(target_img))
    loss = jnp.float32(0.0)
    for i, (x, y) in enumerate(zip(xs, ys)):
        dim = float(x.shape[1] * x.shape[2] * x.shape[3])
        if loss_type == "perceptual":
            # f32 reduction regardless of trunk compute dtype
            loss = loss + jnp.mean(
                jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))) / dim
        elif loss_type == "style":
            c = float(x.shape[-1])
            loss = loss + style_loss_gram(x, y) / (c * c * dim)
        elif loss_type == "contextual" and i == 3:
            loss = loss + contextual_loss(x, y) / dim
    return loss


def gan_vgg_losses(
    vgg_params,
    gen: jax.Array,
    gt: jax.Array,
    src: jax.Array,
    ref: jax.Array,
    mask: jax.Array,
    dtype: Dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The Stack A generator's three VGG terms — perceptual(gen, gt),
    style(gen·(1-m), src), contextual(gen·m, ref·m) (loss.py:109-118) — in
    TWO batched trunk passes instead of six.

    Math is identical to three ``vgg_loss`` calls (convolutions are
    batch-independent; pinned by tests/test_gan_semantics.py): the three
    grad-carrying gen variants run as one 3N-image forward (one shared
    backward), the three targets as one stop-gradiented 3N forward. On TPU
    the batched trunks keep the MXU fed (bs24+ vs bs8 per program) and XLA
    schedules two programs instead of six.

    Returns the UNWEIGHTED (perceptual, style, contextual) terms.
    """
    m = mask[..., None].astype(gen.dtype) if mask.ndim == gen.ndim - 1 else mask
    n = gen.shape[0]
    model = VGG16Features(dtype=dtype)
    x_stack = jnp.concatenate([gen, gen * (1.0 - m), gen * m], axis=0)
    y_stack = jax.lax.stop_gradient(
        jnp.concatenate([gt, src, ref * m], axis=0))
    xs = model.apply({"params": vgg_params}, _preprocess(x_stack))
    ys = [jax.lax.stop_gradient(y)
          for y in model.apply({"params": vgg_params}, _preprocess(y_stack))]
    perc = jnp.float32(0.0)
    style = jnp.float32(0.0)
    for i, (x, y) in enumerate(zip(xs, ys)):
        dim = float(x.shape[1] * x.shape[2] * x.shape[3])
        c = float(x.shape[-1])
        perc = perc + jnp.mean(jnp.abs(x[:n] - y[:n])) / dim
        style = style + style_loss_gram(x[n:2 * n], y[n:2 * n]) / (c * c * dim)
        if i == 3:
            cx = contextual_loss(x[2 * n:], y[2 * n:]) / dim
    return perc, style, cx


def content_loss(inp: jax.Array, target: jax.Array) -> jax.Array:
    """ContentLoss (external_function.py:174-177): L1 to a detached target."""
    return jnp.mean(jnp.abs(inp - jax.lax.stop_gradient(target)))
