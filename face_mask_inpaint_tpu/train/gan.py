"""Functional two-optimizer GAN training step (Stack A).

Replaces the reference GANOptimizer.__call__ (modules/loss.py:120-134), whose
interleaved backward/step semantics decompose as:

  1. G step: grads of [lsgan(D(fake), real)*lambda_g + L1(fake, gt)
     + 0.1*perceptual + 250*style + 1*contextual] w.r.t. generator params
     only (the reference leaks G-loss grads into D params but zeroes them
     before the D step — net effect identical to treating D as constant).
  2. D step: grads of 0.5*(lsgan(D(gt), real) + lsgan(D(sg(fake)), fake))
     w.r.t. discriminator params, with the generated image stop-gradiented
     (the ``.detach()`` at loss.py:103).

The whole thing jits as ONE function: both forward/backward passes, both
optimizer updates, the spectral-norm power iterations (threaded in the same
D-call order as the reference: D(fake), D(real), D(sg(fake))), and — under a
data-parallel mesh — the ICI gradient all-reduces XLA inserts automatically.

Loss weights match loss.py:79-82 (perc=0.1, style=250, cx=1, g_adv=lambda_g).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from face_mask_inpaint_tpu.losses.gan import gan_loss
from face_mask_inpaint_tpu.losses.vgg import gan_vgg_losses, vgg_loss
from face_mask_inpaint_tpu.train.state import GANTrainState, ModuleState

__all__ = ["make_gan_train_step", "make_gan_eval_step", "gan_losses"]

LAMBDA_PERC = 0.1
LAMBDA_STYLE = 250.0
LAMBDA_CX = 1.0


def _apply_d(discriminator, d_vars: dict, x: jax.Array, train: bool):
    """Discriminator forward; returns (pred, mutated collections)."""
    out, mut = discriminator.apply(
        d_vars, x, train=train, mutable=["spectral", "batch_stats"]
    )
    return out, mut


def gan_losses(
    generator,
    discriminator,
    g_state: ModuleState,
    d_state: ModuleState,
    vgg_params,
    batch: dict,
    rng: jax.Array,
    lambda_g: float = 0.01,
    gan_mode: str = "lsgan",
    train: bool = True,
):
    """Shared loss computation (mirrors GANOptimizer.calc_loss for eval)."""
    src, gt, ref, mask = batch["src_img"], batch["gt_img"], batch["ref_img"], batch["mask"]
    gen, g_mut = generator.apply(
        g_state.variables(), src, ref, mask, train=train,
        rngs={"sample": rng}, mutable=["spectral", "batch_stats"],
    )
    d_vars = d_state.variables()
    d_fake, d_mut = _apply_d(discriminator, d_vars, gen, train)
    loss_ad_g = gan_loss(d_fake, True, False, gan_mode) * lambda_g
    loss_l1_g = jnp.mean(jnp.abs(gen - gt))
    # Six single-pair VGG trunk forwards, as in the reference. The batched
    # alternative (losses/vgg.py:gan_vgg_losses — two 3N-image passes,
    # identical math, parity-pinned) MEASURED SLOWER on v5e: 48.4-49.0 vs
    # 51.0 imgs/s @ bs8 f32 — XLA overlaps/schedules the six small
    # programs better than the two wide ones. FMI_BATCHED_VGG=1 opts in.
    # The VGG trunk computes in the generator's compute dtype: a bf16-mixed
    # training step (f32 params/stats/reductions, bf16 MXU passes) keeps the
    # whole loss stack in one precision policy — the TPU analog of the
    # reference's effective A100 default (torch conv TF32).
    import os

    if os.environ.get("FMI_BATCHED_VGG") == "1":
        perc, style, cx = gan_vgg_losses(vgg_params, gen, gt, src, ref, mask,
                                         dtype=gen.dtype)
        perc, style, cx = (perc * LAMBDA_PERC, style * LAMBDA_STYLE,
                           cx * LAMBDA_CX)
    else:
        perc = vgg_loss(vgg_params, gen, gt, "perceptual",
                        dtype=gen.dtype) * LAMBDA_PERC
        mm = mask[..., None].astype(gen.dtype)
        style = vgg_loss(vgg_params, gen * (1.0 - mm), src, "style",
                         dtype=gen.dtype) * LAMBDA_STYLE
        cx = vgg_loss(vgg_params, gen * mm, ref * mm, "contextual",
                      dtype=gen.dtype) * LAMBDA_CX
    g_total = loss_ad_g + loss_l1_g + perc + style + cx
    aux = dict(
        gen=gen, g_mut=g_mut, d_mut=d_mut,
        loss_ad_g=loss_ad_g, loss_l1_g=loss_l1_g,
        perc_loss=perc, style_loss=style, cx_loss=cx,
    )
    return g_total, aux


def make_gan_train_step(
    generator,
    discriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    vgg_params,
    lambda_g: float = 0.01,
    gan_mode: str = "lsgan",
    return_grads: bool = False,
) -> Callable[[GANTrainState, dict], tuple[GANTrainState, dict]]:
    """Build the jittable (state, batch) -> (state, metrics) GAN step.

    return_grads additionally returns the raw G/D gradient trees in the
    metrics dict ('g_grads'/'d_grads') — the trainers use a second jit of
    this on eval steps to log gradient histograms, matching the reference's
    wandb.Histogram(value.grad) (train_reference_fill.py:372-379)."""

    def step(state: GANTrainState, batch: dict):
        rng, sample_rng = jax.random.split(state.rng)

        # ---- Generator update -------------------------------------------
        def g_loss_fn(g_params):
            g_state = state.generator.replace(params=g_params)
            return gan_losses(
                generator, discriminator, g_state, state.discriminator,
                vgg_params, batch, sample_rng, lambda_g, gan_mode, train=True,
            )

        (g_total, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.generator.params
        )
        g_updates, g_opt_state = g_tx.update(
            g_grads, state.g_opt_state, state.generator.params
        )
        new_g = state.generator.replace(
            params=optax.apply_updates(state.generator.params, g_updates)
        ).merged(aux["g_mut"])

        # Spectral/batch-stats state from the G-pass D(fake) call.
        d_state_mid = state.discriminator.merged(aux["d_mut"])
        gen_detached = jax.lax.stop_gradient(aux["gen"])

        # ---- Discriminator update ---------------------------------------
        def d_loss_fn(d_params):
            d_vars = d_state_mid.replace(params=d_params).variables()
            d_real, mut1 = _apply_d(discriminator, d_vars, batch["gt_img"], True)
            d_vars2 = d_state_mid.replace(params=d_params).merged(mut1).variables()
            d_fake, mut2 = _apply_d(discriminator, d_vars2, gen_detached, True)
            loss_real = gan_loss(d_real, True, True, gan_mode)
            loss_fake = gan_loss(d_fake, False, True, gan_mode)
            d_loss = (loss_real + loss_fake) * 0.5
            return d_loss, {**mut1, **mut2}

        (d_loss, d_mut2), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_state_mid.params
        )
        d_updates, d_opt_state = d_tx.update(
            d_grads, state.d_opt_state, d_state_mid.params
        )
        new_d = d_state_mid.replace(
            params=optax.apply_updates(d_state_mid.params, d_updates)
        ).merged(d_mut2)

        metrics = {
            "D_loss": d_loss,
            "G_loss": g_total,
            "perc_loss": aux["perc_loss"],
            "style_loss": aux["style_loss"],
            "cx_loss": aux["cx_loss"],
            "l1_loss": aux["loss_l1_g"],
            "adv_loss": aux["loss_ad_g"],
        }
        if return_grads:
            metrics["g_grads"] = g_grads
            metrics["d_grads"] = d_grads
        new_state = state.replace(
            step=state.step + 1,
            generator=new_g,
            discriminator=new_d,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            rng=rng,
        )
        return new_state, metrics

    return step


def make_gan_eval_step(
    generator,
    discriminator,
    vgg_params,
    lambda_g: float = 0.01,
    gan_mode: str = "lsgan",
):
    """calc_loss equivalent (loss.py:136-144): losses without updates."""

    def step(state: GANTrainState, batch: dict, rng: jax.Array):
        g_total, aux = gan_losses(
            generator, discriminator, state.generator, state.discriminator,
            vgg_params, batch, rng, lambda_g, gan_mode, train=False,
        )
        d_real, _ = _apply_d(
            discriminator, state.discriminator.variables(), batch["gt_img"], False
        )
        d_fake, _ = _apply_d(
            discriminator, state.discriminator.variables(),
            jax.lax.stop_gradient(aux["gen"]), False,
        )
        d_loss = 0.5 * (
            gan_loss(d_real, True, True, gan_mode)
            + gan_loss(d_fake, False, True, gan_mode)
        )
        return {"D_loss": d_loss, "G_loss": g_total, "gen": aux["gen"]}

    return step
