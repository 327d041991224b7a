"""Mask-detector (UNet) training/eval steps.

Rebuild of reference train_mask_detector.py:61-181: cross-entropy +
multiclass dice on softmax vs one-hot (:129-134), evaluated by dice on the
argmax one-hot ignoring the background channel (:24-58). The reference's AMP
autocast/GradScaler is unnecessary on TPU — compute runs in bf16 via the
module dtype with f32 params, no loss scaling needed (bf16 has f32's exponent
range).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from face_mask_inpaint_tpu.losses.dice import dice_loss, multiclass_dice_coeff
from face_mask_inpaint_tpu.train.state import ModuleState, TrainState

__all__ = ["unet_loss", "make_unet_train_step", "make_unet_eval_step"]


def unet_loss(logits: jax.Array, true_mask: jax.Array, n_classes: int = 2) -> jax.Array:
    """CE + multiclass dice (train_mask_detector.py:130-134).

    logits: [N, H, W, C]; true_mask: [N, H, W] int labels.
    """
    onehot = jax.nn.one_hot(true_mask, n_classes, dtype=logits.dtype)
    ce = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), true_mask
        )
    )
    dl = dice_loss(
        jax.nn.softmax(logits.astype(jnp.float32), axis=-1),
        onehot.astype(jnp.float32),
        multiclass=True,
    )
    return ce + dl


def make_unet_train_step(
    model, tx: optax.GradientTransformation
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    def step(state: TrainState, batch: dict):
        def loss_fn(params):
            logits, mut = model.apply(
                state.model.replace(params=params).variables(),
                batch["image"],
                mode="train",
                train=True,
                mutable=["batch_stats"],
            )
            return unet_loss(logits, batch["mask"]), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.model.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.model.params)
        new_model = state.model.replace(
            params=optax.apply_updates(state.model.params, updates)
        ).merged(mut)
        new_state = state.replace(
            step=state.step + 1, model=new_model, opt_state=opt_state
        )
        return new_state, {"loss": loss}

    return step


def make_unet_eval_step(model):
    """Validation dice (train_mask_detector.py:24-58): one-hot argmax,
    foreground channels only."""

    def step(state: TrainState, batch: dict):
        logits = model.apply(
            state.model.variables(), batch["image"], mode="train", train=False
        )
        n_classes = logits.shape[-1]
        pred_onehot = jax.nn.one_hot(
            jnp.argmax(logits, axis=-1), n_classes, dtype=jnp.float32
        )
        true_onehot = jax.nn.one_hot(batch["mask"], n_classes, dtype=jnp.float32)
        dice = multiclass_dice_coeff(
            pred_onehot[..., 1:], true_onehot[..., 1:], reduce_batch_first=False
        )
        return {"dice": dice}

    return step
