"""pSp (Stack B) training/eval steps.

Rebuild of reference train_psp.py:245-391: encoder-only optimization by
default (decoder frozen — psp.py:31-32 _freeze — realized here by parameter
partitioning with optax.multi_transform), the NaN guard that skips non-finite
steps (:328-335), and the eval metrics path.

The whole step jits as one function; under a data mesh XLA all-reduces the
grads over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import flax.traverse_util as traverse_util
import jax
import jax.numpy as jnp
import optax

from face_mask_inpaint_tpu.losses.psp_loss import PSPLossConfig, psp_loss
from face_mask_inpaint_tpu.train.state import ModuleState, TrainState

__all__ = ["partitioned_tx", "make_psp_train_step", "make_psp_eval_step"]


def partitioned_tx(
    tx: optax.GradientTransformation, params, train_decoder: bool
) -> optax.GradientTransformation:
    """Optimize encoder params (+decoder when train_decoder), freeze the rest
    — the functional analog of building the optimizer over
    generator.encoder.parameters() only (train_psp.py:287-289)."""

    def label(path: tuple) -> str:
        top = path[0]
        if top == "encoder":
            return "train"
        if top == "decoder" and train_decoder:
            return "train"
        return "frozen"

    flat = traverse_util.flatten_dict(params)
    labels = traverse_util.unflatten_dict({k: label(k) for k in flat})
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels
    )


def make_psp_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: PSPLossConfig,
    nets: dict,
    use_ref: bool = True,
    randomize_noise: bool = True,
    return_grads: bool = False,
    resize: bool = True,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """resize mirrors pSp.forward's flag (face_pool to 256², psp.py:113-114);
    the real trainer keeps the default — tests on tiny shapes disable it so
    every loss term can run at the generator's native resolution."""
    def step(state: TrainState, batch: dict):
        rng, noise_rng = jax.random.split(state.rng)

        def loss_fn(params):
            variables = state.model.replace(params=params).variables()
            out, mut = model.apply(
                variables,
                batch["src_img"],
                ref=batch["ref_img"] if use_ref else None,
                src_mask=batch["mask"] if use_ref else None,
                return_latents=True,
                randomize_noise=randomize_noise,
                resize=resize,
                train=True,
                rngs={"noise": noise_rng},
                mutable=["batch_stats", "spectral"],
            )
            y_hat, latent = out
            latent_avg = variables.get("latent_avg", {}).get("value")
            loss, loss_dict, id_logs = psp_loss(
                cfg, nets,
                x=batch["src_img"], y=batch["gt_img"], y_hat=y_hat,
                latent=latent, latent_avg=latent_avg,
                ref=batch["ref_img"] if use_ref else None,
                mask=batch["mask"],
            )
            return loss, (loss_dict, mut)

        (loss, (loss_dict, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.model.params)

        # NaN guard (train_psp.py:328-335): skip the update on non-finite loss.
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.model.params)
        updates = jax.tree.map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates
        )
        new_model = state.model.replace(
            params=optax.apply_updates(state.model.params, updates)
        ).merged(mut)
        new_state = state.replace(
            step=state.step + 1, model=new_model, opt_state=opt_state, rng=rng
        )
        loss_dict = dict(loss_dict)
        loss_dict["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        if return_grads:
            # reference logs weight AND grad histograms at eval steps
            # (train_psp.py:352-359); the trainer jits this variant for those.
            loss_dict["grads"] = grads
        return new_state, loss_dict

    return step


def make_psp_eval_step(
    model,
    cfg: PSPLossConfig,
    nets: dict,
    use_ref: bool = True,
):
    def step(state: TrainState, batch: dict, rng: jax.Array):
        variables = state.model.variables()
        out = model.apply(
            variables,
            batch["src_img"],
            ref=batch["ref_img"] if use_ref else None,
            src_mask=batch["mask"] if use_ref else None,
            return_latents=True,
            randomize_noise=False,
            train=False,
            rngs={"noise": rng},
        )
        y_hat, latent = out
        latent_avg = variables.get("latent_avg", {}).get("value")
        loss, loss_dict, _ = psp_loss(
            cfg, nets,
            x=batch["src_img"], y=batch["gt_img"], y_hat=y_hat,
            latent=latent, latent_avg=latent_avg,
            ref=batch["ref_img"] if use_ref else None,
            mask=batch["mask"],
        )
        return {"loss": loss, "gen": y_hat, **loss_dict}

    return step
