"""Data-parallel correctness for the OTHER two training paths.

Round-3 verdict: `test_dp_equivalence.py` proves the Stack A GAN step is
sharding-invariant, but the reference's second and third trainers —
pSp (train_psp.py:245-391: encoder-only partitioning + NaN guard) and the
UNet mask detector (train_mask_detector.py:61-181: CE+dice with BatchNorm)
— had unproven DP semantics. Same criterion here: one step over an 8-device
mesh must equal the same step on one device with the identical global batch.

BatchNorm is the interesting case: under GSPMD the batch statistics are
computed over the GLOBAL batch (XLA inserts the cross-device reductions),
so the sharded step is semantically identical to the single-device one —
there is no per-replica-stats divergence like torch DDP's default BN.
"""

import numpy as np

import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.losses.lpips import LPIPSNet
from face_mask_inpaint_tpu.losses.psp_loss import PSPLossConfig
from face_mask_inpaint_tpu.models.psp import PSP
from face_mask_inpaint_tpu.models.unet import MaskDetector
import optax

from face_mask_inpaint_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from face_mask_inpaint_tpu.train.psp import make_psp_train_step, partitioned_tx
from face_mask_inpaint_tpu.train.state import ModuleState, TrainState
from face_mask_inpaint_tpu.train.unet import make_unet_train_step

KEY = jax.random.PRNGKey(0)


def _max_param_delta(a, b):
    return max(
        float(jnp.max(jnp.abs(x - y)))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_psp_dp_step_matches_single_device():
    """Full pSp train step (encoder-only partitioned optimizer, LPIPS +
    ref-side losses, w-norm, NaN guard) is mesh-invariant.

    Kept CPU-affordable: 32² shapes and the style/cx VGG terms off — they
    are metrics-only in the reference (computed, never added to the loss:
    criteria/__init__.py:74-76, 88-90), so they carry no gradient and no DP
    semantics; each would add two full 224² VGG graphs to the compile."""
    n, hw = 8, 32
    rng = np.random.RandomState(0)
    # everything at one resolution with resize=False so the generator's
    # native 32² output feeds all loss terms (the real 256² trainer's
    # face_pool is shape-only)
    batch = {
        "src_img": (rng.rand(n, hw, hw, 3) * 2 - 1).astype(np.float32),
        "ref_img": (rng.rand(n, hw, hw, 3) * 2 - 1).astype(np.float32),
        "gt_img": (rng.rand(n, hw, hw, 3) * 2 - 1).astype(np.float32),
        "mask": (rng.rand(n, hw, hw) > 0.5).astype(np.float32),
    }
    model = PSP(output_size=hw, start_from_latent_avg=True, use_attention=True)
    x0 = jnp.asarray(batch["src_img"])
    variables = model.init(
        {"params": KEY, "noise": KEY}, x0, ref=x0,
        src_mask=jnp.asarray(batch["mask"]), train=False)
    img0 = jnp.zeros((1, hw, hw, 3))
    # abs(): random lin-head weights have random sign, so the frozen-head
    # LPIPS sum can land negative/zero; trained heads are nonneg, and the
    # liveness assert below relies on that invariant
    lp = jax.tree.map(jnp.abs,
                      LPIPSNet("alex").init(KEY, img0, img0)["params"])
    nets = {"lpips": lp}
    cfg = PSPLossConfig(
        id_lambda=0.0, l2_lambda=1.0, lpips_lambda=0.1, style_lambda=0.0,
        cx_lambda=0.0, l2_lambda_ref=1.0, lpips_lambda_ref=0.1,
        w_norm_lambda=0.01, start_from_latent_avg=True)

    mstate0 = ModuleState.from_variables(variables)
    # SGD for the equivalence check: the DP property (global psum + the
    # frozen-decoder partitioning) is optimizer-independent, and adaptive
    # optimizers turn ±1e-9 reduction-order grad noise into ±lr sign flips
    # on near-zero-gradient params, which is real float behavior, not a DP
    # bug (adam-driven runs hit it on ~1% of elements).
    tx = partitioned_tx(optax.sgd(1e-3), mstate0.params, train_decoder=False)

    def fresh_state():
        ms = ModuleState.from_variables(variables)
        return TrainState(step=jnp.zeros([], jnp.int32), model=ms,
                          opt_state=tx.init(ms.params), rng=KEY)

    step = jax.jit(make_psp_train_step(model, tx, cfg, nets, use_ref=True,
                                       randomize_noise=False, resize=False))

    s1, m1 = step(fresh_state(), {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    s8, m8 = step(replicate_tree(fresh_state(), mesh),
                  shard_batch({k: v for k, v in batch.items()}, mesh))

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=2e-4,
                                   atol=1e-5, err_msg=k)
    # every configured loss term must be alive, not trivially zero
    for k in ("loss_l2", "loss_lpips", "loss_l2_ref", "loss_lpips_ref",
              "loss_w_norm"):
        assert float(m1[k]) > 0.0, f"loss term {k} is dead"
    assert float(m1["skipped_nonfinite"]) == 0.0

    # encoder updates identical up to f32 reduction-order noise; decoder
    # bit-frozen on BOTH paths (partitioned optimizer is sharding-invariant)
    for a, b in zip(jax.tree.leaves(s1.model.params["encoder"]),
                    jax.tree.leaves(jax.device_get(s8.model.params["encoder"]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=2.5e-4)
    assert _max_param_delta(s1.model.params["decoder"],
                            mstate0.params["decoder"]) == 0.0
    assert _max_param_delta(jax.device_get(s8.model.params["decoder"]),
                            mstate0.params["decoder"]) == 0.0
    # encoder actually moved
    assert _max_param_delta(s1.model.params["encoder"],
                            mstate0.params["encoder"]) > 0.0


def test_unet_dp_step_matches_single_device():
    """UNet CE+dice step: global-batch BatchNorm statistics make the sharded
    step equal the single-device one (stats AND updated params)."""
    n, hw = 8, 32
    rng = np.random.RandomState(1)
    batch = {
        "image": rng.rand(n, hw, hw, 3).astype(np.float32),
        "mask": (rng.rand(n, hw, hw) > 0.5).astype(np.int32),
    }
    model = MaskDetector(n_channels=3, bilinear=True)
    variables = model.init(KEY, jnp.asarray(batch["image"]), mode="train",
                           train=False)
    tx = optax.sgd(1e-3)  # see the pSp test: equivalence vs adam sign flips

    def fresh_state():
        ms = ModuleState.from_variables(variables)
        return TrainState(step=jnp.zeros([], jnp.int32), model=ms,
                          opt_state=tx.init(ms.params), rng=KEY)

    step = jax.jit(make_unet_train_step(model, tx))

    s1, m1 = step(fresh_state(), {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_mesh()
    s8, m8 = step(replicate_tree(fresh_state(), mesh), shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-4, atol=1e-5)
    assert float(m1["loss"]) > 0.0
    for a, b in zip(jax.tree.leaves(s1.model.params),
                    jax.tree.leaves(jax.device_get(s8.model.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=2.5e-4)
    # running batch stats are global-batch moments on both paths
    for a, b in zip(jax.tree.leaves(s1.model.batch_stats),
                    jax.tree.leaves(jax.device_get(s8.model.batch_stats))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
