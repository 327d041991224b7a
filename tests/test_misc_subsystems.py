"""Coverage for the remaining subsystems: FID pipeline, pSp training step,
orbax checkpoint roundtrip, metrics logger, precision policy, schedulers."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from face_mask_inpaint_tpu.core.precision import get_policy
from face_mask_inpaint_tpu.evaluations.fid import (
    InceptionV3Features,
    calculate_frechet_distance,
    statistics_from_activations,
)
from face_mask_inpaint_tpu.losses.psp_loss import PSPLossConfig
from face_mask_inpaint_tpu.losses.lpips import LPIPSNet
from face_mask_inpaint_tpu.losses.vgg import VGG16Features
from face_mask_inpaint_tpu.models.psp import PSP
from face_mask_inpaint_tpu.train import checkpoint as ckpt
from face_mask_inpaint_tpu.train.optim import adam, get_scheduler
from face_mask_inpaint_tpu.train.psp import make_psp_train_step, partitioned_tx
from face_mask_inpaint_tpu.train.state import ModuleState, TrainState
from face_mask_inpaint_tpu.utils.metrics_logger import MetricsLogger

KEY = jax.random.PRNGKey(0)


def test_inception_features_shape():
    model = InceptionV3Features()
    x = jnp.zeros((2, 299, 299, 3))
    vs = model.init(KEY, x, train=False)
    acts = model.apply(vs, x, train=False)
    assert acts.shape == (2, 2048)


def test_frechet_distance_properties():
    rng = np.random.RandomState(0)
    a = rng.randn(500, 16).astype(np.float64)
    b = a + 5.0
    mu1, s1 = statistics_from_activations(a)
    mu2, s2 = statistics_from_activations(b)
    same = calculate_frechet_distance(mu1, s1, mu1, s1)
    far = calculate_frechet_distance(mu1, s1, mu2, s2)
    assert abs(same) < 1e-4
    # mean shift of 5 in 16 dims -> distance ~ 16*25
    assert far == pytest.approx(16 * 25, rel=0.05)


def test_psp_train_step_encoder_only():
    model = PSP(output_size=32, start_from_latent_avg=False)
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    mask = jnp.ones((2, 32, 32))
    variables = model.init({"params": KEY, "noise": KEY}, x, ref=x,
                           src_mask=mask, train=False)
    mstate = ModuleState.from_variables(variables)
    tx = partitioned_tx(adam(1e-3), mstate.params, train_decoder=False)
    state = TrainState(step=jnp.zeros([], jnp.int32), model=mstate,
                       opt_state=tx.init(mstate.params), rng=KEY)
    gen256 = jnp.zeros((2, 256, 256, 3))
    lp = LPIPSNet("alex").init(KEY, gen256, gen256)["params"]
    vgg = VGG16Features().init(KEY, gen256)["params"]
    cfg = PSPLossConfig(l2_lambda=1.0, lpips_lambda=0.1, style_lambda=0.0,
                        cx_lambda=0.0)
    batch = {
        "src_img": x, "ref_img": x,
        "gt_img": jax.random.normal(jax.random.PRNGKey(1), (2, 256, 256, 3)),
        "mask": jnp.zeros((2, 256, 256)),
    }
    step = jax.jit(make_psp_train_step(model, tx, cfg, {"lpips": lp, "vgg": vgg}))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["skipped_nonfinite"]) == 0.0
    # encoder moved, decoder frozen
    enc_delta = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a - b)).max()),
                             state.model.params["encoder"],
                             new_state.model.params["encoder"])
    dec_delta = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a - b)).max()),
                             state.model.params["decoder"],
                             new_state.model.params["decoder"])
    assert max(jax.tree.leaves(enc_delta)) > 0
    assert max(jax.tree.leaves(dec_delta)) == 0


def test_checkpoint_roundtrip(tmp_path):
    tx = adam(1e-3)
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    state = TrainState(
        step=jnp.asarray(7, jnp.int32),
        model=ModuleState(params=params, spectral={"u": jnp.ones(3)}),
        opt_state=tx.init(params),
        rng=jax.random.PRNGKey(3),
    )
    path = ckpt.save_state(tmp_path, "G", 2, jax.device_get(state))
    assert ckpt.latest_epoch(tmp_path, "G") == 2
    restored = ckpt.restore_state(path, jax.device_get(state))
    np.testing.assert_array_equal(np.asarray(restored.model.params["w"]),
                                  np.asarray(params["w"]))
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.rng), np.asarray(state.rng))


def test_metrics_logger(tmp_path):
    logger = MetricsLogger(tmp_path, config={"lr": 1e-4, "opts": ["ssim"]})
    logger.log({"loss": jnp.asarray(0.5), "dice": 0.9}, step=1)
    logger.log({"hist": np.arange(10)}, step=2)
    logger.close()
    recs = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert recs[1]["loss"] == 0.5
    assert recs[2]["hist"]["mean"] == 4.5


def test_metrics_logger_wandb_histograms(tmp_path, monkeypatch):
    """With wandb active, array-valued metrics ship as full wandb.Histogram
    payloads (train_reference_fill.py:372-398 behavior), not moment dicts."""
    import sys
    import types

    logged = []

    class _Hist:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

    class _Run:
        def log(self, payload, step=None):
            logged.append((step, payload))

        def finish(self):
            pass

    stub = types.ModuleType("wandb")
    stub.Histogram = _Hist
    stub.Image = lambda a: ("image", np.asarray(a).shape)
    stub.init = lambda **kw: _Run()
    monkeypatch.setitem(sys.modules, "wandb", stub)

    from face_mask_inpaint_tpu.utils.metrics_logger import histogram_summary

    logger = MetricsLogger(tmp_path, use_wandb=True)
    assert logger._wandb is not None
    hists = histogram_summary({"layer": {"kernel": np.arange(12.0).reshape(3, 4)}},
                              "Weights/G")
    logger.log({"loss": 0.25, **hists}, step=3)
    logger.close()

    (step, payload), = [x for x in logged if "loss" in x[1]]
    assert step == 3 and payload["loss"] == 0.25
    h = payload["Weights/G/layer/kernel"]
    assert isinstance(h, _Hist) and h.arr.shape == (12,)  # full payload, flat
    # JSONL side still gets moments
    recs = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert recs[-1]["Weights/G/layer/kernel"]["mean"] == 5.5


def test_precision_policy_and_scheduler():
    pol = get_policy("bfloat16")
    assert pol.dtype == jnp.bfloat16 and pol.param_dtype == jnp.float32
    with pytest.raises(ValueError):
        get_policy("fp8")

    sched = get_scheduler("lambda", 1e-3, niter=10, niter_decay=10)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(18)) < float(sched(10)) < float(sched(0))
    step_sched = get_scheduler("step", 1e-3, lr_decay_iters=5)
    assert float(step_sched(5)) == pytest.approx(1e-4)
    exp_sched = get_scheduler("exponent", 1e-3)
    assert float(exp_sched(1)) == pytest.approx(0.95e-3)


def test_hub_factories():
    """hub.py — the torch-hub packaging analog (reference
    modules/unet/extra/hubconf.py): factories return (module, variables)
    ready to apply."""
    import jax
    import jax.numpy as jnp

    from face_mask_inpaint_tpu import hub

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    net, vs = hub.unet_carvana()
    assert net.apply(vs, x, train=False).shape == (1, 64, 64, 2)
    det, dv = hub.mask_detector()
    assert det.apply(dv, x, method=type(det).predict_mask).shape == (1, 64, 64)
    rf, rv = hub.reference_fill(out_size=64)
    out = rf.apply(rv, x, x, jnp.zeros((1, 64, 64), jnp.float32),
                   train=False, rngs={"sample": jax.random.PRNGKey(0)})
    assert out.shape == (1, 64, 64, 3)
