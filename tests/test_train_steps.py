"""End-to-end training-step tests on tiny shapes: the two-optimizer GAN step
(Stack A) and the UNet mask-detector step, including under a data-parallel
mesh on the 8-device virtual CPU backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from face_mask_inpaint_tpu.losses.vgg import VGG16Features
from face_mask_inpaint_tpu.models.picnet import define_d
from face_mask_inpaint_tpu.models.reference_fill import ReferenceFill
from face_mask_inpaint_tpu.models.unet import MaskDetector
from face_mask_inpaint_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from face_mask_inpaint_tpu.train.gan import make_gan_train_step
from face_mask_inpaint_tpu.train.optim import adam, ranger
from face_mask_inpaint_tpu.train.state import GANTrainState, ModuleState, TrainState
from face_mask_inpaint_tpu.train.unet import make_unet_eval_step, make_unet_train_step

KEY = jax.random.PRNGKey(0)

ENC = dict(type="pluralistic", ngf=4, z_nc=8, img_f=16, L=1, layers=3,
           norm="none", activation="LeakyReLU", init_type="normal")
DEC = dict(ngf=8, z_nc=8, img_f=32, L=0, layers=3, norm="instance",
           activation="LeakyReLU", init_type="normal")


def _tiny_batch(n=2, hw=32):
    rng = np.random.RandomState(0)
    return {
        "src_img": jnp.asarray(rng.rand(n, hw, hw, 3), jnp.float32),
        "gt_img": jnp.asarray(rng.rand(n, hw, hw, 3), jnp.float32),
        "ref_img": jnp.asarray(rng.rand(n, hw, hw, 3), jnp.float32),
        "mask": jnp.asarray(rng.rand(n, hw, hw) > 0.5, jnp.float32),
    }


def _build_gan(out_hw=32):
    generator = ReferenceFill(encoder_params=ENC, decoder_params=DEC,
                              use_att=True, out_size=(out_hw, out_hw))
    discriminator = define_d(ndf=4, img_f=16, layers=3, init_type="normal")
    batch = _tiny_batch(hw=out_hw)
    g_vars = generator.init(
        {"params": KEY, "sample": KEY},
        batch["src_img"], batch["ref_img"], batch["mask"],
    )
    d_vars = discriminator.init(KEY, batch["gt_img"])
    vgg_params = VGG16Features().init(KEY, batch["gt_img"])["params"]
    return generator, discriminator, g_vars, d_vars, vgg_params, batch


def test_gan_train_step_updates_both_networks():
    generator, discriminator, g_vars, d_vars, vgg_params, batch = _build_gan()
    g_tx, d_tx = adam(1e-4), adam(1e-4)
    g_state = ModuleState.from_variables(g_vars)
    d_state = ModuleState.from_variables(d_vars)
    state = GANTrainState(
        step=jnp.zeros([], jnp.int32),
        generator=g_state,
        discriminator=d_state,
        g_opt_state=g_tx.init(g_state.params),
        d_opt_state=d_tx.init(d_state.params),
        rng=KEY,
    )
    step = jax.jit(make_gan_train_step(
        generator, discriminator, g_tx, d_tx, vgg_params))
    new_state, metrics = step(state, batch)

    for k in ("D_loss", "G_loss", "perc_loss", "style_loss", "cx_loss"):
        assert np.isfinite(float(metrics[k])), k
    # Both networks' params changed.
    g_delta = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                           state.generator.params, new_state.generator.params)
    assert max(jax.tree.leaves(g_delta)) > 0
    d_delta = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                           state.discriminator.params, new_state.discriminator.params)
    assert max(jax.tree.leaves(d_delta)) > 0
    # Spectral power-iteration state advanced.
    su = jax.tree.leaves(jax.tree.map(
        lambda a, b: np.abs(np.asarray(a - b)).max(),
        state.discriminator.spectral, new_state.discriminator.spectral))
    assert max(su) > 0
    assert int(new_state.step) == 1
    # Second step runs from the new state (state pytree is stable).
    state3, _ = step(new_state, batch)
    assert int(state3.step) == 2


def test_gan_train_step_bf16_mixed_matches_f32():
    """The bf16-mixed training step (--compute_dtype bfloat16: bf16 MXU
    passes, f32 params/opt/stats/loss reductions — the TPU analog of the
    reference's A100 TF32-conv default) stays finite, keeps f32 params,
    and lands within precision noise of the full-f32 losses."""
    def build(dt):
        generator = ReferenceFill(encoder_params=ENC, decoder_params=DEC,
                                  use_att=True, out_size=(32, 32), dtype=dt)
        discriminator = define_d(ndf=4, img_f=16, layers=3,
                                 init_type="normal", dtype=dt)
        batch = _tiny_batch(hw=32)
        g_vars = generator.init({"params": KEY, "sample": KEY},
                                batch["src_img"], batch["ref_img"],
                                batch["mask"])
        d_vars = discriminator.init(KEY, batch["gt_img"])
        vgg = VGG16Features(dtype=dt).init(KEY, batch["gt_img"])["params"]
        g_tx, d_tx = adam(1e-4), adam(1e-4)
        gs = ModuleState.from_variables(g_vars)
        ds = ModuleState.from_variables(d_vars)
        state = GANTrainState(
            step=jnp.zeros([], jnp.int32), generator=gs, discriminator=ds,
            g_opt_state=g_tx.init(gs.params), d_opt_state=d_tx.init(ds.params),
            rng=KEY)
        step = jax.jit(make_gan_train_step(
            generator, discriminator, g_tx, d_tx, vgg))
        return step(state, batch)

    st32, m32 = build(jnp.float32)
    st16, m16 = build(jnp.bfloat16)
    for leaf in jax.tree.leaves(st16.generator.params):
        assert leaf.dtype == jnp.float32  # mixed: params stay f32
    for k in ("D_loss", "G_loss", "l1_loss", "adv_loss"):
        a, b = float(m32[k]), float(m16[k])
        assert np.isfinite(b), k
        assert abs(a - b) < 0.05 * max(abs(a), 0.05), (k, a, b)
    mesh = make_mesh()  # 8 virtual CPU devices
    generator, discriminator, g_vars, d_vars, vgg_params, batch = _build_gan()
    batch = {k: jnp.concatenate([v] * 4, 0) for k, v in batch.items()}  # N=8
    g_tx, d_tx = adam(1e-4), adam(1e-4)
    g_state = ModuleState.from_variables(g_vars)
    d_state = ModuleState.from_variables(d_vars)
    state = GANTrainState(
        step=jnp.zeros([], jnp.int32),
        generator=g_state,
        discriminator=d_state,
        g_opt_state=g_tx.init(g_state.params),
        d_opt_state=d_tx.init(d_state.params),
        rng=KEY,
    )
    state = replicate_tree(state, mesh)
    sbatch = shard_batch(batch, mesh)
    step = jax.jit(make_gan_train_step(
        generator, discriminator, g_tx, d_tx, replicate_tree(vgg_params, mesh)))
    new_state, metrics = step(state, sbatch)
    assert np.isfinite(float(metrics["G_loss"]))
    assert np.isfinite(float(metrics["D_loss"]))


def test_unet_train_and_eval_step():
    model = MaskDetector()
    rngs = np.random.RandomState(1)
    batch = {
        "image": jnp.asarray(rngs.rand(2, 32, 32, 3), jnp.float32),
        "mask": jnp.asarray(rngs.randint(0, 2, (2, 32, 32))),
    }
    variables = model.init(KEY, batch["image"])
    tx = ranger(1e-3)
    mstate = ModuleState.from_variables(variables)
    state = TrainState(
        step=jnp.zeros([], jnp.int32), model=mstate,
        opt_state=tx.init(mstate.params), rng=KEY,
    )
    train_step = jax.jit(make_unet_train_step(model, tx))
    eval_step = jax.jit(make_unet_eval_step(model))

    losses = []
    for _ in range(3):
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # tiny batch: should overfit immediately
    out = eval_step(state, batch)
    assert 0.0 <= float(out["dice"]) <= 1.0


def test_ranger_matches_reference_torch_free_properties():
    """Sanity: ranger reduces a quadratic and lookahead sync happens at k."""
    tx = ranger(0.1, k=3)
    # NB: random values, not constants — gradient centralization zeroes the
    # mean of each row's gradient, so a constant tensor would never move.
    params = {"w": jax.random.normal(KEY, (4, 4))}
    opt_state = tx.init(params)

    def loss(p):
        return jnp.sum(p["w"] ** 2)

    vals = [float(loss(params))]
    for _ in range(60):
        grads = jax.grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        vals.append(float(loss(params)))
    # GC preserves each row's mean, so the optimum is the row-mean matrix,
    # not zero — just require substantial progress toward it.
    assert vals[-1] < vals[0] * 0.5


def test_ranger_trajectory_matches_reference_torch():
    """Step-for-step parity with the reference optimizer
    (modules/psp/ranger.py:29-184), re-implemented inline in torch below as
    the oracle (same pattern as the model-parity tests). 14 steps with
    b2=0.999 span the unrectified RAdam phase (N_sma <= 5 for the first few
    steps), the rectified phase, and two lookahead k=6 sync boundaries
    (t=6, 12); params include a conv-shaped 4-D tensor (gradient
    centralization active, grad.dim() > 1) and a 1-D bias (GC skipped).

    Both sides run in float64 (jax x64 context / torch double) so the ≤1e-9
    agreement is a statement about SEMANTICS — in f32 the two trajectories
    drift apart by ~6e-6 of pure reduction-order noise through the adaptive
    denominators, which would mask a subtly wrong schedule."""
    import math

    import torch

    lr, alpha, k, thresh = 1e-2, 0.5, 6, 5
    b1, b2, eps = 0.95, 0.999, 1e-5
    n_steps = 14
    rng = np.random.RandomState(42)
    init = {
        "conv": rng.randn(8, 3, 3, 4).astype(np.float64),
        "bias": rng.randn(8).astype(np.float64),
    }
    grad_seq = [
        {n: rng.randn(*p.shape).astype(np.float64) for n, p in init.items()}
        for _ in range(n_steps)
    ]

    # --- torch oracle: faithful transcription of Ranger.step (ranger.py:93-184)
    t_params = {n: torch.tensor(p, requires_grad=False) for n, p in init.items()}
    t_state = {
        n: {
            "step": 0,
            "exp_avg": torch.zeros_like(p),
            "exp_avg_sq": torch.zeros_like(p),
            "slow_buffer": p.clone(),
        }
        for n, p in t_params.items()
    }
    for g_np in grad_seq:
        for n, p in t_params.items():
            grad = torch.tensor(g_np[n]).double()
            st = t_state[n]
            # GC for dim > gc_gradient_threshold(=1) (ranger.py:133-134)
            if grad.dim() > 1:
                grad.add_(-grad.mean(dim=tuple(range(1, grad.dim())), keepdim=True))
            st["step"] += 1
            st["exp_avg_sq"].mul_(b2).addcmul_(grad, grad, value=1 - b2)
            st["exp_avg"].mul_(b1).add_(grad, alpha=1 - b1)
            t = st["step"]
            beta2_t = b2 ** t
            n_sma_max = 2 / (1 - b2) - 1
            n_sma = n_sma_max - 2 * t * beta2_t / (1 - beta2_t)
            if n_sma > thresh:
                step_size = math.sqrt(
                    (1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                    * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2)
                ) / (1 - b1 ** t)
                denom = st["exp_avg_sq"].sqrt().add_(eps)
                p.addcdiv_(st["exp_avg"], denom, value=-step_size * lr)
            else:
                step_size = 1.0 / (1 - b1 ** t)
                p.add_(st["exp_avg"], alpha=-step_size * lr)
            if st["step"] % k == 0:  # integrated lookahead (ranger.py:176-182)
                st["slow_buffer"].add_(p - st["slow_buffer"], alpha=alpha)
                p.copy_(st["slow_buffer"])

    # --- ours, under x64 so dtype (not math) is the only difference knob
    with jax.enable_x64():
        tx = ranger(lr, alpha=alpha, k=k, n_sma_threshold=thresh,
                    b1=b1, b2=b2, eps=eps)
        params = {n: jnp.asarray(p, jnp.float64) for n, p in init.items()}
        opt_state = tx.init(params)
        for g_np in grad_seq:
            grads = {n: jnp.asarray(g, jnp.float64) for n, g in g_np.items()}
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        params = jax.device_get(params)
        slow = jax.device_get(opt_state.slow)

    for n in init:
        np.testing.assert_allclose(
            np.asarray(params[n]), t_params[n].numpy(), rtol=1e-9, atol=1e-9,
            err_msg=f"ranger trajectory diverged on {n} after {n_steps} steps")
        np.testing.assert_allclose(
            np.asarray(slow[n]), t_state[n]["slow_buffer"].numpy(),
            rtol=1e-9, atol=1e-9, err_msg=f"lookahead slow buffer on {n}")


def _assert_trees_equal(a, b, what):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb), what
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=what)


def test_gan_resume_trajectory_equivalence(tmp_path):
    """save -> restore -> continue must be bit-for-bit identical to an
    uninterrupted run: params, BOTH optimizer states, spectral/batch-norm
    state, rng, and step (reference save layout
    train_reference_fill.py:410-415; round-2 verdict item 7)."""
    from face_mask_inpaint_tpu.train import checkpoint as ckpt

    generator, discriminator, g_vars, d_vars, vgg_params, _ = _build_gan()
    rngs = [np.random.RandomState(i) for i in range(4)]
    batches = [{
        "src_img": jnp.asarray(r.rand(2, 32, 32, 3), jnp.float32),
        "gt_img": jnp.asarray(r.rand(2, 32, 32, 3), jnp.float32),
        "ref_img": jnp.asarray(r.rand(2, 32, 32, 3), jnp.float32),
        "mask": jnp.asarray(r.rand(2, 32, 32) > 0.5, jnp.float32),
    } for r in rngs]
    g_tx, d_tx = adam(1e-4), adam(1e-4)

    def fresh_state():
        g_state = ModuleState.from_variables(g_vars)
        d_state = ModuleState.from_variables(d_vars)
        return GANTrainState(
            step=jnp.zeros([], jnp.int32), generator=g_state,
            discriminator=d_state, g_opt_state=g_tx.init(g_state.params),
            d_opt_state=d_tx.init(d_state.params), rng=KEY)

    step = jax.jit(make_gan_train_step(
        generator, discriminator, g_tx, d_tx, vgg_params))

    cont = fresh_state()
    for b in batches:
        cont, _ = step(cont, b)

    inter = fresh_state()
    for b in batches[:2]:
        inter, _ = step(inter, b)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    ckpt.save_state(run_dir, "G", 1, {"state": jax.device_get(inter)})
    assert ckpt.latest_epoch(run_dir, "G") == 1
    restored = ckpt.restore_state(
        run_dir / "G_checkpoint_epoch1",
        {"state": jax.device_get(fresh_state())})["state"]
    _assert_trees_equal(jax.device_get(inter), restored, "ckpt roundtrip")
    for b in batches[2:]:
        restored, _ = step(restored, b)

    assert int(restored.step) == int(cont.step) == 4
    _assert_trees_equal(cont.generator.params, restored.generator.params,
                        "generator params diverged after resume")
    _assert_trees_equal(cont.discriminator.params,
                        restored.discriminator.params,
                        "discriminator params diverged after resume")
    _assert_trees_equal(cont.g_opt_state, restored.g_opt_state, "g opt state")
    _assert_trees_equal(cont.d_opt_state, restored.d_opt_state, "d opt state")
    _assert_trees_equal(cont.generator.spectral, restored.generator.spectral,
                        "spectral state")
    np.testing.assert_array_equal(np.asarray(cont.rng),
                                  np.asarray(restored.rng), "rng")


def test_psp_resume_trajectory_equivalence(tmp_path):
    """Same bit-for-bit criterion for the Stack B trainer's TrainState
    (params + partitioned optimizer + rng + step)."""
    from face_mask_inpaint_tpu.losses.psp_loss import PSPLossConfig
    from face_mask_inpaint_tpu.losses.vgg import VGG16Features
    from face_mask_inpaint_tpu.models.psp import PSP
    from face_mask_inpaint_tpu.train import checkpoint as ckpt
    from face_mask_inpaint_tpu.train.optim import adam_injected
    from face_mask_inpaint_tpu.train.psp import make_psp_train_step, partitioned_tx

    model = PSP(output_size=64, start_from_latent_avg=True, use_attention=False)
    # everything at the face_pool output resolution (256², psp.py:33) so the
    # in-/out-mask loss terms see aligned shapes, as in the real trainer
    x0 = jax.random.normal(KEY, (1, 256, 256, 3))
    m0 = jnp.zeros((1, 256, 256), jnp.float32)
    variables = model.init({"params": KEY, "noise": KEY}, x0, ref=x0,
                           src_mask=m0, train=False)
    cfg = PSPLossConfig(id_lambda=0.0, lpips_lambda=0.0, l2_lambda=1.0,
                        style_lambda=0.0, cx_lambda=0.0, w_norm_lambda=0.01,
                        start_from_latent_avg=True)
    nets = {}
    base_tx = adam_injected(1e-4)

    rngs = [np.random.RandomState(10 + i) for i in range(4)]
    batches = [{
        "src_img": jnp.asarray(r.rand(1, 256, 256, 3) * 2 - 1, jnp.float32),
        "gt_img": jnp.asarray(r.rand(1, 256, 256, 3) * 2 - 1, jnp.float32),
        "ref_img": jnp.asarray(r.rand(1, 256, 256, 3) * 2 - 1, jnp.float32),
        "mask": jnp.asarray(r.rand(1, 256, 256) > 0.5, jnp.float32),
    } for r in rngs]

    mstate = ModuleState.from_variables(variables)
    tx = partitioned_tx(base_tx, mstate.params, train_decoder=False)

    def fresh_state():
        ms = ModuleState.from_variables(variables)
        return TrainState(step=jnp.zeros([], jnp.int32), model=ms,
                          opt_state=tx.init(ms.params), rng=KEY)

    step = jax.jit(make_psp_train_step(model, tx, cfg, nets, use_ref=True,
                                       randomize_noise=False))

    cont = fresh_state()
    for b in batches:
        cont, _ = step(cont, b)

    inter = fresh_state()
    for b in batches[:2]:
        inter, _ = step(inter, b)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    ckpt.save_state(run_dir, "G", 1, {"state": jax.device_get(inter)})
    restored = ckpt.restore_state(
        run_dir / "G_checkpoint_epoch1",
        {"state": jax.device_get(fresh_state())})["state"]
    for b in batches[2:]:
        restored, _ = step(restored, b)

    assert int(restored.step) == int(cont.step) == 4
    _assert_trees_equal(cont.model.params, restored.model.params,
                        "pSp params diverged after resume")
    _assert_trees_equal(cont.opt_state, restored.opt_state, "pSp opt state")
    np.testing.assert_array_equal(np.asarray(cont.rng),
                                  np.asarray(restored.rng), "rng")
