"""GAN-step semantic guarantees: detach points, loss arithmetic, freeze
behavior — the places SURVEY.md §7 flags as 'easy to silently get wrong'."""

import numpy as np

import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.losses.gan import cal_gradient_penalty, gan_loss
from face_mask_inpaint_tpu.losses.vgg import VGG16Features, vgg_loss
from face_mask_inpaint_tpu.models.picnet import define_d
from face_mask_inpaint_tpu.models.reference_fill import ReferenceFill
from face_mask_inpaint_tpu.train.gan import LAMBDA_CX, LAMBDA_PERC, LAMBDA_STYLE, gan_losses
from face_mask_inpaint_tpu.train.state import ModuleState

KEY = jax.random.PRNGKey(0)

ENC = dict(type="pluralistic", ngf=4, z_nc=8, img_f=16, L=1, layers=3,
           norm="none", activation="LeakyReLU", init_type="normal")
DEC = dict(ngf=8, z_nc=8, img_f=32, L=0, layers=3, norm="instance",
           activation="LeakyReLU", init_type="normal")


def _setup(hw=32):
    rng = np.random.RandomState(0)
    batch = {
        "src_img": jnp.asarray(rng.rand(2, hw, hw, 3), jnp.float32),
        "gt_img": jnp.asarray(rng.rand(2, hw, hw, 3), jnp.float32),
        "ref_img": jnp.asarray(rng.rand(2, hw, hw, 3), jnp.float32),
        "mask": jnp.asarray(rng.rand(2, hw, hw) > 0.5, jnp.float32),
    }
    gen = ReferenceFill(encoder_params=ENC, decoder_params=DEC, use_att=True,
                        out_size=(hw, hw))
    disc = define_d(ndf=4, img_f=16, layers=3, init_type="normal")
    g_vars = gen.init({"params": KEY, "sample": KEY}, batch["src_img"],
                      batch["ref_img"], batch["mask"])
    d_vars = disc.init(KEY, batch["gt_img"])
    vgg = VGG16Features().init(KEY, batch["gt_img"])["params"]
    return gen, disc, g_vars, d_vars, vgg, batch


def test_g_loss_decomposition_matches_reference_schedule():
    """G total == lsgan(D(fake))*λ_g + L1 + 0.1*perc + 250*style + 1*cx
    (loss.py:79-82, 109-125)."""
    gen, disc, g_vars, d_vars, vgg, batch = _setup()
    g_total, aux = gan_losses(
        gen, disc, ModuleState.from_variables(g_vars),
        ModuleState.from_variables(d_vars), vgg, batch, KEY,
        lambda_g=0.01, train=False,
    )
    recomposed = (aux["loss_ad_g"] + aux["loss_l1_g"] + aux["perc_loss"]
                  + aux["style_loss"] + aux["cx_loss"])
    np.testing.assert_allclose(float(g_total), float(recomposed), rtol=1e-6)

    gen_img = aux["gen"]
    d_fake = disc.apply(d_vars, gen_img, train=False)
    np.testing.assert_allclose(
        float(aux["loss_ad_g"]),
        float(gan_loss(d_fake, True, False, "lsgan")) * 0.01, rtol=1e-4)
    np.testing.assert_allclose(
        float(aux["loss_l1_g"]),
        float(jnp.mean(jnp.abs(gen_img - batch["gt_img"]))), rtol=1e-5)
    m = batch["mask"][..., None]
    np.testing.assert_allclose(
        float(aux["style_loss"]),
        float(vgg_loss(vgg, gen_img * (1 - m), batch["src_img"], "style")) * LAMBDA_STYLE,
        rtol=1e-4)
    np.testing.assert_allclose(
        float(aux["perc_loss"]),
        float(vgg_loss(vgg, gen_img, batch["gt_img"], "perceptual")) * LAMBDA_PERC,
        rtol=1e-4)
    np.testing.assert_allclose(
        float(aux["cx_loss"]),
        float(vgg_loss(vgg, gen_img * m, batch["ref_img"] * m, "contextual")) * LAMBDA_CX,
        rtol=1e-4)


def test_batched_vgg_losses_match_separate_calls_and_grads():
    """gan_vgg_losses (two 3N-batched trunk passes) == three separate
    vgg_loss calls — values AND gradients w.r.t. the generated image."""
    from face_mask_inpaint_tpu.losses.vgg import gan_vgg_losses

    rng = np.random.RandomState(1)
    hw = 32
    gen_img = jnp.asarray(rng.rand(2, hw, hw, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(2, hw, hw, 3), jnp.float32)
    src = jnp.asarray(rng.rand(2, hw, hw, 3), jnp.float32)
    ref = jnp.asarray(rng.rand(2, hw, hw, 3), jnp.float32)
    mask = jnp.asarray(rng.rand(2, hw, hw) > 0.5, jnp.float32)
    vgg = VGG16Features().init(KEY, gt)["params"]
    m = mask[..., None]

    def separate(g):
        return (vgg_loss(vgg, g, gt, "perceptual"),
                vgg_loss(vgg, g * (1 - m), src, "style"),
                vgg_loss(vgg, g * m, ref * m, "contextual"))

    def batched(g):
        return gan_vgg_losses(vgg, g, gt, src, ref, mask)

    for a, b in zip(separate(gen_img), batched(gen_img)):
        np.testing.assert_allclose(float(a), float(b), rtol=2e-5)
    g1 = jax.grad(lambda g: sum(separate(g)))(gen_img)
    g2 = jax.grad(lambda g: sum(batched(g)))(gen_img)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6,
                               rtol=2e-4)


def test_g_gradients_do_not_depend_on_d_grad_path():
    """The G step treats D as a constant (the functional _freeze): grads of
    the G loss w.r.t. G params must be computable and nonzero while D params
    receive none (they are not differentiated at all)."""
    gen, disc, g_vars, d_vars, vgg, batch = _setup()
    g_state = ModuleState.from_variables(g_vars)
    d_state = ModuleState.from_variables(d_vars)

    def g_loss(params):
        total, _ = gan_losses(gen, disc, g_state.replace(params=params),
                              d_state, vgg, batch, KEY, train=False)
        return total

    grads = jax.grad(g_loss)(g_state.params)
    assert max(jax.tree.leaves(jax.tree.map(
        lambda g: float(np.abs(np.asarray(g)).max()), grads))) > 0


def test_d_loss_detaches_generator():
    """D loss uses stop_gradient(gen): gradients w.r.t. G params are zero."""
    gen, disc, g_vars, d_vars, vgg, batch = _setup()

    def d_loss(g_params):
        gen_img = gen.apply(
            {**g_vars, "params": g_params}, batch["src_img"], batch["ref_img"],
            batch["mask"], train=False, rngs={"sample": KEY})
        gen_img = jax.lax.stop_gradient(gen_img)
        d_fake = disc.apply(d_vars, gen_img, train=False)
        d_real = disc.apply(d_vars, batch["gt_img"], train=False)
        return 0.5 * (gan_loss(d_real, True, True) + gan_loss(d_fake, False, True))

    grads = jax.grad(d_loss)(g_vars["params"])
    assert max(jax.tree.leaves(jax.tree.map(
        lambda g: float(np.abs(np.asarray(g)).max()), grads))) == 0.0


def test_gradient_penalty_wgangp():
    disc = define_d(ndf=4, img_f=16, layers=3, init_type="normal")
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    d_vars = disc.init(KEY, x)

    def disc_fn(img):
        return disc.apply(d_vars, img, train=False)

    penalty, grads = cal_gradient_penalty(disc_fn, x, x + 0.1, KEY)
    assert np.isfinite(float(penalty)) and float(penalty) >= 0
    assert grads.shape == x.shape
    p0, g0 = cal_gradient_penalty(disc_fn, x, x, KEY, lambda_gp=0.0)
    assert p0 == 0.0 and g0 is None


def test_contextual_loss_robust_to_cos_overshoot_and_zero_vectors():
    """TPU regression (round 3): the MXU's bf16 f32-matmul error can push
    cos(x_i, y_j) above 1, so d_min + 1e-5 in the reference recipe
    (external_function.py:263-268) goes negative and the exp blows up to
    inf/inf = NaN; a fully-masked region can also yield an exactly-zero
    feature vector (0/0 under the unguarded normalize). Both must stay
    finite with usable gradients."""
    from face_mask_inpaint_tpu.losses.vgg import contextual_loss

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 4, 4, 8), jnp.float32)
    # identical tensors -> diagonal cos == 1 exactly (d_min == 0 boundary)
    v = float(contextual_loss(x, x))
    assert np.isfinite(v)
    # a zero feature vector in BOTH inputs (norm == 0 -> guarded divide)
    xz = x.at[0, 0, 0].set(0.0)
    yz = (x * 1.3).at[0, 0, 0].set(0.0)
    v = float(contextual_loss(xz, yz))
    assert np.isfinite(v)
    g = jax.grad(lambda a: contextual_loss(a, yz))(xz)
    assert np.all(np.isfinite(np.asarray(g)))

    # simulate the TPU matmul overshoot: monkeypatch-free check that the
    # d >= 0 clamp kills the inf path even when cos > 1 by feeding the
    # post-normalize math directly through a scaled input whose self-cos
    # rounds above 1 in float32
    big = jnp.asarray(rs.randn(1, 2, 2, 4).astype(np.float32) * 3e3)
    v = float(contextual_loss(big, big * (1.0 + 1e-7)))
    assert np.isfinite(v)
