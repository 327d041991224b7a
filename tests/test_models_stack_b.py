"""Stack B model tests: StyleGAN2 generator/discriminator, modulated conv
equivalence, pSp encoders, composite PSP, and the pSp loss."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.losses.lpips import LPIPSNet
from face_mask_inpaint_tpu.losses.psp_loss import PSPLossConfig, psp_loss
from face_mask_inpaint_tpu.losses.vgg import VGG16Features
from face_mask_inpaint_tpu.models.irse import (
    Backbone,
    BackboneEncoderUsingLastLayerIntoWPlus,
    GradualStyleEncoder,
    get_blocks,
)
from face_mask_inpaint_tpu.models.psp import PSP
from face_mask_inpaint_tpu.models.stylegan2 import (
    Discriminator,
    EqualLinear,
    Generator,
    ModulatedConv2d,
)

KEY = jax.random.PRNGKey(0)


def test_modulated_conv_matches_torch_grouped_form():
    """Our scale-input/scale-output refactor must equal the reference's
    per-sample grouped-weight convolution (stylegan2/model.py:241-279)."""
    rng = np.random.RandomState(0)
    n, cin, cout, k, hw = 3, 8, 12, 3, 7
    x = rng.randn(n, hw, hw, cin).astype(np.float32)
    style = rng.randn(n, 16).astype(np.float32)

    mod = ModulatedConv2d(cout, k, demodulate=True)
    vs = mod.init(KEY, jnp.asarray(x), jnp.asarray(style))
    ours = mod.apply(vs, jnp.asarray(x), jnp.asarray(style))

    # torch reference computation with the same weights
    w_hwio = np.asarray(vs["params"]["weight"])  # [k,k,in,out]
    w_t = torch.from_numpy(w_hwio.transpose(3, 2, 0, 1))[None]  # [1,out,in,k,k]
    mw = np.asarray(vs["params"]["modulation"]["weight"])  # [16, cin]
    mb = np.asarray(vs["params"]["modulation"]["bias"])
    s_t = torch.from_numpy(style) @ torch.from_numpy(mw) * (1 / np.sqrt(16)) + torch.from_numpy(mb)
    scale = 1 / np.sqrt(cin * k * k)
    weight = scale * w_t * s_t.view(n, 1, cin, 1, 1)
    demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
    weight = weight * demod.view(n, cout, 1, 1, 1)
    weight = weight.reshape(n * cout, cin, k, k)
    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2)).reshape(1, n * cin, hw, hw)
    out_t = F.conv2d(x_t, weight, padding=k // 2, groups=n)
    out_t = out_t.view(n, cout, hw, hw).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), out_t, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("size", [64])
def test_generator_shapes_and_determinism(size):
    g = Generator(size=size, style_dim=64, n_mlp=2)
    z = jax.random.normal(KEY, (2, 64))
    vs = g.init({"params": KEY, "noise": KEY}, [z])
    img, _ = g.apply(vs, [z], randomize_noise=False)
    assert img.shape == (2, size, size, 3)
    # fixed noise buffers -> deterministic
    img2, _ = g.apply(vs, [z], randomize_noise=False)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2))
    # randomize_noise draws fresh noise. NoiseInjection weights start at 0
    # (model.py:287) so noise is inert at init — set them to 1 first.
    import flax.traverse_util as tu
    flat = tu.flatten_dict(vs["params"])
    flat = {k: (jnp.ones_like(v) if "noise" in k and k[-1] == "weight" else v)
            for k, v in flat.items()}
    vs_noisy = {**vs, "params": tu.unflatten_dict(flat)}
    base, _ = g.apply(vs_noisy, [z], randomize_noise=False)
    img3, _ = g.apply(vs_noisy, [z], randomize_noise=True,
                      rngs={"noise": jax.random.PRNGKey(7)})
    assert np.abs(np.asarray(img3) - np.asarray(base)).max() > 0

    # w-latent input path with [N, n_latent, D] codes (the pSp route)
    codes = jnp.tile(g.apply(vs, z, method=Generator.map_style)[:, None, :], (1, g.n_latent, 1))
    img4, latent = g.apply(vs, [codes], input_is_latent=True, return_latents=True,
                           randomize_noise=False)
    assert img4.shape == (2, size, size, 3)
    assert latent.shape == (2, g.n_latent, 64)


def test_generator_style_mixing_and_truncation():
    g = Generator(size=32, style_dim=32, n_mlp=1)
    z1 = jax.random.normal(KEY, (1, 32))
    z2 = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    vs = g.init({"params": KEY, "noise": KEY}, [z1])
    mixed, latent = g.apply(vs, [z1, z2], inject_index=3, return_latents=True,
                            randomize_noise=False)
    assert latent.shape[1] == g.n_latent
    # first 3 latents from z1, rest from z2
    w1 = g.apply(vs, z1, method=Generator.map_style)
    w2 = g.apply(vs, z2, method=Generator.map_style)
    np.testing.assert_allclose(np.asarray(latent[:, 0]), np.asarray(w1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(latent[:, 3]), np.asarray(w2), rtol=1e-5)

    trunc_target = g.apply(vs, KEY, 64, method=Generator.mean_latent)
    _, lat_t = g.apply(vs, [z1], truncation=0.5, truncation_latent=trunc_target,
                       return_latents=True, randomize_noise=False)
    expected = trunc_target + 0.5 * (w1 - trunc_target)
    np.testing.assert_allclose(np.asarray(lat_t[:, 0]), np.asarray(expected), rtol=1e-4)


def test_discriminator_shapes():
    d = Discriminator(size=64)
    x = jax.random.normal(KEY, (4, 64, 64, 3))
    vs = d.init(KEY, x)
    y = d.apply(vs, x)
    assert y.shape == (4, 1)


def test_equal_linear_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 8).astype(np.float32)
    layer = EqualLinear(16, lr_mul=0.01, activation="fused_lrelu")
    vs = layer.init(KEY, jnp.asarray(x))
    ours = layer.apply(vs, jnp.asarray(x))
    w = np.asarray(vs["params"]["weight"])  # [in, out], stored /lr_mul
    b = np.asarray(vs["params"]["bias"])
    scale = (1 / np.sqrt(8)) * 0.01
    lin = torch.from_numpy(x) @ torch.from_numpy((w * scale).astype(np.float32))
    out_t = F.leaky_relu(lin + torch.from_numpy((b * 0.01).astype(np.float32)), 0.2) * np.float32(np.sqrt(2))
    np.testing.assert_allclose(np.asarray(ours), out_t.numpy(), rtol=1e-4, atol=1e-6)


def test_irse_block_spec_counts():
    blocks = get_blocks(50)
    assert sum(len(b) for b in blocks) == 24  # body indices 0..23
    # taps at 6/20/23 must land on channel 128/256/512 boundaries
    flat = [s for b in blocks for s in b]
    assert flat[6].depth == 128 and flat[20].depth == 256 and flat[23].depth == 512


@pytest.mark.parametrize("use_ref,use_attention", [(False, False), (True, False), (True, True)])
def test_gradual_style_encoder(use_ref, use_attention):
    enc = GradualStyleEncoder(50, "ir_se", n_styles=10, use_attention=use_attention)
    x = jax.random.normal(KEY, (1, 64, 64, 3))
    ref = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)) if use_ref else None
    mask = jnp.ones((1, 64, 64)) * 0.5 if use_ref else None
    vs = enc.init(KEY, x, ref=ref, mask=mask, train=False)
    out = enc.apply(vs, x, ref=ref, mask=mask, train=False)
    assert out.shape == (1, 10, 512)
    if use_attention:
        assert "attention1" in vs["params"]


def test_backbone_wplus_encoder_and_arcface():
    enc = BackboneEncoderUsingLastLayerIntoWPlus(50, "ir_se", n_styles=8)
    x = jax.random.normal(KEY, (1, 64, 64, 3))
    vs = enc.init(KEY, x, train=False)
    out = enc.apply(vs, x, train=False)
    assert out.shape == (1, 8, 512)

    face = Backbone(input_size=112, num_layers=50, mode="ir_se")
    xf = jax.random.normal(KEY, (2, 112, 112, 3))
    vf = face.init(KEY, xf, train=False)
    emb = face.apply(vf, xf, train=False)
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-5)


def test_psp_composite_and_loss():
    model = PSP(output_size=64, start_from_latent_avg=True, use_attention=True)
    x = jax.random.normal(KEY, (1, 64, 64, 3))
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64)) > 0.5).astype(jnp.float32)
    vs = model.init({"params": KEY, "noise": KEY}, x, ref=x, src_mask=mask, train=False)
    assert "latent_avg" in vs and "noises" in vs
    out, latent = model.apply(
        vs, x, ref=x, src_mask=mask, return_latents=True, randomize_noise=False,
        train=False,
    )
    assert out.shape == (1, 256, 256, 3)  # face_pool resizes to 256
    assert latent.shape == (1, model.n_styles, 512)

    # pSp loss with random sub-net weights (no pretrained downloads here)
    lp = LPIPSNet("alex").init(KEY, out, out)["params"]
    vgg = VGG16Features().init(KEY, out)["params"]
    cfg = PSPLossConfig(id_lambda=0.0, lpips_lambda=0.8, l2_lambda=1.0,
                        style_lambda=250.0, cx_lambda=1.0, l2_lambda_ref=0.5,
                        w_norm_lambda=0.01, start_from_latent_avg=True)
    y = jax.random.normal(jax.random.PRNGKey(3), (1, 256, 256, 3))
    mask256 = (jax.random.uniform(jax.random.PRNGKey(4), (1, 256, 256)) > 0.5).astype(jnp.float32)
    loss, loss_dict, _ = psp_loss(
        cfg, {"lpips": lp, "vgg": vgg},
        x=y, y=y, y_hat=out, latent=latent,
        latent_avg=vs["latent_avg"]["value"], ref=y, mask=mask256,
    )
    assert np.isfinite(float(loss))
    # style/context computed but NOT included in the total
    included = (loss_dict["loss_l2"] * 1.0 + loss_dict["loss_lpips"] * 0.8 +
                loss_dict["loss_l2_ref"] * 0.5 + loss_dict["loss_w_norm"] * 0.01)
    np.testing.assert_allclose(float(loss), float(included), rtol=1e-5)
    assert "loss_style" in loss_dict and "loss_context" in loss_dict


def test_stacked_style_heads_match_unrolled_blocks():
    """The production _stacked_styles lax.scan (irse.py) must be numerically
    identical, head for head, to running each GradualStyleBlock's plain
    unrolled forward with the same params — pins the weight-stacking order
    and the leaky_relu(0.01) slope (ADVICE r2)."""
    from face_mask_inpaint_tpu.models.irse import GradualStyleBlock

    # 1 coarse head @16 and 2 middle heads @32: exercises both a singleton
    # and a multi-head stack (ordering-sensitive)
    enc = GradualStyleEncoder(n_styles=4, coarse_ind=1, middle_ind=3)
    x16 = jax.random.normal(KEY, (2, 16, 16, 512))
    x32 = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 512))

    v0 = enc.init(KEY, 0, x16, method=GradualStyleEncoder.styles_level)
    v1 = enc.init(jax.random.PRNGKey(7), 1, x32,
                  method=GradualStyleEncoder.styles_level)

    out0 = enc.apply(v0, 0, x16, method=GradualStyleEncoder.styles_level)
    out1 = enc.apply(v1, 1, x32, method=GradualStyleEncoder.styles_level)
    assert out0.shape == (2, 1, 512) and out1.shape == (2, 2, 512)

    blk16 = GradualStyleBlock(512, 16)
    ref0 = blk16.apply({"params": v0["params"]["styles_0"]}, x16)
    np.testing.assert_allclose(np.asarray(out0[:, 0]), np.asarray(ref0),
                               rtol=1e-5, atol=1e-5)

    blk32 = GradualStyleBlock(512, 32)
    for g, j in enumerate((1, 2)):
        refj = blk32.apply({"params": v1["params"][f"styles_{j}"]}, x32)
        np.testing.assert_allclose(np.asarray(out1[:, g]), np.asarray(refj),
                                   rtol=1e-5, atol=1e-5)


def test_packed_synthesis_matches_unpacked(monkeypatch):
    """The space-to-depth packed execution of the high-res synthesis tail
    (Generator loop + ops/packed.py stencils: fused convT+blur upsample,
    packed 3x3/1x1 modulated convs, packed skip upsample, per-slot noise)
    must be numerically identical to the unpacked pipeline — with fixed
    noise buffers AND with randomize_noise drawing from the same rng
    stream. Forced onto the packed path via FMI_PACKED_SYNTH_MAX_CH."""
    import flax.traverse_util as tu

    gen = Generator(size=64, style_dim=64, n_mlp=2, channel_multiplier=1)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    vs = gen.init({"params": KEY, "noise": KEY}, [z], randomize_noise=False)
    # nonzero noise weights so the per-slot noise path actually matters
    flat = tu.flatten_dict(vs)
    for k in list(flat):
        if k[-2:] == ("noise", "weight"):
            flat[k] = jnp.full_like(flat[k], 0.7)
    vs = tu.unflatten_dict(flat)

    def run(randomize):
        rngs = {"noise": jax.random.PRNGKey(7)} if randomize else None
        return gen.apply(vs, [z], randomize_noise=randomize, rngs=rngs)[0]

    monkeypatch.setenv("FMI_PACKED_SYNTH", "0")
    ref_fixed, ref_rand = run(False), run(True)
    monkeypatch.setenv("FMI_PACKED_SYNTH", "1")
    monkeypatch.setenv("FMI_PACKED_SYNTH_MAX_CH", "10000")  # every stage
    got_fixed, got_rand = run(False), run(True)

    np.testing.assert_allclose(np.asarray(got_fixed), np.asarray(ref_fixed),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_rand), np.asarray(ref_rand),
                               rtol=1e-4, atol=1e-4)


def test_packed_synthesis_gradients_match(monkeypatch):
    """Same check under grad (train_decoder finetunes through the packed
    kernels): d(sum image)/d(params) must agree packed vs unpacked."""
    gen = Generator(size=32, style_dim=32, n_mlp=1, channel_multiplier=1)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    vs = gen.init({"params": KEY, "noise": KEY}, [z], randomize_noise=False)

    def loss(params):
        img, _ = gen.apply({**vs, "params": params}, [z],
                           randomize_noise=False)
        return jnp.sum(img ** 2)

    monkeypatch.setenv("FMI_PACKED_SYNTH", "0")
    g_ref = jax.grad(loss)(vs["params"])
    monkeypatch.setenv("FMI_PACKED_SYNTH", "1")
    monkeypatch.setenv("FMI_PACKED_SYNTH_MAX_CH", "10000")
    g_got = jax.grad(loss)(vs["params"])

    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_got = jax.tree_util.tree_leaves(g_got)
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


def test_depth_to_space_conv_path_matches_reshape():
    """depth_to_space's small-channel dilated-conv path (c <= 8) must equal
    the reshape/transpose form, including under grad."""
    from face_mask_inpaint_tpu.ops.packed import depth_to_space, space_to_depth

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 12), jnp.float32)  # c = 3, r = 2

    def ref(y):  # force the reshape path by splitting channels
        n, hp, wp, cc = y.shape
        y6 = y.reshape(n, hp, wp, 2, 2, 3).transpose(0, 1, 3, 2, 4, 5)
        return y6.reshape(n, hp * 2, wp * 2, 3)

    np.testing.assert_allclose(np.asarray(depth_to_space(x, 2)),
                               np.asarray(ref(x)), rtol=1e-6, atol=1e-6)
    g1 = jax.grad(lambda y: jnp.sum(jnp.sin(depth_to_space(y, 2))))(x)
    g2 = jax.grad(lambda y: jnp.sum(jnp.sin(ref(y))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)
    # roundtrip
    np.testing.assert_allclose(
        np.asarray(space_to_depth(depth_to_space(x, 2), 2)), np.asarray(x),
        rtol=0, atol=0)
