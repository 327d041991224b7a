"""Stack A model tests: UNet/MaskDetector, PICNet networks, ReferenceFill."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.models.drn import drn_c_42
from face_mask_inpaint_tpu.models.picnet import (
    define_d,
    define_e,
    define_g,
    sample_z,
)
from face_mask_inpaint_tpu.models.reference_fill import ReferenceFill
from face_mask_inpaint_tpu.models.unet import MaskDetector, UNet

KEY = jax.random.PRNGKey(0)

ENC = dict(type="pluralistic", ngf=8, z_nc=16, img_f=32, L=1, layers=3,
           norm="none", activation="LeakyReLU", init_type="orthogonal")
DEC = dict(ngf=16, z_nc=16, img_f=64, L=0, layers=3, norm="instance",
           activation="LeakyReLU", init_type="orthogonal")


def test_unet_shapes_and_odd_sizes():
    model = UNet(2, bilinear=True)
    x = jnp.zeros((1, 54, 44, 3))  # odd CelebA-scaled size exercises skip pad
    vs = model.init(KEY, x, train=False)
    y = model.apply(vs, x, train=False)
    assert y.shape == (1, 54, 44, 2)


def test_mask_detector_modes():
    model = MaskDetector()
    x = jnp.zeros((2, 32, 32, 3))
    vs = model.init(KEY, x)
    logits = model.apply(vs, x, mode="train")
    assert logits.shape == (2, 32, 32, 2)
    thresh = model.apply(vs, x, mode="eval")
    assert thresh.dtype == jnp.bool_
    mask = model.apply(vs, x, method=MaskDetector.predict_mask)
    assert mask.shape == (2, 32, 32) and mask.dtype == jnp.float32


def test_unet_packed_execution_matches_dense(monkeypatch):
    """UNet pack=2 (space-to-depth 256²-stage execution, opt-in
    FMI_PACKED_UNET=1) == dense — logits, predict_mask, and train-mode
    batch stats. Kept opt-in: measured slower on v5e (models/unet.py)."""
    from face_mask_inpaint_tpu.ops.packed import depth_to_space

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 32, 32, 3), jnp.float32)
    det = MaskDetector()
    vs = det.init(KEY, x)
    dense_logits = det.apply(vs, x)
    packed_logits = det.apply(vs, x, pack=2)
    np.testing.assert_allclose(
        np.asarray(depth_to_space(packed_logits, 2)),
        np.asarray(dense_logits), atol=1e-5)

    monkeypatch.setenv("FMI_PACKED_UNET", "1")
    m_packed = det.apply(vs, x, method=MaskDetector.predict_mask)
    monkeypatch.setenv("FMI_PACKED_UNET", "0")
    m_dense = det.apply(vs, x, method=MaskDetector.predict_mask)
    assert m_packed.shape == (2, 32, 32)
    np.testing.assert_array_equal(np.asarray(m_packed), np.asarray(m_dense))

    _, mut_p = det.apply(vs, x, pack=2, train=True, mutable=["batch_stats"])
    _, mut_d = det.apply(vs, x, train=True, mutable=["batch_stats"])
    for a, b in zip(jax.tree.leaves(mut_p), jax.tree.leaves(mut_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_res_encoder_prior_vs_posterior():
    enc_args = {k: v for k, v in ENC.items() if k != "type"}
    src_e = define_e(**enc_args, encoder_type="src")
    ref_e = define_e(**enc_args, encoder_type="ref")
    x = jnp.zeros((2, 32, 32, 3))
    vs, vr = src_e.init(KEY, x), ref_e.init(KEY, x)
    (mu, std), feat = src_e.apply(vs, x, mutable=["spectral"])[0]
    assert mu.shape == std.shape == (2, 8, 8, 16)
    assert feat.shape == (2, 8, 8, 32)  # ngf * min(2^2, img_f/ngf)
    assert np.all(np.asarray(std) > 0)  # softplus
    assert "infer_prior0" in vs["params"] and "prior" in vs["params"]
    assert "posterior" in vr["params"] and "infer_prior0" not in vr["params"]


def test_generator_z_and_attention_path():
    g = define_g(ngf=16, z_nc=16, img_f=64, L=0, layers=3, norm="instance",
                 activation="LeakyReLU", use_attn=True)
    encoded = jnp.zeros((2, 4, 4, 64))
    z = jnp.zeros((2, 4, 4, 32))
    vs = g.init({"params": KEY}, encoded, z=z)
    out = g.apply(vs, encoded, z=z, mutable=["spectral"])[0]
    assert out.shape == (2, 32, 32, 3)  # 3 upsampling blocks: 4 -> 32
    assert np.all(np.abs(np.asarray(out)) <= 1.0)  # tanh head
    assert "attn1" in vs["params"]


def test_discriminator_patch_map():
    d = define_d(ndf=8, img_f=32, layers=4, model_type="ResDis")
    x = jnp.zeros((2, 64, 64, 3))
    vs = d.init(KEY, x)
    y = d.apply(vs, x, mutable=["spectral"])[0]
    # 64 -> stem/2 -> 3 downs -> 4, conv k3 valid -> 2
    assert y.shape == (2, 2, 2, 1)
    assert "attn2" in vs["params"]


def test_patch_discriminator():
    d = define_d(ndf=8, img_f=32, layers=3, model_type="PatchDis", norm="batch")
    x = jnp.zeros((2, 64, 64, 3))
    vs = d.init(KEY, x)
    y = d.apply(vs, x, mutable=["spectral"])[0]
    assert y.shape[-1] == 1 and y.ndim == 4


def test_sample_z_reparameterization():
    mu = jnp.ones((2, 4, 4, 8)) * 3.0
    std = jnp.ones((2, 4, 4, 8)) * 0.0
    z = sample_z((mu, std), (mu * 2, std), jax.random.PRNGKey(1))
    assert z.shape == (2, 4, 4, 16)
    np.testing.assert_allclose(np.asarray(z[..., :8]), 3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z[..., 8:]), 6.0, rtol=1e-6)
    zq = sample_z((mu, std), (mu * 2, std), jax.random.PRNGKey(1), return_zq=True)
    assert zq.shape == (2, 4, 4, 8)


@pytest.mark.parametrize("use_att", [True, False])
def test_reference_fill_pluralistic(use_att):
    dec = dict(DEC) if use_att else dict(DEC, ngf=8, img_f=32)
    m = ReferenceFill(encoder_params=ENC, decoder_params=dec, use_att=use_att,
                      out_size=(32, 32))
    src = jnp.zeros((2, 64, 64, 3))
    ref = jnp.zeros((2, 64, 64, 3))
    mask = jnp.zeros((2, 64, 64))
    vs = m.init({"params": KEY, "sample": KEY}, src, ref, mask)
    out = m.apply(vs, src, ref, mask, rngs={"sample": KEY}, mutable=["spectral"])[0]
    assert out.shape == (2, 32, 32, 3)


def test_reference_fill_drn_and_no_prior():
    m = ReferenceFill(encoder_params=dict(type="drn", img_f=32),
                      decoder_params=DEC, use_att=True, out_size=(32, 32))
    src = jnp.zeros((1, 64, 64, 3))
    mask = jnp.zeros((1, 64, 64))
    vs = m.init({"params": KEY}, src, src, mask, train=False)
    out = m.apply(vs, src, src, mask, train=False, mutable=["spectral"])[0]
    assert out.shape == (1, 32, 32, 3)
    # no_prior resizes to the CelebA aligned size 218x178 (model.py:108-110)
    out2 = m.apply(vs, src, src, mask, no_prior=True, train=False,
                   mutable=["spectral"])[0]
    assert out2.shape == (1, 218, 178, 3)


def test_drn_c42_stride_8():
    m = drn_c_42(head_features=16)
    x = jnp.zeros((1, 64, 64, 3))
    vs = m.init(KEY, x, train=False)
    y = m.apply(vs, x, train=False)
    assert y.shape == (1, 8, 8, 16)


def test_unet_diff_head_matches_two_logit(monkeypatch):
    """FMI_UNET_DIFF_HEAD: the one-channel decision head (logits[1]-logits[0]
    as a channel reduce, same outc params) must agree with the two-logit
    compare (exact in f32 away from ties; random data has none)."""
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(2, 32, 32, 3), jnp.float32)
    det = MaskDetector()
    vs = det.init(KEY, x)
    d = det.apply(vs, x, diff_head=True)
    logits = det.apply(vs, x)
    assert d.shape == (2, 32, 32)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(logits[..., 1] - logits[..., 0]),
        rtol=1e-4, atol=1e-5)
    monkeypatch.setenv("FMI_UNET_DIFF_HEAD", "1")
    m_diff = det.apply(vs, x, method=MaskDetector.predict_mask)
    monkeypatch.setenv("FMI_UNET_DIFF_HEAD", "0")
    m_two = det.apply(vs, x, method=MaskDetector.predict_mask)
    assert float(jnp.mean(m_diff == m_two)) > 0.999
