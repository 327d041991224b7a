"""Packed (space-to-depth) execution parity.

The decoder tail runs 512²/1024² stages on a 256² block grid with packed
channels (ops/packed.py); these tests pin the packed ops and the packed
ResGenerator/Output paths to the plain NHWC formulations — same params, same
math (reference semantics: network.py:247-273, base_function.py:308-398,
modules/model.py:79).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_mask_inpaint_tpu.models.picnet import define_g
from face_mask_inpaint_tpu.models.reference_fill import ReferenceFill
from face_mask_inpaint_tpu.ops import packed as P
from face_mask_inpaint_tpu.ops.conv import conv2d, conv_transpose2d
from face_mask_inpaint_tpu.ops.resize import adaptive_avg_pool2d, reflection_pad2d


@pytest.fixture(scope="module")
def rs():
    return np.random.RandomState(0)


def test_space_to_depth_roundtrip(rs):
    x = jnp.asarray(rs.randn(2, 16, 16, 6), jnp.float32)
    for r in (2, 4):
        assert jnp.allclose(P.depth_to_space(P.space_to_depth(x, r), r), x)


@pytest.mark.parametrize("r", [2, 4])
@pytest.mark.parametrize("ks", [1, 3])
def test_packed_conv_same(rs, r, ks):
    x = jnp.asarray(rs.randn(2, 16, 16, 6), jnp.float32)
    w = jnp.asarray(rs.randn(ks, ks, 6, 5) * 0.3, jnp.float32)
    b = jnp.asarray(rs.randn(5), jnp.float32)
    ref = conv2d(x, w, b, padding=ks // 2)
    got = P.depth_to_space(P.packed_conv3x3(P.space_to_depth(x, r), w, b, r), r)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("r_in", [1, 2])
def test_packed_conv_transpose(rs, r_in):
    x = jnp.asarray(rs.randn(2, 16, 16, 6), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 6, 5) * 0.3, jnp.float32)
    b = jnp.asarray(rs.randn(5), jnp.float32)
    ref = conv_transpose2d(x, w, b, stride=2, padding=1, output_padding=1)
    xin = P.space_to_depth(x, r_in) if r_in > 1 else x
    got = P.depth_to_space(
        P.packed_conv_transpose2x(xin, w, b, r_in), 2 * r_in)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_packed_instance_norm_act(rs):
    from face_mask_inpaint_tpu.ops.pallas.norm_act import (
        instance_norm_act_reference)

    x = jnp.asarray(rs.randn(2, 16, 16, 6), jnp.float32)
    s = jnp.asarray(rs.rand(6) + 0.5, jnp.float32)
    b = jnp.asarray(rs.randn(6), jnp.float32)
    ref = instance_norm_act_reference(x, s, b, "LeakyReLU", 0.1)
    got = P.depth_to_space(
        P.packed_instance_norm_act(P.space_to_depth(x, 4), s, b, 4), 4)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_packed_block_mean_is_adaptive_pool(rs):
    x = jnp.asarray(rs.randn(2, 16, 16, 3), jnp.float32)
    ref = adaptive_avg_pool2d(x, (4, 4))
    got = P.packed_block_mean(P.space_to_depth(x, 4), 4)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def _dec_params():
    return dict(ngf=8, z_nc=8, img_f=32, L=0, layers=3, norm="instance",
                activation="LeakyReLU", init_type="orthogonal")


def test_packed_resgenerator_matches_unpacked(rs):
    key = jax.random.PRNGKey(0)
    f = jnp.asarray(rs.randn(2, 8, 8, 32), jnp.float32)
    z = jnp.asarray(rs.randn(2, 8, 8, 16), jnp.float32)
    g_ref = define_g(**_dec_params(), pack_threshold=10**9)
    g_pk = define_g(**_dec_params(), pack_threshold=16)
    vs = g_ref.init(key, f, z=z, train=False)
    ref = g_ref.apply(vs, f, z=z, train=False)
    got = g_pk.apply(vs, f, z=z, train=False)
    # includes the Output head's reflection-pad border correction
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_packed_fused_pool_matches_pool(rs):
    key = jax.random.PRNGKey(0)
    f = jnp.asarray(rs.randn(2, 8, 8, 32), jnp.float32)
    z = jnp.asarray(rs.randn(2, 8, 8, 16), jnp.float32)
    g_ref = define_g(**_dec_params(), use_attn=False, pack_threshold=10**9)
    g_pk = define_g(**_dec_params(), use_attn=False, pack_threshold=8)
    vs = g_ref.init(key, f, z=z, train=False)
    ref = adaptive_avg_pool2d(g_ref.apply(vs, f, z=z, train=False), (8, 8))
    got = g_pk.apply(vs, f, z=z, train=False, fuse_pool=8)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_packed_gradients_match(rs):
    key = jax.random.PRNGKey(0)
    f = jnp.asarray(rs.randn(2, 8, 8, 32), jnp.float32)
    z = jnp.asarray(rs.randn(2, 8, 8, 16), jnp.float32)
    g_ref = define_g(**_dec_params(), use_attn=False, pack_threshold=10**9)
    g_pk = define_g(**_dec_params(), use_attn=False, pack_threshold=8)
    vs = g_ref.init(key, f, z=z, train=False)

    def loss(params, mod):
        return jnp.sum(mod.apply({**vs, "params": params}, f, z=z,
                                 train=False) ** 2)

    g1 = jax.grad(loss)(vs["params"], g_ref)
    g2 = jax.grad(loss)(vs["params"], g_pk)
    # float-reassociation noise scales with the largest gradient flowing
    # through the graph (conv biases feeding instance norm have ~0 gradient
    # made of cancelling big terms, so per-leaf relative bounds are moot)
    gmax = max(float(jnp.max(jnp.abs(a))) for a in jax.tree.leaves(g1))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(a, b, atol=3e-5 * gmax)


def test_packed_output_reflection_border(rs):
    """The border ring goes through the strip-correction path — compare the
    packed Output head against the explicit reflect-pad conv."""
    from face_mask_inpaint_tpu.nn.blocks import Output

    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rs.randn(2, 16, 16, 8), jnp.float32)
    mod = Output(output_nc=3, kernel_size=3, norm="none",
                 activation="LeakyReLU", use_spect=True)
    vs = mod.init(key, x, train=False)
    ref = mod.apply(vs, x, train=False)
    got = mod.apply(vs, P.space_to_depth(x, 4), train=False, pack_in=4)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    pooled = mod.apply(vs, P.space_to_depth(x, 4), train=False, pack_in=4,
                       fuse_pool=True)
    np.testing.assert_allclose(pooled, adaptive_avg_pool2d(ref, (4, 4)),
                               atol=1e-5)


def test_referencefill_flagship_shape_packed(rs):
    """ReferenceFill with packing engaged end-to-end (threshold 16)."""
    key = jax.random.PRNGKey(0)
    enc = dict(type="pluralistic", ngf=8, z_nc=8, img_f=32, L=1, layers=3,
               norm="none", activation="LeakyReLU", init_type="orthogonal")
    dec = dict(_dec_params(), ngf=16, img_f=64)
    m_ref = ReferenceFill(encoder_params=enc,
                          decoder_params=dict(dec, pack_threshold=10**9),
                          use_att=True, out_size=(16, 16))
    m_pk = ReferenceFill(encoder_params=enc,
                         decoder_params=dict(dec, pack_threshold=16),
                         use_att=True, out_size=(16, 16))
    src = jnp.asarray(rs.rand(2, 16, 16, 3), jnp.float32)
    refi = jnp.asarray(rs.rand(2, 16, 16, 3), jnp.float32)
    mask = jnp.asarray((rs.rand(2, 16, 16) > 0.5), jnp.float32)
    mv = m_ref.init({"params": key, "sample": key}, src, refi, mask,
                    train=False)
    o_ref = m_ref.apply(mv, src, refi, mask, train=False, rngs={"sample": key})
    o_pk = m_pk.apply(mv, src, refi, mask, train=False, rngs={"sample": key})
    assert o_pk.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(o_pk, o_ref, atol=2e-5)


def test_conv_avgpool_fold(rs):
    """avg_pool2d(conv(x), 2) == Conv2d(..., fuse_avgpool2=True) — the
    stride-2 (k+1)² folded kernel (nn/layers.py), even and odd sizes."""
    from face_mask_inpaint_tpu.nn.layers import Conv2d
    from face_mask_inpaint_tpu.ops.resize import avg_pool2d

    key = jax.random.PRNGKey(0)
    for hw in (16, 15):
        for ks, pad in ((3, 1), (1, 0)):
            x = jnp.asarray(rs.randn(2, hw, hw, 6), jnp.float32)
            conv = Conv2d(5, ks, padding=pad)
            vs = conv.init(key, x)
            ref = avg_pool2d(conv.apply(vs, x), 2)
            got = conv.apply(vs, x, fuse_avgpool2=True)
            assert got.shape == ref.shape, (hw, ks)
            np.testing.assert_allclose(got, ref, atol=1e-5)


def test_packed_convt_pair_kernel(rs):
    """The Pallas stencil convT kernel (interpret mode) == the sum of two
    dense packed transposed convs, with and without the fused act."""
    from face_mask_inpaint_tpu.ops.pallas.packed_convt import packed_convt_pair

    for r_in in (1, 2):
        x = jnp.asarray(rs.randn(2, 8, 8, r_in * r_in * 6), jnp.float32)
        h = jnp.asarray(rs.randn(2, 8, 8, r_in * r_in * 4), jnp.float32)
        wx = jnp.asarray(rs.randn(3, 3, 6, 5) * 0.3, jnp.float32)
        wh = jnp.asarray(rs.randn(3, 3, 4, 5) * 0.3, jnp.float32)
        bx = jnp.asarray(rs.randn(5), jnp.float32)
        bh = jnp.asarray(rs.randn(5), jnp.float32)
        ref = (P.packed_conv_transpose2x(x, wx, bx, r_in)
               + P.packed_conv_transpose2x(h, wh, bh, r_in))
        got = packed_convt_pair([(x, wx, bx), (h, wh, bh)], r_in)
        np.testing.assert_allclose(got, ref, atol=1e-4)
        got_act = packed_convt_pair([(x, wx, bx), (h, wh, bh)], r_in,
                                    act="LeakyReLU")
        np.testing.assert_allclose(
            got_act, jnp.where(ref >= 0, ref, 0.1 * ref), atol=1e-4)


def test_packed_resgenerator_with_pallas_convt(rs, monkeypatch):
    """Full packed ResGenerator with the Pallas convT-pair kernel forced on
    (interpret mode) matches the plain unpacked decode — covers the
    ResBlockDecoder fused path, the fuse_act epilogue, and the Output head's
    pre_activated handoff."""
    monkeypatch.setenv("FMI_PACKED_CONVT", "1")
    key = jax.random.PRNGKey(0)
    f = jnp.asarray(rs.randn(2, 8, 8, 32), jnp.float32)
    z = jnp.asarray(rs.randn(2, 8, 8, 16), jnp.float32)
    g_ref = define_g(**_dec_params(), use_attn=False, pack_threshold=10**9)
    g_pk = define_g(**_dec_params(), use_attn=False, pack_threshold=8)
    vs = g_ref.init(key, f, z=z, train=False)
    ref = g_ref.apply(vs, f, z=z, train=False)
    got = g_pk.apply(vs, f, z=z, train=False)
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_packed_output_head_kernel_matches_dense(rs, monkeypatch):
    """The fused Output-head Pallas kernel (pair input: act(h+s) in-VMEM ->
    conv -> tanh -> pool with reflection-ring re-pool) must match both the
    dense packed fallback and the explicit full-resolution reference."""
    from face_mask_inpaint_tpu.nn.blocks import Output

    key = jax.random.PRNGKey(0)
    r, c = 4, 6
    h = jnp.asarray(rs.randn(2, 8, 8, r * r * c), jnp.float32)
    s = jnp.asarray(rs.randn(2, 8, 8, r * r * c), jnp.float32)
    mod = Output(output_nc=3, kernel_size=3, norm="none",
                 activation="LeakyReLU", use_spect=True)

    monkeypatch.setenv("FMI_OUTPUT_KERNEL", "1")
    vs = mod.init(key, (h, s), train=False, pack_in=r, fuse_pool=True)
    out_k = mod.apply(vs, (h, s), train=False, pack_in=r, fuse_pool=True)

    monkeypatch.setenv("FMI_OUTPUT_KERNEL", "0")
    out_d = mod.apply(vs, (h, s), train=False, pack_in=r, fuse_pool=True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_d),
                               atol=2e-5)

    # explicit full-resolution reference: the plain path applies the head's
    # own act -> reflect-pad conv -> tanh; then 4x adaptive pool (same
    # effective spectral-normed weights)
    x_full = P.depth_to_space(h + s, r)
    ref = mod.apply(vs, x_full, train=False)
    np.testing.assert_allclose(np.asarray(out_k),
                               np.asarray(adaptive_avg_pool2d(ref, (8, 8))),
                               atol=2e-5)


def test_packed_conv3x3_half_in(rs):
    """The half-in conv (input 2-packed on the doubled grid, output
    r-packed) == the plain 'same' zero-pad conv, away from the border
    (the border ring is rebuilt separately by the Output head)."""
    r = 4
    x = jnp.asarray(rs.randn(2, 16, 16, 6), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 6, 5) * 0.3, jnp.float32)
    b = jnp.asarray(rs.randn(5), jnp.float32)
    ref = conv2d(x, w, b, padding=1)
    xh = P.space_to_depth(x, 2)  # [N, 8, 8, 4*6]: rh=2 on the doubled grid
    got = P.depth_to_space(P.packed_conv3x3_half_in(xh, w, b, r), r)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_half_tail_matches_full_packed(rs, monkeypatch):
    """The r-capped ('half') decoder tail — ResBlockDecoder(half_output) +
    Output(half_in) — matches both the full-packed and the plain unpacked
    decode, values and gradients (FMI_HALF_TAIL gates the path)."""
    key = jax.random.PRNGKey(0)
    f = jnp.asarray(rs.randn(2, 8, 8, 32), jnp.float32)
    z = jnp.asarray(rs.randn(2, 8, 8, 16), jnp.float32)
    # threshold 16 @ 8x8 input: layer1 packs (r: 1->2), layer2 (last) has
    # pack_in == 2 -> the half path engages
    g_ref = define_g(**_dec_params(), use_attn=False, pack_threshold=10**9)
    g_pk = define_g(**_dec_params(), use_attn=False, pack_threshold=16)
    vs = g_ref.init(key, f, z=z, train=False)
    ref = g_ref.apply(vs, f, z=z, train=False)

    monkeypatch.setenv("FMI_HALF_TAIL", "1")
    got_half = g_pk.apply(vs, f, z=z, train=False)
    monkeypatch.setenv("FMI_HALF_TAIL", "0")
    got_full = g_pk.apply(vs, f, z=z, train=False)
    np.testing.assert_allclose(got_half, ref, atol=2e-5)
    np.testing.assert_allclose(got_half, got_full, atol=2e-5)

    # fused-pool form
    monkeypatch.setenv("FMI_HALF_TAIL", "1")
    pooled = g_pk.apply(vs, f, z=z, train=False, fuse_pool=4)
    hw = ref.shape[1] // 4
    np.testing.assert_allclose(
        pooled, adaptive_avg_pool2d(ref, (hw, hw)), atol=2e-5)

    # gradients through the half path
    def loss(params, mod):
        return jnp.sum(mod.apply({**vs, "params": params}, f, z=z,
                                 train=False) ** 2)

    g1 = jax.grad(loss)(vs["params"], g_ref)
    g2 = jax.grad(loss)(vs["params"], g_pk)
    gmax = max(float(jnp.max(jnp.abs(a))) for a in jax.tree.leaves(g1))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(a, b, atol=3e-5 * gmax)


def test_resgenerator_pair_handoff_matches_dense(rs, monkeypatch):
    """End-to-end: the decoder's (h, s) pair handoff + Output kernel path
    must equal the default dense packed tail."""
    key = jax.random.PRNGKey(1)
    dec = dict(ngf=8, z_nc=8, img_f=32, L=0, layers=3, norm="instance",
               activation="LeakyReLU", init_type="normal")
    g = define_g(**dec)
    g = g.copy(pack_threshold=16)
    x = jnp.asarray(rs.randn(2, 4, 4, 32), jnp.float32)
    z = jnp.asarray(rs.randn(2, 4, 4, 16), jnp.float32)

    monkeypatch.setenv("FMI_OUTPUT_KERNEL", "0")
    vs = g.init(key, x, z=z, train=False, fuse_pool=4)
    out_dense = g.apply(vs, x, z=z, train=False, fuse_pool=4)

    monkeypatch.setenv("FMI_OUTPUT_KERNEL", "1")
    out_kern = g.apply(vs, x, z=z, train=False, fuse_pool=4)
    assert out_kern.shape == out_dense.shape
    np.testing.assert_allclose(np.asarray(out_kern), np.asarray(out_dense),
                               atol=3e-5)


def test_d2s_rowconv_matches(monkeypatch):
    """FMI_D2S_ROWCONV=1 (h-only dilation, w stays packed in lanes, free
    final reshape) must equal the default depth_to_space for the c<=8 conv
    path, for every r the models use."""
    import numpy as np
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.ops import packed as P

    rng = np.random.RandomState(9)
    for r, c, g in ((2, 3, 8), (4, 3, 8), (2, 1, 6)):
        x = jnp.asarray(rng.randn(2, g, g, r * r * c).astype(np.float32))
        monkeypatch.setenv("FMI_D2S_ROWCONV", "0")
        ref = P.depth_to_space(x, r)
        monkeypatch.setenv("FMI_D2S_ROWCONV", "1")
        got = P.depth_to_space(x, r)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_d2s_conv_threshold_matches(monkeypatch):
    """FMI_D2S_CONV_MAX_C raises the selection-conv threshold (the pSp mid-
    synthesis unpack at c=64 lowers to a 6-D transpose copy by default);
    both conv forms must stay bit-exact vs the transpose at large c."""
    import numpy as np
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.ops import packed as P

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 6, 6, 2 * 2 * 64).astype(np.float32))
    monkeypatch.setenv("FMI_D2S_CONV_MAX_RRC", "0")
    monkeypatch.setenv("FMI_D2S_CONV_MAX_C", "0")
    ref = P.depth_to_space(x, 2)  # forced 6-D transpose form
    for env in ({"FMI_D2S_CONV_MAX_RRC": "256"},       # the default gate
                {"FMI_D2S_CONV_MAX_C": "64"}):         # explicit c override
        monkeypatch.setenv("FMI_D2S_CONV_MAX_RRC", env.get(
            "FMI_D2S_CONV_MAX_RRC", "0"))
        monkeypatch.setenv("FMI_D2S_CONV_MAX_C", env.get(
            "FMI_D2S_CONV_MAX_C", "0"))
        monkeypatch.setenv("FMI_D2S_ROWCONV", "0")
        np.testing.assert_array_equal(np.asarray(P.depth_to_space(x, 2)),
                                      np.asarray(ref))
        monkeypatch.setenv("FMI_D2S_ROWCONV", "1")
        np.testing.assert_array_equal(np.asarray(P.depth_to_space(x, 2)),
                                      np.asarray(ref))


def test_d2s_slice_form_matches(monkeypatch):
    """FMI_D2S_SLICE_MAX_RRC: the slice+stack unpack must be bit-exact vs
    the transpose form at every (r, c) the models use."""
    import numpy as np
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.ops import packed as P

    rng = np.random.RandomState(13)
    for r, c in ((2, 3), (4, 3), (2, 64), (2, 1)):
        x = jnp.asarray(rng.randn(2, 6, 6, r * r * c).astype(np.float32))
        monkeypatch.setenv("FMI_D2S_SLICE_MAX_RRC", "0")
        monkeypatch.setenv("FMI_D2S_CONV_MAX_RRC", "0")
        monkeypatch.setenv("FMI_D2S_CONV_MAX_C", "0")
        ref = P.depth_to_space(x, r)
        monkeypatch.setenv("FMI_D2S_SLICE_MAX_RRC", "4096")
        np.testing.assert_array_equal(np.asarray(P.depth_to_space(x, r)),
                                      np.asarray(ref))


def test_conv1x1_w_grouped_matches():
    """conv1x1_w_grouped (kron(I_g, W) over fused w-cells) must equal the
    plain 1x1 conv exactly, incl. the gw % g fallback."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.ops.packed import conv1x1_w_grouped

    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(2, 8, 12, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, 16, 12).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    for g in (1, 2, 4, 5):  # 5 does not divide 12 -> fallback path
        got = conv1x1_w_grouped(x, w, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-5)


def test_packed_torgb_grouped_matches(monkeypatch):
    """The grouped packed 1x1 inside ModulatedConv2d (FMI_PACKED_1X1_GROUP)
    must not change ToRGB outputs."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.models.stylegan2 import ToRGB
    from face_mask_inpaint_tpu.ops.packed import space_to_depth

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    style = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    xp = space_to_depth(x, 2)
    m = ToRGB(upsample=False)
    variables = m.init(jax.random.PRNGKey(0), xp, style, pack_in=2)
    monkeypatch.setenv("FMI_PACKED_1X1_GROUP", "1")
    ref = m.apply(variables, xp, style, pack_in=2)
    monkeypatch.setenv("FMI_PACKED_1X1_GROUP", "4")
    got = m.apply(variables, xp, style, pack_in=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_noise_expand_packed_bit_exact():
    """The conv-form noise expansion must be BIT-identical to the
    space_to_depth + per-channel repeat formulation (every output element
    is a single 1.0*x tap plus exact zeros), in f32 and bf16."""
    import numpy as np
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.ops.packed import (
        noise_expand_packed, space_to_depth)

    rng = np.random.RandomState(12)
    for r, c, hw in ((2, 32, 16), (2, 64, 8), (4, 16, 8)):
        noise = jnp.asarray(rng.randn(3, hw, hw, 1).astype(np.float32))
        for dt in (jnp.float32, jnp.bfloat16):
            nb = noise.astype(dt)
            got = noise_expand_packed(nb, r, c)
            ref = jnp.repeat(space_to_depth(nb, r), c, axis=-1)
            assert got.shape == ref.shape
            assert jnp.array_equal(got, ref), (r, c, dt)


def test_noise_injection_conv_path_matches_repeat(monkeypatch):
    """NoiseInjection's packed path must produce identical output with
    FMI_PACKED_NOISE_CONV on and off (explicit noise)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.models.stylegan2 import NoiseInjection
    from face_mask_inpaint_tpu.ops.packed import space_to_depth

    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(2, 16, 16, 12).astype(np.float32))
    xp = space_to_depth(x, 2)
    noise = jnp.asarray(rng.randn(2, 16, 16, 1).astype(np.float32))
    m = NoiseInjection()
    variables = m.init(jax.random.PRNGKey(0), xp, noise, packed_r=2,
                       packed_c=12)
    variables = jax.tree.map(lambda a: a + 0.37, variables)  # nonzero weight
    monkeypatch.setenv("FMI_PACKED_NOISE_CONV", "0")
    ref = m.apply(variables, xp, noise, packed_r=2, packed_c=12)
    monkeypatch.setenv("FMI_PACKED_NOISE_CONV", "1")
    got = m.apply(variables, xp, noise, packed_r=2, packed_c=12)
    assert jnp.array_equal(got, ref)


def test_packed_channel_scale_flat_matches_5d():
    """packed_channel_scale's flat slot-major tile form is bit-identical to
    the 5-D reshape-broadcast-multiply it replaced (round 4: the 5-D view
    forced relayout copies around the pSp 512²/1024² modulated convs)."""
    rng = np.random.RandomState(7)
    for r, c in ((2, 5), (4, 3), (4, 32)):
        x = jnp.asarray(rng.randn(2, 6, 6, r * r * c).astype(np.float32))
        s = jnp.asarray(rng.randn(2, c).astype(np.float32))
        got = P.packed_channel_scale(x, s, r)
        n, g1, g2, cc = x.shape
        ref = (x.reshape(n, g1, g2, r * r, c)
               * s[:, None, None, None, :]).reshape(n, g1, g2, cc)
        assert jnp.array_equal(got, ref), (r, c)
        # bf16 x keeps the scale cast semantics of the old form
        xb = x.astype(jnp.bfloat16)
        gotb = P.packed_channel_scale(xb, s, r)
        refb = (xb.reshape(n, g1, g2, r * r, c)
                * s[:, None, None, None, :].astype(jnp.bfloat16)
                ).reshape(n, g1, g2, cc)
        assert jnp.array_equal(gotb, refb), (r, c, "bf16")


def test_skip_upsample_vpu_matches_conv(monkeypatch):
    """FMI_SKIP_UP_VPU: the shifted-adds skip upsample (r_in=1) must match
    the selection-conv form (same _skip_up_kernel_np stencil, reordered
    summation -> tight allclose, exact in f32)."""
    import numpy as np
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.ops import packed as P

    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.randn(2, 12, 10, 3).astype(np.float32))
    monkeypatch.setenv("FMI_SKIP_UP_VPU", "0")
    ref = P.packed_skip_upsample(x, 1)
    monkeypatch.setenv("FMI_SKIP_UP_VPU", "1")
    got = P.packed_skip_upsample(x, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_torgb_unpacked_skip_vpu_matches(monkeypatch):
    """The unpacked ToRGB skip branch (VPU FIR + slice/stack unpack) must
    match the upsample_2d conv form at the >=128x128 gate size."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.models.stylegan2 import ToRGB

    rng = np.random.RandomState(22)
    x = jnp.asarray(rng.randn(1, 256, 256, 8).astype(np.float32))
    style = jnp.asarray(rng.randn(1, 32).astype(np.float32))
    skip = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))
    m = ToRGB(upsample=True)
    variables = m.init(jax.random.PRNGKey(0), x, style, skip)
    monkeypatch.setenv("FMI_SKIP_UP_VPU", "0")
    ref = m.apply(variables, x, style, skip)
    monkeypatch.setenv("FMI_SKIP_UP_VPU", "1")
    got = m.apply(variables, x, style, skip)
    assert got.shape == (1, 256, 256, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_torgb_unpacked_1x1_grouped_matches(monkeypatch):
    """FMI_TORGB_1X1_GROUP: the grouped unpacked ToRGB 1x1 (>=128² maps)
    must match the plain conv."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from face_mask_inpaint_tpu.models.stylegan2 import ToRGB

    rng = np.random.RandomState(23)
    x = jnp.asarray(rng.randn(1, 128, 128, 8).astype(np.float32))
    style = jnp.asarray(rng.randn(1, 32).astype(np.float32))
    m = ToRGB(upsample=False)
    variables = m.init(jax.random.PRNGKey(0), x, style)
    monkeypatch.setenv("FMI_TORGB_1X1_GROUP", "1")
    ref = m.apply(variables, x, style)
    monkeypatch.setenv("FMI_TORGB_1X1_GROUP", "16")
    got = m.apply(variables, x, style)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
