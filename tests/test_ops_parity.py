"""Numeric parity of core ops against PyTorch (CPU) ground truth.

These tests pin the exact semantics the reference relies on:
F.interpolate(bilinear, align_corners=True), AdaptiveAvgPool2d,
ConvTranspose2d(stride=2, padding=1, output_padding=1), PixelShuffle,
reflection padding, and the upfirdn2d pipeline.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from face_mask_inpaint_tpu.ops import conv as jconv
from face_mask_inpaint_tpu.ops import resize as jresize
from face_mask_inpaint_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from face_mask_inpaint_tpu.ops.upfirdn2d import make_kernel, upfirdn2d

RTOL, ATOL = 1e-5, 1e-5


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def to_nhwc(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("in_hw,out_hw", [((7, 9), (14, 18)), ((16, 16), (5, 11)), ((218, 178), (32, 32)), ((8, 8), (8, 8))])
@pytest.mark.parametrize("align", [True, False])
def test_bilinear_resize_matches_torch(in_hw, out_hw, align):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = jresize.bilinear_resize(jnp.asarray(x), out_hw, align_corners=align)
    theirs = F.interpolate(nchw(x), size=out_hw, mode="bilinear", align_corners=align)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", [((17, 13), (4, 4)), ((864, 704), (256, 256)), ((10, 10), (5, 5)), ((6, 6), (7, 3))])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(1)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = jresize.adaptive_avg_pool2d(jnp.asarray(x), out_hw)
    theirs = torch.nn.AdaptiveAvgPool2d(out_hw)(nchw(x))
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=RTOL, atol=ATOL)


def test_nearest_resize_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 15, 15, 2).astype(np.float32)
    ours = jresize.nearest_resize(jnp.asarray(x), (16, 16))
    theirs = F.interpolate(nchw(x), size=(16, 16), mode="nearest")
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("stride,padding,dilation,groups", [(1, 1, 1, 1), (2, 1, 1, 1), (1, 2, 2, 1), (1, 0, 1, 2)])
def test_conv2d_matches_torch(stride, padding, dilation, groups):
    rng = np.random.RandomState(3)
    cin, cout, k = 4, 6, 3
    x = rng.randn(2, 13, 11, cin).astype(np.float32)
    w_oihw = rng.randn(cout, cin // groups, k, k).astype(np.float32)
    b = rng.randn(cout).astype(np.float32)
    w_hwio = w_oihw.transpose(2, 3, 1, 0)
    ours = jconv.conv2d(jnp.asarray(x), jnp.asarray(w_hwio), jnp.asarray(b),
                        stride=stride, padding=padding, dilation=dilation, groups=groups)
    theirs = F.conv2d(nchw(x), torch.from_numpy(w_oihw), torch.from_numpy(b),
                      stride=stride, padding=padding, dilation=dilation, groups=groups)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,stride,padding,output_padding", [(3, 2, 1, 1), (2, 2, 0, 0), (4, 2, 1, 0), (3, 1, 1, 0)])
def test_conv_transpose2d_matches_torch(k, stride, padding, output_padding):
    rng = np.random.RandomState(4)
    cin, cout = 5, 4
    x = rng.randn(2, 9, 7, cin).astype(np.float32)
    w_iohw = rng.randn(cin, cout, k, k).astype(np.float32)
    b = rng.randn(cout).astype(np.float32)
    w_hwio = w_iohw.transpose(2, 3, 0, 1)
    ours = jconv.conv_transpose2d(jnp.asarray(x), jnp.asarray(w_hwio), jnp.asarray(b),
                                  stride=stride, padding=padding, output_padding=output_padding)
    theirs = F.conv_transpose2d(nchw(x), torch.from_numpy(w_iohw), torch.from_numpy(b),
                                stride=stride, padding=padding, output_padding=output_padding)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=1e-4, atol=1e-4)


def test_pixel_shuffle_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 4, 5, 12).astype(np.float32)
    ours = jconv.pixel_shuffle(jnp.asarray(x), 2)
    theirs = F.pixel_shuffle(nchw(x), 2)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=RTOL, atol=ATOL)


def test_reflection_pad_matches_torch():
    rng = np.random.RandomState(6)
    x = rng.randn(1, 6, 6, 3).astype(np.float32)
    ours = jresize.reflection_pad2d(jnp.asarray(x), 1)
    theirs = F.pad(nchw(x), (1, 1, 1, 1), mode="reflect")
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=RTOL, atol=ATOL)


def test_pools_match_torch():
    rng = np.random.RandomState(7)
    x = rng.randn(2, 9, 9, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(jresize.avg_pool2d(jnp.asarray(x), 2)),
        to_nhwc(F.avg_pool2d(nchw(x), 2)), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(jresize.max_pool2d(jnp.asarray(x), 2)),
        to_nhwc(F.max_pool2d(nchw(x), 2)), rtol=RTOL, atol=ATOL)


def _upfirdn2d_numpy(x_nhwc, kernel, up, down, pad0, pad1):
    """Literal (slow) spec of upfirdn2d: zero-upsample, pad, convolve, stride."""
    n, h, w, c = x_nhwc.shape
    kh, kw = kernel.shape
    up_x = np.zeros((n, h * up, w * up, c), x_nhwc.dtype)
    up_x[:, ::up, ::up, :] = x_nhwc
    padded = np.zeros((n, h * up + pad0 + pad1, w * up + pad0 + pad1, c), x_nhwc.dtype)
    hs = slice(max(pad0, 0), max(pad0, 0) + h * up)
    ws = slice(max(pad0, 0), max(pad0, 0) + w * up)
    padded[:, hs, ws, :] = up_x
    if pad0 < 0 or pad1 < 0:
        padded = padded[:, max(-pad0, 0):padded.shape[1] - max(-pad1, 0),
                        max(-pad0, 0):padded.shape[2] - max(-pad1, 0), :]
    oh = (padded.shape[1] - kh) + 1
    ow = (padded.shape[2] - kw) + 1
    out = np.zeros((n, oh, ow, c), x_nhwc.dtype)
    kflip = kernel[::-1, ::-1]
    for i in range(oh):
        for j in range(ow):
            patch = padded[:, i:i + kh, j:j + kw, :]
            out[:, i, j, :] = np.einsum("nhwc,hw->nc", patch, kflip)
    return out[:, ::down, ::down, :]


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (2, 2)), (2, 2, (1, 1))])
def test_upfirdn2d_matches_reference_spec(up, down, pad):
    rng = np.random.RandomState(8)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    k = np.asarray(make_kernel([1, 3, 3, 1]), np.float32)
    ours = upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad)
    spec = _upfirdn2d_numpy(x, k, up, down, pad[0], pad[1])
    np.testing.assert_allclose(np.asarray(ours), spec, rtol=1e-4, atol=1e-5)


def test_fused_leaky_relu():
    rng = np.random.RandomState(9)
    x = rng.randn(4, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    ours = fused_leaky_relu(jnp.asarray(x), jnp.asarray(b))
    theirs = F.leaky_relu(torch.from_numpy(x) + torch.from_numpy(b), 0.2) * np.sqrt(2)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(scaled_leaky_relu(jnp.asarray(x))),
        (F.leaky_relu(torch.from_numpy(x), 0.2) * np.sqrt(2)).numpy(), rtol=RTOL, atol=ATOL)
