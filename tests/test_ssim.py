"""SSIM / MS-SSIM tests against an independent scipy-based spec of the
pytorch_msssim algorithm (the package itself is not in this image)."""

import numpy as np
import pytest
from scipy.ndimage import convolve

import jax.numpy as jnp

from face_mask_inpaint_tpu.evaluations.ssim import ms_ssim, ssim


def _gauss_1d(size=11, sigma=1.5):
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return g / g.sum()


def _blur_valid(x, win):
    # separable valid gaussian blur on HWC
    k = len(win)
    pad = k // 2
    out = convolve(x, win.reshape(-1, 1, 1), mode="constant")
    out = convolve(out, win.reshape(1, -1, 1), mode="constant")
    return out[pad:-pad, pad:-pad, :]


def _ssim_np(x, y, data_range=1.0):
    win = _gauss_1d()
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    mu1, mu2 = _blur_valid(x, win), _blur_valid(y, win)
    s1 = _blur_valid(x * x, win) - mu1**2
    s2 = _blur_valid(y * y, win) - mu2**2
    s12 = _blur_valid(x * y, win) - mu1 * mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    m = ((2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1)) * cs
    return m.mean(), cs.mean()


def test_ssim_matches_independent_spec():
    rng = np.random.RandomState(0)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    y = np.clip(x + rng.randn(1, 32, 32, 3).astype(np.float32) * 0.1, 0, 1)
    ours = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    spec, _ = _ssim_np(x[0].astype(np.float64), y[0].astype(np.float64))
    np.testing.assert_allclose(ours, spec, rtol=1e-4)


def test_ssim_identity_and_ordering():
    rng = np.random.RandomState(1)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    assert float(ssim(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(1.0, abs=1e-5)
    small = np.clip(x + 0.02 * rng.randn(*x.shape).astype(np.float32), 0, 1)
    big = np.clip(x + 0.3 * rng.randn(*x.shape).astype(np.float32), 0, 1)
    s_small = float(ssim(jnp.asarray(x), jnp.asarray(small)))
    s_big = float(ssim(jnp.asarray(x), jnp.asarray(big)))
    assert s_small > s_big > 0


def test_ms_ssim_identity_and_ordering():
    rng = np.random.RandomState(2)
    # MS-SSIM needs > (11-1)*16 = 160 px
    x = rng.rand(1, 176, 176, 3).astype(np.float32)
    assert float(ms_ssim(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(1.0, abs=1e-4)
    noisy = np.clip(x + 0.1 * rng.randn(*x.shape).astype(np.float32), 0, 1)
    noisier = np.clip(x + 0.4 * rng.randn(*x.shape).astype(np.float32), 0, 1)
    a = float(ms_ssim(jnp.asarray(x), jnp.asarray(noisy)))
    b = float(ms_ssim(jnp.asarray(x), jnp.asarray(noisier)))
    assert 0 < b < a < 1


def test_ssim_batch_no_average():
    rng = np.random.RandomState(3)
    x = rng.rand(3, 32, 32, 3).astype(np.float32)
    y = np.clip(x + 0.1 * rng.randn(*x.shape).astype(np.float32), 0, 1)
    per = ssim(jnp.asarray(x), jnp.asarray(y), size_average=False)
    assert per.shape == (3,)
    np.testing.assert_allclose(
        float(ssim(jnp.asarray(x), jnp.asarray(y))), float(jnp.mean(per)), rtol=1e-6)
