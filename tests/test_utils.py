"""Utility helpers: image conversion, param counting, native collate."""

import numpy as np

from face_mask_inpaint_tpu.data import _native
from face_mask_inpaint_tpu.utils.images import mask2im, tensor2im, tensor2im_pm1
from face_mask_inpaint_tpu.utils.params import count_params, describe_params


def test_tensor2im_clamps_and_scales():
    img = np.asarray([[[-0.5, 0.5, 1.5]]], np.float32)
    out = np.asarray(tensor2im(img))
    assert out.tolist() == [[[0, 127, 255]]]
    out2 = np.asarray(tensor2im_pm1(np.asarray([[[-1.0, 0.0, 1.0]]], np.float32)))
    assert out2.tolist() == [[[0, 127, 255]]]
    m = np.asarray(mask2im(np.ones((2, 2), np.float32)))
    assert m.shape == (2, 2, 3) and m.max() == 255


def test_count_params():
    params = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(5)}}
    assert count_params(params) == 11
    assert "0.000 M" in describe_params(params)


def test_native_collate_matches_numpy():
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (8, 6, 3), dtype=np.uint8) for _ in range(3)]
    out = _native.collate_images_u8(imgs, normalize=False)
    np.testing.assert_allclose(out, np.stack(imgs).astype(np.float32) / 255, rtol=1e-6)
    out_n = _native.collate_images_u8(imgs, normalize=True)
    np.testing.assert_allclose(
        out_n, (np.stack(imgs).astype(np.float32) / 255 - 0.5) / 0.5, rtol=1e-5,
        atol=1e-6)
    masks = [rng.randint(0, 3, (8, 6)).astype(np.int64) for _ in range(3)]
    np.testing.assert_array_equal(
        _native.collate_masks_i64(masks), (np.stack(masks) > 0).astype(np.int32))
