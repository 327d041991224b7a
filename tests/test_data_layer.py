"""Data-layer tests over the synthetic CelebA fixture."""

import numpy as np
import pytest

from face_mask_inpaint_tpu.data.dataset import BasicDataset, ReferenceDataset
from face_mask_inpaint_tpu.data.loader import (
    DataLoader,
    get_reference_dataloader,
    split_dataset,
)
from face_mask_inpaint_tpu.data.synthetic import make_synthetic_celeba


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("celeba")
    return make_synthetic_celeba(root, n_identities=3, images_per_identity=3,
                                 size=(48, 40))


def test_basic_dataset(fixture_tree):
    ds = BasicDataset(fixture_tree["src_dir"], fixture_tree["mask_dir"], scale=0.5)
    assert len(ds) == fixture_tree["n_images"]
    item = ds[0]
    assert item["image"].shape == (24, 20, 3)
    assert item["image"].dtype == np.float32
    assert 0.0 <= item["image"].min() and item["image"].max() <= 1.0
    assert item["mask"].shape == (24, 20)
    assert item["mask"].dtype == np.int64
    assert set(np.unique(item["mask"])) <= {0, 1}


def test_reference_dataset_random_ref(fixture_tree):
    ds = ReferenceDataset(
        fixture_tree["src_dir"], fixture_tree["ref_dir"], fixture_tree["mask_dir"],
        fixture_tree["identity_file"], apply_transform=False, scale=1.0,
    )
    item = ds[0]
    for k in ("src_img", "gt_img", "raw_gt_img", "ref_img"):
        assert item[k].shape == (48, 40, 3), k
    np.testing.assert_array_equal(item["gt_img"], item["raw_gt_img"])
    # reference is another image of the same identity
    name = ds.ids[0]
    ref_name = ds.sample_reference_image(name)
    assert ref_name != name
    assert ds.img2identity[ref_name] == ds.img2identity[name]


def test_reference_dataset_transform_and_id(fixture_tree):
    ds = ReferenceDataset(
        fixture_tree["src_dir"], fixture_tree["ref_dir"], fixture_tree["mask_dir"],
        fixture_tree["identity_file"], apply_transform=True, return_id=True,
    )
    item = ds[0]
    assert item["src_img"].min() < 0  # normalized to [-1, 1]
    np.testing.assert_allclose(
        item["gt_img"], (item["raw_gt_img"] - 0.5) / 0.5, rtol=1e-6)
    assert item["id"].shape == (1,)


def test_best_reference_map_cached(fixture_tree):
    ds = ReferenceDataset(
        fixture_tree["src_dir"], fixture_tree["ref_dir"], fixture_tree["mask_dir"],
        fixture_tree["identity_file"], apply_transform=False, use_ssim=True,
    )
    assert (fixture_tree["root"] / "best_reference_map.pkl").is_file()
    for name, best in ds.best_reference_map.items():
        assert best is not None and best != name
        assert ds.img2identity[best] == ds.img2identity[name]
    # second construction loads the cache
    ds2 = ReferenceDataset(
        fixture_tree["src_dir"], fixture_tree["ref_dir"], fixture_tree["mask_dir"],
        fixture_tree["identity_file"], apply_transform=False, use_ssim=True,
    )
    assert ds2.best_reference_map == ds.best_reference_map


def test_load_dispatches_npy_pt_and_image(tmp_path):
    """_load extension dispatch (reference dataloader.py:95-103): .npy/.npz
    via numpy, .pt/.pth as saved torch tensors, everything else via PIL."""
    import torch
    from PIL import Image

    from face_mask_inpaint_tpu.data.dataset import _load

    arr = (np.arange(48).reshape(4, 4, 3) * 5).astype(np.uint8)
    np.save(tmp_path / "a.npy", arr)
    torch.save(torch.from_numpy(arr), tmp_path / "a.pt")
    Image.fromarray(arr).save(tmp_path / "a.png")
    for fn in ("a.npy", "a.pt", "a.png"):
        got = np.asarray(_load(tmp_path / fn))
        np.testing.assert_array_equal(got, arr, err_msg=fn)


def test_identity_filter(tmp_path):
    tree = make_synthetic_celeba(tmp_path, n_identities=2, images_per_identity=1)
    with pytest.raises(RuntimeError):
        # all identities have < 2 images -> everything filtered
        ReferenceDataset(tree["src_dir"], tree["ref_dir"], tree["mask_dir"],
                         tree["identity_file"], apply_transform=False)


def test_split_and_loader(fixture_tree):
    ds = ReferenceDataset(
        fixture_tree["src_dir"], fixture_tree["ref_dir"], fixture_tree["mask_dir"],
        fixture_tree["identity_file"], apply_transform=False,
    )
    train_idx, val_idx = split_dataset(len(ds), 0.25, seed=1)
    assert len(train_idx) + len(val_idx) == len(ds)
    assert not set(train_idx) & set(val_idx)

    loader = DataLoader(ds, batch_size=4, indices=train_idx, shuffle=True,
                        num_workers=2, seed=0)
    batches = list(loader)
    assert sum(b["src_img"].shape[0] for b in batches) == len(train_idx)
    assert batches[0]["src_img"].shape[1:] == (48, 40, 3)

    # epochs reshuffle
    order1 = [b["src_img"].sum() for b in loader]
    order2 = [b["src_img"].sum() for b in loader]
    assert len(order1) == len(order2)


def test_get_reference_dataloader_surface(fixture_tree):
    train_loader, val_loader = get_reference_dataloader(
        fixture_tree["src_dir"], fixture_tree["ref_dir"], fixture_tree["mask_dir"],
        fixture_tree["identity_file"], batch_size=2, val_amount=0.25,
        num_workers=1,
    )
    tb = next(iter(train_loader))
    assert tb["src_img"].shape[0] == 2
    for b in val_loader:
        assert b["src_img"].shape[0] == 2  # drop_last


def test_loader_pad_last(fixture_tree):
    ds = BasicDataset(fixture_tree["src_dir"], fixture_tree["mask_dir"])
    loader = DataLoader(ds, batch_size=4, pad_last=True, num_workers=1)
    last = list(loader)[-1]
    assert last["image"].shape[0] == 4
    assert "_valid" in last


def test_multihost_loader_disjoint_slices(fixture_tree):
    """Per-process input sharding: each simulated host loads a disjoint
    contiguous slice of every global batch; slices concatenate to the
    single-process batch (loader multi-host path)."""
    ds = ReferenceDataset(
        fixture_tree["src_dir"], fixture_tree["ref_dir"], fixture_tree["mask_dir"],
        fixture_tree["identity_file"], apply_transform=False, return_id=True,
    )
    n = len(ds)
    bs = 4
    make = lambda pi, pc: DataLoader(
        ds, bs, shuffle=True, seed=7, num_workers=2,
        process_index=pi, process_count=pc)
    global_batches = [b["id"].ravel().tolist() for b in make(0, 1)
                      if len(b["id"]) == bs]  # pc>1 drops partial batches
    h0 = [b["id"].ravel().tolist() for b in make(0, 2)]
    h1 = [b["id"].ravel().tolist() for b in make(1, 2)]
    assert len(h0) == len(h1) == len(global_batches)
    for g, a, b in zip(global_batches, h0, h1):
        assert a + b == g          # contiguous halves, same global order
        assert not set(a) & set(b)  # disjoint per-host index sets


def test_multihost_loader_batch_divisibility():
    ds = [{"x": np.zeros(2, np.float32)}] * 8

    class _DS:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            return ds[i]

    with pytest.raises(ValueError):
        DataLoader(_DS(), 3, process_index=0, process_count=2)
