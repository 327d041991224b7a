"""CelebA / CelebA-HQ dataset layer.

Rebuild of reference dataloader.py with identical on-disk conventions:

- image id = filename stem before '_'; source image ``<id>_surgical.jpg``;
  ground truth/reference ``<id>.jpg``; mask ``<id>.npy`` (int array).
- identity file lines: ``<img> <identity>``; identities with fewer than two
  images are filtered out (dataloader.py:138-141).
- reference selection: random other image of the same identity, or the
  precomputed best-SSIM reference cached to ``best_reference_map.pkl``
  (dataloader.py:156-166, 191-218).
- preprocess: PIL resize by scale (NEAREST masks / BICUBIC images), float/255
  images, int64 masks; optional (x-0.5)/0.5 normalization for the pSp stack.

Differences by design: arrays are NHWC; the torch DataLoader worker pool is
replaced by a thread-pool prefetch loader (data/loader.py) feeding
jax.device_put; random split uses a seeded numpy RNG (torch's random_split
used the global torch RNG — not bit-reproducible anyway).
"""

from __future__ import annotations

import logging
import pickle
import random
from os import listdir
from os.path import splitext
from pathlib import Path
from typing import Optional

import numpy as np
from PIL import Image

__all__ = ["BasicDataset", "ReferenceDataset"]

log = logging.getLogger(__name__)


def _load(filename) -> Image.Image:
    """File loader (dataloader.py:95-103): npy/npz via numpy, .pt/.pth as a
    saved torch tensor image (torch imported lazily — the data layer works
    without it unless such files are actually present), else PIL."""
    ext = splitext(str(filename))[1]
    if ext in (".npz", ".npy"):
        return Image.fromarray(np.load(filename))
    if ext in (".pt", ".pth"):
        import torch

        return Image.fromarray(torch.load(filename).numpy())
    return Image.open(filename)


def _preprocess(pil_img: Image.Image, scale: float, is_mask: bool) -> np.ndarray:
    """Resize + normalize (dataloader.py:76-93), HWC output."""
    w, h = pil_img.size
    new_w, new_h = int(scale * w), int(scale * h)
    assert new_w > 0 and new_h > 0, "Scale is too small, resized images would have no pixel"
    pil_img = pil_img.resize(
        (new_w, new_h), resample=Image.NEAREST if is_mask else Image.BICUBIC
    )
    arr = np.asarray(pil_img)
    if is_mask:
        return arr.astype(np.int64)
    if arr.ndim == 2:
        arr = arr[..., None]
    return (arr / 255.0).astype(np.float32)


class BasicDataset:
    """(image, mask) pairs for mask-detector training (dataloader.py:49-119)."""

    def __init__(self, images_dir, masks_dir, scale: float = 1.0, mask_suffix: str = ""):
        self.images_dir = Path(images_dir)
        self.masks_dir = Path(masks_dir)
        assert 0 < scale <= 1, "Scale must be between 0 and 1"
        self.scale = scale
        self.mask_suffix = mask_suffix
        self.ids = [
            splitext(f)[0].split("_")[0]
            for f in listdir(images_dir)
            if not f.startswith(".")
        ]
        if not self.ids:
            raise RuntimeError(f"No input file found in {images_dir}")
        log.info("Creating dataset with %d examples", len(self.ids))

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, idx: int) -> dict:
        name = self.ids[idx]
        mask = _load(self.masks_dir / f"{name}{self.mask_suffix}.npy")
        img = _load(self.images_dir / f"{name}_surgical.jpg")
        assert img.size == mask.size, f"Image and mask {name} should be the same size"
        return {
            "image": _preprocess(img, self.scale, is_mask=False),
            "mask": _preprocess(mask, self.scale, is_mask=True),
        }


class ReferenceDataset(BasicDataset):
    """The central dataset (dataloader.py:122-266)."""

    def __init__(
        self,
        source_dir,
        reference_dir,
        masks_dir,
        identity_file,
        apply_transform: bool = True,
        scale: float = 1.0,
        use_ssim: bool = False,
        device=None,
        return_id: bool = False,
        rng: Optional[random.Random] = None,
    ):
        self.source_dir = Path(source_dir)
        self.masks_dir = Path(masks_dir)
        self.reference_dir = Path(reference_dir)
        self.identity_map, self.img2identity = self.read_identity_file(identity_file)
        self.filter_id = set()
        for v in self.identity_map.values():
            if len(v) < 2:
                self.filter_id.update(v)
        assert 0 < scale <= 1, "Scale must be between 0 and 1"
        self.scale = scale

        self.ids = []
        for f in listdir(source_dir):
            f_id = splitext(f)[0].split("_")[0]
            if not f.startswith(".") and f_id not in self.filter_id:
                self.ids.append(f_id)
        if not self.ids:
            raise RuntimeError(f"No input file found in {source_dir}")
        log.info("Creating dataset with %d examples", len(self.ids))

        self.use_ssim = use_ssim
        if use_ssim:
            cache = self.source_dir.parent / "best_reference_map.pkl"
            if cache.is_file():
                with open(cache, "rb") as f:
                    self.best_reference_map = pickle.load(f)
            else:
                log.info("Creating best_reference_map")
                self.best_reference_map = self.find_best_reference()

        self.apply_transform = apply_transform
        self.return_id = return_id
        self._rng = rng or random.Random()

    @staticmethod
    def read_identity_file(identity_file):
        """identity lines -> (identity -> [ids], id -> identity)
        (dataloader.py:174-189)."""
        identity_map: dict[int, list[str]] = {}
        img2identity: dict[str, int] = {}
        with open(identity_file) as f:
            for line in f:
                img, identity = line.strip().split(" ")
                img_id = splitext(img)[0].split("_")[0]
                identity = int(identity)
                img2identity[img_id] = identity
                identity_map.setdefault(identity, []).append(img_id)
        return identity_map, img2identity

    def find_best_reference(self) -> dict:
        """Best-SSIM reference per image over its identity group, cached to
        pkl (dataloader.py:191-218).

        TPU-friendly redesign of the reference's per-pair loop: each image is
        decoded once per identity group, all candidate pairs of a group score
        in ONE batched jitted SSIM call, and every image in the group gets its
        argmax from the same pairwise matrix.
        """
        import jax
        import jax.numpy as jnp

        from face_mask_inpaint_tpu.evaluations.ssim import ssim as jssim

        ssim_pair = jax.jit(
            lambda a, b: jssim(a, b, data_range=1.0, size_average=False)
        )

        wanted = set(self.ids)
        best: dict[str, Optional[str]] = {}
        for identity, group in self.identity_map.items():
            if len(group) < 2 or not any(m in wanted for m in group):
                continue
            imgs = np.stack([
                _preprocess(_load(self.reference_dir / f"{m}.jpg"), self.scale, False)
                for m in group
            ])
            k = len(group)
            # pairwise scores: (i, j) batched as k*k rows (k is small per group)
            a = jnp.asarray(np.repeat(imgs, k, axis=0))
            b = jnp.asarray(np.tile(imgs, (k, 1, 1, 1)))
            scores = np.array(ssim_pair(a, b)).reshape(k, k)
            np.fill_diagonal(scores, -np.inf)
            for i, m in enumerate(group):
                if m in wanted:
                    best[m] = group[int(np.argmax(scores[i]))]
        with open(self.source_dir.parent / "best_reference_map.pkl", "wb") as f:
            pickle.dump(best, f)
        return best

    def sample_reference_image(self, img_name: str) -> str:
        if self.use_ssim:
            return self.best_reference_map[img_name]
        images = self.identity_map[self.img2identity[img_name]]
        assert len(images) > 1
        ref = self._rng.choice(images)
        while ref == img_name:
            ref = self._rng.choice(images)
        return ref

    def __getitem__(self, idx: int) -> dict:
        name = self.ids[idx]
        mask = _load(self.masks_dir / f"{name}.npy")
        src = _load(self.source_dir / f"{name}_surgical.jpg")
        gt = _load(self.reference_dir / f"{name}.jpg")
        ref = _load(self.reference_dir / f"{self.sample_reference_image(name)}.jpg")
        assert src.size == mask.size, f"Image and mask {name} should be the same size"

        src_img = _preprocess(src, self.scale, is_mask=False)
        raw_gt_img = _preprocess(gt, self.scale, is_mask=False)
        ref_img = _preprocess(ref, self.scale, is_mask=False)
        if self.apply_transform:
            src_img = (src_img - 0.5) / 0.5
            ref_img = (ref_img - 0.5) / 0.5
            gt_img = (raw_gt_img - 0.5) / 0.5
        else:
            gt_img = raw_gt_img
        items = {
            "src_img": src_img,
            "gt_img": gt_img,
            "raw_gt_img": raw_gt_img,
            "ref_img": ref_img,
            "mask": _preprocess(mask, self.scale, is_mask=True),
        }
        if self.return_id:
            items["id"] = np.asarray([int(name)], np.int64)
        return items
