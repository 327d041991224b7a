"""Synthetic dataset fixture: a tiny hermetic CelebA-shaped tree.

Generates <id>_surgical.jpg sources (with a painted "mask" rectangle),
<id>.jpg ground truths, <id>.npy binary maps, and an identity file — enough
to exercise the full data layer, trainers, and inference CLIs without the
real CelebA download (the reference has no such fixture; its trainers
hard-code /data paths, train_mask_detector.py:19-21).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

__all__ = ["make_synthetic_celeba"]


def make_synthetic_celeba(
    root,
    n_identities: int = 4,
    images_per_identity: int = 2,
    size: tuple[int, int] = (64, 64),
    seed: int = 0,
) -> dict:
    """Create the fixture tree under ``root`` and return its paths."""
    root = Path(root)
    src_dir = root / "img_align_celeba_masked1"
    ref_dir = root / "img_align_celeba"
    mask_dir = root / "binary_map"
    for d in (src_dir, ref_dir, mask_dir):
        d.mkdir(parents=True, exist_ok=True)
    identity_file = root / "identity_CelebA.txt"

    rng = np.random.RandomState(seed)
    h, w = size
    lines = []
    img_id = 0
    for ident in range(1, n_identities + 1):
        base = rng.randint(0, 200, size=(h, w, 3)).astype(np.uint8)
        for _ in range(images_per_identity):
            img_id += 1
            name = f"{img_id:06d}"
            jitter = rng.randint(-20, 20, size=(h, w, 3))
            gt = np.clip(base.astype(int) + jitter, 0, 255).astype(np.uint8)
            Image.fromarray(gt).save(ref_dir / f"{name}.jpg")

            # mask rectangle over the lower half ("surgical mask")
            mask = np.zeros((h, w), np.uint8)
            y0, x0 = h // 2, w // 4
            mask[y0 : y0 + h // 3, x0 : x0 + w // 2] = 1
            np.save(mask_dir / f"{name}.npy", mask)

            src = gt.copy()
            src[mask.astype(bool)] = (80, 120, 200)
            Image.fromarray(src).save(src_dir / f"{name}_surgical.jpg")

            lines.append(f"{name}.jpg {ident}")
    identity_file.write_text("\n".join(lines) + "\n")
    return {
        "root": root,
        "src_dir": src_dir,
        "ref_dir": ref_dir,
        "mask_dir": mask_dir,
        "identity_file": identity_file,
        "n_images": img_id,
    }
