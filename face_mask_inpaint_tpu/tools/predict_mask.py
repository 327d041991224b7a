"""Standalone mask-prediction CLI.

Equivalent of the reference's modules/unet/extra/predict.py (the upstream
UNet repo's predict script): run the mask detector over image files and save
the binary masks. Usage:

    python -m face_mask_inpaint_tpu.tools.predict_mask \
        --model saved_model/unet_checkpoint_epoch5 -i a.jpg b.jpg -o a_m.png b_m.png
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp


def get_args():
    parser = argparse.ArgumentParser(description="Predict masks from input images")
    parser.add_argument("--model", "-m", default="MODEL.pth",
                        help="checkpoint (orbax dir or torch .pth)")
    parser.add_argument("--input", "-i", nargs="+", required=True,
                        help="input image files")
    parser.add_argument("--output", "-o", nargs="+", help="output mask files")
    parser.add_argument("--viz", "-v", action="store_true",
                        help="save a side-by-side visualization instead")
    parser.add_argument("--no-save", "-n", action="store_true")
    parser.add_argument("--mask-threshold", "-t", type=float, default=0.5)
    parser.add_argument("--scale", "-s", type=float, default=1.0)
    return parser.parse_args()


def predict_img(model, variables, pil_img, scale: float, threshold: float):
    """argmax mask for one image (the mode='train' + argmax primary path)."""
    from face_mask_inpaint_tpu.data.dataset import _preprocess
    from face_mask_inpaint_tpu.models.unet import MaskDetector

    arr = _preprocess(pil_img, scale, is_mask=False)
    mask = model.apply(
        variables, jnp.asarray(arr)[None], method=MaskDetector.predict_mask
    )
    return np.asarray(mask[0])


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    from face_mask_inpaint_tpu.models.unet import MaskDetector
    from face_mask_inpaint_tpu.train import checkpoint as ckpt

    model = MaskDetector(n_channels=3, bilinear=True, threshold=args.mask_threshold)
    sample = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), sample)
    if args.model and Path(args.model).exists():
        if str(args.model).endswith((".pth", ".pt")):
            from face_mask_inpaint_tpu.tools.convert_torch import (
                convert_unet, load_torch_state_dict)
            variables = jax.tree.map(
                jnp.asarray, convert_unet(load_torch_state_dict(args.model)))
        else:
            variables = ckpt.restore_module_variables(args.model, variables)
        logging.info("Model loaded from %s", args.model)
    else:
        logging.warning("checkpoint %s not found; using random init", args.model)

    outputs = args.output or [
        f"{Path(p).stem}_OUT.png" for p in args.input
    ]
    for in_file, out_file in zip(args.input, outputs):
        img = Image.open(in_file).convert("RGB")
        mask = predict_img(model, variables, img, args.scale, args.mask_threshold)
        if not args.no_save:
            Image.fromarray((mask * 255).astype("uint8")).save(out_file)
            logging.info("Mask saved to %s", out_file)


if __name__ == "__main__":
    main()
