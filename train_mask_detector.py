#!/usr/bin/env python
"""Train the UNet mask detector on TPU.

Flag-for-flag rebuild of reference train_mask_detector.py (CLI surface
:60-76): CE + multiclass dice, Adam + ReduceLROnPlateau('max' on val dice,
patience=2), eval every n_train/(10*batch) steps, per-epoch checkpoints,
KeyboardInterrupt -> INTERRUPTED checkpoint.

Differences by design:
- the reference hard-codes its data dirs (:19-21); --dir_img/--dir_mask/
  --dir_checkpoint flags override the same defaults.
- --amp maps to bf16 compute (TPU has no GradScaler; bf16 needs none).
- checkpoints are orbax train states (params+opt+step), not .pth.
"""

import argparse
import logging
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from face_mask_inpaint_tpu.data.dataset import BasicDataset
from face_mask_inpaint_tpu.data.loader import DataLoader, split_dataset
from face_mask_inpaint_tpu.models.unet import MaskDetector
from face_mask_inpaint_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_tree
from face_mask_inpaint_tpu.train import checkpoint as ckpt
from face_mask_inpaint_tpu.train.optim import adam
from face_mask_inpaint_tpu.train.state import ModuleState, TrainState
from face_mask_inpaint_tpu.train.unet import make_unet_eval_step, make_unet_train_step
from face_mask_inpaint_tpu.utils.metrics_logger import MetricsLogger

DIR_IMG = Path("../CelebAHQ/images_masked")
DIR_MASK = Path("../CelebAHQ/binary_map")
DIR_CHECKPOINT = Path("./checkpoints256_mask_detector/")


def get_args():
    parser = argparse.ArgumentParser(
        description="Train the UNet on images and target masks"
    )
    parser.add_argument("--epochs", "-e", metavar="E", type=int, default=5,
                        help="Number of epochs")
    parser.add_argument("--batch-size", "-b", dest="batch_size", metavar="B",
                        type=int, default=1, help="Batch size")
    parser.add_argument("--learning-rate", "-l", metavar="LR", type=float,
                        default=0.00001, help="Learning rate", dest="lr")
    parser.add_argument("--load", "-f", type=str, default=False,
                        help="Load model from a checkpoint")
    parser.add_argument("--scale", "-s", type=float, default=1,
                        help="Downscaling factor of the images")
    parser.add_argument("--validation", "-v", dest="val", type=float, default=10.0,
                        help="Percent of the data that is used as validation (0-100)")
    parser.add_argument("--amp", action="store_true", default=False,
                        help="Use mixed precision (bf16 compute on TPU)")
    parser.add_argument("--threshold", "-t", type=float, default=0.5,
                        help="Threshold for deciding mask")
    from face_mask_inpaint_tpu.utils.profiling import add_profile_args
    add_profile_args(parser)
    # TPU-rebuild extras (the reference hard-codes these paths)
    parser.add_argument("--dir_img", type=str, default=str(DIR_IMG))
    parser.add_argument("--dir_mask", type=str, default=str(DIR_MASK))
    parser.add_argument("--dir_checkpoint", type=str, default=str(DIR_CHECKPOINT))
    parser.add_argument("--use_wandb", type=int, default=0)
    return parser.parse_args()


def train_net(net, args, epochs, batch_size, learning_rate, val_percent,
              save_checkpoint=True, img_scale=0.5):
    dataset = BasicDataset(args.dir_img, args.dir_mask, img_scale)
    n_val = int(len(dataset) * val_percent)
    n_train = len(dataset) - n_val
    # reference: random_split([n_train, n_val]) then shuffled train loader
    train_idx, val_idx = split_dataset(len(dataset), n_val / len(dataset))

    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    n_dev = mesh.shape["data"]
    eff_bs = max(batch_size, n_dev) // n_dev * n_dev  # divisible global batch
    train_loader = DataLoader(dataset, eff_bs, train_idx, shuffle=True,
                              num_workers=4, sharding=sharding, drop_last=True)
    val_loader = DataLoader(dataset, eff_bs, val_idx, shuffle=False,
                            drop_last=True, num_workers=4, sharding=sharding)

    logger = MetricsLogger(Path(args.dir_checkpoint) / "logs", "Mask Detector",
                           config=vars(args), use_wandb=bool(args.use_wandb))
    logging.info(
        "Starting training: epochs=%d batch=%d lr=%g train=%d val=%d scale=%g "
        "devices=%d", epochs, eff_bs, learning_rate, n_train, n_val, img_scale, n_dev,
    )

    sample = dataset[0]
    key = jax.random.PRNGKey(0)
    variables = net.init(key, jnp.zeros((1, *sample["image"].shape)))
    tx = adam(learning_rate)
    mstate = ModuleState.from_variables(variables)
    state = TrainState(step=jnp.zeros([], jnp.int32), model=mstate,
                       opt_state=tx.init(mstate.params), rng=key)
    if args.load:
        if str(args.load).endswith((".pth", ".pt")):
            from face_mask_inpaint_tpu.tools.convert_torch import (
                convert_unet, load_torch_state_dict)
            conv = jax.tree.map(jnp.asarray, convert_unet(
                load_torch_state_dict(args.load)))
            state = state.replace(model=ModuleState.from_variables(conv))
        else:
            state = ckpt.restore_state(args.load, state)
        logging.info("Model loaded from %s", args.load)
    state = replicate_tree(state, mesh)

    train_step = jax.jit(make_unet_train_step(net, tx), donate_argnums=0)
    eval_step = jax.jit(make_unet_eval_step(net))

    def evaluate(st):
        scores = [float(eval_step(st, b)["dice"]) for b in val_loader]
        return float(np.mean(scores)) if scores else 0.0

    from face_mask_inpaint_tpu.utils.profiling import ProfileWindow
    profiler = ProfileWindow(args.profile_dir, args.profile_steps)

    global_step = 0
    # plateau tracking ('max' mode, patience=2) — drives LR scale by rebuild
    best, patience_left, lr_scale = -1.0, 2, 1.0
    try:
        for epoch in range(epochs):
            epoch_loss = 0.0
            for batch in train_loader:
                profiler.tick(global_step)
                batch = {"image": batch["image"],
                         "mask": (np.asarray(batch["mask"]) > 0).astype(np.int32)}
                state, metrics = train_step(state, batch)
                loss = float(metrics["loss"])
                epoch_loss += loss
                global_step += 1
                logger.log({"train loss": loss, "epoch": epoch}, step=global_step)

                division_step = n_train // (10 * eff_bs)
                if division_step > 0 and global_step % division_step == 0:
                    val_score = evaluate(state)
                    if val_score > best + 1e-4:
                        best, patience_left = val_score, 2
                    else:
                        patience_left -= 1
                        if patience_left < 0:
                            lr_scale *= 0.1
                            patience_left = 2
                    logging.info("Validation Dice score: %s", val_score)
                    logger.log({"validation Dice": val_score,
                                "learning rate": learning_rate * lr_scale},
                               step=global_step)
            if save_checkpoint:
                path = ckpt.save_state(args.dir_checkpoint, "unet", epoch + 1,
                                       jax.device_get(state))
                logging.info("Checkpoint %d saved to %s!", epoch + 1, path)
    except KeyboardInterrupt:
        ckpt.save_state(args.dir_checkpoint, "INTERRUPTED", 0, jax.device_get(state))
        logging.info("Saved interrupt")
        sys.exit(0)
    finally:
        profiler.close()
        logger.close()
    return state


if __name__ == "__main__":
    args = get_args()
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    logging.info("Using devices %s", jax.devices())
    net = MaskDetector(n_channels=3, bilinear=True, threshold=args.threshold,
                       dtype=jnp.bfloat16 if args.amp else jnp.float32)
    logging.info("Network: 3 input channels, 2 output classes, bilinear upscaling")
    train_net(net=net, args=args, epochs=args.epochs, batch_size=args.batch_size,
              learning_rate=args.lr, img_scale=args.scale,
              val_percent=args.val / 100)
