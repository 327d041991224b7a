"""Experiment metric logging.

The reference logs everything to wandb (per-step scalars, periodic
weight/grad histograms and image samples, train_reference_fill.py:283-291,
352-357, 372-398). wandb is optional here: the same keys go to a JSONL file
per run, and to wandb when the package is importable and enabled.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Optional

import numpy as np

__all__ = ["MetricsLogger", "histogram_summary"]


def _to_scalar(v):
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    if isinstance(v, dict):
        return {k: _to_scalar(x) for k, x in v.items()}
    if isinstance(v, (list, tuple, set)):
        return [_to_scalar(x) for x in v]
    arr = np.asarray(v)
    if arr.dtype == object:
        return str(v)
    if arr.size == 1:
        return float(arr)
    return {
        "mean": float(arr.mean()),
        "std": float(arr.std()),
        "min": float(arr.min()),
        "max": float(arr.max()),
        "shape": list(arr.shape),
    }


def histogram_summary(tree, prefix: str) -> dict:
    """Weight/grad histograms per leaf (train_reference_fill.py:372-398).

    Returns the raw host arrays: MetricsLogger.log writes moment summaries
    to JSONL (via _to_scalar) and ships full ``wandb.Histogram`` payloads
    when wandb is active — matching the reference's
    ``wandb.Histogram(value.data.cpu())`` behavior."""
    import jax

    out = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[f"{prefix}/{name}"] = np.asarray(leaf)
    return out


class MetricsLogger:
    """JSONL writer + optional wandb mirror."""

    def __init__(
        self,
        run_dir,
        project: str = "face_mask_inpaint_tpu",
        run_name: str = "",
        config: Optional[dict] = None,
        use_wandb: bool = False,
    ):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.run_dir / "metrics.jsonl"
        self._fh = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, name=run_name or None, resume="allow",
                    config=config or {},
                )
            except Exception:
                self._wandb = None
        if config:
            self.log({"_config": config}, step=0)

    def log(self, metrics: dict[str, Any], step: Optional[int] = None):
        record = {"_time": time.time()}
        if step is not None:
            record["step"] = int(step)
        for k, v in metrics.items():
            record[k] = _to_scalar(v)
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            try:
                import wandb

                payload = {}
                for k, v in metrics.items():
                    if isinstance(v, (dict, str)):
                        continue
                    arr = np.asarray(v)
                    if arr.dtype == object:
                        continue
                    if arr.size == 1:
                        payload[k] = float(arr)
                    else:
                        # full histogram payload, as the reference ships
                        # (wandb.Histogram(value.data.cpu()))
                        payload[k] = wandb.Histogram(arr.reshape(-1))
                self._wandb.log(payload, step=step)
            except Exception:
                pass

    def log_image(self, name: str, image, step: Optional[int] = None):
        """Save an image sample under <run_dir>/images/ (the JSONL analogue of
        the reference's wandb.Image logging, train_reference_fill.py:372-398).

        image: [H, W, C] float in [0, 1] or [H, W] mask.
        """
        from PIL import Image

        img_dir = self.run_dir / "images"
        img_dir.mkdir(exist_ok=True)
        arr = np.asarray(image, np.float32)
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, axis=-1)
        arr = np.clip(arr, 0.0, 1.0)
        fname = f"{name}_{step if step is not None else 0}.png"
        Image.fromarray((arr * 255).astype("uint8")).save(img_dir / fname)
        if self._wandb is not None:
            try:
                import wandb

                self._wandb.log({name: wandb.Image(arr)}, step=step)
            except Exception:
                pass

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
