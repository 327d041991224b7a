"""Checkpoint save/restore via orbax.

Upgrades the reference's per-epoch ``torch.save(state_dict())``
(train_reference_fill.py:410-415, train_psp.py:388-391,
train_mask_detector.py:178-181) to full-train-state checkpoints: params,
optimizer state, auxiliary collections (spectral u/v, batch stats), PRNG key
and step — so training actually resumes (the reference never restores
optimizer/step state; see SURVEY.md §5).

Layout on disk: <checkpoint_path>/<run_name>/<tag>_epoch<N>/ mirroring the
reference's {G,D}_checkpoint_epoch{n}.pth naming.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = [
    "save_state",
    "restore_state",
    "latest_epoch",
    "checkpoint_dir",
    "restore_module_variables",
]


def checkpoint_dir(checkpoint_path, run_name: str) -> Path:
    d = Path(checkpoint_path) / run_name
    d.mkdir(parents=True, exist_ok=True)
    return d


def save_state(base_dir, tag: str, epoch: int, state: Any) -> Path:
    """Save a pytree under <base_dir>/<tag>_checkpoint_epoch<epoch>."""
    path = Path(base_dir) / f"{tag}_checkpoint_epoch{epoch}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path.absolute(), state, force=True)
    return path


def restore_state(path, target: Optional[Any] = None) -> Any:
    """Restore a pytree; with ``target`` the result matches its structure,
    dtypes and shardings."""
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(Path(path).absolute(), target)
        return ckptr.restore(Path(path).absolute())


def restore_module_variables(path, variables: dict) -> dict:
    """Load a checkpoint's module weights onto a flax ``variables`` dict.

    Accepts any of the layouts this repo has written: a raw variables dict
    (inference-era saves), a full-train-state dict with a ``model`` entry (the
    trainers' resumable checkpoints), or a (ModuleState, opt_state) pair
    (round-1 GAN saves). Tensors are merged by flattened key + shape
    (strict=False semantics, PICNet_inference.py:155 in the reference).
    """
    import flax.traverse_util as tu
    import jax.numpy as jnp

    raw = restore_state(path)
    node = raw
    # trainer layouts: {'model': ..., 'opt': ...} or {'state': {'model': ...}}
    for key in ("state", "model"):
        if isinstance(node, dict) and key in node:
            node = node[key]
    if isinstance(node, (list, tuple)):
        node = node[0]
    # a ModuleState restored without target is a dict of its fields
    if isinstance(node, dict) and "extra" in node and "params" in node:
        flat_node = {}
        for coll in ("params", "spectral", "batch_stats"):
            if node.get(coll):
                flat_node[coll] = node[coll]
        for k, v in (node.get("extra") or {}).items():
            flat_node[k] = v
        node = flat_node
    if not isinstance(node, dict) or "params" not in node:
        raise ValueError(f"unrecognized checkpoint layout at {path}")

    flat = tu.flatten_dict(variables)
    merged = 0
    for k, v in tu.flatten_dict(node).items():
        arr = jnp.asarray(v)
        if k in flat and flat[k].shape == arr.shape:
            flat[k] = arr.astype(flat[k].dtype)
            merged += 1
    if merged == 0:
        raise ValueError(f"checkpoint at {path} matched no tensors")
    return tu.unflatten_dict(flat)


def latest_epoch(base_dir, tag: str) -> Optional[int]:
    """Highest epoch number among <tag>_checkpoint_epoch* dirs, or None."""
    base = Path(base_dir)
    if not base.exists():
        return None
    best = None
    pat = re.compile(rf"^{re.escape(tag)}_checkpoint_epoch(\d+)$")
    for p in base.iterdir():
        m = pat.match(p.name)
        if m:
            e = int(m.group(1))
            best = e if best is None or e > best else best
    return best
