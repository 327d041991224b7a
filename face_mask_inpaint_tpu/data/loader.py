"""Host-side batching + prefetch, feeding sharded device arrays.

Replaces torch's DataLoader worker processes (dataloader.py:19-46,
num_workers=4, pin_memory) with a thread-pool prefetch pipeline: items are
decoded/resized in threads (PIL releases the GIL for JPEG decode), stacked,
then jax.device_put either to a single device or sharded over the data axis
of a mesh — the TPU analogue of pinned-memory H2D overlap.

Multi-host: on a multi-process runtime each host loads only its contiguous
slice of every global batch (disjoint per-process index sets; the shuffle
RNG is seed-identical across hosts so the global order agrees) and the
global sharded array is assembled with
``jax.make_array_from_process_local_data`` — batches ride the host's own
DCN link, params all-reduce over ICI.
"""

from __future__ import annotations

import math
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import jax
import numpy as np

__all__ = ["split_dataset", "DataLoader", "get_reference_dataloader"]


def split_dataset(n: int, val_amount: float, seed: int = 0):
    """Deterministic random train/val index split (reference uses
    torch.random_split with n_train = floor(n*(1-val)), dataloader.py:38-41)."""
    n_train = math.floor(n * (1 - val_amount))
    perm = np.random.RandomState(seed).permutation(n)
    return perm[:n_train].tolist(), perm[n_train:].tolist()


class DataLoader:
    """Threaded batch loader over an indexable dataset of dict[str, ndarray]."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        indices: Optional[Sequence[int]] = None,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        sharding: Optional[jax.sharding.Sharding] = None,
        pad_last: bool = False,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = list(indices) if indices is not None else list(range(len(dataset)))
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.sharding = sharding
        self.pad_last = pad_last
        # per-host input sharding; explicit values keep it unit-testable on a
        # single-process CPU backend
        self.process_index = (
            jax.process_index() if process_index is None else process_index)
        self.process_count = (
            jax.process_count() if process_count is None else process_count)
        if self.process_count > 1 and batch_size % self.process_count:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{self.process_count} processes")
        self._rng = np.random.RandomState(seed)

    def local_indices(self, chunk: Sequence[int]) -> list[int]:
        """This host's contiguous slice of one global batch's indices."""
        if self.process_count == 1:
            return list(chunk)
        local_bs = self.batch_size // self.process_count
        lo = self.process_index * local_bs
        return list(chunk[lo : lo + local_bs])

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def _collate(self, items: list[dict]) -> dict:
        from face_mask_inpaint_tpu.data import _native

        def stack(vals):
            if vals[0].dtype == np.float32 and _native.available():
                return _native.collate_f32(list(vals))
            return np.stack(vals)

        batch = {k: stack([it[k] for it in items]) for k in items[0]}
        if self.pad_last and len(items) < self.batch_size:
            pad = self.batch_size - len(items)
            batch = {
                k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                for k, v in batch.items()
            }
            batch["_valid"] = np.asarray(
                [1] * len(items) + [0] * pad, np.float32
            )
        if self.sharding is not None:
            if self.process_count > 1:
                # local [batch/hosts, ...] slabs -> one global sharded array
                batch = {
                    k: jax.make_array_from_process_local_data(self.sharding, v)
                    for k, v in batch.items()
                }
            else:
                batch = {k: jax.device_put(v, self.sharding)
                         for k, v in batch.items()}
        return batch

    def __iter__(self) -> Iterator[dict]:
        order = list(self.indices)
        if self.shuffle:
            self._rng.shuffle(order)
        steps = []
        for i in range(0, len(order), self.batch_size):
            chunk = order[i : i + self.batch_size]
            if len(chunk) < self.batch_size and (
                self.drop_last or self.process_count > 1
            ):
                # partial global batches cannot split evenly across hosts
                continue
            steps.append(self.local_indices(chunk))

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        stop = threading.Event()

        def produce():
            try:
                for chunk in steps:
                    if stop.is_set():
                        return
                    items = list(pool.map(self.dataset.__getitem__, chunk))
                    q.put(self._collate(items))
                q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)


def get_reference_dataloader(
    dir_src_img,
    dir_ref_img,
    dir_mask,
    identity_file,
    batch_size,
    apply_transform: bool = False,
    val_amount: float = 0.1,
    num_workers: int = 4,
    img_scale: float = 1.0,
    use_ssim: bool = False,
    device=None,
    seed: int = 0,
    sharding: Optional[jax.sharding.Sharding] = None,
):
    """Reference get_reference_dataloader surface (dataloader.py:19-46):
    train loader shuffled, val loader drop_last."""
    from face_mask_inpaint_tpu.data.dataset import ReferenceDataset

    dataset = ReferenceDataset(
        dir_src_img, dir_ref_img, dir_mask, identity_file,
        apply_transform=apply_transform, scale=img_scale, use_ssim=use_ssim,
        device=device,
    )
    train_idx, val_idx = split_dataset(len(dataset), val_amount, seed)
    # Under a sharded mesh every global batch must divide evenly across
    # devices, so the trailing partial batch is dropped (the reference keeps
    # it — single-GPU torch has no such constraint).
    train_loader = DataLoader(
        dataset, batch_size, train_idx, shuffle=True, num_workers=num_workers,
        seed=seed, sharding=sharding, drop_last=sharding is not None,
    )
    val_loader = DataLoader(
        dataset, batch_size, val_idx, shuffle=False, drop_last=True,
        num_workers=num_workers, seed=seed, sharding=sharding,
    )
    return train_loader, val_loader
