"""Datasets over binarized shards + the batch iterator feeding the TPU.

``BaseDataset`` mirrors the reference (``component/train_task/base_dataset.py``):
IndexedDataset-backed, ``{prefix}_lengths.npy`` sizes, ``max_frames`` clamp,
shuffled-then-mergesorted ordering. ``BatchIterator`` replaces the torch
DataLoader + DDP rank-sharding: batches are token-bucketed, collated to numpy,
padded to quantised (B, T) buckets (static shapes for jit), and prefetched on a
background thread. Under SPMD each global batch is sharded over the device
mesh by the trainer — there is no per-rank batch list.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from prodiff_tpu.data.collate import (
    batch_by_size,
    bucket_batch_size,
    pad_to_buckets,
    pad_to_shape,
    round_up,
)
from prodiff_tpu.utils.indexed_datasets import IndexedDataset


class BaseDataset:
    def __init__(self, prefix: str, shuffle: bool, hparams: dict):
        self.hparams = hparams
        self.shuffle = shuffle
        self.sort_by_len = hparams.get("sort_by_len", True)
        self.data_dir = os.path.join(hparams["data_dir"], hparams["task"])
        self.prefix = prefix
        self.sizes = np.load(f"{self.data_dir}/{self.prefix}_lengths.npy")
        # per-key per-item lengths sidecar (written at binarize time): lets a
        # multi-host process compute global padded shapes without loading
        # other processes' items
        il_path = f"{self.data_dir}/{self.prefix}_item_lengths.npz"
        self.item_lengths: Optional[Dict[str, np.ndarray]] = None
        if os.path.exists(il_path):
            with np.load(il_path) as z:
                self.item_lengths = {k: z[k] for k in z.files}
        self.indexed_ds: Optional[IndexedDataset] = None
        self._rng = np.random.default_rng(hparams.get("seed", 1234))

    def __len__(self) -> int:
        return len(self.sizes)

    def __getitem__(self, index: int) -> dict:
        if self.indexed_ds is None:
            self.indexed_ds = IndexedDataset(
                self.data_dir,
                self.prefix,
                segment_size=self.hparams.get("idx_ds_segment_size", 1024),
            )
        return self.indexed_ds[index]

    def size(self, index: int) -> int:
        return int(min(self.sizes[index], self.hparams["max_frames"]))

    def num_tokens(self, index: int) -> int:
        return self.size(index)

    def ordered_indices(self) -> np.ndarray:
        if self.shuffle:
            indices = self._rng.permutation(len(self))
            if self.sort_by_len:
                indices = indices[np.argsort(np.asarray(self.sizes)[indices], kind="mergesort")]
        else:
            indices = np.arange(len(self))
        return indices

    def collater(self, samples: List[dict]) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    # static-shape metadata, overridden per task
    time_keys: Dict[str, int] = {}
    pad_values: Dict[str, float] = {}
    # batch keys derived in the collater whose length tracks another item key
    # (e.g. pitch_retake masks follow mel2note) — used by local collation
    length_source: Dict[str, str] = {}

    def pad_batch(
        self, batch: Dict[str, np.ndarray], batch_multiple: int = 1
    ) -> Dict[str, np.ndarray]:
        return pad_to_buckets(
            batch,
            time_keys=self.time_keys,
            batch_buckets=self.hparams.get("batch_size_buckets", [1, 2, 4, 8, 16, 32, 48]),
            length_bucket_step=self.hparams.get("length_bucket_step", 128),
            pad_values=self.pad_values,
            batch_multiple=batch_multiple,
        )


class BatchIterator:
    """Token-bucketed, bucket-padded, background-prefetched batch stream."""

    def __init__(
        self,
        dataset: BaseDataset,
        max_tokens: int,
        max_sentences: int,
        required_batch_size_multiple: int = 1,
        prefetch: int = 4,
        local_block: Optional[Tuple[int, int, int]] = None,
    ):
        """``local_block=(lo, hi, n_blocks)`` switches to multi-host local
        collation: this process loads ONLY the rows its addressable devices
        own — the scale-correct analogue of the reference's per-rank
        ``batches[rank::world]`` slicing
        (``component/train_task/base_task.py:123-126``) — while padded shapes
        stay globally consistent via the ``{prefix}_item_lengths.npz``
        sidecar. Yielded batches carry ``_local_rows=(row0, global_B)`` for
        ``parallel.mesh.shard_batch`` to assemble the global jax.Array."""
        self.dataset = dataset
        self.max_tokens = max_tokens if max_tokens and max_tokens > 0 else None
        self.max_sentences = max_sentences if max_sentences and max_sentences > 0 else None
        self.bsz_mult = required_batch_size_multiple
        self.prefetch = prefetch
        self.local_block = local_block
        if local_block is not None and dataset.item_lengths is None:
            raise ValueError(
                "multi-host per-process loading needs the "
                f"{dataset.prefix}_item_lengths.npz sidecar (re-binarize with "
                "this version, or pass local_block=None to fall back to "
                "global loading)"
            )

    def _make_batches(self) -> List[List[int]]:
        indices = self.dataset.ordered_indices()
        return batch_by_size(
            indices,
            self.dataset.num_tokens,
            max_tokens=self.max_tokens,
            max_sentences=self.max_sentences,
            required_batch_size_multiple=self.bsz_mult,
        )

    def __len__(self) -> int:
        return len(self._make_batches())

    def _produce(self, batches: Sequence[Sequence[int]], q: "queue.Queue"):
        try:
            for idxs in batches:
                if self.local_block is not None:
                    q.put(self._local_batch(list(idxs)))
                    continue
                samples = [self.dataset[i] for i in idxs]
                batch = self.dataset.collater(samples)
                q.put(self.dataset.pad_batch(batch, batch_multiple=self.bsz_mult))
        except Exception as e:  # surface loader errors on the consumer side
            q.put(e)
        finally:
            q.put(None)

    def _local_batch(self, idxs: List[int]) -> Dict[str, np.ndarray]:
        """Collate only this process's rows of the global batch, padded to the
        globally-agreed shapes (identical to what the single-host path would
        produce for the same index batch)."""
        ds = self.dataset
        hp = ds.hparams
        buckets = hp.get("batch_size_buckets", [1, 2, 4, 8, 16, 32, 48])
        step = hp.get("length_bucket_step", 128)
        lo, hi, n_blocks = self.local_block
        B = len(idxs)
        b_pad = round_up(bucket_batch_size(B, buckets), self.bsz_mult)
        assert b_pad % n_blocks == 0, (b_pad, n_blocks)
        row0, row1 = lo * b_pad // n_blocks, hi * b_pad // n_blocks
        local_idx = [idxs[r] for r in range(row0, min(row1, B))]
        # a process whose rows are all padding still needs correctly-typed
        # zero arrays: collate one template item and drop its row
        template_only = not local_idx
        samples = [ds[i] for i in (local_idx or [idxs[0]])]
        batch = ds.collater(samples)
        if template_only:
            batch = {
                k: v[:0] if isinstance(v, np.ndarray) and v.ndim >= 1 else v
                for k, v in batch.items()
            }
        # global target lengths from the index-level sidecar
        t_targets: Dict[str, int] = {}
        for k, v in batch.items():
            if not isinstance(v, np.ndarray) or v.ndim < 2 and k not in ds.time_keys:
                continue
            src = ds.length_source.get(k, k)
            lens = ds.item_lengths.get(src) if ds.item_lengths else None
            if lens is None:
                raise ValueError(
                    f"no index-level length for batch key {k!r} (item key "
                    f"{src!r}); add it to the binarizer output or map it via "
                    "length_source"
                )
            t = int(lens[np.asarray(idxs)].max())
            if k in ds.time_keys:
                t = round_up(max(t, 1), step)
            t_targets[k] = t
        out = pad_to_shape(
            batch,
            time_keys={k: ds.time_keys.get(k, 1) for k in t_targets},
            t_targets=t_targets,
            b_target=row1 - row0,
            pad_values=ds.pad_values,
        )
        out["nsamples"] = B  # global sample count (val-loss weighting)
        out["_local_rows"] = (row0, b_pad)
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._make_batches()
        if self.dataset.shuffle:
            # shuffle batch order (sizes stay grouped within batches)
            rng = self.dataset._rng
            order = rng.permutation(len(batches))
            batches = [batches[i] for i in order]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(batches, q), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item
