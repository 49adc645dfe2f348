"""Binarizers: raw labelled audio -> indexed binary training shards.

Registry + handler mirror the reference (``component/binarizer/base.py``,
``handler/binarize/handler.py``): items split valid/test/train by prefix
slices, per-item feature extraction, IndexedDataset shards plus
``{prefix}_lengths.npy`` and ``{prefix}_f0s_mean_std.npy`` sidecars.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
from tqdm import tqdm

from prodiff_tpu.utils.indexed_datasets import IndexedDatasetBuilder

BINARIZERS: Dict[str, type] = {}


def register_binarizer(cls):
    BINARIZERS[cls.category()] = cls
    return cls


def get_binarizer_cls(task: str):
    from prodiff_tpu.binarize import svs  # noqa: F401

    try:
        from prodiff_tpu.binarize import dur_predictor  # noqa: F401
        from prodiff_tpu.binarize import pitch_predictor  # noqa: F401
        from prodiff_tpu.binarize import vari_predictor  # noqa: F401
    except ImportError:
        pass
    if task not in BINARIZERS:
        raise ValueError(f"Binarizer {task} not found in {sorted(BINARIZERS)}")
    return BINARIZERS[task]


class Binarizer:
    def __init__(self, hparams: dict):
        self.hparams = hparams
        self.datasets: List[dict] = hparams["datasets"]
        self.data_dir = os.path.join(hparams["data_dir"], self.category())
        os.makedirs(self.data_dir, exist_ok=True)

    def load_meta_data(self) -> list:
        raise NotImplementedError

    def process_item(self, item: dict) -> dict:
        raise NotImplementedError

    @staticmethod
    def category() -> str:
        raise NotImplementedError


class BinarizeHandler:
    def __init__(self, hparams: dict):
        self.hparams = hparams
        self.binarizer: Binarizer = get_binarizer_cls(hparams["task"])(hparams)
        self.binary_data_dir = os.path.join(
            hparams["data_dir"], self.binarizer.category()
        )
        self.transcription_item_list = self.binarizer.load_meta_data()

    def get_transcription_item_list(self, prefix: str):
        hp = self.hparams
        n = len(self.transcription_item_list)
        if prefix == "valid":
            idxs = range(0, min(hp["test_num"] + hp["valid_num"], n))
        elif prefix == "test":
            idxs = range(0, min(hp["test_num"], n))
        else:
            idxs = range(min(hp["test_num"] + hp["valid_num"], n), n)
        for i in idxs:
            yield self.transcription_item_list[i]

    def process_data(self, prefix: str):
        data_dir = self.binary_data_dir
        builder = IndexedDatasetBuilder(
            data_dir, prefix, segment_size=self.hparams.get("idx_ds_segment_size", 1024)
        )
        lengths, f0s, total_sec = [], [], 0.0
        item_lengths: Dict[str, list] = {}
        for item in tqdm(self.get_transcription_item_list(prefix), desc=prefix):
            preprocessed_item = self.binarizer.process_item(item)
            builder.add_item(preprocessed_item)
            total_sec += preprocessed_item.get("sec", 0)
            assert "length" in preprocessed_item, "items must carry 'length'"
            lengths.append(preprocessed_item["length"])
            if "f0" in preprocessed_item:
                f0s.append(preprocessed_item["f0"])
            # per-key leading-dim lengths: lets each multi-host process compute
            # the batch's global padded shapes WITHOUT loading other processes'
            # items (data/dataset.py local collation)
            for k, v in preprocessed_item.items():
                arr = np.asarray(v)
                if arr.ndim >= 1:
                    item_lengths.setdefault(k, []).append(arr.shape[0])
        builder.finalize()

        if lengths:
            np.save(f"{data_dir}/{prefix}_lengths.npy", lengths)
            full = {
                k: np.asarray(v, np.int64)
                for k, v in item_lengths.items()
                if len(v) == len(lengths)
            }
            if full:
                np.savez(f"{data_dir}/{prefix}_item_lengths.npz", **full)
        if f0s:
            f0s = np.concatenate(f0s, 0)
            f0s = f0s[f0s != 0]
            np.save(
                f"{data_dir}/{prefix}_f0s_mean_std.npy",
                [np.mean(f0s).item(), np.std(f0s).item()],
            )
        if total_sec > 0:
            print(f"| {prefix} total duration: {total_sec:.3f}s")

    def handle(self):
        self.process_data("valid")
        self.process_data("test")
        self.process_data("train")
