"""Base train task: owns the model definition, datasets and the pure loss fn.

The reference couples task + trainer through an nn.Module with
training_step/validation_step methods dispatched through a DDP wrapper
(``component/train_task/base_task.py``). Here a task exposes:

- ``build_model()`` -> flax module
- ``init_params(rng, batch)``
- ``compute_losses(params, batch, rng, deterministic)`` -> dict of scalars,
  a PURE function the trainer jits once over the device mesh
- ``validation_plots(params, batch, step, out_dir)`` -> host-side figures

Total loss = sum of the dict values (the reference sums all grad-requiring
loss tensors, ``base_task.py:202-229``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.data.dataset import BaseDataset, BatchIterator
from prodiff_tpu.utils.text_encoder import TokenTextEncoder


class BaseTask:
    dataset_cls = None

    def __init__(self, hparams: dict):
        self.hparams = hparams
        self.data_dir = os.path.join(hparams["data_dir"], hparams["task"])
        self.max_tokens = hparams["max_tokens"]
        self.max_sentences = hparams["max_sentences"]
        self.max_valid_tokens = hparams.get("max_valid_tokens", -1)
        if self.max_valid_tokens == -1:
            self.max_valid_tokens = self.max_tokens
        self.max_valid_sentences = hparams.get("max_valid_sentences", -1)
        if self.max_valid_sentences == -1:
            self.max_valid_sentences = self.max_sentences
        self.model = None

    # ---- vocab -----------------------------------------------------------

    def build_phone_encoder(self) -> TokenTextEncoder:
        ph_map_fn = os.path.join(self.data_dir, "phone_set.json")
        with open(ph_map_fn) as f:
            self.ph_map = json.load(f)
        ph_list = list(sorted(set(self.ph_map.values())))
        self.ph_encoder = TokenTextEncoder(ph_list, replace_oov="SP")
        return self.ph_encoder

    # ---- model -----------------------------------------------------------

    def build_model(self):
        raise NotImplementedError

    def init_params(self, rng: jax.Array, batch: Dict[str, np.ndarray]):
        raise NotImplementedError

    def compute_losses(
        self, params, batch, rng: jax.Array, deterministic: bool = False
    ) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    # ---- data ------------------------------------------------------------

    def train_iterator(self, n_devices: int = 1, local_block=None) -> BatchIterator:
        ds: BaseDataset = self.dataset_cls(
            prefix=self.hparams.get("train_set_name", "train"),
            shuffle=True,
            hparams=self.hparams,
        )
        return BatchIterator(
            ds,
            max_tokens=self.max_tokens * n_devices,
            max_sentences=self.max_sentences,
            required_batch_size_multiple=n_devices,
            local_block=local_block,
        )

    def val_iterator(self, n_devices: int = 1, local_block=None) -> BatchIterator:
        ds: BaseDataset = self.dataset_cls(
            prefix=self.hparams.get("valid_set_name", "valid"),
            shuffle=False,
            hparams=self.hparams,
        )
        return BatchIterator(
            ds,
            max_tokens=self.max_valid_tokens,
            max_sentences=self.max_valid_sentences,
            required_batch_size_multiple=n_devices,
            local_block=local_block,
        )

    # ---- validation extras (host side) ------------------------------------

    def validation_plots(self, params, batch, step: int, out_dir: Optional[str],
                         writer=None):
        """Qualitative val artifacts: PNGs under ``out_dir`` and, when a
        MetricsWriter is passed, TensorBoard figures (the reference's
        ``add_figure`` observability surface)."""
        pass
