"""Variance-predictor train task (reference ``component/train_task/vari_predictor``).

The reference's vari path is broken at three points (SURVEY §2.11.3-5); this
is the working equivalent: the multi-feature diffusion trains on stacked
clamped curves with the ProDiff loss suite.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.data.collate import collate_1d
from prodiff_tpu.data.dataset import BaseDataset
from prodiff_tpu.models.vari_predictor import VariPredictor, variance_list
from prodiff_tpu.ops.losses import parse_loss_spec, spec_loss_prodiff
from prodiff_tpu.tasks import register_task
from prodiff_tpu.tasks.base import BaseTask


class VariPredictorDataset(BaseDataset):
    time_keys = {
        "ph_seq": 1, "mel2ph": 1, "note_midi": 1, "note_rest": 1,
        "mel2note": 1, "f0": 1, "voicing": 1, "breath": 1, "tension": 1,
    }
    pad_values = {"note_midi": -1.0, "note_rest": True}

    def collater(self, samples: List[dict]) -> Dict[str, np.ndarray]:
        if len(samples) == 0:
            return {}
        batch = {
            "nsamples": len(samples),
            "ph_seq": collate_1d([np.asarray(s["ph_seq"], np.int32) for s in samples], 0),
            "mel2ph": collate_1d([np.asarray(s["mel2ph"], np.int32) for s in samples], 0),
            "note_midi": collate_1d(
                [np.asarray(s["note_midi"], np.float32) for s in samples], -1.0
            ),
            "note_rest": collate_1d(
                [np.asarray(s["note_rest"], bool) for s in samples], True
            ),
            "mel2note": collate_1d(
                [np.asarray(s["mel2note"], np.int32) for s in samples], 0
            ),
            "f0": collate_1d([np.asarray(s["f0"], np.float32) for s in samples], 0.0),
        }
        if self.hparams.get("use_spk_id", True):
            batch["spk_id"] = np.asarray([s["spk_id"] for s in samples], np.int32)
        for name in variance_list(self.hparams):
            batch[name] = collate_1d(
                [np.asarray(s[name], np.float32) for s in samples], 0.0
            )
        return batch


@register_task("vari")
class VariPredictorTask(BaseTask):
    dataset_cls = VariPredictorDataset

    def __init__(self, hparams):
        super().__init__(hparams)
        self.variance_names = variance_list(hparams)
        self.loss_type = parse_loss_spec(hparams["vari_prediction_args"]["loss_type"])

    def build_model(self):
        self.build_phone_encoder()
        self.model = VariPredictor(len(self.ph_encoder), self.hparams)
        return self.model

    def _inputs(self, batch):
        return (
            batch["ph_seq"], batch["mel2ph"], batch["note_midi"],
            batch["note_rest"], batch["mel2note"], batch["f0"],
        )

    def _gt_curves(self, batch) -> jnp.ndarray:
        return jnp.stack([batch[name] for name in self.variance_names], axis=1)

    def init_params(self, rng, batch):
        return self.model.init(
            {"params": rng, "diffusion": jax.random.fold_in(rng, 1)},
            *self._inputs(batch),
            spk_embed_id=batch.get("spk_id"),
            gt_curves=self._gt_curves(batch),
        )

    def compute_losses(self, params, batch, rng, deterministic=False):
        rngs = {
            "diffusion": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2),
        }
        x0_pred, x0 = self.model.apply(
            params, *self._inputs(batch),
            spk_embed_id=batch.get("spk_id"),
            gt_curves=self._gt_curves(batch),
            deterministic=deterministic, rngs=rngs,
        )
        non_padding = batch["mel2note"] > 0
        return spec_loss_prodiff(x0_pred, x0, non_padding, self.loss_type, name="vari")

    def validation_plots(self, params, batch, step, out_dir, writer=None):
        if out_dir is None:
            return
        import os

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        curves = self.model.apply(
            params, *self._inputs(batch),
            spk_embed_id=batch.get("spk_id"), infer=True,
            rngs={"diffusion": jax.random.PRNGKey(step)},
        )
        os.makedirs(out_dir, exist_ok=True)
        n = min(self.hparams.get("num_valid_plots", 10), len(batch["ph_seq"]))
        for name, pred in curves.items():
            pred = np.asarray(pred)
            gt = np.asarray(batch[name])
            for i in range(n):
                fig = plt.figure(figsize=(12, 4))
                plt.plot(gt[i], label="gt")
                plt.plot(pred[i], label="pred")
                plt.legend()
                fig.savefig(os.path.join(out_dir, f"{name}_{i}_step{step}.png"))
                if writer is not None:
                    writer.add_figure(f"{name}_val_{i}", fig, step)
                plt.close(fig)
