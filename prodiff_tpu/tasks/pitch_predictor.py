"""Pitch-predictor train task (reference ``component/train_task/pitch_predictor``).

Trains the delta-pitch rectified flow with random retake masks. The
reference's ``random_retake_masks`` is missing its return statement
(SURVEY §2.11.2), which silently disables retake training; the intended
behaviour (whole-segment masks 1/4 of the time OR'd with random continuous
span masks) is implemented here, toggleable via ``use_pitch_retake``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import jax
import numpy as np

from prodiff_tpu.data.collate import collate_1d
from prodiff_tpu.data.dataset import BaseDataset
from prodiff_tpu.models.pitch_predictor import PitchPredictor
from prodiff_tpu.ops.losses import spec_loss_reflow
from prodiff_tpu.tasks import register_task
from prodiff_tpu.tasks.base import BaseTask
from prodiff_tpu.utils.pitch_utils import random_continuous_masks
from prodiff_tpu.utils.text_encoder import TokenTextEncoder


def random_retake_masks(rng: np.random.Generator, b: int, t: int) -> np.ndarray:
    """~1/4 whole segments + random spans -> ~1/2 of frames retaken on average."""
    b_masks = rng.integers(0, 4, size=(b, 1)) == 0
    t_masks = random_continuous_masks(rng, b, t, dim=1)
    return (b_masks | t_masks).astype(np.int32)


class PitchPredictorDataset(BaseDataset):
    time_keys = {
        "ph_seq": 1, "mel2ph": 1, "note_midi": 1, "note_rest": 1,
        "mel2note": 1, "pitch": 1, "base_pitch": 1, "pitch_retake": 1,
    }
    pad_values = {"note_midi": -1.0, "note_rest": True}
    length_source = {"pitch_retake": "mel2note"}  # derived mask, mel-axis

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
            "pitch": collate_1d([np.asarray(s["pitch"], np.float32) for s in samples], 0.0),
            "base_pitch": collate_1d(
                [np.asarray(s["base_pitch"], np.float32) for s in samples], 0.0
            ),
        }
        if self.hparams.get("use_spk_id", True):
            batch["spk_id"] = np.asarray([s["spk_id"] for s in samples], np.int32)
        if self.hparams.get("use_pitch_retake", True):
            b, t = batch["mel2note"].shape
            batch["pitch_retake"] = random_retake_masks(self._rng, b, t)
        return batch


@register_task("pitch")
class PitchPredictorTask(BaseTask):
    dataset_cls = PitchPredictorDataset

    def __init__(self, hparams):
        super().__init__(hparams)
        self.f0_prediction_args = hparams["f0_prediction_args"]
        self.loss_type = self.f0_prediction_args["loss_type"]

    def build_phone_category_encoder(self) -> TokenTextEncoder:
        fn = os.path.join(self.data_dir, "ph_category_list.json")
        with open(fn) as f:
            ph_category_list = json.load(f)
        self.ph_category_encoder = TokenTextEncoder(ph_category_list, replace_oov="SP")
        return self.ph_category_encoder

    def build_model(self):
        self.build_phone_category_encoder()
        self.model = PitchPredictor(len(self.ph_category_encoder), self.hparams)
        return self.model

    def _inputs(self, batch):
        return (
            batch["ph_seq"], batch["mel2ph"], batch["note_midi"],
            batch["note_rest"], batch["mel2note"], batch["base_pitch"],
        )

    def init_params(self, rng, batch):
        return self.model.init(
            {"params": rng, "diffusion": jax.random.fold_in(rng, 1)},
            *self._inputs(batch),
            pitch=batch["pitch"],
            pitch_retake=batch.get("pitch_retake"),
            spk_id=batch.get("spk_id"),
        )

    def compute_losses(self, params, batch, rng, deterministic=False):
        rngs = {
            "diffusion": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2),
        }
        v_pred, v_gt, t = self.model.apply(
            params, *self._inputs(batch),
            pitch=batch["pitch"],
            pitch_retake=batch.get("pitch_retake"),
            spk_id=batch.get("spk_id"),
            deterministic=deterministic, rngs=rngs,
        )
        non_padding = batch["mel2note"] > 0
        return spec_loss_reflow(
            v_pred, v_gt, t, non_padding, self.loss_type, log_norm=True, name="pitch"
        )

    def validation_plots(self, params, batch, step, out_dir, writer=None):
        if out_dir is None:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        delta = np.asarray(
            self.model.apply(
                params, *self._inputs(batch),
                pitch_expr=np.ones((len(batch["ph_seq"]), 1), np.float32),
                spk_id=batch.get("spk_id"),
                infer=True,
                rngs={"diffusion": jax.random.PRNGKey(step)},
            )
        )
        pred = np.asarray(batch["base_pitch"]) + delta
        gt = np.asarray(batch["pitch"])
        os.makedirs(out_dir, exist_ok=True)
        n = min(self.hparams.get("num_valid_plots", 10), len(gt))
        for i in range(n):
            fig = plt.figure(figsize=(12, 4))
            plt.plot(gt[i], label="gt")
            plt.plot(pred[i], label="pred")
            plt.legend()
            fig.savefig(os.path.join(out_dir, f"pitch_{i}_step{step}.png"))
            if writer is not None:
                writer.add_figure(f"pitch_val_{i}", fig, step)
            plt.close(fig)
