"""Duration-predictor train task (reference ``component/train_task/dur_predictor``)."""

from __future__ import annotations

from typing import Dict, List

import jax
import numpy as np

from prodiff_tpu.data.collate import collate_1d
from prodiff_tpu.data.dataset import BaseDataset
from prodiff_tpu.models.duration import DurPredictor
from prodiff_tpu.ops.losses import dur_loss
from prodiff_tpu.tasks import register_task
from prodiff_tpu.tasks.base import BaseTask


class DurPredictorDataset(BaseDataset):
    time_keys = {"ph_seq": 1, "ph_dur": 1, "word_dur": 1, "onset": 1}

    def collater(self, samples: List[dict]) -> Dict[str, np.ndarray]:
        if len(samples) == 0:
            return {}
        return {
            "nsamples": len(samples),
            "ph_seq": collate_1d([np.asarray(s["ph_seq"], np.int32) for s in samples], 0),
            "ph_dur": collate_1d([np.asarray(s["ph_dur"], np.float32) for s in samples], 0.0),
            "word_dur": collate_1d([np.asarray(s["word_dur"], np.float32) for s in samples], 0.0),
            "onset": collate_1d([np.asarray(s["onset"], np.int32) for s in samples], 0),
        }


@register_task("dur")
class DurPredictorTask(BaseTask):
    dataset_cls = DurPredictorDataset

    def __init__(self, hparams):
        super().__init__(hparams)
        loss_args = hparams["dur_prediction_args"]
        self.loss_log_offset = loss_args["log_offset"]
        self.lambdas = (
            loss_args["lambda_pdur_loss"],
            loss_args["lambda_wdur_loss"],
            loss_args["lambda_sdur_loss"],
        )

    def build_model(self):
        self.build_phone_encoder()
        self.model = DurPredictor(len(self.ph_encoder), self.hparams)
        return self.model

    def init_params(self, rng, batch):
        return self.model.init(
            {"params": rng},
            batch["ph_seq"], batch["onset"], batch["word_dur"],
        )

    def compute_losses(self, params, batch, rng, deterministic=False):
        dur_pred = self.model.apply(
            params, batch["ph_seq"], batch["onset"], batch["word_dur"],
            infer=False, deterministic=deterministic,
            rngs={"dropout": jax.random.fold_in(rng, 2)},
        )
        loss = dur_loss(
            dur_pred,
            batch["ph_dur"],
            batch["onset"],
            log_offset=self.loss_log_offset,
            lambda_pdur=self.lambdas[0],
            lambda_wdur=self.lambdas[1],
            lambda_sdur=self.lambdas[2],
        )
        return {"dur": loss}

    def validation_plots(self, params, batch, step, out_dir, writer=None):
        dur_pred = np.asarray(
            self.model.apply(
                params, batch["ph_seq"], batch["onset"], batch["word_dur"], infer=True
            )
        )
        ph_text = self.ph_encoder.decode(np.asarray(batch["ph_seq"])[0]).split()
        print(
            f"ph_text: {ph_text}\ndur_tgt: {np.asarray(batch['ph_dur'])[0]}\n"
            f"dur_pred: {dur_pred[0]}"
        )
