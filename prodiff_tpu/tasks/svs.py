"""SVS acoustic-model train tasks.

``svs`` trains the ProDiffTeacher (``component/train_task/svs/task.py:13-100``);
``svs_rectified`` trains a bare student diffusion on binarized
(condition, x_T, x_0) teacher pairs (``task.py:102-171``) — the offline
progressive-distillation scheme.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.data.collate import collate_1d, collate_2d
from prodiff_tpu.data.dataset import BaseDataset
from prodiff_tpu.models.diffusion import GaussianDiffusion
from prodiff_tpu.models.prodiff import ProDiffTeacher
from prodiff_tpu.models.reflow import RectifiedFlow
from prodiff_tpu.models.wavenet import WaveNet
from prodiff_tpu.ops.losses import parse_loss_spec, spec_loss_prodiff, spec_loss_reflow
from prodiff_tpu.tasks import register_task
from prodiff_tpu.tasks.base import BaseTask


class SVSDataset(BaseDataset):
    time_keys = {"mel2ph": 1, "f0": 1, "mel": 1, "voicing": 1, "breath": 1, "tension": 1}

    def __init__(self, prefix, shuffle, hparams):
        super().__init__(prefix, shuffle, hparams)
        f0_stats_fn = f"{self.data_dir}/train_f0s_mean_std.npy"
        if os.path.exists(f0_stats_fn):
            self.f0_mean, self.f0_std = np.load(f0_stats_fn)
            hparams["f0_mean"], hparams["f0_std"] = float(self.f0_mean), float(self.f0_std)
        else:
            self.f0_mean = self.f0_std = None

    def collater(self, samples: List[dict]) -> Dict[str, np.ndarray]:
        if len(samples) == 0:
            return {}
        hp = self.hparams
        batch = {
            "nsamples": len(samples),
            "ph_seq": collate_1d([np.asarray(s["ph_seq"], np.int32) for s in samples], 0),
            "mel2ph": collate_1d([np.asarray(s["mel2ph"], np.int32) for s in samples], 0),
            "f0": collate_1d([np.asarray(s["f0"], np.float32) for s in samples], 0.0),
            "mel": collate_2d([np.asarray(s["mel"], np.float32) for s in samples], 0.0),
        }
        if hp.get("use_spk_id", True):
            batch["spk_id"] = np.asarray([s["spk_id"] for s in samples], np.int32)
        if hp.get("use_gender_id", False):
            batch["gender_id"] = np.asarray([s["gender_id"] for s in samples], np.int32)
        if hp.get("use_lang_id", True):
            batch["lang_seq"] = collate_1d(
                [np.asarray(s["lang_seq"], np.int32) for s in samples], 0
            )
        for key, flag in [
            ("voicing", "use_voicing_embed"),
            ("breath", "use_breath_embed"),
            ("tension", "use_tension_embed"),
        ]:
            if hp.get(flag, False) and key in samples[0]:
                batch[key] = collate_1d(
                    [np.asarray(s[key], np.float32) for s in samples], 0.0
                )
        return batch


class SVSRectifiedDataset(SVSDataset):
    time_keys = dict(SVSDataset.time_keys, condition=1, x_T=1, x_0=1)

    def collater(self, samples: List[dict]) -> Dict[str, np.ndarray]:
        batch = super().collater(samples)
        batch["condition"] = collate_2d(
            [np.asarray(s["condition"], np.float32) for s in samples], 0.0
        )
        # stored per item as [T, M]; kept [B, T, M] (framework layout)
        batch["x_T"] = collate_2d([np.asarray(s["x_T"], np.float32) for s in samples], 0.0)
        batch["x_0"] = collate_2d([np.asarray(s["x_0"], np.float32) for s in samples], 0.0)
        return batch


@register_task("svs")
class SVSTask(BaseTask):
    dataset_cls = SVSDataset

    def __init__(self, hparams):
        super().__init__(hparams)
        self.diffusion_type = hparams.get("diff_type", "prodiff")
        self.loss_type = parse_loss_spec(hparams["mel_loss"])
        self.loss_type_list = list(self.loss_type)

    def build_model(self):
        from prodiff_tpu.models.prodiff import resolve_train_bf16

        self.build_phone_encoder()
        # bf16: null -> auto-on for TRAINING on TPU (see resolve_train_bf16)
        self.model = ProDiffTeacher(
            len(self.ph_encoder), resolve_train_bf16(self.hparams)
        )
        return self.model

    def _model_inputs(self, batch):
        kwargs = dict(
            lang_seq=batch.get("lang_seq"),
            spk_embed_id=batch.get("spk_id"),
            gender_embed_id=batch.get("gender_id"),
            voicing=batch.get("voicing"),
            breath=batch.get("breath"),
        )
        return (batch["ph_seq"], batch["mel2ph"], batch["f0"]), kwargs

    def init_params(self, rng, batch):
        args, kwargs = self._model_inputs(batch)
        return self.model.init(
            {"params": rng, "diffusion": jax.random.fold_in(rng, 1)},
            *args,
            gt_spec=batch["mel"],
            **kwargs,
        )

    def compute_losses(self, params, batch, rng, deterministic=False):
        args, kwargs = self._model_inputs(batch)
        rngs = {
            "diffusion": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2),
        }
        output = self.model.apply(
            params, *args, gt_spec=batch["mel"],
            deterministic=deterministic, rngs=rngs, **kwargs,
        )
        non_padding = batch["mel2ph"] > 0
        if self.diffusion_type == "prodiff":
            spec_pred, spec_gt = output
            return spec_loss_prodiff(
                spec_pred, spec_gt, non_padding, self.loss_type, name="mel"
            )
        spec_pred, spec_gt, t = output
        return spec_loss_reflow(
            spec_pred, spec_gt, t, non_padding,
            self.loss_type_list[0], log_norm=True, name="mel",
        )

    def infer_mels(self, params, batch, rng, infer_step=None):
        """Host-callable sampling for validation plots."""
        if infer_step is None:
            infer_step = (
                int(self.hparams.get("sampling_steps", 20))
                if self.diffusion_type == "reflow"
                else int(self.hparams.get("timesteps", 4))
            )
        args, kwargs = self._model_inputs(batch)
        return self.model.apply(
            params, *args, infer=True, infer_step=infer_step,
            rngs={"diffusion": rng}, **kwargs,
        )

    def validation_plots(self, params, batch, step, out_dir, writer=None):
        if out_dir is None:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        mel_pred = np.asarray(
            self.infer_mels(params, batch, jax.random.PRNGKey(step))
        )
        mel_gt = np.asarray(batch["mel"])
        n = min(self.hparams.get("num_valid_plots", 10), len(mel_gt))
        os.makedirs(out_dir, exist_ok=True)
        for i in range(n):
            cat = np.concatenate([mel_gt[i], mel_pred[i]], axis=-1)
            fig = plt.figure(figsize=(12, 6))
            plt.pcolor(
                cat.T,
                vmin=self.hparams.get("mel_vmin", -6),
                vmax=self.hparams.get("mel_vmax", 1.5),
            )
            fig.savefig(os.path.join(out_dir, f"mel_{i}_step{step}.png"))
            if writer is not None:
                writer.add_figure(f"mel_val_{i}", fig, step)
            plt.close(fig)


@register_task("svs_rectified")
class SVSRectifiedTask(SVSTask):
    """Student distillation on precomputed teacher (condition, x_T, x_0)."""

    dataset_cls = SVSRectifiedDataset

    def build_model(self):
        from prodiff_tpu.models.prodiff import resolve_train_bf16

        hp = resolve_train_bf16(self.hparams)
        denoiser = WaveNet(
            in_dims=hp["audio_num_mel_bins"],
            hidden_size=hp["hidden_size"],
            residual_layers=hp["residual_layers"],
            residual_channels=hp["residual_channels"],
            dilation_cycle_length=hp["dilation_cycle_length"],
            dtype=(
                jnp.bfloat16
                if (hp.get("bf16") or hp.get("amp"))
                else None
            ),
        )
        if self.diffusion_type == "prodiff":
            self.model = GaussianDiffusion(
                denoise_fn=denoiser,
                out_dims=hp["audio_num_mel_bins"],
                timesteps=1,
                time_scale=hp["timescale"],
                schedule_type=hp["schedule_type"],
                max_beta=hp.get("max_beta", 0.06),
            )
        else:
            self.model = RectifiedFlow(
                denoise_fn=denoiser,
                out_dims=hp["audio_num_mel_bins"],
                time_scale=hp["timescale"],
                num_features=1,
                sampling_algorithm=hp.get("sampling_algorithm", "euler"),
                spec_min=tuple(hp["spec_min"]),
                spec_max=tuple(hp["spec_max"]),
            )
        return self.model

    def init_params(self, rng, batch):
        return self.model.init(
            {"params": rng, "diffusion": jax.random.fold_in(rng, 1)},
            batch["condition"],
            gt_spec=batch["x_0"][:, None],
        )

    def compute_losses(self, params, batch, rng, deterministic=False):
        rngs = {
            "diffusion": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2),
        }
        x_T = batch["x_T"][:, None]  # [B, 1, T, M]
        x_0 = batch["x_0"][:, None]
        non_padding = batch["mel2ph"] > 0
        if self.diffusion_type == "prodiff":
            spec_pred, spec_gt = self.model.apply(
                params, batch["condition"], gt_spec=x_0, src_spec=x_T, rngs=rngs,
            )
            return spec_loss_prodiff(
                spec_pred, spec_gt, non_padding, self.loss_type, name="mel"
            )
        spec_pred, spec_gt, t = self.model.apply(
            params, batch["condition"], gt_spec=x_0, rngs=rngs,
        )
        return spec_loss_reflow(
            spec_pred, spec_gt, t, non_padding,
            self.loss_type_list[0], log_norm=True, name="mel",
        )

    def validation_plots(self, params, batch, step, out_dir, writer=None):
        pass
