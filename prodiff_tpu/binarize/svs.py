"""SVS binarizers (reference ``component/binarizer/svs.py``).

``svs``: wav + label.json -> {ph_seq, ph_dur, mel, mel2ph, f0, spk/lang ids,
optional voicing/breath/tension}. ``svs_rectified``: additionally runs a
frozen teacher's full diffusion from keyed noise per item to produce the
offline-distillation (condition, x_T, x_0) triplets.

Fixes vs the reference: shuffle happens after the item list exists
(§2.11.8), and the all-unvoiced assert names the wav file (§2.11.10).
"""

from __future__ import annotations

import json
import random

import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.binarize import Binarizer, register_binarizer
from prodiff_tpu.binarize.utils import (
    build_lang_map,
    build_phone_encoder,
    build_spk_map,
    get_breath,
    get_mel_spec,
    get_tension,
    get_voicing,
)
from prodiff_tpu.ops.seq import dur_to_mel2ph_host
from prodiff_tpu.pe import get_pe_cls
from prodiff_tpu.utils.audio import load_wav


@register_binarizer
class SVSBinarizer(Binarizer):
    def __init__(self, hparams: dict):
        super().__init__(hparams)
        binarization_args = hparams["binarization_args"]
        self.ph_map, self.ph_encoder = build_phone_encoder(
            self.data_dir, hparams["dictionary"], hparams["languages"]
        )
        self.need_spk_id = binarization_args.get("with_spk_id", True)
        if self.need_spk_id:
            self.spk_map = build_spk_map(self.data_dir, self.datasets)
        self.need_lang_id = binarization_args.get("with_lang_id", True)
        if self.need_lang_id:
            self.lang_map = build_lang_map(self.data_dir, hparams["languages"])

        self.samplerate = hparams["audio_sample_rate"]
        self.hop_size = hparams["hop_size"]
        self.fft_size, self.win_size = hparams["fft_size"], hparams["win_size"]
        self.timestep = self.hop_size / self.samplerate
        self.f_min, self.f_max = hparams["fmin"], hparams["fmax"]
        self.num_mel_bins = hparams["audio_num_mel_bins"]
        self.pe = get_pe_cls(hparams["pitch_extractor"])(hparams)

        self.need_voicing = binarization_args.get("with_voicing", False)
        self.need_breath = binarization_args.get("with_breath", False)
        self.need_tension = binarization_args.get("with_tension", False)
        self.smooth_kernel = round(0.12 / self.timestep)
        self.shuffle = binarization_args.get("shuffle", False)

    @staticmethod
    def category():
        return "svs"

    def load_meta_data(self) -> list:
        items = []
        for dataset in self.datasets:
            data_dir = dataset["data_dir"]
            lang = dataset["language"]
            lang_id = self.lang_map[lang] if self.need_lang_id else None
            spk_id = self.spk_map[dataset["speaker"]] if self.need_spk_id else None
            with open(f"{data_dir}/label.json", encoding="utf-8") as f:
                labels = json.load(f)
            for item_name, label in labels.items():
                ph_text = [
                    self.ph_map[f"{x}/{lang}"] for x in label["ph_seq"].split(" ")
                ]
                item = {
                    "item_name": item_name,
                    "wav_fn": f"{data_dir}/wav/{item_name}.wav",
                    "ph_seq": self.ph_encoder.encode(ph_text),
                    "ph_dur": [float(x) for x in label["ph_dur"].split(" ")],
                }
                if self.need_spk_id:
                    item["spk_id"] = spk_id
                if self.need_lang_id:
                    item["lang_seq"] = [lang_id] * len(item["ph_seq"])
                if self.hparams.get("use_gender_id", False):
                    item["gender_id"] = dataset["gender"]
                items.append(item)
        if self.shuffle:
            random.seed(3407)
            random.shuffle(items)
        return items

    def _separate(self, waveform):
        from prodiff_tpu.separation import extract_harmonic_aperiodic

        return extract_harmonic_aperiodic(waveform, self.hparams["vr_ckpt"])

    def process_item(self, item: dict) -> dict:
        hp = self.hparams
        out = {
            "ph_seq": np.array(item["ph_seq"], dtype=np.int64),
            "ph_dur": np.array(item["ph_dur"], dtype=np.float32),
        }
        if self.need_spk_id:
            out["spk_id"] = item["spk_id"]
        if self.need_lang_id:
            out["lang_seq"] = np.array(item["lang_seq"], dtype=np.int64)
        if hp.get("use_gender_id", False):
            out["gender_id"] = item["gender_id"]

        waveform, _ = load_wav(item["wav_fn"], sr=self.samplerate)
        if self.need_voicing or self.need_breath or self.need_tension:
            harmonic_part, aperiodic_part = self._separate(waveform)

        mel = get_mel_spec(
            waveform, self.samplerate, self.num_mel_bins,
            self.fft_size, self.win_size, self.hop_size, self.f_min, self.f_max,
        )
        out["mel"] = mel
        out["sec"] = len(waveform) / self.samplerate
        out["length"] = mel.shape[0]
        out["mel2ph"] = dur_to_mel2ph_host(item["ph_dur"], self.timestep, mel.shape[0])

        f0, uv = self.pe.get_pitch(
            waveform,
            samplerate=self.samplerate,
            length=mel.shape[0],
            hop_size=self.hop_size,
            interp_uv=hp["interp_uv"],
        )
        assert not uv.all(), (
            f"all unvoiced. item: {item.get('item_name')}, wav: {item['wav_fn']}"
        )
        out["f0"] = np.asarray(f0, np.float32)

        if self.need_voicing:
            out["voicing"] = get_voicing(
                harmonic_part, mel.shape[0], self.hop_size, self.win_size,
                self.smooth_kernel, norm=hp["voicing_norm"],
                db_min=hp["voicing_db_min"], db_max=hp["voicing_db_max"],
            )
        if self.need_breath:
            out["breath"] = get_breath(
                aperiodic_part, mel.shape[0], self.hop_size, self.win_size,
                self.smooth_kernel, norm=hp["breath_norm"],
                db_min=hp["breath_db_min"], db_max=hp["breath_db_max"],
            )
        if self.need_tension:
            out["tension"] = get_tension(
                harmonic_part, mel.shape[0], out["f0"], self.hop_size,
                self.win_size, self.samplerate, self.smooth_kernel,
            )
        return out


@register_binarizer
class SVSRectifiedDiffusionBinarizer(SVSBinarizer):
    """Distillation data generator: teacher condition + full diffusion from
    keyed noise per item (``svs.py:180-223``)."""

    def __init__(self, hparams: dict):
        super().__init__(hparams)
        from prodiff_tpu.models.prodiff import ProDiffTeacher
        from prodiff_tpu.utils import ckpt_utils

        teacher_ckpt = hparams["teacher_ckpt"]
        self.teacher = ProDiffTeacher(len(self.ph_encoder), hparams)
        payload = ckpt_utils.load_last_checkpoint(teacher_ckpt)
        if payload is None:
            payload = ckpt_utils.load_checkpoint_file(teacher_ckpt)
        self.teacher_params = jax.tree.map(jnp.asarray, payload["state_dict"])
        self._item_idx = 0

    @staticmethod
    def category():
        return "svs_rectified"

    def process_item(self, item: dict) -> dict:
        hp = self.hparams
        out = super().process_item(item)
        ph_seq = jnp.asarray(out["ph_seq"], jnp.int32)[None]
        mel2ph = jnp.asarray(out["mel2ph"], jnp.int32)[None]
        f0 = jnp.asarray(out["f0"], jnp.float32)[None]
        kwargs = {}
        if hp.get("use_spk_id", True):
            kwargs["spk_embed_id"] = jnp.asarray([out["spk_id"]], jnp.int32)
        if hp.get("use_gender_id", False):
            kwargs["gender_embed_id"] = jnp.asarray([out["gender_id"]], jnp.int32)
        if hp.get("use_lang_id", True):
            kwargs["lang_seq"] = jnp.asarray(out["lang_seq"], jnp.int32)[None]
        if hp.get("use_voicing_embed", False):
            kwargs["voicing"] = jnp.asarray(out["voicing"], jnp.float32)[None]
        if hp.get("use_breath_embed", False):
            kwargs["breath"] = jnp.asarray(out["breath"], jnp.float32)[None]

        from prodiff_tpu.models.prodiff import ProDiffTeacher

        condition = self.teacher.apply(
            self.teacher_params, ph_seq, mel2ph, f0,
            method=ProDiffTeacher.forward_condition, **kwargs,
        )  # [1, T, H]
        t_mel = condition.shape[1]
        # keyed noise so (x_T, x_0) pairs are reproducible per item. Like the
        # reference, x_T (the student's q_sample noise) is independent of the
        # teacher's own sampling noise (``prodiff.py:147`` starts from uniform
        # regardless of the passed x_T — SURVEY §2.11.6).
        rng = jax.random.PRNGKey(hp.get("seed", 1234) + self._item_idx)
        self._item_idx += 1
        x_T = jax.random.normal(
            jax.random.fold_in(rng, 0), (1, 1, t_mel, self.num_mel_bins)
        )
        x_0 = self.teacher.apply(
            self.teacher_params, condition,
            method=lambda m, c: m.diffusion(c, infer=True),
            rngs={"diffusion": jax.random.fold_in(rng, 1)},
        )
        out["condition"] = np.asarray(condition[0])  # [T, H]
        out["x_T"] = np.asarray(x_T[0, 0])  # [T, M]
        out["x_0"] = np.asarray(x_0[0, 0])  # [T, M]
        return out
