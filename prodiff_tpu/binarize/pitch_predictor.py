"""Pitch-predictor binarizer (reference ``component/binarizer/pitch_predictor.py``).

Phonemes encoded as articulatory categories; f0 in midi; note grid
(mel2note, rest-interpolated note_midi) and the smoothed base melody.
"""

from __future__ import annotations

import json

import numpy as np
from scipy import interpolate

from prodiff_tpu.binarize import Binarizer, register_binarizer
from prodiff_tpu.binarize.utils import (
    build_ph_category_encoder,
    build_spk_map,
    sinusoidal_smooth,
)
from prodiff_tpu.infer.handler import note_to_midi
from prodiff_tpu.ops.seq import dur_to_mel2ph_host
from prodiff_tpu.pe import get_pe_cls
from prodiff_tpu.utils.audio import load_wav
from prodiff_tpu.utils.pitch_utils import hz_to_midi


def interp_note_midi(note_seq):
    """note names -> (midi with rests nearest-interpolated, rest mask)."""
    note_midi = np.array(
        [note_to_midi(nt) if nt != "rest" else -1.0 for nt in note_seq],
        dtype=np.float64,
    )
    note_rest = note_midi == -1
    if np.all(note_rest):
        note_midi = np.full_like(note_midi, 60.0)
    else:
        interp_func = interpolate.interp1d(
            np.where(~note_rest)[0], note_midi[~note_rest],
            kind="nearest", fill_value="extrapolate",
        )
        note_midi[note_rest] = interp_func(np.where(note_rest)[0])
    return note_midi, note_rest


def base_pitch_curve(note_midi, mel2note, smooth_kernel):
    """Note midi gathered to frames then half-sine smoothed (0.06 s)."""
    frame_pitch = np.concatenate([[-1.0], note_midi])[mel2note]
    return sinusoidal_smooth(frame_pitch.astype(np.float32), smooth_kernel)


@register_binarizer
class PitchPredictorBinarizer(Binarizer):
    def __init__(self, hparams: dict):
        super().__init__(hparams)
        binarization_args = hparams["binarization_args"]
        self.ph2category, self.ph_category_encoder = build_ph_category_encoder(
            self.data_dir, hparams["dictionary"], hparams["languages"]
        )
        self.need_spk_id = binarization_args.get("with_spk_id", True)
        if self.need_spk_id:
            self.spk_map = build_spk_map(self.data_dir, self.datasets)
        self.pe = get_pe_cls(hparams["pitch_extractor"])(hparams)
        self.samplerate = hparams["audio_sample_rate"]
        self.hop_size = hparams["hop_size"]
        self.timestep = self.hop_size / self.samplerate
        self.midi_smooth_kernel = round(0.06 / self.timestep)

    @staticmethod
    def category():
        return "pitch"

    def load_meta_data(self) -> list:
        items = []
        for dataset in self.datasets:
            data_dir, lang = dataset["data_dir"], dataset["language"]
            spk_id = self.spk_map[dataset["speaker"]] if self.need_spk_id else None
            with open(f"{data_dir}/label.json", encoding="utf-8") as f:
                labels = json.load(f)
            for item_name, label in labels.items():
                assert "note_seq" in label and "note_dur" in label, (
                    f"item {item_name!r} lacks note_seq/note_dur; run "
                    f"`preprocess --extract_note` (with midi files) first"
                )
                ph_text = [
                    self.ph2category[lang][ph] for ph in label["ph_seq"].split(" ")
                ]
                item = {
                    "item_name": item_name,
                    "wav_fn": f"{data_dir}/wav/{item_name}.wav",
                    "ph_seq": self.ph_category_encoder.encode(ph_text),
                    "ph_dur": [float(x) for x in label["ph_dur"].split(" ")],
                    "note_seq": label["note_seq"].split(" "),
                    "note_dur": [float(x) for x in label["note_dur"].split(" ")],
                }
                if self.need_spk_id:
                    item["spk_id"] = spk_id
                items.append(item)
        return items

    def process_item(self, item: dict) -> dict:
        hp = self.hparams
        out = {
            "ph_seq": np.asarray(item["ph_seq"], np.int64),
            "ph_dur": np.asarray(item["ph_dur"], np.float32),
        }
        waveform, _ = load_wav(item["wav_fn"], sr=self.samplerate)
        mel_len = round(len(waveform) / self.hop_size)
        out["mel2ph"] = dur_to_mel2ph_host(item["ph_dur"], self.timestep, mel_len)
        out["sec"] = len(waveform) / self.samplerate
        out["length"] = mel_len
        if self.need_spk_id:
            out["spk_id"] = item["spk_id"]
        f0, uv = self.pe.get_pitch(
            waveform,
            samplerate=self.samplerate,
            length=mel_len,
            hop_size=self.hop_size,
            interp_uv=hp["interp_uv"],
        )
        assert not uv.all(), (
            f"all unvoiced. item: {item.get('item_name')}, wav: {item['wav_fn']}"
        )
        out["pitch"] = hz_to_midi(np.asarray(f0, np.float32)).astype(np.float32)
        mel2note = dur_to_mel2ph_host(item["note_dur"], self.timestep, mel_len)
        out["mel2note"] = mel2note
        note_midi, note_rest = interp_note_midi(item["note_seq"])
        out["note_midi"] = note_midi
        out["note_rest"] = note_rest
        out["base_pitch"] = base_pitch_curve(note_midi, mel2note, self.midi_smooth_kernel)
        return out
