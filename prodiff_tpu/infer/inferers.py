"""Aux-predictor inferers (reference ``component/inferer/*``).

Each loads its model from ``checkpoints/{exp}/{task}`` when the experiment has
a local predictor, else the global ``checkpoints/{task}`` (reference
``handler/infer/handler.py:49-95``).

Design notes vs the reference:
- the reference's pitch/vari inferers crash on missing inputs
  (SURVEY §2.11.5 and the ph_seq KeyError in the pitch path); here the
  phoneme-category tokens are built from the dictionary when available and
  fall back to the 'SP' category otherwise.
- ``force_align_pdur`` (rescale predicted phoneme durations to note
  durations) is a vectorised segment-sum instead of a Python loop.
"""

from __future__ import annotations

import functools
import json
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.binarize.pitch_predictor import base_pitch_curve
from prodiff_tpu.config import set_hparams
from prodiff_tpu.data.collate import round_up
from prodiff_tpu.ops.seq import dur_to_mel2ph_host
from prodiff_tpu.utils import ckpt_utils
from prodiff_tpu.utils.text_encoder import TokenTextEncoder


def _pad1(x: np.ndarray, t_pad: int, value=0) -> np.ndarray:
    """Right-pad a 1-D array to ``t_pad`` with ``value``."""
    x = np.asarray(x)
    return np.pad(x, (0, t_pad - x.shape[0]), constant_values=value)


INFERERS = {}


def register_inferer(cls):
    INFERERS[cls.category] = cls
    return cls


def get_inferer_cls(task: str):
    """Category-keyed inferer registry (mirrors ``component/inferer/base.py``)."""
    if task not in INFERERS:
        raise ValueError(f"Inferer {task} not found in {sorted(INFERERS)}")
    return INFERERS[task]


def _resolve_hparams(exp_name: str, task: str, checkpoints_root: str) -> dict:
    local_cfg = os.path.join(checkpoints_root, exp_name, task, "config.yaml")
    return set_hparams(
        exp_name=exp_name if os.path.exists(local_cfg) else None,
        task=task,
        global_hparams=False,
        make_work_dir=False,
        checkpoints_root=checkpoints_root,
    )


def _load_params(work_dir: str):
    payload = ckpt_utils.load_last_checkpoint(work_dir)
    assert payload is not None, f"No checkpoint found in {work_dir}"
    return jax.tree.map(jnp.asarray, payload["state_dict"])


def _find_asset(hparams: dict, name: str) -> str:
    """Look in the work dir, then in the binarized data dir (where the
    binarizer writes the maps)."""
    for root in (
        hparams.get("work_dir", ""),
        os.path.join(hparams.get("data_dir", ""), hparams.get("task") or ""),
    ):
        p = os.path.join(root, name)
        if root and os.path.exists(p):
            return p
    raise FileNotFoundError(f"{name} not found in work_dir or data_dir for this task")


@register_inferer
class DurPredictorInferer:
    category = "dur"

    def __init__(self, hparams: dict, ph_encoder: TokenTextEncoder):
        from prodiff_tpu.models.duration import DurPredictor

        self.hparams = hparams
        # the model must use the vocab it was TRAINED with (the dur task's own
        # phone_set); fall back to the caller's encoder when unavailable.
        # (The reference builds the dur model with the svs encoder, which only
        # works when both tasks share one dictionary.)
        try:
            with open(_find_asset(hparams, "phone_set.json")) as f:
                ph_map = json.load(f)
            self.ph_encoder = TokenTextEncoder(
                sorted(set(ph_map.values())), replace_oov="SP"
            )
        except FileNotFoundError:
            self.ph_encoder = ph_encoder
        self.model = DurPredictor(len(self.ph_encoder), hparams)
        self.params = _load_params(hparams["work_dir"])

    @classmethod
    def from_workdir(cls, exp_name, checkpoints_root, ph_encoder):
        return cls(_resolve_hparams(exp_name, "dur", checkpoints_root), ph_encoder)

    def encode(self, ph_text_list: List[str]) -> np.ndarray:
        return np.asarray(self.ph_encoder.encode(ph_text_list), np.int32)

    @functools.cached_property
    def _jitted_apply(self):
        # jitted + shape-bucketed (eager dispatch is seconds-per-op through
        # a remote TPU runtime); the encoder masks padding end to end
        # (attention key mask + per-layer nonpad), so bucket padding does not
        # change the real-region durations — pinned by
        # tests/test_variance_stack.py::test_dur_inferer_bucket_parity
        @jax.jit
        def run(params, tokens, onset, word_dur):
            return self.model.apply(params, tokens, onset, word_dur, infer=True)

        return run

    def run(self, ph_tokens: np.ndarray, ph_num: List[int], note_dur: List[float]):
        """-> per-phoneme durations in seconds, force-aligned to note durations."""
        ph_num = np.asarray(ph_num, np.int64)
        ph2word = np.repeat(np.arange(1, len(ph_num) + 1), ph_num)
        onset = np.diff(ph2word, prepend=0).astype(np.int32)
        word_dur = np.concatenate([[0.0], np.asarray(note_dur, np.float32)])[ph2word]
        t_ph = len(ph_tokens)
        t_pad = round_up(t_ph, 16)
        dur_pred = np.asarray(
            self._jitted_apply(
                self.params,
                jnp.asarray(_pad1(ph_tokens, t_pad), jnp.int32)[None],
                jnp.asarray(_pad1(onset, t_pad))[None],
                jnp.asarray(_pad1(word_dur, t_pad), jnp.float32)[None],
            )
        )[0][:t_ph]
        return self.force_align_pdur(ph_num, dur_pred, np.asarray(note_dur))

    @staticmethod
    def force_align_pdur(ph_num, ph_dur, note_dur):
        """Rescale each word's predicted phoneme durations so their sum equals
        the note duration (``component/inferer/dur_predictor.py:26-41``).

        Degenerate words (all-zero predictions — the reference would emit NaN
        then zero them, collapsing the word) fall back to a uniform split of
        the note duration."""
        ph_num = np.asarray(ph_num, np.int64)
        ph2word0 = np.repeat(np.arange(len(ph_num)), ph_num)  # 0-indexed
        word_sums = np.zeros(len(ph_num), np.float64)
        np.add.at(word_sums, ph2word0, ph_dur)
        note_dur = np.asarray(note_dur, np.float64)
        degenerate = word_sums < 1e-6
        uniform = (note_dur / np.maximum(ph_num, 1))[ph2word0]
        rate = word_sums / np.maximum(note_dur, 1e-9)
        out = np.where(
            degenerate[ph2word0], uniform, ph_dur / np.maximum(rate[ph2word0], 1e-9)
        )
        out[~np.isfinite(out)] = 0
        return out.astype(np.float32)


@register_inferer
class PitchPredictorInferer:
    category = "pitch"

    def __init__(self, hparams: dict):
        from prodiff_tpu.models.pitch_predictor import PitchPredictor

        self.hparams = hparams
        self.ph_category_encoder = self._build_category_encoder(hparams)
        self.ph2category = self._build_ph2category(hparams)
        self.model = PitchPredictor(len(self.ph_category_encoder), hparams)
        self.params = _load_params(hparams["work_dir"])
        self.midi_smooth_kernel = round(
            0.06 / (hparams["hop_size"] / hparams["audio_sample_rate"])
        )

    @classmethod
    def from_workdir(cls, exp_name, checkpoints_root):
        return cls(_resolve_hparams(exp_name, "pitch", checkpoints_root))

    @staticmethod
    def _build_category_encoder(hparams):
        with open(_find_asset(hparams, "ph_category_list.json")) as f:
            return TokenTextEncoder(json.load(f), replace_oov="SP")

    @staticmethod
    def _build_ph2category(hparams):
        ph2category = {}
        try:
            for lang in hparams.get("languages", {}):
                ph2category[lang] = {"AP": "AP", "SP": "SP"}
                with open(hparams["dictionary"][lang]["phoneme"]) as f:
                    for x in f.readlines():
                        line = x.split("\n")[0].split(" ")
                        ph2category[lang][line[0]] = line[2]
        except (FileNotFoundError, KeyError, IndexError):
            print("| pitch inferer: dictionary unavailable; using SP categories")
        return ph2category

    def encode_ph_categories(self, ph_seq: List[str], lang: str) -> np.ndarray:
        cats = [
            self.ph2category.get(lang, {}).get(ph.split("/")[0], "SP")
            for ph in ph_seq
        ]
        return np.asarray(self.ph_category_encoder.encode(cats), np.int32)

    @functools.cached_property
    def _jitted_apply(self):
        # jitted + shape-bucketed like the acoustic path (remote-TPU-viable).
        # NOTE: the reflow sampling noise is drawn at the PADDED [T_mel]
        # shape, so the predicted delta for one segment depends on its bucket
        # (equivalent to a different seed) — the reference draws fresh noise
        # every call anyway (``component/inferer/pitch_predictor.py``).
        @functools.partial(jax.jit, static_argnames=("infer_step",))
        def run(params, ph_tokens, mel2ph, note_midi, note_rest, mel2note,
                base_pitch, pitch_expr, spk_id, rng, infer_step=20):
            return self.model.apply(
                params, ph_tokens, mel2ph, note_midi, note_rest, mel2note,
                base_pitch, pitch_expr=pitch_expr, spk_id=spk_id,
                infer=True, infer_step=infer_step, rngs={"diffusion": rng},
            )

        return run

    def run(
        self,
        note_midi: np.ndarray,
        note_rest: np.ndarray,
        note_dur_sec: np.ndarray,
        mel_len: int,
        timestep: float,
        spk_id: int = 0,
        pitch_expr: float = 1.0,
        ph_tokens: Optional[np.ndarray] = None,
        mel2ph: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """-> f0 curve in MIDI (base melody + predicted delta), [mel_len]."""
        mel2note = dur_to_mel2ph_host(note_dur_sec, timestep, mel_len)
        base_pitch = base_pitch_curve(note_midi, mel2note, self.midi_smooth_kernel)
        if ph_tokens is None:
            ph_tokens = np.full(
                len(note_midi), self.ph_category_encoder.id("SP"), np.int32
            )
            mel2ph = mel2note
        t_note = len(note_midi)
        t_note_pad = round_up(t_note, 16)
        t_ph_pad = round_up(len(ph_tokens), 16)
        t_mel_pad = round_up(
            mel_len, self.hparams.get("length_bucket_step", 128)
        )
        delta = np.asarray(
            self._jitted_apply(
                self.params,
                jnp.asarray(_pad1(ph_tokens, t_ph_pad), jnp.int32)[None],
                jnp.asarray(_pad1(mel2ph[:mel_len], t_mel_pad), jnp.int32)[None],
                # pad notes with midi=-1: the NoteEncoder's padding mask is
                # ``note_midi < 0`` (models/encoder.py)
                jnp.asarray(_pad1(note_midi, t_note_pad, -1.0), jnp.float32)[None],
                jnp.asarray(_pad1(note_rest, t_note_pad, True), bool)[None],
                jnp.asarray(_pad1(mel2note[:mel_len], t_mel_pad), jnp.int32)[None],
                jnp.asarray(
                    _pad1(base_pitch[:mel_len],
                          t_mel_pad, float(base_pitch[mel_len - 1])),
                    jnp.float32,
                )[None],
                jnp.full((1, 1), pitch_expr, jnp.float32),
                jnp.asarray([spk_id], jnp.int32),
                jax.random.PRNGKey(self.hparams.get("seed", 1234)),
                infer_step=int(self.hparams.get("sampling_steps", 20)),
            )
        )[0]
        return base_pitch[:mel_len] + delta[:mel_len]


@register_inferer
class VariPredictorInferer:
    category = "vari"

    def __init__(self, hparams: dict, feature: str):
        from prodiff_tpu.models.vari_predictor import VariPredictor
        from prodiff_tpu.tasks.base import BaseTask

        self.hparams = hparams
        self.feature = feature
        # vocab from the predictor's own phone_set
        with open(_find_asset(hparams, "phone_set.json")) as f:
            ph_map = json.load(f)
        self.ph_encoder = TokenTextEncoder(
            list(sorted(set(ph_map.values()))), replace_oov="SP"
        )
        self.model = VariPredictor(len(self.ph_encoder), hparams)
        self.params = _load_params(hparams["work_dir"])

    @classmethod
    def from_workdir(cls, exp_name, checkpoints_root, feature):
        # reference resolves voicing/breath each to their own task dir
        return cls(_resolve_hparams(exp_name, feature, checkpoints_root), feature)

    @functools.cached_property
    def _jitted_apply(self):
        # jitted + shape-bucketed; same noise-per-bucket caveat as the pitch
        # inferer (the sampled curve's noise is drawn at the padded shape)
        @jax.jit
        def run(params, ph_tokens, mel2ph, note_midi, note_rest, mel2note,
                f0_seq, rng):
            return self.model.apply(
                params, ph_tokens, mel2ph, note_midi, note_rest, mel2note,
                f0_seq, infer=True, rngs={"diffusion": rng},
            )

        return run

    def run(self, note_midi, note_rest, note_dur_sec, mel_len, timestep, f0_seq):
        mel2note = dur_to_mel2ph_host(note_dur_sec, timestep, mel_len)
        ph_tokens = np.full(len(note_midi), self.ph_encoder.id("SP"), np.int32)
        t_note_pad = round_up(len(note_midi), 16)
        t_mel_pad = round_up(
            mel_len, self.hparams.get("length_bucket_step", 128)
        )
        mel2note_p = jnp.asarray(
            _pad1(mel2note[:mel_len], t_mel_pad), jnp.int32
        )[None]
        curves = self._jitted_apply(
            self.params,
            jnp.asarray(_pad1(ph_tokens, t_note_pad), jnp.int32)[None],
            mel2note_p,
            jnp.asarray(_pad1(note_midi, t_note_pad, -1.0), jnp.float32)[None],
            jnp.asarray(_pad1(note_rest, t_note_pad, True), bool)[None],
            mel2note_p,
            jnp.asarray(
                _pad1(f0_seq[:mel_len], t_mel_pad, float(f0_seq[mel_len - 1])),
                jnp.float32,
            )[None],
            jax.random.PRNGKey(self.hparams.get("seed", 1234)),
        )
        return np.asarray(curves[self.feature])[0, :mel_len]
