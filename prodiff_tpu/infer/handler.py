"""SVS inference: .ds project -> segment pipeline -> stitched wav.

Mirrors the reference ``InferHandler`` (``handler/infer/handler.py:25-400``):
per segment, phoneme ids (+per-language suffix through the phone map), given
or predicted durations -> mel2ph, given (resampled) or predicted pitch,
keyshift, speaker/gender mix embeds (weighted embedding-table sums),
voicing/breath curves, the diffusion acoustic model, the vocoder, then
offset/cross-fade stitching of segments into one track.

TPU-first notes:
- the acoustic + vocoder passes are jitted; segment lengths are padded to
  quantised buckets so a handful of compiled programs serve a whole song.
  Padded mel frames are filled with the log10 silence floor (-5) before
  vocoding and the wav is trimmed to the true length.
- speaker mixing reads the embedding table from the param tree directly
  (host-side) — no model surgery needed.
- reference bug §2.11.7 (``spk_map.keys()[0]``) is fixed with the web
  handler's correct variant.
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.config import set_hparams
from prodiff_tpu.data.collate import round_up
from prodiff_tpu.models.prodiff import ProDiffTeacher
from prodiff_tpu.utils import ckpt_utils
from prodiff_tpu.utils.audio import cross_fade, save_wav
from prodiff_tpu.utils.pitch_utils import (
    hz_to_midi,
    midi_to_hz,
    resample_align_curve,
    shift_pitch,
)
from prodiff_tpu.utils.text_encoder import TokenTextEncoder
from prodiff_tpu.vocoders import get_vocoder_cls

MEL_PAD_LOG10 = -5.0  # log10 of the nvSTFT clip floor (silence)


def note_to_midi(note: str) -> float:
    """'C4'/'A#3'/'Db5' (+cents '+50') -> fractional midi (librosa-compatible)."""
    pitch_map = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}
    acc_map = {"#": 1, "": 0, "b": -1, "!": -1, "♯": 1, "♭": -1}
    import re

    m = re.match(
        r"^(?P<note>[A-Ga-g])(?P<accidental>[#♯b!♭]*)(?P<octave>[+-]?\d+)?"
        r"(?P<cents>[+-]\d+)?$",
        note,
    )
    if not m:
        raise ValueError(f"Improper note format: {note!r}")
    pitch = pitch_map[m.group("note").upper()]
    offset = sum(acc_map[ch] for ch in m.group("accidental"))
    octave = int(m.group("octave")) if m.group("octave") else 0
    cents = int(m.group("cents")) * 1e-2 if m.group("cents") else 0
    return 12 * (octave + 1) + pitch + offset + cents


class SVSInferHandler:
    def __init__(
        self,
        exp_name: str,
        checkpoints_root: str = "checkpoints",
        pred_dur: bool = False,
        pred_pitch: str = "",
        pred_voicing: bool = False,
        pred_breath: bool = False,
        isolate_aspiration: bool = False,
        isolate_base_harmonic: bool = False,
        out_dir: str = "infer_out",
        deterministic: bool = False,
    ):
        # deterministic=True renders reproducibly: zero diffusion init/step
        # noise and a zero-phase/noise-free vocoder sine source. Also the
        # configuration under which the torch reference pipeline
        # (``handler/infer/handler.py:203-359`` with patched randomness) must
        # produce the same audio — see tests/test_mcd_pipeline.py.
        self.deterministic = deterministic
        self.hparams = set_hparams(
            exp_name=exp_name, task="svs", make_work_dir=False,
            checkpoints_root=checkpoints_root,
        )
        self.work_dir = self.hparams["work_dir"]
        self.out_dir = out_dir
        self.hop_size = self.hparams["hop_size"]
        self.audio_sample_rate = self.hparams["audio_sample_rate"]
        self.timestep = self.hop_size / self.audio_sample_rate
        self.mel_bucket = self.hparams.get("length_bucket_step", 128)

        self.ph_map, self.ph_encoder = self.build_phone_encoder()
        self.spk_map = self._load_map("spk_map.json")
        self.lang_map = self._load_map("lang_map.json")
        self.build_model()

        self.pred_dur = pred_dur
        if pred_dur:
            from prodiff_tpu.infer.inferers import DurPredictorInferer

            self.dur_predictor = DurPredictorInferer.from_workdir(
                exp_name, checkpoints_root, self.ph_encoder
            )
        self.pred_pitch = pred_pitch != "" and pred_pitch is not None
        if self.pred_pitch:
            from prodiff_tpu.infer.inferers import PitchPredictorInferer

            self.pred_pitch_spk_id = self.spk_map[pred_pitch]
            self.pitch_predictor = PitchPredictorInferer.from_workdir(
                exp_name, checkpoints_root
            )
        self.pred_voicing = pred_voicing
        self.pred_breath = pred_breath
        if pred_voicing or pred_breath:
            from prodiff_tpu.infer.inferers import VariPredictorInferer

            if pred_voicing:
                self.voicing_predictor = VariPredictorInferer.from_workdir(
                    exp_name, checkpoints_root, "voicing"
                )
            if pred_breath:
                self.breath_predictor = VariPredictorInferer.from_workdir(
                    exp_name, checkpoints_root, "breath"
                )
        self.vocoder = get_vocoder_cls(self.hparams["vocoder"])(self.hparams)
        self.isolate_aspiration = isolate_aspiration
        self.isolate_base_harmonic = isolate_base_harmonic

    # ---- assets -----------------------------------------------------------

    def _map_path(self, name: str) -> str:
        p = os.path.join(self.work_dir, name)
        if os.path.exists(p):
            return p
        # fallback: the binarizer writes maps into {data_dir}/{task}
        alt = os.path.join(self.hparams["data_dir"], "svs", name)
        if os.path.exists(alt):
            return alt
        raise FileNotFoundError(f"{name} not found in {self.work_dir} or {alt}")

    def _load_map(self, name: str) -> dict:
        with open(self._map_path(name)) as f:
            return json.load(f)

    def build_phone_encoder(self):
        with open(self._map_path("phone_set.json")) as f:
            ph_map = json.load(f)
        ph_list = list(sorted(set(ph_map.values())))
        return ph_map, TokenTextEncoder(ph_list, replace_oov="SP")

    def build_model(self):
        f0_stats_fn = os.path.join(self.work_dir, "train_f0s_mean_std.npy")
        if os.path.exists(f0_stats_fn):
            mean, std = np.load(f0_stats_fn)
            self.hparams["f0_mean"], self.hparams["f0_std"] = float(mean), float(std)
        self.model = ProDiffTeacher(len(self.ph_encoder), self.hparams)
        payload = ckpt_utils.load_last_checkpoint(self.work_dir)
        assert payload is not None, f"No checkpoint found in {self.work_dir}"
        self.params = jax.tree.map(jnp.asarray, payload["state_dict"])
        self.global_step = payload.get("global_step", 0)
        # prodiff teachers sample `timesteps` posterior steps (default 4);
        # reflow teachers integrate `sampling_steps` ODE steps (default 20)
        if self.hparams.get("diff_type", "prodiff") == "reflow":
            self.infer_step = int(self.hparams.get("sampling_steps", 20))
        else:
            self.infer_step = int(self.hparams.get("timesteps", 4))

    # ---- mixes -------------------------------------------------------------

    def get_speaker_mix(self, spk_name: Optional[str]) -> Dict[str, float]:
        if spk_name is None or spk_name == "":
            spk_mix_map = {list(self.spk_map.keys())[0]: 1.0}
        elif ":" in spk_name:
            spk_mix_map = dict(x.split(":") for x in spk_name.split("|"))
            for k in spk_mix_map:
                spk_mix_map[k] = float(spk_mix_map[k])
        else:
            spk_mix_map = {spk_name: 1.0}
        for name in spk_mix_map:
            assert name in self.spk_map, f"Speaker name {name} not found in spk_map"
        total = sum(spk_mix_map.values())
        return {k: v / total for k, v in spk_mix_map.items()}

    def spk_mix_embed(self, spk_mix_map: Dict[str, float]) -> np.ndarray:
        table = np.asarray(self.params["params"]["spk_embed"]["embedding"])
        mix = sum(w * table[self.spk_map[name]] for name, w in spk_mix_map.items())
        return mix[None, None, :].astype(np.float32)  # [1, 1, H]

    def gender_mix_embed(self, gender_value: float) -> np.ndarray:
        assert 0 <= gender_value <= 1, "gender must be in [0, 1]"
        table = np.asarray(self.params["params"]["gender_embed"]["embedding"])
        mix = (1 - gender_value) * table[0] + gender_value * table[1]
        return mix[None, None, :].astype(np.float32)

    # ---- jitted compute ------------------------------------------------------

    @functools.cached_property
    def _acoustic_fn(self):
        hp = self.hparams

        @functools.partial(
            jax.jit,
            static_argnames=("infer_step", "deterministic"),
        )
        def run(params, ph_seq, mel2ph, f0, lang_seq, spk_mix_embed,
                gender_mix_embed, voicing, breath, rng, infer_step=4,
                deterministic=False):
            init_noise = step_noises = None
            if deterministic:
                b, t_mel = mel2ph.shape
                m = hp["audio_num_mel_bins"]
                init_noise = jnp.zeros((b, 1, t_mel, m), jnp.float32)
                if hp.get("diff_type", "prodiff") != "reflow":
                    step_noises = jnp.zeros(
                        (infer_step, b, 1, t_mel, m), jnp.float32
                    )
            return self.model.apply(
                params, ph_seq, mel2ph, f0,
                lang_seq=lang_seq,
                spk_mix_embed=spk_mix_embed,
                gender_mix_embed=gender_mix_embed,
                voicing=voicing, breath=breath,
                infer=True, infer_step=infer_step,
                init_noise=init_noise, step_noises=step_noises,
                rngs={"diffusion": rng},
            )

        return run

    # ---- warm start --------------------------------------------------------

    def precompile(self, buckets=None, batch_sizes=(1,)) -> List[tuple]:
        """Jit-compile the acoustic + vocoder programs for a set of padded
        ``(T_ph, T_mel)`` buckets BEFORE the first real request.

        Cold compiles cost minutes per program in this environment (remote
        XLA compiles through the TPU relay; the persistent compilation cache
        in ``utils/jax_cache.py`` makes them one-time) — a handler that jits
        lazily per bucket stalls mid-song on the first long segment. The
        reference's WebHandler builds everything up front
        (``handler/web/handler.py:27-128``); torch is eager so it pays no
        per-shape cost — here the analogue is compiling the bucket set ahead
        of serving.

        ``buckets``: iterable of ``(t_ph, t_mel)`` pairs (rounded up to the
        bucket grid); defaults to hparam ``precompile_buckets``, else one
        typical serving bucket ``[64, 1024]``. Dispatches zero-filled inputs
        with exactly the argument structure :meth:`render_batch` uses, so the
        compiled programs are the ones real requests hit. Returns the list of
        compiled ``(batch, t_ph, t_mel)`` shapes."""
        hp = self.hparams
        if buckets is None:
            buckets = hp.get("precompile_buckets") or [(64, 1024)]
        rng = jax.random.PRNGKey(hp.get("seed", 1234))
        done = []
        for t_ph, t_mel in buckets:
            t_ph = round_up(int(t_ph), 16)
            t_mel = round_up(int(t_mel), self.mel_bucket)
            for b in batch_sizes:
                lang = np.zeros((b, t_ph), np.int32) if hp["use_lang_id"] else None
                spk = None
                if hp["use_spk_id"]:
                    spk = np.tile(
                        self.spk_mix_embed({list(self.spk_map)[0]: 1.0}), (b, 1, 1)
                    )
                gender = None
                if hp.get("use_gender_id", False):
                    gender = np.tile(self.gender_mix_embed(0.0), (b, 1, 1))
                voicing = (
                    np.full((b, t_mel), -10.0, np.float32)
                    if hp.get("use_voicing_embed", False) else None
                )
                breath = (
                    np.full((b, t_mel), -50.0, np.float32)
                    if hp.get("use_breath_embed", False) else None
                )
                mel_out = self._acoustic_fn(
                    self.params,
                    np.zeros((b, t_ph), np.int32),
                    np.zeros((b, t_mel), np.int32),
                    np.zeros((b, t_mel), np.float32),
                    lang, spk, gender, voicing, breath, rng,
                    infer_step=self.infer_step,
                    deterministic=self.deterministic,
                )
                voc_kwargs = {"deterministic": True} if self.deterministic else {}
                wav = self.vocoder.spec2wav_batch(
                    np.full((b, t_mel, hp["audio_num_mel_bins"]),
                            MEL_PAD_LOG10, np.float32),
                    np.zeros((b, t_mel), np.float32),
                    **voc_kwargs,
                )
                jax.block_until_ready((mel_out, wav))
                done.append((b, t_ph, t_mel))
        return done

    # ---- per segment -----------------------------------------------------------

    def get_note_dur(self, note_dur: List[float], note_slur: List[int]) -> List[float]:
        """Merge slurred notes into their word note (reference ``:186-196``)."""
        out: List[float] = []
        for d, s in zip(note_dur, note_slur):
            if s == 0 or not out:
                out.append(d)
            else:
                out[-1] += d
        return out

    def get_ph_text(self, ph: str, lang: Optional[str]) -> str:
        if not self.hparams["use_lang_id"]:
            return ph
        return f"{ph}/{lang}" if "/" not in ph else ph

    def _note_midi_seq(self, segment):
        note_midi = np.array(
            [
                note_to_midi(nt) if nt != "rest" else -1.0
                for nt in segment["note_seq"].split()
            ],
            dtype=np.float32,
        )
        note_rest = note_midi == -1
        if np.all(note_rest):
            note_midi = np.full_like(note_midi, 60.0)
        else:
            from scipy import interpolate

            interp_func = interpolate.interp1d(
                np.where(~note_rest)[0], note_midi[~note_rest],
                kind="nearest", fill_value="extrapolate",
            )
            note_midi[note_rest] = interp_func(np.where(note_rest)[0])
        return note_midi, note_rest

    def prepare(self, segment: dict) -> dict:
        """Host-side front end for one segment: phoneme ids, durations ->
        mel2ph, pitch, mixes, variance curves. Returns unpadded arrays +
        metadata for :meth:`render_batch`."""
        hp = self.hparams
        lang = segment.get("lang", None)
        ph_text_seq = [
            self.ph_map[self.get_ph_text(ph, lang)]
            for ph in segment["ph_seq"].split()
        ]
        t_ph = len(ph_text_seq)
        ph_tokens = np.asarray(self.ph_encoder.encode(ph_text_seq), np.int32)

        # durations (seconds per phoneme)
        if self.pred_dur:
            ph_num = [int(x) for x in segment["ph_num"].split()]
            note_dur = self.get_note_dur(
                [float(x) for x in segment["note_dur"].split()],
                [int(x) for x in segment["note_slur"].split()],
            )
            ph_dur = self.dur_predictor.run(
                self.dur_predictor.encode(ph_text_seq), ph_num, note_dur
            )
        else:
            ph_dur = np.array(segment["ph_dur"].split(), np.float32)

        # mel2ph via the cumsum-round trick (``handler.py:238-240``)
        ph_acc = np.round(np.cumsum(ph_dur) / self.timestep + 0.5).astype(np.int64)
        durations = np.diff(ph_acc, prepend=0)
        mel_len = int(durations.sum())
        mel2ph = np.repeat(np.arange(1, t_ph + 1), durations).astype(np.int32)

        # pitch
        if self.pred_pitch:
            note_midi, note_rest = self._note_midi_seq(segment)
            note_dur_sec = np.array(segment["note_dur_seq"].split(), np.float32)
            f0_midi = self.pitch_predictor.run(
                note_midi, note_rest, note_dur_sec, mel_len, self.timestep,
                spk_id=self.pred_pitch_spk_id,
                pitch_expr=float(segment.get("pitch_expr", 1.0)),
            )
            f0_seq = midi_to_hz(f0_midi).astype(np.float32)
        else:
            f0_seq = resample_align_curve(
                np.array(segment["f0_seq"].split(), np.float32),
                original_timestep=float(segment["f0_timestep"]),
                target_timestep=self.timestep,
                align_length=mel_len,
            )
        keyshift = segment.get("keyshift", 0)
        if keyshift:
            f0_seq = shift_pitch(f0_seq, keyshift).astype(np.float32)

        spk_mix_embed = None
        if hp["use_spk_id"]:
            spk_mix_embed = self.spk_mix_embed(
                self.get_speaker_mix(segment.get("spk_name"))
            )
        gender_mix_embed = None
        if hp.get("use_gender_id", False):
            gender_mix_embed = self.gender_mix_embed(float(segment.get("gender", 0)))

        voicing = breath = None
        if hp.get("use_voicing_embed", False):
            voicing = self._variance_curve(segment, "voicing", mel_len, f0_seq, -10.0)
        if hp.get("use_breath_embed", False):
            breath = self._variance_curve(segment, "breath", mel_len, f0_seq, -50.0)

        return {
            "ph_tokens": ph_tokens,
            "t_ph": t_ph,
            "mel2ph": mel2ph,
            "mel_len": mel_len,
            "f0_seq": f0_seq,
            "lang_id": self.lang_map[lang] if hp["use_lang_id"] else None,
            "spk_mix_embed": spk_mix_embed,
            "gender_mix_embed": gender_mix_embed,
            "voicing": voicing,
            "breath": breath,
        }

    def render_batch(self, prepared: List[dict]) -> List[np.ndarray]:
        """Render several prepared segments: group by padded (T_ph, T_mel)
        bucket and run ONE acoustic + ONE vocoder dispatch per group (the
        reference renders strictly one segment per model call,
        ``handler/infer/handler.py:362-400``; batching fills the chip at
        serving time). Returns wavs trimmed to true length, in input order."""
        hp = self.hparams
        max_b = int(hp.get("infer_batch_size", 8))
        groups: Dict[tuple, List[int]] = {}
        for i, p in enumerate(prepared):
            key = (
                round_up(p["t_ph"], 16),
                round_up(p["mel_len"], self.mel_bucket),
            )
            groups.setdefault(key, []).append(i)

        wavs: List[Optional[np.ndarray]] = [None] * len(prepared)
        for (t_ph_pad, t_mel_pad), idxs in groups.items():
            for chunk in [idxs[i : i + max_b] for i in range(0, len(idxs), max_b)]:
                batch = [prepared[i] for i in chunk]
                b = len(batch)
                ph_p = np.zeros((b, t_ph_pad), np.int32)
                mel2ph_p = np.zeros((b, t_mel_pad), np.int32)
                f0_p = np.zeros((b, t_mel_pad), np.float32)
                lang_p = np.zeros((b, t_ph_pad), np.int32) if hp["use_lang_id"] else None
                curves = {}
                for name in ("voicing", "breath"):
                    if batch[0][name] is not None:
                        curves[name] = np.zeros((b, t_mel_pad), np.float32)
                for r, p in enumerate(batch):
                    ph_p[r, : p["t_ph"]] = p["ph_tokens"]
                    mel2ph_p[r, : p["mel_len"]] = p["mel2ph"][: p["mel_len"]]
                    f0_p[r, : p["mel_len"]] = p["f0_seq"][: p["mel_len"]]
                    if lang_p is not None:
                        lang_p[r, : p["t_ph"]] = p["lang_id"]
                    for name, arr in curves.items():
                        arr[r, : p["mel_len"]] = p[name][: p["mel_len"]]

                def stack_mix(key):
                    if batch[0][key] is None:
                        return None
                    return np.concatenate([p[key] for p in batch], axis=0)

                start = time.time()
                mel_out = np.asarray(
                    self._acoustic_fn(
                        self.params, ph_p, mel2ph_p, f0_p, lang_p,
                        stack_mix("spk_mix_embed"), stack_mix("gender_mix_embed"),
                        curves.get("voicing"), curves.get("breath"),
                        jax.random.PRNGKey(self.hparams.get("seed", 1234)),
                        infer_step=self.infer_step,
                        deterministic=self.deterministic,
                    )
                )
                # vocode on the padded grid (pad with silence floor), trim after
                mel_voc = np.full(
                    (b, t_mel_pad, mel_out.shape[-1]), MEL_PAD_LOG10, np.float32
                )
                for r, p in enumerate(batch):
                    mel_voc[r, : p["mel_len"]] = mel_out[r, : p["mel_len"]]
                voc_kwargs = {"deterministic": True} if self.deterministic else {}
                wav_b = np.asarray(
                    self.vocoder.spec2wav_batch(mel_voc, f0_p, **voc_kwargs)
                )
                print(
                    f"Inference Time: {time.time() - start:.3f}s "
                    f"({b} segment(s) @ T_mel {t_mel_pad})"
                )
                for r, i in enumerate(chunk):
                    wavs[i] = wav_b[r, : prepared[i]["mel_len"] * self.hop_size]
        return wavs

    def _postprocess(self, wav: np.ndarray, f0_seq: np.ndarray) -> List[np.ndarray]:
        """Optional VR harmonic/aperiodic isolation of one rendered wav."""
        hp = self.hparams
        if not self.isolate_aspiration:
            return [wav]
        from prodiff_tpu.separation import extract_harmonic_aperiodic, get_kth_harmonic

        sp, ap = extract_harmonic_aperiodic(wav, hp["vr_ckpt"])
        if self.isolate_base_harmonic:
            base = get_kth_harmonic(
                0, sp, f0_seq, self.hop_size, hp["win_size"], self.audio_sample_rate
            )
            return [sp - base, ap, base]
        return [sp, ap]

    def infer(self, segment: dict) -> List[np.ndarray]:
        prepared = self.prepare(segment)
        wav = self.render_batch([prepared])[0]
        return self._postprocess(wav, prepared["f0_seq"])

    def _variance_curve(self, segment, key, mel_len, f0_seq, default_db):
        if key in segment:
            curve = np.array([float(x) for x in segment[key].split()], np.float32)
            ts = float(segment.get(f"{key}_timestep", self.timestep))
            return resample_align_curve(curve, ts, self.timestep, mel_len)
        predictor = getattr(self, f"{key}_predictor", None)
        if predictor is not None:
            note_midi, note_rest = self._note_midi_seq(segment)
            note_dur_sec = np.array(segment["note_dur_seq"].split(), np.float32)
            return predictor.run(
                note_midi, note_rest, note_dur_sec, mel_len, self.timestep, f0_seq
            )
        return np.full(mel_len, default_db, np.float32)

    # ---- project level -----------------------------------------------------

    def handle(
        self,
        proj: Optional[List[dict]] = None,
        proj_fn: Optional[str] = None,
        spk_name=None,
        lang=None,
        keyshift=0,
        gender=0,
    ):
        if proj is None:
            with open(proj_fn, encoding="utf-8") as f:
                proj = json.load(f)
        n_tracks = 1 + (1 if self.isolate_aspiration else 0) + (
            1 if self.isolate_base_harmonic else 0
        )
        result = [np.zeros(0) for _ in range(n_tracks)]
        total_length = [0] * n_tracks
        for segment in proj:
            segment.setdefault("lang", lang)
            segment.setdefault("keyshift", int(keyshift))
            segment.setdefault("spk_name", spk_name)
            segment["gender"] = float(gender)
        # batched-segment serving: one acoustic + one vocoder dispatch per
        # (T_ph, T_mel) bucket for the whole song (disable with
        # batch_segments: false)
        if self.hparams.get("batch_segments", True):
            prepared = [self.prepare(seg) for seg in proj]
            rendered = self.render_batch(prepared)
            outs = [
                self._postprocess(wav, p["f0_seq"])
                for wav, p in zip(rendered, prepared)
            ]
        else:
            outs = [self.infer(seg) for seg in proj]
        for segment, out in zip(proj, outs):
            offset = [
                round(segment.get("offset", 0) * self.audio_sample_rate)
                - total_length[i]
                for i in range(len(result))
            ]
            for i, (off, part) in enumerate(zip(offset, out)):
                if off >= 0:
                    result[i] = np.concatenate([result[i], np.zeros(off), part])
                else:
                    result[i] = cross_fade(result[i], part, total_length[i] + off)
            for i in range(len(result)):
                total_length[i] += offset[i] + out[i].shape[0]

        os.makedirs(self.out_dir, exist_ok=True)
        title = os.path.splitext(os.path.basename(proj_fn or "out"))[0]
        exp = self.hparams.get("exp_name", "exp")
        paths = []
        if not self.isolate_aspiration:
            out_fn = os.path.join(self.out_dir, f"{title}【{exp}】.wav")
            save_wav(result[0], out_fn, self.audio_sample_rate)
            paths.append(out_fn)
        else:
            for suffix, track in zip(["sp", "ap", "bh"], result):
                out_fn = os.path.join(self.out_dir, f"{title}_{suffix}【{exp}】.wav")
                save_wav(track, out_fn, self.audio_sample_rate)
                paths.append(out_fn)
        return paths
