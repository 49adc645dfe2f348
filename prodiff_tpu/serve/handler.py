"""Web serving: the reference's FastAPI surface on a dependency-free HTTP server.

Routes and payload contracts match ``handler/web/handler.py:26-419``:

- ``GET  /api/basic_info``  -> languages/speakers/hop/samplerate/pitch styles
- ``POST /api/pred_dur``    -> word list + word durations -> per-phoneme timings
- ``POST /api/pred_pitch``  -> notes + phonemes -> pitch curve (midi)
- ``POST /api/infer``       -> phonemes/durations/pitch -> wav samples; when a
  VR model is available the harmonic/aperiodic parts are scaled by the
  voicing/breath dB curves before re-summing (``:342-416``)

fastapi/uvicorn are not available in this image, so the server is
``http.server.ThreadingHTTPServer`` + JSON — same API, zero deps.
"""

from __future__ import annotations

import json
import os
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from itertools import chain
from typing import List

import numpy as np

from prodiff_tpu.infer.handler import SVSInferHandler
from prodiff_tpu.utils.pitch_utils import midi_to_hz, resample_align_curve


class WebHandler:
    def __init__(self, exp_name: str, port: int = 7694, host: str = "localhost",
                 checkpoints_root: str = "checkpoints"):
        self.host, self.port = host, port
        # reuse the full infer pipeline (model + vocoder + maps)
        self.core = SVSInferHandler(
            exp_name,
            checkpoints_root=checkpoints_root,
            pred_dur=False,
            pred_pitch="",
        )
        self.hparams = self.core.hparams
        self.timestep = self.core.timestep
        # dur predictor is optional for serving (only /api/pred_dur needs it)
        try:
            from prodiff_tpu.infer.inferers import DurPredictorInferer

            self.dur_predictor = DurPredictorInferer.from_workdir(
                exp_name, checkpoints_root, self.core.ph_encoder
            )
        except Exception as e:
            print(f"| web: dur predictor unavailable ({e})")
            self.dur_predictor = None
        # pitch predictor is optional for serving
        try:
            from prodiff_tpu.infer.inferers import PitchPredictorInferer

            self.pitch_predictor = PitchPredictorInferer.from_workdir(
                exp_name, checkpoints_root
            )
            pitch_spk_map_fn = os.path.join(
                self.pitch_predictor.hparams["work_dir"], "spk_map.json"
            )
            if os.path.exists(pitch_spk_map_fn):
                with open(pitch_spk_map_fn) as f:
                    self.pitch_pred_spk_map = json.load(f)
            else:
                self.pitch_pred_spk_map = {}
        except Exception as e:
            print(f"| web: pitch predictor unavailable ({e})")
            self.pitch_predictor = None
            self.pitch_pred_spk_map = {}

        self._build_word_dictionary()

        # warm start (opt out with `precompile: false`): compile the serving
        # buckets (`precompile_buckets`, default one [64, 1024] bucket) before
        # accepting requests, so the first /api/infer doesn't stall minutes on
        # a cold XLA compile (see SVSInferHandler.precompile)
        if self.hparams.get("precompile", True):
            compiled = self.core.precompile()
            print(f"| web: precompiled {len(compiled)} bucket program(s): "
                  f"{compiled}")

    # ---- dictionaries -----------------------------------------------------

    def _build_word_dictionary(self):
        hp = self.hparams
        self.word_dictionary = {}
        self.consonant_set = {}
        for lang in hp.get("languages", {}):
            self.word_dictionary[lang] = {"AP": ["AP"], "SP": ["SP"]}
            self.consonant_set[lang] = set()
            try:
                with open(hp["dictionary"][lang]["word"]) as f:
                    for x in f.readlines():
                        line = x.split("\n")[0].split("\t")
                        self.word_dictionary[lang][line[0]] = line[1].split(" ")
                with open(hp["dictionary"][lang]["phoneme"]) as f:
                    for x in f.readlines():
                        line = x.split("\n")[0].split(" ")
                        if line[1] == "consonant":
                            self.consonant_set[lang].add(line[0])
                        self.word_dictionary[lang][f".{line[0]}"] = [line[0]]
            except (FileNotFoundError, KeyError):
                print(f"| web: dictionary for {lang!r} unavailable")

    def get_ph_num_list(self, lang: str, word_ph_text_list: List[List[str]]) -> List[int]:
        ph_num = [0] * len(word_ph_text_list)
        for i, ph_list in enumerate(word_ph_text_list):
            for ph_idx, ph in enumerate(ph_list):
                if ph_idx == 0 and ph in self.consonant_set.get(lang, set()) and i > 0:
                    ph_num[i - 1] += 1
                else:
                    ph_num[i] += 1
        return ph_num

    # ---- API implementations ------------------------------------------------

    def api_basic_info(self, _req=None):
        return {
            "languages": list(self.core.lang_map.keys()),
            "speakers": list(self.core.spk_map.keys()),
            "hop_size": self.hparams["hop_size"],
            "samplerate": self.hparams["audio_sample_rate"],
            "pitch_styles": list(self.pitch_pred_spk_map.keys()),
        }

    def api_pred_dur(self, req: dict):
        for key in ("language", "word_list", "word_dur_list", "start_time"):
            assert key in req, f"{key} is required"
        assert self.dur_predictor is not None, "dur predictor not loaded"
        lang = req["language"]
        word_list = ["SP"] + req["word_list"]
        word_ph_text_list = [
            self.word_dictionary.get(lang, {}).get(w, ["SP"]) for w in word_list
        ]
        ph_text_list = list(
            chain.from_iterable(
                [
                    self.core.ph_map.get(self.core.get_ph_text(ph, lang), "SP")
                    for ph in ph_list
                ]
                for ph_list in word_ph_text_list
            )
        )
        ph_tokens = self.dur_predictor.encode(ph_text_list)
        ph_num = self.get_ph_num_list(lang, word_ph_text_list)
        padding_note_time = req.get("padding_note_time", 0.5)
        word_dur_list = [padding_note_time] + req["word_dur_list"]
        ph_dur = self.dur_predictor.run(ph_tokens, ph_num, word_dur_list)

        start_time = req["start_time"] - padding_note_time
        ph_dur_list = [float(x) for x in ph_dur]
        note_ph_list = []
        idx = 0
        ph_start = start_time
        for i, word in enumerate(word_list[1:]):
            word_ph_num = len(self.word_dictionary.get(lang, {}).get(word, ["SP"]))
            if i == 0:
                word_ph_num += 1  # the padding SP attaches to the first word
            note_ph_list.append([])
            for j in range(idx, idx + word_ph_num):
                note_ph_list[-1].append(
                    {
                        "ph": ph_text_list[j],
                        "start_time": ph_start,
                        "end_time": ph_start + ph_dur_list[j],
                    }
                )
                ph_start += ph_dur_list[j]
            idx += word_ph_num
        return {"start_time": start_time, "note_ph_list": note_ph_list}

    def api_pred_pitch(self, req: dict):
        for key in ("language", "ph_text_list", "ph_dur_list",
                    "note_midi_list", "note_dur_list"):
            assert key in req, f"{key} is required"
        assert self.pitch_predictor is not None, "pitch predictor not loaded"
        lang = req["language"]
        ph_tokens = self.pitch_predictor.encode_ph_categories(req["ph_text_list"], lang)
        ph_dur = np.asarray(req["ph_dur_list"], np.float64)
        ph_acc = np.round(np.cumsum(ph_dur) / self.timestep + 0.5).astype(np.int64)
        durations = np.diff(ph_acc, prepend=0)
        mel_len = int(durations.sum())
        mel2ph = np.repeat(np.arange(1, len(ph_tokens) + 1), durations)

        note_midi = np.asarray(req["note_midi_list"], np.float64)
        note_rest = note_midi == -1
        if np.all(note_rest):
            note_midi = np.full_like(note_midi, 60.0)
        else:
            from scipy import interpolate

            f = interpolate.interp1d(
                np.where(~note_rest)[0], note_midi[~note_rest],
                kind="nearest", fill_value="extrapolate",
            )
            note_midi[note_rest] = f(np.where(note_rest)[0])
        spk_name = req.get("style", "")
        spk_id = self.pitch_pred_spk_map.get(spk_name, 0)
        pitch = self.pitch_predictor.run(
            note_midi, note_rest, np.asarray(req["note_dur_list"], np.float64),
            mel_len, self.timestep,
            spk_id=spk_id, pitch_expr=float(req.get("pitch_expr", 1.0)),
            ph_tokens=ph_tokens, mel2ph=mel2ph,
        )
        return {"pitch": [float(x) for x in pitch]}

    def api_infer(self, req: dict):
        for key in ("speaker", "language", "ph_text_list", "ph_dur_list", "pitch_list"):
            assert key in req, f"{key} is required"
        core = self.core
        spk_mix_embed = core.spk_mix_embed(core.get_speaker_mix(req["speaker"]))
        ph_tokens = np.asarray(core.ph_encoder.encode(req["ph_text_list"]), np.int32)
        lang = req["language"]
        ph_dur = np.asarray(req["ph_dur_list"], np.float64)
        ph_acc = np.round(np.cumsum(ph_dur) / self.timestep + 0.5).astype(np.int64)
        durations = np.diff(ph_acc, prepend=0)
        mel_len = int(durations.sum())
        f0 = midi_to_hz(np.asarray(req["pitch_list"], np.float64)).astype(np.float32)
        if len(f0) < mel_len:
            f0 = np.concatenate([f0, np.full(mel_len - len(f0), f0[-1], np.float32)])
        f0 = f0[:mel_len]

        # run through the padded/jitted acoustic + vocoder path of the core
        segment = {
            "ph_seq": " ".join(req["ph_text_list"]),
            "ph_dur": " ".join(str(float(x)) for x in ph_dur),
            "f0_seq": " ".join(str(float(x)) for x in f0),
            "f0_timestep": str(self.timestep),
            "lang": lang,
            "spk_name": req["speaker"],
        }
        wav = core.infer(segment)[0]

        if "voicing_list" in req and "breath_list" in req:
            try:
                from prodiff_tpu.separation import extract_harmonic_aperiodic

                sp, ap = extract_harmonic_aperiodic(wav, self.hparams["vr_ckpt"])
                sr = self.hparams["audio_sample_rate"]
                voicing = resample_align_curve(
                    np.asarray(req["voicing_list"], np.float64),
                    self.timestep, 1 / sr, len(wav),
                )
                sp = sp * 10 ** (voicing * 0.05)
                breath = resample_align_curve(
                    np.asarray(req["breath_list"], np.float64),
                    self.timestep, 1 / sr, len(wav),
                )
                ap = ap * 10 ** (breath * 0.05)
                wav = sp + ap
            except Exception as e:
                print(f"| web: VR gain path unavailable ({e}); returning raw wav")
        return {"wav": [float(x) for x in wav]}

    # ---- server ---------------------------------------------------------------

    def make_server(self) -> ThreadingHTTPServer:
        routes_get = {"/api/basic_info": self.api_basic_info}
        routes_post = {
            "/api/infer": self.api_infer,
            "/api/pred_dur": self.api_pred_dur,
            "/api/pred_pitch": self.api_pred_pitch,
        }

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                fn = routes_get.get(self.path)
                if fn is None:
                    return self._send(404, {"error": f"unknown route {self.path}"})
                try:
                    self._send(200, fn())
                except AssertionError as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:
                    traceback.print_exc()
                    self._send(500, {"error": str(e)})

            def do_POST(self):
                fn = routes_post.get(self.path)
                if fn is None:
                    return self._send(404, {"error": f"unknown route {self.path}"})
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    self._send(200, fn(req))
                except AssertionError as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:
                    traceback.print_exc()
                    self._send(500, {"error": str(e)})

            def log_message(self, fmt, *args):
                print(f"| web: {fmt % args}")

        return ThreadingHTTPServer((self.host, self.port), Handler)

    def handle(self):
        server = self.make_server()
        print(f"| web server on http://{self.host}:{self.port}")
        server.serve_forever()
