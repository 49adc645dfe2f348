"""Whole-pipeline MCD vs the torch reference, as a bench-embeddable tool.

Round-4 verdict #1: the BASELINE sentence is "RTF < 0.02 *at reference MCD*",
but the quality half lived only in a CPU unit test. This tool packages that
test's recipe (``tests/test_mcd_pipeline.py``) so ``bench.py`` can emit
``mcd_vs_reference_db`` in its DEFAULT output: the SAME ``.ds`` segment is
rendered text->mel->wav by

  (a) the torch reference InferHandler (``/root/reference/handler/infer/
      handler.py:203-359``) on CPU with its randomness collapsed to zeros, and
  (b) this framework's ``SVSInferHandler(deterministic=True)`` on the bench
      device (TPU),

both loaded with ONE randomly-initialised teacher + NSF-HiFiGAN checkpoint
(weights converted with the golden-tested converters), and the two renders are
compared by mel-cepstral distortion. Random weights are the right instrument
here: MCD between the two *implementations* measures pipeline equivalence and
is weight-independent (real released weights are environment-blocked — zero
egress; see tests/test_real_weights.py).

``scale="bench"`` uses the flagship bench dimensions (128 mels, hidden 256,
20x256 WaveNet, hop 512 @ 44.1 kHz, full 512-ch NSF-HiFiGAN, ~5.9 s segment);
``scale="toy"`` the unit test's tiny dimensions (fast; used by the CPU test
that pins this tool's plumbing).

The mel analysis + MCD here are pure numpy (identical treatment of both wavs)
so the metric never dispatches eager ops through the TPU relay.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


# ---- configs ----------------------------------------------------------------

TOY_HP = {
    "audio_num_mel_bins": 16, "hidden_size": 32, "enc_layers": 2,
    "enc_ffn_kernel_size": 9, "dropout": 0.1, "num_heads": 2,
    "use_dur_embed": True, "use_spk_id": True, "num_spk": 2,
    "use_lang_id": True, "languages": {"zh": 1}, "use_gender_id": False,
    "use_voicing_embed": False, "use_breath_embed": False,
    "diff_type": "prodiff", "timesteps": 4, "timescale": 1,
    "schedule_type": "vpsde", "max_beta": 40,
    "spec_min": [-12], "spec_max": [0],
    "residual_layers": 3, "residual_channels": 16, "dilation_cycle_length": 1,
    "rel_pos": False, "hop_size": 64, "win_size": 512, "fft_size": 512,
    "audio_sample_rate": 44100, "fmin": 40, "fmax": 16000,
    "vocoder": "nsfhifigan", "seed": 1234,
}

TOY_VOCODER_H = {
    "num_mels": 16, "sampling_rate": 44100, "upsample_initial_channel": 32,
    "upsample_rates": [4, 4, 4], "upsample_kernel_sizes": [8, 8, 8],
    "resblock": "1", "resblock_kernel_sizes": [3, 7],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
    "n_fft": 512, "win_size": 512, "hop_size": 64, "fmin": 40, "fmax": 16000,
}

# flagship/bench scale: the shapes bench.py's RTF numbers are measured at
BENCH_HP = dict(
    TOY_HP,
    audio_num_mel_bins=128, hidden_size=256, enc_layers=4,
    residual_layers=20, residual_channels=256,
    hop_size=512, win_size=2048, fft_size=2048,
)

BENCH_VOCODER_H = {
    "num_mels": 128, "sampling_rate": 44100, "upsample_initial_channel": 512,
    "upsample_rates": [8, 8, 2, 2, 2], "upsample_kernel_sizes": [16, 16, 4, 4, 4],
    "resblock": "1", "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "n_fft": 2048, "win_size": 2048, "hop_size": 512, "fmin": 40, "fmax": 16000,
}

PH_MAP = {"SP/zh": "SP", "a/zh": "a", "b/zh": "b", "c/zh": "c"}

TOY_SEGMENT = {
    "ph_seq": "a b c SP",
    "ph_dur": "0.20 0.30 0.25 0.05",
    "f0_seq": " ".join(f"{220.0 * 2 ** (i / 96):.2f}" for i in range(16)),
    "f0_timestep": "0.05",
    "lang": "zh",
    "spk_name": "spk0:0.6|spk1:0.4",
    "keyshift": 0,
    "gender": 0.0,
}

# ~5.9 s segment -> T_mel ~= 509 @ hop 512 (the bench T_mel=512 bucket)
BENCH_SEGMENT = {
    "ph_seq": " ".join(["a", "b", "c"] * 5 + ["SP"]),
    "ph_dur": " ".join(["0.37"] * 15 + ["0.35"]),
    "f0_seq": " ".join(
        f"{220.0 * 2 ** (np.sin(i / 8.0) * 3 / 12):.2f}" for i in range(120)
    ),
    "f0_timestep": "0.05",
    "lang": "zh",
    "spk_name": "spk0:0.6|spk1:0.4",
    "keyshift": 0,
    "gender": 0.0,
}


# ---- numpy mel analysis + MCD ----------------------------------------------


def _np_log10_mel(wav: np.ndarray, hp: dict) -> np.ndarray:
    """log10-mel [T, M] of one wav, numpy only (hann, reflect-centered)."""
    from prodiff_tpu.ops.mel import mel_filterbank

    n_fft, win, hop = hp["fft_size"], hp["win_size"], hp["hop_size"]
    y = np.pad(wav.astype(np.float64), (win // 2, win // 2), mode="reflect")
    n_frames = 1 + (len(y) - win) // hop
    idx = np.arange(win)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = y[idx] * np.hanning(win + 1)[:win][None, :]
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=-1))
    fb = np.asarray(
        mel_filterbank(
            hp["audio_sample_rate"], n_fft, hp["audio_num_mel_bins"],
            hp["fmin"], hp["fmax"],
        )
    )
    mel = spec @ fb.T
    return np.log10(np.maximum(mel, 1e-5)).astype(np.float32)


def np_mcd_db(wav_a: np.ndarray, wav_b: np.ndarray, hp: dict,
              n_mfcc: int = 13) -> float:
    """MCD (dB, c0 excluded) between two wavs through one shared analysis."""
    from prodiff_tpu.ops.metrics import _dct_matrix

    t = min(len(wav_a), len(wav_b))
    ma, mb = _np_log10_mel(wav_a[:t], hp), _np_log10_mel(wav_b[:t], hp)
    dct = _dct_matrix(hp["audio_num_mel_bins"], n_mfcc).astype(np.float64)
    ca = (ma * np.log(10)) @ dct.T
    cb = (mb * np.log(10)) @ dct.T
    dist = np.sqrt(2.0 * np.sum((ca[:, 1:] - cb[:, 1:]) ** 2, axis=-1))
    return float((10.0 / np.log(10)) * np.mean(dist))


# ---- the two renders --------------------------------------------------------


def _write_maps(work_dir: str):
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "phone_set.json"), "w") as f:
        json.dump(PH_MAP, f)
    with open(os.path.join(work_dir, "spk_map.json"), "w") as f:
        json.dump({"spk0": 0, "spk1": 1}, f)
    with open(os.path.join(work_dir, "lang_map.json"), "w") as f:
        json.dump({"zh": 1}, f)


# our-side hparams that pin every reduced-precision fast path to f32, so the
# render is apples-to-apples with the torch reference's f32 CPU math. The
# shipped TPU defaults (bf16 tap stacks / bf16 denoiser weight streaming /
# XLA:TPU's internal bf16 matmul passes) add only a ~-53 dB broadband
# residual — inaudible, but log-mel MCD on RANDOM-INIT weights amplifies it
# to ~20 dB because a random-init spectrum has near-empty bands at -70 dB
# where that floor dominates (round-5 bench finding, tools/debug_mcd_tpu.py).
PIN_OVERRIDES = {
    "pallas_wavenet_dtype": "float32",
    "nsf_fused_res_dtype": "float32",
}


def mcd_vs_reference(work_root: str, scale: str = "bench",
                     ours_overrides: dict | None = None,
                     return_wavs: bool = False,
                     precision_pin: bool = False) -> dict:
    """Run both renders under ``work_root`` (a scratch dir); return
    ``{"mcd_vs_reference_db", "ref_wall_s", "ours_wall_s", "audio_sec"}``.

    ``ours_overrides``: extra hparams written ONLY into our side's config
    (e.g. ``{"nsf_packed": False}``) — the bisection knob for attributing a
    TPU-vs-CPU MCD delta to a specific auto-ON TPU path.

    ``precision_pin``: render our side with PIN_OVERRIDES and
    ``jax_default_matmul_precision="highest"`` (restored after) — the
    implementation-equivalence measurement."""
    import importlib

    import torch
    import yaml

    from ref_stubs import install_reference_stubs

    install_reference_stubs()
    hp = dict(BENCH_HP if scale == "bench" else TOY_HP)
    voc_h = dict(BENCH_VOCODER_H if scale == "bench" else TOY_VOCODER_H)
    segment = dict(BENCH_SEGMENT if scale == "bench" else TOY_SEGMENT)

    # one torch-side random init shared by both pipelines
    voc_dir = os.path.join(work_root, "nsf_hifigan")
    os.makedirs(voc_dir, exist_ok=True)
    models = importlib.import_module("modules.nsf_hifigan.models")
    env = importlib.import_module("modules.nsf_hifigan.env")
    torch.manual_seed(7)
    gen = models.Generator(env.AttrDict(voc_h))
    torch.save({"generator": gen.state_dict()}, os.path.join(voc_dir, "model"))
    with open(os.path.join(voc_dir, "config.json"), "w") as f:
        json.dump(voc_h, f)
    hp["vocoder_ckpt"] = os.path.join(voc_dir, "model")

    teacher_mod = importlib.import_module("modules.svs.prodiff_teacher")
    ref_enc_mod = importlib.import_module("utils.text_encoder")
    ph_list = sorted(set(PH_MAP.values()))
    vocab = len(ref_enc_mod.TokenTextEncoder(None, vocab_list=ph_list,
                                             replace_oov="SP"))
    torch.manual_seed(3)
    teacher = teacher_mod.ProDiffTeacher(vocab, hp)
    teacher.eval()
    teacher_sd = teacher.state_dict()

    # ---- reference render (CPU, zero-noise) ----
    ref_root = os.path.join(work_root, "ref")
    ref_work = os.path.join(ref_root, "checkpoints", "x", "svs")
    _write_maps(ref_work)
    with open(os.path.join(ref_work, "config.yaml"), "w") as f:
        yaml.dump(hp, f)
    torch.save({"state_dict": {"model": teacher_sd}},
               os.path.join(ref_work, "model_ckpt_steps_100.ckpt"))
    handler_mod = importlib.import_module("handler.infer.handler")
    cwd = os.getcwd()
    saved = (torch.rand, torch.randn, torch.randn_like)
    try:
        os.chdir(ref_root)
        ref_handler = handler_mod.InferHandler("x", pred_pitch="")
        # collapse all torch randomness: diffusion x_init (torch.rand),
        # posterior step noise (torch.randn), SineGen phases/noise
        torch.rand = lambda *s, **k: torch.zeros(*s)
        torch.randn = lambda *s, **k: torch.zeros(*s)
        torch.randn_like = lambda x, **k: torch.zeros_like(x)
        t0 = time.time()
        want_wav = ref_handler.infer(dict(segment))[0]
        ref_wall = time.time() - t0
    finally:
        torch.rand, torch.randn, torch.randn_like = saved
        os.chdir(cwd)

    # ---- this framework (bench device, deterministic) ----
    from prodiff_tpu.infer.handler import SVSInferHandler
    from prodiff_tpu.utils import ckpt_utils
    from prodiff_tpu.utils.teacher_convert import convert_prodiff_teacher

    import jax

    over = dict(ours_overrides or {})
    if precision_pin:
        over.update(PIN_OVERRIDES)
    my_root = os.path.join(work_root, "mine", "checkpoints")
    my_work = os.path.join(my_root, "x", "svs")
    _write_maps(my_work)
    with open(os.path.join(my_work, "config.yaml"), "w") as f:
        yaml.dump(dict(hp, **over), f)
    sd_np = {k: v.numpy() for k, v in teacher_sd.items()}
    params = convert_prodiff_teacher(sd_np, hp)
    ckpt_utils.save_checkpoint(my_work, 100,
                               {"global_step": 100, "state_dict": params})
    prec_before = jax.config.jax_default_matmul_precision
    try:
        if precision_pin:
            jax.config.update("jax_default_matmul_precision", "highest")
        mine = SVSInferHandler("x", checkpoints_root=my_root,
                               deterministic=True)
        t0 = time.time()
        got_wav = mine.infer(dict(segment))[0]
        ours_wall = time.time() - t0
    finally:
        if precision_pin:
            jax.config.update("jax_default_matmul_precision", prec_before)

    assert got_wav.shape == want_wav.shape, (got_wav.shape, want_wav.shape)
    assert np.isfinite(got_wav).all() and np.isfinite(want_wav).all()
    assert np.abs(want_wav).max() > 1e-3, "degenerate reference render"
    out = {
        "mcd_vs_reference_db": round(np_mcd_db(got_wav, want_wav, hp), 4),
        "ref_wall_s": round(ref_wall, 2),
        "ours_wall_s": round(ours_wall, 2),
        "audio_sec": round(len(got_wav) / hp["audio_sample_rate"], 2),
    }
    if return_wavs:
        out["got_wav"], out["want_wav"] = got_wav, want_wav
    return out


def main():
    import argparse
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="bench", choices=["bench", "toy"])
    args = ap.parse_args()
    with tempfile.TemporaryDirectory() as d:
        print(json.dumps(mcd_vs_reference(d, scale=args.scale)))


if __name__ == "__main__":
    main()
