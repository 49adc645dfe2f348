"""Measure the PyTorch reference's inference speed on this box (CPU torch).

SURVEY.md §6: the reference publishes no benchmark numbers, so the rebuild
must *establish* the baseline by measuring the reference itself. This tool
runs the reference's own modules (imported from /root/reference with the test
suite's stubs) at the SAME scales bench.py uses for the TPU numbers, with
random weights (inference wall time is weight-independent), and prints one
JSON line per config:

  1. ProDiff teacher 4-step text->mel           (bench_acoustic_4step scale)
  2. 2-step teacher + 4-iter FastDiff text->wav (bench_e2e_fastdiff scale)
  3. NSF-HiFiGAN generator @44.1k/hop512        (bench_e2e_nsf_hifigan scale)

torch is CPU-only in this image (the reference's own hardware, NVIDIA GPUs,
is not available), so these are commodity-CPU reference points, not the
paper's 2080Ti claim. Reference entry points being measured:
  - modules/svs/prodiff_teacher.py (ProDiffTeacher.forward, infer=True)
  - modules/FastDiff/module/util.py:158 sampling_given_noise_schedule
  - modules/nsf_hifigan/models.py Generator.forward
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import torch  # noqa: E402

from ref_stubs import install_reference_stubs  # noqa: E402

SR_SVS, HOP_SVS = 44100, 512
SR_LJ, HOP_LJ = 22050, 256
T_MEL, T_PH, B = 512, 16, 1


def _teacher_hp(n_mels, timesteps):
    return {
        "audio_num_mel_bins": n_mels,
        "hidden_size": 256,
        "enc_layers": 4,
        "enc_ffn_kernel_size": 9,
        "dropout": 0.1,
        "num_heads": 2,
        "use_dur_embed": True,
        "use_spk_id": True,
        "num_spk": 4,
        "use_lang_id": True,
        "languages": {"zh": 1, "jp": 2},
        "use_gender_id": False,
        "use_voicing_embed": False,
        "use_breath_embed": False,
        "diff_type": "prodiff",
        "timesteps": timesteps,
        "timescale": 1,
        "schedule_type": "vpsde",
        "max_beta": 40,
        "spec_min": [-12],
        "spec_max": [0],
        "residual_layers": 20,
        "residual_channels": 256,
        "dilation_cycle_length": 1,
        "rel_pos": False,
    }


def _teacher_inputs(rng):
    tokens = rng.integers(3, 64, (B, T_PH)).astype(np.int64)
    dur = rng.integers(4, 2 * (T_MEL // T_PH), (B, T_PH))
    mel2ph = np.zeros((B, T_MEL), np.int64)
    for b in range(B):
        pos = 0
        for k in range(T_PH):
            mel2ph[b, pos : min(pos + dur[b, k], T_MEL)] = k + 1
            pos += dur[b, k]
        mel2ph[b, pos:] = T_PH
    f0 = rng.uniform(100, 500, (B, T_MEL)).astype(np.float32)
    lang = np.ones((B, T_PH), np.int64)
    spk = np.zeros((B,), np.int64)
    return (
        torch.from_numpy(tokens),
        torch.from_numpy(mel2ph),
        torch.from_numpy(f0),
        torch.from_numpy(lang),
        torch.from_numpy(spk),
    )


def _build_teacher(n_mels, timesteps):
    import importlib

    mod = importlib.import_module("modules.svs.prodiff_teacher")
    torch.manual_seed(0)
    teacher = mod.ProDiffTeacher(64, _teacher_hp(n_mels, timesteps))
    teacher.eval()
    return teacher


def _time(fn, repeats):
    with torch.no_grad():
        fn()  # warmup (dispatch caches, allocator)
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
    return min(times)


def measure_teacher_4step(repeats):
    teacher = _build_teacher(128, 4)
    tokens, mel2ph, f0, lang, spk = _teacher_inputs(np.random.default_rng(0))

    def fwd():
        teacher(tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk, infer=True)

    dt = _time(fwd, repeats)
    audio_sec = B * T_MEL * HOP_SVS / SR_SVS
    return {
        "metric": "reference_teacher_4step_rtf",
        "value": round(dt / audio_sec, 5),
        "unit": "rtf",
        "wall_ms": round(dt * 1000, 1),
        "mel_frames_per_sec": round(B * T_MEL / dt, 1),
    }


def _build_fastdiff():
    import importlib

    # the reference's own imports use the lowercase package name, which breaks
    # on case-sensitive filesystems (SURVEY §2.11.1) — alias it
    pkg = importlib.import_module("modules.FastDiff")
    sys.modules.setdefault("modules.fastdiff", pkg)
    mod = importlib.import_module("modules.FastDiff.module")
    sys.modules.setdefault("modules.fastdiff.module", mod)
    mm = importlib.import_module("modules.FastDiff.module.modules")
    sys.modules.setdefault("modules.fastdiff.module.modules", mm)
    mu = importlib.import_module("modules.FastDiff.module.util")
    sys.modules.setdefault("modules.fastdiff.module.util", mu)
    fm = importlib.import_module("modules.FastDiff.module.FastDiff_model")
    torch.manual_seed(0)
    net = fm.FastDiff(
        audio_channels=1,
        inner_channels=32,
        cond_channels=80,
        upsample_ratios=[8, 8, 4],
        lvc_layers_each_block=4,
        lvc_kernel_size=3,
        kpnet_hidden_channels=64,
        kpnet_conv_size=3,
        dropout=0.0,
        diffusion_step_embed_dim_in=128,
        diffusion_step_embed_dim_mid=512,
        diffusion_step_embed_dim_out=512,
        use_weight_norm=True,
    )
    net.remove_weight_norm()
    net.eval()
    return net, mu


def measure_e2e_fastdiff(repeats):
    """2-step teacher + 4-iter FastDiff, the reference's 'extreme fast'
    configuration (readme.md:104-108) at LJSpeech scale."""
    teacher = _build_teacher(80, 2)
    net, mu = _build_fastdiff()
    tokens, mel2ph, f0, lang, spk = _teacher_inputs(np.random.default_rng(1))
    dh = mu.compute_hyperparams_given_schedule(
        torch.linspace(1e-6, 0.01, 1000)
    )
    schedule = torch.FloatTensor(
        [3.2176e-4, 2.5743e-3, 2.5376e-2, 7.0414e-1]
    )  # component/vocoder/fastdiff.py:66-77 (4-iter)
    audio_len = T_MEL * HOP_LJ

    def e2e():
        mel = teacher(
            tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk, infer=True
        )  # [B, T, M]
        c = mel.transpose(2, 1)  # [B, M, T] as spec2wav does
        mu.sampling_given_noise_schedule(
            net, (B, 1, audio_len), dh, schedule.clone(), condition=c,
            ddim=False, return_sequence=False,
        )

    dt = _time(e2e, repeats)
    audio_sec = B * audio_len / SR_LJ
    return {
        "metric": "reference_e2e_fastdiff_rtf",
        "value": round(dt / audio_sec, 5),
        "unit": "rtf",
        "wall_ms": round(dt * 1000, 1),
        "audio_sec": round(audio_sec, 2),
    }


def measure_nsf_hifigan(repeats):
    import importlib

    models = importlib.import_module("modules.nsf_hifigan.models")
    env = importlib.import_module("modules.nsf_hifigan.env")
    h = env.AttrDict({
        "num_mels": 128,
        "sampling_rate": SR_SVS,
        "upsample_initial_channel": 512,
        "upsample_rates": [8, 8, 2, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4, 4],
        "resblock": "1",
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5]] * 3,
        "n_fft": 2048,
        "win_size": 2048,
        "hop_size": HOP_SVS,
        "fmin": 40,
        "fmax": 16000,
    })
    torch.manual_seed(0)
    gen = models.Generator(h)
    gen.remove_weight_norm()
    gen.eval()
    rng = np.random.default_rng(2)
    mel = torch.from_numpy(
        rng.normal(size=(B, 128, T_MEL)).astype(np.float32) * -6
    )
    f0 = torch.from_numpy(rng.uniform(100, 500, (B, T_MEL)).astype(np.float32))

    def fwd():
        gen(mel, f0)

    dt = _time(fwd, repeats)
    audio_sec = B * T_MEL * HOP_SVS / SR_SVS
    return {
        "metric": "reference_nsf_hifigan_rtf",
        "value": round(dt / audio_sec, 5),
        "unit": "rtf",
        "wall_ms": round(dt * 1000, 1),
        "audio_sec": round(audio_sec, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--configs", nargs="+",
        default=["teacher", "e2e_fastdiff", "nsf_hifigan"],
    )
    args = ap.parse_args()
    install_reference_stubs()
    torch.Tensor.cuda = lambda self, *a, **k: self  # reference hardcodes .cuda()
    torch.set_num_threads(os.cpu_count() or 1)
    fns = {
        "teacher": measure_teacher_4step,
        "e2e_fastdiff": measure_e2e_fastdiff,
        "nsf_hifigan": measure_nsf_hifigan,
    }
    for name in args.configs:
        try:
            print(json.dumps(fns[name](args.repeats)))
        except Exception as e:  # keep going; partial numbers still useful
            print(json.dumps({"metric": f"reference_{name}", "error": f"{type(e).__name__}: {e}"}))


if __name__ == "__main__":
    main()
