"""Offline (binarize) pipeline throughput: this framework vs torch-CPU.

Round-4 verdict #6: the binarize loop is the reference's hot OFFLINE path
(``handler/binarize/handler.py:33-41`` — per item: mel STFT, pitch extraction,
optional VR harmonic/aperiodic separation, voicing/breath/tension curves; GPU
used opportunistically, here torch is CPU-only). This tool times the
comparable per-item components on the SAME host at the same shapes —

  mel     log10-mel of the item   (ours: ops/mel.py jitted | ref: torch STFT)
  rmvpe   E2E0 net forward + LWA decode at 16 kHz/hop 160
          (ours: flax models/rmvpe.py | ref: modules/rmvpe/model.py)
  vr      CascadedNet forward at released-model scale (n_fft 2048, hop 512,
          nout 64, nout_lstm 128, mono)
          (ours: models/vr.py | ref: modules/vr/nets.py)
  curves  voicing + breath + tension (+ the kth-harmonic STFT they need)

— with random weights (throughput is weight-independent), and prints one JSON
line with per-component ms per ITEM (a 5.94 s clip), the component-sum items/s
per side, and the speedup. Our side runs on the default platform (TPU when
available; pass --platform cpu to compare CPU-vs-CPU). The pitch extractors
are compared via RMVPE (the reference's other PE, parselmouth, is a C library
neither side runs in this image; our built-in Boersma/Praat-AC replacement is
reported as ``acf_pe_ms`` for completeness, with no reference counterpart).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

SR, HOP, WIN, NFFT, N_MELS = 44100, 512, 2048, 2048, 128
AUDIO_SEC = 5.944  # 262144 samples: the bench T_mel=512 item
SMOOTH = 7  # smoothing kernel frames (reference: round(0.12 / timestep))


def _best_of(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _audio(seed=0):
    rng = np.random.default_rng(seed)
    n = int(AUDIO_SEC * SR)
    t = np.arange(n) / SR
    f0 = 220.0 * 2 ** (np.sin(t * 2.0) * 3 / 12)
    wav = np.sin(2 * np.pi * np.cumsum(f0) / SR)
    for k in (2, 3, 4):
        wav += 0.3 / k * np.sin(2 * np.pi * k * np.cumsum(f0) / SR)
    wav += 0.05 * rng.normal(size=n)
    return (0.5 * wav / np.abs(wav).max()).astype(np.float32)


# ---- ours -------------------------------------------------------------------


def ours_components(wav):
    import jax
    import jax.numpy as jnp

    from prodiff_tpu.binarize.utils import (
        get_breath,
        get_mel_spec,
        get_tension,
        get_voicing,
    )
    from prodiff_tpu.models.rmvpe import E2E0, to_local_average_f0
    from prodiff_tpu.models.vr import CascadedNet

    out = {}
    mel_len = len(wav) // HOP

    def mel():
        return get_mel_spec(wav, SR, N_MELS, NFFT, WIN, HOP, 40, 16000)

    out["mel_ms"] = _best_of(mel) * 1000

    # RMVPE at its native 16 kHz / hop 160 grid; T padded to a 32-multiple
    t16 = int(AUDIO_SEC * 16000) // 160 + 1
    t16 += (-t16) % 32
    model = E2E0(4, 1, (2, 2))
    mel16 = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, t16, 128)).astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), mel16)
    fwd = jax.jit(model.apply)

    def rmvpe():
        hidden = np.asarray(fwd(params, mel16))[0]
        return to_local_average_f0(hidden)

    out["rmvpe_ms"] = _best_of(rmvpe) * 1000

    # VR at released-model scale; input [1, F, T, 2]. Frame count follows
    # SeparationModel.predict_from_audio's padding (31 mod 32 frames + center)
    n_frames = len(wav) // HOP + 1
    vr_t = 32 * (n_frames // 32 + 1)
    vr = CascadedNet(NFFT, HOP, nout=64, nout_lstm=128, is_mono=True)
    spec = jnp.asarray(
        np.random.default_rng(2)
        .normal(size=(1, NFFT // 2 + 1, vr_t, 2))
        .astype(np.float32)
    )
    vparams = jax.jit(vr.init)(jax.random.PRNGKey(0), spec)
    vfwd = jax.jit(vr.apply)

    def vr_fwd():
        return np.asarray(vfwd(vparams, spec))

    out["vr_ms"] = _best_of(vr_fwd) * 1000

    f0 = np.full(mel_len, 220.0, np.float32)

    def curves():
        get_voicing(wav, mel_len, HOP, WIN, SMOOTH)
        get_breath(wav, mel_len, HOP, WIN, SMOOTH)
        get_tension(wav, mel_len, f0, HOP, WIN, SR, SMOOTH)

    out["curves_ms"] = _best_of(curves) * 1000

    # informational: the built-in Praat-AC PE (no reference counterpart here)
    try:
        from prodiff_tpu.pe.acf import ACF

        pe = ACF({})

        def acf():
            pe.get_pitch(wav, samplerate=SR, length=mel_len, hop_size=HOP)

        out["acf_pe_ms"] = _best_of(acf, n=1) * 1000
    except Exception:
        pass
    return out


# ---- reference (torch CPU) --------------------------------------------------


def reference_components(wav):
    import importlib

    import torch

    from ref_stubs import install_reference_stubs

    install_reference_stubs()
    torch.set_num_threads(os.cpu_count() or 1)
    bu = importlib.import_module("component.binarizer.binarizer_utils")
    rmvpe_model = importlib.import_module("modules.rmvpe.model")
    vr_nets = importlib.import_module("modules.vr.nets")
    common = importlib.import_module("modules.commons.common_layers")

    out = {}
    mel_len = len(wav) // HOP

    def mel():
        return bu.get_mel_spec(wav, SR, N_MELS, NFFT, WIN, HOP, 40, 16000)

    out["mel_ms"] = _best_of(mel) * 1000

    t16 = int(AUDIO_SEC * 16000) // 160 + 1
    t16 += (-t16) % 32
    torch.manual_seed(0)
    e2e = rmvpe_model.E2E0(4, 1, (2, 2)).eval()
    mel16 = torch.from_numpy(
        np.random.default_rng(1).normal(size=(1, 128, t16)).astype(np.float32)
    )

    def rmvpe():
        with torch.no_grad():
            hidden = e2e(mel16).numpy()[0]
        # the reference decodes with its own local-weighted average
        # (modules/rmvpe/inference.py); ours is the measured analogue and its
        # decode cost is already counted on our side — count only the net here
        return hidden

    out["rmvpe_ms"] = _best_of(rmvpe) * 1000

    torch.manual_seed(0)
    vr = vr_nets.CascadedNet(
        NFFT, HOP, nout=64, nout_lstm=128, is_complex=True, is_mono=True
    ).eval()
    # same frame count as predict_from_audio's 32-frame padding (nets.py:175-197)
    vr_t = 32 * ((len(wav) // HOP + 1) // 32 + 1)
    spec = torch.from_numpy(
        (
            np.random.default_rng(2).normal(size=(1, 1, NFFT // 2 + 1, vr_t))
            + 1j * np.random.default_rng(3).normal(size=(1, 1, NFFT // 2 + 1, vr_t))
        ).astype(np.complex64)
    )

    def vr_fwd():
        with torch.no_grad():
            return vr(spec).numpy()

    out["vr_ms"] = _best_of(vr_fwd) * 1000

    smooth = common.SinusoidalSmoothingConv1d(SMOOTH)
    f0 = np.full(mel_len, 220.0, np.float32)

    def curves():
        bu.get_voicing(wav, mel_len, HOP, WIN, smooth, device="cpu")
        bu.get_breath(wav, mel_len, HOP, WIN, smooth, device="cpu")
        bu.get_tension(wav, mel_len, f0, HOP, WIN, SR, smooth, device="cpu")

    out["curves_ms"] = _best_of(curves) * 1000
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="force JAX platform for our side (e.g. cpu)")
    ap.add_argument("--sides", nargs="+", default=["ours", "reference"])
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    try:
        from prodiff_tpu.utils.jax_cache import enable_persistent_cache

        enable_persistent_cache()
    except Exception:
        pass

    wav = _audio()
    result = {"audio_sec_per_item": round(AUDIO_SEC, 3)}
    comp_keys = ("mel_ms", "rmvpe_ms", "vr_ms", "curves_ms")
    for side, fn in (("ours", ours_components),
                     ("reference", reference_components)):
        if side not in args.sides:
            continue
        comps = fn(wav)
        total = sum(comps[k] for k in comp_keys)
        result[side] = {k: round(v, 2) for k, v in comps.items()}
        result[side]["component_sum_ms"] = round(total, 2)
        result[side]["items_per_sec"] = round(1000.0 / total, 3)
    if "ours" in result and "reference" in result:
        result["speedup_vs_reference"] = round(
            result["reference"]["component_sum_ms"]
            / result["ours"]["component_sum_ms"], 3,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
