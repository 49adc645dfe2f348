"""Headline benchmark: acoustic text->mel RTF on one chip.

Runs the flagship ProDiffTeacher (reference scale: 4 enc layers x 256 hidden,
20x256 WaveNet, 128 mel bins, hop 512 @ 44.1 kHz) with 4-step ProDiff
sampling, jitted, and reports real-time factor (wall seconds per second of
synthesised audio). Prints ONE JSON line.

``vs_baseline`` compares against the BASELINE.json north-star of end-to-end
RTF 0.02 (acoustic + vocoder); until the vocoder path is benchmarked the
acoustic stage is reported against that same budget (>1 means faster than
the full-pipeline target).
"""

import json
import time

import jax
import numpy as np


def main():
    from __graft_entry__ import entry

    fn, args = entry()
    jfn = jax.jit(fn)
    out = jfn(*args)
    out.block_until_ready()  # compile

    # steady state over several iterations with distinct rng keys
    iters = 10
    t0 = time.time()
    for i in range(iters):
        out = jfn(*args[:-1], jax.random.PRNGKey(i))
    out.block_until_ready()
    dt = (time.time() - t0) / iters

    B, T_mel = out.shape[0], out.shape[1]
    hop, sr = 512, 44100
    audio_sec = B * T_mel * hop / sr
    rtf = dt / audio_sec
    frames_per_sec = B * T_mel / dt

    baseline_rtf = 0.02  # BASELINE.json: end-to-end text->wav target on v5e
    print(
        json.dumps(
            {
                "metric": "acoustic_text2mel_rtf_4step",
                "value": round(rtf, 6),
                "unit": "rtf",
                "vs_baseline": round(baseline_rtf / rtf, 3),
                "extra": {
                    "mel_frames_per_sec_per_chip": round(frames_per_sec, 1),
                    "batch": int(B),
                    "t_mel": int(T_mel),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
