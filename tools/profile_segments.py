"""Batched-segment serving attribution (round-4 verdict weak #2 / task #5).

Round 3 recorded a 1.43x B=4-over-B=1 per-segment win; after round 4's
streamed-s0 kernel sped B=1 most, bench's own numbers narrowed it to ~1.06x.
This tool splits the segment pipeline (teacher acoustic + packed NSF
vocoder, the exact bench_batched_segments composition, reference segment
loop ``handler/infer/handler.py:362-400``) into its two halves at B=1 and
B=n_seg with bench.py's two-K methodology, so the scaling story is
attributable: which half still amortizes with batch, and which is
work-bound (linear) so batching buys throughput-at-capacity, not latency.

    python tools/profile_segments.py [--batches 1 4] [--parts e2e teacher vocoder]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench

T_MEL, N_MELS = 512, 128


def _setup(B):
    from prodiff_tpu.models.nsf_hifigan import Generator, PackedGeneratorRunner

    rng = np.random.default_rng(4)
    acoustic, inputs, tparams = bench._teacher(N_MELS, rng, B, 16, T_MEL, 4)
    f0 = inputs[2]
    gen = Generator()
    gparams = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(4), "noise": jax.random.PRNGKey(5)},
        jnp.zeros((B, T_MEL, N_MELS)), f0,
    )
    runner = PackedGeneratorRunner(gen)
    prepared = jax.jit(runner.prepare)(gparams)
    return acoustic, tparams, runner, prepared, f0


def part_e2e(B):
    acoustic, tparams, runner, prepared, f0 = _setup(B)

    def e2e(rng_key, eps, c):
        tp, gp = c
        mel = acoustic(rng_key, eps, tp)
        return runner(gp, mel * 2.30259, f0 + eps, rng_key)

    return bench._chain(e2e, jax.random.PRNGKey(11), consts=(tparams, prepared))


def part_teacher(B):
    acoustic, tparams, _, _, _ = _setup(B)

    def fn(rng_key, eps, c):
        return acoustic(rng_key, eps, c)

    return bench._chain(fn, jax.random.PRNGKey(11), consts=tparams)


def part_vocoder(B):
    _, _, runner, prepared, f0 = _setup(B)
    rng = np.random.default_rng(7)
    mel = jnp.asarray(
        rng.normal(size=(B, T_MEL, N_MELS)).astype(np.float32)
    )

    def fn(rng_key, eps, c):
        return runner(c, mel + eps, f0 + eps, rng_key)

    return bench._chain(fn, jax.random.PRNGKey(12), consts=prepared)


PARTS = {"e2e": part_e2e, "teacher": part_teacher, "vocoder": part_vocoder}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", nargs="*", type=int, default=[1, 4])
    ap.add_argument("--parts", nargs="*", default=list(PARTS))
    args = ap.parse_args()

    try:
        from prodiff_tpu.utils.jax_cache import enable_persistent_cache

        enable_persistent_cache()
    except Exception:
        pass

    print(f"platform={jax.devices()[0].platform} T_mel={T_MEL}")
    per = {}
    for name in args.parts:
        for B in args.batches:
            dt = bench._measure(PARTS[name](B))
            per[(name, B)] = dt / B
            print(f"{name:10s} B={B}  {dt * 1000:8.3f} ms total  "
                  f"{dt / B * 1000:8.3f} ms/seg")
    for name in args.parts:
        bs = [b for b in args.batches if (name, b) in per]
        if len(bs) >= 2:
            b0, b1 = bs[0], bs[-1]
            print(f"{name:10s} per-seg speedup B={b0}->B={b1}: "
                  f"{per[(name, b0)] / per[(name, b1)]:.2f}x")


if __name__ == "__main__":
    main()
