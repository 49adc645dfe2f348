"""Stage-level NSF-HiFiGAN generator timing on the real chip.

The generator's upsample pyramid runs 512->256->128->64->32->16 channels at
4096->262144 samples (T_mel=512, hop 512). The low-channel tail tiles at
128-lane granularity, so [T, 16] f32 costs 8x its logical HBM traffic — the
same pathology the FastDiff packed trunk fixed. This tool isolates each
stage (convT + noise conv + 3 resblocks) with bench.py's chained-fori_loop
two-K methodology to see where the wall time actually is, f32 vs bf16.

    python tools/profile_nsf.py [--b 1] [--dtypes f32 bf16] [--parts ...]
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

T_MEL, N_MELS, HOP, SR = 512, 128, 512, 44100
T_AUDIO = T_MEL * HOP
RATES = (8, 8, 2, 2, 2)
KSIZES = (16, 16, 4, 4, 4)
RES_K = (3, 7, 11)
RES_D = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
LRELU = 0.1


def measure(fn_builder, label):
    dt = bench._measure(fn_builder)
    print(f"{label:55s} {dt * 1000:8.3f} ms")
    return dt


def chain(compute):
    return bench._chain(compute, jax.random.PRNGKey(0))


def _stage_geom(i):
    c_in = 512 // (2 ** i)
    c = 512 // (2 ** (i + 1))
    t_in = T_MEL * int(np.prod(RATES[:i]))
    t_out = t_in * RATES[i]
    return c_in, c, t_in, t_out


def _conv(x, w, d=1, stride=1, pad=None):
    k = w.shape[0]
    if pad is None:
        pad = (k * d - d) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride,), [(pad, pad)], rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"))


def _resblocks(x, ws, dtype):
    """ws: {(j, i, which): kernel}; the 3-resblock mean at one stage."""
    xs = 0.0
    for j, (rk, rds) in enumerate(zip(RES_K, RES_D)):
        h = x
        for i, d in enumerate(rds):
            xt = jax.nn.leaky_relu(h, LRELU)
            xt = _conv(xt, ws[(j, i, 0)], d=d)
            xt = jax.nn.leaky_relu(xt, LRELU)
            xt = _conv(xt, ws[(j, i, 1)], d=1)
            h = xt + h
        xs = xs + h
    return xs / len(RES_K)


def _mk_res_weights(rng0, c, dtype):
    ws = {}
    for j, (rk, rds) in enumerate(zip(RES_K, RES_D)):
        for i, _ in enumerate(rds):
            ws[(j, i, 0)] = jnp.asarray(rng0.normal(size=(rk, c, c)) * 0.05, dtype)
            ws[(j, i, 1)] = jnp.asarray(rng0.normal(size=(rk, c, c)) * 0.05, dtype)
    return ws


def stage_resblocks(B, dtype, i):
    """Just the 3 resblocks of stage i (18 convs at that stage's rate)."""
    dtype = dtype or jnp.float32
    _, c, _, t_out = _stage_geom(i)
    rng0 = np.random.default_rng(i)
    x = jnp.asarray(rng0.normal(size=(B, t_out, c)), dtype)
    ws = _mk_res_weights(rng0, c, dtype)

    def compute(rng, eps):
        return _resblocks(x + eps.astype(dtype), ws, dtype).astype(jnp.float32)

    return chain(compute)


def stage_convt(B, dtype, i):
    """Stage i's ConvTranspose1d (lhs-dilated lax conv, linen formulation)."""
    dtype = dtype or jnp.float32
    c_in, c, t_in, _ = _stage_geom(i)
    u, k = RATES[i], KSIZES[i]
    rng0 = np.random.default_rng(10 + i)
    x = jnp.asarray(rng0.normal(size=(B, t_in, c_in)), dtype)
    w = jnp.asarray(rng0.normal(size=(k, c_in, c)) * 0.05, dtype)
    padding = (k - u) // 2
    pad = k - 1 - padding

    def compute(rng, eps):
        y = jax.lax.conv_general_dilated(
            x + eps.astype(dtype), w, (1,), [(pad, pad)], lhs_dilation=(u,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        return y.astype(jnp.float32)

    return chain(compute)


def stage_noise_conv(B, dtype, i):
    """Stage i's noise conv: strided conv on the [B, T_audio, 1] source."""
    dtype = dtype or jnp.float32
    _, c, _, _ = _stage_geom(i)
    rng0 = np.random.default_rng(20 + i)
    src = jnp.asarray(rng0.normal(size=(B, T_AUDIO, 1)), dtype)
    if i + 1 < len(RATES):
        stride_f0 = int(np.prod(RATES[i + 1:]))
        w = jnp.asarray(rng0.normal(size=(stride_f0 * 2, 1, c)) * 0.05, dtype)

        def compute(rng, eps):
            return _conv(src + eps.astype(dtype), w, stride=stride_f0,
                         pad=stride_f0 // 2).astype(jnp.float32)
    else:
        w = jnp.asarray(rng0.normal(size=(1, 1, c)) * 0.05, dtype)

        def compute(rng, eps):
            return _conv(src + eps.astype(dtype), w, pad=0).astype(jnp.float32)

    return chain(compute)


def sine_source(B, dtype):
    from prodiff_tpu.models.nsf_hifigan import sine_gen

    rng0 = np.random.default_rng(30)
    f0 = jnp.asarray(rng0.uniform(80, 400, size=(B, T_MEL)), jnp.float32)

    def compute(rng, eps):
        return sine_gen(f0 + eps, HOP, SR, 8, rng)

    return chain(compute)


def conv_pre(B, dtype):
    dtype = dtype or jnp.float32
    rng0 = np.random.default_rng(31)
    mel = jnp.asarray(rng0.normal(size=(B, T_MEL, N_MELS)), dtype)
    w = jnp.asarray(rng0.normal(size=(7, N_MELS, 512)) * 0.05, dtype)

    def compute(rng, eps):
        return _conv(mel + eps.astype(dtype), w).astype(jnp.float32)

    return chain(compute)


def conv_post(B, dtype):
    dtype = dtype or jnp.float32
    rng0 = np.random.default_rng(32)
    x = jnp.asarray(rng0.normal(size=(B, T_AUDIO, 16)), dtype)
    w = jnp.asarray(rng0.normal(size=(7, 16, 1)) * 0.05, dtype)

    def compute(rng, eps):
        return jnp.tanh(_conv(x + eps.astype(dtype), w).astype(jnp.float32))

    return chain(compute)


def full_gen(B, dtype, packed=None):
    from prodiff_tpu.models.nsf_hifigan import Generator

    gen = Generator(dtype=dtype) if packed is None else Generator(
        dtype=dtype, use_packed=packed)
    rng0 = np.random.default_rng(33)
    mel = jnp.asarray(rng0.normal(size=(B, T_MEL, N_MELS)), jnp.float32)
    f0 = jnp.asarray(rng0.uniform(80, 400, size=(B, T_MEL)), jnp.float32)
    params = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel, f0)

    def compute(rng, eps):
        return gen.apply(params, mel + eps, f0, rngs={"noise": rng})

    return chain(compute)


def full_prepared(B, dtype, fat=0):
    """The serving path: PackedGeneratorRunner with prepared params (fused
    resblock kernels, streamed s0, prepared tree as a jit argument) — what
    the e2e NSF bench and spec2wav actually run. ``fat``: _RES_FAT_CHUNK
    for the fused stages (0 = per-tap dots)."""
    import prodiff_tpu.models.nsf_hifigan as nsf_mod
    from prodiff_tpu.models.nsf_hifigan import Generator, PackedGeneratorRunner

    nsf_mod._RES_FAT_CHUNK = fat
    gen = Generator(dtype=dtype, use_packed=True)
    runner = PackedGeneratorRunner(gen)
    rng0 = np.random.default_rng(33)
    mel = jnp.asarray(rng0.normal(size=(B, T_MEL, N_MELS)), jnp.float32)
    f0 = jnp.asarray(rng0.uniform(80, 400, size=(B, T_MEL)), jnp.float32)
    params = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel, f0)
    prepared = jax.jit(runner.prepare)(params)

    def compute(rng, eps):
        return runner(prepared, mel + eps, f0, rng)

    return chain(compute)


PARTS = {
    "full_gen": full_gen,
    "full_prepared": full_prepared,
    "full_prepared_fat2": lambda B, d: full_prepared(B, d, fat=2),
    "full_prepared_fat4": lambda B, d: full_prepared(B, d, fat=4),
    "full_prepared_fat8": lambda B, d: full_prepared(B, d, fat=8),
    "conv_pre": conv_pre,
    "conv_post": conv_post,
    "sine_source": sine_source,
    **{f"res_s{i}": (lambda B, d, i=i: stage_resblocks(B, d, i)) for i in range(5)},
    **{f"convt_s{i}": (lambda B, d, i=i: stage_convt(B, d, i)) for i in range(5)},
    **{f"noise_s{i}": (lambda B, d, i=i: stage_noise_conv(B, d, i)) for i in range(5)},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, nargs="+", default=[1])
    ap.add_argument("--dtypes", nargs="+", default=["f32"])
    ap.add_argument("--parts", nargs="+", default=list(PARTS))
    args = ap.parse_args()
    for part in args.parts:
        for b in args.b:
            for dt in args.dtypes:
                dtype = {"f32": None, "bf16": jnp.bfloat16}[dt]
                try:
                    measure(PARTS[part](b, dtype), f"{part} B={b} {dt}")
                except Exception as e:
                    print(f"{part} B={b} {dt}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
