"""Packed-trunk NSF-HiFiGAN generator vs the linen path (same params).

The packed path (models/nsf_hifigan.py:_packed_forward) runs the C < 128
upsample stages in the space-to-depth [B, T/P, 128] layout with the flat
harmonic source; it must match the linen formulation bit-closely when the
source is deterministic (reference semantics:
``modules/nsf_hifigan/models.py:196-297``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prodiff_tpu.models.nsf_hifigan import (
    Generator,
    SourceModuleHnNSF,
    flat_har_source,
    sine_gen,
)

RNG = np.random.default_rng(7)


def _f0(b, t):
    f0 = RNG.uniform(80, 600, size=(b, t)).astype(np.float32)
    f0[:, : t // 4] = 0.0  # unvoiced head exercises the uv gate
    return jnp.asarray(f0)


def _gens(**kw):
    return (
        Generator(use_packed=False, **kw),
        Generator(use_packed=True, **kw),
    )


@pytest.mark.parametrize(
    "arch",
    [
        # full openvpi default: 512ch, rates 8/8/2/2/2 -> packed stages 2-4
        dict(),
        # 256ch start: channels 128/64/32/16/8 -> packed from stage 1, P up to 16
        dict(upsample_initial_channel=256),
    ],
)
@pytest.mark.slow
def test_packed_generator_matches_linen(arch):
    t_mel = 16
    gen_lin, gen_pk = _gens(**arch)
    assert gen_pk._packed_supported(t_mel), arch
    mel = jnp.asarray(RNG.normal(size=(2, t_mel, 128)).astype(np.float32))
    f0 = _f0(2, t_mel)
    params = gen_lin.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel, f0
    )
    want = gen_lin.apply(params, mel, f0, deterministic=True)
    got = gen_pk.apply(params, mel, f0, deterministic=True)
    assert got.shape == want.shape == (2, t_mel * gen_lin.upp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_packed_generator_with_given_har_source():
    t_mel = 8
    gen_lin, gen_pk = _gens()
    mel = jnp.asarray(RNG.normal(size=(1, t_mel, 128)).astype(np.float32))
    f0 = _f0(1, t_mel)
    params = gen_lin.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel, f0
    )
    har = jnp.asarray(
        RNG.normal(size=(1, t_mel * gen_lin.upp, 1)).astype(np.float32) * 0.1
    )
    want = gen_lin.apply(params, mel, har_source=har)
    got = gen_pk.apply(params, mel, har_source=har)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_packed_generator_noise_path_finite():
    """Stochastic source: different noise realisation by design, same stats."""
    t_mel = 8
    _, gen_pk = _gens()
    mel = jnp.asarray(RNG.normal(size=(1, t_mel, 128)).astype(np.float32))
    f0 = _f0(1, t_mel)
    params = gen_pk.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel, f0
    )
    out = gen_pk.apply(
        params, mel, f0, rngs={"noise": jax.random.PRNGKey(3)}
    )
    assert out.shape == (1, t_mel * gen_pk.upp)
    assert np.isfinite(np.asarray(out)).all()


def test_flat_har_source_matches_module_deterministic():
    t_mel, upp, sr = 12, 512, 44100
    f0 = _f0(2, t_mel)
    mod = SourceModuleHnNSF(sr, harmonic_num=8)
    params = mod.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        f0, upp, deterministic=True,
    )
    want = mod.apply(params, f0, upp, deterministic=True)  # [B, T, 1]
    lin = params["params"]["l_linear"]
    got = flat_har_source(f0, upp, sr, 8, None, lin["kernel"], lin["bias"])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want[..., 0]), atol=1e-6
    )


def test_flat_har_source_noise_stats():
    """Unvoiced frames: projected noise std must equal ||w|| * sine_amp/3."""
    t_mel, upp, sr = 4, 512, 44100
    f0 = jnp.zeros((1, t_mel))  # fully unvoiced -> pure noise through tanh
    w = jnp.asarray(RNG.normal(size=(9, 1)).astype(np.float32))
    b = jnp.zeros((1,))
    out = flat_har_source(f0, upp, sr, 8, jax.random.PRNGKey(0), w, b)
    # tanh is ~identity at this amplitude (0.1/3 * ||w||)
    expect_std = float(np.sqrt((np.asarray(w)[:, 0] ** 2).sum()) * 0.1 / 3)
    got_std = float(np.asarray(out).std())
    assert abs(got_std - expect_std) / expect_std < 0.15, (got_std, expect_std)


@pytest.mark.slow
def test_prepared_runner_matches_linen():
    """PackedGeneratorRunner (prepared params as jit args) == linen."""
    from prodiff_tpu.models.nsf_hifigan import PackedGeneratorRunner

    t_mel = 12
    gen_lin, _ = _gens()
    mel = jnp.asarray(RNG.normal(size=(1, t_mel, 128)).astype(np.float32))
    f0 = _f0(1, t_mel)
    params = gen_lin.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel, f0
    )
    want = gen_lin.apply(params, mel, f0, deterministic=True)
    runner = PackedGeneratorRunner(gen_lin)
    prepared = jax.jit(runner.prepare)(params)
    got = jax.jit(runner)(prepared, mel, f0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    # har-source branch too
    har = jnp.asarray(
        RNG.normal(size=(1, t_mel * gen_lin.upp, 1)).astype(np.float32) * 0.1
    )
    want2 = gen_lin.apply(params, mel, har_source=har)
    got2 = runner(prepared, mel, har_source=har)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=2e-4)


@pytest.mark.slow
def test_prepared_runner_bf16_close():
    """bf16-baked prepared trunk stays within bf16 tolerance of f32 linen."""
    from prodiff_tpu.models.nsf_hifigan import PackedGeneratorRunner

    t_mel = 8
    gen_lin, _ = _gens()
    mel = jnp.asarray(RNG.normal(size=(1, t_mel, 128)).astype(np.float32))
    f0 = _f0(1, t_mel)
    params = gen_lin.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel, f0
    )
    want = np.asarray(gen_lin.apply(params, mel, f0, deterministic=True))
    runner = PackedGeneratorRunner(gen_lin, dtype=jnp.bfloat16)
    got = np.asarray(runner(runner.prepare(params), mel, f0))
    assert got.dtype == np.float32
    # waveform in [-1, 1]; bf16 has ~3 decimal digits
    assert np.abs(got - want).max() < 0.05, np.abs(got - want).max()
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999


@pytest.mark.slow
def test_fused_resblock_kernel_matches_linen():
    """Fused Pallas resblock group (interpret, f32 taps) == linen resblocks."""
    from prodiff_tpu.models.nsf_hifigan import PackedGeneratorRunner

    t_mel = 8
    gen_lin, _ = _gens()
    mel = jnp.asarray(RNG.normal(size=(1, t_mel, 128)).astype(np.float32))
    f0 = _f0(1, t_mel)
    params = gen_lin.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel, f0
    )
    want = gen_lin.apply(params, mel, f0, deterministic=True)
    runner = PackedGeneratorRunner(gen_lin, fused_res_dtype=jnp.float32)
    got = runner(runner.prepare(params), mel, f0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)


@pytest.mark.slow
def test_fused_resblock_kernel_bf16_close():
    from prodiff_tpu.models.nsf_hifigan import PackedGeneratorRunner

    t_mel = 6
    gen_lin, _ = _gens()
    mel = jnp.asarray(RNG.normal(size=(1, t_mel, 128)).astype(np.float32))
    f0 = _f0(1, t_mel)
    params = gen_lin.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel, f0
    )
    want = np.asarray(gen_lin.apply(params, mel, f0, deterministic=True))
    runner = PackedGeneratorRunner(gen_lin, fused_res_dtype=jnp.bfloat16)
    got = np.asarray(runner(runner.prepare(params), mel, f0))
    assert np.abs(got - want).max() < 0.05, np.abs(got - want).max()
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999


def test_packed_plain_hifigan_matches_linen():
    """128ch plain HiFiGAN (no pitch source): every stage is C < 128 packed."""
    from prodiff_tpu.models.hifigan import HifiGanGenerator

    t_mel = 24
    gen_lin = HifiGanGenerator(use_packed=False)
    gen_pk = HifiGanGenerator(use_packed=True)
    assert gen_pk._packed_supported(t_mel)
    mel = jnp.asarray(RNG.normal(size=(2, t_mel, 80)).astype(np.float32))
    params = gen_lin.init(jax.random.PRNGKey(0), mel)
    want = gen_lin.apply(params, mel)
    got = gen_pk.apply(params, mel)
    assert got.shape == want.shape == (2, t_mel * 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_packed_pitch_hifigan_finite():
    from prodiff_tpu.models.hifigan import HifiGanGenerator

    t_mel = 16
    gen_pk = HifiGanGenerator(use_packed=True, use_pitch_embed=True)
    mel = jnp.asarray(RNG.normal(size=(1, t_mel, 80)).astype(np.float32))
    f0 = _f0(1, t_mel)
    params = gen_pk.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel, f0
    )
    out = gen_pk.apply(params, mel, f0, rngs={"noise": jax.random.PRNGKey(4)})
    assert out.shape == (1, t_mel * 256)
    assert np.isfinite(np.asarray(out)).all()


def test_packed_hifigan_runner_matches_linen():
    from prodiff_tpu.models.hifigan import HifiGanGenerator, PackedHifiGanRunner

    t_mel = 16
    gen = HifiGanGenerator(use_packed=False)
    mel = jnp.asarray(RNG.normal(size=(1, t_mel, 80)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), mel)
    want = gen.apply(params, mel)
    runner = PackedHifiGanRunner(gen)
    prepared = jax.jit(runner.prepare)(params)
    got = jax.jit(lambda p, m: runner(p, m))(prepared, mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_flat_har_source_samplewise_matches_cumsum():
    """samplewise_ini phase semantics == parallel_wavegan mod-1 cumsum
    (frame-constant f0), through the l_linear + tanh head."""
    from prodiff_tpu.models.hifigan import mod1_cumsum

    t_mel, upp, sr = 10, 256, 22050
    f0 = _f0(1, t_mel)
    w = jnp.asarray(RNG.normal(size=(9, 1)).astype(np.float32))
    b = jnp.asarray(RNG.normal(size=(1,)).astype(np.float32))
    got = flat_har_source(
        f0, upp, sr, 8, None, w, b, samplewise_ini=True
    )
    # manual samplewise source with zero rand_ini / zero noise
    f0_up = jnp.repeat(f0, upp, axis=1)
    harmonics = jnp.arange(1, 10, dtype=jnp.float32)[None, None, :]
    rad = jnp.mod(f0_up[:, :, None] * harmonics / sr, 1.0)
    sines = jnp.sin(2 * jnp.pi * mod1_cumsum(rad)) * 0.1
    uv = (f0_up > 0).astype(jnp.float32)[:, :, None]
    want = jnp.tanh((sines * uv) @ w + b)[..., 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_packed_gates():
    """Architecture gates: unsupported shapes must refuse the packed trunk."""
    from prodiff_tpu.models.hifigan import HifiGanGenerator

    assert Generator()._packed_supported(16)
    # ResBlock2 variant: not packed
    assert not Generator(resblock="2")._packed_supported(16)
    # kernel != 2*stride upsamples: not packed
    assert not Generator(upsample_kernel_sizes=(15, 16, 4, 4, 4))._packed_supported(16)
    # channels that never drop below 128: nothing to pack
    assert not HifiGanGenerator(upsample_initial_channel=2048)._packed_supported(16)
    # c_out != 1: plain HiFiGAN gate refuses
    assert not HifiGanGenerator(c_out=2)._packed_supported(16)


def test_wrapper_packed_flag_respected():
    """nsf_packed: false forces the linen path in the serving wrapper."""
    from prodiff_tpu.vocoders.nsf_hifigan import NsfHifiGAN

    t_mel = 8
    gen = Generator()
    mel = jnp.asarray(RNG.normal(size=(1, t_mel, 128)).astype(np.float32))
    f0 = _f0(1, t_mel)
    params = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel, f0
    )
    h = {"num_mels": 128, "sampling_rate": 44100,
         "upsample_initial_channel": 512, "upsample_rates": [8, 8, 2, 2, 2],
         "upsample_kernel_sizes": [16, 16, 4, 4, 4], "resblock": "1",
         "resblock_kernel_sizes": [3, 7, 11],
         "resblock_dilation_sizes": [[1, 3, 5]] * 3}
    voc_off = NsfHifiGAN({"nsf_packed": False}, params=params, config=h)
    assert voc_off.model.use_packed is False
    assert not voc_off._packed_active(t_mel)
    voc_on = NsfHifiGAN({"nsf_packed": True}, params=params, config=h)
    assert voc_on._packed_active(t_mel)
    # forced-on renders match the linen render (deterministic source)
    want = voc_off.spec2wav_batch(np.asarray(mel), np.asarray(f0), deterministic=True)
    got = voc_on.spec2wav_batch(np.asarray(mel), np.asarray(f0), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_sine_gen_unchanged_by_refactor():
    """sine_gen's public behaviour (golden-tested vs torch) must be stable."""
    f0 = _f0(1, 6)
    out = sine_gen(f0, 512, 44100, 8, jax.random.PRNGKey(2))
    assert out.shape == (1, 6 * 512, 9)
    det = sine_gen(f0, 512, 44100, 8, None)
    # unvoiced head is exactly zero in the deterministic render
    assert float(np.abs(np.asarray(det)[:, : 512, :]).max()) == 0.0
    assert np.isfinite(np.asarray(out)).all()


def test_fused_resblock_kernel_odd_s():
    """resblock_group_packed with S not divisible by rows_per_block.

    Guards the block-rows picker: an odd / small-2-adic S must pad up to a
    rows multiple (masked, sliced back) rather than collapse rows to 1
    (advisor round-3 finding). Ground truth: plain lax dilated convs on the
    unpacked [B, T, C] tensor.
    """
    from prodiff_tpu.ops import packed as pk
    from prodiff_tpu.ops.pallas.resblock import (
        prepare_resblock_stage,
        resblock_group_packed,
    )

    p, c = 2, 64
    ksizes = [3, 5]
    dsizes = [[1, 3], [1, 2]]
    stage_params = []
    for k, ds in zip(ksizes, dsizes):
        rb = {}
        for li in range(len(ds)):
            for grp in ("convs1", "convs2"):
                rb[f"{grp}_{li}"] = {"conv": {
                    "kernel": jnp.asarray(
                        RNG.normal(size=(k, c, c)).astype(np.float32) * 0.1),
                    "bias": jnp.asarray(
                        RNG.normal(size=(c,)).astype(np.float32) * 0.1),
                }}
        stage_params.append(rb)

    def ref(x):
        outs = []
        for rb, (k, ds) in zip(stage_params, zip(ksizes, dsizes)):
            h = x
            for li, d in enumerate(ds):
                c1 = rb[f"convs1_{li}"]["conv"]
                c2 = rb[f"convs2_{li}"]["conv"]
                xt = jax.nn.leaky_relu(h, 0.1)
                xt = jax.lax.conv_general_dilated(
                    xt, c1["kernel"], (1,), "SAME", rhs_dilation=(d,),
                    dimension_numbers=("NWC", "WIO", "NWC")) + c1["bias"]
                xt = jax.nn.leaky_relu(xt, 0.1)
                xt = jax.lax.conv_general_dilated(
                    xt, c2["kernel"], (1,), "SAME",
                    dimension_numbers=("NWC", "WIO", "NWC")) + c2["bias"]
                h = xt + h
            outs.append(h)
        return sum(outs) / len(outs)

    w, b = prepare_resblock_stage(
        stage_params, ksizes, dsizes, p, dtype=jnp.float32)
    for s in (37, 48, 53):  # odd, rows-multiple, prime
        x = jnp.asarray(RNG.normal(size=(2, s * p, c)).astype(np.float32))
        want = pk.pack(ref(x), p)
        got = resblock_group_packed(
            pk.pack(x, p), w, b, ksizes, dsizes, p,
            rows_per_block=16, interpret=True)
        assert got.shape == (2, s, p * c)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_resblock_fat_n_matches_pertap():
    """fat_chunk (one [E, CL] @ [CL, chunk*CL] dot per tap chunk, tap shifts
    on the OUTPUT rows, wide-prepared weights) == the per-tap dot path.
    Measured slower on v5e (see models/nsf_hifigan.py:_RES_FAT_CHUNK) but
    kept as a study path; this pins its numerics."""
    from prodiff_tpu.ops import packed as pk
    from prodiff_tpu.ops.pallas.resblock import (
        prepare_resblock_stage,
        resblock_group_packed,
    )

    p, c = 2, 64
    ksizes = [3, 5]
    dsizes = [[1, 3], [1, 2]]
    stage_params = []
    for k, ds in zip(ksizes, dsizes):
        rb = {}
        for li in range(len(ds)):
            for grp in ("convs1", "convs2"):
                rb[f"{grp}_{li}"] = {"conv": {
                    "kernel": jnp.asarray(
                        RNG.normal(size=(k, c, c)).astype(np.float32) * 0.1),
                    "bias": jnp.asarray(
                        RNG.normal(size=(c,)).astype(np.float32) * 0.1),
                }}
        stage_params.append(rb)
    w_n, b_n = prepare_resblock_stage(
        stage_params, ksizes, dsizes, p, dtype=jnp.float32)
    w_w, b_w = prepare_resblock_stage(
        stage_params, ksizes, dsizes, p, dtype=jnp.float32, wide=True)
    assert w_w.shape == w_n.shape[::-1]
    for s in (37, 48):
        xp = pk.pack(
            jnp.asarray(RNG.normal(size=(2, s * p, c)).astype(np.float32)), p)
        want = resblock_group_packed(
            xp, w_n, b_n, ksizes, dsizes, p, rows_per_block=16,
            interpret=True)
        for chunk in (1, 4, 16):
            got = resblock_group_packed(
                xp, w_w, b_w, ksizes, dsizes, p, rows_per_block=16,
                fat_chunk=chunk, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-5)


def test_streamed_resblock_kernel_direct():
    """Weight-streamed full-lane resblock kernel (NSF s0-style C=256) ==
    lax reference, across blocks/batches (slot parity + halo + odd S)."""
    from prodiff_tpu.ops.pallas.resblock import (
        prepare_resblock_stage,
        resblock_group_streamed,
    )

    c = 256
    ksizes = [3, 5]
    dsizes = [[1, 3], [1, 2]]
    stage_params = []
    for k, ds in zip(ksizes, dsizes):
        rb = {}
        for li in range(len(ds)):
            for grp in ("convs1", "convs2"):
                rb[f"{grp}_{li}"] = {"conv": {
                    "kernel": jnp.asarray(
                        RNG.normal(size=(k, c, c)).astype(np.float32) * 0.05),
                    "bias": jnp.asarray(
                        RNG.normal(size=(c,)).astype(np.float32) * 0.1),
                }}
        stage_params.append(rb)

    def ref(x):
        outs = []
        for rb, (k, ds) in zip(stage_params, zip(ksizes, dsizes)):
            h = x
            for li, d in enumerate(ds):
                c1 = rb[f"convs1_{li}"]["conv"]
                c2 = rb[f"convs2_{li}"]["conv"]
                xt = jax.nn.leaky_relu(h, 0.1)
                xt = jax.lax.conv_general_dilated(
                    xt, c1["kernel"], (1,), "SAME", rhs_dilation=(d,),
                    dimension_numbers=("NWC", "WIO", "NWC")) + c1["bias"]
                xt = jax.nn.leaky_relu(xt, 0.1)
                xt = jax.lax.conv_general_dilated(
                    xt, c2["kernel"], (1,), "SAME",
                    dimension_numbers=("NWC", "WIO", "NWC")) + c2["bias"]
                h = xt + h
            outs.append(h)
        return sum(outs) / len(outs)

    w, b = prepare_resblock_stage(
        stage_params, ksizes, dsizes, 1, dtype=jnp.float32)
    for s in (37, 48):  # odd (pad tail) and rows-multiple
        x = jnp.asarray(RNG.normal(size=(2, s, c)).astype(np.float32))
        want = ref(x)
        got = resblock_group_streamed(
            x, w, b, ksizes, dsizes, rows_per_block=16, interpret=True)
        assert got.shape == (2, s, c)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4)


def test_packed_runner_invalidated_on_params_swap():
    """A checkpoint reload replacing voc.params must rebuild the prepared
    packed tree (advisor r3: cached_property served stale weights)."""
    from prodiff_tpu.vocoders.nsf_hifigan import NsfHifiGAN

    t_mel = 8
    _, gen_pk = _gens()
    mel = jnp.asarray(RNG.normal(size=(1, t_mel, 128)).astype(np.float32))
    f0 = _f0(1, t_mel)
    p1 = gen_pk.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel, f0
    )
    p2 = gen_pk.init(
        {"params": jax.random.PRNGKey(7), "noise": jax.random.PRNGKey(8)}, mel, f0
    )
    h = {"num_mels": 128, "sampling_rate": 44100,
         "upsample_initial_channel": 512, "upsample_rates": [8, 8, 2, 2, 2],
         "upsample_kernel_sizes": [16, 16, 4, 4, 4], "resblock": "1",
         "resblock_kernel_sizes": [3, 7, 11],
         "resblock_dilation_sizes": [[1, 3, 5]] * 3}
    voc = NsfHifiGAN({"nsf_packed": True}, params=p1, config=h)
    assert voc._packed_active(t_mel)
    w1 = np.asarray(voc.spec2wav_batch(np.asarray(mel), np.asarray(f0),
                                       deterministic=True))
    fns_before = voc._packed_fns
    voc.params = p2  # checkpoint reload
    w2 = np.asarray(voc.spec2wav_batch(np.asarray(mel), np.asarray(f0),
                                       deterministic=True))
    assert np.abs(w1 - w2).max() > 1e-4, "stale prepared weights served"
    # the jitted fns depend only on the config: a params swap must re-prepare
    # WITHOUT rebuilding them (a fresh fn object would force a recompile)
    assert voc._packed_fns is fns_before
    fresh = NsfHifiGAN({"nsf_packed": True}, params=p2, config=h)
    w3 = np.asarray(fresh.spec2wav_batch(np.asarray(mel), np.asarray(f0),
                                         deterministic=True))
    np.testing.assert_allclose(w2, w3, atol=1e-6)


def test_nsf_fused_res_dtype_hparam(monkeypatch):
    """`nsf_fused_res_dtype` must reach PackedGeneratorRunner: "float32" is
    the exact-parity pin for reference-MCD renders (bf16 tap stacks add a
    ~-53 dB broadband residual that log-mel metrics amplify ~20 dB on
    random-init spectra — round-5 bench finding)."""
    import prodiff_tpu.models.nsf_hifigan as mod
    from prodiff_tpu.vocoders.nsf_hifigan import NsfHifiGAN

    h = {"num_mels": 128, "sampling_rate": 44100,
         "upsample_initial_channel": 512, "upsample_rates": [8, 8, 2, 2, 2],
         "upsample_kernel_sizes": [16, 16, 4, 4, 4], "resblock": "1",
         "resblock_kernel_sizes": [3, 7, 11],
         "resblock_dilation_sizes": [[1, 3, 5]] * 3}
    seen = {}

    class Capture:
        def __init__(self, gen, dtype=None, fused_res_dtype="auto"):
            seen["frd"] = fused_res_dtype
            self.prepare = lambda params: {}

        def __call__(self, *a, **k):  # pragma: no cover - never dispatched
            raise AssertionError

    monkeypatch.setattr(mod, "PackedGeneratorRunner", Capture)
    for hp_val, want in [("float32", jnp.float32), ("off", None),
                         ("auto", "auto"), (None, "auto")]:
        voc = NsfHifiGAN(
            {"nsf_packed": True, "nsf_fused_res_dtype": hp_val},
            params={"params": {}}, config=h,
        )
        voc._packed_runner
        assert seen.pop("frd") == want, hp_val
