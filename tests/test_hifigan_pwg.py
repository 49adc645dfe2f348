"""Golden parity: flax HiFi-GAN / Parallel WaveGAN vs the torch reference."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

H = {
    "upsample_rates": [4, 4, 2],
    "upsample_kernel_sizes": [8, 8, 4],
    "upsample_initial_channel": 32,
    "resblock": "1",
    "resblock_kernel_sizes": [3, 7],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
    "use_pitch_embed": False,
    "audio_sample_rate": 22050,
}

PWG_CFG = {
    "hop_size": 32,
    "generator_params": {
        "layers": 6,
        "stacks": 2,
        "residual_channels": 8,
        "gate_channels": 16,
        "skip_channels": 8,
        "aux_channels": 12,
        "aux_context_window": 2,
        "upsample_params": {"upsample_scales": [4, 4, 2]},
        "use_pitch_embed": False,
        "kernel_size": 3,
        "dropout": 0.0,
    },
}


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, "/root/reference")
    # old scipy API used by the vendored pqmf module
    import scipy.signal
    import scipy.signal.windows

    if not hasattr(scipy.signal, "kaiser"):
        scipy.signal.kaiser = scipy.signal.windows.kaiser
    import importlib

    hifigan = importlib.import_module("modules.hifigan.hifigan")
    pwg = importlib.import_module("modules.parallel_wavegan.models.parallel_wavegan")
    return hifigan, pwg


def test_hifigan_generator_parity(ref, rng):
    hifigan_mod, _ = ref
    torch.manual_seed(0)
    tgen = hifigan_mod.HifiGanGenerator(H)
    tgen.eval()
    tgen.remove_weight_norm()
    sd = {k: v.numpy() for k, v in tgen.state_dict().items()}

    from prodiff_tpu.models.hifigan import HifiGanGenerator, convert_hifigan

    params = jax.tree.map(jnp.asarray, convert_hifigan(sd, H))
    jgen = HifiGanGenerator.from_config(H)

    mel = rng.normal(size=(1, 10, 80)).astype(np.float32)
    with torch.no_grad():
        want = tgen(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()[:, 0]
    got = np.asarray(jgen.apply(params, jnp.asarray(mel)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-3)


def test_pwg_generator_parity(ref, rng):
    _, pwg_mod = ref
    gp = dict(PWG_CFG["generator_params"])
    scales = gp.pop("upsample_params")["upsample_scales"]
    torch.manual_seed(0)
    tgen = pwg_mod.ParallelWaveGANGenerator(
        upsample_params={"upsample_scales": scales}, **gp
    )
    tgen.eval()
    tgen.remove_weight_norm()
    sd = {k: v.numpy() for k, v in tgen.state_dict().items()}

    from prodiff_tpu.models.pwg import ParallelWaveGANGenerator, convert_pwg

    params = jax.tree.map(jnp.asarray, convert_pwg(sd, PWG_CFG))
    jgen = ParallelWaveGANGenerator(
        layers=6, stacks=2, residual_channels=8, gate_channels=16,
        skip_channels=8, aux_channels=12, aux_context_window=2,
        upsample_scales=(4, 4, 2), use_pitch_embed=False,
    )
    T_mel, hop = 5, 32
    mel = rng.normal(size=(T_mel, 12)).astype(np.float32)
    c = np.pad(mel, ((2, 2), (0, 0)), "edge")
    z = rng.normal(size=(1, T_mel * hop, 1)).astype(np.float32)
    with torch.no_grad():
        want = tgen(
            torch.from_numpy(z.transpose(0, 2, 1)),
            torch.from_numpy(c[None].transpose(0, 2, 1)),
        ).numpy()[:, 0]
    got = np.asarray(jgen.apply(params, jnp.asarray(z), jnp.asarray(c)[None]))
    assert got.shape == want.shape == (1, T_mel * hop)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-3)


def test_mod1_cumsum_precision(rng):
    """Phase accumulation must stay accurate over long sequences in f32."""
    from prodiff_tpu.models.hifigan import mod1_cumsum

    rad = rng.uniform(0, 0.05, (1, 200000, 1)).astype(np.float32)
    got = np.asarray(mod1_cumsum(jnp.asarray(rad)))[0, :, 0]
    want = np.cumsum(rad[0, :, 0].astype(np.float64)) % 1.0
    # compare phases on the circle
    err = np.abs(np.exp(2j * np.pi * got) - np.exp(2j * np.pi * want))
    assert err.max() < 5e-3
