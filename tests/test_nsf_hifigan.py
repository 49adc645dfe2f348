"""Golden parity tests: flax NSF-HiFiGAN vs the torch reference net with
converted weights (deterministic sub-paths; the stochastic SineGen is tested
with patched randomness)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from prodiff_tpu.models.nsf_hifigan import Generator, sine_gen
from prodiff_tpu.utils.torch_convert import convert_nsf_hifigan

H = {
    "num_mels": 16,
    "sampling_rate": 44100,
    "upsample_initial_channel": 32,
    "upsample_rates": [4, 4, 2],
    "upsample_kernel_sizes": [8, 8, 4],
    "resblock": "1",
    "resblock_kernel_sizes": [3, 7],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
    "n_fft": 512,
    "win_size": 512,
    "hop_size": 32,
    "fmin": 40,
    "fmax": 16000,
}


@pytest.fixture(scope="module")
def torch_ref():
    sys.path.insert(0, "/root/reference")
    import importlib

    models = importlib.import_module("modules.nsf_hifigan.models")
    env = importlib.import_module("modules.nsf_hifigan.env")
    h = env.AttrDict(H)
    torch.manual_seed(0)
    gen = models.Generator(h)
    gen.eval()
    gen.remove_weight_norm()
    return models, gen


def test_generator_matches_torch_with_converted_weights(torch_ref, rng):
    models, tgen = torch_ref
    sd = {k: v.numpy() for k, v in tgen.state_dict().items()}
    params = convert_nsf_hifigan(sd, H)
    jgen = Generator.from_config(H)

    T = 12
    mel = rng.normal(size=(1, T, H["num_mels"])).astype(np.float32)
    upp = int(np.prod(H["upsample_rates"]))
    # bypass the stochastic source: feed an identical har_source to both
    har = (rng.normal(size=(1, T * upp, 1)) * 0.1).astype(np.float32)

    with torch.no_grad():
        tg = tgen  # run upsample stack manually with fixed source
        x = tg.conv_pre(torch.from_numpy(mel).transpose(1, 2))
        hs = torch.from_numpy(har).transpose(1, 2)
        for i in range(tg.num_upsamples):
            x = torch.nn.functional.leaky_relu(x, 0.1)
            x = tg.ups[i](x)
            x = x + tg.noise_convs[i](hs)
            xs = None
            for j in range(tg.num_kernels):
                r = tg.resblocks[i * tg.num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / tg.num_kernels
        x = torch.nn.functional.leaky_relu(x)
        want = torch.tanh(tg.conv_post(x))[:, 0].numpy()

    got = np.asarray(jgen.apply(params, jnp.asarray(mel), har_source=jnp.asarray(har)))
    assert got.shape == want.shape == (1, T * upp)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_sine_gen_matches_torch_with_patched_rng(torch_ref, monkeypatch):
    models, _ = torch_ref
    f0 = np.zeros((1, 8), np.float32)
    f0[0, :5] = 220.0  # voiced then unvoiced
    upp = 32

    # patch out randomness on the torch side
    monkeypatch.setattr(torch, "rand", lambda *s, **k: torch.zeros(*s))
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))
    sg = models.SineGen(44100, harmonic_num=2)
    with torch.no_grad():
        want = sg(torch.from_numpy(f0), upp).numpy()

    # zero-randomness on the jax side: rand_ini=0, noise=0
    class _Zero:
        pass

    def fake_split(rng, n=2):
        return rng, rng

    sines = sine_gen(
        jnp.asarray(f0), upp, 44100, 2, jax.random.PRNGKey(0),
        noise_std=0.0,
    )
    # rand_ini only offsets overtones' phase; fundamental matches exactly.
    got = np.asarray(sines)
    # unvoiced region: noise_amp = sine_amp/3 * noise; with real noise it is
    # nonzero, with torch-patched zeros it's 0 — compare voiced fundamental.
    voiced = slice(0, 5 * upp)
    np.testing.assert_allclose(got[0, voiced, 0], want[0, voiced, 0], atol=5e-3)
    # unvoiced sines are gated to (noise only); fundamental mean magnitude small
    assert np.abs(got[0, 5 * upp :, 0]).mean() < 0.05


@pytest.mark.slow
def test_generator_full_forward_runs(rng):
    jgen = Generator.from_config(H)
    T = 10
    mel = jnp.asarray(rng.normal(size=(1, T, H["num_mels"])).astype(np.float32))
    f0 = jnp.asarray(rng.uniform(100, 400, (1, T)).astype(np.float32))
    params = jgen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel, f0)
    wav = jgen.apply(params, mel, f0, rngs={"noise": jax.random.PRNGKey(2)})
    upp = int(np.prod(H["upsample_rates"]))
    assert wav.shape == (1, T * upp)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0
