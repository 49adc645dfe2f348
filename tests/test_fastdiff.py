"""Golden parity: flax FastDiff vs the torch reference with converted weights."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

CFG = {
    "audio_channels": 1,
    "inner_channels": 8,
    "cond_channels": 16,
    "upsample_ratios": [4, 4, 2],
    "lvc_layers_each_block": 2,
    "lvc_kernel_size": 3,
    "kpnet_hidden_channels": 8,
    "kpnet_conv_size": 3,
    "dropout": 0.0,
    "diffusion_step_embed_dim_in": 16,
    "diffusion_step_embed_dim_mid": 32,
    "diffusion_step_embed_dim_out": 32,
    "use_weight_norm": True,
    "beta_0": 1e-6,
    "beta_T": 0.01,
    "T": 1000,
}


@pytest.fixture(scope="module")
def torch_fastdiff():
    sys.path.insert(0, "/root/reference")
    import importlib

    # the reference hardcodes .cuda() in its step embedding; run on cpu
    torch.Tensor.cuda = lambda self, *a, **k: self

    # the reference's own imports use the lowercase package name, which breaks
    # on case-sensitive filesystems (SURVEY §2.11.1) — alias it for the test
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
        audio_channels=CFG["audio_channels"],
        inner_channels=CFG["inner_channels"],
        cond_channels=CFG["cond_channels"],
        upsample_ratios=CFG["upsample_ratios"],
        lvc_layers_each_block=CFG["lvc_layers_each_block"],
        lvc_kernel_size=CFG["lvc_kernel_size"],
        kpnet_hidden_channels=CFG["kpnet_hidden_channels"],
        kpnet_conv_size=CFG["kpnet_conv_size"],
        dropout=0.0,
        diffusion_step_embed_dim_in=CFG["diffusion_step_embed_dim_in"],
        diffusion_step_embed_dim_mid=CFG["diffusion_step_embed_dim_mid"],
        diffusion_step_embed_dim_out=CFG["diffusion_step_embed_dim_out"],
        use_weight_norm=True,
    )
    net.remove_weight_norm()
    net.eval()
    return net


def test_fastdiff_matches_torch(torch_fastdiff, rng):
    from prodiff_tpu.models.fastdiff import FastDiff, convert_fastdiff

    sd = {k: v.numpy() for k, v in torch_fastdiff.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_fastdiff(sd, CFG))
    jnet = FastDiff(
        audio_channels=1, inner_channels=8, cond_channels=16,
        upsample_ratios=(4, 4, 2), lvc_layers_each_block=2, lvc_kernel_size=3,
        kpnet_hidden_channels=8, kpnet_conv_size=3,
        diffusion_step_embed_dim_in=16, diffusion_step_embed_dim_mid=32,
        diffusion_step_embed_dim_out=32,
    )
    L = 6
    hop = 32
    audio = rng.normal(size=(1, L * hop, 1)).astype(np.float32)
    cond = rng.normal(size=(1, L, 16)).astype(np.float32)
    steps = np.array([[2.5]], np.float32)
    with torch.no_grad():
        want = torch_fastdiff(
            (
                torch.from_numpy(audio.transpose(0, 2, 1)),
                torch.from_numpy(cond.transpose(0, 2, 1)),
                torch.from_numpy(steps),
            )
        ).numpy()[:, 0]
    got = np.asarray(
        jnet.apply(params, jnp.asarray(audio), jnp.asarray(cond), jnp.asarray(steps))
    )[..., 0]
    assert got.shape == want.shape == (1, L * hop)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_fastdiff_sampling_runs(torch_fastdiff, rng):
    from prodiff_tpu.models.fastdiff import (
        FastDiff,
        compute_hyperparams_given_schedule,
        convert_fastdiff,
        prepare_inference_schedule,
        sampling_given_noise_schedule,
    )
    from prodiff_tpu.vocoders.fastdiff import NOISE_SCHEDULES

    sd = {k: v.numpy() for k, v in torch_fastdiff.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_fastdiff(sd, CFG))
    jnet = FastDiff(
        audio_channels=1, inner_channels=8, cond_channels=16,
        upsample_ratios=(4, 4, 2), lvc_layers_each_block=2, lvc_kernel_size=3,
        kpnet_hidden_channels=8, kpnet_conv_size=3,
        diffusion_step_embed_dim_in=16, diffusion_step_embed_dim_mid=32,
        diffusion_step_embed_dim_out=32,
    )
    dh = compute_hyperparams_given_schedule(np.linspace(1e-6, 0.01, 1000))
    bi, ai, si, steps = prepare_inference_schedule(NOISE_SCHEDULES[4], dh["alpha"])
    assert len(steps) == 4
    cond = jnp.asarray(rng.normal(size=(1, 6, 16)).astype(np.float32))
    wav = sampling_given_noise_schedule(
        lambda p, x, c, t: jnet.apply(p, x, c, t),
        params, jax.random.PRNGKey(0), 6 * 32, cond, bi, ai, si, steps,
    )
    assert wav.shape == (1, 192)
    assert np.isfinite(np.asarray(wav)).all()


def test_fastdiff_sampling_matches_torch(torch_fastdiff, rng, monkeypatch):
    """The scanned reverse-diffusion sampler vs the reference's
    sampling_given_noise_schedule (``module/util.py:158-234``) with identical
    injected noise — the 4-step schedule actually used at inference."""
    import importlib

    from prodiff_tpu.models.fastdiff import (
        FastDiff,
        compute_hyperparams_given_schedule,
        convert_fastdiff,
        prepare_inference_schedule,
        sampling_given_noise_schedule,
    )
    from prodiff_tpu.vocoders.fastdiff import NOISE_SCHEDULES

    util = importlib.import_module("modules.FastDiff.module.util")

    sd = {k: v.numpy() for k, v in torch_fastdiff.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_fastdiff(sd, CFG))
    jnet = FastDiff(
        audio_channels=1, inner_channels=8, cond_channels=16,
        upsample_ratios=(4, 4, 2), lvc_layers_each_block=2, lvc_kernel_size=3,
        kpnet_hidden_channels=8, kpnet_conv_size=3,
        diffusion_step_embed_dim_in=16, diffusion_step_embed_dim_mid=32,
        diffusion_step_embed_dim_out=32,
    )

    L, hop = 6, 32
    cond = rng.normal(size=(1, L, 16)).astype(np.float32)
    betas = np.linspace(CFG["beta_0"], CFG["beta_T"], CFG["T"])
    dh = compute_hyperparams_given_schedule(betas)
    bi, ai, si, steps = prepare_inference_schedule(NOISE_SCHEDULES[4], dh["alpha"])
    n = len(steps)

    # common noise draws: init + one per step with i > 0
    x_init = rng.normal(size=(1, 1, L * hop)).astype(np.float32)
    step_noises = [rng.normal(size=(1, 1, L * hop)).astype(np.float32)
                   for _ in range(n - 1)]
    draws = iter([torch.from_numpy(a.copy())
                  for a in [x_init] + step_noises])
    monkeypatch.setattr(util, "std_normal", lambda size: next(draws))

    # torch reference: build its diffusion hyperparams dict
    tdh = util.calc_diffusion_hyperparams_given_beta(
        torch.from_numpy(betas.astype(np.float32))
    )
    with torch.no_grad():
        want = util.sampling_given_noise_schedule(
            torch_fastdiff, (1, 1, L * hop), tdh,
            torch.from_numpy(np.asarray(NOISE_SCHEDULES[4], np.float32)),
            condition=torch.from_numpy(cond.transpose(0, 2, 1)),
        ).numpy()[:, 0]

    # jax: same sampler entry point the vocoder wrapper jits, injected noise
    # (the last step entry is masked out inside the scan, mirroring n==0)
    sn = np.stack(step_noises + [np.zeros_like(x_init)], axis=0)
    got = np.asarray(sampling_given_noise_schedule(
        lambda p, x, c, t: jnet.apply(p, x, c, t),
        params, jax.random.PRNGKey(0), L * hop, jnp.asarray(cond),
        bi, ai, si, steps,
        init_noise=jnp.asarray(x_init.transpose(0, 2, 1)),
        step_noises=jnp.asarray(sn.transpose(0, 1, 3, 2)),
    ))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
