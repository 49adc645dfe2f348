"""Packed (space-to-depth + fused Pallas) FastDiff forward vs the linen path
with identical params (models/fastdiff.py:_packed_forward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prodiff_tpu.models.fastdiff import FastDiff

RNG = np.random.default_rng(5)


@pytest.mark.parametrize("b,L", [(1, 4), (2, 8)])
def test_packed_forward_matches_linen(b, L):
    hop = 256
    t = L * hop
    net = FastDiff(cond_channels=16, use_packed=False)
    net_packed = FastDiff(cond_channels=16, use_packed=True)
    audio = jnp.asarray(RNG.normal(size=(b, t, 1)).astype(np.float32))
    cond = jnp.asarray(RNG.normal(size=(b, L, 16)).astype(np.float32))
    steps = jnp.full((b, 1), 2.5, jnp.float32)
    params = net.init(jax.random.PRNGKey(0), audio, cond, steps)
    want = net.apply(params, audio, cond, steps)
    got = net_packed.apply(params, audio, cond, steps)
    assert got.shape == want.shape == (b, t, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_packed_sampling_matches_linen():
    """Full 4-step reverse diffusion with injected noise: packed vs linen."""
    from prodiff_tpu.models.fastdiff import (
        compute_hyperparams_given_schedule,
        prepare_inference_schedule,
        sampling_given_noise_schedule,
    )
    from prodiff_tpu.vocoders.fastdiff import NOISE_SCHEDULES

    b, L, hop = 1, 4, 256
    t = L * hop
    net = FastDiff(cond_channels=16, use_packed=False)
    net_p = FastDiff(cond_channels=16, use_packed=True)
    audio0 = jnp.zeros((b, t, 1))
    cond = jnp.asarray(RNG.normal(size=(b, L, 16)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), audio0, cond, jnp.zeros((b, 1)))
    dh = compute_hyperparams_given_schedule(np.linspace(1e-6, 0.01, 1000))
    bi, ai, si, steps = prepare_inference_schedule(NOISE_SCHEDULES[4], dh["alpha"])
    init = jnp.asarray(RNG.normal(size=(b, t, 1)).astype(np.float32))
    step_n = jnp.asarray(RNG.normal(size=(len(steps), b, t, 1)).astype(np.float32))

    def run(module):
        return sampling_given_noise_schedule(
            lambda p, x, c, tt: module.apply(p, x, c, tt),
            params, jax.random.PRNGKey(1), t, cond, bi, ai, si, steps,
            init_noise=init, step_noises=step_n,
        )

    want = np.asarray(run(net))
    got = np.asarray(run(net_p))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_hoisted_kp_sampling_matches_per_step():
    """Sampler with hoisted KernelPredictor outputs == per-step recompute."""
    from prodiff_tpu.models.fastdiff import (
        compute_hyperparams_given_schedule,
        fastdiff_step_kernels,
        prepare_inference_schedule,
        sampling_given_noise_schedule,
    )
    from prodiff_tpu.vocoders.fastdiff import NOISE_SCHEDULES

    b, L, hop = 1, 4, 256
    t = L * hop
    net_p = FastDiff(cond_channels=16, use_packed=True)
    audio0 = jnp.zeros((b, t, 1))
    cond = jnp.asarray(RNG.normal(size=(b, L, 16)).astype(np.float32))
    params = net_p.init(jax.random.PRNGKey(0), audio0, cond, jnp.zeros((b, 1)))
    dh = compute_hyperparams_given_schedule(np.linspace(1e-6, 0.01, 1000))
    bi, ai, si, steps = prepare_inference_schedule(NOISE_SCHEDULES[4], dh["alpha"])
    init = jnp.asarray(RNG.normal(size=(b, t, 1)).astype(np.float32))
    step_n = jnp.asarray(RNG.normal(size=(len(steps), b, t, 1)).astype(np.float32))

    want = np.asarray(sampling_given_noise_schedule(
        lambda p, x, c, tt: net_p.apply(p, x, c, tt),
        params, jax.random.PRNGKey(1), t, cond, bi, ai, si, steps,
        init_noise=init, step_noises=step_n,
    ))
    kp_all = fastdiff_step_kernels(
        net_p, params, cond, jnp.asarray(steps, jnp.float32)
    )
    got = np.asarray(sampling_given_noise_schedule(
        lambda p, x, c, tt, k: net_p.apply(p, x, c, tt, kp_out=k),
        params, jax.random.PRNGKey(1), t, cond, bi, ai, si, steps,
        init_noise=init, step_noises=step_n, kp_all=kp_all,
    ))
    # the batched KP convs schedule differently than per-step ones: ~1e-5
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_packed_falls_back_on_odd_length():
    # L=6 doesn't pack at the smallest pyramid rate -> linen path, same result
    net = FastDiff(cond_channels=16, use_packed=True)
    audio = jnp.asarray(RNG.normal(size=(1, 6 * 256, 1)).astype(np.float32))
    cond = jnp.asarray(RNG.normal(size=(1, 6, 16)).astype(np.float32))
    steps = jnp.zeros((1, 1))
    params = net.init(jax.random.PRNGKey(0), audio, cond, steps)
    out = net.apply(params, audio, cond, steps)
    assert out.shape == (1, 6 * 256, 1)


def test_packed_auto_falls_back_on_unsupported_shape():
    # inner_channels that doesn't divide 128 -> packed path must not engage
    net = FastDiff(cond_channels=8, inner_channels=24, use_packed=True)
    audio = jnp.zeros((1, 512, 1))
    cond = jnp.zeros((1, 2, 8))
    steps = jnp.zeros((1, 1))
    params = net.init(jax.random.PRNGKey(0), audio, cond, steps)
    out = net.apply(params, audio, cond, steps)
    assert out.shape == (1, 512, 1)


def test_padded_chain_forward_matches(monkeypatch):
    """_PADDED_CHAIN (one pad per block, halo-padded layer chaining) must be
    numerically identical to the per-layer-pad packed forward AND to linen."""
    import prodiff_tpu.models.fastdiff as fd_mod

    b, L, hop = 2, 8, 256
    t = L * hop
    net = FastDiff(cond_channels=16, use_packed=False)
    net_packed = FastDiff(cond_channels=16, use_packed=True)
    audio = jnp.asarray(RNG.normal(size=(b, t, 1)).astype(np.float32))
    cond = jnp.asarray(RNG.normal(size=(b, L, 16)).astype(np.float32))
    steps = jnp.full((b, 1), 2.5, jnp.float32)
    params = net.init(jax.random.PRNGKey(0), audio, cond, steps)
    want_linen = net.apply(params, audio, cond, steps)
    plain = net_packed.apply(params, audio, cond, steps)
    monkeypatch.setattr(fd_mod, "_PADDED_CHAIN", True)
    chained = net_packed.apply(params, audio, cond, steps)
    np.testing.assert_allclose(np.asarray(chained), np.asarray(plain),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(chained), np.asarray(want_linen),
                               atol=5e-5)


def test_mono_block_forward_matches(monkeypatch):
    """_MONO_BLOCK (whole LVC block in one pallas_call) must be numerically
    indistinguishable from the per-layer packed forward and from linen."""
    import prodiff_tpu.models.fastdiff as fd_mod

    b, L, hop = 2, 16, 256
    t = L * hop
    net = FastDiff(cond_channels=16, use_packed=False)
    net_packed = FastDiff(cond_channels=16, use_packed=True)
    audio = jnp.asarray(RNG.normal(size=(b, t, 1)).astype(np.float32))
    cond = jnp.asarray(RNG.normal(size=(b, L, 16)).astype(np.float32))
    steps = jnp.full((b, 1), 2.5, jnp.float32)
    params = net.init(jax.random.PRNGKey(0), audio, cond, steps)
    want_linen = net.apply(params, audio, cond, steps)
    plain = net_packed.apply(params, audio, cond, steps)
    monkeypatch.setattr(fd_mod, "_MONO_BLOCK", True)
    mono = net_packed.apply(params, audio, cond, steps)
    np.testing.assert_allclose(np.asarray(mono), np.asarray(plain), atol=2e-5)
    np.testing.assert_allclose(np.asarray(mono), np.asarray(want_linen),
                               atol=7e-5)
