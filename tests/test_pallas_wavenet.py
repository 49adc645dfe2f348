"""Correctness of the fused pallas WaveNet stack vs the linen module.

Runs in pallas interpreter mode on CPU (tests force JAX_PLATFORMS=cpu); the
compiled TPU path is exercised by the benchmark.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prodiff_tpu.models.wavenet import WaveNet


@pytest.fixture
def setup(rng):
    net = WaveNet(in_dims=16, hidden_size=32, residual_layers=4,
                  residual_channels=128, dilation_cycle_length=1)
    B, T = 2, 16
    x = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    t = jnp.asarray([1, 3])
    cond = jnp.asarray(rng.normal(size=(B, T, 32)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x, t, cond)
    # non-zero output projection so the comparison is meaningful
    params = jax.tree.map(
        lambda a: a if a.ndim == 0 else a + 0.01 * np.random.default_rng(1).normal(size=a.shape).astype(np.float32),
        params,
    )
    return net, params, x, t, cond


def test_stack_params_shapes(setup):
    from prodiff_tpu.ops.pallas.wavenet import stack_wavenet_params

    net, params, *_ = setup
    w = stack_wavenet_params(params, 4)
    assert w.dilated_w.shape == (4, 3, 128, 256)
    assert w.cond_w.shape == (4, 32, 256)
    assert w.out_w.shape == (4, 128, 256)
    assert w.in_w.shape == (1, 16, 128)


def test_pallas_matches_linen_interpret(setup, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from prodiff_tpu.ops.pallas.wavenet import (
        stack_wavenet_params,
        wavenet_apply_pallas,
    )

    net, params, x, t, cond = setup
    want = np.asarray(net.apply(params, x, t, cond))
    w = stack_wavenet_params(params, 4)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(wavenet_apply_pallas(w, x, t, cond))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_tiled_stack_is_exact(setup):
    """Halo-tiled dispatch must equal the single-tile kernel (interiors exact)."""
    from jax.experimental.pallas import tpu as pltpu

    from prodiff_tpu.ops.pallas.wavenet import (
        fused_residual_stack,
        fused_residual_stack_tiled,
        stack_wavenet_params,
    )

    net, params, x, t, cond = setup
    w = stack_wavenet_params(params, 4)
    rng = np.random.default_rng(5)
    T = 16
    x0 = jnp.asarray(rng.normal(size=(T, 128)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(T, 32)).astype(np.float32))
    step = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        want = np.asarray(fused_residual_stack(x0, c, step, w))
        got = np.asarray(
            fused_residual_stack_tiled(x0, c, step, w, tile=8, halo=4)
        )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_use_pallas_flag_in_module(setup):
    """WaveNet(use_pallas=True) routes through the fused kernel with the SAME
    param tree (inference-only; training keeps the XLA path)."""
    from jax.experimental.pallas import tpu as pltpu

    net, params, x, t, cond = setup
    pnet = WaveNet(in_dims=16, hidden_size=32, residual_layers=4,
                   residual_channels=128, dilation_cycle_length=1,
                   use_pallas=True)
    want = np.asarray(net.apply(params, x, t, cond))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pnet.apply(params, x, t, cond))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
