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
    param tree. f32 weight streaming is exact vs the XLA path; the bf16
    default deviates only by bf16 rounding (~1e-3)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    net, params, x, t, cond = setup
    want = np.asarray(net.apply(params, x, t, cond))
    kw = dict(in_dims=16, hidden_size=32, residual_layers=4,
              residual_channels=128, dilation_cycle_length=1, use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        got32 = np.asarray(
            WaveNet(pallas_stream_dtype=jnp.float32, **kw).apply(params, x, t, cond)
        )
        got16 = np.asarray(WaveNet(**kw).apply(params, x, t, cond))
    np.testing.assert_allclose(got32, want, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got16, want, atol=5e-3, rtol=2e-2)


@pytest.mark.slow
def test_train_vjp_grads_match_xla(setup):
    """Gradients through the full pallas path (custom VJP, both training
    backends: 'xla' = differentiated plain-XLA stack, 'pallas' = fwd-save
    kernel + bwd chain kernel + wgrad einsums) must match autodiff through
    the linen XLA path. f32 residual saves for a tight comparison; exercises
    multi-tile halo windows (tile=8 < T=16)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from prodiff_tpu.ops.pallas.wavenet import (
        stack_wavenet_params,
        wavenet_apply_pallas,
    )

    net, params, x, t, cond = setup
    probe = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 16, 16)).astype(np.float32)
    )

    def loss_xla(p):
        return jnp.sum(jnp.sin(net.apply(p, x, t, cond)) * probe)

    def loss_pallas(p, save_dtype, train_impl):
        w = stack_wavenet_params(p, 4)
        out = wavenet_apply_pallas(
            w, x, t, cond, tile=8, halo=5, save_dtype=save_dtype,
            train_impl=train_impl,
        )
        return jnp.sum(jnp.sin(out) * probe)

    want = jax.grad(loss_xla)(params)
    flat_w, _ = jax.tree.flatten_with_path(want)

    for impl in ("xla", "pallas"):
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(
                lambda p: loss_pallas(p, jnp.float32, impl)
            )(params)
        flat_g = jax.tree.leaves(got)
        assert len(flat_w) == len(flat_g)
        for (path, gw), gg in zip(flat_w, flat_g):
            np.testing.assert_allclose(
                np.asarray(gg), np.asarray(gw), atol=1.5e-3, rtol=2e-3,
                err_msg=f"[{impl}] grad mismatch at {jax.tree_util.keystr(path)}",
            )

    # bf16 residual saves on the pallas backend: same grads to ~1% of scale
    with pltpu.force_tpu_interpret_mode():
        got16 = jax.grad(
            lambda p: loss_pallas(p, jnp.bfloat16, "pallas")
        )(params)
    for (path, gw), gg in zip(flat_w, jax.tree.leaves(got16)):
        gw, gg = np.asarray(gw), np.asarray(gg)
        scale = max(np.abs(gw).max(), 1e-3)
        np.testing.assert_allclose(
            gg, gw, atol=0.02 * scale, rtol=0.05,
            err_msg=f"bf16 grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_dot_precision_helper():
    """bf16-operand kernel dots pin Precision.DEFAULT (a global "highest"
    matmul pin crashes Mosaic on bf16 operands — round-5); f32 dots return
    None so the config still reaches them (the parity-pin render needs it)."""
    from prodiff_tpu.ops.pallas import dot_precision

    bf = jnp.zeros((2, 2), jnp.bfloat16)
    f32 = jnp.zeros((2, 2), jnp.float32)
    assert dot_precision(bf, f32) == jax.lax.Precision.DEFAULT
    assert dot_precision(bf) == jax.lax.Precision.DEFAULT
    assert dot_precision(f32, f32) is None
