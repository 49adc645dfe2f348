"""Fused Pallas LVC vs the XLA windowed-GEMM formulation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from prodiff_tpu.models.fastdiff import location_variable_convolution


@pytest.mark.parametrize("hop,L,cin,cout", [
    (64, 8, 32, 64),   # FastDiff mid-block shape (scaled down in L)
    (256, 4, 32, 64),  # final-block shape
    (64, 6, 32, 64),   # L not a multiple of the default windows-per-block
])
def test_lvc_pallas_matches_einsum(rng, hop, L, cin, cout):
    k = 3
    x = jnp.asarray(rng.normal(size=(2, L * hop, cin)).astype(np.float32))
    kmat = jnp.asarray(rng.normal(size=(2, L, k * cin, cout)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.normal(size=(2, L, cout)).astype(np.float32))

    want = np.asarray(
        location_variable_convolution(x, kmat, bias, hop, use_pallas=False)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            location_variable_convolution(x, kmat, bias, hop, use_pallas=True)
        )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_lvc_window_boundary_taps(rng):
    """Taps crossing window boundaries must read the NEIGHBOUR window's
    samples (zero only at the sequence ends) — the edge-row plumbing."""
    hop, L, cin, cout = 64, 4, 32, 64
    x = jnp.asarray(rng.normal(size=(1, L * hop, cin)).astype(np.float32))
    # kernel that copies the t-1 tap of channel 0 to output 0
    kmat = np.zeros((1, L, 3 * cin, cout), np.float32)
    kmat[0, :, 0, 0] = 1.0  # tap 0 (= x[t-1]), channel 0 -> out 0
    bias = jnp.zeros((1, L, cout), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            location_variable_convolution(
                x, jnp.asarray(kmat), bias, hop, use_pallas=True
            )
        )
    xs = np.asarray(x)[0, :, 0]
    assert got[0, 0, 0] == 0.0  # sequence start: zero pad
    np.testing.assert_allclose(got[0, 1:, 0], xs[:-1], rtol=1e-6)
