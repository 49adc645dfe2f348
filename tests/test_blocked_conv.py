"""Blocked (space-to-depth) dilated conv equivalence vs lax."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prodiff_tpu.ops.blocked_conv import blocked_dilated_conv


@pytest.mark.parametrize("dilation", [1, 3, 9, 27])
@pytest.mark.parametrize("pack", [4, 8])
def test_blocked_conv_matches_lax(rng, dilation, pack):
    x = jnp.asarray(rng.normal(size=(2, 256, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 32, 48)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, k, (1,), "SAME", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + bias
    got = blocked_dilated_conv(x, k, bias=bias, dilation=dilation, pack=pack)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_blocked_conv_grads(rng):
    """The mixing matrices are built from the kernel inside jit — grads flow."""
    x = jnp.asarray(rng.normal(size=(1, 64, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 32, 32)).astype(np.float32) * 0.1)

    def loss_blocked(k):
        return blocked_dilated_conv(x, k, dilation=3).sum()

    def loss_lax(k):
        return jax.lax.conv_general_dilated(
            x, k, (1,), "SAME", rhs_dilation=(3,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ).sum()

    g1 = jax.grad(loss_blocked)(k)
    g2 = jax.grad(loss_lax)(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-4)
