"""Fused UBlock-layer Pallas kernel vs the XLA layer body (interpret mode on
the CPU rig; the real-TPU path is exercised by bench/profile runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prodiff_tpu.models.fastdiff import location_variable_convolution
from prodiff_tpu.ops.packed import pack, unpack
from prodiff_tpu.ops.pallas.ublock import ublock_layer_packed

RNG = np.random.default_rng(11)


def ref_layer(x, ad, conv_kernel, conv_bias, kmat, lvc_bias, dilation, hop):
    """The TimeAwareLVCBlock layer body (models/fastdiff.py:218-238)."""
    xa = x + ad
    y = jax.nn.leaky_relu(xa, 0.2)
    y = jax.lax.conv_general_dilated(
        y, conv_kernel, (1,), "SAME", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + conv_bias
    y = jax.nn.leaky_relu(y, 0.2)
    y = location_variable_convolution(y, kmat, lvc_bias, hop)
    cin = x.shape[-1]
    gate, filt = y[..., :cin], y[..., cin:]
    return xa + jax.nn.sigmoid(gate) * jnp.tanh(filt)


@pytest.mark.parametrize("merged_lvc", [True, False])
@pytest.mark.parametrize(
    "hop,dilation,L,wpb",
    [
        (256, 1, 4, 2),    # final-block scale (small L for test speed)
        (256, 27, 4, 1),   # max dilation halo
        (64, 3, 8, 4),     # middle block
        (8, 9, 32, 16),    # first block (tiny windows)
    ],
)
def test_fused_layer_matches_xla(hop, dilation, L, wpb, merged_lvc):
    cin, b = 32, 2
    t = L * hop
    x = jnp.asarray(RNG.normal(size=(b, t, cin)).astype(np.float32))
    ad = jnp.asarray(RNG.normal(size=(b, t, cin)).astype(np.float32))
    ck = jnp.asarray(RNG.normal(size=(3, cin, cin)).astype(np.float32)) * 0.2
    cb = jnp.asarray(RNG.normal(size=(cin,)).astype(np.float32)) * 0.1
    kmat = jnp.asarray(RNG.normal(size=(b, L, 3 * cin, 2 * cin)).astype(np.float32)) * 0.1
    lb = jnp.asarray(RNG.normal(size=(b, L, 2 * cin)).astype(np.float32)) * 0.1

    want = ref_layer(x, ad, ck, cb, kmat, lb, dilation, hop)
    got = unpack(
        ublock_layer_packed(
            pack(x, 4), pack(ad, 4), ck, cb, kmat, lb, dilation, hop,
            wpb=wpb, merged_lvc=merged_lvc, interpret=True,
        ),
        cin,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_rows_realigned_to_sublanes():
    """hop=8 (rows_per_window=2) with L=12: auto-wpb would pick 12 ->
    rows=24, not 8-aligned — the kernel's HBM row DMAs require multiples of
    8 rows (misaligned copies faulted the TPU worker). The picker must
    realign (here to wpb=4, rows=8) and keep numerics identical."""
    cin, b, hop, L, dilation = 32, 1, 8, 12, 3
    t = L * hop
    x = jnp.asarray(RNG.normal(size=(b, t, cin)).astype(np.float32))
    ad = jnp.asarray(RNG.normal(size=(b, t, cin)).astype(np.float32))
    ck = jnp.asarray(RNG.normal(size=(3, cin, cin)).astype(np.float32)) * 0.2
    cb = jnp.asarray(RNG.normal(size=(cin,)).astype(np.float32)) * 0.1
    kmat = jnp.asarray(
        RNG.normal(size=(b, L, 3 * cin, 2 * cin)).astype(np.float32)) * 0.1
    lb = jnp.asarray(RNG.normal(size=(b, L, 2 * cin)).astype(np.float32)) * 0.1

    want = ref_layer(x, ad, ck, cb, kmat, lb, dilation, hop)
    got = unpack(
        ublock_layer_packed(
            pack(x, 4), pack(ad, 4), ck, cb, kmat, lb, dilation, hop,
            interpret=True,
        ),
        cin,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_unalignable_shape_raises():
    """L with no divisor giving 8-aligned blocks must raise (clear error
    instead of a TPU worker fault), telling the caller to use the XLA path."""
    cin, b, hop, L = 32, 1, 8, 6
    t = L * hop
    x = pack(jnp.zeros((b, t, cin), jnp.float32), 4)
    ck = jnp.zeros((3, cin, cin), jnp.float32)
    cb = jnp.zeros((cin,), jnp.float32)
    kmat = jnp.zeros((b, L, 3 * cin, 2 * cin), jnp.float32)
    lb = jnp.zeros((b, L, 2 * cin), jnp.float32)
    with pytest.raises(ValueError, match="8-row-aligned"):
        ublock_layer_packed(x, x, ck, cb, kmat, lb, 1, hop, interpret=True)


def test_padded_chain_matches_plain():
    """in_halo/out_halo chained layers (one pad per block, kernel-emitted
    zeroed halos) must match the plain per-layer-pad mode exactly, and the
    intermediate padded outputs must carry ZERO halos (the next layer's
    correctness depends on it — interpret mode may mask garbage as zeros,
    so assert it explicitly)."""
    from prodiff_tpu.ops.pallas.ublock import layer_halo

    cin, b, hop, L = 32, 2, 64, 8
    t = L * hop
    x = jnp.asarray(RNG.normal(size=(b, t, cin)).astype(np.float32))
    ad = jnp.asarray(RNG.normal(size=(b, t, cin)).astype(np.float32))
    cks = [jnp.asarray(RNG.normal(size=(3, cin, cin)).astype(np.float32)) * 0.2
           for _ in range(4)]
    cb = jnp.asarray(RNG.normal(size=(cin,)).astype(np.float32)) * 0.1
    kms = [jnp.asarray(
        RNG.normal(size=(b, L, 3 * cin, 2 * cin)).astype(np.float32)) * 0.1
        for _ in range(4)]
    lbs = [jnp.asarray(
        RNG.normal(size=(b, L, 2 * cin)).astype(np.float32)) * 0.1
        for _ in range(4)]
    xp, adp = pack(x, 4), pack(ad, 4)

    want = xp
    for i in range(4):
        want = ublock_layer_packed(
            want, adp, cks[i], cb, kms[i], lbs[i], 3 ** i, hop,
            interpret=True)

    ioh = max(layer_halo(3 ** i, 4) for i in range(4))
    cur = jnp.pad(xp, [(0, 0), (ioh, ioh), (0, 0)])
    adpp = jnp.pad(adp, [(0, 0), (ioh, ioh), (0, 0)])
    for i in range(4):
        out_h = ioh if i < 3 else 0
        cur = ublock_layer_packed(
            cur, adpp, cks[i], cb, kms[i], lbs[i], 3 ** i, hop,
            interpret=True, in_halo=ioh, out_halo=out_h)
        if out_h:
            assert cur.shape[1] == xp.shape[1] + 2 * ioh
            np.testing.assert_array_equal(np.asarray(cur[:, :ioh]), 0.0)
            np.testing.assert_array_equal(np.asarray(cur[:, -ioh:]), 0.0)
    np.testing.assert_allclose(
        np.asarray(cur), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("hop,L", [(256, 16), (64, 48)])
def test_mono_block_matches_chained_layers(hop, L):
    """ublock_block_packed (all 4 layers in one pallas_call, halo-margin
    recompute) must match 4 chained per-layer kernels — which are themselves
    golden vs the linen LVC body."""
    from prodiff_tpu.ops.pallas.ublock import ublock_block_packed

    cin, b = 32, 2
    t = L * hop
    x = jnp.asarray(RNG.normal(size=(b, t, cin)).astype(np.float32))
    ad = jnp.asarray(RNG.normal(size=(b, t, cin)).astype(np.float32))
    cks = [jnp.asarray(RNG.normal(size=(3, cin, cin)).astype(np.float32)) * 0.2
           for _ in range(4)]
    cbs = [jnp.asarray(RNG.normal(size=(cin,)).astype(np.float32)) * 0.1
           for _ in range(4)]
    kms = [jnp.asarray(
        RNG.normal(size=(b, L, 3 * cin, 2 * cin)).astype(np.float32)) * 0.1
        for _ in range(4)]
    lbs = [jnp.asarray(
        RNG.normal(size=(b, L, 2 * cin)).astype(np.float32)) * 0.1
        for _ in range(4)]
    xp, adp = pack(x, 4), pack(ad, 4)
    want = xp
    for i in range(4):
        want = ublock_layer_packed(
            want, adp, cks[i], cbs[i], kms[i], lbs[i], 3 ** i, hop,
            interpret=True)
    got = ublock_block_packed(
        xp, adp, cks, cbs, kms, lbs, [3 ** i for i in range(4)], hop,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_mono_block_single_grid_block():
    """nblk == 1 (whole sequence in one grid block): margins and the km
    window clamps at BOTH sequence ends in the same block."""
    from prodiff_tpu.ops.pallas.ublock import ublock_block_packed

    cin, b, hop, L = 32, 1, 256, 8
    t = L * hop
    x = jnp.asarray(RNG.normal(size=(b, t, cin)).astype(np.float32))
    ad = jnp.asarray(RNG.normal(size=(b, t, cin)).astype(np.float32))
    cks = [jnp.asarray(RNG.normal(size=(3, cin, cin)).astype(np.float32)) * 0.2
           for _ in range(4)]
    cbs = [jnp.zeros((cin,), jnp.float32) for _ in range(4)]
    kms = [jnp.asarray(
        RNG.normal(size=(b, L, 3 * cin, 2 * cin)).astype(np.float32)) * 0.1
        for _ in range(4)]
    lbs = [jnp.zeros((b, L, 2 * cin), jnp.float32) for _ in range(4)]
    xp, adp = pack(x, 4), pack(ad, 4)
    want = xp
    for i in range(4):
        want = ublock_layer_packed(
            want, adp, cks[i], cbs[i], kms[i], lbs[i], 3 ** i, hop,
            interpret=True)
    got = ublock_block_packed(
        xp, adp, cks, cbs, kms, lbs, [3 ** i for i in range(4)], hop,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
