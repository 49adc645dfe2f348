"""Equivalence of the packed (space-to-depth) ops against the reference
unpacked formulations (ops/packed.py; FastDiff trunk repack,
``modules/FastDiff/module/modules.py`` semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prodiff_tpu.ops import packed as pk

RNG = np.random.default_rng(7)


def _x(b, t, c):
    return jnp.asarray(RNG.normal(size=(b, t, c)).astype(np.float32))


def test_pack_unpack_roundtrip():
    x = _x(2, 64, 32)
    xp = pk.pack(x, 4)
    assert xp.shape == (2, 16, 128)
    np.testing.assert_array_equal(pk.unpack(xp, 32), x)


@pytest.mark.parametrize("s", [-9, -4, -3, -1, 0, 1, 3, 4, 5, 11])
def test_time_shift(s):
    x = _x(1, 32, 8)
    xp = pk.pack(x, 4)
    got = pk.unpack(pk.time_shift(xp, s, 8), 8)
    want = np.zeros_like(np.asarray(x))
    for t in range(32):
        if 0 <= t + s < 32:
            want[:, t] = np.asarray(x)[:, t + s]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


@pytest.mark.parametrize("dilation", [1, 2, 3, 4, 9, 27])
def test_packed_conv3_matches_lax(dilation):
    cin, cout = 32, 32
    x = _x(2, 256, cin)
    kernel = jnp.asarray(RNG.normal(size=(3, cin, cout)).astype(np.float32)) * 0.2
    bias = jnp.asarray(RNG.normal(size=(cout,)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, kernel, (1,), "SAME", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + bias
    got = pk.unpack(
        pk.packed_conv3(pk.pack(x, 4), kernel, bias, dilation, cin), cout
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_packed_dense_matches_matmul():
    cin, cout = 32, 32
    x = _x(1, 64, cin)
    w = jnp.asarray(RNG.normal(size=(cin, cout)).astype(np.float32)) * 0.3
    b = jnp.asarray(RNG.normal(size=(cout,)).astype(np.float32))
    want = x @ w + b
    got = pk.unpack(pk.packed_dense(pk.pack(x, 4), w, b, cin), cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("factor", [1, 2, 4, 8])
def test_packed_downsample(factor):
    x = _x(1, 128, 32)
    want = np.asarray(x)[:, ::factor]
    got = pk.unpack(pk.packed_downsample(pk.pack(x, 4), factor, 32), 32)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("k", [7, 5, 3])
def test_packed_conv_from_flat(k):
    cout = 32
    a = _x(2, 96, 1)
    kernel = jnp.asarray(RNG.normal(size=(k, 1, cout)).astype(np.float32)) * 0.4
    bias = jnp.asarray(RNG.normal(size=(cout,)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        a, kernel, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
    ) + bias
    got = pk.unpack(pk.packed_conv_from_flat(a[..., 0], kernel, bias, 4), cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("k", [7, 3])
def test_packed_conv_to_flat(k):
    cin = 32
    x = _x(2, 96, cin)
    kernel = jnp.asarray(RNG.normal(size=(k, cin, 1)).astype(np.float32)) * 0.4
    bias = jnp.asarray(RNG.normal(size=(1,)).astype(np.float32))
    want = (
        jax.lax.conv_general_dilated(
            x, kernel, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
        )
        + bias
    )[..., 0]
    got = pk.packed_conv_to_flat(pk.pack(x, 4), kernel, bias, cin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize(
    "k,dilation,cin", [(7, 1, 32), (7, 5, 16), (11, 3, 16), (11, 5, 64), (5, 2, 32)]
)
def test_packed_convk_matches_lax(k, dilation, cin):
    """General odd-k dilated conv (NSF-HiFiGAN resblock shapes)."""
    cout = cin
    p = 128 // cin
    x = _x(2, 32 * p, cin)
    kernel = jnp.asarray(RNG.normal(size=(k, cin, cout)).astype(np.float32)) * 0.2
    bias = jnp.asarray(RNG.normal(size=(cout,)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, kernel, (1,), "SAME", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + bias
    got = pk.unpack(
        pk.packed_convk(pk.pack(x, p), kernel, bias, dilation, cin), cout
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


@pytest.mark.parametrize(
    "stride,p,cout", [(4, 2, 64), (2, 4, 32), (1, 8, 16), (8, 2, 32)]
)
def test_packed_strided_conv_from_flat(stride, p, cout):
    """NSF noise-conv shapes: k = 2*stride (or 1x1), padding = stride//2."""
    k = 2 * stride if stride > 1 else 1
    padding = stride // 2
    t = 64 * stride * p
    a = _x(2, t, 1)
    kernel = jnp.asarray(RNG.normal(size=(k, 1, cout)).astype(np.float32)) * 0.4
    bias = jnp.asarray(RNG.normal(size=(cout,)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        a, kernel, (stride,), [(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + bias
    got = pk.unpack(
        pk.packed_strided_conv_from_flat(a[..., 0], kernel, bias, stride, padding, p),
        cout,
    )
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("stride", [4, 8, 2])
def test_packed_conv_transpose_packed_in_matches_module(stride):
    from prodiff_tpu.models.fastdiff import ConvTranspose1dTorch

    cin = cout = 32
    x = _x(1, 48, cin)
    mod = ConvTranspose1dTorch(
        features=cout, kernel_size=2 * stride, stride=stride,
        padding=stride // 2 + stride % 2, output_padding=stride % 2,
    )
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)
    got = pk.unpack(
        pk.packed_conv_transpose_packed_in(
            pk.pack(x, 4), params["params"]["kernel"], params["params"]["bias"],
            stride=stride, padding=stride // 2 + stride % 2,
            output_padding=stride % 2, cin=cin,
        ),
        cout,
    )
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("stride", [4, 8, 2])
def test_packed_conv_transpose_matches_module(stride):
    from prodiff_tpu.models.fastdiff import ConvTranspose1dTorch

    cin = cout = 32
    x = _x(1, 48, cin)
    mod = ConvTranspose1dTorch(
        features=cout, kernel_size=2 * stride, stride=stride,
        padding=stride // 2 + stride % 2, output_padding=stride % 2,
    )
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)
    got = pk.unpack(
        pk.packed_conv_transpose(
            x, params["params"]["kernel"], params["params"]["bias"],
            stride=stride, padding=stride // 2 + stride % 2,
            output_padding=stride % 2, p=4,
        ),
        cout,
    )
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
