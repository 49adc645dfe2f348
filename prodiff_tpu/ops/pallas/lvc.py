"""Fused location-variable convolution (FastDiff's LVC) as a Pallas kernel.

The XLA formulation (window-concat + batched small GEMMs,
``models/fastdiff.py:location_variable_convolution``) measures ~3 ms per
final-scale layer on v5e: the [T, 3*Cin] tap concat copies at ~44 GB/s and the
[L, hop, 96] @ [L, 96, 64] batched GEMM runs at ~1 TFLOP/s — per-window
dispatch overhead, not FLOPs, dominates. This kernel builds each window's
tap matrix in VMEM from one contiguous x block (+precomputed 2-row edge
blocks) and runs the per-window GEMMs back to back on the MXU, streaming the
per-window kernels from HBM.

Matches the reference LVC semantics (``modules/FastDiff/module/modules.py:
220-255``): kernel constant within each hop window, k=3 taps with zero
padding at the sequence ends, windows' taps may read into neighbouring
windows' samples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lvc_single(x, kmat, bias, hop: int, wpb: int):
    """One sequence. x: [T, Cin]; kmat: [L, k*Cin, Cout]; bias: [L, Cout]."""
    t, cin = x.shape
    L, kcin, cout = kmat.shape
    k = kcin // cin
    assert k == 3, "kernel supports the k=3 LVC the reference uses"
    assert t == L * hop and L % wpb == 0
    nblk = L // wpb
    rows = wpb * hop

    # 16-row edge block per grid step: row 0 = last sample BEFORE the block,
    # row 8 = first sample AFTER it (zeros at the sequence ends)
    prev = jnp.concatenate([jnp.zeros((1, cin), x.dtype), x[rows - 1 :: rows][: nblk - 1]])
    nxt = jnp.concatenate([x[rows::rows][: nblk - 1], jnp.zeros((1, cin), x.dtype)])
    edges = jnp.zeros((nblk, 16, cin), x.dtype)
    edges = edges.at[:, 0].set(prev).at[:, 8].set(nxt)

    def kernel(x_ref, e_ref, km_ref, b_ref, out_ref):
        xb = x_ref[0]  # [rows, Cin]
        prev_row = e_ref[0, 0:1]
        next_row = e_ref[0, 8:9]
        x_prev = jnp.concatenate([prev_row, xb[: rows - 1]], axis=0)
        x_next = jnp.concatenate([xb[1:], next_row], axis=0)
        xw = jnp.concatenate([x_prev, xb, x_next], axis=1)  # [rows, 3*Cin]
        for w in range(wpb):
            y = jnp.dot(
                xw[w * hop : (w + 1) * hop], km_ref[0, w],
                preferred_element_type=jnp.float32,
            )
            out_ref[0, w * hop : (w + 1) * hop] = y + b_ref[0, w][None, :]

    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, rows, cin), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, cin), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wpb, kcin, cout), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wpb, cout), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, cout), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, rows, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * kcin * cout,
            bytes_accessed=4 * (t * cin + L * kcin * cout + t * cout),
            transcendentals=0,
        ),
    )(
        x.reshape(nblk, rows, cin), edges,
        kmat.reshape(nblk, wpb, kcin, cout),
        bias.reshape(nblk, wpb, cout),
    ).reshape(t, cout)


def lvc_pallas(x, kmat, bias, hop: int):
    """Batched fused LVC. x: [B, T, Cin]; kmat: [B, L, k*Cin, Cout];
    bias: [B, L, Cout] -> [B, T, Cout]. Requires hop % 8 == 0."""
    assert hop % 8 == 0, f"lvc_pallas needs sublane-aligned hop (got {hop})"
    L = kmat.shape[1]
    # ~2048 rows per grid step keeps the MXU busy without VMEM pressure
    wpb = max(1, min(L, 2048 // hop))
    while L % wpb:
        wpb -= 1
    return jax.vmap(
        functools.partial(_lvc_single, hop=hop, wpb=wpb)
    )(x, kmat, bias)
