"""Fused HiFiGAN ResBlock-group kernel on the packed [B, S, 128] trunk.

One ``pallas_call`` per upsample stage computes the whole resblock ensemble
(reference ``modules/nsf_hifigan/models.py:39-102``: mean over ResBlock1s of
kernel sizes 3/7/11, each three (leaky -> dilated conv -> leaky -> conv ->
+residual) units), entirely in VMEM:

    out = mean_j ResBlock1_j(x)          (18 convolutions per stage)

Why a kernel, and why bf16: the packed selector-GEMM convs inflate FLOPs by
~nq*P/k per conv, which makes the XLA packed trunk ~84% MXU-f32-BOUND at
generator scale (sum ~540 GFLOP -> 5.5 ms at f32 peak vs 6.5 measured). The
f32->bf16 lever is blocked in XLA: its conv emitter rejects these bf16 NWC
convs and decomposes them into pad+reduce VPU overlap-adds (measured SLOWER,
see CLAUDE.md round-3). Inside Pallas, each tap is an explicit ``jnp.dot``
with bf16 operands and f32 accumulation — straight onto the MXU at the bf16
rate — and the stage's 36 conv-sized HBM round-trips collapse to one read +
one write of x.

Tap offsets are the SPARSE row-offset sets from ops/packed.py's selector
(the dense stacks carry zero matrices); sequence ends are re-zeroed after
every conv+bias so the chained convs reproduce lax SAME zero-padding
exactly (the conv-of-padding rows would otherwise carry bias).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prodiff_tpu.ops.packed import convk_mixing_matrices, convk_row_offsets
from prodiff_tpu.ops.pallas import dot_precision

LRELU_SLOPE = 0.1  # HiFiGAN-family slope (FastDiff's UBlock uses 0.2)


def _leaky(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _conv_qs(k: int, d: int, p: int) -> Tuple[int, ...]:
    return convk_row_offsets(k, d, p)


@functools.lru_cache(maxsize=64)
def stage_meta(
    res_ksizes: Tuple[int, ...],
    res_dsizes: Tuple[Tuple[int, ...], ...],
    p: int,
) -> Tuple[Tuple[Tuple[int, ...], ...], Tuple[int, ...], int]:
    """Static kernel metadata for one stage.

    Returns (per-conv sparse row offsets in (resblock, unit, conv1/conv2)
    order; per-resblock total reach; DMA halo rounded to sublanes)."""
    convs = []
    reaches = []
    for k, ds in zip(res_ksizes, res_dsizes):
        reach = 0
        for d in ds:
            qs1 = _conv_qs(k, d, p)
            qs2 = _conv_qs(k, 1, p)
            convs.append(qs1)
            convs.append(qs2)
            reach += max(qs1) + max(qs2)
        reaches.append(reach)
    halo = (max(reaches) + 7) // 8 * 8
    return tuple(convs), tuple(reaches), halo


def prepare_resblock_stage(
    stage_params: Sequence[dict],
    res_ksizes: Sequence[int],
    res_dsizes: Sequence[Sequence[int]],
    p: int,
    dtype=jnp.bfloat16,
    wide: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenated sparse tap stacks + lane-tiled biases for one stage.

    stage_params: the stage's resblock param dicts (convs1_i/convs2_i ->
    {"conv": {"kernel", "bias"}}), one per resblock, linen layout.
    Returns (weights [sum_nq * P*C, P*C] ``dtype`` — tap stacks FLATTENED on
    rows so the kernel's fat-dot path slices [nq*CL, CL] blocks without a
    VMEM reshape (Mosaic rejects leading-dim merges of VMEM values) —
    and biases [n_convs, P*C] f32).

    ``wide=True`` emits the lane-stacked layout [P*C, sum_nq * P*C] instead
    (conv ci's tap qi at lanes [(woff[ci]+qi)*CL, ...+CL)) for the fat-N dot
    path: one [E, CL] @ [CL, nq*CL] contraction per conv with the tap shifts
    applied to the OUTPUT rows (128-aligned lane slices — legal in Mosaic,
    unlike the sublane-phase-mismatched input concat the fat-K path needs).
    """
    mats = []
    biases = []
    for rb, (k, ds) in zip(stage_params, zip(res_ksizes, res_dsizes)):
        for li, d in enumerate(ds):
            for group, dd in (("convs1", d), ("convs2", 1)):
                cp = rb[f"{group}_{li}"]["conv"]
                m, qs = convk_mixing_matrices(
                    cp["kernel"].astype(dtype), dd, p
                )  # sparse [nq, P*C, P*C]
                if wide:
                    mats.append(m.transpose(1, 0, 2).reshape(m.shape[1], -1))
                else:
                    mats.append(m.reshape(-1, m.shape[-1]))
                biases.append(jnp.tile(cp["bias"].astype(jnp.float32), p))
    return (
        jnp.concatenate(mats, axis=1 if wide else 0),
        jnp.stack(biases, axis=0),
    )


def _stage_walk(x_t, weight_begin, weight_rows, bias_at, wdtype, mask_seq,
                convs, n_res, res_dsizes, rows, halo,
                fat_dots=False, fat_rows=None,
                fat_chunk=0, wide_cols=None):
    """The residual walk shared by the VMEM-resident and weight-streamed
    kernels — the conv/mask/residual math exists once; the variants differ
    only in where each conv's tap rows come from.

    weight_begin(ci): per-conv hook run before the dots (the streamed kernel
    waits its weight DMA and prefetches the next conv's there; no-op for the
    VMEM-resident variant). weight_rows(ci, qi) -> [CL, CL] tap rows.
    fat_rows(ci, nq) -> the whole [nq*CL, CL] block (fat-dot study path).
    fat_chunk/wide_cols: the fat-N path — wide_cols(ci, j0, nj) -> the
    [CL, nj*CL] lane-stacked weight slab for taps [j0, j0+nj); one
    [E, CL] @ [CL, nj*CL] dot per chunk with the tap shifts applied to the
    OUTPUT rows (lane slices at CL multiples — legal, unlike fat-K's
    sublane-phase-mismatched input concat). fat_chunk bounds the transient
    [E, nj*CL] f32 per-chunk VMEM.
    """

    def conv(y, ci, origin):
        """y: [E, CL] f32 at ``origin``; returns ([E', CL] f32, origin')
        with E' = E - (qmax - qmin), origin' = origin - qmin."""
        qs = convs[ci]
        nq = len(qs)
        qmin, qmax = min(qs), max(qs)
        e_out = y.shape[0] - (qmax - qmin)
        weight_begin(ci)
        yb = y.astype(wdtype)
        # bf16 tap dots pin Precision.DEFAULT (bitwise-unchanged — Mosaic's
        # default contract precision is single-pass bf16 — but immune to a
        # global "highest" pin, which rejects bf16 operands); f32 inherits
        # the config so the precision-pinned parity render gets fp32 passes
        prec = dot_precision(yb)
        if fat_chunk and nq > 1:
            cl = y.shape[1]
            acc = None
            for j0 in range(0, nq, fat_chunk):
                nj = min(fat_chunk, nq - j0)
                y_all = jax.lax.dot_general(
                    yb, wide_cols(ci, j0, nj),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )  # [E, nj*CL]; row r holds every tap's contrib for row r
                for t in range(nj):
                    q = qs[j0 + t]
                    contrib = y_all[
                        q - qmin : q - qmin + e_out, t * cl : (t + 1) * cl
                    ]
                    acc = contrib if acc is None else acc + contrib
        elif fat_dots and nq > 1:
            # one K = nq*CL contraction per conv: the tap slices land in
            # a lane-stacked operand against the row-flattened [nq*CL,
            # CL] weight block — ~7x fewer dot setups per stage. BLOCKED
            # on current Mosaic (kept for interpret-mode study): tpu.
            # concatenate rejects operands at different sublane phases
            # (vpad offsets {0,0}/{1,0}/{2,0}) in ANY dtype, which the
            # misaligned tap slices inevitably are. Default stays the
            # per-tap dot loop.
            stacked = jnp.concatenate(
                [y[q - qmin : q - qmin + e_out] for q in qs], axis=1
            ).astype(wdtype)  # [E', nq*CL]
            acc = jax.lax.dot_general(
                stacked, fat_rows(ci, nq),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        else:
            acc = None
            for qi, q in enumerate(qs):
                contrib = jax.lax.dot_general(
                    yb[q - qmin : q - qmin + e_out],
                    weight_rows(ci, qi),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
                acc = contrib if acc is None else acc + contrib
        acc = acc + bias_at(ci)[None, :]
        return mask_seq(acc, origin - qmin), origin - qmin

    out = None
    ci = 0
    for j in range(n_res):
        h = x_t
        o_h = 0
        for _ in range(len(res_dsizes[j])):
            xt, o = conv(_leaky(h), ci, o_h)
            ci += 1
            xt, o = conv(_leaky(xt), ci, o)
            ci += 1
            shift = o - o_h
            h = xt + h[shift : shift + xt.shape[0]]
            o_h = o
        # center slice to the block's `rows` (origin `halo` in x_t space)
        lo = halo - o_h
        hc = h[lo : lo + rows]
        out = hc if out is None else out + hc
    return out * (1.0 / n_res)


def resblock_group_streamed(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    biases: jnp.ndarray,
    res_ksizes: Sequence[int],
    res_dsizes: Sequence[Sequence[int]],
    rows_per_block: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """out = mean_j ResBlock1_j(x) for an UNPACKED full-lane stage.

    The C >= 256 stages (e.g. NSF s0, reference stage list
    ``modules/nsf_hifigan/models.py:231-288``) are already lane-full, but
    their tap stacks do NOT fit VMEM next to the row tiles (126 taps *
    256*256 bf16 = 16.5 MB), so the weights stay in HBM and stream per-conv,
    double-buffered against the tap dots exactly like the activation halo
    DMA: while conv ``ci``'s dots run, conv ``ci+1``'s weights are in
    flight. The per-conv granularity (not per-unit) keeps the DMA count per
    block EVEN (2 convs per unit), so the slot parity ``ci % 2`` is
    consistent across grid steps without a dynamic slot index.

    x: [B, S, C] f32 with C % 128 == 0; weights/biases from
    :func:`prepare_resblock_stage` with ``p=1`` (per-tap stacks are then the
    raw [C, C] kernel slices); returns [B, S, C] f32.

    rows_per_block=512: the C=256 chain's live f32 intermediates are twice
    the 128-lane kernel's width — 1024 rows measured 18.31M scoped VMEM
    (limit 16M) at the standard 3/7/11 stage.
    """
    b, s, c = x.shape
    assert c % 128 == 0, c
    convs, reaches, halo = stage_meta(
        tuple(res_ksizes), tuple(map(tuple, res_dsizes)), 1
    )
    n_res = len(res_ksizes)
    n_convs = len(convs)
    assert n_convs % 2 == 0, n_convs  # 2 convs per unit, always even
    rows = min(rows_per_block, (s + 7) // 8 * 8)
    nblk = -(-s // rows)
    s_pad = nblk * rows
    ext = rows + 2 * halo
    total = b * nblk

    xpad = jnp.pad(x, [(0, 0), (halo, halo + (s_pad - s)), (0, 0)])
    wrows = [len(qs) * c for qs in convs]  # rows per conv in the flat stack
    woff = np.concatenate([[0], np.cumsum(wrows)])
    wmax = max(wrows)

    def kernel(x_hbm, w_hbm, b_ref, out_ref, xs, ws, asem, wsem):
        bi = pl.program_id(0)
        n = pl.program_id(1)
        g = bi * nblk + n
        g1 = g + 1

        def adma(slot, blk, bb):
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(blk * rows, ext)], xs.at[slot],
                asem.at[slot],
            )

        def wdma(slot, ci):
            return pltpu.make_async_copy(
                w_hbm.at[pl.ds(int(woff[ci]), wrows[ci])],
                ws.at[slot, pl.ds(0, wrows[ci])],
                wsem.at[slot],
            )

        @pl.when(g == 0)
        def _():
            adma(0, 0, 0).start()
            wdma(0, 0).start()

        @pl.when(g1 < total)
        def _():
            adma(g1 % 2, g1 % nblk, g1 // nblk).start()

        adma(g % 2, n, bi).wait()
        x_t = xs[g % 2]  # [ext, C] f32; row r is global row n*rows - halo + r

        def mask_seq(y, origin):
            e = y.shape[0]
            r = jax.lax.broadcasted_iota(jnp.int32, (e, c), 0)
            gr = n * rows - halo + origin + r
            return jnp.where((gr >= 0) & (gr < s), y, 0.0)

        def weight_begin(ci):
            wdma(ci % 2, ci).wait()
            if ci + 1 < n_convs:
                wdma((ci + 1) % 2, ci + 1).start()
            else:
                # prefetch conv 0 for the next block (weights identical
                # across blocks, but the slot rotated through all convs)
                @pl.when(g1 < total)
                def _():
                    wdma(0, 0).start()

        out_ref[0] = _stage_walk(
            x_t, weight_begin,
            lambda ci, qi: ws[ci % 2, qi * c : (qi + 1) * c],
            lambda ci: b_ref[ci], weights.dtype, mask_seq,
            convs, n_res, res_dsizes, rows, halo,
        )

    total_taps = sum(len(qs) for qs in convs)
    return pl.pallas_call(
        kernel,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (n_convs, c), lambda bi, n: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, c), lambda bi, n: (bi, n, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ext, c), jnp.float32),
            pltpu.VMEM((2, wmax, c), weights.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * c * c * total_taps,
            # activations once each way + the tap stacks re-streamed per block
            bytes_accessed=4 * b * s * c * 2
            + weights.dtype.itemsize * total_taps * c * c * total,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xpad, weights, biases)[:, :s]


def resblock_group_packed(
    xp: jnp.ndarray,
    weights: jnp.ndarray,
    biases: jnp.ndarray,
    res_ksizes: Sequence[int],
    res_dsizes: Sequence[Sequence[int]],
    p: int,
    rows_per_block: int = 1024,
    fat_dots: bool = False,
    fat_chunk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """out = mean_j ResBlock1_j(xp), fused.

    xp: [B, S, CL] f32 packed rows (CL == P*C == 128); weights/biases from
    :func:`prepare_resblock_stage` (weights may be bf16 — the dots accumulate
    f32); returns [B, S, CL] f32.

    ``fat_chunk > 0``: the fat-N dot path — ``weights`` must be the WIDE
    [CL, sum_nq*CL] layout (``prepare_resblock_stage(wide=True)``); each
    conv runs ceil(nq/fat_chunk) [E, CL] @ [CL, chunk*CL] dots instead of
    nq [E', CL] @ [CL, CL] dots, shifting tap rows on the output side.
    """
    b, s, cl = xp.shape
    assert cl == 128, cl
    convs, reaches, halo = stage_meta(
        tuple(res_ksizes), tuple(map(tuple, res_dsizes)), p
    )
    n_res = len(res_ksizes)
    # Block rows: pad S up to a multiple of rows instead of shrinking rows to
    # a divisor of S — an odd/small-2-adic S would otherwise collapse rows to
    # 1 (a grid of S programs each DMA-ing 1+2*halo rows: a silent perf
    # cliff). Padded rows are re-zeroed by mask_seq (which tests against the
    # TRUE s) after every conv, so they never contaminate real rows, and the
    # output is sliced back to s.
    rows = min(rows_per_block, (s + 7) // 8 * 8)
    nblk = -(-s // rows)
    s_pad = nblk * rows
    ext = rows + 2 * halo

    xpad = jnp.pad(xp, [(0, 0), (halo, halo + (s_pad - s)), (0, 0)])
    wsizes = [len(qs) for qs in convs]
    woff = np.concatenate([[0], np.cumsum(wsizes)])

    def kernel(x_hbm, w_ref, b_ref, out_ref, xs, sem):
        bi = pl.program_id(0)
        n = pl.program_id(1)

        def dma(slot, blk, bb):
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(blk * rows, ext)], xs.at[slot],
                sem.at[slot],
            )

        g = bi * nblk + n

        @pl.when(g == 0)
        def _():
            dma(0, 0, 0).start()

        g1 = g + 1

        @pl.when(g1 < pl.num_programs(0) * nblk)
        def _():
            dma(g1 % 2, g1 % nblk, g1 // nblk).start()

        dma(g % 2, n, bi).wait()
        x_t = xs[g % 2]  # [ext, CL] f32; row r is global row n*rows - halo + r

        # sequence-end mask helper: global row of local row r at ``origin``
        # shift o is n*rows - halo + o + r; rows outside [0, s) are re-zeroed
        # after every conv+bias (lax SAME zero-padding semantics)
        def mask_seq(y, origin):
            e = y.shape[0]
            r = jax.lax.broadcasted_iota(jnp.int32, (e, cl), 0)
            gr = n * rows - halo + origin + r
            return jnp.where((gr >= 0) & (gr < s), y, 0.0)

        if fat_chunk:

            def wide_cols(ci, j0, nj):
                l0 = (int(woff[ci]) + j0) * cl
                return w_ref[:, l0 : l0 + nj * cl]

            weight_rows = lambda ci, qi: wide_cols(ci, qi, 1)
            fat_rows = None
        else:
            wide_cols = None

            def weight_rows(ci, qi):
                w0 = int(woff[ci]) * cl
                return w_ref[w0 + qi * cl : w0 + (qi + 1) * cl]

            def fat_rows(ci, nq):
                w0 = int(woff[ci]) * cl
                return w_ref[w0 : w0 + nq * cl]

        out_ref[0] = _stage_walk(
            x_t, lambda ci: None, weight_rows, lambda ci: b_ref[ci],
            weights.dtype, mask_seq, convs, n_res, res_dsizes, rows, halo,
            fat_dots=fat_dots, fat_rows=fat_rows,
            fat_chunk=fat_chunk, wide_cols=wide_cols,
        )

    wshape = (
        (cl, int(woff[-1]) * cl) if fat_chunk else (int(woff[-1]) * cl, cl)
    )
    assert weights.shape == wshape, (weights.shape, wshape, bool(fat_chunk))
    return pl.pallas_call(
        kernel,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                wshape, lambda bi, n: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (len(convs), cl), lambda bi, n: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, cl), lambda bi, n: (bi, n, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, cl), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ext, cl), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * cl * cl * int(woff[-1]),
            bytes_accessed=4 * b * s * cl * 2
            + weights.dtype.itemsize * int(woff[-1]) * cl * cl,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xpad, weights, biases)[:, :s]
