"""Fused FastDiff UBlock layer on the packed [B, T/P, P*C] trunk.

One ``pallas_call`` per LVC layer computes, entirely in VMEM:

    xa  = x + audio_down                      (residual carry-in)
    y   = leaky_relu(xa, 0.2)
    y   = dilated k=3 conv (d = 3^i)          (shifted-row GEMMs vs packed
                                               mixing matrices, cf.
                                               ops/packed.py:packed_conv3)
    y   = leaky_relu(y, 0.2)
    y   = LVC(y, per-window kernels, hop)     (per-window [hop,3C]@[3C,2C]
                                               GEMMs, kernel constant within a
                                               window — reference semantics
                                               ``modules/FastDiff/module/
                                               modules.py:220-255``)
    out = xa + sigmoid(y[:, :C]) * tanh(y[:, C:])

which is the body of ``TimeAwareLVCBlock``'s layer loop
(``models/fastdiff.py``). The round-2 verdict's finding: the XLA version
materialises ~6 audio-rate [T, 32] intermediates per layer, each tiled
(8, 128) with 96 dead lanes — ~4x physical HBM traffic. Here the only HBM
traffic per layer is x + audio_down in, kernels in, x out — all at full lane
occupancy.

Grid is (B, L/wpb); halo rows for the conv and the LVC taps come from a
host-side zero-pad of HALO rows on each end (dynamic-start, static-size row
slices in VMEM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prodiff_tpu.ops.packed import conv3_mixing_matrices

LRELU_SLOPE = 0.2

# DIAGNOSTIC ONLY (tools/profile_fastdiff.py): reuse window 0's block-diagonal
# kernel for every window — wrong numerics, isolates the per-window BD
# construction cost from the per-window GEMMs.
_DIAG_STATIC_BD = False


def _leaky(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _fused_layer_compute(xa, E, out_len, mq_at, qs, cb_row, windows, gr0,
                         s_rows, cin, p, pad_y, merged_lvc=True):
    """One UBlock layer body on VMEM-resident values.

    Shared by the per-layer kernel (``ublock_layer_packed``) and the
    whole-block mono kernel (``ublock_block_packed``) so the conv/tap/BD/
    de-interleave math exists once.

    Args:
      xa: [out_len + 2E, P*C] f32 — x + audio_down covering the out region
        plus E margin rows each side (E a multiple of 8, >= max|q| + pad_y).
      mq_at: qi -> [P*C, P*C] packed conv mixing matrix.
      windows: ordered (km_f32 [3C, 2C], lb [2C], row_start, row_len) tuples
        tiling [0, out_len); row_start multiples of 8 (Mosaic phases).
      gr0: traced global packed-row index of out row 0 (sequence-end masks).
      s_rows: static logical sequence length in packed rows.

    Returns [out_len, P*C]: xa_interior + sigmoid(gate) * tanh(filt).
    """
    pc = xa.shape[-1]
    ya = _leaky(xa)
    # conv over [out_len + 2*pad_y] rows (pad_y extra rows each side; the LVC
    # taps use 1 of them): output row r (relative, r in
    # [-pad_y, out_len+pad_y)) reads ya[E + r + q]
    y2 = None
    for qi, q in enumerate(qs):
        contrib = jnp.dot(
            ya[E - pad_y + q : E - pad_y + q + out_len + 2 * pad_y],
            mq_at(qi),
            preferred_element_type=jnp.float32,
        )
        y2 = contrib if y2 is None else y2 + contrib
    y2 = _leaky(y2 + cb_row)
    # y2: [out_len+2*pad_y, P*C] packed conv output covering relative rows
    # [-pad_y, out_len+pad_y). Build the three PACKED time-shifted operands
    # via lane roll + group select (Mosaic cannot reshape
    # [S, 128] -> [S*P, C] nor concat lane-slices with mismatched offsets,
    # so the LVC runs in packed layout against block-diagonal kernels).
    # The where() operand ORDER matters: Mosaic gives the select the layout
    # of its first vector operand, so the offset-0-aligned slice (origin
    # pad_y, a sublane multiple) comes first to keep minus/base/plus
    # concat-compatible.
    gidx = jax.lax.broadcasted_iota(jnp.int32, (out_len, pc), 1) // cin
    base = y2[pad_y : pad_y + out_len]
    rolled_r = pltpu.roll(y2, cin, 1)  # row r: [g_{P-1}(r), g_0(r)..]
    minus = jnp.where(
        gidx != 0,
        rolled_r[pad_y : pad_y + out_len],
        rolled_r[pad_y - 1 : pad_y - 1 + out_len],
    )
    rolled_l = pltpu.roll(y2, pc - cin, 1)  # row r: [g_1(r).., g_0(r)]
    plus = jnp.where(
        gidx != p - 1,
        rolled_l[pad_y : pad_y + out_len],
        rolled_l[pad_y + 1 : pad_y + 1 + out_len],
    )
    # the LVC zero-pads at the SEQUENCE ends (reference unfold semantics):
    # time -1 / time T taps are zero, not the conv-of-padding (whose bias
    # makes it nonzero)
    gr = gr0 + jax.lax.broadcasted_iota(jnp.int32, (out_len, pc), 0)
    minus = jnp.where((gr == 0) & (gidx == 0), 0.0, minus)
    plus = jnp.where(
        (gr == s_rows - 1) & (gidx == p - 1), 0.0, plus
    )
    taps = (minus, base, plus)
    if not merged_lvc:
        # per-tap fallback (profiler A/B; merged is the production path):
        # one [M, PC] @ [PC, PC] dot per (tap, gate|filt)
        bd_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (pc, pc), 0) // cin
            == jax.lax.broadcasted_iota(jnp.int32, (pc, pc), 1) // cin
        ).astype(jnp.float32)
        ys = []
        for km, lb, r_start, r_len in windows:
            km_g = km[:, :cin]
            km_f = pltpu.roll(km, cin, 1)[:, :cin]  # filt half to offset 0

            def bd_of(kpart, d):
                return bd_mask * pltpu.repeat(
                    pltpu.repeat(kpart[d * cin : (d + 1) * cin], p, 0), p, 1
                )  # [PC, PC]

            lb2 = lb[None, :]  # [1, 2C]
            lbg = pltpu.repeat(lb2[:, :cin], p, 1)
            lbf = pltpu.repeat(pltpu.roll(lb2, cin, 1)[:, :cin], p, 1)
            acc_g = None
            acc_f = None
            for d in range(3):
                xw = taps[d][r_start : r_start + r_len]
                gd = jnp.dot(xw, bd_of(km_g, d),
                             preferred_element_type=jnp.float32)
                fd = jnp.dot(xw, bd_of(km_f, d),
                             preferred_element_type=jnp.float32)
                acc_g = gd if acc_g is None else acc_g + gd
                acc_f = fd if acc_f is None else acc_f + fd
            ys.append(jax.nn.sigmoid(acc_g + lbg) * jnp.tanh(acc_f + lbf))
        z = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=0)
        return xa[E : E + out_len] + z
    # lane-stack the three taps once and merge the six per-window
    # [M, PC] @ [PC, PC] dots into ONE [M, 3PC] @ [3PC, 2PC] GEMM (gate and
    # filter side by side) — the per-window M is small, so amortising the
    # dot setup over K=3PC, N=2PC is the lever the per-tap loop leaves on
    # the table. All concats here are tile-aligned (full [*, PC] values /
    # PC lane offsets).
    stacked = jnp.concatenate((minus, base, plus), axis=1)  # [out_len, 3*PC]
    # Loop-invariant INTERLEAVED BD mask. The merged BD lives in the layout
    # the lane-repeat of km produces for free: row d*PC + g*C+ci, col
    # q*2C + j (per-group gate|filt pairs, NOT gate-half/filt-half) — so
    # each window's BD costs 3 row-repeats + 1 lane-repeat + 1 mask multiply
    # instead of 6 slice/repeat/repeat/mask chains (the static-BD diagnostic
    # put ~44% of the kernel in that construction). The outputs are
    # de-interleaved ONCE after the window loop.
    r_g = (
        jax.lax.broadcasted_iota(jnp.int32, (3 * pc, 2 * pc), 0) % pc // cin
    )
    c_q = jax.lax.broadcasted_iota(jnp.int32, (3 * pc, 2 * pc), 1) // (
        2 * cin
    )
    mask3 = (r_g == c_q).astype(jnp.float32)
    static_bd = [None]
    ys = []
    for km, lb, r_start, r_len in windows:
        if _DIAG_STATIC_BD and static_bd[0] is not None:
            bd = static_bd[0]
        else:
            rowrep = jnp.concatenate(
                [
                    pltpu.repeat(km[d * cin : (d + 1) * cin], p, 0)
                    for d in range(3)
                ],
                axis=0,
            )  # [3PC, 2C]
            bd = mask3 * pltpu.repeat(rowrep, p, 1)  # [3PC, 2PC]
            static_bd[0] = bd
        y = jnp.dot(
            stacked[r_start : r_start + r_len], bd,
            preferred_element_type=jnp.float32,
        )  # [r_len, 2PC] interleaved
        ys.append(y + pltpu.repeat(lb[None, :], p, 1))
    # de-interleave gate/filt once: gate[r, g*C+ci] = ybuf[r, g*2C+ci],
    # filt[r, g*C+ci] = ybuf[r, g*2C+C+ci] — built from left-rolled copies
    # selected per lane group.
    ybuf = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (out_len, pc), 1) // cin

    def deinterleave(off):
        out = None
        for q in range(p):
            shift = q * cin + off
            src = ybuf if shift == 0 else pltpu.roll(ybuf, 2 * pc - shift, 1)
            v = src[:, :pc]
            out = v if out is None else jnp.where(grp == q, v, out)
        return out

    gate = deinterleave(0)
    filt = deinterleave(cin)
    z = jax.nn.sigmoid(gate) * jnp.tanh(filt)  # [out_len, P*C]
    return xa[E : E + out_len] + z


def layer_halo(dilation: int, p: int, merged_lvc: bool = True) -> int:
    """Upper bound on the halo rows ublock_layer_packed needs for this
    (dilation, p, merged) — callers chaining layers with padded I/O size
    their shared pad as max(layer_halo(...)) over the chain. The kernel
    asserts its exact halo never exceeds this bound."""
    pad_y = 8 if merged_lvc else 1
    qmax = -(-dilation // p)  # ceil(d/p): max row reach of the k=3 conv taps
    return (max(qmax + pad_y, 1) + 7) // 8 * 8


def ublock_layer_packed(
    xp: jnp.ndarray,
    adp: jnp.ndarray,
    conv_kernel: jnp.ndarray,
    conv_bias: jnp.ndarray,
    kmat: jnp.ndarray,
    lvc_bias: jnp.ndarray,
    dilation: int,
    hop: int,
    wpb: int | None = None,
    merged_lvc: bool = True,
    interpret: bool = False,
    in_halo: int = 0,
    out_halo: int = 0,
    step_idx: jnp.ndarray | None = None,
    layer_idx: int = 0,
) -> jnp.ndarray:
    """One fused UBlock layer.

    Args:
      xp, adp: [B, S, P*C] packed trunk + packed audio_down (same rate).
      conv_kernel: [3, C, C] (lax WIO); conv_bias: [C].
      kmat: [B, L, 3C, 2C] per-window LVC kernels (GEMM-ready tap-major);
      lvc_bias: [B, L, 2C]. S * P == L * hop.
      step_idx: optional traced int32 scalar. When given, kmat is the WHOLE
        block's hoisted stack [N, B, L, layers*3C, 2C] and lvc_bias this
        layer's [N, B, L, 2C] (see
        :func:`~prodiff_tpu.models.fastdiff.fastdiff_step_kernels`); the
        kernel reads (step ``step_idx``, layer ``layer_idx``)'s windows
        DIRECTLY from the stacked HBM buffer via scalar-prefetch + static
        dim-3 block indexing. This is the zero-copy consumption path for
        hoisted kernels: slicing the step or the layer OUTSIDE the kernel
        makes XLA stage the ~100 MB stack through extra layout copies
        (HLO-census-backed ~2.5 ms of a 10 ms 4-step e2e).
      layer_idx: which layer's rows of the stepped stack to read (static;
        ignored when step_idx is None).
      dilation: conv dilation (3^i).
      hop: LVC window length in samples (multiple of P).
      wpb: windows per grid block (auto if None).
      in_halo / out_halo: padded-chain I/O. ``in_halo > 0`` means xp/adp are
        ALREADY zero-padded with that many rows each side ([B, S+2*in_halo,
        P*C]) — the kernel skips its own jnp.pad (a full-tensor HBM copy per
        layer on a traffic-bound kernel). ``out_halo > 0`` emits the output
        in the same padded form with the halo rows zeroed, ready to feed the
        next layer's ``in_halo``. Both must be multiples of 8 and >=
        :func:`layer_halo` of this layer. S above is always the LOGICAL
        (unpadded) length.

    Returns [B, S, P*C] (or [B, S + 2*out_halo, P*C] when out_halo > 0):
    the next layer's x.
    """
    b, s, pc = xp.shape
    if in_halo:
        assert in_halo % 8 == 0, in_halo
        s -= 2 * in_halo
        assert adp.shape[1] == s + 2 * in_halo, (adp.shape, s, in_halo)
    stepped = step_idx is not None
    if stepped:
        _, _, L, kcl, c2 = kmat.shape
        assert lvc_bias.ndim == 4, lvc_bias.shape
        cin = c2 // 2
        kc = 3 * cin
        assert kcl % kc == 0 and 0 <= layer_idx < kcl // kc, (
            kmat.shape, layer_idx)
    else:
        _, L, kc, c2 = kmat.shape
    cin = kc // 3
    p = pc // cin
    cout = c2  # = 2*cin
    assert s * p == L * hop, (s, p, L, hop)
    assert hop % p == 0, (hop, p)
    rows_per_window = hop // p

    if wpb is None:
        # target ~256-512 rows per grid step, but bound the unrolled
        # per-window loop (each unrolled window keeps its BD tiles live in
        # scoped VMEM — 256 windows blew the 16M limit)
        wpb = max(1, min(L, 512 // max(1, rows_per_window), 16))
    while L % wpb:
        wpb -= 1
    # the per-block row DMA must stay 8-sublane aligned (same hard
    # requirement the halo rounding documents below: misaligned row copies
    # faulted the TPU worker). wpb must divide L AND keep rows a multiple
    # of 8; grow it first (fewer, fatter blocks), then shrink.
    def _rows_ok(w):
        return (w * rows_per_window) % 8 == 0

    if not _rows_ok(wpb):
        cand = next(
            (w for w in range(wpb + 1, L + 1) if L % w == 0 and _rows_ok(w)),
            None,
        ) or next(
            (w for w in range(wpb - 1, 0, -1) if L % w == 0 and _rows_ok(w)),
            None,
        )
        if cand is None:
            raise ValueError(
                f"ublock_layer_packed: no windows-per-block divides L={L} "
                f"with an 8-row-aligned block (rows_per_window="
                f"{rows_per_window}); use the XLA LVC path for this shape"
            )
        wpb = cand
    rows = wpb * rows_per_window
    nblk = L // wpb

    mq, qs = conv3_mixing_matrices(conv_kernel, dilation, p)
    nq = len(qs)
    # halo: conv reaches max|q| rows; the LVC taps need 1 more time step which
    # the conv output's own pad_y-row halo covers. Rounded up to the 8-sublane
    # tile so the HBM->VMEM row DMAs stay aligned (non-multiple-of-8 copies
    # faulted the TPU worker).
    # pad_y: extra conv-output rows per side. The merged-LVC path needs the
    # CENTER tap slice of y2 to sit at sublane offset 0 (Mosaic's
    # tpu.concatenate rejects operands at mismatched sublane phases, and
    # where()-normalisation only fixes the rolled side taps), so the center
    # slice origin must be a multiple of 8.
    pad_y = 8 if merged_lvc else 1
    halo = max(max(abs(q) for q in qs) + pad_y, 1)
    halo = (halo + 7) // 8 * 8
    assert halo <= layer_halo(dilation, p, merged_lvc)
    if in_halo:
        # caller already zero-padded (padded-chain mode); DMA offsets below
        # shift by (in_halo - halo) to land on this layer's halo window
        assert in_halo >= halo, (in_halo, halo)
        xpad, adpad = xp, adp
        in_off = in_halo - halo
    else:
        # zero-pad HALO rows at both ends (packed density — cheap); block n
        # then reads padded rows [n*rows, n*rows + rows + 2*halo)
        xpad = jnp.pad(xp, [(0, 0), (halo, halo), (0, 0)])
        adpad = jnp.pad(adp, [(0, 0), (halo, halo), (0, 0)])
        in_off = 0
    if out_halo:
        assert out_halo % 8 == 0, out_halo

    cb_row = jnp.tile(conv_bias, p)[None, :]  # [1, P*C]

    nblk_total = nblk

    def kernel(*args):
        if stepped:
            # leading scalar-prefetch ref (consumed by the BlockSpec
            # index_maps; the body itself never reads it)
            (_step_ref, x_hbm, ad_hbm, mq_ref, cb_ref, km_ref, lb_ref,
             out_ref, xs, ads, sem, *extra) = args
        else:
            (x_hbm, ad_hbm, mq_ref, cb_ref, km_ref, lb_ref, out_ref,
             xs, ads, sem, *extra) = args
        bi = pl.program_id(0)
        n = pl.program_id(1)

        def dma_pair(slot, blk, bb):
            r0 = blk * rows + in_off  # start row in the PADDED array
            return (
                pltpu.make_async_copy(
                    x_hbm.at[bb, pl.ds(r0, rows + 2 * halo)], xs.at[slot],
                    sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    ad_hbm.at[bb, pl.ds(r0, rows + 2 * halo)], ads.at[slot],
                    sem.at[slot, 1],
                ),
            )

        # double-buffered halo DMA: prefetch the next global block (wrapping
        # into the next batch row) while computing this one; slot parity runs
        # on the GLOBAL step counter so odd nblk keeps slots consistent
        g = bi * nblk_total + n

        @pl.when(g == 0)
        def _():
            for cp in dma_pair(0, 0, 0):
                cp.start()

        g1 = g + 1
        nxt_blk = g1 % nblk_total
        nxt_bi = g1 // nblk_total

        @pl.when(g1 < pl.num_programs(0) * nblk_total)
        def _():
            for cp in dma_pair(g1 % 2, nxt_blk, nxt_bi):
                cp.start()

        slot = g % 2
        for cp in dma_pair(slot, n, bi):
            cp.wait()

        if out_halo:
            # manual (double-buffered) output DMA into the halo-padded out:
            # compute writes outs[g%2], the copy started at step g-2 must
            # have drained before that slot is overwritten
            outs, zs, semo, semz = extra
            oslot = g % 2

            def out_copy(cslot, blk, bb):
                return pltpu.make_async_copy(
                    outs.at[cslot],
                    out_ref.at[bb, pl.ds(out_halo + blk * rows, rows)],
                    semo.at[cslot],
                )

            @pl.when(g >= 2)
            def _():
                g2 = g - 2
                out_copy(oslot, g2 % nblk_total, g2 // nblk_total).wait()

        def store(vals, sl=slice(None)):
            if out_halo:
                outs[oslot, sl] = vals
            else:
                out_ref[0, sl] = vals

        xa = xs[slot] + ads[slot]
        windows = []
        for w in range(wpb):
            wk = 0 if _DIAG_STATIC_BD else w  # diag: window 0's kernel always
            # kernels may arrive in bf16 (XLA computes the KernelPredictor
            # convs in bf16 anyway, so a bf16 operand loses no precision
            # while halving the host-side relayout + DMA traffic). Mosaic
            # cannot roll non-32-bit vectors, so the window is converted
            # back to f32 at the VMEM read — the savings are all upstream.
            kmw = km_ref[0, 0, wk] if stepped else km_ref[0, wk]
            lbw = lb_ref[0, 0, wk] if stepped else lb_ref[0, wk]
            windows.append((
                kmw.astype(jnp.float32), lbw,
                w * rows_per_window, rows_per_window,
            ))
        store(_fused_layer_compute(
            xa, halo, rows, lambda qi: mq_ref[qi], qs, cb_ref[0][None, :],
            windows, n * rows, s, cin, p, pad_y, merged_lvc=merged_lvc,
        ))

        if out_halo:
            out_copy(oslot, n, bi).start()
            G = b * nblk_total

            # zero the padded halos once per batch row (tiny copies, waited
            # inline; the slot buffer edges are never read so only the out
            # array's halo rows need it)
            @pl.when(n == 0)
            def _():
                zs[...] = jnp.zeros_like(zs)
                cz = pltpu.make_async_copy(
                    zs, out_ref.at[bi, pl.ds(0, out_halo)], semz
                )
                cz.start()
                cz.wait()

            @pl.when(n == nblk_total - 1)
            def _():
                zs[...] = jnp.zeros_like(zs)
                cz = pltpu.make_async_copy(
                    zs, out_ref.at[bi, pl.ds(out_halo + s, out_halo)], semz
                )
                cz.start()
                cz.wait()

            # drain the outstanding output copies at the very last step
            @pl.when(g == G - 1)
            def _():
                out_copy(oslot, n, bi).wait()

            if G >= 2:

                @pl.when(g == G - 1)
                def _():
                    gp = g - 1
                    out_copy(gp % 2, gp % nblk_total, gp // nblk_total).wait()

    grid = (b, nblk)
    scratch_shapes = [
        pltpu.VMEM((2, rows + 2 * halo, pc), jnp.float32),
        pltpu.VMEM((2, rows + 2 * halo, pc), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2)),
    ] + (
        [
            pltpu.VMEM((2, rows, pc), jnp.float32),
            pltpu.VMEM((out_halo, pc), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ]
        if out_halo
        else []
    )
    cost = pl.CostEstimate(
        flops=2 * b * s * pc * nq * pc + 2 * b * L * hop * kc * c2,
        bytes_accessed=4 * b * (3 * s * pc + L * kc * c2),
        transcendentals=2 * b * s * pc,
    )
    out_shape = jax.ShapeDtypeStruct((b, s + 2 * out_halo, pc), jnp.float32)

    if stepped:
        # hoisted kernels: index_maps take the prefetched step scalar as a
        # trailing arg; the km/lb blocks then come straight from the
        # [N, B, L, ...] stacks with no XLA-side step OR layer slice (the
        # layer is a static dim-3 block index into the whole-block stack —
        # kc = 3C rows per layer, sublane-aligned since 3C % 8 == 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((nq, pc, pc), lambda bi, n, si: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, pc), lambda bi, n, si: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, wpb, kc, c2),
                             lambda bi, n, si: (si[0], bi, n, layer_idx, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, wpb, c2),
                             lambda bi, n, si: (si[0], bi, n, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY)
                if out_halo
                else pl.BlockSpec((1, rows, pc), lambda bi, n, si: (bi, n, 0),
                                  memory_space=pltpu.VMEM)
            ),
            scratch_shapes=scratch_shapes,
        )
        step_arr = jnp.asarray(step_idx, jnp.int32).reshape(1)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(step_arr, xpad, adpad, mq, cb_row, kmat, lvc_bias)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # packed trunk + audio_down stay in HBM; the kernel DMAs each
            # block's rows (+halo) itself — overlapping halo windows are not
            # expressible as BlockSpec blocks
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((nq, pc, pc), lambda bi, n: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pc), lambda bi, n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wpb, kc, c2), lambda bi, n: (bi, n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wpb, c2), lambda bi, n: (bi, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY)
            if out_halo
            else pl.BlockSpec((1, rows, pc), lambda bi, n: (bi, n, 0),
                              memory_space=pltpu.VMEM)
        ),
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        cost_estimate=cost,
        interpret=interpret,
    )(xpad, adpad, mq, cb_row, kmat, lvc_bias)


def ublock_block_packed(
    xp: jnp.ndarray,
    adp: jnp.ndarray,
    conv_kernels,
    conv_biases,
    kmats,
    lvc_biases,
    dilations,
    hop: int,
    wpb: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """ALL layers of one TimeAwareLVCBlock in a single pallas_call.

    The per-layer kernel round-trips x (+ audio_down) through HBM between
    layers — ~48 MB/layer of pure activation traffic at final-block scale on
    a traffic-bound kernel. Here each grid block keeps x in VMEM across the
    whole layer chain, recomputing a shrinking halo margin per layer
    (resblock.py's halo-growth pattern) so inter-layer activations never
    leave the chip: HBM traffic drops to x + audio_down in, kernels in
    (+ ~(2*wm/wpb) window overlap), x out — once per BLOCK instead of once
    per layer.

    Margins: layer l consumes its input over the out region +- E_l rows,
    E_l = align8(max|q_l| + pad_y); cumulative A_l = sum_{j>=l} E_j. The
    block DMAs rows +- A_0 and each layer's valid window shrinks by E_l.
    Out-of-sequence margin rows are re-zeroed after every layer (the pad
    semantics the per-layer kernel gets from its host jnp.pad); LVC windows
    overlapping the margins use their true per-window kernels, DMA'd with
    wm = ceil(A_1 / rows_per_window) extra windows each side (clamped index
    at sequence ends — those windows' rows are entirely outside [0, S) and
    get masked).

    Args:
      xp, adp: [B, S, P*C] packed trunk + audio_down (UNPADDED).
      conv_kernels / conv_biases / kmats / lvc_biases: per-layer lists
        ([3,C,C], [C], [B,L,3C,2C], [B,L,2C]).
      dilations: per-layer conv dilations.
      hop: LVC window length in samples; hop/P must be a multiple of 8.

    Returns [B, S, P*C].
    """
    n_lay = len(conv_kernels)
    b, s, pc = xp.shape
    _, L, kc, c2 = kmats[0].shape
    cin = kc // 3
    p = pc // cin
    assert s * p == L * hop, (s, p, L, hop)
    assert hop % p == 0, (hop, p)
    rpw = hop // p
    assert rpw % 8 == 0, (
        f"ublock_block_packed needs hop/P % 8 == 0 (got {rpw}); "
        "use per-layer kernels for smaller hops"
    )
    # Mosaic requires manually-DMA'd slices to be 128-lane aligned, and the
    # per-layer kmat trailing dim is 2C = 64: a [.., kc, 64] window DMA fails
    # to lower ("slice shape along dimension 3 must be aligned to tiling").
    # Adjacent layers' kmats are therefore lane-CONCATENATED pairwise into
    # [B, L, kc, 2*c2] buffers (XLA fuses the concat into the same flat-KP
    # relayout that already materialises the per-layer kmats — same bytes),
    # DMA'd per pair, and split in-kernel with the roll-then-slice-at-0
    # idiom (offset lane slices and bf16 rolls are not supported, so the
    # split happens after the f32 convert).
    assert (2 * c2) % 128 == 0, (
        f"ublock_block_packed needs 2*c2 % 128 == 0 (got c2={c2}); "
        "mono_block_supported gates this"
    )
    n_pair = (n_lay + 1) // 2
    km_pairs = []
    for i in range(n_pair):
        lo = kmats[2 * i]
        hi = (
            kmats[2 * i + 1]
            if 2 * i + 1 < n_lay
            else jnp.zeros_like(kmats[2 * i])
        )
        km_pairs.append(jnp.concatenate([lo, hi], axis=-1))
    pad_y = 8

    mqs, qss = [], []
    for ck, d in zip(conv_kernels, dilations):
        mq, qs = conv3_mixing_matrices(ck, d, p)
        mqs.append(mq)
        qss.append(qs)
    # per-layer margins, accumulated back-to-front
    E = [
        (max(max(abs(q) for q in qs) + pad_y, 1) + 7) // 8 * 8 for qs in qss
    ]
    A = [0] * (n_lay + 1)
    for l in range(n_lay - 1, -1, -1):
        A[l] = A[l + 1] + E[l]
    a0 = A[0]

    wm = -(-A[1] // rpw) if n_lay > 1 else -(-A[0] // rpw)
    if wpb is None:
        # the km window buffer (wpb + 2*wm) must fit inside L
        wpb = max(1, min(L - 2 * wm, 512 // max(1, rpw), 16))
    while wpb > 1 and (L % wpb or (wpb * rpw) % 8):
        wpb -= 1
    assert wpb >= 1 and L % wpb == 0 and (wpb * rpw) % 8 == 0, (L, rpw, wpb)
    rows = wpb * rpw
    nblk = L // wpb
    bufw = wpb + 2 * wm
    assert L >= bufw, (
        f"sequence too short for the mono block kernel ({L} mel windows < "
        f"{bufw}); use per-layer kernels (mono_block_supported gates this)"
    )

    xpad = jnp.pad(xp, [(0, 0), (a0, a0), (0, 0)])
    adpad = jnp.pad(adp, [(0, 0), (a0, a0), (0, 0)])
    mq_all = jnp.concatenate(mqs, axis=0)  # [sum_nq, pc, pc]
    mq_off = [0]
    for mq in mqs:
        mq_off.append(mq_off[-1] + mq.shape[0])
    cb_rows = jnp.stack([jnp.tile(cb, p) for cb in conv_biases])  # [n_lay,pc]

    ext = rows + 2 * a0

    def kernel(x_hbm, ad_hbm, mq_ref, cb_ref, *rest):
        km_hbm = rest[:n_pair]
        lb_refs = rest[n_pair : n_pair + n_lay]
        out_ref = rest[n_pair + n_lay]
        xs, ads, kms, asem, ksem = rest[n_pair + n_lay + 1 :]
        bi = pl.program_id(0)
        n = pl.program_id(1)
        g = bi * nblk + n

        def km_start(blk):
            raw = blk * wpb - wm
            return jnp.clip(raw, 0, L - bufw)

        def dmas(slot, blk, bb):
            r0 = blk * rows
            cps = [
                pltpu.make_async_copy(
                    x_hbm.at[bb, pl.ds(r0, ext)], xs.at[slot],
                    asem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    ad_hbm.at[bb, pl.ds(r0, ext)], ads.at[slot],
                    asem.at[slot, 1],
                ),
            ]
            st = km_start(blk)
            for i in range(n_pair):
                cps.append(
                    pltpu.make_async_copy(
                        km_hbm[i].at[bb, pl.ds(st, bufw)],
                        kms.at[slot, i],
                        ksem.at[slot, i],
                    )
                )
            return cps

        @pl.when(g == 0)
        def _():
            for cp in dmas(0, 0, 0):
                cp.start()

        g1 = g + 1
        total = b * nblk

        @pl.when(g1 < total)
        def _():
            for cp in dmas(g1 % 2, g1 % nblk, g1 // nblk):
                cp.start()

        slot = g % 2
        for cp in dmas(slot, n, bi):
            cp.wait()

        delta = n * wpb - wm - km_start(n)  # >0 only at sequence ends
        cur = xs[slot]  # [ext, pc]; row r is global row n*rows - a0 + r
        for l in range(n_lay):
            a_in, a_out = A[l], A[l + 1]
            out_len = rows + 2 * a_out
            lo = a0 - a_in
            # cur covers the out region +- a_in exactly (layer l-1 emitted
            # rows + 2*A[l]); audio_down sliced to the same region
            xa = cur + ads[slot][lo : lo + rows + 2 * a_in]
            gr0 = n * rows - a_out

            windows = []
            k_lo = -(-a_out // rpw)
            k_hi = -(-(rows + a_out) // rpw) - 1
            for k in range(-k_lo, k_hi + 1):
                r_start = max(k * rpw + a_out, 0)
                r_end = min((k + 1) * rpw + a_out, out_len)
                idx = jnp.clip(k + wm + delta, 0, bufw - 1)
                pair = kms[slot, l // 2, idx].astype(jnp.float32)
                km = (
                    pair[:, :c2]
                    if l % 2 == 0
                    else pltpu.roll(pair, c2, 1)[:, :c2]
                )
                lb = lb_refs[l][0, jnp.clip(n * wpb + k, 0, L - 1)]
                windows.append((km, lb, r_start, r_end - r_start))

            out = _fused_layer_compute(
                xa, a_in - a_out, out_len,
                lambda qi, _l=l: mq_ref[mq_off[_l] + qi],
                qss[l], cb_ref[l][None, :], windows, gr0, s, cin, p, pad_y,
            )
            if l < n_lay - 1:
                # re-zero out-of-sequence margin rows: the next layer's conv
                # must see the pad semantics the per-layer kernel gets from
                # its host jnp.pad
                grm = gr0 + jax.lax.broadcasted_iota(
                    jnp.int32, (out_len, pc), 0
                )
                out = jnp.where((grm >= 0) & (grm < s), out, 0.0)
            cur = out
        out_ref[0] = cur  # A[n_lay] == 0 -> exactly [rows, pc]

    grid = (b, nblk)
    total_nq = mq_all.shape[0]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((total_nq, pc, pc), lambda bi, n: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_lay, pc), lambda bi, n: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_pair)]
        + [
            pl.BlockSpec((1, L, c2), lambda bi, n: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_lay)
        ],
        out_specs=pl.BlockSpec((1, rows, pc), lambda bi, n: (bi, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, pc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ext, pc), jnp.float32),
            pltpu.VMEM((2, ext, pc), jnp.float32),
            pltpu.VMEM((2, n_pair, bufw, kc, 2 * c2), kmats[0].dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, n_pair)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_lay * (s + 2 * a0) * pc * 3 * pc
            + 2 * b * n_lay * L * hop * kc * c2,
            bytes_accessed=4 * b * (3 * s * pc + n_lay * L * kc * c2),
            transcendentals=2 * b * n_lay * s * pc,
        ),
        interpret=interpret,
    )(xpad, adpad, mq_all, cb_rows, *km_pairs, *lvc_biases)


def mono_block_supported(
    L: int, hop: int, p: int, n_lay: int = 4, cin: int = 32
) -> bool:
    """Static gate for ublock_block_packed: hop/P must be sublane-aligned,
    the kmat lane pairs 128-aligned (2*2C % 128), and the sequence long
    enough to hold one window buffer (same arithmetic as the kernel's
    pickers)."""
    if (4 * cin) % 128:
        return False
    if hop % p or (hop // p) % 8:
        return False
    rpw = hop // p
    # margins: dilations 3^i with pad_y=8 all round to E=16 for p=4; compute
    # generically from the conv tap reach bound (matches the kernel's E/A)
    a1 = sum(
        (max(-(-(3 ** i) // p) + 8, 1) + 7) // 8 * 8 for i in range(1, n_lay)
    )
    wm = -(-a1 // rpw)
    wpb = max(1, min(L - 2 * wm, 512 // max(1, rpw), 16))
    while wpb > 1 and (L % wpb or (wpb * rpw) % 8):
        wpb -= 1
    if L % wpb or (wpb * rpw) % 8:
        return False
    return L >= wpb + 2 * wm
