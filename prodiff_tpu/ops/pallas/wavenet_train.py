"""Trainable fused WaveNet residual stack: custom VJP over the Pallas kernels.

Design (TPU-first decomposition of the backward pass):

- The *primal* is the inference kernel (``ops/pallas/wavenet.py``) — under
  pure inference JAX never calls the fwd/bwd pair, so sampling pays no
  save-activation cost.
- The *fwd* runs a halo-tiled kernel that additionally streams per-layer
  residuals to HBM: ``xs`` (each layer's input) and ``zs`` (pre-gate
  activations), stored bf16 in the overlapped-window layout.
- The *bwd* splits into (a) a lean Pallas kernel computing ONLY the
  sequential layer-to-layer gradient chain (the part XLA cannot
  parallelise), emitting per-layer ``dy = d(loss)/d(conv input)``, and
  (b) plain batched XLA einsums for every weight/cond/step gradient —
  large parallel contractions the MXU runs at full tilt with no
  sequential dependency.

Halo exactness: each fwd layer (k=3, d=1) consumes one frame of context and
each bwd layer produces one more, so with ``halo >= n_layers + 1`` every
window interior is exact (same argument as the inference tiling,
``ops/pallas/wavenet.py:fused_residual_stack_tiled``).

Replaces the torch reference's autograd through the residual loop
(``modules/decoder/wavenet.py:100-123``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prodiff_tpu.ops.pallas import dot_precision
from prodiff_tpu.ops.pallas.wavenet import (
    RSQRT2,
    _wavenet_layer_step,
    fused_residual_stack_tiled,
)

DEFAULT_TILE = 512
DEFAULT_HALO = 24  # >= n_layers + 1 for the 20-layer reference stack


def _windows(x, n_tiles, tile, halo):
    """[T, D] -> overlapping [n_tiles, tile + 2*halo, D] (zero padded)."""
    t = x.shape[0]
    t_pad = n_tiles * tile
    xp = jnp.pad(x, ((halo, t_pad - t + halo), (0, 0)))
    wlen = tile + 2 * halo
    idx = jnp.arange(n_tiles)[:, None] * tile + jnp.arange(wlen)[None, :]
    return xp[idx]


def _interior(xw, t, tile, halo):
    """[..., n_tiles, wlen, D] -> [..., T, D]."""
    n_tiles = xw.shape[-3]
    inner = xw[..., halo : halo + tile, :]
    flat = inner.reshape(*xw.shape[:-3], n_tiles * tile, xw.shape[-1])
    return flat[..., :t, :]


# ---------------------------------------------------------------------------
# forward with residual saving
# ---------------------------------------------------------------------------


def _fwd_save_single(x0, cond, step, dw, db, diffw, diffb, condw, condb,
                     outw, outb, *, tile, halo, save_dtype):
    """One sequence [T, ...] -> (skip [T, C], xs [L,n,wlen,C], zs [L,n,wlen,2C])."""
    n_layers, _, c, c2 = dw.shape
    t = x0.shape[0]
    h = cond.shape[1]
    n_tiles = -(-t // tile)
    wlen = tile + 2 * halo
    xw = _windows(x0, n_tiles, tile, halo)
    cw = _windows(cond, n_tiles, tile, halo)
    mw = _windows(jnp.ones((t, 1), jnp.float32), n_tiles, tile, halo)

    def wspec(*shape):
        return pl.BlockSpec(
            (1, *shape), lambda n, l: (l, *([0] * len(shape))),
            memory_space=pltpu.VMEM,
        )

    def tspec(width):
        return pl.BlockSpec(
            (1, wlen, width), lambda n, l: (n, 0, 0), memory_space=pltpu.VMEM
        )

    def save_spec(width):
        return pl.BlockSpec(
            (1, 1, wlen, width), lambda n, l: (l, n, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def kernel(x0_ref, cond_ref, mask_ref, step_ref, dw_ref, db_ref, diffw_ref,
               diffb_ref, condw_ref, condb_ref, outw_ref, outb_ref,
               skip_out_ref, xs_ref, zs_ref, x_scr, skip_scr):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            x_scr[:] = x0_ref[0]
            skip_scr[:] = jnp.zeros_like(skip_scr)

        def save_x(x):
            xs_ref[0, 0] = x.astype(xs_ref.dtype)

        def save_z(z):
            zs_ref[0, 0] = z.astype(zs_ref.dtype)

        _wavenet_layer_step(
            x_scr, skip_scr, step_ref[:], mask_ref[0], cond_ref[0],
            dw_ref[0], db_ref[0], diffw_ref[0], diffb_ref[0], condw_ref[0],
            condb_ref[0], outw_ref[0], outb_ref[0], c, wlen,
            save_x=save_x, save_z=save_z,
        )

        @pl.when(l == n_layers - 1)
        def _():
            skip_out_ref[0] = skip_scr[:] * (1.0 / math.sqrt(n_layers))

    skipw, xs, zs = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_layers),
        in_specs=[
            tspec(c), tspec(h), tspec(1),
            pl.BlockSpec((1, c), lambda n, l: (0, 0), memory_space=pltpu.VMEM),
            wspec(3, c, c2), wspec(1, c2), wspec(c, c), wspec(1, c),
            wspec(h, c2), wspec(1, c2), wspec(c, c2), wspec(1, c2),
        ],
        out_specs=(
            pl.BlockSpec((1, wlen, c), lambda n, l: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            save_spec(c),
            save_spec(c2),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, wlen, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, n_tiles, wlen, c), save_dtype),
            jax.ShapeDtypeStruct((n_layers, n_tiles, wlen, c2), save_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((wlen, c), jnp.float32),
            pltpu.VMEM((wlen, c), jnp.float32),
        ],
    )(xw, cw, mw, step[None], dw, db, diffw, diffb, condw, condb, outw, outb)
    skip = _interior(skipw, t, tile, halo)
    return skip, xs, zs


# ---------------------------------------------------------------------------
# backward sequential chain
# ---------------------------------------------------------------------------


def _bwd_chain_single(zs, g, dw, outw, *, t, tile, halo, save_dtype):
    """Per-layer dy (grad at the dilated-conv input) for one sequence.

    zs: [L, n, wlen, 2C] saved pre-gate; g: [T, C] cotangent of the
    normalised skip sum. Walks layers top-down on the grid (tiles major),
    carrying dx in VMEM; everything parallel is left to XLA.
    """
    n_layers = zs.shape[0]
    c = dw.shape[2]
    n_tiles = zs.shape[1]
    wlen = tile + 2 * halo
    gw = _windows(g, n_tiles, tile, halo)
    mw = _windows(jnp.ones((t, 1), jnp.float32), n_tiles, tile, halo)
    inv_sqrt_l = 1.0 / math.sqrt(n_layers)

    def rev_wspec(*shape):
        return pl.BlockSpec(
            (1, *shape), lambda n, l: (n_layers - 1 - l, *([0] * len(shape))),
            memory_space=pltpu.VMEM,
        )

    def kernel(zs_ref, gw_ref, mw_ref, dw_ref, outw_ref, dy_ref, dx_scr):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            dx_scr[:] = jnp.zeros_like(dx_scr)

        z = zs_ref[0, 0].astype(jnp.float32)
        a = jax.nn.sigmoid(z[:, :c])
        tb = jnp.tanh(z[:, c:])
        dwk = dw_ref[0]
        cdt = dwk.dtype
        do = jnp.concatenate(
            [dx_scr[:] * RSQRT2, gw_ref[0] * inv_sqrt_l], axis=-1
        )  # [wlen, 2C] grad at o
        # dgate = do @ outw^T (contract the 2C axis)
        dgate = jax.lax.dot_general(
            do.astype(cdt), outw_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(dwk),
        )  # [wlen, C]
        dz = jnp.concatenate(
            [dgate * tb * a * (1.0 - a), dgate * a * (1.0 - tb * tb)], axis=-1
        ).astype(cdt)  # [wlen, 2C]
        # dy_t = dz_t @ dw1^T + dz_{t+1} @ dw0^T + dz_{t-1} @ dw2^T
        tdot = lambda u, wk: jax.lax.dot_general(
            u, wk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(dwk),
        )
        dy = tdot(dz, dwk[1])
        dz_next = jnp.concatenate([dz[1:], jnp.zeros_like(dz[:1])], axis=0)
        dz_prev = jnp.concatenate([jnp.zeros_like(dz[:1]), dz[: wlen - 1]], axis=0)
        dy += tdot(dz_next, dwk[0]) + tdot(dz_prev, dwk[2])
        dy_ref[0, 0] = dy.astype(dy_ref.dtype)
        dx_scr[:] = dx_scr[:] * RSQRT2 + dy * mw_ref[0]

    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_layers),
        in_specs=[
            pl.BlockSpec((1, 1, wlen, 2 * c),
                         lambda n, l: (n_layers - 1 - l, n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wlen, c), lambda n, l: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wlen, 1), lambda n, l: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            rev_wspec(3, c, 2 * c),
            rev_wspec(c, 2 * c),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, wlen, c), lambda n, l: (n_layers - 1 - l, n, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_layers, n_tiles, wlen, c), save_dtype
        ),
        scratch_shapes=[pltpu.VMEM((wlen, c), jnp.float32)],
    )(zs, gw, mw, dw, outw)


# ---------------------------------------------------------------------------
# custom VJP (batched)
# ---------------------------------------------------------------------------


def _xla_stack(x0, cond, step, dw, db, diffw, diffb, condw, condb, outw, outb):
    """Plain-XLA residual stack, mathematically identical to the fused kernel
    (unrolled layer loop; conv as three shifted matmuls). The default
    TRAINING path: XLA autodiff schedules the per-layer wgrad matmuls fused
    with the chain, which measured FASTER than the hand-built Pallas backward
    (23.2 vs 28.6 ms/step at B=16/T=1536 on v5e) — the stacked [B,L,T,2C]
    intermediates of the einsum stage cost more HBM traffic than the chain
    kernel saves. The Pallas VJP stays available via train_impl='pallas'."""
    n_layers = dw.shape[0]
    c = dw.shape[2]
    # match the kernels' mixed precision: MXU inputs in the weight-stream
    # dtype (bf16 by default), f32 accumulation and f32 residual/skip carries.
    # The k=3 conv stays a real conv_general_dilated (not shifted matmuls):
    # XLA's implicit-GEMM conv avoids materialising the shifted copies.
    cdt = dw.dtype
    ein = functools.partial(jnp.einsum, preferred_element_type=jnp.float32)
    cond_c = cond.astype(cdt)
    x = x0
    skip_sum = jnp.zeros_like(x)
    for l in range(n_layers):
        step_proj = ein("bc,cd->bd", step.astype(cdt), diffw[l]) + diffb[l][0]
        y = (x + step_proj[:, None, :]).astype(cdt)
        # conv in the stream dtype, upcast after: a f32 preferred_element_type
        # with bf16 operands breaks the conv transpose rule (mixed-dtype
        # cotangent); the conv still accumulates f32 internally
        z = jax.lax.conv_general_dilated(
            y, dw[l], (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ).astype(jnp.float32)
        z += db[l][0]
        z += ein("bth,hd->btd", cond_c, condw[l]) + condb[l][0]
        gate = (jax.nn.sigmoid(z[..., :c]) * jnp.tanh(z[..., c:])).astype(cdt)
        o = ein("btc,cd->btd", gate, outw[l]) + outb[l][0]
        x = (x + o[..., :c]) * RSQRT2
        skip_sum = skip_sum + o[..., c:]
    return skip_sum * (1.0 / math.sqrt(n_layers))


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def residual_stack_train(x0, cond, step, dw, db, diffw, diffb, condw, condb,
                         outw, outb, tile=DEFAULT_TILE, halo=DEFAULT_HALO,
                         save_dtype=jnp.bfloat16, train_impl="xla"):
    """Batched fused residual stack [B, T, C] -> normalised skip sum [B, T, C].

    Differentiable: inference (the primal) runs the fused Pallas kernel;
    under autodiff, ``train_impl`` picks the fwd/bwd pair — 'xla' (default,
    measured fastest end-to-end) differentiates the plain-XLA stack, 'pallas'
    uses the save-kernel + sequential-chain-kernel + wgrad-einsum backward.
    """
    return jax.vmap(
        lambda xb, cb, sb: fused_residual_stack_tiled(
            xb, cb, sb[None],
            _as_stacked(dw, db, diffw, diffb, condw, condb, outw, outb),
            tile=tile, halo=halo,
        )
    )(x0, cond, step)


def _as_stacked(dw, db, diffw, diffb, condw, condb, outw, outb):
    from prodiff_tpu.ops.pallas.wavenet import StackedWaveNet

    z = jnp.zeros(())
    return StackedWaveNet(
        dilated_w=dw, dilated_b=db, diff_w=diffw, diff_b=diffb,
        cond_w=condw, cond_b=condb, out_w=outw, out_b=outb,
        in_w=z, in_b=z, mlp0_w=z, mlp0_b=z, mlp1_w=z, mlp1_b=z,
        skip_w=z, skip_b=z, outp_w=z, outp_b=z,
    )


def _train_fwd(x0, cond, step, dw, db, diffw, diffb, condw, condb, outw, outb,
               tile, halo, save_dtype, train_impl):
    if train_impl == "xla":
        out, vjp_fn = jax.vjp(
            _xla_stack, x0, cond, step, dw, db, diffw, diffb, condw, condb,
            outw, outb,
        )
        return out, vjp_fn
    # the save-kernel carries extra VMEM blocks (xs/zs streams), so the train
    # path always halo-tiles at the proven 512 window even when the inference
    # primal ran one big window — tiling is exact, values are identical
    tile = min(tile, DEFAULT_TILE)
    n_layers = dw.shape[0]
    assert halo >= n_layers + 1, (
        f"halo {halo} must cover fwd+bwd receptive field {n_layers + 1}"
    )
    skip, xs, zs = jax.vmap(
        lambda xb, cb, sb: _fwd_save_single(
            xb, cb, sb, dw, db, diffw, diffb, condw, condb, outw, outb,
            tile=tile, halo=halo, save_dtype=save_dtype,
        )
    )(x0, cond, step)
    res = (xs, zs, cond, step, dw, diffw, diffb, condw, outw, x0.shape[1])
    return skip, res


def _train_bwd(tile, halo, save_dtype, train_impl, res, g):
    if train_impl == "xla":
        return res(g)  # res IS the jax.vjp closure
    tile = min(tile, DEFAULT_TILE)  # must mirror _train_fwd's clamp
    xs, zs, cond, step, dw, diffw, diffb, condw, outw, t = res
    n_layers, _, c, c2 = dw.shape

    # (a) sequential chain on the Pallas grid -> per-layer dy windows
    dyw = jax.vmap(
        lambda zb, gb: _bwd_chain_single(
            zb, gb, dw, outw, t=t, tile=tile, halo=halo, save_dtype=save_dtype
        )
    )(zs, g)  # [B, L, n, wlen, C]

    # (b) everything parallel as batched XLA einsums over tile interiors.
    # Stay in the save dtype (bf16) end to end: f32 upcasts here would
    # materialise multi-GB [B, L, T, 2C] intermediates (measured 2x slower
    # than XLA autodiff on v5e); the MXU consumes bf16 natively and every
    # einsum accumulates in f32 via preferred_element_type.
    f32 = jnp.float32
    cdt = save_dtype
    ein = functools.partial(jnp.einsum, preferred_element_type=f32)
    dy = _interior(dyw, t, tile, halo)  # [B, L, T, C] (save dtype)
    xs_i = _interior(xs, t, tile, halo)  # [B, L, T, C]
    zs_i = _interior(zs, t, tile, halo)  # [B, L, T, 2C]
    a = jax.nn.sigmoid(zs_i[..., :c].astype(f32)).astype(cdt)
    tb = jnp.tanh(zs_i[..., c:].astype(f32)).astype(cdt)
    gate = a * tb

    # dx chain: S_j = dy_j + r * S_{j+1}; do_res_j = r * S_{j+1}; dx0 = S_0
    # (carry in f32: 20 accumulation steps)
    def scan_body(carry, dy_j):
        s = dy_j.astype(f32) + RSQRT2 * carry
        return s, carry.astype(cdt)  # emit S_{j+1} (the carry BEFORE this layer)

    dy_l = jnp.moveaxis(dy, 1, 0)  # [L, B, T, C]
    s0, s_next = jax.lax.scan(
        scan_body, jnp.zeros(dy_l.shape[1:], f32), dy_l, reverse=True
    )
    inv_sqrt_l = 1.0 / math.sqrt(n_layers)
    do = jnp.concatenate(
        [jnp.asarray(RSQRT2, cdt) * s_next,
         jnp.broadcast_to((g * inv_sqrt_l).astype(cdt)[None], s_next.shape)],
        axis=-1,
    )  # [L, B, T, 2C]
    do = jnp.moveaxis(do, 0, 1)  # [B, L, T, 2C]
    dgate = ein("bltd,lcd->bltc", do, outw.astype(cdt)).astype(cdt)
    one = jnp.asarray(1.0, cdt)
    dz = jnp.concatenate(
        [dgate * tb * a * (one - a), dgate * a * (one - tb * tb)], axis=-1
    )  # [B, L, T, 2C] (save dtype)

    # y = xs + (step @ diffw + diffb), exactly as the fwd kernel computed it
    step_proj = (
        ein("bc,lcd->bld", step, diffw.astype(f32))
        + diffb.astype(f32)[None, :, 0, :]
    )  # [B, L, C]
    y = xs_i + step_proj[:, :, None, :].astype(cdt)

    y_prev = jnp.pad(y, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]
    y_next = jnp.pad(y, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
    ddw = jnp.stack(
        [
            ein("bltc,bltd->lcd", y_prev, dz),
            ein("bltc,bltd->lcd", y, dz),
            ein("bltc,bltd->lcd", y_next, dz),
        ],
        axis=1,
    )  # [L, 3, C, 2C] f32
    ddb = jnp.sum(dz.astype(f32), axis=(0, 2))[:, None, :]  # [L, 1, 2C]
    dcondw = ein("bth,bltd->lhd", cond.astype(cdt), dz)
    dcondb = ddb
    dcond = ein("bltd,lhd->bth", dz, condw.astype(cdt))
    doutw = ein("bltc,bltd->lcd", gate, do)
    doutb = jnp.sum(do.astype(f32), axis=(0, 2))[:, None, :]
    dstep_proj = jnp.sum(dy.astype(f32), axis=2)  # [B, L, C]
    ddiffw = ein("bc,bld->lcd", step, dstep_proj)
    ddiffb = jnp.sum(dstep_proj, axis=0)[:, None, :]
    dstep = ein("bld,lcd->bc", dstep_proj, diffw.astype(f32))
    dx0 = s0  # the scan's final carry IS S_0 = d(loss)/d(x0)

    dw_dt = dw.dtype
    return (dx0, dcond, dstep,
            ddw.astype(dw_dt), ddb, ddiffw.astype(dw_dt), ddiffb,
            dcondw.astype(dw_dt), dcondb, doutw.astype(dw_dt), doutb)


residual_stack_train.defvjp(_train_fwd, _train_bwd)
