"""Fused WaveNet residual stack as a Pallas TPU kernel.

The 20-layer gated dilated-conv loop is the acoustic hot loop (SURVEY §3.1).
The XLA path round-trips x/skip activations through HBM between layers; this
kernel walks the layer dimension on the pallas grid (sequential on TPU),
keeping the residual carry and skip accumulator in VMEM scratch for the whole
stack and streaming only the per-layer weights from HBM.

Scope: dilation_cycle_length == 1 (the base-config setting —
``handler/base_config.yaml:209``), i.e. every layer uses dilation 1, so the
k=3 conv is three shifted [T, C] x [C, 2C] matmuls on the MXU.

The kernel consumes weights stacked over the layer dim; ``stack_wavenet_params``
converts a linen WaveNet param tree. ``wavenet_apply_pallas`` mirrors the full
``models.wavenet.WaveNet`` forward (input/skip/output projections run as plain
XLA — they are single matmuls).

Measured on TPU v5e (reference scale T=512, C=256, L=20, f32): 1.16x over the
XLA path at T<=512 (one VMEM-resident stack). For longer T the stack runs over
halo-tiled windows on the pallas grid (tiles major, layers minor — exact, see
``fused_residual_stack_tiled``); the 12.5% halo recompute still costs the gain
there (0.92x at T=1536), so XLA remains the default path and this kernel is
opt-in for short-segment serving. Remaining idea: bf16 weight streaming.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prodiff_tpu.models.common import SinusoidalPosEmb, mish
from prodiff_tpu.ops.pallas import dot_precision

RSQRT2 = 2.0 ** -0.5


class StackedWaveNet(NamedTuple):
    """Per-layer weights stacked on axis 0. C = residual channels, H = cond."""

    dilated_w: jax.Array  # [L, 3, C, 2C]
    dilated_b: jax.Array  # [L, 1, 2C]
    diff_w: jax.Array  # [L, C, C]
    diff_b: jax.Array  # [L, 1, C]
    cond_w: jax.Array  # [L, H, 2C]
    cond_b: jax.Array  # [L, 1, 2C]
    out_w: jax.Array  # [L, C, 2C]
    out_b: jax.Array  # [L, 1, 2C]
    # stem + head
    in_w: jax.Array  # [1(M? k=1), M, C] conv1x1 kernel [1, M, C]
    in_b: jax.Array  # [C]
    mlp0_w: jax.Array  # [C, 4C]
    mlp0_b: jax.Array  # [4C]
    mlp1_w: jax.Array  # [4C, C]
    mlp1_b: jax.Array  # [C]
    skip_w: jax.Array  # [1, C, C]
    skip_b: jax.Array  # [C]
    outp_w: jax.Array  # [1, C, M]
    outp_b: jax.Array  # [M]


def stack_wavenet_params(
    params: Dict[str, Any], n_layers: int, stream_dtype: jnp.dtype = jnp.float32
) -> StackedWaveNet:
    """linen WaveNet param tree (``models/wavenet.py`` names) -> stacked arrays.

    ``stream_dtype=bfloat16`` halves the per-layer weight traffic the kernel
    streams from HBM (the long-T bottleneck: with T-tiling every tile refetches
    the whole stack) and feeds the MXU its native bf16; accumulation and the
    residual/skip carries stay f32. Biases stay f32 (added post-accumulation).
    """
    p = params["params"] if "params" in params else params

    def layer(i):
        return p[f"layers_{i}"]

    w = _stack_raw(p, layer, n_layers)
    if stream_dtype == jnp.float32:
        return w
    return w._replace(
        dilated_w=w.dilated_w.astype(stream_dtype),
        diff_w=w.diff_w.astype(stream_dtype),
        cond_w=w.cond_w.astype(stream_dtype),
        out_w=w.out_w.astype(stream_dtype),
    )


def _stack_raw(p, layer, n_layers: int) -> StackedWaveNet:
    return StackedWaveNet(
        dilated_w=jnp.stack([layer(i)["dilated_conv"]["kernel"] for i in range(n_layers)]),
        dilated_b=jnp.stack([layer(i)["dilated_conv"]["bias"][None] for i in range(n_layers)]),
        diff_w=jnp.stack(
            [layer(i)["diffusion_projection"]["Dense_0"]["kernel"] for i in range(n_layers)]
        ),
        diff_b=jnp.stack(
            [layer(i)["diffusion_projection"]["Dense_0"]["bias"][None] for i in range(n_layers)]
        ),
        cond_w=jnp.stack(
            [p[f"layers_{i}_conditioner_projection"]["kernel"][0] for i in range(n_layers)]
        ),
        cond_b=jnp.stack(
            [p[f"layers_{i}_conditioner_projection"]["bias"][None] for i in range(n_layers)]
        ),
        out_w=jnp.stack([layer(i)["output_projection"]["kernel"][0] for i in range(n_layers)]),
        out_b=jnp.stack([layer(i)["output_projection"]["bias"][None] for i in range(n_layers)]),
        in_w=p["input_projection"]["kernel"],
        in_b=p["input_projection"]["bias"],
        mlp0_w=p["mlp_0"]["Dense_0"]["kernel"],
        mlp0_b=p["mlp_0"]["Dense_0"]["bias"],
        mlp1_w=p["mlp_1"]["Dense_0"]["kernel"],
        mlp1_b=p["mlp_1"]["Dense_0"]["bias"],
        skip_w=p["skip_projection"]["kernel"],
        skip_b=p["skip_projection"]["bias"],
        outp_w=p["output_projection"]["kernel"],
        outp_b=p["output_projection"]["bias"],
    )


def _wavenet_layer_step(x_scr, skip_scr, step_v, mask_v, cond_v, dw, db,
                        diffw, diffb, condw, condb, outw, outb, c, t_len,
                        save_x=None, save_z=None):
    """One residual layer's body on VMEM-resident values — shared by the
    inference kernels here and the training save-forward kernel
    (ops/pallas/wavenet_train.py), so the layer math exists once.

    Reads x from / writes x and the skip accumulator back to the scratch
    refs. ``save_x``/``save_z`` are the training forward's residual hooks
    (called with the pre-step-proj x and the post-cond z)."""
    x = x_scr[:]
    cdt = dw.dtype  # MXU stream/compute dtype (f32 or bf16)
    # bf16 streams pin Precision.DEFAULT (numerics unchanged — Mosaic's
    # default contract precision is single-pass bf16 — but a global
    # "highest" pin would crash on bf16 operands); f32 inherits the config
    prec = dot_precision(dw)
    if save_x is not None:
        save_x(x)
    # y = x + diffusion step projection (broadcast over T)
    step_proj = (
        jnp.dot(step_v.astype(cdt), diffw, preferred_element_type=jnp.float32,
                precision=prec)
        + diffb
    )  # [1, C]
    y = ((x + step_proj) * mask_v).astype(cdt)

    # k=3, dilation=1 conv as three shifted matmuls
    z = jnp.dot(y, dw[1], preferred_element_type=jnp.float32, precision=prec)
    y_prev = jnp.concatenate([jnp.zeros_like(y[:1]), y[: t_len - 1]], axis=0)
    y_next = jnp.concatenate([y[1:], jnp.zeros_like(y[:1])], axis=0)
    z += jnp.dot(y_prev, dw[0], preferred_element_type=jnp.float32,
                 precision=prec)
    z += jnp.dot(y_next, dw[2], preferred_element_type=jnp.float32,
                 precision=prec)
    z += db
    z += (
        jnp.dot(cond_v.astype(cdt), condw, preferred_element_type=jnp.float32,
                precision=prec)
        + condb
    )
    if save_z is not None:
        save_z(z)

    gate = jax.nn.sigmoid(z[:, :c]) * jnp.tanh(z[:, c:])
    o = (
        jnp.dot(gate.astype(cdt), outw, preferred_element_type=jnp.float32,
                precision=prec)
        + outb
    )  # [T, 2C]
    x_scr[:] = (x + o[:, :c]) * RSQRT2
    skip_scr[:] = skip_scr[:] + o[:, c:]


def fused_residual_stack(
    x0: jax.Array,  # [T, C]
    cond: jax.Array,  # [T, H]
    step_emb: jax.Array,  # [1, C]
    w: StackedWaveNet,
    mask: jax.Array | None = None,  # [T, 1]; 0-frames behave as conv zero-pad
) -> jax.Array:
    """Run all residual layers in one pallas_call; returns normalised skip sum [T, C].

    ``mask`` marks valid frames: masked positions are zeroed before every
    layer's conv, which makes them semantically identical to the conv's own
    zero padding (needed for exact halo tiling — bias/step terms would
    otherwise make pad frames non-zero and leak into their neighbours).
    """
    n_layers, _, c, c2 = w.dilated_w.shape
    t, h = cond.shape
    if mask is None:
        mask = jnp.ones((t, 1), jnp.float32)

    def wspec(*shape):
        # stream layer l's slice; block index over the stacked dim
        return pl.BlockSpec(
            (1, *shape), lambda l: (l, *([0] * len(shape))), memory_space=pltpu.VMEM
        )

    grid = (n_layers,)
    in_specs = [
            pl.BlockSpec((t, c), lambda l: (0, 0), memory_space=pltpu.VMEM),  # x0
            pl.BlockSpec((t, h), lambda l: (0, 0), memory_space=pltpu.VMEM),  # cond
            pl.BlockSpec((1, c), lambda l: (0, 0), memory_space=pltpu.VMEM),  # step
            pl.BlockSpec((t, 1), lambda l: (0, 0), memory_space=pltpu.VMEM),  # mask
            wspec(3, c, c2),
            wspec(1, c2),
            wspec(c, c),
            wspec(1, c),
            wspec(h, c2),
            wspec(1, c2),
            wspec(c, c2),
            wspec(1, c2),
    ]
    out_specs = pl.BlockSpec((t, c), lambda l: (0, 0), memory_space=pltpu.VMEM)

    def kernel(x0_ref, cond_ref, step_ref, mask_ref, dw_ref, db_ref, diffw_ref,
               diffb_ref, condw_ref, condb_ref, outw_ref, outb_ref, skip_out_ref,
               x_scr, skip_scr):
        l = pl.program_id(0)

        @pl.when(l == 0)
        def _():
            x_scr[:] = x0_ref[:]
            skip_scr[:] = jnp.zeros_like(skip_scr)

        _wavenet_layer_step(
            x_scr, skip_scr, step_ref[:], mask_ref[:], cond_ref[:],
            dw_ref[0], db_ref[0], diffw_ref[0], diffb_ref[0], condw_ref[0],
            condb_ref[0], outw_ref[0], outb_ref[0], c, t,
        )

        @pl.when(l == n_layers - 1)
        def _():
            skip_out_ref[:] = skip_scr[:] * (1.0 / math.sqrt(n_layers))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((t, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t, c), jnp.float32),
            pltpu.VMEM((t, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_layers * t * (3 * c * c2 + h * c2 + c * c2),
            bytes_accessed=n_layers * 4 * (3 * c * c2 + h * c2 + c * c2 + c * c),
            transcendentals=n_layers * t * c2,
        ),
    )(
        x0, cond, step_emb, mask,
        w.dilated_w, w.dilated_b, w.diff_w, w.diff_b,
        w.cond_w, w.cond_b, w.out_w, w.out_b,
    )


def fused_residual_stack_tiled(
    x0: jax.Array,  # [T, C]
    cond: jax.Array,  # [T, H]
    step_emb: jax.Array,  # [1, C]
    w: StackedWaveNet,
    tile: int = 512,
    halo: int = 24,
) -> jax.Array:
    """VMEM-bounded variant: overlapping T-tiles with a halo >= n_layers,
    walked as the MAJOR pallas grid dimension (layers minor), so the whole
    long-T stack stays one kernel launch.

    Each layer's k=3/d=1 conv grows the receptive field by one frame, so with
    halo >= L the tile interiors are EXACT — masked frames behave as the
    conv's zero padding (see ``fused_residual_stack``)."""
    n_layers, _, c, c2 = w.dilated_w.shape
    assert halo >= n_layers, f"halo {halo} must cover the receptive field {n_layers}"
    t = x0.shape[0]
    if t <= tile:
        return fused_residual_stack(x0, cond, step_emb, w)
    h = cond.shape[1]
    n_tiles = -(-t // tile)
    t_pad = n_tiles * tile
    # pre-window into overlapping tiles (BlockSpecs cannot overlap)
    x0p = jnp.pad(x0, ((halo, t_pad - t + halo), (0, 0)))
    condp = jnp.pad(cond, ((halo, t_pad - t + halo), (0, 0)))
    maskp = jnp.pad(jnp.ones((t, 1), jnp.float32), ((halo, t_pad - t + halo), (0, 0)))
    wlen = tile + 2 * halo
    idx = jnp.arange(n_tiles)[:, None] * tile + jnp.arange(wlen)[None, :]
    xw = x0p[idx]  # [n_tiles, wlen, C]
    cw = condp[idx]  # [n_tiles, wlen, H]
    mw = maskp[idx]  # [n_tiles, wlen, 1]

    def wspec(*shape):
        return pl.BlockSpec(
            (1, *shape), lambda n, l: (l, *([0] * len(shape))),
            memory_space=pltpu.VMEM,
        )

    def tspec(width):
        return pl.BlockSpec(
            (1, wlen, width), lambda n, l: (n, 0, 0), memory_space=pltpu.VMEM
        )

    def kernel(x0_ref, cond_ref, mask_ref, step_ref, dw_ref, db_ref, diffw_ref,
               diffb_ref, condw_ref, condb_ref, outw_ref, outb_ref,
               skip_out_ref, x_scr, skip_scr):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            x_scr[:] = x0_ref[0]
            skip_scr[:] = jnp.zeros_like(skip_scr)

        _wavenet_layer_step(
            x_scr, skip_scr, step_ref[:], mask_ref[0], cond_ref[0],
            dw_ref[0], db_ref[0], diffw_ref[0], diffb_ref[0], condw_ref[0],
            condb_ref[0], outw_ref[0], outb_ref[0], c, wlen,
        )

        @pl.when(l == n_layers - 1)
        def _():
            skip_out_ref[0] = skip_scr[:] * (1.0 / math.sqrt(n_layers))

    tiles = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_layers),
        in_specs=[
            tspec(c),
            tspec(h),
            tspec(1),
            pl.BlockSpec((1, c), lambda n, l: (0, 0), memory_space=pltpu.VMEM),
            wspec(3, c, c2),
            wspec(1, c2),
            wspec(c, c),
            wspec(1, c),
            wspec(h, c2),
            wspec(1, c2),
            wspec(c, c2),
            wspec(1, c2),
        ],
        out_specs=pl.BlockSpec(
            (1, wlen, c), lambda n, l: (n, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, wlen, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((wlen, c), jnp.float32),
            pltpu.VMEM((wlen, c), jnp.float32),
        ],
    )(
        xw, cw, mw, step_emb,
        w.dilated_w, w.dilated_b, w.diff_w, w.diff_b,
        w.cond_w, w.cond_b, w.out_w, w.out_b,
    )
    return tiles[:, halo : halo + tile].reshape(n_tiles * tile, c)[:t]


def wavenet_apply_pallas(
    w: StackedWaveNet,
    spec: jax.Array,  # [B, T, M]
    diffusion_step: jax.Array,  # [B]
    cond: jax.Array,  # [B, T, H]
    tile: Optional[int] = None,
    halo: int = 24,
    save_dtype: jnp.dtype = jnp.bfloat16,
    train_impl: str = "xla",
) -> jax.Array:
    """Full WaveNet forward with the fused residual stack. Mirrors
    ``models.wavenet.WaveNet.__call__`` exactly; differentiable (see
    ``wavenet_train.residual_stack_train``; ``save_dtype`` sets the precision
    of the per-layer residuals the training fwd streams to HBM).

    ``tile=None`` auto-sizes: run the whole T in one VMEM-resident window when
    it fits (zero halo recompute, weights streamed once — measured 1.27x over
    XLA at B=8/T=1536/bf16 on v5e), fall back to halo tiles beyond. The VMEM
    ceiling depends on the weight stream dtype (f32 stacks are twice as big).
    """
    if tile is None:
        t = spec.shape[1]
        nontiled_max = 2048 if w.dilated_w.dtype == jnp.bfloat16 else 1024
        tile = min(max(t, 512), nontiled_max)
    c = w.in_b.shape[0]
    x = jax.nn.relu(
        jnp.einsum("btm,mc->btc", spec, w.in_w[0], preferred_element_type=jnp.float32)
        + w.in_b
    )
    step = SinusoidalPosEmb(c)(diffusion_step)  # [B, C]
    step = mish(step @ w.mlp0_w + w.mlp0_b) @ w.mlp1_w + w.mlp1_b  # [B, C]

    # the residual stack goes through the custom-VJP wrapper: inference runs
    # the plain fused kernel (the wrapper's primal), training gets the
    # Pallas-chain + XLA-einsum backward (ops/pallas/wavenet_train.py)
    from prodiff_tpu.ops.pallas.wavenet_train import residual_stack_train

    skip = residual_stack_train(
        x, cond, step,
        w.dilated_w, w.dilated_b, w.diff_w, w.diff_b,
        w.cond_w, w.cond_b, w.out_w, w.out_b,
        tile, halo, save_dtype, train_impl,
    )  # [B, T, C]
    out = jax.nn.relu(
        jnp.einsum("btc,cd->btd", skip, w.skip_w[0], preferred_element_type=jnp.float32)
        + w.skip_b
    )
    return (
        jnp.einsum("btc,cm->btm", out, w.outp_w[0], preferred_element_type=jnp.float32)
        + w.outp_b
    )
