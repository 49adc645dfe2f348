"""Tensor-parallel WaveNet denoiser forward (Megatron-style, GSPMD-native).

The reference scales only by data parallelism (SURVEY §2.9); this is the
TPU-native scale-out beyond it: shard the denoiser's residual channels over a
``model`` mesh axis so one step's activations/FLOPs split across chips, with
XLA inserting exactly one psum per layer (the row-parallel reduce) over ICI.

Per layer (Megatron pattern):
- dilated conv + conditioner projection: COLUMN-parallel — output channels
  (2C) sharded. The [gate; filter] halves of a naively sharded 2C axis land
  on different shards, so the 2C weight columns are permuted once per step to
  the interleaved per-shard layout [g_0 f_0 g_1 f_1 ...]; the gating then
  needs only a local reshape. The permuted gate order concatenates back to
  the ORIGINAL channel order, so the output projection needs no row permute.
- output projection: ROW-parallel — contraction over the sharded gate
  channels; GSPMD emits the psum and the result is replicated for the
  residual/skip accumulation.

Pure jnp on the checkpoint-identical stacked params (``stack_wavenet_params``)
— no param-tree changes, any checkpoint runs tensor-parallel.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from prodiff_tpu.models.common import SinusoidalPosEmb, mish
from prodiff_tpu.ops.pallas.wavenet import RSQRT2, StackedWaveNet


def _tp_perm(c: int, mp: int) -> np.ndarray:
    """2C-column permutation: [gate(C); filt(C)] -> per-shard [g_i; f_i]."""
    s = c // mp
    idx = []
    for i in range(mp):
        idx.extend(range(i * s, (i + 1) * s))
        idx.extend(range(c + i * s, c + (i + 1) * s))
    return np.asarray(idx, np.int32)


def wavenet_apply_tp(
    w: StackedWaveNet,
    spec: jax.Array,  # [B, T, M]
    diffusion_step: jax.Array,  # [B]
    cond: jax.Array,  # [B, T, H]
    tp_axis: str = "model",
    tp_size: int = 1,
    data_axis: str = "data",
) -> jax.Array:
    """Forward identical to ``models.wavenet.WaveNet`` (XLA path), with the
    residual stack tensor-parallel over ``tp_axis``."""
    n_layers, _, c, c2 = w.dilated_w.shape
    b, t, _ = spec.shape
    mp = tp_size
    assert c % mp == 0, f"residual_channels {c} not divisible by tp={mp}"
    s = c // mp
    perm = _tp_perm(c, mp)

    z_spec = P(data_axis, None, tp_axis)
    repl = P(data_axis, None, None)
    cstr = jax.lax.with_sharding_constraint

    x = jax.nn.relu(
        jnp.einsum("btm,mc->btc", spec, w.in_w[0],
                   preferred_element_type=jnp.float32) + w.in_b
    )
    step = SinusoidalPosEmb(c)(diffusion_step)  # [B, C]
    step = mish(step @ w.mlp0_w + w.mlp0_b) @ w.mlp1_w + w.mlp1_b  # [B, C]

    skip_sum = jnp.zeros_like(x)
    for l in range(n_layers):
        step_proj = step @ w.diff_w[l] + w.diff_b[l]  # [B, C]
        y = x + step_proj[:, None, :]
        # column-parallel conv (k=3, d=1) with permuted output channels
        dwp = w.dilated_w[l][:, :, perm]  # [3, C, 2C]
        z = jnp.einsum("btc,cd->btd", y, dwp[1],
                       preferred_element_type=jnp.float32)
        y_prev = jnp.pad(y, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        y_next = jnp.pad(y, ((0, 0), (0, 1), (0, 0)))[:, 1:]
        z += jnp.einsum("btc,cd->btd", y_prev, dwp[0],
                        preferred_element_type=jnp.float32)
        z += jnp.einsum("btc,cd->btd", y_next, dwp[2],
                        preferred_element_type=jnp.float32)
        z += w.dilated_b[l][0][perm]
        z += (
            jnp.einsum("bth,hd->btd", cond, w.cond_w[l][:, perm],
                       preferred_element_type=jnp.float32)
            + w.cond_b[l][0][perm]
        )
        z = cstr(z, z_spec)
        # local gating: shard i holds [g_i; f_i]
        zz = z.reshape(b, t, mp, 2, s)
        zz = cstr(zz, P(data_axis, None, tp_axis, None, None))
        gate = jax.nn.sigmoid(zz[..., 0, :]) * jnp.tanh(zz[..., 1, :])
        gate = gate.reshape(b, t, c)  # original channel order, sharded on C
        gate = cstr(gate, z_spec)
        # row-parallel output projection: psum over the model axis
        o = (
            jnp.einsum("btc,cd->btd", gate, w.out_w[l],
                       preferred_element_type=jnp.float32)
            + w.out_b[l][0]
        )
        o = cstr(o, repl)
        x = (x + o[:, :, :c]) * RSQRT2
        skip_sum = skip_sum + o[:, :, c:]

    out = skip_sum * (1.0 / math.sqrt(n_layers))
    out = jax.nn.relu(
        jnp.einsum("btc,cd->btd", out, w.skip_w[0],
                   preferred_element_type=jnp.float32) + w.skip_b
    )
    return (
        jnp.einsum("btc,cm->btm", out, w.outp_w[0],
                   preferred_element_type=jnp.float32) + w.outp_b
    )
