"""WaveNet diffusion denoiser (reference ``modules/decoder/wavenet.py:52-123``).

Non-causal gated dilated-conv stack. Layout is [B, T, C] (channels last — the
natural NWC layout for TPU convs); the diffusion wrappers flatten any feature
dimension into C. The 20-layer residual loop is the acoustic hot loop: all
convs are expressed as XLA ``conv_general_dilated`` on channels-last tensors so
they tile onto the MXU, and the layer loop is unrolled at trace time (static
depth) letting XLA fuse the gate/skip elementwise work into the convs.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from prodiff_tpu.models.common import Linear, SinusoidalPosEmb, mish

he_normal = nn.initializers.he_normal()


class ResidualBlock(nn.Module):
    residual_channels: int
    dilation: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, cond_proj, step_embed):
        """x: [B, T, C]; cond_proj: [B, T, 2C] (precomputed); step_embed: [B, C]."""
        c = self.residual_channels
        y = x + Linear(c, name="diffusion_projection")(step_embed)[:, None, :]
        y = nn.Conv(
            2 * c,
            kernel_size=(3,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            kernel_init=he_normal,
            dtype=self.dtype,
            name="dilated_conv",
        )(y)
        y = y + cond_proj
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = nn.Conv(
            2 * c,
            kernel_size=(1,),
            kernel_init=he_normal,
            dtype=self.dtype,
            name="output_projection",
        )(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) * (2.0 ** -0.5), skip


class WaveNet(nn.Module):
    """x [B, T, in_dims], t [B], cond [B, T, H] -> [B, T, in_dims].

    ``use_pallas`` routes the residual stack through the fused Pallas kernel
    (``ops/pallas/wavenet.py``; dilation cycle 1 only; measured 1.16x at
    T<=512 and 1.27x at T=1536/bf16 over the XLA path on v5e). Default
    ``None`` = auto: Pallas on TPU backends, XLA elsewhere. The path is fully
    differentiable (custom VJP, ``ops/pallas/wavenet_train.py``) and the param
    tree is identical either way, so checkpoints are interchangeable.
    ``pallas_stream_dtype`` sets the weight-stream/MXU dtype (bf16 halves the
    per-layer HBM weight traffic; accumulation stays f32).
    """

    in_dims: int
    hidden_size: int
    residual_layers: int = 20
    residual_channels: int = 256
    dilation_cycle_length: int = 1
    dtype: Optional[jnp.dtype] = None
    use_pallas: Optional[bool] = None
    pallas_stream_dtype: jnp.dtype = jnp.bfloat16
    # training backward for the pallas path: 'xla' (autodiff of the plain
    # stack; measured fastest) or 'pallas' (save-kernel + chain-kernel VJP)
    pallas_train_impl: str = "xla"
    # tensor parallelism over a mesh axis (parallel/tp_wavenet.py); takes
    # precedence over the single-chip Pallas kernel when set
    tp_axis: Optional[str] = None
    tp_size: int = 1
    # sequence parallelism: shard the T (frame) axis over a mesh axis; GSPMD
    # inserts the k=3 conv halo exchanges. For serving single very long
    # segments where batch DP has nothing to shard (SURVEY §5.7's long-context
    # axis, scaled out instead of segmented)
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, spec: jnp.ndarray, diffusion_step: jnp.ndarray,
                 cond: jnp.ndarray, train: bool = False):
        """``train=True`` (the diffusion wrappers set it on their training
        branch) routes through the linen/XLA stack — measured fastest for
        fwd+bwd (23.0 vs 25.2 ms/step at B=16/T=1536 on v5e; the stacked-param
        custom-VJP route carries ~9% stack/unstack overhead) — while inference
        keeps the fused Pallas kernel."""
        if (
            self.tp_axis is not None
            and self.tp_size > 1
            and self.dilation_cycle_length != 1
        ):
            # fail loudly: the trainer already shrank the data axis to N/mp
            # for this mesh, so silently skipping TP would quietly lose half
            # the data-parallel width
            raise ValueError(
                "model_parallel > 1 requires dilation_cycle_length == 1 "
                f"(got {self.dilation_cycle_length}); the TP denoiser stacks "
                "per-layer params and needs uniform dilation"
            )
        if (
            self.tp_axis is not None
            and self.tp_size > 1
            and not self.is_initializing()
            and self.dilation_cycle_length == 1
        ):
            from prodiff_tpu.ops.pallas.wavenet import stack_wavenet_params
            from prodiff_tpu.parallel.tp_wavenet import wavenet_apply_tp

            w = stack_wavenet_params(self.variables, self.residual_layers)
            return wavenet_apply_tp(
                w, spec, diffusion_step, cond,
                tp_axis=self.tp_axis, tp_size=self.tp_size,
            ).astype(jnp.float32)
        use_pallas = self.use_pallas
        if use_pallas is None:
            # auto: the fused kernel needs a real TPU (tests on the virtual
            # CPU mesh exercise it explicitly via interpret mode)
            use_pallas = jax.devices()[0].platform in ("tpu", "axon")
        if (
            use_pallas
            and not train
            and not self.is_initializing()
            and self.dilation_cycle_length == 1
        ):
            from prodiff_tpu.ops.pallas.wavenet import (
                stack_wavenet_params,
                wavenet_apply_pallas,
            )

            w = stack_wavenet_params(
                self.variables, self.residual_layers,
                stream_dtype=self.pallas_stream_dtype,
            )
            return wavenet_apply_pallas(
                w, spec, diffusion_step, cond,
                train_impl=self.pallas_train_impl,
            )
        c = self.residual_channels
        if self.sp_axis is not None and not self.is_initializing():
            from jax.sharding import PartitionSpec as P

            spec = jax.lax.with_sharding_constraint(
                spec, P(None, self.sp_axis, None)
            )
            cond = jax.lax.with_sharding_constraint(
                cond, P(None, self.sp_axis, None)
            )
        x = nn.Conv(
            c, kernel_size=(1,), kernel_init=he_normal, dtype=self.dtype,
            name="input_projection",
        )(spec)
        x = jax.nn.relu(x)

        step = SinusoidalPosEmb(c, name="diffusion_embedding")(diffusion_step)
        step = Linear(c * 4, name="mlp_0")(step)
        step = mish(step)
        step = Linear(c, name="mlp_1")(step)

        # The conditioner projection is per-layer but depends only on cond, so
        # compute all layers' projections as one batched matmul (better MXU
        # utilisation than 20 separate 1x1 convs).
        skip_sum = jnp.zeros_like(x)
        for i in range(self.residual_layers):
            cond_proj = nn.Conv(
                2 * c,
                kernel_size=(1,),
                kernel_init=he_normal,
                dtype=self.dtype,
                name=f"layers_{i}_conditioner_projection",
            )(cond)
            x, skip = ResidualBlock(
                c,
                dilation=2 ** (i % self.dilation_cycle_length),
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, cond_proj, step)
            skip_sum = skip_sum + skip

        x = skip_sum * (1.0 / math.sqrt(self.residual_layers))
        x = nn.Conv(
            c, kernel_size=(1,), kernel_init=he_normal, dtype=self.dtype,
            name="skip_projection",
        )(x)
        x = jax.nn.relu(x)
        x = nn.Conv(
            self.in_dims,
            kernel_size=(1,),
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="output_projection",
        )(x)
        # keep the diffusion math (q_sample/posterior/losses) in f32
        return x.astype(jnp.float32)
