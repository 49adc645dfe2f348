"""FastDiff conditional waveform diffusion vocoder
(reference ``modules/FastDiff/module/FastDiff_model.py``, ``modules.py``).

Downsample pyramid (DiffusionDBlocks) + 3 time-aware LVC blocks whose
kernel-predictor produces per-frame location-variable conv kernels from
mel + noise embedding; epsilon-prediction reverse diffusion with 4/6/8/1000
step schedules.

TPU-first LVC: the reference's unfold + ``bildsk,biokl->bolsd`` einsum
(``modules.py:220-255``) becomes a windowed batched GEMM —
``[B*L, hop, k*Cin] @ [B*L, k*Cin, Cout]`` — which XLA tiles straight onto the
MXU. Layout is [B, T, C] throughout.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.ops.blocked_conv import BlockedConv

LRELU = 0.1


def diffusion_step_embedding(steps: jnp.ndarray, dim: int) -> jnp.ndarray:
    """steps: [B, 1] (possibly fractional) -> [B, dim] sin|cos embedding
    (``util.py:404-431``)."""
    half = dim // 2
    emb = np.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    args = steps.astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def swish(x):
    return x * jax.nn.sigmoid(x)


class ConvTranspose1dTorch(nn.Module):
    """torch ConvTranspose1d with explicit padding/output_padding via input
    dilation; kernel stored pre-flipped [k, Cin, Cout]."""

    features: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02),
            (self.kernel_size, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(x.dtype)
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1,),
            padding=[(pad, pad + self.output_padding)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias.astype(x.dtype)


class DiffusionDBlock(nn.Module):
    hidden_size: int
    factor: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        """x: [B, T, C] -> [B, T//factor, C] (nearest downsample + dilated convs)."""
        size = x.shape[1] // self.factor
        down = x[:, :: self.factor][:, :size]
        residual = nn.Conv(self.hidden_size, (1,), dtype=self.dtype, name="residual_dense")(down)
        h = down
        for i, d in enumerate([1, 2, 4]):
            h = nn.leaky_relu(h, 0.2)
            # blocked space-to-depth conv: C=32 waveform-rate convs leave TPU
            # lanes 75% idle; same params as nn.Conv (measured 1.19x on v5e)
            h = BlockedConv(
                self.hidden_size, dilation=d, dtype=self.dtype, name=f"conv_{i}",
            )(h)
        return h + residual


class _GemmSameConv(nn.Module):
    """k-tap SAME 1-D conv computed as unfold + ONE GEMM.

    Parameter tree is identical to ``nn.Conv`` (kernel [k, Cin, Cout], bias
    [Cout]) so checkpoints/converters are unaffected. Used for the
    KernelPredictor's fat output heads (Cout up to ~25k): a dot's output
    layout is assignable, while XLA-TPU's conv emitter produces a staged
    layout that — when the consumer is a pallas custom call needing the
    default layout — forced 2-3 full copies of the ~100 MB hoisted kernels
    tensor per block (HLO-census-backed, ~2.5 ms of a 10 ms 4-step e2e)."""

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        L = x.shape[1]
        lo = (k - 1) // 2
        xp = jnp.pad(x, [(0, 0), (lo, k - 1 - lo), (0, 0)])
        # tap-major unfold matches the row-major [k*Cin, Cout] kernel reshape
        xu = jnp.concatenate([xp[:, i : i + L] for i in range(k)], axis=-1)
        return xu @ kernel.reshape(k * cin, self.features) + bias


class KernelPredictor(nn.Module):
    conv_in_channels: int
    conv_out_channels: int
    conv_layers: int
    conv_kernel_size: int = 3
    hidden_channels: int = 64
    conv_size: int = 3
    dtype: jnp.dtype = None
    # flat=True returns the raw conv outputs ([B, L, layers*k*Cin*Cout] /
    # [B, L, layers*Cout]) so the caller can lane-slice per layer. The 5-D
    # reshape below makes XLA relayout the whole ~50 MB kernels tensor twice
    # (channel-major transpose + permuted copy, ~0.6 ms/forward on v5e when
    # the consumer is the fused UBlock kernel); per-layer tile-aligned lane
    # slices of the flat tensor avoid both.
    flat: bool = False

    @nn.compact
    def __call__(self, c):
        """c: [B, L, cond] -> kernels [B, L, layers, Cin, Cout, k], bias [B, L, layers, Cout]."""
        k = self.conv_kernel_size
        l_w = self.conv_in_channels * self.conv_out_channels * k * self.conv_layers
        l_b = self.conv_out_channels * self.conv_layers
        h = nn.Conv(self.hidden_channels, (5,), padding="SAME", dtype=self.dtype, name="input_conv")(c)
        h = nn.leaky_relu(h, LRELU)
        r = h
        for i in range(6):
            r = nn.Conv(
                self.hidden_channels, (self.conv_size,), padding="SAME",
                dtype=self.dtype, name=f"residual_conv_{i}",
            )(r)
            r = nn.leaky_relu(r, LRELU)
        h = h + r
        kernels = _GemmSameConv(l_w, self.conv_size, dtype=self.dtype, name="kernel_conv")(h)
        bias = _GemmSameConv(l_b, self.conv_size, dtype=self.dtype, name="bias_conv")(h)
        if self.flat:
            return kernels, bias
        b, L = c.shape[0], c.shape[1]
        # kernel_conv's OUTPUT CHANNELS are ordered [layers, k, Cin, Cout]
        # (tap-major), so the GEMM-ready [B, L, layers, k*Cin, Cout] layout is
        # a plain reshape. The torch checkpoint stores [layers, Cin, Cout, k]
        # order; ``convert_fastdiff`` permutes the conv's output-channel rows
        # once at load time. (Round-2 did the permutation in-graph as a
        # transpose — measured ~1.5 ms/block/step on v5e because the trailing
        # k=3 axis tiles at 2% lane occupancy.)
        kernels = kernels.reshape(
            b, L, self.conv_layers, k * self.conv_in_channels,
            self.conv_out_channels,
        )
        bias = bias.reshape(b, L, self.conv_layers, self.conv_out_channels)
        return kernels, bias


def location_variable_convolution(
    x: jnp.ndarray, kmat: jnp.ndarray, bias: jnp.ndarray, hop_size: int,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Per-frame predicted convolution as a windowed batched GEMM.

    Args:
      x: [B, T, Cin] with T == L * hop_size.
      kmat: [B, L, k*Cin, Cout] (KernelPredictor's GEMM-ready layout; window
        vector tap-major to match the tap concat below)
      bias: [B, L, Cout]

    Returns: [B, T, Cout]

    ``use_pallas=True`` routes through the fused kernel in
    ``ops/pallas/lvc.py`` — 2.6x faster STANDALONE at the final-block scale
    (1.9 vs 4.9 ms on v5e), but measured SLOWER inside the full net (7.2 vs
    6.2 ms/forward): the pallas boundary forces materialisation of the
    audio-rate activations that XLA otherwise fuses into this einsum's
    producers/consumers. Default is therefore the einsum; the kernel stays
    for standalone/serving uses and as the base for a future fully-fused
    UBlock.
    """
    b, t, cin = x.shape
    _, L, kcin, cout = kmat.shape
    k = kcin // cin
    assert t == L * hop_size, f"LVC length mismatch: {t} != {L}*{hop_size}"
    if use_pallas:
        from prodiff_tpu.ops.pallas.lvc import lvc_pallas

        return lvc_pallas(x, kmat, bias, hop_size)
    p = (k - 1) // 2
    xpad = jnp.pad(x, [(0, 0), (p, p), (0, 0)])
    # windows as one channel-axis concat of the k shifted views -> [B, T, k*Cin]
    # (concatenating on the LANE axis, not a new [B, T, k, Cin] dim whose
    # 32-lane tiles would quadruple the physical traffic of this copy)
    taps = jnp.concatenate([xpad[:, i : i + t] for i in range(k)], axis=2)
    xw = taps.reshape(b, L, hop_size, kcin)
    y = jnp.einsum(
        "blhi,blio->blho", xw, kmat, preferred_element_type=jnp.float32
    )
    y = y + bias[:, :, None, :]
    return y.reshape(b, L * hop_size, cout)


class TimeAwareLVCBlock(nn.Module):
    in_channels: int
    cond_channels: int
    upsample_ratio: int
    conv_layers: int = 4
    conv_kernel_size: int = 3
    cond_hop_length: int = 256
    kpnet_hidden_channels: int = 64
    kpnet_conv_size: int = 3
    noise_scale_embed_dim_out: int = 512
    use_pallas_lvc: bool = False
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, audio_down, c, noise_embedding):
        """x: [B, T, C]; audio_down: [B, T*r, C]; c: [B, L, cond]."""
        noise = nn.Dense(self.cond_channels, name="fc_t")(noise_embedding)  # [B, cond]
        condition = c + noise[:, None, :]
        kernels, bias = KernelPredictor(
            conv_in_channels=self.in_channels,
            conv_out_channels=2 * self.in_channels,
            conv_layers=self.conv_layers,
            conv_kernel_size=self.conv_kernel_size,
            hidden_channels=self.kpnet_hidden_channels,
            conv_size=self.kpnet_conv_size,
            dtype=self.dtype,
            name="kernel_predictor",
        )(condition)
        x = nn.leaky_relu(x, 0.2)
        r = self.upsample_ratio
        x = ConvTranspose1dTorch(
            self.in_channels, kernel_size=2 * r, stride=r,
            padding=r // 2 + r % 2, output_padding=r % 2, name="upsample",
        )(x)
        for i in range(self.conv_layers):
            x = x + audio_down
            y = nn.leaky_relu(x, 0.2)
            if self.conv_kernel_size == 3:
                y = BlockedConv(
                    self.in_channels, dilation=3 ** i, dtype=self.dtype,
                    name=f"convs_{i}",
                )(y)
            else:
                y = nn.Conv(
                    self.in_channels, (self.conv_kernel_size,),
                    kernel_dilation=(3 ** i,), padding="SAME", dtype=self.dtype,
                    name=f"convs_{i}",
                )(y)
            y = nn.leaky_relu(y, 0.2)
            y = location_variable_convolution(
                y.astype(kernels.dtype), kernels[:, :, i], bias[:, :, i],
                self.cond_hop_length, use_pallas=self.use_pallas_lvc,
            ).astype(x.dtype)
            gate, filt = y[..., : self.in_channels], y[..., self.in_channels :]
            x = x + jax.nn.sigmoid(gate) * jnp.tanh(filt)
        return x


class FastDiff(nn.Module):
    audio_channels: int = 1
    inner_channels: int = 32
    cond_channels: int = 80
    upsample_ratios: Sequence[int] = (8, 8, 4)
    lvc_layers_each_block: int = 4
    lvc_kernel_size: int = 3
    kpnet_hidden_channels: int = 64
    kpnet_conv_size: int = 3
    diffusion_step_embed_dim_in: int = 128
    diffusion_step_embed_dim_mid: int = 512
    diffusion_step_embed_dim_out: int = 512
    use_pallas_lvc: bool = False
    # packed trunk: run the whole audio-rate pyramid in the space-to-depth
    # [B, T/P, 128] layout with the fused UBlock Pallas kernel. None = auto
    # (on for TPU inference). Requires the reference architecture shape
    # (k=3 LVC, 128 % inner_channels == 0).
    use_packed: Optional[bool] = None
    dtype: jnp.dtype = None

    def _packed_supported(self) -> bool:
        return (
            self.lvc_kernel_size == 3
            and self.audio_channels == 1
            and 128 % self.inner_channels == 0
            and 128 // self.inner_channels >= 1
            and all(r % 2 == 0 for r in self.upsample_ratios)
        )

    def packed_active(self, l_cond: int) -> bool:
        """Whether a call with L=l_cond mel frames takes the packed trunk."""
        use_packed = self.use_packed
        if use_packed is None:
            # auto: packed trunk on TPU backends (measured v5e: 1.31x at B=1,
            # 3.3x at B=4 vs the linen path). CPU keeps linen — the fused
            # UBlock kernel would run in interpret mode there. NOTE the packed
            # path is inference-only (no VJP through the fused kernel); pass
            # use_packed=False / fastdiff_packed: false to force linen.
            use_packed = jax.devices()[0].platform in ("tpu", "axon")
        return (
            bool(use_packed)
            and self._packed_supported()
            # smallest pyramid rate is L samples; every rate must pack evenly
            and l_cond % (128 // self.inner_channels) == 0
        )

    @nn.compact
    def __call__(self, audio, c, diffusion_steps, kp_out=None):
        """audio: [B, T, 1]; c: [B, L, cond] (T == L * prod(ratios));
        diffusion_steps: [B, 1] -> epsilon [B, T, 1].

        ``kp_out``: optional hoisted KernelPredictor outputs, a tuple
        ``(kp_all, step_idx)`` — :func:`fastdiff_step_kernels`' full
        multi-step stacks plus a traced int32 index selecting this call's
        step. They depend only on (c, diffusion_steps), so a sampler hoists
        them out of its step loop; the step selection happens inside the
        consumers (scalar-prefetch reads in the fused kernel), never as a
        whole-tree slice. Packed path only.
        """
        if not self.is_initializing() and self.packed_active(c.shape[1]):
            return _packed_forward(self, audio, c, diffusion_steps, kp_out)
        assert kp_out is None, "kp_out requires the packed trunk"
        emb = diffusion_step_embedding(diffusion_steps, self.diffusion_step_embed_dim_in)
        emb = swish(nn.Dense(self.diffusion_step_embed_dim_mid, name="fc_t1")(emb))
        emb = swish(nn.Dense(self.diffusion_step_embed_dim_out, name="fc_t2")(emb))

        x = nn.Conv(self.inner_channels, (7,), padding="SAME", dtype=self.dtype, name="first_audio_conv")(audio)
        n_blocks = len(self.upsample_ratios)
        downsampled = []
        for i in range(n_blocks):
            downsampled.append(x)
            x = DiffusionDBlock(
                self.inner_channels,
                self.upsample_ratios[n_blocks - i - 1],
                dtype=self.dtype,
                name=f"downsample_{i}",
            )(x)

        cond_hop = 1
        for n in range(n_blocks):
            cond_hop *= self.upsample_ratios[n]
            x = TimeAwareLVCBlock(
                in_channels=self.inner_channels,
                cond_channels=self.cond_channels,
                upsample_ratio=self.upsample_ratios[n],
                conv_layers=self.lvc_layers_each_block,
                conv_kernel_size=self.lvc_kernel_size,
                cond_hop_length=cond_hop,
                kpnet_hidden_channels=self.kpnet_hidden_channels,
                kpnet_conv_size=self.kpnet_conv_size,
                noise_scale_embed_dim_out=self.diffusion_step_embed_dim_out,
                use_pallas_lvc=self.use_pallas_lvc,
                dtype=self.dtype,
                name=f"lvc_blocks_{n}",
            )(x, downsampled[n_blocks - 1 - n], c, emb)
        out = nn.Conv(self.audio_channels, (7,), padding="SAME", dtype=self.dtype,
                      name="final_conv")(x)
        return out.astype(jnp.float32)


# ---- packed (space-to-depth) execution path ---------------------------------


# LVC blocks with cond_hop >= this run as fused Pallas layers; smaller hops
# (too-small per-window GEMMs) take the XLA einsum path at low audio rates.
# Was 128 while the per-window BD construction dominated the kernel; with the
# interleaved-layout construction, hop=64 measured 2.635/8.265 ms B=1/B=4
# full-net vs 2.719/8.882 for the XLA block1 path (v5e). hop=8 (block0,
# M=2-row window dots) measured worse still — see CLAUDE.md round 4.
_FUSED_MIN_HOP = 64
# Chain the fused layers through halo-padded in/out (one pad per block
# instead of one full-tensor jnp.pad copy per layer; the kernel emits
# zeroed halos). Interpret-parity-identical to the plain mode. Measured
# (v5e, full net): B=4 7.71 ms vs 8.33 plain (7.5% — the per-layer pads
# scale with batch), B=1 statistically even across runs (2.62-2.65 vs
# 2.59-2.69; relay noise exceeds the delta) -> default ON.
_PADDED_CHAIN = True
# Run ALL layers of a fused block in ONE pallas_call (ops/pallas/ublock.py:
# ublock_block_packed) — inter-layer activations stay in VMEM, recomputing a
# shrinking halo margin per layer; ~4x less activation HBM traffic than the
# per-layer kernels. Interpret-parity-identical, but MEASURED SLOWER on v5e
# (2.83/8.80 ms B=1/B=4 full net vs 2.59-2.69/8.33 plain, 7.71 chain): the
# shrinking-margin recompute, per-window pair converts, and the serialized
# whole-block body lose more than the activation round-trips cost. Kept for
# the profiler A/B (packed_mono) and as the base for future fat-dot work.
_MONO_BLOCK = False
# diagnostic knobs (tools/profile_fastdiff.py): run only the first N LVC
# blocks' layer loops (upsamples still run so shapes stay correct); skip
# dblock convs / upsample convTs (identity-ish substitutions)
_MAX_LVC_BLOCKS = 3
_SKIP_DBLOCK_CONVS = False
_SKIP_UPSAMPLE = False
_SKIP_KP = False
_SKIP_FIRST = False
_SKIP_FINAL = False
_SKIP_RESIDUAL_DENSE = False


def _packed_forward(net: "FastDiff", audio, c, diffusion_steps, kp_out=None):
    """Whole-net forward on the packed [B, T/P, 128] trunk.

    Reads the SAME params as the linen path (``net.variables``); the layer
    loop runs as fused UBlock Pallas kernels (ops/pallas/ublock.py), the
    pyramid edges as packed matmul ops (ops/packed.py). Inference only —
    training/golden paths use the linen formulation. ``kp_out``: a
    ``(kp_all, step_idx)`` tuple — :func:`fastdiff_step_kernels`' per-layer
    multi-step stacks plus this call's step index; the step embedding +
    KernelPredictor are skipped entirely (they are the only consumers of
    diffusion_steps) and the fused kernels read the stacks in place.
    """
    from prodiff_tpu.ops import packed as pk
    from prodiff_tpu.ops.pallas.ublock import (
        layer_halo,
        mono_block_supported,
        ublock_block_packed,
        ublock_layer_packed,
    )

    params = net.variables["params"]
    cin = net.inner_channels
    p = 128 // cin
    b = audio.shape[0]
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    hoisted = kp_out is not None
    if hoisted:
        kp_list, kp_step = kp_out
        kp_step = jnp.asarray(kp_step, jnp.int32)

    def dense(name, x, parent=params):
        w = parent[name]["kernel"]
        return x @ w + parent[name]["bias"]

    if not hoisted:
        emb = diffusion_step_embedding(
            diffusion_steps, net.diffusion_step_embed_dim_in
        )
        emb = swish(dense("fc_t1", emb))
        emb = swish(dense("fc_t2", emb))

    if _SKIP_FIRST:
        xp = jnp.broadcast_to(
            audio[:, ::p, :1].reshape(b, -1, 1), (b, audio.shape[1] // p, 128)
        ) * 0.01
    else:
        xp = pk.packed_conv_from_flat(
            audio[..., 0],
            params["first_audio_conv"]["kernel"],
            params["first_audio_conv"]["bias"],
            p,
        )

    n_blocks = len(net.upsample_ratios)
    downsampled = []
    for i in range(n_blocks):
        downsampled.append(xp)
        dp = params[f"downsample_{i}"]
        factor = net.upsample_ratios[n_blocks - i - 1]
        down = pk.packed_downsample(xp, factor, cin)
        if _SKIP_RESIDUAL_DENSE:
            residual = down
        else:
            residual = pk.packed_dense(
                down, dp["residual_dense"]["kernel"][0], dp["residual_dense"]["bias"], cin
            )
        h = down
        if not _SKIP_DBLOCK_CONVS:
            for j, d in enumerate([1, 2, 4]):
                h = jax.nn.leaky_relu(h, 0.2)
                h = pk.packed_conv3(
                    h, dp[f"conv_{j}"]["kernel"], dp[f"conv_{j}"]["bias"], d, cin
                )
        xp = h + residual

    cond_hop = 1
    for n in range(n_blocks):
        r = net.upsample_ratios[n]
        cond_hop *= r
        bp = params[f"lvc_blocks_{n}"]
        if hoisted:
            km_stack, lb_layers = kp_list[n]
            L_mel = km_stack.shape[2]
            kc3 = net.lvc_kernel_size * cin

            def layer_kernels(i):
                # per-step/per-layer slices for the XLA (low-rate) blocks and
                # the mono diagnostic — the fused kernels below never call
                # this, they read the stack in place via (step_idx, layer)
                km = jax.lax.dynamic_index_in_dim(
                    km_stack, kp_step, 0, keepdims=False)
                km = jax.lax.slice_in_dim(
                    km, i * kc3, (i + 1) * kc3, axis=2)
                lb = jax.lax.dynamic_index_in_dim(
                    lb_layers[i], kp_step, 0, keepdims=False)
                return km, lb
        else:
            noise = dense("fc_t", emb, parent=bp)
            condition = c + noise[:, None, :]
            # On TPU the KP runs with a bf16 compute dtype so kernel_conv
            # EMITS bf16 (params stay f32): XLA computes these convs in bf16
            # internally regardless (default TPU conv precision), and a
            # separate f32->bf16 astype pass on the ~50 MB output measured
            # 0.33 ms.
            kp = KernelPredictor(
                conv_in_channels=cin,
                conv_out_channels=2 * cin,
                conv_layers=net.lvc_layers_each_block,
                conv_kernel_size=net.lvc_kernel_size,
                hidden_channels=net.kpnet_hidden_channels,
                conv_size=net.kpnet_conv_size,
                flat=True,
                dtype=None if interpret else jnp.bfloat16,
            )
            if _SKIP_KP:
                shapes = jax.eval_shape(
                    lambda c_: kp.apply({"params": bp["kernel_predictor"]}, c_),
                    condition,
                )
                kflat = jnp.zeros(shapes[0].shape, shapes[0].dtype)
                bflat = jnp.zeros(shapes[1].shape, shapes[1].dtype)
            else:
                kflat, bflat = kp.apply(
                    {"params": bp["kernel_predictor"]}, condition
                )
            # the LVC bias is rolled in-kernel and Mosaic can't roll bf16; it
            # is tiny ([B, L, 2C*layers]) so f32 costs nothing
            bflat = bflat.astype(jnp.float32)
            # per-layer kernels via tile-aligned lane slices of the FLAT conv
            # output (channel order is [layers, k, Cin, Cout], so layer i is
            # lanes [i*kwc, (i+1)*kwc)); reshaping the whole tensor to 5-D
            # first makes XLA relayout all ~50 MB of it twice (measured
            # ~1.2 ms/forward). The bf16 operand (see the kp construction
            # above) halves the remaining relayout + kernel DMA. CPU convs
            # are true f32, so f32 is kept there (golden tests stay tight).
            kwc = net.lvc_kernel_size * cin * 2 * cin
            L_mel = kflat.shape[1]

            def layer_kernels(i, kflat=kflat, bflat=bflat, kwc=kwc,
                              L_mel=L_mel):
                km = jax.lax.slice_in_dim(
                    kflat, i * kwc, (i + 1) * kwc, axis=2)
                lb = jax.lax.slice_in_dim(
                    bflat, i * 2 * cin, (i + 1) * 2 * cin, axis=2)
                km = km.reshape(
                    b, L_mel, net.lvc_kernel_size * cin, 2 * cin)
                return km, lb
        xp = jax.nn.leaky_relu(xp, 0.2)
        if _SKIP_UPSAMPLE:
            # cheap repeat-upsample stand-in (diagnostics only)
            xp = jnp.repeat(xp, r, axis=1)
        else:
            xp = pk.packed_conv_transpose_packed_in(
                xp, bp["upsample"]["kernel"], bp["upsample"]["bias"],
                stride=r, padding=r // 2 + r % 2, output_padding=r % 2, cin=cin,
            )
        adp = downsampled[n_blocks - 1 - n]
        if n >= _MAX_LVC_BLOCKS:
            continue
        if cond_hop >= _FUSED_MIN_HOP:
            # audio-rate block: fused Pallas layers on the packed trunk.
            # _PADDED_CHAIN: pad x/audio_down ONCE per block and chain the
            # layers through halo-padded in/out (zeroed halos emitted by the
            # kernel) — each plain-mode layer's jnp.pad is a full-tensor HBM
            # copy on a traffic-bound kernel (~2 extra tensor copies/layer).
            n_lay = net.lvc_layers_each_block
            if _MONO_BLOCK and mono_block_supported(
                L_mel, cond_hop, p, n_lay, cin=cin
            ):
                kls = [layer_kernels(i) for i in range(n_lay)]
                xp = ublock_block_packed(
                    xp, adp,
                    [bp[f"convs_{i}"]["kernel"] for i in range(n_lay)],
                    [bp[f"convs_{i}"]["bias"] for i in range(n_lay)],
                    [k for k, _ in kls], [lb for _, lb in kls],
                    [3 ** i for i in range(n_lay)], cond_hop,
                    interpret=interpret,
                )
                continue
            if _PADDED_CHAIN:
                ioh = max(layer_halo(3 ** i, p) for i in range(n_lay))
                xp = jnp.pad(xp, [(0, 0), (ioh, ioh), (0, 0)])
                adp_l = jnp.pad(adp, [(0, 0), (ioh, ioh), (0, 0)])
            for i in range(n_lay):
                if hoisted:
                    # the kernel reads this (step, layer)'s windows straight
                    # from the [N, B, L, layers*3C, 2C] stack (scalar-prefetch
                    # step index + static dim-3 layer block index) — no
                    # per-step or per-layer slice ever materialises
                    km_i, lb_i, st, li = km_stack, lb_layers[i], kp_step, i
                else:
                    km_i, lb_i = layer_kernels(i)
                    st, li = None, 0
                if _PADDED_CHAIN:
                    xp = ublock_layer_packed(
                        xp, adp_l,
                        bp[f"convs_{i}"]["kernel"], bp[f"convs_{i}"]["bias"],
                        km_i, lb_i,
                        dilation=3 ** i, hop=cond_hop, interpret=interpret,
                        in_halo=ioh, out_halo=ioh if i < n_lay - 1 else 0,
                        step_idx=st, layer_idx=li,
                    )
                else:
                    xp = ublock_layer_packed(
                        xp, adp,
                        bp[f"convs_{i}"]["kernel"], bp[f"convs_{i}"]["bias"],
                        km_i, lb_i,
                        dilation=3 ** i, hop=cond_hop, interpret=interpret,
                        step_idx=st, layer_idx=li,
                    )
        else:
            # low-rate blocks (hop < 128): per-window GEMMs are too small for
            # the fused kernel; the XLA einsum path at 1/32..1/4 audio rate
            # is cheap. One unpack/repack pair per block. (A fully-packed XLA
            # variant was tried round-3 — taps via lane-roll time shifts +
            # (tap,cin)-contracting einsums — and measured SLOWER both as a
            # sublane tap stack (3.36 ms vs 3.11 B=1) and as a lane concat
            # (3.38/13.97 vs 3.11/12.8 at B=1/4): the window-build copies
            # outweigh the [T, 32] lane-padding they avoid at this rate.)
            x = pk.unpack(xp, cin)
            ad = pk.unpack(adp, cin)
            for i in range(net.lvc_layers_each_block):
                km_i, lb_i = layer_kernels(i)
                x = x + ad
                y = jax.nn.leaky_relu(x, 0.2)
                y = jax.lax.conv_general_dilated(
                    y, bp[f"convs_{i}"]["kernel"], (1,), "SAME",
                    rhs_dilation=(3 ** i,),
                    dimension_numbers=("NWC", "WIO", "NWC"),
                ) + bp[f"convs_{i}"]["bias"]
                y = jax.nn.leaky_relu(y, 0.2)
                y = location_variable_convolution(y, km_i, lb_i, cond_hop)
                gate, filt = y[..., :cin], y[..., cin:]
                x = x + jax.nn.sigmoid(gate) * jnp.tanh(filt)
            xp = pk.pack(x, p)

    if _SKIP_FINAL:
        out = xp.sum(axis=-1)
    else:
        out = pk.packed_conv_to_flat(
            xp, params["final_conv"]["kernel"], params["final_conv"]["bias"], cin
        )
    return out[..., None].astype(jnp.float32)


# Hoisting is only a win for short schedules: the precomputed kernels scale
# with n_steps ([n, B, L, K] per LVC block), so long schedules (e.g. the
# 1000-step reference alternate) would blow memory for no per-step saving.
# Shared by bench.py and vocoders/fastdiff.py — keep the gate in ONE place.
MAX_HOISTED_STEPS = 16


def fastdiff_step_kernels(net: "FastDiff", variables, c, steps):
    """Precompute the KernelPredictor outputs for a fixed set of diffusion
    steps, restructured for zero-copy per-step consumption.

    The KP depends only on (c, step) — not on the waveform — so a sampler
    can run it ONCE per segment, batched over its n steps, instead of once
    per reverse iteration (3 KPs x n steps -> 3 batched KPs). The flat conv
    outputs are then sliced/reshaped into per-layer GEMM-ready stacks HERE,
    once per segment: doing it per reverse step inside the sampling scan
    (plus the ``kp_all[i]`` step slice) measured ~2-3 ms of a 10 ms 4-step
    e2e, and XLA cannot hoist scan-body slices of a scan-carried index. The
    fused UBlock kernel reads step i's windows directly from these stacks
    via scalar-prefetch indexing (``ublock_layer_packed(step_idx=...)``).

    c: [B, L, cond]; steps: [n] (the schedule's fractional step indices).
    Returns a list over LVC blocks of (km_stack, lb_layers): km_stack
    [n, B, L, layers*3C, 2C] (bf16 on TPU; layer i = rows [i*3C, (i+1)*3C)
    of dim 3) and a tuple over layers of lb [n, B, L, 2C] f32.
    """
    params = variables["params"]
    n = steps.shape[0]
    b, L, _ = c.shape
    interpret = jax.devices()[0].platform not in ("tpu", "axon")

    def dense(name, x, parent=params):
        return x @ parent[name]["kernel"] + parent[name]["bias"]

    emb = diffusion_step_embedding(
        steps.reshape(n, 1), net.diffusion_step_embed_dim_in
    )  # [n, D_in]
    emb = swish(dense("fc_t1", emb))
    emb = swish(dense("fc_t2", emb))

    out = []
    for blk in range(len(net.upsample_ratios)):
        bp = params[f"lvc_blocks_{blk}"]
        noise = dense("fc_t", emb, parent=bp)  # [n, cond]
        condition = c[None] + noise[:, None, None, :]  # [n, B, L, cond]
        kp = KernelPredictor(
            conv_in_channels=net.inner_channels,
            conv_out_channels=2 * net.inner_channels,
            conv_layers=net.lvc_layers_each_block,
            conv_kernel_size=net.lvc_kernel_size,
            hidden_channels=net.kpnet_hidden_channels,
            conv_size=net.kpnet_conv_size,
            flat=True,
            dtype=None if interpret else jnp.bfloat16,
        )
        kflat, bflat = kp.apply(
            {"params": bp["kernel_predictor"]},
            condition.reshape(n * b, L, -1),
        )
        kflat = kflat.reshape(n, b, L, -1)
        bflat = bflat.reshape(n, b, L, -1).astype(jnp.float32)
        cin = net.inner_channels
        kc = net.lvc_kernel_size * cin
        # ONE reshape per block: [n, B, L, layers*kc, 2C]. Layer i's kernels
        # are rows [i*kc, (i+1)*kc) of dim 3, read IN PLACE by the consumers
        # (pallas BlockSpec dim-3 block index / one small sublane slice in
        # the XLA blocks) — no per-layer slice of the ~100 MB stack ever
        # materialises. The previous per-layer slice+reshape made XLA stage
        # every slice through an L-minor bitcast layout and then copy each
        # pallas operand back to the default layout: ~900 MB of pure
        # relayout traffic per 4-step segment (HLO-census-backed; the
        # in-graph hoist measured 4.8 ms vs 2.25 ms in isolation).
        km_stack = kflat.reshape(
            n, b, L, net.lvc_layers_each_block * kc, 2 * cin)
        lb_layers = tuple(
            jax.lax.slice_in_dim(bflat, i * 2 * cin, (i + 1) * 2 * cin, axis=3)
            for i in range(net.lvc_layers_each_block))
        out.append((km_stack, lb_layers))
    return out


# ---- diffusion hyperparams + sampling ----------------------------------------


def compute_hyperparams_given_schedule(beta: np.ndarray) -> dict:
    """(``util.py:99-124``): cumulative alpha/sigma from a beta schedule."""
    beta = np.asarray(beta, np.float64)
    T = len(beta)
    alpha = 1 - beta
    sigma = beta.copy()
    for t in range(1, T):
        alpha[t] *= alpha[t - 1]
        sigma[t] *= (1 - alpha[t - 1]) / (1 - alpha[t])
    return {"T": T, "beta": beta, "alpha": np.sqrt(alpha), "sigma": np.sqrt(sigma)}


def map_noise_scale_to_time_step(alpha_infer: float, alpha: np.ndarray) -> float:
    if alpha_infer < alpha[-1]:
        return len(alpha) - 1
    if alpha_infer > alpha[0]:
        return 0
    for t in range(len(alpha) - 1):
        if alpha[t + 1] <= alpha_infer <= alpha[t]:
            step_diff = (alpha[t] - alpha_infer) / (alpha[t] - alpha[t + 1])
            return t + float(step_diff)
    return -1


def prepare_inference_schedule(
    inference_noise_schedule: np.ndarray, alpha_train: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (beta_infer, alpha_infer, sigma_infer, steps_infer), host-side."""
    beta_infer = np.asarray(inference_noise_schedule, np.float64)
    N = len(beta_infer)
    alpha_infer = 1 - beta_infer
    sigma_infer = beta_infer.copy()
    for n in range(1, N):
        alpha_infer[n] *= alpha_infer[n - 1]
        sigma_infer[n] *= (1 - alpha_infer[n - 1]) / (1 - alpha_infer[n])
    alpha_infer = np.sqrt(alpha_infer)
    sigma_infer = np.sqrt(sigma_infer)
    steps_infer = []
    keep = []
    for n in range(N):
        step = map_noise_scale_to_time_step(alpha_infer[n], alpha_train)
        if step >= 0:
            steps_infer.append(step)
            keep.append(n)
    keep = np.asarray(keep, np.int64)
    return (
        beta_infer[keep],
        alpha_infer[keep],
        sigma_infer[keep],
        np.asarray(steps_infer, np.float64),
    )


def sampling_given_noise_schedule(
    apply_fn,
    params,
    rng: jax.Array,
    audio_length: int,
    cond: jnp.ndarray,
    beta_infer: np.ndarray,
    alpha_infer: np.ndarray,
    sigma_infer: np.ndarray,
    steps_infer: np.ndarray,
    init_noise: Optional[jnp.ndarray] = None,
    step_noises: Optional[jnp.ndarray] = None,
    kp_all=None,
) -> jnp.ndarray:
    """Reverse epsilon-prediction diffusion as a lax.scan
    (``util.py:158-234``). cond: [B, L, C] -> wav [B, audio_length].
    ``init_noise`` [B, L_audio, 1] / ``step_noises`` [n, B, L_audio, 1] inject
    the randomness explicitly (deterministic output / golden parity); the
    last step's noise entry is masked out exactly like the reference's n==0
    branch.

    ``kp_all``: hoisted per-step KernelPredictor outputs
    (:func:`fastdiff_step_kernels` over ``steps_infer``). When given,
    ``apply_fn`` must accept a fifth argument — this step's kp_out slice."""
    b = cond.shape[0]
    n = len(steps_infer)
    if init_noise is None or step_noises is None:
        rng_init, rng_loop = jax.random.split(rng)
    # carry the waveform 2-D [B, L]: a trailing singleton channel would tile
    # (8, 128) with ONE live lane, inflating every elementwise update's
    # physical HBM traffic 128x; the [..., None] relayout happens once per
    # net call instead
    x = (
        init_noise[..., 0] if init_noise is not None
        else jax.random.normal(rng_init, (b, audio_length))
    )
    noises = (
        step_noises[..., 0] if step_noises is not None
        else jax.random.normal(rng_loop, (n, b, audio_length))
    )

    consts = (
        jnp.asarray(beta_infer, jnp.float32),
        jnp.asarray(alpha_infer, jnp.float32),
        jnp.asarray(sigma_infer, jnp.float32),
        jnp.asarray(steps_infer, jnp.float32),
    )

    def body(x, inp):
        i, noise = inp
        beta_n = consts[0][i]
        alpha_n = consts[1][i]
        sigma_n = consts[2][i]
        step_n = consts[3][i]
        if kp_all is not None:
            # the step is selected INSIDE the consumers (scalar-prefetch
            # indexing in the fused kernel / one small dynamic slice in the
            # XLA blocks) — slicing the whole stacked tree here costs a
            # ~75 MB copy per step
            eps = apply_fn(
                params, x[..., None], cond, jnp.full((b, 1), step_n),
                (kp_all, i),
            )[..., 0]
        else:
            eps = apply_fn(
                params, x[..., None], cond, jnp.full((b, 1), step_n)
            )[..., 0]
        x = x - beta_n / jnp.sqrt(1 - alpha_n ** 2) * eps
        x = x / jnp.sqrt(1 - beta_n)
        x = jnp.where(i > 0, x + sigma_n * noise, x)
        return x, None

    idxs = jnp.arange(n - 1, -1, -1)
    x, _ = jax.lax.scan(body, x, (idxs, noises))
    return x


# ---- torch ckpt conversion -----------------------------------------------------


def _conv1d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _convt1d(w):
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1], (2, 0, 1)))


def convert_fastdiff(sd: dict, config: dict) -> dict:
    """Reference FastDiff state dict (weight-norm folded) -> flax params."""
    from prodiff_tpu.utils.torch_convert import fold_weight_norm

    sd = fold_weight_norm({k: np.asarray(v) for k, v in sd.items()})

    def conv(src):
        return {"kernel": _conv1d(sd[src + ".weight"]), "bias": sd[src + ".bias"]}

    def dense(src):
        return {"kernel": sd[src + ".weight"].T, "bias": sd[src + ".bias"]}

    p = {
        "first_audio_conv": conv("first_audio_conv"),
        "fc_t1": dense("fc_t1"),
        "fc_t2": dense("fc_t2"),
        "final_conv": conv("final_conv.0"),
    }
    n_blocks = len(config["upsample_ratios"])
    cin = config["inner_channels"]
    cout = 2 * cin
    k = config["lvc_kernel_size"]
    layers = config["lvc_layers_each_block"]
    # permutation of kernel_conv's output channels: torch emits flattened
    # [layers, Cin, Cout, k]; the flax KernelPredictor wants tap-major
    # [layers, k, Cin, Cout] so the GEMM-ready kmat is a plain reshape
    perm = (
        np.arange(layers * cin * cout * k)
        .reshape(layers, cin, cout, k)
        .transpose(0, 3, 1, 2)
        .reshape(-1)
    )

    def kernel_conv(src):
        out = conv(src)
        return {
            "kernel": np.ascontiguousarray(out["kernel"][:, :, perm]),
            "bias": np.ascontiguousarray(out["bias"][perm]),
        }

    for i in range(n_blocks):
        p[f"downsample_{i}"] = {
            "residual_dense": conv(f"downsample.{i}.residual_dense"),
            **{
                f"conv_{j}": conv(f"downsample.{i}.conv.{j}") for j in range(3)
            },
        }
        kp = {
            "input_conv": conv(f"lvc_blocks.{i}.kernel_predictor.input_conv.0"),
            "kernel_conv": kernel_conv(f"lvc_blocks.{i}.kernel_predictor.kernel_conv"),
            "bias_conv": conv(f"lvc_blocks.{i}.kernel_predictor.bias_conv"),
        }
        # residual_conv Sequential indices with convs at 1,3,6,8,11,13
        for j, idx in enumerate([1, 3, 6, 8, 11, 13]):
            kp[f"residual_conv_{j}"] = conv(
                f"lvc_blocks.{i}.kernel_predictor.residual_conv.{idx}"
            )
        block = {
            "fc_t": dense(f"lvc_blocks.{i}.fc_t"),
            "upsample": {
                "kernel": _convt1d(sd[f"lvc_blocks.{i}.upsample.weight"]),
                "bias": sd[f"lvc_blocks.{i}.upsample.bias"],
            },
            "kernel_predictor": kp,
        }
        for j in range(config["lvc_layers_each_block"]):
            block[f"convs_{j}"] = conv(f"lvc_blocks.{i}.convs.{j}")
        p[f"lvc_blocks_{i}"] = block
    return {"params": p}
