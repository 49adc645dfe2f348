"""Component-level FastDiff timing on the real chip (VERDICT round-2 #2).

``block_until_ready`` doesn't synchronise through the axon relay, so instead
of an xprof trace each component is timed with bench.py's chained-fori_loop
methodology (K iterations inside one jit, scalar readback). Usage:

    python tools/profile_fastdiff.py [--b 1 4] [--dtypes f32 bf16] [--parts ...]

Prints one line per (component, B, dtype): ms per iteration.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from prodiff_tpu.models.fastdiff import (
    DiffusionDBlock,
    FastDiff,
    KernelPredictor,
    TimeAwareLVCBlock,
    location_variable_convolution,
)

T_MEL, N_MELS, HOP = 512, 80, 256
T_AUDIO = T_MEL * HOP


def measure(fn_builder, label):
    dt = bench._measure(fn_builder)
    print(f"{label:55s} {dt * 1000:8.3f} ms")
    return dt


def chain(compute):
    return bench._chain(compute, jax.random.PRNGKey(0))


def full_net(B, dtype, packed=False, fused_min_hop=None, max_blocks=None,
             skip_dconvs=False, skip_upsample=False, skip_kp=False,
             skip_first=False, skip_final=False, skip_rdense=False,
             padded_chain=None, mono_block=None):
    from prodiff_tpu.models import fastdiff as fd_mod

    if fused_min_hop is not None:
        fd_mod._FUSED_MIN_HOP = fused_min_hop
    if padded_chain is not None:
        fd_mod._PADDED_CHAIN = padded_chain
    if mono_block is not None:
        fd_mod._MONO_BLOCK = mono_block
    fd_mod._MAX_LVC_BLOCKS = 3 if max_blocks is None else max_blocks
    fd_mod._SKIP_DBLOCK_CONVS = skip_dconvs
    fd_mod._SKIP_UPSAMPLE = skip_upsample
    fd_mod._SKIP_KP = skip_kp
    fd_mod._SKIP_FIRST = skip_first
    fd_mod._SKIP_FINAL = skip_final
    fd_mod._SKIP_RESIDUAL_DENSE = skip_rdense
    net = FastDiff(cond_channels=N_MELS, dtype=dtype, use_packed=packed)
    params = jax.jit(net.init)(
        jax.random.PRNGKey(3), jnp.zeros((B, T_AUDIO, 1)),
        jnp.zeros((B, T_MEL, N_MELS)), jnp.zeros((B, 1)),
    )
    cond = jnp.asarray(np.random.default_rng(0).normal(size=(B, T_MEL, N_MELS)), jnp.float32)
    # noise generated ONCE: the e2e sampler also draws outside the scan, and
    # per-iteration normal() on a [B,T,1] tensor costs ~ms by itself (the
    # erf_inv chain materialises at 4-lane layout)
    x0 = jnp.asarray(np.random.default_rng(7).normal(size=(B, T_AUDIO, 1)), jnp.float32)

    def compute(rng, eps):
        return net.apply(params, x0 + eps, cond, jnp.full((B, 1), 3.0))

    return chain(compute)


_E2E_STEPS = (3.0, 2.0, 1.0, 0.5)  # a 4-step schedule's fractional indices


def _packed_net(B):
    """A default-knob packed net + inputs at bench scale (shared by the
    hoisted-KP parts)."""
    net = FastDiff(cond_channels=N_MELS, use_packed=True)
    params = jax.jit(net.init)(
        jax.random.PRNGKey(3), jnp.zeros((B, T_AUDIO, 1)),
        jnp.zeros((B, T_MEL, N_MELS)), jnp.zeros((B, 1)),
    )
    cond = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, T_MEL, N_MELS)), jnp.float32)
    x0 = jnp.asarray(
        np.random.default_rng(7).normal(size=(B, T_AUDIO, 1)), jnp.float32)
    return net, params, cond, x0


def full_net_hoistkp(B, dtype):
    """The true SERVING per-step cost: one forward consuming a precomputed
    (hoisted) KernelPredictor slice, exactly as the e2e sampler does —
    kp_out rides the consts argument, so nothing KP-related is measured
    except its consumption."""
    from prodiff_tpu.models.fastdiff import fastdiff_step_kernels

    net, params, cond, x0 = _packed_net(B)
    steps = jnp.asarray(_E2E_STEPS, jnp.float32)
    kp_all = jax.jit(
        lambda p, c: fastdiff_step_kernels(net, p, c, steps))(params, cond)

    def compute(rng, eps, c):
        p, k = c
        return net.apply(
            p, x0 + eps, cond, jnp.full((B, 1), 3.0),
            kp_out=(k, jnp.int32(0)),
        )

    return bench._chain(
        compute, jax.random.PRNGKey(0), consts=(params, kp_all))


def kp_hoist4(B, dtype):
    """The batched 4-step hoisted KP alone (3 blocks x [4B] batch), as the
    e2e runs it once per segment."""
    from prodiff_tpu.models.fastdiff import fastdiff_step_kernels

    net, params, cond, _ = _packed_net(B)
    steps = jnp.asarray(_E2E_STEPS, jnp.float32)

    def compute(rng, eps, c):
        out = fastdiff_step_kernels(net, c, cond + eps, steps)
        leaves = jax.tree.leaves(out)
        return jnp.stack([a.astype(jnp.float32).mean() for a in leaves])

    return bench._chain(compute, jax.random.PRNGKey(0), consts=params)


def sampler_hoist4(B, dtype, noslice=False, extnoise=False, exthoist=False):
    """The full hoisted 4-step reverse sampler (= e2e minus the teacher):
    batched KP once + 4 forwards + x-update math inside one scan.

    Diagnostics (wrong numerics, cost isolation only): ``noslice`` reuses
    step 0's kp slice every iteration (removes the per-step dynamic-slice
    copies of the stacked kp_all); ``extnoise`` passes init/step noises as
    consts (removes the in-graph jax.random.normal generation); ``exthoist``
    passes a pre-computed kp_all as consts (removes the in-graph hoist AND
    any layout conversion between the hoist's outputs and the pallas_call
    operands — args arrive in default layouts)."""
    from prodiff_tpu.models.fastdiff import (
        compute_hyperparams_given_schedule,
        fastdiff_step_kernels,
        prepare_inference_schedule,
        sampling_given_noise_schedule,
    )
    from prodiff_tpu.vocoders.fastdiff import NOISE_SCHEDULES

    net, params, cond, _ = _packed_net(B)
    dh = compute_hyperparams_given_schedule(np.linspace(1e-6, 0.01, 1000))
    bi, ai, si, steps = prepare_inference_schedule(
        NOISE_SCHEDULES[4], dh["alpha"])
    n = len(steps)

    if noslice:
        consts_ = tuple(
            jnp.asarray(v, jnp.float32) for v in (bi, ai, si, steps))

        def compute(rng, eps, c):
            kp_all = fastdiff_step_kernels(
                net, c, cond + eps, jnp.asarray(steps, jnp.float32))
            kp0 = (kp_all, jnp.int32(0))
            x = jax.random.normal(rng, (B, T_AUDIO))
            noises = jax.random.normal(
                jax.random.fold_in(rng, 1), (n, B, T_AUDIO))

            def body(x, inp):
                i, noise = inp
                ep = net.apply(
                    c, x[..., None], cond, jnp.full((B, 1), consts_[3][i]),
                    kp_out=kp0,
                )[..., 0]
                x = x - consts_[0][i] / jnp.sqrt(1 - consts_[1][i] ** 2) * ep
                x = x / jnp.sqrt(1 - consts_[0][i])
                x = jnp.where(i > 0, x + consts_[2][i] * noise, x)
                return x, None

            x, _ = jax.lax.scan(
                body, x, (jnp.arange(n - 1, -1, -1), noises))
            return x

        return bench._chain(compute, jax.random.PRNGKey(0), consts=params)

    if extnoise:
        rng0 = np.random.default_rng(9)
        init_noise = jnp.asarray(
            rng0.normal(size=(B, T_AUDIO, 1)), jnp.float32)
        step_noises = jnp.asarray(
            rng0.normal(size=(n, B, T_AUDIO, 1)), jnp.float32)

        def compute(rng, eps, c):
            p, ini, sn = c
            kp_all = fastdiff_step_kernels(
                net, p, cond + eps, jnp.asarray(steps, jnp.float32))
            return sampling_given_noise_schedule(
                lambda pp, x, c_, t, k: net.apply(pp, x, c_, t, kp_out=k),
                p, rng, T_AUDIO, cond + eps, bi, ai, si, steps,
                init_noise=ini, step_noises=sn, kp_all=kp_all,
            )

        return bench._chain(
            compute, jax.random.PRNGKey(0),
            consts=(params, init_noise, step_noises))

    if exthoist:
        kp_all0 = jax.jit(
            lambda p, c: fastdiff_step_kernels(
                net, p, c, jnp.asarray(steps, jnp.float32)))(params, cond)

        def compute(rng, eps, c):
            p, k = c
            return sampling_given_noise_schedule(
                lambda pp, x, c_, t, kk: net.apply(pp, x, c_, t, kp_out=kk),
                p, rng, T_AUDIO, cond + eps, bi, ai, si, steps, kp_all=k,
            )

        return bench._chain(
            compute, jax.random.PRNGKey(0), consts=(params, kp_all0))

    def compute(rng, eps, c):
        kp_all = fastdiff_step_kernels(
            net, c, cond + eps, jnp.asarray(steps, jnp.float32))
        return sampling_given_noise_schedule(
            lambda p, x, c_, t, k: net.apply(p, x, c_, t, kp_out=k),
            c, rng, T_AUDIO, cond + eps, bi, ai, si, steps, kp_all=kp_all,
        )

    return bench._chain(compute, jax.random.PRNGKey(0), consts=params)


def kernel_predictor(B, dtype):
    kp = KernelPredictor(conv_in_channels=32, conv_out_channels=64,
                         conv_layers=4, dtype=dtype)
    c = jnp.zeros((B, T_MEL, N_MELS + 0), jnp.float32)
    cond = jnp.asarray(np.random.default_rng(0).normal(size=(B, T_MEL, N_MELS)), jnp.float32)
    params = jax.jit(kp.init)(jax.random.PRNGKey(0), cond)

    def compute(rng, eps):
        k, b = kp.apply(params, cond + eps)
        return k.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()

    return chain(compute)


def kp_kernel_conv_only(B, dtype):
    """Just the 64->24576 k=3 conv (the KP's only real FLOPs)."""
    h = jnp.asarray(np.random.default_rng(0).normal(size=(B, T_MEL, 64)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(3, 64, 24576)) * 0.05, jnp.float32)

    def compute(rng, eps):
        y = jax.lax.conv_general_dilated(
            h + eps, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"))
        return y.sum()

    return chain(compute)


def kp_kernel_gemm_only(B, dtype):
    """Same contraction as kp_kernel_conv_only, spelled as tap-concat + GEMM."""
    h = jnp.asarray(np.random.default_rng(0).normal(size=(B, T_MEL, 64)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(192, 24576)) * 0.05, jnp.float32)

    def compute(rng, eps):
        x = h + eps
        xp = jnp.pad(x, [(0, 0), (1, 1), (0, 0)])
        taps = jnp.concatenate([xp[:, :-2], xp[:, 1:-1], xp[:, 2:]], axis=2)
        y = jnp.einsum("btk,ko->bto", taps, w, preferred_element_type=jnp.float32)
        return y.sum()

    return chain(compute)


def kp_residual_stack_only(B, dtype):
    """The KP's input conv + 6 residual convs at [B, 512, 64]."""
    rng0 = np.random.default_rng(2)
    c = jnp.asarray(rng0.normal(size=(B, T_MEL, N_MELS)), jnp.float32)
    w_in = jnp.asarray(rng0.normal(size=(5, N_MELS, 64)) * 0.1, jnp.float32)
    ws = [jnp.asarray(rng0.normal(size=(3, 64, 64)) * 0.1, jnp.float32) for _ in range(6)]

    def compute(rng, eps):
        h = jax.lax.conv_general_dilated(
            c + eps, w_in, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"))
        h = jax.nn.leaky_relu(h, 0.1)
        r = h
        for w in ws:
            r = jax.lax.conv_general_dilated(
                r, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"))
            r = jax.nn.leaky_relu(r, 0.1)
        return (h + r).sum()

    return chain(compute)


def lvc_block(B, dtype, n=2):
    """TimeAwareLVCBlock n (n=2 = the full-audio-rate hot block)."""
    ratios = (8, 8, 4)
    rate_in = T_AUDIO // int(np.prod(ratios[n:]))      # input rate
    rate_out = rate_in * ratios[n]
    cond_hop = int(np.prod(ratios[: n + 1]))
    blk = TimeAwareLVCBlock(
        in_channels=32, cond_channels=N_MELS, upsample_ratio=ratios[n],
        cond_hop_length=cond_hop, dtype=dtype,
    )
    rng0 = np.random.default_rng(1)
    x = jnp.asarray(rng0.normal(size=(B, rate_in, 32)), jnp.float32)
    ad = jnp.asarray(rng0.normal(size=(B, rate_out, 32)), jnp.float32)
    cond = jnp.asarray(rng0.normal(size=(B, T_MEL, N_MELS)), jnp.float32)
    emb = jnp.asarray(rng0.normal(size=(B, 512)), jnp.float32)
    params = jax.jit(blk.init)(jax.random.PRNGKey(0), x, ad, cond, emb)

    def compute(rng, eps):
        return blk.apply(params, x + eps, ad, cond, emb)

    return chain(compute)


def lvc_op_only(B, dtype):
    """The windowed-GEMM LVC at final-block scale (hop=256), x4 layers."""
    rng0 = np.random.default_rng(2)
    x = jnp.asarray(rng0.normal(size=(B, T_AUDIO, 32)), dtype or jnp.float32)
    kmat = jnp.asarray(rng0.normal(size=(B, T_MEL, 96, 64)), dtype or jnp.float32)
    bias = jnp.zeros((B, T_MEL, 64), dtype or jnp.float32)

    def compute(rng, eps):
        out = x + eps
        acc = jnp.float32(0)
        for _ in range(4):
            y = location_variable_convolution(out, kmat, bias, HOP)
            acc = acc + y.astype(jnp.float32).mean()
        return acc

    return chain(compute)


def fused_layers_staticbd(B, dtype):
    """DIAGNOSTIC (wrong numerics): one BD matrix reused for every window —
    isolates the per-window block-diagonal weight-construction cost from the
    per-window dots. If this is much faster than fused_layers, the VPU
    repeat/mask construction (not the GEMMs) is the kernel's bottleneck.
    main() restores the flag after the part is measured."""
    import prodiff_tpu.ops.pallas.ublock as ub

    ub._DIAG_STATIC_BD = True
    return fused_layers_only(B, dtype)


def fused_layers_only(B, dtype, wpb=None, merged_lvc=True, hop=None):
    """4 chained fused UBlock layers at final-block scale (the pallas path).
    ``hop`` overrides the block rate (e.g. 64 = block1 scale: the trunk then
    runs at T_AUDIO/16 rows)."""
    from prodiff_tpu.ops.packed import pack
    from prodiff_tpu.ops.pallas.ublock import ublock_layer_packed

    hop = HOP if hop is None else hop
    rows_total = T_MEL * hop // 4  # S: L*hop samples packed P=4
    rng0 = np.random.default_rng(4)
    x = jnp.asarray(rng0.normal(size=(B, rows_total, 128)), jnp.float32)
    ad = jnp.asarray(rng0.normal(size=(B, rows_total, 128)), jnp.float32)
    cks = [jnp.asarray(rng0.normal(size=(3, 32, 32)) * 0.1, jnp.float32) for _ in range(4)]
    cb = jnp.zeros((32,), jnp.float32)
    kmat = jnp.asarray(rng0.normal(size=(B, T_MEL, 96, 64)) * 0.1, jnp.float32)
    lb = jnp.zeros((B, T_MEL, 64), jnp.float32)

    def compute(rng, eps):
        cur = x + eps
        for i in range(4):
            cur = ublock_layer_packed(
                cur, ad, cks[i], cb, kmat, lb, dilation=3 ** i, hop=hop,
                wpb=wpb, merged_lvc=merged_lvc,
            )
        return cur

    return chain(compute)


def fused_layers_flatkp(B, dtype):
    """Like fused_layers, but kmat comes from the FLAT bf16 KernelPredictor
    layout exactly as _packed_forward consumes it (lane slice + reshape to
    [B, L, 96, 64]) — isolates the kflat slice/reshape/relayout + half-lane
    kmat DMA cost around the pallas calls."""
    from prodiff_tpu.ops.pallas.ublock import ublock_layer_packed

    rng0 = np.random.default_rng(4)
    x = jnp.asarray(rng0.normal(size=(B, T_AUDIO // 4, 128)), jnp.float32)
    ad = jnp.asarray(rng0.normal(size=(B, T_AUDIO // 4, 128)), jnp.float32)
    cks = [jnp.asarray(rng0.normal(size=(3, 32, 32)) * 0.1, jnp.float32) for _ in range(4)]
    cb = jnp.zeros((32,), jnp.float32)
    kwc = 3 * 32 * 64
    kflat = jnp.asarray(
        rng0.normal(size=(B, T_MEL, 4 * kwc)) * 0.1, jnp.bfloat16)
    lstack = jnp.zeros((B, T_MEL, 4 * 64), jnp.float32)

    def compute(rng, eps):
        cur = x + eps
        for i in range(4):
            km = jax.lax.slice_in_dim(kflat, i * kwc, (i + 1) * kwc, axis=2)
            km = km.reshape(B, T_MEL, 96, 64)
            lb = jax.lax.slice_in_dim(lstack, i * 64, (i + 1) * 64, axis=2)
            cur = ublock_layer_packed(
                cur, ad, cks[i], cb, km, lb, dilation=3 ** i, hop=HOP,
            )
        return cur

    return chain(compute)


def xla_layers_only(B, dtype):
    """The same 4 layers in the linen/XLA formulation (unpacked [T, 32])."""
    from prodiff_tpu.models.fastdiff import location_variable_convolution

    rng0 = np.random.default_rng(4)
    x = jnp.asarray(rng0.normal(size=(B, T_AUDIO, 32)), jnp.float32)
    ad = jnp.asarray(rng0.normal(size=(B, T_AUDIO, 32)), jnp.float32)
    cks = [jnp.asarray(rng0.normal(size=(3, 32, 32)) * 0.1, jnp.float32) for _ in range(4)]
    kmat = jnp.asarray(rng0.normal(size=(B, T_MEL, 96, 64)) * 0.1, jnp.float32)
    lb = jnp.zeros((B, T_MEL, 64), jnp.float32)

    def compute(rng, eps):
        cur = x + eps
        for i in range(4):
            cur = cur + ad
            y = jax.nn.leaky_relu(cur, 0.2)
            y = jax.lax.conv_general_dilated(
                y, cks[i], (1,), "SAME", rhs_dilation=(3 ** i,),
                dimension_numbers=("NWC", "WIO", "NWC"))
            y = jax.nn.leaky_relu(y, 0.2)
            y = location_variable_convolution(y, kmat, lb, HOP)
            cur = cur + jax.nn.sigmoid(y[..., :32]) * jnp.tanh(y[..., 32:])
        return cur

    return chain(compute)


def packed_edges(B, dtype, which="first"):
    """Packed pyramid boundary ops in isolation."""
    from prodiff_tpu.ops import packed as pk

    rng0 = np.random.default_rng(5)
    if which == "first":
        a = jnp.asarray(rng0.normal(size=(B, T_AUDIO)), jnp.float32)
        k = jnp.asarray(rng0.normal(size=(7, 1, 32)) * 0.1, jnp.float32)
        bias = jnp.zeros((32,), jnp.float32)

        def compute(rng, eps):
            return pk.packed_conv_from_flat(a + eps, k, bias, 4)

    elif which == "final":
        xp = jnp.asarray(rng0.normal(size=(B, T_AUDIO // 4, 128)), jnp.float32)
        k = jnp.asarray(rng0.normal(size=(7, 32, 1)) * 0.1, jnp.float32)
        bias = jnp.zeros((1,), jnp.float32)

        def compute(rng, eps):
            return pk.packed_conv_to_flat(xp + eps, k, bias, 32)

    elif which == "convt":
        xp = jnp.asarray(rng0.normal(size=(B, T_AUDIO // 16, 128)), jnp.float32)
        k = jnp.asarray(rng0.normal(size=(8, 32, 32)) * 0.1, jnp.float32)
        bias = jnp.zeros((32,), jnp.float32)

        def compute(rng, eps):
            return pk.packed_conv_transpose_packed_in(
                xp + eps, k, bias, stride=4, padding=2, output_padding=0, cin=32)

    elif which == "dblock":
        xp = jnp.asarray(rng0.normal(size=(B, T_AUDIO // 4, 128)), jnp.float32)
        ks = [jnp.asarray(rng0.normal(size=(3, 32, 32)) * 0.1, jnp.float32) for _ in range(3)]
        kr = jnp.asarray(rng0.normal(size=(32, 32)) * 0.1, jnp.float32)
        bias = jnp.zeros((32,), jnp.float32)

        def compute(rng, eps):
            down = pk.packed_downsample(xp + eps, 4, 32)
            res = pk.packed_dense(down, kr, bias, 32)
            h = down
            for j, d in enumerate([1, 2, 4]):
                h = jax.nn.leaky_relu(h, 0.2)
                h = pk.packed_conv3(h, ks[j], bias, d, 32)
            return h + res

    elif which == "downsample_unpacked":
        x = jnp.asarray(rng0.normal(size=(B, T_AUDIO, 32)), jnp.float32)

        def compute(rng, eps):
            y = x + eps
            return y[:, ::4] * 2.0

    elif which == "bconv_unpacked":
        from prodiff_tpu.ops.blocked_conv import blocked_dilated_conv

        x = jnp.asarray(rng0.normal(size=(B, T_AUDIO // 4, 32)), jnp.float32)
        ks = [jnp.asarray(rng0.normal(size=(3, 32, 32)) * 0.1, jnp.float32) for _ in range(3)]

        def compute(rng, eps):
            h = x + eps
            for j, d in enumerate([1, 2, 4]):
                h = blocked_dilated_conv(h, ks[j], dilation=d)
            return h

    elif which == "block1_xla":
        from prodiff_tpu.models.fastdiff import location_variable_convolution

        xp = jnp.asarray(rng0.normal(size=(B, T_AUDIO // 16, 128)), jnp.float32)
        adp = jnp.asarray(rng0.normal(size=(B, T_AUDIO // 16, 128)), jnp.float32)
        cks = [jnp.asarray(rng0.normal(size=(3, 32, 32)) * 0.1, jnp.float32) for _ in range(4)]
        kmat = jnp.asarray(rng0.normal(size=(B, T_MEL, 96, 64)) * 0.1, jnp.float32)
        lb = jnp.zeros((B, T_MEL, 64), jnp.float32)

        def compute(rng, eps):
            x = pk.unpack(xp + eps, 32)
            ad = pk.unpack(adp, 32)
            for i in range(4):
                x = x + ad
                y = jax.nn.leaky_relu(x, 0.2)
                y = jax.lax.conv_general_dilated(
                    y, cks[i], (1,), "SAME", rhs_dilation=(3 ** i,),
                    dimension_numbers=("NWC", "WIO", "NWC"))
                y = jax.nn.leaky_relu(y, 0.2)
                y = location_variable_convolution(y, kmat, lb, 64)
                x = x + jax.nn.sigmoid(y[..., :32]) * jnp.tanh(y[..., 32:])
            return pk.pack(x, 4)

    return chain(compute)


def fused_layers_sliced(B, dtype):
    """Like fused_layers, but kmat/bias come from slicing a [B, L, 4, 96, 64]
    stack per layer — mimics how _packed_forward consumes KernelPredictor
    output, to isolate operand-production cost around the pallas calls."""
    from prodiff_tpu.ops.pallas.ublock import ublock_layer_packed

    rng0 = np.random.default_rng(4)
    x = jnp.asarray(rng0.normal(size=(B, T_AUDIO // 4, 128)), jnp.float32)
    ad = jnp.asarray(rng0.normal(size=(B, T_AUDIO // 4, 128)), jnp.float32)
    cks = [jnp.asarray(rng0.normal(size=(3, 32, 32)) * 0.1, jnp.float32) for _ in range(4)]
    cb = jnp.zeros((32,), jnp.float32)
    kstack = jnp.asarray(rng0.normal(size=(B, T_MEL, 4, 96, 64)) * 0.1, jnp.float32)
    lstack = jnp.zeros((B, T_MEL, 4, 64), jnp.float32)

    def compute(rng, eps):
        cur = x + eps
        for i in range(4):
            cur = ublock_layer_packed(
                cur, ad, cks[i], cb, kstack[:, :, i], lstack[:, :, i],
                dilation=3 ** i, hop=HOP,
            )
        return cur

    return chain(compute)


def dblocks(B, dtype):
    net_blocks = [
        DiffusionDBlock(32, f, dtype=dtype, name=f"d{i}")
        for i, f in enumerate([4, 8, 8])
    ]
    rng0 = np.random.default_rng(3)
    x = jnp.asarray(rng0.normal(size=(B, T_AUDIO, 32)), jnp.float32)
    plist = []
    cur = x
    for blk in net_blocks:
        plist.append(jax.jit(blk.init)(jax.random.PRNGKey(0), cur))
        cur = jnp.zeros((B, cur.shape[1] // blk.factor, 32))

    def compute(rng, eps):
        cur = x + eps
        for blk, p in zip(net_blocks, plist):
            cur = blk.apply(p, cur)
        return cur

    return chain(compute)


def chain_floor(B, dtype):
    """Pure harness cost: [B,T,1] scalar-broadcast add + the mean readback."""
    x0 = jnp.asarray(np.random.default_rng(7).normal(size=(B, T_AUDIO, 1)), jnp.float32)

    def compute(rng, eps):
        return x0 + eps

    return chain(compute)


_BARE = dict(packed=True, max_blocks=0, skip_dconvs=True, skip_upsample=True)

PARTS = {
    "chain_floor": chain_floor,
    "bare_nokp": lambda B, d: full_net(B, d, skip_kp=True, **_BARE),
    "bare_nokp_noends": lambda B, d: full_net(
        B, d, skip_kp=True, skip_first=True, skip_final=True, skip_rdense=True, **_BARE),
    "bare_nokp_nofirst": lambda B, d: full_net(B, d, skip_kp=True, skip_first=True, **_BARE),
    "bare_nokp_nofinal": lambda B, d: full_net(B, d, skip_kp=True, skip_final=True, **_BARE),
    "full_net": full_net,
    "full_net_packed": lambda B, d: full_net(B, d, packed=True),
    "full_net_hoistkp": full_net_hoistkp,
    "kp_hoist4": kp_hoist4,
    "sampler_hoist4": sampler_hoist4,
    "sampler_hoist4_noslice": lambda B, d: sampler_hoist4(B, d, noslice=True),
    "sampler_hoist4_extnoise": lambda B, d: sampler_hoist4(B, d, extnoise=True),
    "sampler_hoist4_exthoist": lambda B, d: sampler_hoist4(B, d, exthoist=True),
    "full_net_packed_noublock": lambda B, d: full_net(B, d, packed=True, fused_min_hop=10**9),
    "full_net_packed_allfused": lambda B, d: full_net(B, d, packed=True, fused_min_hop=1),
    "packed_0blocks": lambda B, d: full_net(B, d, packed=True, max_blocks=0),
    "packed_0b_noconvt": lambda B, d: full_net(B, d, packed=True, max_blocks=0, skip_upsample=True),
    "packed_0b_nodconv": lambda B, d: full_net(B, d, packed=True, max_blocks=0, skip_dconvs=True),
    "packed_0b_bare": lambda B, d: full_net(B, d, packed=True, max_blocks=0, skip_dconvs=True, skip_upsample=True),
    "packed_1block": lambda B, d: full_net(B, d, packed=True, max_blocks=1),
    "packed_2blocks": lambda B, d: full_net(B, d, packed=True, max_blocks=2),
    "kernel_predictor": kernel_predictor,
    "kp_kernel_conv_only": kp_kernel_conv_only,
    "kp_kernel_gemm_only": kp_kernel_gemm_only,
    "kp_residual_stack_only": kp_residual_stack_only,
    "lvc_block2": lambda B, d: lvc_block(B, d, 2),
    "lvc_block1": lambda B, d: lvc_block(B, d, 1),
    "lvc_block0": lambda B, d: lvc_block(B, d, 0),
    "lvc_op_x4": lvc_op_only,
    "dblocks": dblocks,
    "fused_layers": fused_layers_only,
    "fused_layers_staticbd": fused_layers_staticbd,
    "fused_layers_pertap": lambda B, d: fused_layers_only(B, d, merged_lvc=False),
    "fused_layers_sliced": fused_layers_sliced,
    "fused_layers_flatkp": fused_layers_flatkp,
    "fused_layers_w32": lambda B, d: fused_layers_only(B, d, wpb=32),
    "fused_h64": lambda B, d: fused_layers_only(B, d, hop=64),
    "fused_h64_w32": lambda B, d: fused_layers_only(B, d, hop=64, wpb=32),
    "fused_h64_w8": lambda B, d: fused_layers_only(B, d, hop=64, wpb=8),
    "packed_full_nokp": lambda B, d: full_net(B, d, packed=True, skip_kp=True),
    "packed_fmh64": lambda B, d: full_net(B, d, packed=True, fused_min_hop=64),
    "packed_chain": lambda B, d: full_net(B, d, packed=True, padded_chain=True),
    "packed_mono": lambda B, d: full_net(B, d, packed=True, mono_block=True),
    "packed_full_noup": lambda B, d: full_net(B, d, packed=True, skip_upsample=True),
    "xla_layers": xla_layers_only,
    "pk_first": lambda B, d: packed_edges(B, d, "first"),
    "pk_final": lambda B, d: packed_edges(B, d, "final"),
    "pk_convt": lambda B, d: packed_edges(B, d, "convt"),
    "pk_dblock": lambda B, d: packed_edges(B, d, "dblock"),
    "pk_block1_xla": lambda B, d: packed_edges(B, d, "block1_xla"),
    "ds_unpacked": lambda B, d: packed_edges(B, d, "downsample_unpacked"),
    "bconv_unpacked": lambda B, d: packed_edges(B, d, "bconv_unpacked"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--dtypes", nargs="+", default=["f32"])
    ap.add_argument("--parts", nargs="+", default=list(PARTS))
    args = ap.parse_args()
    # several parts mutate module globals to select variants (full_net's
    # _FUSED_MIN_HOP / _SKIP_*, fused_layers_staticbd's _DIAG_STATIC_BD);
    # tracing happens inside measure(), so snapshot/restore around each part
    # keeps one part's knobs from silently poisoning every later part in the
    # default all-parts sweep.
    import prodiff_tpu.models.fastdiff as fd_mod
    import prodiff_tpu.ops.pallas.ublock as ub_mod

    import re

    knob = re.compile(r"^_[A-Z][A-Z0-9_]*$")  # _FUSED_MIN_HOP, _SKIP_*, ...

    def _globals_snapshot():
        return [
            (m, k, getattr(m, k))
            for m in (fd_mod, ub_mod)
            for k in list(vars(m))
            if knob.match(k)
        ]

    for part in args.parts:
        for b in args.b:
            for dt in args.dtypes:
                dtype = {"f32": None, "bf16": jnp.bfloat16}[dt]
                snap = _globals_snapshot()
                try:
                    measure(PARTS[part](b, dtype), f"{part} B={b} {dt}")
                except Exception as e:
                    print(f"{part} B={b} {dt}: FAILED {type(e).__name__}: {e}")
                finally:
                    for m, k, v in snap:
                        setattr(m, k, v)


if __name__ == "__main__":
    main()
