"""Space-to-depth ("packed") layout ops for waveform-rate nets.

FastDiff's trunk runs C=32 channels at audio rate; a [T, 32] f32 tensor tiles
(8, 128) on TPU with 96 of 128 lanes dead, so every materialised intermediate
costs 4x its logical HBM traffic (the round-2 verdict's top finding). These
ops keep the whole trunk in a packed [B, T/P, P*C] layout (P*C = 128 lanes
full) and express the reference ops (k=3 dilated conv, ConvTranspose1d,
nearest-downsample, 1x1 conv, k=7 edge convs) as shifted matmuls on packed
rows — no unpacking between layers.

Time order inside a packed row is little-endian: row i lane group p holds time
``i*P + p``, so ``x.reshape(B, T, C) <-> x.reshape(B, T//P, P*C)`` are
row-major-compatible views of the same logical tensor.

Reference semantics: ``modules/FastDiff/module/modules.py`` (LVC blocks,
DBlocks), ``FastDiff_model.py`` (pyramid wiring).

Output-dtype contract (deliberate, per call site): trunk-interior ops
(``packed_convk_prepared``, ``packed_conv_transpose_packed_in_prepared``)
return ``xp.dtype`` — the trunk's precision is the caller's choice and
prepared weights may be bf16 without downcasting the activations. EDGE ops
that inject/emit flat signals (``packed_conv_from_flat``,
``packed_strided_conv_from_flat_prepared``, ``packed_conv_to_flat_prepared``)
return ``kernel.dtype`` — the flat-KP/bf16-edge design emits directly in the
prepared precision (see models/fastdiff.py flat=True notes). Mixing the two
families means checking dtypes at the seam.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, T, C] -> [B, T//P, P*C] (row-major view change)."""
    b, t, c = x.shape
    assert t % p == 0, (t, p)
    return x.reshape(b, t // p, p * c)


def unpack(xp: jnp.ndarray, c: int) -> jnp.ndarray:
    """[B, S, P*C] -> [B, S*P, C]."""
    b, s, pc = xp.shape
    assert pc % c == 0
    return xp.reshape(b, s * (pc // c), c)


def shift_rows(xp: jnp.ndarray, q: int) -> jnp.ndarray:
    """out[i] = xp[i+q] with zero rows beyond either end."""
    if q == 0:
        return xp
    if q > 0:
        return jnp.pad(xp, [(0, 0), (0, q), (0, 0)])[:, q:]
    return jnp.pad(xp, [(0, 0), (-q, 0), (0, 0)])[:, :q]


def time_shift(xp: jnp.ndarray, s: int, c: int) -> jnp.ndarray:
    """Packed time shift: out_time[t] = in_time[t+s] (zeros out of range).

    A shift that is not a multiple of P combines a row shift with a lane
    rotation: out row i = [xp[i+q] lanes w*C.., xp[i+q+1] lanes ..w*C] where
    s = q*P + w.
    """
    pc = xp.shape[-1]
    p = pc // c
    q, w = divmod(s, p)  # python divmod: w in [0, p)
    if w == 0:
        return shift_rows(xp, q)
    a = shift_rows(xp, q)[:, :, w * c :]
    b = shift_rows(xp, q + 1)[:, :, : w * c]
    return jnp.concatenate([a, b], axis=-1)


# ---- odd-k dilated conv (SAME) on packed rows -------------------------------


@functools.lru_cache(maxsize=256)
def _convk_selector(taps: Tuple[int, ...], pack_: int) -> Tuple[np.ndarray, Tuple[int, ...]]:
    """S[qi, p_in, p_out, tap] for out_time = in_time + tap selection.
    Same construction as ops/blocked_conv.py's selector."""
    qs = sorted(
        {
            (p_out + t - p_in) // pack_
            for p_out in range(pack_)
            for p_in in range(pack_)
            for t in taps
            if (p_out + t - p_in) % pack_ == 0
        }
    )
    s = np.zeros((len(qs), pack_, pack_, len(taps)), np.float32)
    for qi, q in enumerate(qs):
        for p_out in range(pack_):
            for ti, t in enumerate(taps):
                src = p_out + t - q * pack_
                if 0 <= src < pack_:
                    s[qi, src, p_out, ti] = 1.0
    return s, tuple(qs)


def convk_taps(k: int, dilation: int) -> Tuple[int, ...]:
    """SAME-padding tap offsets of an odd-k dilated conv — THE tap-position
    convention every packed/fused conv in this framework shares (also
    consumed by ops/pallas/resblock.py); change it here or nowhere."""
    return tuple(dilation * (j - k // 2) for j in range(k))


def convk_row_offsets(k: int, dilation: int, pack_: int) -> Tuple[int, ...]:
    """The sparse packed-row offset set those taps reach at pack P."""
    _, qs = _convk_selector(convk_taps(k, dilation), pack_)
    return qs


def convk_mixing_matrices(
    kernel: jnp.ndarray, dilation: int, pack_: int
) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """Mixing matrices M[qi]: [P*Cin, P*Cout] for a packed odd-k dilated conv
    y_packed = sum_q shift_rows(x_packed, q) @ M[qi]. kernel: [k, Cin, Cout]
    (lax WIO layout), taps at ``dilation * (j - k//2)`` (SAME padding)."""
    k, cin, cout = kernel.shape
    assert k % 2 == 1, f"packed conv needs odd kernel (got {k})"
    s_np, qs = _convk_selector(convk_taps(k, dilation), pack_)
    m = jnp.einsum("qabt,tio->qaibo", jnp.asarray(s_np).astype(kernel.dtype), kernel)
    return m.reshape(len(qs), pack_ * cin, pack_ * cout), qs


# back-compat name (the FastDiff trunk is k=3 throughout)
def conv3_mixing_matrices(kernel, dilation, pack_):
    return convk_mixing_matrices(kernel, dilation, pack_)


def _convk_tap_range(k: int, dilation: int, pack_: int) -> Tuple[int, int]:
    qs = convk_row_offsets(k, dilation, pack_)
    return min(qs), max(qs)


def prepare_convk(
    kernel: jnp.ndarray, dilation: int, pack_: int
) -> jnp.ndarray:
    """Dense contiguous tap stack [nq, P*Cin, P*Cout] for
    :func:`packed_convk_prepared` (missing row offsets get zero matrices).

    Building this INSIDE the jitted forward makes XLA constant-fold the
    selector einsums against closure-captured params — measured ~300 MB
    executables and 500+ s cold compiles for the NSF generator; preparing
    once outside and passing the stacks as jit ARGUMENTS keeps programs
    small and cold starts fast.
    """
    m, qs = convk_mixing_matrices(kernel, dilation, pack_)
    k, cin, cout = kernel.shape
    qmin, qmax = _convk_tap_range(k, dilation, pack_)
    taps = []
    for q in range(qmin, qmax + 1):
        if q in qs:
            taps.append(m[qs.index(q)])
        else:
            taps.append(jnp.zeros((pack_ * cin, pack_ * cout), m.dtype))
    return jnp.stack(taps, axis=0)  # [nq, P*Cin, P*Cout]


def packed_convk_prepared(
    xp: jnp.ndarray,
    kern: jnp.ndarray,
    bias: jnp.ndarray | None,
    k: int,
    dilation: int,
    cin: int,
) -> jnp.ndarray:
    """Apply a :func:`prepare_convk` tap stack. k/dilation/cin are the
    ORIGINAL conv's static geometry (they pin the stack's row offsets)."""
    p = xp.shape[-1] // cin
    qmin, qmax = _convk_tap_range(k, dilation, p)
    out = jax.lax.conv_general_dilated(
        xp.astype(kern.dtype), kern, (1,), [(-qmin, qmax)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(xp.dtype)
    if bias is not None:
        out = out + jnp.tile(bias, p).astype(out.dtype)
    return out


def packed_convk(
    xp: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    dilation: int,
    cin: int,
) -> jnp.ndarray:
    """Odd-k dilated SAME conv, packed in / packed out.

    xp: [B, S, P*Cin]; kernel: [k, Cin, Cout]; -> [B, S, P*Cout].
    Equivalent to ``lax.conv_general_dilated(..., rhs_dilation=(d,),
    padding='SAME')`` on the unpacked tensor (ops/blocked_conv.py parity).

    Emitted as ONE row-space convolution against the selector-built mixing
    kernel [n_taps, P*Cin, P*Cout] — a shifted-matmul loop (one pad + einsum
    per row offset) leaves dozens of unfused pad/add ops in the TPU HLO and
    goes pure-traffic-bound (round-3 finding).
    """
    p = xp.shape[-1] // cin
    kern = prepare_convk(kernel, dilation, p)
    return packed_convk_prepared(
        xp, kern, bias, kernel.shape[0], dilation, cin
    )


def packed_conv3(xp, kernel, bias, dilation, cin):
    """Back-compat alias of :func:`packed_convk` (FastDiff's k=3 trunk)."""
    return packed_convk(xp, kernel, bias, dilation, cin)


# ---- 1x1 conv (dense per time step) -----------------------------------------


def packed_dense(xp: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None,
                 cin: int) -> jnp.ndarray:
    """Per-time-step dense [Cin -> Cout] without unpacking: one GEMM against
    kron(I_P, W). xp: [B, S, P*Cin]; w: [Cin, Cout]."""
    p = xp.shape[-1] // cin
    cout = w.shape[-1]
    bd = jnp.kron(jnp.eye(p, dtype=w.dtype), w)  # [P*Cin, P*Cout]
    out = jnp.einsum(
        "bsi,io->bso", xp, bd, preferred_element_type=jnp.float32
    ).astype(xp.dtype)
    if bias is not None:
        out = out + jnp.tile(bias, p).astype(out.dtype)
    return out


# ---- nearest-downsample (x[::f]) --------------------------------------------


@functools.lru_cache(maxsize=64)
def _downsample_selector(factor: int, p: int, c: int) -> np.ndarray:
    """0/1 matrix [factor*P*C, P*C]: output lane group g_out picks local time
    tau = g_out*factor (row offset tau//P, lane group tau%P), identity over C."""
    sel = np.zeros((factor * p * c, p * c), np.float32)
    for g_out in range(p):
        tau = g_out * factor
        for ci in range(c):
            sel[tau * c + ci, g_out * c + ci] = 1.0
    return sel


def packed_downsample(xp: jnp.ndarray, factor: int, c: int) -> jnp.ndarray:
    """x[:, ::factor] on packed input, packed output (same P).

    Every output row draws from exactly ``factor`` consecutive input rows
    (t_in for output row j spans [j*f*P, (j+1)*f*P)), so the whole op is a
    free row-merge reshape [B, S/f, f*P*C] + ONE selector GEMM — never a
    strided/lane slice: ``xp[:, ::m, :c]`` + repack lowers to a serial
    T(1,128) gather/dynamic-update-slice loop on TPU (round-3 finding; it
    alone cost ~x30 the roofline of the packed trunk's edge ops).
    """
    b, s, pc = xp.shape
    p = pc // c
    if factor == 1:
        return xp
    assert s % factor == 0, (s, factor)
    sel = jnp.asarray(_downsample_selector(factor, p, c), xp.dtype)
    xr = xp.reshape(b, s // factor, factor * pc)
    return jnp.einsum(
        "bsi,io->bso", xr, sel, preferred_element_type=jnp.float32
    ).astype(xp.dtype)


# ---- edge convs (k-tap, tiny channel ends) ----------------------------------


def packed_conv_from_flat(
    a: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None, p: int
) -> jnp.ndarray:
    """First conv: [B, T] scalar signal -> packed [B, T/P, P*Cout].

    kernel: [k, 1, Cout] (lax WIO, SAME padding, odd k). Expressed as a few
    [T/P, P] @ [P, P*Cout] matmuls (shifted packed-input rows against
    selector-built mixing matrices).
    """
    k, one, cout = kernel.shape
    assert one == 1 and k % 2 == 1
    half = k // 2
    b, t = a.shape
    assert t % p == 0
    a2 = a.reshape(b, t // p, p)
    qmin = -((half + p - 1) // p)
    qmax = (half + p - 1) // p
    taps = []
    for q in range(qmin, qmax + 1):
        # M_q[g, p_out*Cout + co] = kernel[tap+half] where tap = q*P + g - p_out
        sel = np.zeros((p, p, k), np.float32)
        for g in range(p):
            for p_out in range(p):
                tap = q * p + g - p_out
                if -half <= tap <= half:
                    sel[g, p_out, tap + half] = 1.0
        taps.append(
            jnp.einsum(
                "gpt,tio->gpio", jnp.asarray(sel, kernel.dtype), kernel
            ).reshape(p, p * cout)
        )
    kern = jnp.stack(taps, axis=0)  # [nq, P, P*Cout]
    out = jax.lax.conv_general_dilated(
        a2.astype(kern.dtype), kern, (1,), [(-qmin, qmax)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(kernel.dtype)
    if bias is not None:
        out = out + jnp.tile(bias, p).astype(out.dtype)
    return out


def packed_strided_conv_from_flat(
    a: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: int,
    padding: int,
    p: int,
) -> jnp.ndarray:
    """Strided conv on a flat scalar signal, packed output.

    a: [B, T]; kernel: [k, 1, Cout] (lax WIO, torch-style symmetric
    ``padding`` zeros); -> [B, T/(stride*P), P*Cout] — the packed view of the
    [B, T/stride, Cout] output. Requires T % (stride*P) == 0; windows may
    reach any number of neighbouring rows (the tap range covers it).

    Used for NSF-HiFiGAN's ``noise_convs`` (reference
    ``modules/nsf_hifigan/models.py:246-258``): the harmonic source stays a
    flat [B, T] array (full lanes) instead of a [B, T, 1] tensor that would
    tile at 1/128 lane occupancy.
    """
    kern = prepare_strided_conv_from_flat(kernel, stride, padding, p)
    return packed_strided_conv_from_flat_prepared(
        a, kern, bias, kernel.shape[0], stride, padding, p
    )


@functools.lru_cache(maxsize=256)
def _strided_flat_selector(
    k: int, stride: int, padding: int, p: int
) -> Tuple[np.ndarray, int, int]:
    """Selector [nd, stride*P, P, k] + (dmin, dmax) row-offset range.

    Output t_out = j*P + g draws sample m = g*stride - padding + u relative
    to row j's start; split m into (row delta, in-row position)."""
    sp_ = stride * p
    dmin = (0 - padding) // sp_
    dmax = ((p - 1) * stride - padding + k - 1) // sp_
    sel = np.zeros((dmax - dmin + 1, sp_, p, k), np.float32)
    for g in range(p):
        for u in range(k):
            m = g * stride - padding + u
            d, q = divmod(m, sp_)
            sel[d - dmin, q, g, u] = 1.0
    return sel, dmin, dmax


def prepare_strided_conv_from_flat(
    kernel: jnp.ndarray, stride: int, padding: int, p: int
) -> jnp.ndarray:
    """Row-conv kernel [nd, stride*P, P*Cout] for the prepared apply."""
    k, one, cout = kernel.shape
    assert one == 1
    # the prepared apply emits T/stride outputs; torch Conv1d emits
    # floor((T + 2*padding - k)/stride) + 1 — equal for all T % stride == 0
    # exactly when k == 2*padding + stride (the NSF noise-conv family).
    # Reject other geometries instead of fabricating zero-extended tails.
    assert k == 2 * padding + stride, (
        f"strided-flat conv geometry: need k == 2*padding + stride "
        f"(got k={k}, padding={padding}, stride={stride})"
    )
    sel, dmin, dmax = _strided_flat_selector(k, stride, padding, p)
    return jnp.einsum(
        "dqgu,uic->dqgc", jnp.asarray(sel, kernel.dtype), kernel
    ).reshape(dmax - dmin + 1, stride * p, p * cout)


def packed_strided_conv_from_flat_prepared(
    a: jnp.ndarray,
    kern: jnp.ndarray,
    bias: jnp.ndarray | None,
    k: int,
    stride: int,
    padding: int,
    p: int,
) -> jnp.ndarray:
    b, t = a.shape
    sp_ = stride * p
    assert t % sp_ == 0, (t, stride, p)
    rows = a.reshape(b, t // sp_, sp_)
    _, dmin, dmax = _strided_flat_selector(k, stride, padding, p)
    out = jax.lax.conv_general_dilated(
        rows.astype(kern.dtype),
        kern,
        (1,), [(-dmin, dmax)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(kern.dtype)
    if bias is not None:
        out = out + jnp.tile(bias, p).astype(out.dtype)
    return out


def prepare_conv_to_flat(kernel: jnp.ndarray, p: int) -> jnp.ndarray:
    """Tap stack [nq, P*Cin, P] for :func:`packed_conv_to_flat_prepared`."""
    k, cin, cout = kernel.shape
    assert cout == 1 and k % 2 == 1
    half = k // 2
    qmin = -((half + p - 1) // p)
    qmax = (half + p - 1) // p
    taps = []
    for q in range(qmin, qmax + 1):
        # M_q[p_in*Cin + ci, p_out] = kernel[tap+half, ci, 0], tap = p_in - p_out - q*P
        sel = np.zeros((p, p, k), np.float32)
        for p_in in range(p):
            for p_out in range(p):
                tap = q * p + p_in - p_out
                if -half <= tap <= half:
                    sel[p_in, p_out, tap + half] = 1.0
        taps.append(
            jnp.einsum(
                "abt,tio->aibo", jnp.asarray(sel, kernel.dtype), kernel
            ).reshape(p * cin, p)
        )
    return jnp.stack(taps, axis=0)  # [nq, P*Cin, P]


def packed_conv_to_flat_prepared(
    xp: jnp.ndarray, kern: jnp.ndarray, bias: jnp.ndarray | None, k: int,
    cin: int,
) -> jnp.ndarray:
    half = k // 2
    b, s, pc = xp.shape
    p = pc // cin
    qmin = -((half + p - 1) // p)
    qmax = (half + p - 1) // p
    out = jax.lax.conv_general_dilated(
        xp.astype(kern.dtype), kern, (1,), [(-qmin, qmax)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(kern.dtype)
    if bias is not None:
        out = out + bias[0].astype(out.dtype)
    return out.reshape(b, s * p)


def packed_conv_to_flat(
    xp: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None, cin: int
) -> jnp.ndarray:
    """Final conv: packed [B, S, P*Cin] -> [B, S*P] (Cout=1, odd k, SAME)."""
    p = xp.shape[-1] // cin
    kern = prepare_conv_to_flat(kernel, p)
    return packed_conv_to_flat_prepared(xp, kern, bias, kernel.shape[0], cin)


# ---- ConvTranspose1d (torch semantics), packed output -----------------------


def packed_conv_transpose(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: int,
    padding: int,
    output_padding: int,
    p: int,
) -> jnp.ndarray:
    """torch ConvTranspose1d with kernel stored pre-flipped [k, Cin, Cout]
    (ConvTranspose1dTorch's layout), unpacked input [B, S, Cin] -> packed
    output [B, S*stride/P, P*Cout].

    Identity used: y[t] = sum_j x[j] @ kernel[u] with u = stride*j - t + pad,
    pad = k - 1 - padding (the lhs-dilated-conv formulation in
    models/fastdiff.py:ConvTranspose1dTorch). Computed as an overlap-add of
    per-sample contributions split into stride-sized half-windows, which are
    row-major reshape + packed time-shift — no unpacked audio-rate tensor is
    ever materialised.
    """
    k, cin, cout = kernel.shape
    assert k == 2 * stride, "FastDiff upsamples use kernel_size == 2*stride"
    b, s, _ = x.shape
    pad = k - 1 - padding
    t_out = s * stride
    # this op emits exactly S*stride samples; torch emits
    # (S-1)*stride - 2*padding + k + output_padding — reject geometries where
    # they differ instead of silently truncating/extending the tail
    assert (s - 1) * stride - 2 * padding + k + output_padding == t_out, (
        f"conv-transpose geometry emits "
        f"{(s - 1) * stride - 2 * padding + k + output_padding} samples, "
        f"packed op emits {t_out} (stride={stride}, k={k}, padding={padding},"
        f" output_padding={output_padding})"
    )
    # Identity (the lhs-dilated lax formulation in ConvTranspose1dTorch):
    #   y[t] = sum_u xd[t + u - pad] kernel[u],  xd[stride*j] = x[j]
    # so x[j] contributes x[j] @ kernel[u] at t = stride*j + pad - u — i.e. in
    # INCREASING t the kernel is traversed REVERSED. Build per-sample windows
    # in increasing-t order with the flipped kernel:
    kf = kernel[::-1]  # v -> t = stride*j + pad - (k-1) + v
    k2 = kf.transpose(1, 0, 2).reshape(cin, k * cout)
    contrib = jnp.einsum(
        "bsi,io->bso", x, k2, preferred_element_type=jnp.float32
    ).astype(x.dtype)  # [B, S, k*Cout], window start stride*j + pad - (k-1)
    # overlap-add of stride-sized half-windows; each half is a row-major
    # reshape to an audio-rate stream, then a packed time shift:
    #   y[t] = E[t - (pad-k+1)] + F[t - (pad-k+1) - stride]
    # with pad-k+1 = -padding  =>  shifts s_E = padding, s_F = padding-stride.
    e = contrib[:, :, : stride * cout].reshape(b, s * stride, cout)
    f = contrib[:, :, stride * cout :].reshape(b, s * stride, cout)
    ep = pack(e, p)
    fp = pack(f, p)
    y = time_shift(ep, padding, cout)[:, : t_out // p]
    y = y + time_shift(fp, padding - stride, cout)[:, : t_out // p]
    if bias is not None:
        y = y + jnp.tile(bias, p).astype(y.dtype)
    return y


def packed_conv_transpose_packed_in(
    xp: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: int,
    padding: int,
    output_padding: int,
    cin: int,
) -> jnp.ndarray:
    """Same as :func:`packed_conv_transpose` but with PACKED input
    [B, S/P, P*Cin] (no unpacked low-rate tensor is materialised). Output is
    packed at the upsampled rate, same P.

    Formulated as ONE row-space convolution at the INPUT row rate producing
    phase-major lanes [B, S, stride*P*Cout], then a free row-split reshape to
    the upsampled packed stream. No zero-stuffed dilated intermediate is ever
    materialised (the spread einsum's tiny contraction lowered to
    broadcast-multiply-reduce traffic at the output rate, round-3 finding).

    Identity (kernel stored pre-flipped, ConvTranspose1dTorch's layout):
    y[t] = sum_j x[j] @ kernel[u], u = stride*j - t + pad, pad = k-1-padding.
    Output row i = J*stride + phi covers t = i*P + p_out; input sample
    j = (J+delta)*P + p_in; so u = stride*P*delta + stride*p_in - phi*P
    - p_out + pad, independent of J -> a [n_delta, P*Cin, stride*P*Cout]
    row-conv kernel."""
    # emits exactly S*stride samples == torch's (S-1)*stride - 2*padding + k
    # + output_padding only under this identity; reject silent tail mismatch
    assert output_padding == stride + 2 * padding - kernel.shape[0], (
        f"conv-transpose geometry mismatch: need output_padding == stride + "
        f"2*padding - k (got stride={stride}, padding={padding}, "
        f"k={kernel.shape[0]}, output_padding={output_padding})"
    )
    p = xp.shape[-1] // cin
    kern = prepare_conv_transpose_packed_in(kernel, stride, padding, p)
    return packed_conv_transpose_packed_in_prepared(
        xp, kern, bias, kernel.shape[0], stride, padding, cin
    )


@functools.lru_cache(maxsize=256)
def _convt_selector(
    k: int, stride: int, padding: int, p: int
) -> Tuple[np.ndarray, int, int]:
    """Selector [nd, P, stride, P, k] + trimmed (dmin, dmax) for the
    packed-in transposed conv."""
    pad = k - 1 - padding
    sp_p = stride * p
    # delta range from 0 <= u < k over all (p_in, phi, p_out)
    dmin = -(((stride - 1) * p + (p - 1) + pad - 0) // sp_p)
    dmax = (k - 1 + (stride - 1) * p + (p - 1) - pad) // sp_p + 1
    sel = []
    for d in range(dmin, dmax + 1):
        s_d = np.zeros((p, stride, p, k), np.float32)
        for p_in in range(p):
            for phi in range(stride):
                for p_out in range(p):
                    u = sp_p * d + stride * p_in - phi * p - p_out + pad
                    if 0 <= u < k:
                        s_d[p_in, phi, p_out, u] = 1.0
        if s_d.any() or dmin < d < dmax:
            sel.append((d, s_d))
    while sel and not sel[0][1].any():
        sel.pop(0)
    while sel and not sel[-1][1].any():
        sel.pop()
    sel_np = np.stack([s for _, s in sel], axis=0)  # [nd, P, stride, P, k]
    return sel_np, sel[0][0], sel[-1][0]


def prepare_conv_transpose_packed_in(
    kernel: jnp.ndarray, stride: int, padding: int, p: int
) -> jnp.ndarray:
    """Row-conv kernel [nd, P*Cin, stride*P*Cout] for the prepared apply."""
    k, cin, cout = kernel.shape
    sel_np, dmin, dmax = _convt_selector(k, stride, padding, p)
    # -> [nd, p_in, cin, phi, p_out, cout]: lane order phase-major so the
    # final [B, S, stride*P*Cout] -> [B, S*stride, P*Cout] reshape is free
    kern = jnp.einsum(
        "dnfou,uic->dnifoc", jnp.asarray(sel_np, kernel.dtype), kernel
    )
    return kern.reshape(len(sel_np), p * cin, stride * p * cout)


def packed_conv_transpose_packed_in_prepared(
    xp: jnp.ndarray,
    kern: jnp.ndarray,
    bias: jnp.ndarray | None,
    k: int,
    stride: int,
    padding: int,
    cin: int,
) -> jnp.ndarray:
    assert k == 2 * stride
    b, sp_, pc = xp.shape
    p = pc // cin
    cout = kern.shape[-1] // (stride * p)
    _, dmin, dmax = _convt_selector(k, stride, padding, p)
    y = jax.lax.conv_general_dilated(
        xp.astype(kern.dtype),
        kern,
        (1,), [(-dmin, dmax)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(xp.dtype)
    y = y.reshape(b, sp_ * stride, p * cout)
    if bias is not None:
        y = y + jnp.tile(bias, p).astype(y.dtype)
    return y
