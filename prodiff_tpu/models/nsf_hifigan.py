"""NSF-HiFiGAN generator (reference ``modules/nsf_hifigan/models.py:39-297``).

TPU-first design notes:

- Layout is [B, T, C] (NWC) so every conv maps straight onto the MXU.
- ``SineGen``'s float64 sample-rate cumsum (``models.py:136-171``) is replaced
  by an exactly-equivalent frame-level formulation that never loses precision
  in float32 (TPU has no f64): the per-sample phase within frame f is
  ``base_f + (i+1) * rad_f`` with ``base_f`` carried mod 1 through a
  ``lax.scan`` over frames (<=1548 steps, trivially cheap). Since
  ``sin(2*pi*x)`` only depends on x mod 1, this equals the reference's
  double-precision sample-rate cumsum.
- Transposed convs are expressed as input-dilated convs with torch-equivalent
  padding so converted checkpoints are drop-in.
- Weight-norm is folded at conversion time (the reference removes it at load,
  ``models.py:290-297``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1

# Fat-N dot chunk for the fused resblock kernel (ops/pallas/resblock.py):
# > 0 makes prepare_packed_trunk_params emit the WIDE [CL, sum_nq*CL] tap
# layout and each conv contracts `chunk` taps per [E, CL] @ [CL, chunk*CL]
# dot (output-side tap shifts) instead of nq per-tap dots. The trunk
# auto-detects the layout from the prepared weight shape, so prepared trees
# built under either setting keep working. MEASURED NEGATIVE on v5e
# (prepared generator B=1: 4.44/4.45/4.50 ms at chunk 2/4/8 vs 4.42
# per-tap) — the per-tap dots are not setup-bound, and the misaligned tap
# shifts cost the same on the output side as on the input side. 0 =
# per-tap (default); kept as a parity-tested study path.
_RES_FAT_CHUNK = 0


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class Conv1d(nn.Module):
    """Conv with torch-style explicit symmetric padding. x: [B, T, C]."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: int = 0
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=[(self.padding, self.padding)],
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvTranspose1d(nn.Module):
    """torch ConvTranspose1d equivalent via input dilation.

    Output length = T*stride when (kernel-stride) is even and
    padding=(kernel-stride)//2, matching the reference's upsamplers.
    The kernel param is stored pre-flipped as [k, Cin, Cout] (the converter
    flips the torch weight), so the forward pass is a single
    ``conv_general_dilated`` with ``lhs_dilation``.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.normal(0.01),
            (self.kernel_size, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(
                self.channels, self.kernel_size, dilation=d,
                padding=get_padding(self.kernel_size, d), dtype=self.dtype,
                name=f"convs1_{i}",
            )(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = Conv1d(
                self.channels, self.kernel_size, dilation=1,
                padding=get_padding(self.kernel_size, 1), dtype=self.dtype,
                name=f"convs2_{i}",
            )(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(
                self.channels, self.kernel_size, dilation=d,
                padding=get_padding(self.kernel_size, d), dtype=self.dtype,
                name=f"convs_{i}",
            )(xt)
            x = xt + x
        return x


def _sine_planar(
    f0: jnp.ndarray,
    upp: int,
    sampling_rate: int,
    harmonic_num: int,
    rng_ini: Optional[jax.Array],
    samplewise_ini: bool = False,
) -> jnp.ndarray:
    """Raw harmonic sines in planar [B, T_frames, D, upp] layout.

    The per-sample axis (upp >= 128) sits on lanes, so the 2.4M-sample
    transcendental runs at full lane occupancy; the [B, T, D=9] interleaved
    layout is only formed by :func:`sine_gen` when a consumer needs it.

    ``samplewise_ini`` reproduces the parallel_wavegan-style source
    (models/hifigan.py:sine_gen_samplewise, torch ``source.py:59-84``) where
    the random initial phase enters ONCE as the phase-cumsum's starting value
    (a [B, D] draw); the default reproduces the NSF ``SineGen`` where it is
    added to frame 0's per-sample increment (a [1, D] draw scaled by the
    within-frame sample index, ``models.py:136-171``).
    """
    b, t_frames = f0.shape
    dim = harmonic_num + 1

    harmonics = jnp.arange(1, dim + 1, dtype=jnp.float32)[None, None, :]
    rad = jnp.mod(f0[:, :, None] * harmonics / sampling_rate, 1.0)  # [B, T_f, D]
    carry0 = jnp.zeros((b, dim))
    if rng_ini is not None:
        rand_ini = jax.random.uniform(rng_ini, (b if samplewise_ini else 1, dim))
        rand_ini = rand_ini.at[:, 0].set(0.0)
        if samplewise_ini:
            carry0 = carry0 + rand_ini
        else:
            rad = rad.at[:, 0, :].add(rand_ini)

    # frame-start phases mod 1, exact in f32 thanks to the bounded carry
    frame_inc = jnp.mod(rad * upp, 1.0)  # [B, T_f, D]

    def step(carry, inc):
        new = jnp.mod(carry + inc, 1.0)
        return new, carry

    _, base = jax.lax.scan(step, carry0, jnp.moveaxis(frame_inc, 1, 0))
    base = jnp.moveaxis(base, 0, 1)  # [B, T_f, D] phase at each frame START

    within = (jnp.arange(upp, dtype=jnp.float32) + 1.0)[None, None, None, :]  # [1,1,1,upp]
    phase = base[..., None] + within * rad[..., None]  # [B, T_f, D, upp]
    return jnp.sin(2 * jnp.pi * phase)


def sine_gen(
    f0: jnp.ndarray,
    upp: int,
    sampling_rate: int,
    harmonic_num: int,
    rng: Optional[jax.Array],
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
) -> jnp.ndarray:
    """Harmonic sine source at sample rate. f0: [B, T_frames] -> [B, T_frames*upp, H+1].

    Equivalent to the reference ``SineGen`` (``models.py:103-189``): random
    initial phase per overtone (fundamental fixed at 0), per-frame phase
    increments repeated per sample, uv gating with noise floor.

    ``rng=None`` renders deterministically: zero initial overtone phases and
    zero additive noise (reproducible synthesis; also the configuration the
    torch reference collapses to with patched randomness, which the
    whole-pipeline MCD cross-check relies on).
    """
    b, t_frames = f0.shape
    dim = harmonic_num + 1
    if rng is not None:
        rng_ini, rng_noise = jax.random.split(rng)
    else:
        rng_ini = None
    sines = _sine_planar(f0, upp, sampling_rate, harmonic_num, rng_ini)
    # [B, T_f, D, upp] -> [B, T_f*upp, D]
    sines = sines.transpose(0, 1, 3, 2).reshape(b, t_frames * upp, dim)

    uv = (f0 > voiced_threshold).astype(jnp.float32)[:, :, None]  # [B, T_f, 1]
    uv = jnp.repeat(uv, upp, axis=1)  # nearest upsample
    if rng is None:
        return sines * sine_amp * uv
    noise_amp = uv * noise_std + (1 - uv) * sine_amp / 3
    noise = noise_amp * jax.random.normal(rng_noise, sines.shape)
    return sines * sine_amp * uv + noise


def flat_har_source(
    f0: jnp.ndarray,
    upp: int,
    sampling_rate: int,
    harmonic_num: int,
    rng: Optional[jax.Array],
    w: jnp.ndarray,
    bias: jnp.ndarray,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
    samplewise_ini: bool = False,
) -> jnp.ndarray:
    """SourceModuleHnNSF (sine_gen -> l_linear -> tanh) emitting a FLAT [B, T].

    w/bias: the module's ``l_linear`` params ([D, 1] / [1]). The D harmonics
    are contracted in the planar [B, T_f, D, upp] layout, so neither the
    [B, T, 9] sine tensor (9/128 lanes -> 134 MB physical at T=262k) nor the
    [B, T, 1] merged tensor (1/128 lanes) is ever materialised.

    Exactly equal to the linen module when ``rng is None``. With noise, the
    l_linear projection of the D iid noise channels is drawn directly as one
    channel at std ``||w||_2`` — equal in distribution (a linear map of iid
    gaussians), 9x less RNG, different realisation.

    ``samplewise_ini`` selects the parallel_wavegan initial-phase semantics
    (see :func:`_sine_planar`) used by models/hifigan.py's source.
    """
    b, t_frames = f0.shape
    if rng is not None:
        rng_ini, rng_noise = jax.random.split(rng)
    else:
        rng_ini = None
    sines = _sine_planar(
        f0, upp, sampling_rate, harmonic_num, rng_ini, samplewise_ini
    )
    uv = (f0 > voiced_threshold).astype(jnp.float32)[:, :, None]  # [B, T_f, 1]
    m = jnp.einsum("btdu,d->btu", sines, w[:, 0]) * sine_amp * uv
    if rng is not None:
        wnorm = jnp.sqrt(jnp.sum(w[:, 0] ** 2))
        noise_amp = (uv * noise_std + (1 - uv) * sine_amp / 3) * wnorm
        m = m + noise_amp * jax.random.normal(rng_noise, m.shape)
    return jnp.tanh(m + bias[0]).reshape(b, t_frames * upp)


class SourceModuleHnNSF(nn.Module):
    sampling_rate: int
    harmonic_num: int = 8
    sine_amp: float = 0.1
    add_noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(
        self, f0: jnp.ndarray, upp: int, deterministic: bool = False
    ) -> jnp.ndarray:
        rng = None if deterministic else self.make_rng("noise")
        sines = sine_gen(
            f0, upp, self.sampling_rate, self.harmonic_num, rng,
            self.sine_amp, self.add_noise_std, self.voiced_threshold,
        )
        merged = nn.Dense(1, name="l_linear")(sines)
        return jnp.tanh(merged)  # [B, T_samples, 1]


class Generator(nn.Module):
    """h: the vocoder's config.json dict (openvpi NSF-HiFiGAN layout)."""

    num_mels: int = 128
    sampling_rate: int = 44100
    upsample_initial_channel: int = 512
    upsample_rates: Sequence[int] = (8, 8, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4, 4)
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    # packed trunk: run the low-channel upsample stages (C < 128) in the
    # space-to-depth [B, T/P, 128] layout (ops/packed.py), the noise convs
    # against a flat [B, T] harmonic source. None = auto (on for TPU
    # inference). Pure XLA — differentiable and CPU-capable, but only a win
    # where lane padding dominates.
    use_packed: Optional[bool] = None
    dtype: jnp.dtype = None

    @classmethod
    def from_config(cls, h: dict, dtype=None, use_packed=None) -> "Generator":
        return cls(
            num_mels=h["num_mels"],
            sampling_rate=h["sampling_rate"],
            upsample_initial_channel=h["upsample_initial_channel"],
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            resblock=str(h["resblock"]),
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(map(tuple, h["resblock_dilation_sizes"])),
            use_packed=use_packed,
            dtype=dtype,
        )

    @property
    def upp(self) -> int:
        return int(np.prod(self.upsample_rates))

    def _stage_packs(self) -> Tuple[int, ...]:
        return hifigan_stage_packs(
            self.upsample_initial_channel, len(self.upsample_rates)
        )

    def _packed_supported(self, t_mel: int) -> bool:
        return packed_trunk_supported(
            t_mel,
            rates=self.upsample_rates,
            ksizes=self.upsample_kernel_sizes,
            init_ch=self.upsample_initial_channel,
            resblock=self.resblock,
            res_ksizes=self.resblock_kernel_sizes,
            has_source=True,
        )

    @nn.compact
    def __call__(
        self,
        mel: jnp.ndarray,
        f0: Optional[jnp.ndarray] = None,
        har_source: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
    ) -> jnp.ndarray:
        """mel: [B, T, M] (natural-log scale); f0: [B, T] Hz -> wav [B, T*upp]."""
        num_kernels = len(self.resblock_kernel_sizes)
        use_packed = self.use_packed
        if use_packed is None:
            # auto: packed trunk on TPU backends; CPU keeps linen (the
            # mixing-matrix GEMMs only pay off where lane padding dominates)
            use_packed = jax.devices()[0].platform in ("tpu", "axon")
        if (
            use_packed
            and not self.is_initializing()
            and self._packed_supported(mel.shape[1])
        ):
            return _packed_forward(self, mel, f0, har_source, deterministic)
        if har_source is None:
            har_source = SourceModuleHnNSF(
                self.sampling_rate, harmonic_num=8, name="m_source"
            )(f0, self.upp, deterministic=deterministic)  # [B, T*upp, 1]

        x = Conv1d(
            self.upsample_initial_channel, 7, padding=3, dtype=self.dtype,
            name="conv_pre",
        )(mel)
        resblock_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            c_cur = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(
                c_cur, k, stride=u, padding=(k - u) // 2, dtype=self.dtype,
                name=f"ups_{i}",
            )(x)
            if i + 1 < len(self.upsample_rates):
                stride_f0 = int(np.prod(self.upsample_rates[i + 1:]))
                x_source = Conv1d(
                    c_cur, stride_f0 * 2, stride=stride_f0,
                    padding=stride_f0 // 2, dtype=self.dtype,
                    name=f"noise_convs_{i}",
                )(har_source)
            else:
                x_source = Conv1d(c_cur, 1, dtype=self.dtype, name=f"noise_convs_{i}")(har_source)
            x = x + x_source
            xs = 0.0
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                xs = xs + resblock_cls(
                    c_cur, rk, tuple(rd), dtype=self.dtype,
                    name=f"resblocks_{i * num_kernels + j}",
                )(x)
            x = xs / num_kernels
        x = nn.leaky_relu(x)  # torch default slope 0.01 here (reference :284)
        x = Conv1d(1, 7, padding=3, dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]  # [B, T*upp]


# ---- packed (space-to-depth) execution path ---------------------------------


def hifigan_stage_packs(init_ch: int, n_stages: int) -> Tuple[int, ...]:
    """Packing factor per upsample stage (1 = plain [B, T, C] layout)."""
    packs = []
    for i in range(n_stages):
        c = init_ch // (2 ** (i + 1))
        packs.append(128 // c if (c < 128 and 128 % c == 0) else 1)
    return tuple(packs)


def packed_trunk_supported(
    t_mel: int,
    *,
    rates: Sequence[int],
    ksizes: Sequence[int],
    init_ch: int,
    resblock: str,
    res_ksizes: Sequence[int],
    has_source: bool,
) -> bool:
    """Architecture + shape gate for the packed HiFiGAN-family trunk
    (default openvpi config: 512ch, rates 8/8/2/2/2, k=2*rate, ResBlock1
    k=3/7/11; also the 128ch plain-HiFiGAN config)."""
    n = len(rates)
    if str(resblock) != "1":
        return False
    if any(k != 2 * u for u, k in zip(rates, ksizes)):
        return False
    if any(rk % 2 == 0 for rk in res_ksizes):
        return False
    packs = hifigan_stage_packs(init_ch, n)
    if packs[-1] <= 1:
        return False  # nothing to pack
    t_audio = t_mel * int(np.prod(rates))
    p_prev, t_cur = 1, t_mel
    for i, (u, p) in enumerate(zip(rates, packs)):
        t_cur *= u
        if p < p_prev or (p > 1 and p % p_prev != 0):
            return False
        if t_cur % p != 0:
            return False
        if has_source:
            # noise-conv geometry (k = 2*stride except the last 1x1)
            if i + 1 < n:
                s_f0 = int(np.prod(rates[i + 1:]))
            else:
                s_f0 = 1
            p_n = p if p > 1 else 2
            if t_audio % (s_f0 * p_n) != 0:
                return False
        p_prev = p
    return True


def packed_hifigan_trunk(
    params,
    mel: jnp.ndarray,
    har: Optional[jnp.ndarray],
    *,
    rates: Sequence[int],
    ksizes: Sequence[int],
    init_ch: int,
    res_ksizes: Sequence[int],
    res_dsizes: Sequence[Sequence[int]],
    dtype: Optional[jnp.dtype] = None,
    prepared: bool = False,
) -> jnp.ndarray:
    """HiFiGAN-family pyramid (conv_pre .. conv_post) with the low-channel
    stages packed. mel: [B, T, M]; har: flat [B, T_audio] source or None
    (plain HiFiGAN without pitch embedding) -> wav [B, T_audio].

    The C >= 128 stages run as plain lax convs — they are already full-lane;
    everything downstream of the first C < 128 stage stays in the packed
    [B, T/P, 128] layout: the transposed convs as phase-major row convs (the
    P->2P repack as channels halve is a free row-merge reshape), the
    resblocks as selector-GEMM packed convs (ops/packed.py:packed_convk),
    the noise convs against the FLAT [B, T] harmonic source, and conv_post
    straight from packed to flat audio. No partial-lane audio-rate tensor is
    ever materialised — an unpacked [T, 16] f32 stage tensor costs 8x its
    logical HBM traffic, and the measured v5e stage profile (tools/
    profile_nsf.py) put 17.6 of the linen generator's 21.2 ms in the C < 128
    resblocks + the lhs-dilated stage-2 convT this replaces.

    ``dtype=jnp.bfloat16`` runs the trunk activations/weights in bf16 with
    f32 accumulation (params stay f32 in HBM; casts happen at use). The trunk
    is traffic-bound, so this is ~2x on the packed stages.

    ``prepared=True``: ``params`` is a :func:`prepare_packed_trunk_params`
    tree — the selector-GEMM kernels are already in row-conv form (built
    once OUTSIDE jit). Building them in-graph against closure-captured params
    makes XLA constant-fold them into the executable: measured ~300 MB
    programs and 500+ s cold compiles for this generator. Prepared trees
    should be passed as jit ARGUMENTS. ``dtype`` must be baked at prepare
    time in this mode.
    """
    from prodiff_tpu.ops import packed as pk

    assert not (prepared and dtype is not None), "bake dtype at prepare time"
    b, t_mel = mel.shape[0], mel.shape[1]
    num_kernels = len(res_ksizes)
    n_up = len(rates)
    packs = hifigan_stage_packs(init_ch, n_up)

    def conv_p(name):
        cp = params[name]["conv"]
        if dtype is not None:
            return cp["kernel"].astype(dtype), cp["bias"].astype(dtype)
        return cp["kernel"], cp["bias"]

    def _cast(t):
        return t.astype(dtype) if dtype is not None else t

    k_pre, b_pre = conv_p("conv_pre")
    x = (
        jax.lax.conv_general_dilated(
            mel.astype(k_pre.dtype), k_pre, (1,), [(3, 3)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        + b_pre
    )

    p_prev = 1
    c_cur = init_ch
    for i, (u, k) in enumerate(zip(rates, ksizes)):
        c_cur = init_ch // (2 ** (i + 1))
        p_cur = packs[i]
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        upk = params[f"ups_{i}"]
        if p_cur > 1:
            kern = (
                upk["kernel"] if prepared
                else pk.prepare_conv_transpose_packed_in(
                    _cast(upk["kernel"]), u, (k - u) // 2, p_prev
                )
            )
            x = pk.packed_conv_transpose_packed_in_prepared(
                x, kern, _cast(upk["bias"]), k, stride=u,
                padding=(k - u) // 2, cin=x.shape[-1] // p_prev,
            )  # [B, rows*u, p_prev*c_cur]
            m = p_cur // p_prev  # repack: free row-merge reshape
            if m > 1:
                x = x.reshape(b, x.shape[1] // m, m * x.shape[2])
        else:
            pad = k - 1 - (k - u) // 2
            x = (
                jax.lax.conv_general_dilated(
                    x, _cast(upk["kernel"]), (1,), [(pad, pad)],
                    lhs_dilation=(u,),
                    dimension_numbers=("NWC", "WIO", "NWC"),
                )
                + _cast(upk["bias"])
            )
        if har is not None:
            # noise conv from the flat source (a lane-padded [B, T, 1] input
            # would read 128x its logical bytes)
            kn, bn = conv_p(f"noise_convs_{i}")
            if i + 1 < n_up:
                stride_f0 = int(np.prod(rates[i + 1:]))
                kn_k, pad_n = 2 * stride_f0, stride_f0 // 2
            else:
                stride_f0, kn_k, pad_n = 1, 1, 0
            p_n = p_cur if p_cur > 1 else 2
            if not prepared:
                kn = pk.prepare_strided_conv_from_flat(kn, stride_f0, pad_n, p_n)
            xs = pk.packed_strided_conv_from_flat_prepared(
                har, kn, bn, kn_k, stride_f0, pad_n, p_n
            )
            if p_cur == 1:
                xs = pk.unpack(xs, c_cur)
            x = x + xs
        # resblocks (mean of num_kernels ResBlock1s)
        if prepared and f"resstream_{i}" in params:
            from prodiff_tpu.ops.pallas.resblock import resblock_group_streamed

            rs = params[f"resstream_{i}"]
            x = resblock_group_streamed(
                x, rs["w"], rs["b"], res_ksizes, res_dsizes,
                # f32 tap streaming (the precision-pinned parity render)
                # needs smaller row tiles: rows=512 measured 31.4M scoped
                # VMEM (limit 16M) where bf16 fits — f32 doubles the weight
                # slots AND the per-conv dot operands the unrolled walk
                # keeps live
                rows_per_block=512 if rs["w"].dtype.itemsize == 2 else 128,
                interpret=jax.devices()[0].platform not in ("tpu", "axon"),
            )
            p_prev = p_cur
            continue
        if prepared and f"resfused_{i}" in params:
            from prodiff_tpu.ops.pallas.resblock import resblock_group_packed

            rf = params[f"resfused_{i}"]
            wide = rf["w"].shape[0] < rf["w"].shape[1]
            x = resblock_group_packed(
                x, rf["w"], rf["b"], res_ksizes, res_dsizes, max(p_cur, 1),
                fat_chunk=max(_RES_FAT_CHUNK, 1) if wide else 0,
                # f32 tap stacks (precision-pinned parity render): the
                # weights' extra 8 MB + doubled dot operands blow scoped
                # VMEM at 1024-row tiles (26.2M measured; limit 16M)
                rows_per_block=1024 if rf["w"].dtype.itemsize == 2 else 256,
                interpret=jax.devices()[0].platform not in ("tpu", "axon"),
            )
            p_prev = p_cur
            continue
        xs_sum = None
        for j, (rk, rds) in enumerate(zip(res_ksizes, res_dsizes)):
            rb = params[f"resblocks_{i * num_kernels + j}"]
            h = x
            for li, d in enumerate(rds):
                kc1 = rb[f"convs1_{li}"]["conv"]
                kc2 = rb[f"convs2_{li}"]["conv"]
                xt = jax.nn.leaky_relu(h, LRELU_SLOPE)
                if p_cur > 1:
                    for pos, (cp, dd) in enumerate(((kc1, d), (kc2, 1))):
                        kern = (
                            cp["kernel"] if prepared
                            else pk.prepare_convk(_cast(cp["kernel"]), dd, p_cur)
                        )
                        xt = pk.packed_convk_prepared(
                            xt, kern, _cast(cp["bias"]), rk, dd, c_cur
                        )
                        if pos == 0:  # between the two convs of the unit
                            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                else:
                    xt = (
                        jax.lax.conv_general_dilated(
                            xt, _cast(kc1["kernel"]), (1,), "SAME",
                            rhs_dilation=(d,),
                            dimension_numbers=("NWC", "WIO", "NWC"),
                        )
                        + _cast(kc1["bias"])
                    )
                    xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                    xt = (
                        jax.lax.conv_general_dilated(
                            xt, _cast(kc2["kernel"]), (1,), "SAME",
                            dimension_numbers=("NWC", "WIO", "NWC"),
                        )
                        + _cast(kc2["bias"])
                    )
                h = xt + h
            xs_sum = h if xs_sum is None else xs_sum + h
        x = xs_sum / num_kernels
        p_prev = p_cur

    x = jax.nn.leaky_relu(x)  # torch default slope 0.01 (reference :284)
    kpo, bpo = conv_p("conv_post")
    k_post = 7  # both generators hardcode Conv1d(1, 7) (asserted at prepare)
    if not prepared:
        k_post = kpo.shape[0]
        kpo = pk.prepare_conv_to_flat(kpo, p_prev)
    out = pk.packed_conv_to_flat_prepared(x, kpo, bpo, k_post, c_cur)
    return jnp.tanh(out.astype(jnp.float32))  # [B, T*upp]


def prepare_packed_trunk_params(
    params,
    *,
    rates: Sequence[int],
    ksizes: Sequence[int],
    init_ch: int,
    res_ksizes: Sequence[int],
    res_dsizes: Sequence[Sequence[int]],
    has_source: bool,
    dtype: Optional[jnp.dtype] = None,
    fused_res_dtype: Optional[jnp.dtype] = None,
) -> dict:
    """Pre-pack a HiFiGAN-family param tree for
    ``packed_hifigan_trunk(prepared=True)``.

    Returns a pytree of ARRAYS only (row-conv kernel stacks + biases +
    untouched edge/source params) mirroring the linen param names. Run it
    once (ideally under a tiny jit) and pass the result as a jit ARGUMENT to
    the forward — closure-capturing raw params makes XLA constant-fold the
    selector einsums into a ~300 MB executable with 500+ s cold compiles
    (measured, NSF scale); the prepared tree keeps the forward program small
    and the weights resident on device. ``dtype`` bakes a bf16 trunk.

    ``fused_res_dtype``: additionally pack each 128-lane stage's resblock
    ensemble for the fused Pallas kernel (ops/pallas/resblock.py) in that
    dtype (bf16 = MXU at the bf16 rate with f32 accumulation).
    """
    from prodiff_tpu.ops import packed as pk

    assert dtype is None or fused_res_dtype is None, (
        "the fused resblock kernel runs an f32 trunk (casts are in-kernel)"
    )
    cast = (lambda t: t.astype(dtype)) if dtype is not None else (lambda t: t)
    n_up = len(rates)
    num_kernels = len(res_ksizes)
    packs = hifigan_stage_packs(init_ch, n_up)
    out = {}

    def conv(entry):
        return {"conv": {"kernel": cast(entry["conv"]["kernel"]),
                         "bias": cast(entry["conv"]["bias"])}}

    out["conv_pre"] = conv(params["conv_pre"])
    assert params["conv_post"]["conv"]["kernel"].shape[0] == 7
    p_prev = 1
    for i, (u, k) in enumerate(zip(rates, ksizes)):
        p_cur = packs[i]
        upk = params[f"ups_{i}"]
        if p_cur > 1:
            kern = pk.prepare_conv_transpose_packed_in(
                cast(upk["kernel"]), u, (k - u) // 2, p_prev
            )
        else:
            kern = cast(upk["kernel"])
        out[f"ups_{i}"] = {"kernel": kern, "bias": cast(upk["bias"])}
        if has_source:
            ncp = params[f"noise_convs_{i}"]["conv"]
            if i + 1 < n_up:
                s_f0 = int(np.prod(rates[i + 1:]))
                pad_n = s_f0 // 2
            else:
                s_f0, pad_n = 1, 0
            p_n = p_cur if p_cur > 1 else 2
            out[f"noise_convs_{i}"] = {"conv": {
                "kernel": pk.prepare_strided_conv_from_flat(
                    cast(ncp["kernel"]), s_f0, pad_n, p_n
                ),
                "bias": cast(ncp["bias"]),
            }}
        c_i = init_ch // (2 ** (i + 1))
        fuse = fused_res_dtype is not None and max(p_cur, 1) * c_i == 128
        # lane-full stages whose tap stacks exceed VMEM (e.g. NSF s0 C=256:
        # 126 taps * 256^2 bf16 = 16.5 MB) run the weight-STREAMED kernel
        stream = (
            fused_res_dtype is not None
            and p_cur <= 1
            and c_i > 128
            and c_i % 128 == 0
        )
        if stream:
            from prodiff_tpu.ops.pallas.resblock import prepare_resblock_stage

            stage_rbs = [
                params[f"resblocks_{i * num_kernels + j}"]
                for j in range(num_kernels)
            ]
            w, bs = prepare_resblock_stage(
                stage_rbs, res_ksizes, res_dsizes, 1, dtype=fused_res_dtype
            )
            out[f"resstream_{i}"] = {"w": w, "b": bs}
        elif fuse:
            # weights must fit VMEM next to the row tiles (18.6M scoped OOM
            # observed at rows=2048; 1024-row tiles + <=6M of tap stacks fit)
            from prodiff_tpu.ops.pallas.resblock import stage_meta

            convs_meta, _, _ = stage_meta(
                tuple(res_ksizes), tuple(map(tuple, res_dsizes)),
                max(p_cur, 1),
            )
            wbytes = sum(len(qs) for qs in convs_meta) * 128 * 128 * (
                2 if fused_res_dtype == jnp.bfloat16 else 4
            )
            # f32 126-tap stage (8.3M) measured fine at 1024-row tiles
            fuse = wbytes <= 9 * 2 ** 20
        if fuse:
            from prodiff_tpu.ops.pallas.resblock import prepare_resblock_stage

            stage_rbs = [
                params[f"resblocks_{i * num_kernels + j}"]
                for j in range(num_kernels)
            ]
            w, bs = prepare_resblock_stage(
                stage_rbs, res_ksizes, res_dsizes, max(p_cur, 1),
                dtype=fused_res_dtype, wide=_RES_FAT_CHUNK > 0,
            )
            out[f"resfused_{i}"] = {"w": w, "b": bs}
        elif not stream:  # plain XLA stage (streamed stages already emitted
            # resstream_{i} above and must not also get per-resblock params)
            for j, rds in enumerate(res_dsizes):
                rb = params[f"resblocks_{i * num_kernels + j}"]
                ob = {}
                for li, d in enumerate(rds):
                    for group, dd in (("convs1", d), ("convs2", 1)):
                        cp = rb[f"{group}_{li}"]["conv"]
                        kern = (
                            pk.prepare_convk(cast(cp["kernel"]), dd, p_cur)
                            if p_cur > 1 else cast(cp["kernel"])
                        )
                        ob[f"{group}_{li}"] = {"conv": {
                            "kernel": kern, "bias": cast(cp["bias"]),
                        }}
                out[f"resblocks_{i * num_kernels + j}"] = ob
        p_prev = p_cur
    out["conv_post"] = {"conv": {
        "kernel": pk.prepare_conv_to_flat(
            cast(params["conv_post"]["conv"]["kernel"]), p_prev
        ),
        "bias": cast(params["conv_post"]["conv"]["bias"]),
    }}
    if "m_source" in params:
        out["m_source"] = params["m_source"]  # l_linear stays f32/raw
    return out


class PackedGeneratorRunner:
    """Functional prepared-params runner for :class:`Generator`.

    Usage (serving / benchmarking):
        runner = PackedGeneratorRunner(gen)            # static config only
        prepared = jax.jit(runner.prepare)(variables)  # once, tiny program
        wav = jax.jit(runner)(prepared, mel, f0, rng)  # prepared as ARGUMENT

    Keeping ``prepared`` a jit argument (not a closure constant) keeps the
    forward executable small — see prepare_packed_trunk_params.

    ``fused_res_dtype``: dtype for the fused resblock Pallas kernel's tap
    stacks — "auto" = bf16 on TPU backends, off elsewhere (the XLA packed
    convs stay); None = off; a dtype = forced (f32 for exact parity tests).
    """

    def __init__(
        self,
        gen: "Generator",
        dtype: Optional[jnp.dtype] = None,
        fused_res_dtype="auto",
    ):
        self.gen = gen
        self.dtype = dtype
        if fused_res_dtype == "auto":
            on_tpu = jax.devices()[0].platform in ("tpu", "axon")
            fused_res_dtype = jnp.bfloat16 if on_tpu else None
        self.fused_res_dtype = fused_res_dtype

    def prepare(self, variables) -> dict:
        return prepare_packed_trunk_params(
            variables["params"],
            rates=self.gen.upsample_rates,
            ksizes=self.gen.upsample_kernel_sizes,
            init_ch=self.gen.upsample_initial_channel,
            res_ksizes=self.gen.resblock_kernel_sizes,
            res_dsizes=self.gen.resblock_dilation_sizes,
            has_source=True,
            dtype=self.dtype,
            fused_res_dtype=self.fused_res_dtype,
        )

    def __call__(
        self,
        prepared: dict,
        mel: jnp.ndarray,
        f0: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        har_source: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """mel: [B, T, M] natural-log; rng=None -> deterministic source."""
        gen = self.gen
        if har_source is None:
            lin = prepared["m_source"]["l_linear"]
            har = flat_har_source(
                f0, gen.upp, gen.sampling_rate, 8, rng,
                lin["kernel"], lin["bias"],
            )
        else:
            har = har_source[..., 0]
        return packed_hifigan_trunk(
            prepared, mel, har,
            rates=gen.upsample_rates,
            ksizes=gen.upsample_kernel_sizes,
            init_ch=gen.upsample_initial_channel,
            res_ksizes=gen.resblock_kernel_sizes,
            res_dsizes=gen.resblock_dilation_sizes,
            prepared=True,
        )


def _packed_forward(net: "Generator", mel, f0, har_source, deterministic):
    """NSF generator forward on the packed trunk.

    Reads the SAME params as the linen path (``net.variables``). Numerics:
    identical op semantics to linen (parity-tested); with the stochastic
    source the noise REALISATION differs (see flat_har_source). ``net.dtype``
    selects the trunk compute dtype (bf16 is a measured win HERE, unlike on
    the linen path where it was 0.98x: the packed trunk is traffic-bound).
    """
    params = net.variables["params"]
    if har_source is None:
        rng = None if deterministic else net.make_rng("noise")
        lin = params["m_source"]["l_linear"]
        har = flat_har_source(
            f0, net.upp, net.sampling_rate, 8, rng, lin["kernel"], lin["bias"]
        )  # [B, T_audio]
    else:
        har = har_source[..., 0]
    return packed_hifigan_trunk(
        params, mel, har,
        rates=net.upsample_rates,
        ksizes=net.upsample_kernel_sizes,
        init_ch=net.upsample_initial_channel,
        res_ksizes=net.resblock_kernel_sizes,
        res_dsizes=net.resblock_dilation_sizes,
        dtype=net.dtype,
    )
