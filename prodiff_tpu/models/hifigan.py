"""HiFi-GAN generator with optional NSF harmonic source
(reference ``modules/hifigan/hifigan.py:104-171``).

Differences from the NSF-HiFiGAN variant (``models/nsf_hifigan.py``): f0 is
nearest-upsampled to the sample rate *before* the sine source, the source
module comes from the parallel_wavegan lib (same math, sample-rate cumsum),
and the conv_pre is a fixed 80-mel input.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.models.nsf_hifigan import (
    Conv1d,
    ConvTranspose1d,
    LRELU_SLOPE,
    ResBlock1,
    ResBlock2,
    flat_har_source,
    packed_hifigan_trunk,
    packed_trunk_supported,
)


def mod1_cumsum(rad: jnp.ndarray, chunk: int = 128) -> jnp.ndarray:
    """Precision-safe cumulative phase (mod 1) along axis 1.

    The torch reference cumsums at sample rate with -1 shifts to bound the
    running value (``source.py:59-74``); here the sequence is chunked, summed
    within chunks in f32 (bounded by chunk size), and chunk carries are folded
    through a short mod-1 scan.
    """
    b, t, d = rad.shape
    pad = (-t) % chunk
    radp = jnp.pad(rad, [(0, 0), (0, pad), (0, 0)])
    n_chunks = radp.shape[1] // chunk
    chunks = radp.reshape(b, n_chunks, chunk, d)
    within = jnp.cumsum(chunks, axis=2)  # bounded by `chunk`
    chunk_sums = jnp.mod(within[:, :, -1, :], 1.0)

    def step(carry, s):
        new = jnp.mod(carry + s, 1.0)
        return new, carry

    _, base = jax.lax.scan(
        step, jnp.zeros((b, d)), jnp.moveaxis(chunk_sums, 1, 0)
    )
    base = jnp.moveaxis(base, 0, 1)  # [B, n_chunks, D] phase at chunk starts
    phase = jnp.mod(within, 1.0) + base[:, :, None, :]
    return phase.reshape(b, n_chunks * chunk, d)[:, :t]


def sine_gen_samplewise(
    f0_up: jnp.ndarray,
    sampling_rate: int,
    harmonic_num: int,
    rng: jax.Array,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
) -> jnp.ndarray:
    """Sample-rate sine source (``parallel_wavegan/models/source.py``).
    f0_up: [B, T] already at sample rate -> [B, T, H+1]."""
    b, t = f0_up.shape
    dim = harmonic_num + 1
    harmonics = jnp.arange(1, dim + 1, dtype=jnp.float32)[None, None, :]
    rad = jnp.mod(f0_up[:, :, None] * harmonics / sampling_rate, 1.0)
    rng_ini, rng_noise = jax.random.split(rng)
    rand_ini = jax.random.uniform(rng_ini, (b, dim))
    rand_ini = rand_ini.at[:, 0].set(0.0)
    rad = rad.at[:, 0, :].add(rand_ini)
    phase = mod1_cumsum(rad)
    sines = jnp.sin(2 * jnp.pi * phase) * sine_amp
    uv = (f0_up > voiced_threshold).astype(jnp.float32)[:, :, None]
    noise_amp = uv * noise_std + (1 - uv) * sine_amp / 3
    noise = noise_amp * jax.random.normal(rng_noise, sines.shape)
    return sines * uv + noise


class SourceModuleHnNSF(nn.Module):
    sampling_rate: int
    harmonic_num: int = 8

    @nn.compact
    def __call__(self, f0_up: jnp.ndarray) -> jnp.ndarray:
        rng = self.make_rng("noise")
        sines = sine_gen_samplewise(f0_up, self.sampling_rate, self.harmonic_num, rng)
        return jnp.tanh(nn.Dense(1, name="l_linear")(sines))


class HifiGanGenerator(nn.Module):
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 128
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    use_pitch_embed: bool = False
    audio_sample_rate: int = 22050
    c_out: int = 1
    # packed trunk (see models/nsf_hifigan.py:packed_hifigan_trunk). With the
    # default 128ch start EVERY stage is C < 128, so the whole pyramid runs
    # packed. None = auto (on for TPU inference).
    use_packed: Optional[bool] = None

    @classmethod
    def from_config(cls, h: dict, use_packed=None) -> "HifiGanGenerator":
        return cls(
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            upsample_initial_channel=h["upsample_initial_channel"],
            resblock=str(h["resblock"]),
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(map(tuple, h["resblock_dilation_sizes"])),
            use_pitch_embed=h.get("use_pitch_embed", False),
            audio_sample_rate=h.get("audio_sample_rate", 22050),
            use_packed=use_packed,
        )

    def _packed_supported(self, t_mel: int) -> bool:
        return self.c_out == 1 and packed_trunk_supported(
            t_mel,
            rates=self.upsample_rates,
            ksizes=self.upsample_kernel_sizes,
            init_ch=self.upsample_initial_channel,
            resblock=self.resblock,
            res_ksizes=self.resblock_kernel_sizes,
            has_source=self.use_pitch_embed,
        )

    @nn.compact
    def __call__(self, mel: jnp.ndarray, f0: Optional[jnp.ndarray] = None):
        """mel: [B, T, 80]; f0: [B, T] (frame rate) -> wav [B, T*upp]."""
        num_kernels = len(self.resblock_kernel_sizes)
        upp = int(np.prod(self.upsample_rates))
        use_packed = self.use_packed
        if use_packed is None:
            use_packed = jax.devices()[0].platform in ("tpu", "axon")
        if (
            use_packed
            and not self.is_initializing()
            and self._packed_supported(mel.shape[1])
        ):
            return _packed_forward(self, mel, f0)
        har_source = None
        if self.use_pitch_embed and f0 is not None:
            f0_up = jnp.repeat(f0, upp, axis=1)  # nearest upsample
            har_source = SourceModuleHnNSF(
                self.audio_sample_rate, 8, name="m_source"
            )(f0_up)  # [B, T*upp, 1]

        x = Conv1d(self.upsample_initial_channel, 7, padding=3, name="conv_pre")(mel)
        resblock_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            c_cur = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(
                c_cur, k, stride=u, padding=(k - u) // 2, name=f"ups_{i}"
            )(x)
            if har_source is not None:
                if i + 1 < len(self.upsample_rates):
                    stride_f0 = int(np.prod(self.upsample_rates[i + 1:]))
                    x_source = Conv1d(
                        c_cur, stride_f0 * 2, stride=stride_f0,
                        padding=stride_f0 // 2, name=f"noise_convs_{i}",
                    )(har_source)
                else:
                    x_source = Conv1d(c_cur, 1, name=f"noise_convs_{i}")(har_source)
                x = x + x_source
            xs = 0.0
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                xs = xs + resblock_cls(
                    c_cur, rk, tuple(rd), name=f"resblocks_{i * num_kernels + j}"
                )(x)
            x = xs / num_kernels
        x = nn.leaky_relu(x)
        x = Conv1d(self.c_out, 7, padding=3, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class PackedHifiGanRunner:
    """Functional prepared-params runner for :class:`HifiGanGenerator`
    (same contract as models/nsf_hifigan.py:PackedGeneratorRunner: prepare
    once, pass the prepared tree as a jit ARGUMENT)."""

    def __init__(self, gen: "HifiGanGenerator", dtype=None,
                 fused_res_dtype="auto"):
        self.gen = gen
        self.dtype = dtype
        if fused_res_dtype == "auto":
            on_tpu = jax.devices()[0].platform in ("tpu", "axon")
            fused_res_dtype = jnp.bfloat16 if on_tpu else None
        self.fused_res_dtype = fused_res_dtype

    def prepare(self, variables) -> dict:
        from prodiff_tpu.models.nsf_hifigan import prepare_packed_trunk_params

        return prepare_packed_trunk_params(
            variables["params"],
            rates=self.gen.upsample_rates,
            ksizes=self.gen.upsample_kernel_sizes,
            init_ch=self.gen.upsample_initial_channel,
            res_ksizes=self.gen.resblock_kernel_sizes,
            res_dsizes=self.gen.resblock_dilation_sizes,
            has_source=self.gen.use_pitch_embed,
            dtype=self.dtype,
            fused_res_dtype=self.fused_res_dtype,
        )

    def __call__(self, prepared, mel, f0=None, rng=None):
        gen = self.gen
        upp = int(np.prod(gen.upsample_rates))
        har = None
        if gen.use_pitch_embed and f0 is not None:
            lin = prepared["m_source"]["l_linear"]
            har = flat_har_source(
                f0, upp, gen.audio_sample_rate, 8, rng,
                lin["kernel"], lin["bias"], samplewise_ini=True,
            )
        return packed_hifigan_trunk(
            prepared, mel, har,
            rates=gen.upsample_rates,
            ksizes=gen.upsample_kernel_sizes,
            init_ch=gen.upsample_initial_channel,
            res_ksizes=gen.resblock_kernel_sizes,
            res_dsizes=gen.resblock_dilation_sizes,
            prepared=True,
        )


def _packed_forward(net: "HifiGanGenerator", mel, f0):
    """Packed-trunk forward (same params as linen). The harmonic source uses
    the flat planar formulation with parallel_wavegan initial-phase semantics
    (``samplewise_ini``); its noise realisation differs from linen (equal in
    distribution — see flat_har_source)."""
    params = net.variables["params"]
    upp = int(np.prod(net.upsample_rates))
    har = None
    if net.use_pitch_embed and f0 is not None:
        lin = params["m_source"]["l_linear"]
        har = flat_har_source(
            f0, upp, net.audio_sample_rate, 8, net.make_rng("noise"),
            lin["kernel"], lin["bias"], samplewise_ini=True,
        )
    return packed_hifigan_trunk(
        params, mel, har,
        rates=net.upsample_rates,
        ksizes=net.upsample_kernel_sizes,
        init_ch=net.upsample_initial_channel,
        res_ksizes=net.resblock_kernel_sizes,
        res_dsizes=net.resblock_dilation_sizes,
    )


def convert_hifigan(sd: dict, h: dict) -> dict:
    """Reference HifiGanGenerator state dict -> flax params (weight-norm folded)."""
    from prodiff_tpu.utils.torch_convert import (
        _conv_kernel,
        _convtranspose_kernel,
        _dense_kernel,
        fold_weight_norm,
    )

    sd = fold_weight_norm({k: np.asarray(v) for k, v in sd.items()})
    p: dict = {}

    def conv(dst, src):
        p[dst] = {
            "conv": {
                "kernel": _conv_kernel(sd[src + ".weight"]),
                "bias": sd[src + ".bias"].astype(np.float32),
            }
        }

    conv("conv_pre", "conv_pre")
    conv("conv_post", "conv_post")
    n_up = len(h["upsample_rates"])
    for i in range(n_up):
        p[f"ups_{i}"] = {
            "kernel": _convtranspose_kernel(sd[f"ups.{i}.weight"]),
            "bias": sd[f"ups.{i}.bias"].astype(np.float32),
        }
        if h.get("use_pitch_embed", False):
            conv(f"noise_convs_{i}", f"noise_convs.{i}")
    num_kernels = len(h["resblock_kernel_sizes"])
    for n in range(n_up * num_kernels):
        block: dict = {}
        if str(h["resblock"]) == "1":
            for j in range(3):
                for group in ("convs1", "convs2"):
                    src = f"resblocks.{n}.{group}.{j}"
                    block[f"{group}_{j}"] = {
                        "conv": {
                            "kernel": _conv_kernel(sd[src + ".weight"]),
                            "bias": sd[src + ".bias"].astype(np.float32),
                        }
                    }
        else:
            for j in range(2):
                src = f"resblocks.{n}.convs.{j}"
                block[f"convs_{j}"] = {
                    "conv": {
                        "kernel": _conv_kernel(sd[src + ".weight"]),
                        "bias": sd[src + ".bias"].astype(np.float32),
                    }
                }
        p[f"resblocks_{n}"] = block
    if h.get("use_pitch_embed", False):
        p["m_source"] = {
            "l_linear": {
                "kernel": _dense_kernel(sd["m_source.l_linear.weight"]),
                "bias": sd["m_source.l_linear.bias"].astype(np.float32),
            }
        }
    return {"params": p}
