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

    harmonics = jnp.arange(1, dim + 1, dtype=jnp.float32)[None, None, :]
    rad = jnp.mod(f0[:, :, None] * harmonics / sampling_rate, 1.0)  # [B, T_f, D]
    if rng is not None:
        rng_ini, rng_noise = jax.random.split(rng)
        rand_ini = jax.random.uniform(rng_ini, (1, dim))
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad = rad.at[:, 0, :].add(rand_ini)

    # frame-start phases mod 1, exact in f32 thanks to the bounded carry
    frame_inc = jnp.mod(rad * upp, 1.0)  # [B, T_f, D]

    def step(carry, inc):
        new = jnp.mod(carry + inc, 1.0)
        return new, carry

    _, base = jax.lax.scan(step, jnp.zeros((b, dim)), jnp.moveaxis(frame_inc, 1, 0))
    base = jnp.moveaxis(base, 0, 1)  # [B, T_f, D] phase at each frame START

    # compute sin with `upp` (>=128) on the LANE axis: a [..., upp, D=9]
    # layout would run the 2.4M-sample transcendental at 9/128 lane occupancy
    within = (jnp.arange(upp, dtype=jnp.float32) + 1.0)[None, None, None, :]  # [1,1,1,upp]
    phase = base[..., None] + within * rad[..., None]  # [B, T_f, D, upp]
    sines = jnp.sin(2 * jnp.pi * phase)
    # [B, T_f, D, upp] -> [B, T_f*upp, D]
    sines = sines.transpose(0, 1, 3, 2).reshape(b, t_frames * upp, dim)

    uv = (f0 > voiced_threshold).astype(jnp.float32)[:, :, None]  # [B, T_f, 1]
    uv = jnp.repeat(uv, upp, axis=1)  # nearest upsample
    if rng is None:
        return sines * sine_amp * uv
    noise_amp = uv * noise_std + (1 - uv) * sine_amp / 3
    noise = noise_amp * jax.random.normal(rng_noise, sines.shape)
    return sines * sine_amp * uv + noise


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
    dtype: jnp.dtype = None

    @classmethod
    def from_config(cls, h: dict, dtype=None) -> "Generator":
        return cls(
            num_mels=h["num_mels"],
            sampling_rate=h["sampling_rate"],
            upsample_initial_channel=h["upsample_initial_channel"],
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            resblock=str(h["resblock"]),
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(map(tuple, h["resblock_dilation_sizes"])),
            dtype=dtype,
        )

    @property
    def upp(self) -> int:
        return int(np.prod(self.upsample_rates))

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
