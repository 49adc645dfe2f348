"""Parallel WaveGAN generator
(reference ``modules/parallel_wavegan/models/parallel_wavegan.py:21-171``).

WaveNet over a noise signal conditioned on upsampled mel (ConvInUpsample
network: context conv + per-scale nearest-stretch + smoothing conv), optional
coarse-pitch embedding. Inference-only, converted weights.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.models.common import Embedding


class PWGResidualBlock(nn.Module):
    kernel_size: int
    residual_channels: int
    gate_channels: int
    skip_channels: int
    dilation: int

    @nn.compact
    def __call__(self, x, c):
        """x: [B, T, R]; c: [B, T, A] -> (residual_out, skip)."""
        residual = x
        h = nn.Conv(
            self.gate_channels, (self.kernel_size,),
            kernel_dilation=(self.dilation,), padding="SAME", name="conv",
        )(x)
        xa, xb = jnp.split(h, 2, axis=-1)
        ca_cb = nn.Conv(
            self.gate_channels, (1,), use_bias=False, name="conv1x1_aux"
        )(c)
        ca, cb = jnp.split(ca_cb, 2, axis=-1)
        h = jnp.tanh(xa + ca) * jax.nn.sigmoid(xb + cb)
        s = nn.Conv(self.skip_channels, (1,), name="conv1x1_skip")(h)
        out = nn.Conv(self.residual_channels, (1,), name="conv1x1_out")(h)
        return (out + residual) * (2.0 ** -0.5), s


class UpsampleNetwork(nn.Module):
    upsample_scales: Sequence[int]

    @nn.compact
    def __call__(self, c):
        """c: [B, T, C] -> [B, T*prod(scales), C] (stretch + smoothing convs)."""
        x = c[..., None]  # [B, T, C, 1] as (N, W=time, H=freq, channel=1)
        for i, scale in enumerate(self.upsample_scales):
            x = jnp.repeat(x, scale, axis=1)  # nearest stretch on time
            # torch Conv2d(1, 1, (1, 2*scale+1), padding=(0, scale), bias=False)
            # over (freq, time); here time is axis 1
            kernel = self.param(
                f"up_conv_{i}",
                lambda k, s: np.full(s, 1.0 / (2 * scale + 1), np.float32),
                (2 * scale + 1, 1, 1, 1),
            )
            x = jax.lax.conv_general_dilated(
                x, kernel,
                window_strides=(1, 1),
                padding=[(scale, scale), (0, 0)],
                dimension_numbers=("NWHC", "WHIO", "NWHC"),
            )
        return x[..., 0]


class ConvInUpsampleNetwork(nn.Module):
    upsample_scales: Sequence[int]
    aux_channels: int = 80
    aux_context_window: int = 2

    @nn.compact
    def __call__(self, c):
        """c: [B, T + 2*window, C] (caller pads with edge values) ->
        [B, T*prod(scales), C]."""
        k = 2 * self.aux_context_window + 1
        c = nn.Conv(
            self.aux_channels, (k,), padding="VALID", use_bias=False, name="conv_in"
        )(c)
        return UpsampleNetwork(self.upsample_scales, name="upsample")(c)


class ParallelWaveGANGenerator(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    upsample_scales: Sequence[int] = (4, 4, 4, 4)
    use_pitch_embed: bool = False

    @nn.compact
    def __call__(self, z, c, pitch: Optional[jnp.ndarray] = None):
        """z: [B, T, 1] noise; c: [B, T' + 2*window, A] padded mel;
        pitch: [B, T' + 2*window] coarse ids -> wav [B, T]."""
        if self.use_pitch_embed and pitch is not None:
            p = Embedding(300, self.aux_channels, padding_idx=0, name="pitch_embed")(pitch)
            c = nn.Dense(self.aux_channels, name="c_proj")(
                jnp.concatenate([c, p], axis=-1)
            )
        c = ConvInUpsampleNetwork(
            self.upsample_scales, self.aux_channels, self.aux_context_window,
            name="upsample_net",
        )(c)
        assert c.shape[1] == z.shape[1], (c.shape, z.shape)

        x = nn.Conv(self.residual_channels, (1,), name="first_conv")(z)
        layers_per_stack = self.layers // self.stacks
        skips = 0.0
        for i in range(self.layers):
            x, s = PWGResidualBlock(
                kernel_size=self.kernel_size,
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                dilation=2 ** (i % layers_per_stack),
                name=f"conv_layers_{i}",
            )(x, c)
            skips += s
        x = skips * math.sqrt(1.0 / self.layers)
        x = jax.nn.relu(x)
        x = nn.Conv(self.skip_channels, (1,), name="last_conv_1")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.out_channels, (1,), name="last_conv_3")(x)
        return x[..., 0]


def convert_pwg(sd: dict, config: dict) -> dict:
    """Reference ParallelWaveGANGenerator state dict -> flax params."""
    from prodiff_tpu.utils.torch_convert import fold_weight_norm

    sd = fold_weight_norm({k: np.asarray(v) for k, v in sd.items()})

    def conv(src, bias=True):
        out = {"kernel": np.ascontiguousarray(np.transpose(sd[src + ".weight"], (2, 1, 0)))}
        if bias and src + ".bias" in sd:
            out["bias"] = sd[src + ".bias"]
        return out

    gp = config["generator_params"]
    p: dict = {
        "first_conv": conv("first_conv"),
        "last_conv_1": conv("last_conv_layers.1"),
        "last_conv_3": conv("last_conv_layers.3"),
    }
    for i in range(gp.get("layers", 30)):
        src = f"conv_layers.{i}"
        p[f"conv_layers_{i}"] = {
            "conv": conv(f"{src}.conv"),
            "conv1x1_aux": conv(f"{src}.conv1x1_aux", bias=False),
            "conv1x1_skip": conv(f"{src}.conv1x1_skip"),
            "conv1x1_out": conv(f"{src}.conv1x1_out"),
        }
    up = {"conv_in": {"kernel": np.ascontiguousarray(
        np.transpose(sd["upsample_net.conv_in.weight"], (2, 1, 0)))}}
    scales = gp["upsample_params"]["upsample_scales"]
    upsample = {}
    # torch up_layers interleave [stretch, conv, ...]; convs at odd indices
    for i, scale in enumerate(scales):
        w = sd[f"upsample_net.upsample.up_layers.{2 * i + 1}.weight"]  # [1,1,kh,kw]
        # torch 2d layout (freq=kh=1, time=kw); mine (time, freq, I, O)
        upsample[f"up_conv_{i}"] = np.ascontiguousarray(
            np.transpose(w, (3, 2, 1, 0))
        )
    up["upsample"] = upsample
    p["upsample_net"] = up
    if gp.get("use_pitch_embed", False):
        p["pitch_embed"] = {"embedding": sd["pitch_embed.weight"]}
        p["c_proj"] = {"kernel": sd["c_proj.weight"].T, "bias": sd["c_proj.bias"]}
    return {"params": p}
