"""RMVPE deep-learning F0 extractor in flax (reference ``modules/rmvpe/``).

E2E0 = DeepUnet (ConvBlockRes encoder/decoder U-Net over a 128-mel htk
spectrogram) + 3-channel conv + BiGRU -> 360-way sigmoid over 20-cent pitch
bins. Inference-only: weights are converted from the released torch
checkpoint. BatchNorms run with stored running stats; the BiGRU is a pair of
``nn.RNN(GRUCell)`` scans (f0 extraction is an offline binarize-time pass, so
the serial scan is not on the serving hot path — SURVEY §7.4.4).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_CLASS = 360
N_MELS = 128
MEL_FMIN = 30
MEL_FMAX = 8000
WINDOW_LENGTH = 1024
CONST = 1997.3794084376191


class BN(nn.Module):
    """Inference-mode BatchNorm over the channel (last) axis."""

    momentum: float = 0.01

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class ConvBlockRes(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        h = BN(name="bn1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, name="conv2")(h)
        h = BN(name="bn2")(h)
        h = jax.nn.relu(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return h + x


class ResEncoderBlock(nn.Module):
    out_channels: int
    n_blocks: int = 1
    pool: Optional[Tuple[int, int]] = (2, 2)

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, name=f"conv_{i}")(x)
        if self.pool is not None:
            pooled = nn.avg_pool(x, self.pool, strides=self.pool)
            return x, pooled
        return x


class ConvTranspose2dTorch(nn.Module):
    """torch ConvTranspose2d(k=3, stride, padding=1, output_padding) equivalent.
    Kernel stored pre-flipped as [kh, kw, Cin, Cout]."""

    features: int
    stride: Tuple[int, int]
    output_padding: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02), (3, 3, cin, self.features)
        )
        # pad = k - 1 - p = 1; output_padding adds to the high side
        pads = [
            (1, 1 + self.output_padding[0]),
            (1, 1 + self.output_padding[1]),
        ]
        return jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=self.stride,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ResDecoderBlock(nn.Module):
    out_channels: int
    stride: Tuple[int, int] = (2, 2)
    n_blocks: int = 1

    @nn.compact
    def __call__(self, x, concat_tensor):
        out_padding = (0, 1) if self.stride == (1, 2) else (1, 1)
        x = ConvTranspose2dTorch(
            self.out_channels, self.stride, out_padding, name="convt"
        )(x)
        x = jax.nn.relu(BN(name="bn1")(x))
        x = jnp.concatenate([x, concat_tensor], axis=-1)
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, name=f"conv2_{i}")(x)
        return x


class DeepUnet0(nn.Module):
    kernel_size: Tuple[int, int] = (2, 2)
    n_blocks: int = 4
    en_de_layers: int = 5
    inter_layers: int = 4
    en_out_channels: int = 16

    @nn.compact
    def __call__(self, x):
        """x: [B, T, M, 1] -> [B, T, M, en_out_channels]."""
        x = BN(name="encoder_bn")(x)
        skips = []
        out_channels = self.en_out_channels
        for i in range(self.en_de_layers):
            skip, x = ResEncoderBlock(
                out_channels, self.n_blocks, self.kernel_size, name=f"enc_{i}"
            )(x)
            skips.append(skip)
            out_channels *= 2
        for i in range(self.inter_layers):
            x = ResEncoderBlock(
                out_channels, self.n_blocks, pool=None, name=f"inter_{i}"
            )(x)
        for i in range(self.en_de_layers):
            out_channels //= 2
            x = ResDecoderBlock(
                out_channels, self.kernel_size, self.n_blocks, name=f"dec_{i}"
            )(x, skips[-1 - i])
        return x


class BiGRU(nn.Module):
    hidden_features: int

    @nn.compact
    def __call__(self, x):
        """x: [B, T, F] -> [B, T, 2*hidden]."""
        fwd = nn.RNN(nn.GRUCell(self.hidden_features, name="fwd_cell"))(x)
        bwd = nn.RNN(
            nn.GRUCell(self.hidden_features, name="bwd_cell"),
            reverse=True, keep_order=True,
        )(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class E2E0(nn.Module):
    n_blocks: int = 4
    n_gru: int = 1
    kernel_size: Tuple[int, int] = (2, 2)

    @nn.compact
    def __call__(self, mel):
        """mel: [B, T, M] log-mel -> [B, T, N_CLASS] sigmoid salience."""
        x = mel[..., None]  # [B, T, M, 1]
        x = DeepUnet0(self.kernel_size, self.n_blocks, name="unet")(x)
        x = nn.Conv(3, (3, 3), padding=1, name="cnn")(x)  # [B, T, M, 3]
        b, t = x.shape[0], x.shape[1]
        # channel-major flatten (torch: [B,T,C,M].flatten(-2) -> c*M + m)
        x = x.transpose(0, 1, 3, 2).reshape(b, t, 3 * N_MELS)
        x = BiGRU(256, name="gru")(x)
        x = nn.Dense(N_CLASS, name="fc")(x)
        return jax.nn.sigmoid(x)


def to_viterbi_f0(hidden: np.ndarray, thred: float = 0.03) -> np.ndarray:
    """Viterbi decode over the 360 pitch bins with the reference's band-limited
    transition matrix (``modules/rmvpe/utils.py:27-43``), then local averaging
    around the decoded path. hidden: [T, N_CLASS]."""
    if not hasattr(to_viterbi_f0, "transition"):
        xx, yy = np.meshgrid(range(N_CLASS), range(N_CLASS))
        transition = np.maximum(30 - np.abs(xx - yy), 0).astype(np.float64)
        to_viterbi_f0.transition = transition / transition.sum(axis=1, keepdims=True)
    log_trans = np.log(np.maximum(to_viterbi_f0.transition, 1e-12))
    prob = hidden.T.astype(np.float64)
    prob = prob / np.maximum(prob.sum(axis=0, keepdims=True), 1e-12)
    log_prob = np.log(np.maximum(prob, 1e-12))  # [N, T]

    n, t = log_prob.shape
    dp = np.full((t, n), -np.inf)
    back = np.zeros((t, n), np.int64)
    dp[0] = np.log(1.0 / n) + log_prob[:, 0]
    for i in range(1, t):
        scores = dp[i - 1][:, None] + log_trans  # [from, to]
        back[i] = scores.argmax(axis=0)
        dp[i] = scores.max(axis=0) + log_prob[:, i]
    path = np.zeros(t, np.int64)
    path[-1] = dp[-1].argmax()
    for i in range(t - 2, -1, -1):
        path[i] = back[i + 1][path[i + 1]]
    return _decode_with_centers(hidden, path[:, None], thred)


def _decode_with_centers(hidden: np.ndarray, center: np.ndarray, thred: float) -> np.ndarray:
    idx = np.arange(N_CLASS)[None, :]
    idx_cents = idx * 20 + CONST
    start = np.clip(center - 4, 0, None)
    end = np.clip(center + 5, None, N_CLASS)
    mask = (idx >= start) & (idx < end)
    weights = hidden * mask
    product_sum = np.sum(weights * idx_cents, axis=1)
    weight_sum = np.sum(weights, axis=1)
    cents = product_sum / (weight_sum + (weight_sum == 0))
    f0 = 10 * 2 ** (cents / 1200)
    uv = hidden.max(axis=1) < thred
    return (f0 * ~uv).astype(np.float32)


def to_local_average_f0(hidden: np.ndarray, thred: float = 0.03) -> np.ndarray:
    """Decode salience to f0 via local weighted average over +/-4 cent bins
    (``modules/rmvpe/utils.py:8-24``). hidden: [T, N_CLASS] -> f0 [T] Hz."""
    idx = np.arange(N_CLASS)[None, :]
    idx_cents = idx * 20 + CONST
    center = np.argmax(hidden, axis=1, keepdims=True)
    start = np.clip(center - 4, 0, None)
    end = np.clip(center + 5, None, N_CLASS)
    mask = (idx >= start) & (idx < end)
    weights = hidden * mask
    product_sum = np.sum(weights * idx_cents, axis=1)
    weight_sum = np.sum(weights, axis=1)
    cents = product_sum / (weight_sum + (weight_sum == 0))
    f0 = 10 * 2 ** (cents / 1200)
    uv = hidden.max(axis=1) < thred
    return (f0 * ~uv).astype(np.float32)


# ---- torch ckpt conversion --------------------------------------------------


def _bn(sd, prefix):
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def _conv2d(w):  # [Cout, Cin, kh, kw] -> [kh, kw, Cin, Cout]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convt2d(w):  # [Cin, Cout, kh, kw] -> flipped [kh, kw, Cin, Cout]
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def _convblockres(sd, prefix):
    p = {
        "conv1": {"kernel": _conv2d(sd[f"{prefix}.conv.0.weight"])},
        "bn1": _bn(sd, f"{prefix}.conv.1"),
        "conv2": {"kernel": _conv2d(sd[f"{prefix}.conv.3.weight"])},
        "bn2": _bn(sd, f"{prefix}.conv.4"),
    }
    if f"{prefix}.shortcut.weight" in sd:
        p["shortcut"] = {
            "kernel": _conv2d(sd[f"{prefix}.shortcut.weight"]),
            "bias": sd[f"{prefix}.shortcut.bias"],
        }
    return p


def _gru_cell(sd, prefix, reverse=False):
    sfx = "_reverse" if reverse else ""
    w_ih = sd[f"{prefix}.weight_ih_l0{sfx}"]  # [3H, in], gates r,z,n
    w_hh = sd[f"{prefix}.weight_hh_l0{sfx}"]
    b_ih = sd[f"{prefix}.bias_ih_l0{sfx}"]
    b_hh = sd[f"{prefix}.bias_hh_l0{sfx}"]
    h = w_hh.shape[1]
    wr, wz, wn = np.split(w_ih, 3)
    ur, uz, un = np.split(w_hh, 3)
    br, bz, bn_ = np.split(b_ih, 3)
    hbr, hbz, hbn = np.split(b_hh, 3)
    # flax GRUCell: ir/iz/in_ Dense (no bias on ir/iz... it has bias on in_ only?
    # flax GRUCell: r = sigm(ir(x) + hr(h)); Dense ir has bias, hr has no bias;
    # n = tanh(in_(x) + r * hn(h)), hn has bias.
    return {
        "ir": {"kernel": wr.T, "bias": br + hbr},
        "iz": {"kernel": wz.T, "bias": bz + hbz},
        "in": {"kernel": wn.T, "bias": bn_},
        "hr": {"kernel": ur.T},
        "hz": {"kernel": uz.T},
        "hn": {"kernel": un.T, "bias": hbn},
    }


def convert_rmvpe(sd: dict) -> dict:
    """Reference E2E0 state dict -> flax params (TimbreFilter params are dead
    in the forward pass and skipped)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p = {"unet": {}, "cnn": {}, "gru": {}, "fc": {}}
    u = p["unet"]
    u["encoder_bn"] = _bn(sd, "unet.encoder.bn")
    for i in range(5):
        enc = {}
        for j in range(4):
            enc[f"conv_{j}"] = _convblockres(sd, f"unet.encoder.layers.{i}.conv.{j}")
        u[f"enc_{i}"] = enc
    for i in range(4):
        inter = {}
        for j in range(4):
            inter[f"conv_{j}"] = _convblockres(
                sd, f"unet.intermediate.layers.{i}.conv.{j}"
            )
        u[f"inter_{i}"] = inter
    for i in range(5):
        dec = {
            "convt": {"kernel": _convt2d(sd[f"unet.decoder.layers.{i}.conv1.0.weight"])},
            "bn1": _bn(sd, f"unet.decoder.layers.{i}.conv1.1"),
        }
        for j in range(4):
            dec[f"conv2_{j}"] = _convblockres(sd, f"unet.decoder.layers.{i}.conv2.{j}")
        u[f"dec_{i}"] = dec
    p["cnn"] = {"kernel": _conv2d(sd["cnn.weight"]), "bias": sd["cnn.bias"]}
    p["gru"] = {
        "fwd_cell": _gru_cell(sd, "fc.0.gru"),
        "bwd_cell": _gru_cell(sd, "fc.0.gru", reverse=True),
    }
    p["fc"] = {"kernel": sd["fc.1.weight"].T, "bias": sd["fc.1.bias"]}
    return {"params": p}
