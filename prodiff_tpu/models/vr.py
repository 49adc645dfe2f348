"""VR vocal-remover (harmonic/aperiodic separator) in flax
(reference ``modules/vr/nets.py``, ``layers.py``).

CascadedNet: 3-stage band-split U-Nets (low/high band, then full band with an
LSTM bottleneck and ASPP), predicting a bounded complex mask over the STFT.
Inference-only; weights converted from the released torch checkpoint.
The complex mask is carried as 2 real channels (real | imag) — TPUs have no
complex conv units, and the reference itself splits into real channels at the
network boundary (``nets.py:90``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.models.rmvpe import BN  # inference-mode batchnorm
from prodiff_tpu.ops.stft_extras import istft, stft_complex


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True). x: [B, H, W, C]."""

    def axis_matrix(n_in: int, n_out: int) -> np.ndarray:
        if n_in == 1:
            return np.ones((n_out, 1), np.float32)
        pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        w = (pos - lo).astype(np.float32)
        m = np.zeros((n_out, n_in), np.float32)
        m[np.arange(n_out), lo] += 1 - w
        m[np.arange(n_out), hi] += w
        return m

    mh = jnp.asarray(axis_matrix(x.shape[1], out_hw[0]))
    mw = jnp.asarray(axis_matrix(x.shape[2], out_hw[1]))
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


class Conv2DBNActiv(nn.Module):
    nout: int
    ksize: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    activ: str = "relu"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.nout, (self.ksize, self.ksize),
            strides=(self.stride, self.stride),
            padding=self.pad,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, name="conv",
        )(x)
        x = BN(name="bn")(x)
        return jax.nn.relu(x) if self.activ == "relu" else nn.leaky_relu(x, 0.01)


class Encoder(nn.Module):
    nout: int

    @nn.compact
    def __call__(self, x):
        h = Conv2DBNActiv(self.nout, 3, 2, 1, activ="leaky", name="conv1")(x)
        h = Conv2DBNActiv(self.nout, 3, 1, 1, activ="leaky", name="conv2")(h)
        return h


class Decoder(nn.Module):
    nout: int
    dropout: bool = False

    @nn.compact
    def __call__(self, x, skip=None):
        x = resize_bilinear_align_corners(x, (x.shape[1] * 2, x.shape[2] * 2))
        if skip is not None:
            # crop_center on the time axis (axis 2 here: [B, F, T, C])
            if skip.shape[2] > x.shape[2]:
                s = (skip.shape[2] - x.shape[2]) // 2
                skip = skip[:, :, s : s + x.shape[2]]
            x = jnp.concatenate([x, skip], axis=-1)
        return Conv2DBNActiv(self.nout, 3, 1, 1, name="conv1")(x)


class ASPPModule(nn.Module):
    nout: int
    dilations: Tuple[int, int, int] = (4, 8, 12)

    @nn.compact
    def __call__(self, x):
        h = x.shape[1]
        feat1 = Conv2DBNActiv(self.nout, 1, 1, 0, name="conv1")(
            x.mean(axis=1, keepdims=True)
        )
        feat1 = jnp.broadcast_to(feat1, (feat1.shape[0], h, *feat1.shape[2:]))
        feat2 = Conv2DBNActiv(self.nout, 1, 1, 0, name="conv2")(x)
        feat3 = Conv2DBNActiv(
            self.nout, 3, 1, self.dilations[0], self.dilations[0], name="conv3"
        )(x)
        feat4 = Conv2DBNActiv(
            self.nout, 3, 1, self.dilations[1], self.dilations[1], name="conv4"
        )(x)
        feat5 = Conv2DBNActiv(
            self.nout, 3, 1, self.dilations[2], self.dilations[2], name="conv5"
        )(x)
        out = jnp.concatenate([feat1, feat2, feat3, feat4, feat5], axis=-1)
        return Conv2DBNActiv(self.nout, 1, 1, 0, name="bottleneck")(out)


class BiLSTM(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, name="fwd_cell"))(x)
        bwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden, name="bwd_cell"),
            reverse=True, keep_order=True,
        )(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class LSTMModule(nn.Module):
    nin_lstm: int
    nout_lstm: int

    @nn.compact
    def __call__(self, x):
        """x: [B, F, T, C] -> [B, F(=nin_lstm), T, 1]."""
        h = Conv2DBNActiv(1, 1, 1, 0, name="conv")(x)[..., 0]  # [B, F, T]
        h = h.swapaxes(1, 2)  # [B, T, F]
        h = BiLSTM(self.nout_lstm // 2, name="lstm")(h)  # [B, T, nout]
        h = nn.Dense(self.nin_lstm, name="dense")(h)
        h = BN(name="dense_bn")(h)
        h = jax.nn.relu(h)
        return h.swapaxes(1, 2)[..., None]  # [B, F, T, 1]


class BaseNet(nn.Module):
    nout: int
    nin_lstm: int
    nout_lstm: int
    dilations: Tuple[Tuple[int, int], ...] = ((4, 2), (8, 4), (12, 6))

    @nn.compact
    def __call__(self, x):
        e1 = Conv2DBNActiv(self.nout, 3, 1, 1, name="enc1")(x)
        e2 = Encoder(self.nout * 2, name="enc2")(e1)
        e3 = Encoder(self.nout * 4, name="enc3")(e2)
        e4 = Encoder(self.nout * 6, name="enc4")(e3)
        e5 = Encoder(self.nout * 8, name="enc5")(e4)
        h = ASPPModule(self.nout * 8, tuple(d[0] for d in self.dilations), name="aspp")(e5)
        h = Decoder(self.nout * 6, name="dec4")(h, e4)
        h = Decoder(self.nout * 4, name="dec3")(h, e3)
        h = Decoder(self.nout * 2, name="dec2")(h, e2)
        lstm_out = LSTMModule(self.nin_lstm, self.nout_lstm, name="lstm_dec2")(h)
        h = jnp.concatenate([h, lstm_out], axis=-1)
        return Decoder(self.nout, name="dec1")(h, e1)


class CascadedNet(nn.Module):
    n_fft: int
    hop_length: int
    nout: int = 32
    nout_lstm: int = 128
    is_mono: bool = True

    @property
    def max_bin(self):
        return self.n_fft // 2

    @property
    def nin_lstm(self):
        return self.max_bin // 2

    @nn.compact
    def __call__(self, x):
        """x: [B, F, T, 2] (real|imag channels) -> bounded complex mask, same shape
        with F padded back to n_fft//2+1 by edge replication."""
        output_bin = self.n_fft // 2 + 1
        x_in = x[:, : self.max_bin]
        bandw = x_in.shape[1] // 2
        l1_in, h1_in = x_in[:, :bandw], x_in[:, bandw:]

        l1 = BaseNet(self.nout // 2, self.nin_lstm // 2, self.nout_lstm, name="stg1_low")(l1_in)
        l1 = Conv2DBNActiv(self.nout // 4, 1, 1, 0, name="stg1_low_out")(l1)
        h1 = BaseNet(self.nout // 4, self.nin_lstm // 2, self.nout_lstm // 2, name="stg1_high")(h1_in)
        aux1 = jnp.concatenate([l1, h1], axis=1)

        l2_in = jnp.concatenate([l1_in, l1], axis=-1)
        h2_in = jnp.concatenate([h1_in, h1], axis=-1)
        l2 = BaseNet(self.nout, self.nin_lstm // 2, self.nout_lstm, name="stg2_low")(l2_in)
        l2 = Conv2DBNActiv(self.nout // 2, 1, 1, 0, name="stg2_low_out")(l2)
        h2 = BaseNet(self.nout // 2, self.nin_lstm // 2, self.nout_lstm // 2, name="stg2_high")(h2_in)
        aux2 = jnp.concatenate([l2, h2], axis=1)

        f3_in = jnp.concatenate([x_in, aux1, aux2], axis=-1)
        f3 = BaseNet(self.nout, self.nin_lstm, self.nout_lstm, name="stg3_full")(f3_in)
        mask = nn.Conv(2, (1, 1), use_bias=False, name="out")(f3)  # [B, F, T, 2]

        # bounded complex mask: tanh(|m|) * m / |m|
        mag = jnp.sqrt(jnp.sum(mask ** 2, axis=-1, keepdims=True))
        mask = jnp.tanh(mag) * mask / (mag + 1e-8)
        # replicate-pad the top frequency bins
        pad_rows = output_bin - mask.shape[1]
        top = jnp.repeat(mask[:, -1:], pad_rows, axis=1)
        return jnp.concatenate([mask, top], axis=1)


class SeparationModel:
    """Host-facing wrapper: wav -> harmonic wav via masked STFT resynthesis
    (reference ``CascadedNet.predict_from_audio``, ``nets.py:182-205``)."""

    def __init__(self, params, n_fft: int, hop_length: int, nout=32, nout_lstm=128,
                 is_mono=True):
        self.params = params
        self.n_fft, self.hop_length = n_fft, hop_length
        self.is_mono = is_mono
        self.model = CascadedNet(n_fft, hop_length, nout, nout_lstm, is_mono)
        self.window = jnp.asarray(
            (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)).astype(np.float32)
        )
        import functools

        @functools.partial(jax.jit, static_argnames=("length",))
        def run(params, wav, length):
            spec = stft_complex(wav, self.window, self.n_fft, self.hop_length)  # [B,F,T]
            x = jnp.stack([spec.real, spec.imag], axis=-1)  # [B, F, T, 2]
            mask = self.model.apply(params, x)
            masked = (mask[..., 0] + 1j * mask[..., 1]) * spec
            return istft(masked, self.window, self.n_fft, self.hop_length, length)

        self._run = run

    def predict_from_audio(self, waveform: np.ndarray) -> np.ndarray:
        """waveform [T] -> harmonic part [T]."""
        x = np.asarray(waveform, np.float32)
        T = len(x)
        n_frames = T // self.hop_length + 1
        t_pad = (32 * (n_frames // 32 + 1) - 1) * self.hop_length - T
        tl_pad = t_pad // 2 // self.hop_length * self.hop_length
        x = np.pad(x, (tl_pad, t_pad - tl_pad))
        out = np.asarray(self._run(self.params, jnp.asarray(x)[None], len(x)))[0]
        return out[tl_pad : tl_pad + T]


# ---- torch ckpt conversion ---------------------------------------------------


def _conv2d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _bn(sd, prefix):
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def _conv_bn(sd, prefix):
    return {
        "conv": {"kernel": _conv2d(sd[f"{prefix}.conv.0.weight"])},
        "bn": _bn(sd, f"{prefix}.conv.1"),
    }


def _lstm_cell(sd, prefix, reverse=False):
    sfx = "_reverse" if reverse else ""
    w_ih = sd[f"{prefix}.weight_ih_l0{sfx}"]  # [4H, in] gates i,f,g,o
    w_hh = sd[f"{prefix}.weight_hh_l0{sfx}"]
    b_ih = sd[f"{prefix}.bias_ih_l0{sfx}"]
    b_hh = sd[f"{prefix}.bias_hh_l0{sfx}"]
    wi, wf, wg, wo = np.split(w_ih, 4)
    ui, uf, ug, uo = np.split(w_hh, 4)
    bi, bf, bg, bo = np.split(b_ih + b_hh, 4)
    return {
        "ii": {"kernel": wi.T},
        "if": {"kernel": wf.T},
        "ig": {"kernel": wg.T},
        "io": {"kernel": wo.T},
        "hi": {"kernel": ui.T, "bias": bi},
        "hf": {"kernel": uf.T, "bias": bf},
        "hg": {"kernel": ug.T, "bias": bg},
        "ho": {"kernel": uo.T, "bias": bo},
    }


def _basenet(sd, prefix):
    p = {
        "enc1": _conv_bn(sd, f"{prefix}.enc1"),
    }
    for i in range(2, 6):
        p[f"enc{i}"] = {
            "conv1": _conv_bn(sd, f"{prefix}.enc{i}.conv1"),
            "conv2": _conv_bn(sd, f"{prefix}.enc{i}.conv2"),
        }
    aspp = {}
    aspp["conv1"] = _conv_bn(sd, f"{prefix}.aspp.conv1.1")
    for i in range(2, 6):
        aspp[f"conv{i}"] = _conv_bn(sd, f"{prefix}.aspp.conv{i}")
    aspp["bottleneck"] = _conv_bn(sd, f"{prefix}.aspp.bottleneck")
    p["aspp"] = aspp
    for i in (4, 3, 2, 1):
        p[f"dec{i}"] = {"conv1": _conv_bn(sd, f"{prefix}.dec{i}.conv1")}
    p["lstm_dec2"] = {
        "conv": _conv_bn(sd, f"{prefix}.lstm_dec2.conv"),
        "lstm": {
            "fwd_cell": _lstm_cell(sd, f"{prefix}.lstm_dec2.lstm"),
            "bwd_cell": _lstm_cell(sd, f"{prefix}.lstm_dec2.lstm", reverse=True),
        },
        "dense": {
            "kernel": sd[f"{prefix}.lstm_dec2.dense.0.weight"].T,
            "bias": sd[f"{prefix}.lstm_dec2.dense.0.bias"],
        },
        "dense_bn": _bn(sd, f"{prefix}.lstm_dec2.dense.1"),
    }
    return p


def convert_vr(sd: dict) -> dict:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p = {
        "stg1_low": _basenet(sd, "stg1_low_band_net.0"),
        "stg1_low_out": _conv_bn(sd, "stg1_low_band_net.1"),
        "stg1_high": _basenet(sd, "stg1_high_band_net"),
        "stg2_low": _basenet(sd, "stg2_low_band_net.0"),
        "stg2_low_out": _conv_bn(sd, "stg2_low_band_net.1"),
        "stg2_high": _basenet(sd, "stg2_high_band_net"),
        "stg3_full": _basenet(sd, "stg3_full_band_net"),
        "out": {"kernel": _conv2d(sd["out.weight"])},
    }
    return {"params": p}


def load_sep_model(model_path: str) -> SeparationModel:
    import os

    import yaml

    config_file = os.path.join(os.path.dirname(model_path), "config.yaml")
    with open(config_file) as f:
        args = yaml.safe_load(f)
    from prodiff_tpu.utils.torch_convert import load_torch_state_dict

    sd = load_torch_state_dict(model_path)
    params = jax.tree.map(jnp.asarray, convert_vr(sd))
    return SeparationModel(
        params,
        n_fft=args["n_fft"],
        hop_length=args["hop_length"],
        nout=args["n_out"],
        nout_lstm=args["n_out_lstm"],
        is_mono=args.get("is_mono", True),
    )
