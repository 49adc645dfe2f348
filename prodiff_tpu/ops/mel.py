"""STFT + mel spectrogram, jittable on TPU.

Reimplements the reference's nvSTFT mel pipeline
(``modules/nsf_hifigan/nvSTFT.py:33-100``) with XLA-friendly primitives:
reflect pad by ``((win-hop)//2, (win-hop+1)//2)``, non-centered framing, Hann
window, rFFT magnitude, mel filterbank matmul (MXU), then natural-log
compression with clip 1e-5. The SVS binarizer converts ln -> log10 via
``* 0.43429448190325176`` (``component/binarizer/binarizer_utils.py:94``); the
NSF-HiFiGAN wrapper converts back with ``* 2.30259``
(``component/vocoder/nsf_hifigan.py:52``). Those exact constants are exposed
here so both directions agree bit-for-bit with the reference convention.

The mel filterbank is a from-scratch Slaney/HTK implementation equivalent to
``librosa.filters.mel`` (librosa is not a dependency of this framework).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LN_TO_LOG10 = 0.434294  # reference uses this truncated constant at binarize
LOG10_TO_LN = 2.30259  # and this one at vocode


def hz_to_mel(frequencies, htk: bool = False):
    frequencies = np.asarray(frequencies, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + frequencies / 700.0)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = frequencies >= min_log_hz
    mels = np.where(
        log_t,
        min_log_mel + np.log(np.maximum(frequencies, 1e-10) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels, htk: bool = False):
    mels = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    return np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank, [n_mels, n_fft//2 + 1] (librosa-equivalent)."""
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_f = mel_to_hz(
        np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2), htk
    )
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]  # [n_mels+2, n_bins]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


def _frame(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[..., L] -> [..., n_frames, frame_length] by overlapping gather."""
    n_frames = 1 + (y.shape[-1] - frame_length) // hop
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop
        + jnp.arange(frame_length, dtype=jnp.int32)[None, :]
    )
    return y[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_size", "center"))
def stft_magnitude(
    y: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_size: int,
    center: bool = False,
) -> jnp.ndarray:
    """|STFT|, matching torch.stft conventions. y: [..., L] -> [..., F, n_frames]."""
    if center:
        y = jnp.pad(
            y, [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)], mode="reflect"
        )
    frames = _frame(y, win_size, hop) * window  # [..., n_frames, win]
    if win_size < n_fft:  # torch zero-pads the windowed frame symmetrically
        lpad = (n_fft - win_size) // 2
        frames = jnp.pad(
            frames, [(0, 0)] * (frames.ndim - 1) + [(lpad, n_fft - win_size - lpad)]
        )
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.abs(spec).swapaxes(-1, -2)  # [..., F, n_frames]


class MelSpectrogram:
    """nvSTFT-equivalent mel extractor with keyshift/speed support.

    ``keyshift`` rescales n_fft/win (host-side ints), ``speed`` rescales hop —
    identical to the reference (``nvSTFT.py:58-61``). Each distinct
    (keyshift, speed) pair compiles one program; steady-state use is
    (0, 1) only.
    """

    def __init__(
        self,
        sr: int = 44100,
        n_mels: int = 128,
        n_fft: int = 2048,
        win_size: int = 2048,
        hop_length: int = 512,
        fmin: float = 40,
        fmax: float = 16000,
        clip_val: float = 1e-5,
    ):
        self.sr, self.n_mels, self.n_fft = sr, n_mels, n_fft
        self.win_size, self.hop_length = win_size, hop_length
        self.fmin, self.fmax, self.clip_val = fmin, fmax, clip_val
        self.mel_basis = jnp.asarray(
            mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
        )  # [M, F]

    @staticmethod
    @functools.lru_cache(maxsize=8)
    def _window_np(win_size_new: int) -> np.ndarray:
        # torch.hann_window default is periodic
        n = np.arange(win_size_new, dtype=np.float32)
        return (0.5 - 0.5 * np.cos(2 * np.pi * n / win_size_new)).astype(np.float32)

    def _window(self, win_size_new: int) -> jnp.ndarray:
        # numpy-cached so it is trace-safe if get_mel is wrapped in jit
        return jnp.asarray(self._window_np(win_size_new))

    def get_mel(
        self, y: jnp.ndarray, keyshift: int = 0, speed: float = 1.0
    ) -> jnp.ndarray:
        """y: [B, L] in [-1, 1] -> log-mel (natural log) [B, M, T]."""
        factor = 2 ** (keyshift / 12)
        n_fft_new = int(np.round(self.n_fft * factor))
        win_size_new = int(np.round(self.win_size * factor))
        hop_new = int(np.round(self.hop_length * speed))

        pad_l = (win_size_new - hop_new) // 2
        pad_r = (win_size_new - hop_new + 1) // 2
        y = jnp.pad(y, [(0, 0), (pad_l, pad_r)], mode="reflect")
        spec = stft_magnitude(
            y, self._window(win_size_new), n_fft_new, hop_new, win_size_new
        )  # [B, F_new, T]
        if keyshift != 0:
            size = self.n_fft // 2 + 1
            resize = spec.shape[1]
            if resize < size:
                spec = jnp.pad(spec, [(0, 0), (0, size - resize), (0, 0)])
            spec = spec[:, :size, :] * self.win_size / win_size_new
        mel = jnp.einsum(
            "mf,bft->bmt", self.mel_basis, spec, preferred_element_type=jnp.float32
        )
        return jnp.log(jnp.clip(mel, self.clip_val, None))

    def wav2mel_log10(self, y: jnp.ndarray, keyshift: int = 0, speed: float = 1.0):
        """[B, L] -> [B, T, M] log10-mel, the framework-wide training convention
        (matches ``binarizer_utils.get_mel_spec``)."""
        mel = self.get_mel(y, keyshift=keyshift, speed=speed) * LN_TO_LOG10
        return mel.swapaxes(1, 2)
