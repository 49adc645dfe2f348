"""Built-in autocorrelation pitch extractor (Praat ``to_pitch_ac`` family).

A jittable, dependency-free stand-in for the reference's parselmouth extractor
(``component/pe/parselmouth.py``): windowed frames -> FFT autocorrelation ->
normalise by the window's autocorrelation (Boersma 1993) -> best lag in the
[f0_min, f0_max] band with parabolic interpolation -> voicing decision at
threshold 0.6 on the normalised peak.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.pe import BasePitchExtractor, pad_frames, register_pe
from prodiff_tpu.utils.pitch_utils import interp_f0


@functools.partial(jax.jit, static_argnames=("frame_len", "hop", "fft_len"))
def _acf_frames(x: jnp.ndarray, window: jnp.ndarray, frame_len: int, hop: int, fft_len: int):
    n_frames = 1 + (x.shape[-1] - frame_len) // hop
    idx = (
        jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    )
    frames = x[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)
    fw = frames * window
    spec = jnp.fft.rfft(fw, n=fft_len, axis=1)
    acf = jnp.fft.irfft(jnp.abs(spec) ** 2, n=fft_len, axis=1)[:, :frame_len]
    acf = acf / jnp.maximum(acf[:, :1], 1e-12)
    # window autocorrelation for normalisation
    wspec = jnp.fft.rfft(window, n=fft_len)
    wacf = jnp.fft.irfft(jnp.abs(wspec) ** 2, n=fft_len)[:frame_len]
    wacf = wacf / jnp.maximum(wacf[0], 1e-12)
    return acf / jnp.maximum(wacf[None, :], 1e-3)


@register_pe
class ACF(BasePitchExtractor):
    def get_pitch(self, waveform, samplerate, length, *, hop_size,
                  f0_min=65, f0_max=1100, speed=1, interp_uv=False,
                  voicing_threshold=0.6):
        waveform = np.asarray(waveform, np.float32)
        hop = int(np.round(hop_size * speed))
        # window long enough for 3 periods of f0_min (Praat uses 3/f0_min)
        frame_len = int(2 ** np.ceil(np.log2(3 * samplerate / f0_min)))
        fft_len = 2 * frame_len
        pad = frame_len // 2
        x = np.pad(waveform, (pad, pad))
        window = np.hanning(frame_len).astype(np.float32)

        r = np.asarray(
            _acf_frames(jnp.asarray(x), jnp.asarray(window), frame_len, hop, fft_len)
        )
        lag_min = max(2, int(samplerate / f0_max))
        lag_max = min(frame_len - 2, int(samplerate / f0_min))
        band = r[:, lag_min : lag_max + 1]
        best = band.argmax(axis=1) + lag_min
        peak = r[np.arange(len(r)), best]
        # parabolic interpolation around the peak lag
        r_m1 = r[np.arange(len(r)), best - 1]
        r_p1 = r[np.arange(len(r)), best + 1]
        denom = 2 * (2 * peak - r_m1 - r_p1)
        shift = np.where(np.abs(denom) > 1e-9, (r_p1 - r_m1) / denom, 0.0)
        lag = best + np.clip(shift, -1, 1)
        f0 = samplerate / lag
        voiced = (peak > voicing_threshold) & (f0 >= f0_min) & (f0 <= f0_max)
        f0 = np.where(voiced, f0, 0.0).astype(np.float32)

        f0 = pad_frames(f0, hop, waveform.shape[0], length)
        uv = f0 == 0
        if interp_uv:
            f0, uv = interp_f0(f0, uv)
        return f0, uv
