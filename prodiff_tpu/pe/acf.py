"""Built-in autocorrelation pitch extractor — Boersma (1993), Praat's
``Sound: To Pitch (ac)`` algorithm.

A dependency-free implementation of the algorithm behind the reference's
parselmouth extractor (``component/pe/parselmouth.py:9-26``), with the same
call contract and Praat's published defaults:

1. Frames of 3 periods of ``f0_min`` (periods_per_window = 3), Hanning
   windowed, local mean subtracted.
2. Normalised autocorrelation via FFT, divided by the window's normalised
   autocorrelation (Boersma eq. 9) — the paper's key accuracy trick.
3. Per frame, up to ``max_candidates`` local maxima in the lag band with
   parabolic lag refinement; values > 1 reflected (r -> 1/r).
4. Candidate strengths: voiced R = r − OctaveCost·log2(f0_min·τ)
   (eq. 26); unvoiced R = VoicingThreshold +
   max(0, 2 − intensity/(SilenceThreshold/(1+VoicingThreshold))) (eq. 23),
   with intensity = frame peak / global peak.
5. Viterbi path over candidates: octave-jump cost
   OctaveJumpCost·|log2(f1/f2)| between voiced frames, VoicedUnvoicedCost on
   voicing flips, both scaled by 0.01/time_step so the strength/transition
   balance is time-step independent (Praat's timeStepCorrection).

Candidate peaks are refined on the windowed-sinc-interpolated ACF (depth 30
per side, Praat's ``NUM_PEAK_INTERPOLATE_SINC70``), so accuracy matches Praat
to sub-cent on stationary tones (pinned by tests/test_pe_acf.py). When the
real parselmouth bindings are installed, ``pe/parselmouth_pe.py`` is used
instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.pe import BasePitchExtractor, pad_frames, register_pe
from prodiff_tpu.utils.pitch_utils import interp_f0

MAX_CANDIDATES = 15
SILENCE_THRESHOLD = 0.03
OCTAVE_COST = 0.01
OCTAVE_JUMP_COST = 0.35
VOICED_UNVOICED_COST = 0.14
SINC_DEPTH = 30  # Praat NUM_PEAK_INTERPOLATE_SINC70 band (depth 30/side)


def _sinc_values(r: np.ndarray, t: np.ndarray, depth: int = SINC_DEPTH) -> np.ndarray:
    """Windowed-sinc interpolation of each frame's ACF at fractional lags.

    r: [N, L]; t: [N, K, P] fractional lags -> values [N, K, P]
    (Praat ``NUM_interpolate_sinc``: sinc kernel of ``depth`` taps per side
    under a raised-cosine taper).
    """
    n, L = r.shape
    base = np.floor(t).astype(np.int64)
    taps = np.arange(-depth + 1, depth + 1)
    idx = base[..., None] + taps  # [N, K, P, 2*depth]
    d = t[..., None] - idx
    idx = np.clip(idx, 0, L - 1)
    taper = np.where(
        np.abs(d) < depth + 1,
        0.5 * (1.0 + np.cos(np.pi * d / (depth + 1))),
        0.0,
    )
    kern = np.sinc(d) * taper
    vals = r[np.arange(n)[:, None, None, None], idx]
    return (vals * kern).sum(axis=-1)


def _sinc_refine(r: np.ndarray, best_lag: np.ndarray, chunk: int = 256):
    """Two-stage grid search on the sinc-interpolated ACF around each integer
    candidate lag (replaces parabolic refinement for exact-Praat accuracy;
    final resolution 0.01 sample + parabolic, i.e. sub-0.1-cent at audio
    rates). Returns (lag_ref, r_ref), each [N, K]."""
    n = r.shape[0]
    lag_out = np.zeros(best_lag.shape, np.float64)
    r_out = np.zeros(best_lag.shape, np.float64)
    for s in range(0, n, chunk):
        sl = slice(s, min(s + chunk, n))
        lag0 = best_lag[sl].astype(np.float64)
        t_best = lag0
        for half_width, pts in [(1.0, 21), (0.1, 21)]:
            offs = np.linspace(-half_width, half_width, pts)
            t = t_best[..., None] + offs  # [n, K, P]
            v = _sinc_values(r[sl], t)
            k = np.argmax(v, axis=-1)
            # parabolic touch-up on the grid triplet around the max
            k_in = np.clip(k, 1, pts - 2)
            ii = np.indices(k.shape)
            vm1, v0, vp1 = (
                v[ii[0], ii[1], k_in - 1],
                v[ii[0], ii[1], k_in],
                v[ii[0], ii[1], k_in + 1],
            )
            denom = 2 * (2 * v0 - vm1 - vp1)
            shift = np.where(
                np.abs(denom) > 1e-12, (vp1 - vm1) / np.where(denom == 0, 1, denom), 0.0
            )
            shift = np.clip(shift, -1.0, 1.0)
            step = offs[1] - offs[0]
            t_best = np.take_along_axis(t, k_in[..., None], -1)[..., 0] + shift * step
        r_out[sl] = _sinc_values(r[sl], t_best[..., None])[..., 0]
        lag_out[sl] = t_best
    return lag_out, r_out


@functools.partial(jax.jit, static_argnames=("frame_len", "hop", "fft_len"))
def _acf_frames(x: jnp.ndarray, window: jnp.ndarray, frame_len: int, hop: int, fft_len: int):
    """-> (normalised lag-domain ACF [n_frames, frame_len], frame peaks)."""
    n_frames = 1 + (x.shape[-1] - frame_len) // hop
    idx = (
        jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    )
    frames = x[idx]
    peaks = jnp.abs(frames).max(axis=1)
    frames = frames - frames.mean(axis=1, keepdims=True)
    fw = frames * window
    spec = jnp.fft.rfft(fw, n=fft_len, axis=1)
    acf = jnp.fft.irfft(jnp.abs(spec) ** 2, n=fft_len, axis=1)[:, :frame_len]
    acf = acf / jnp.maximum(acf[:, :1], 1e-12)
    # window autocorrelation for normalisation (Boersma eq. 9)
    wspec = jnp.fft.rfft(window, n=fft_len)
    wacf = jnp.fft.irfft(jnp.abs(wspec) ** 2, n=fft_len)[:frame_len]
    wacf = wacf / jnp.maximum(wacf[0], 1e-12)
    return acf / jnp.maximum(wacf[None, :], 1e-3), peaks


def _candidates(r, peaks, global_peak, sr, f0_min, f0_max, voicing_threshold):
    """Per-frame pitch candidates.

    Returns freq [N, K] (0 = unvoiced candidate at k=0) and strength [N, K].
    """
    n_frames, frame_len = r.shape
    lag_min = max(2, int(np.floor(sr / f0_max)))
    lag_max = min(frame_len - 2, int(np.ceil(sr / f0_min)))

    # local maxima inside the band
    interior = r[:, 1:-1]
    is_max = (interior > r[:, :-2]) & (interior >= r[:, 2:])
    lags = np.arange(1, frame_len - 1)
    band = (lags >= lag_min) & (lags <= lag_max)
    cand_mask = is_max & band[None, :]

    # keep the strongest K-1 voiced candidates per frame
    k_voiced = MAX_CANDIDATES - 1
    masked_r = np.where(cand_mask, interior, -np.inf)
    top = np.argpartition(-masked_r, k_voiced, axis=1)[:, :k_voiced]
    rows = np.arange(n_frames)[:, None]
    top_r = masked_r[rows, top]
    best_lag = top + 1  # interior offset

    # windowed-sinc peak refinement, depth 30 per side (Praat
    # NUM_PEAK_INTERPOLATE_SINC70; closes the round-2 "parabolic only" delta)
    lag_ref, r_ref = _sinc_refine(r, best_lag)
    # values > 1 are normalisation artefacts: reflect (Praat)
    r_ref = np.where(r_ref > 1.0, 1.0 / np.maximum(r_ref, 1e-9), r_ref)

    freq = sr / np.maximum(lag_ref, 1e-9)
    valid = np.isfinite(top_r) & (freq >= f0_min) & (freq <= f0_max)
    strength = np.where(
        valid,
        r_ref - OCTAVE_COST * np.log2(np.maximum(f0_min * lag_ref / sr, 1e-9)),
        -np.inf,
    )
    freq = np.where(valid, freq, 0.0)

    # unvoiced candidate (k=0)
    intensity = peaks / max(global_peak, 1e-12)
    r_unvoiced = voicing_threshold + np.maximum(
        0.0, 2.0 - intensity / (SILENCE_THRESHOLD / (1.0 + voicing_threshold))
    )
    freq_all = np.concatenate([np.zeros((n_frames, 1)), freq], axis=1)
    str_all = np.concatenate([r_unvoiced[:, None], strength], axis=1)
    return freq_all, str_all


def _path_finder(freq, strength, time_step):
    """Viterbi over candidates, maximising Σ strength − Σ transition cost."""
    n_frames, k = freq.shape
    correction = 0.01 / max(time_step, 1e-6)
    jump_cost = OCTAVE_JUMP_COST * correction
    vuv_cost = VOICED_UNVOICED_COST * correction

    voiced = freq > 0
    logf = np.where(voiced, np.log2(np.maximum(freq, 1e-9)), 0.0)

    score = strength[0].copy()
    back = np.zeros((n_frames, k), np.int32)
    for i in range(1, n_frames):
        # transition [from, to]
        both_v = voiced[i - 1][:, None] & voiced[i][None, :]
        flip = voiced[i - 1][:, None] != voiced[i][None, :]
        trans = np.where(
            both_v,
            jump_cost * np.abs(logf[i - 1][:, None] - logf[i][None, :]),
            np.where(flip, vuv_cost, 0.0),
        )
        total = score[:, None] - trans
        back[i] = np.argmax(total, axis=0)
        score = total[back[i], np.arange(k)] + strength[i]

    path = np.zeros(n_frames, np.int32)
    path[-1] = int(np.argmax(score))
    for i in range(n_frames - 1, 0, -1):
        path[i - 1] = back[i, path[i]]
    return freq[np.arange(n_frames), path]


@register_pe
class ACF(BasePitchExtractor):
    def get_pitch(self, waveform, samplerate, length, *, hop_size,
                  f0_min=65, f0_max=1100, speed=1, interp_uv=False,
                  voicing_threshold=0.6):
        waveform = np.asarray(waveform, np.float32)
        hop = int(np.round(hop_size * speed))
        # 3 periods of f0_min (Praat periods_per_window for the AC method)
        frame_len = int(round(3 * samplerate / f0_min))
        fft_len = int(2 ** np.ceil(np.log2(2 * frame_len)))
        pad = frame_len // 2
        x = np.pad(waveform, (pad, pad))
        window = np.hanning(frame_len).astype(np.float32)

        r, peaks = _acf_frames(
            jnp.asarray(x), jnp.asarray(window), frame_len, hop, fft_len
        )
        r, peaks = np.asarray(r), np.asarray(peaks)
        global_peak = float(np.abs(waveform).max())

        freq, strength = _candidates(
            r, peaks, global_peak, samplerate, f0_min, f0_max, voicing_threshold
        )
        f0 = _path_finder(freq, strength, hop / samplerate).astype(np.float32)

        f0 = pad_frames(f0, hop, waveform.shape[0], length)
        uv = f0 == 0
        if interp_uv:
            f0, uv = interp_f0(f0, uv)
        return f0, uv
