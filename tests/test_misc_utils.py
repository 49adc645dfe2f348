"""Viterbi f0 decode, Timer, denoise util."""

import numpy as np


def test_viterbi_smooths_outliers():
    from prodiff_tpu.models.rmvpe import CONST, to_local_average_f0, to_viterbi_f0

    hidden = np.zeros((6, 360), np.float32)
    hidden[:, 100] = 1.0
    hidden[3, 100] = 0.4
    hidden[3, 300] = 0.5  # spurious octave jump
    want = 10 * 2 ** ((100 * 20 + CONST) / 1200)
    f0_vit = to_viterbi_f0(hidden)
    assert abs(f0_vit[3] - want) < 1.0  # band-limited transitions reject the jump
    f0_avg = to_local_average_f0(hidden)
    assert abs(f0_avg[3] - want) > 100  # greedy argmax follows it


def test_timer_accumulates():
    from prodiff_tpu.utils.profiling import Timer

    Timer.reset()
    for _ in range(3):
        with Timer("stage"):
            pass
    assert Timer.counts["stage"] == 3
    assert Timer.report()["stage"] >= 0


def test_denoise_reduces_noise_floor(rng):
    from prodiff_tpu.vocoders.hifigan import denoise

    wav = (rng.normal(size=16384) * 0.01).astype(np.float32)  # pure noise floor
    out = denoise(wav, v=0.5, fft_size=1024, hop_size=256, win_size=1024)
    assert out.shape == wav.shape
    assert np.abs(out).mean() < np.abs(wav).mean() * 0.5
    # a strong sinusoid survives mild subtraction
    t = np.arange(16384) / 44100
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out_tone = denoise(tone, v=0.1, fft_size=1024, hop_size=256, win_size=1024)
    assert np.abs(out_tone).mean() > np.abs(tone).mean() * 0.8


def test_mcd_properties(rng):
    import jax.numpy as jnp

    from prodiff_tpu.ops.metrics import mel_cepstral_distortion

    mel = rng.normal(size=(50, 80)).astype(np.float32)
    assert float(mel_cepstral_distortion(jnp.asarray(mel), jnp.asarray(mel))) < 1e-5
    # constant offset only moves c0, which is excluded
    shifted = mel + 3.0
    assert float(mel_cepstral_distortion(jnp.asarray(mel), jnp.asarray(shifted))) < 1e-3
    # spectral-shape distortion registers
    noisy = mel + rng.normal(size=mel.shape).astype(np.float32)
    d = float(mel_cepstral_distortion(jnp.asarray(mel), jnp.asarray(noisy)))
    assert d > 1.0


def test_get_note_dur_slur_merge():
    """Slurred notes merge into their word note — same semantics as the
    reference's two-pointer loop (handler/infer/handler.py:186-196)."""
    from prodiff_tpu.infer.handler import SVSInferHandler

    f = SVSInferHandler.get_note_dur
    # slur=0 starts a word; slur=1 extends the previous word
    assert f(None, [1.0, 0.5, 0.25], [0, 1, 0]) == [1.5, 0.25]
    assert f(None, [1.0, 0.5, 0.25, 0.25], [0, 0, 1, 1]) == [1.0, 1.0]
    assert f(None, [2.0], [0]) == [2.0]
    # leading slur (degenerate input): reference keeps it attached to slot 0
    assert f(None, [0.5, 0.5], [1, 0]) == [0.5, 0.5]
