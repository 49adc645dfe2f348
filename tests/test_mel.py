"""Golden tests: JAX STFT/mel vs torch (nvSTFT semantics) computed inline."""

import numpy as np
import pytest

import jax.numpy as jnp

from prodiff_tpu.ops.mel import (
    LN_TO_LOG10,
    MelSpectrogram,
    mel_filterbank,
    stft_magnitude,
)

torch = pytest.importorskip("torch")


def _torch_nvstft_mel(y, sr, n_fft, win, hop, n_mels, fmin, fmax, mel_basis_np):
    """Inline torch replica of nvSTFT.get_mel (keyshift=0, speed=1)."""
    y = torch.from_numpy(y).float()
    pad_l = (win - hop) // 2
    pad_r = (win - hop + 1) // 2
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad_l, pad_r), mode="reflect").squeeze(1)
    spec = torch.stft(
        y,
        n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=False,
        return_complex=True,
    ).abs()
    mel = torch.from_numpy(mel_basis_np) @ spec
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()


@pytest.mark.parametrize("n_fft,win,hop", [(512, 512, 128), (2048, 2048, 512)])
def test_stft_matches_torch(rng, n_fft, win, hop):
    y = rng.normal(size=(2, 8192)).astype(np.float32) * 0.1
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / win)
    got = np.asarray(
        stft_magnitude(jnp.asarray(y), jnp.asarray(window, jnp.float32), n_fft, hop, win)
    )
    want = (
        torch.stft(
            torch.from_numpy(y),
            n_fft,
            hop_length=hop,
            win_length=win,
            window=torch.hann_window(win),
            center=False,
            return_complex=True,
        )
        .abs()
        .numpy()
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_mel_filterbank_shape_and_partition():
    fb = mel_filterbank(44100, 2048, 128, 40, 16000)
    assert fb.shape == (128, 1025)
    assert np.all(fb >= 0)
    # every mel filter has some support
    assert np.all(fb.sum(axis=1) > 0)


def test_full_mel_matches_torch_replica(rng):
    sr, n_fft, win, hop, n_mels, fmin, fmax = 44100, 2048, 2048, 512, 128, 40, 16000
    y = (rng.normal(size=(1, 44100)) * 0.1).astype(np.float32)
    extractor = MelSpectrogram(sr, n_mels, n_fft, win, hop, fmin, fmax)
    got = np.asarray(extractor.get_mel(jnp.asarray(y)))
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    want = _torch_nvstft_mel(y, sr, n_fft, win, hop, n_mels, fmin, fmax, fb)
    assert got.shape == want.shape  # [B, M, T]
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)
    # training-convention output: [B, T, M] log10
    m2 = np.asarray(extractor.wav2mel_log10(jnp.asarray(y)))
    np.testing.assert_allclose(m2, want.transpose(0, 2, 1) * LN_TO_LOG10, atol=5e-3, rtol=5e-3)


def test_keyshift_path_compiles(rng):
    y = (rng.normal(size=(1, 22050)) * 0.1).astype(np.float32)
    extractor = MelSpectrogram()
    out = np.asarray(extractor.get_mel(jnp.asarray(y), keyshift=2))
    assert out.shape[1] == 128
    assert np.isfinite(out).all()


def test_mel_scale_anchor_points():
    """Exact anchors of the Slaney mel scale used by librosa.filters.mel
    (the reference's filterbank source, ``modules/nsf_hifigan/nvSTFT.py:60-64``):
    linear at 200/3 Hz-per-mel below 1 kHz, then log with step ln(6.4)/27, so
    mel(1000)=15 and mel(6400)=15+27=42 exactly. HTK anchor: mel(700)=2595*log10(2).
    """
    from prodiff_tpu.ops.mel import hz_to_mel, mel_to_hz

    np.testing.assert_allclose(hz_to_mel(1000.0), 15.0, rtol=1e-12)
    np.testing.assert_allclose(hz_to_mel(6400.0), 42.0, rtol=1e-12)
    np.testing.assert_allclose(hz_to_mel(500.0), 7.5, rtol=1e-12)
    np.testing.assert_allclose(mel_to_hz(15.0), 1000.0, rtol=1e-12)
    np.testing.assert_allclose(mel_to_hz(42.0), 6400.0, rtol=1e-12)
    np.testing.assert_allclose(hz_to_mel(700.0, htk=True), 2595.0 * np.log10(2.0), rtol=1e-12)
    np.testing.assert_allclose(mel_to_hz(2595.0 * np.log10(2.0), htk=True), 700.0, rtol=1e-12)


def test_mel_filterbank_matches_independent_slaney_construction():
    """Cross-check the vectorized ramps filterbank against a from-first-
    principles per-filter triangle construction (the textbook Slaney form
    librosa implements): filter m rises linearly from mel_f[m] to mel_f[m+1]
    and falls to mel_f[m+2] over FFT-bin frequencies, then is area-normalized
    by 2/(mel_f[m+2]-mel_f[m])."""
    from prodiff_tpu.ops.mel import hz_to_mel, mel_to_hz, mel_filterbank

    sr, n_fft, n_mels, fmin, fmax = 44100, 2048, 128, 40.0, 16000.0
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

    fftfreqs = np.arange(n_fft // 2 + 1) * (sr / n_fft)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    expect = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(n_mels):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        for k, f in enumerate(fftfreqs):
            if lo < f < ctr:
                expect[m, k] = (f - lo) / (ctr - lo)
            elif f == ctr:
                expect[m, k] = 1.0
            elif ctr < f < hi:
                expect[m, k] = (hi - f) / (hi - ctr)
        expect[m] *= 2.0 / (hi - lo)
    np.testing.assert_allclose(fb, expect, atol=1e-7)
