"""Accuracy tests for the built-in Boersma/Praat-AC pitch extractor.

Praat itself (parselmouth) is not installable here (zero egress), so parity is
pinned with synthetic signals of KNOWN f0: accuracy within a few cents on
stationary tones and glides, correct voicing decisions around silence, and
octave-error resistance on harmonic complexes with a weak fundamental — the
failure mode Boersma's octave cost + Viterbi path exist to fix
(reference contract: ``component/pe/parselmouth.py:9-26``).
"""

import numpy as np
import pytest

from prodiff_tpu.pe import get_pe_cls

SR = 44100
HOP = 512


def _extract(wav, length=None, **kw):
    # "parselmouth" resolves to the built-in ACF here (no praat bindings);
    # even a stubbed parselmouth module must not shadow the fallback
    pe = get_pe_cls("parselmouth")({})
    assert type(pe).__name__ == "ACF"
    if length is None:
        length = int(len(wav) // HOP) + 1
    return pe.get_pitch(wav, SR, length, hop_size=HOP, **kw)


def _cents(a, b):
    return 1200 * np.abs(np.log2(np.maximum(a, 1e-9) / np.maximum(b, 1e-9)))


@pytest.mark.slow
def test_pure_tone_accuracy():
    t = np.arange(int(1.0 * SR)) / SR
    for f in [110.0, 220.0, 523.25, 880.0]:
        wav = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        f0, uv = _extract(wav)
        mid = f0[3:-3]
        assert (mid > 0).mean() > 0.95, f"{f} Hz mostly voiced"
        err = _cents(mid[mid > 0], f)
        # sinc-refined candidates (depth 30): sub-cent on stationary tones
        # (parabolic-only refinement measured 2-5 cents here)
        assert np.median(err) < 1, f"{f} Hz: median {np.median(err):.2f} cents"


def test_glide_tracks_frequency():
    dur = 1.0
    n = int(dur * SR)
    t = np.arange(n) / SR
    f_inst = 150.0 * (400.0 / 150.0) ** (t / dur)  # exponential 150->400 Hz
    phase = 2 * np.pi * np.cumsum(f_inst) / SR
    wav = (0.4 * np.sin(phase)).astype(np.float32)
    f0, uv = _extract(wav)
    frames = np.arange(len(f0))
    expect = 150.0 * (400.0 / 150.0) ** np.clip(frames * HOP / n, 0, 1)
    sel = slice(5, len(f0) - 5)
    voiced = f0[sel] > 0
    assert voiced.mean() > 0.9
    err = _cents(f0[sel][voiced], expect[sel][voiced])
    assert np.median(err) < 15, f"median glide error {np.median(err):.1f} cents"


def test_weak_fundamental_no_octave_error():
    """Harmonic stack with a weak fundamental: naive peak-picking reports
    2*f0; Boersma's normalisation + octave cost must recover f0."""
    t = np.arange(int(1.0 * SR)) / SR
    f = 165.0
    wav = (
        0.05 * np.sin(2 * np.pi * f * t)
        + 0.35 * np.sin(2 * np.pi * 2 * f * t)
        + 0.25 * np.sin(2 * np.pi * 3 * f * t)
        + 0.15 * np.sin(2 * np.pi * 4 * f * t)
    ).astype(np.float32)
    f0, uv = _extract(wav)
    mid = f0[3:-3]
    voiced = mid[mid > 0]
    assert len(voiced) > 0.9 * len(mid)
    err_f0 = np.median(_cents(voiced, f))
    err_octave = np.median(_cents(voiced, 2 * f))
    assert err_f0 < 30 and err_f0 < err_octave, (
        f"fundamental missed: {err_f0:.0f} vs octave {err_octave:.0f} cents"
    )


def test_voicing_on_silence_and_noise():
    rng = np.random.default_rng(0)
    t = np.arange(int(0.4 * SR)) / SR
    tone = 0.4 * np.sin(2 * np.pi * 220.0 * t)
    silence = np.zeros(int(0.3 * SR))
    noise = 0.02 * rng.standard_normal(int(0.3 * SR))
    wav = np.concatenate([silence, tone, noise]).astype(np.float32)
    f0, uv = _extract(wav)
    n_sil = int(0.3 * SR) // HOP
    n_tone = int(0.4 * SR) // HOP
    assert (f0[2 : n_sil - 2] == 0).all(), "silence must be unvoiced"
    tone_f0 = f0[n_sil + 2 : n_sil + n_tone - 2]
    assert (tone_f0 > 0).mean() > 0.9
    assert np.median(_cents(tone_f0[tone_f0 > 0], 220.0)) < 1
    assert (f0[n_sil + n_tone + 2 :] == 0).mean() > 0.8, "noise mostly unvoiced"


def test_interp_uv_contract():
    t = np.arange(int(0.4 * SR)) / SR
    wav = np.concatenate(
        [np.zeros(int(0.2 * SR)), 0.4 * np.sin(2 * np.pi * 220.0 * t)]
    ).astype(np.float32)
    f0, uv = _extract(wav, interp_uv=True)
    assert (f0 > 0).all(), "interp_uv fills unvoiced gaps"
    assert uv[:3].all() and not uv[-3:].any()


def test_length_contract():
    wav = (0.3 * np.sin(2 * np.pi * 220.0 * np.arange(SR) / SR)).astype(np.float32)
    for length in [40, 86, 90]:
        f0, uv = _extract(wav, length=length)
        assert len(f0) == len(uv) == length
