"""Tests for the jittable sequence-regulation ops."""

import jax.numpy as jnp
import numpy as np

from prodiff_tpu.ops.seq import (
    dur_to_mel2ph_host,
    length_regulator,
    mel2ph_to_dur,
    regulate_hidden,
)


def _length_regulator_ref(dur, max_frames):
    """Straightforward numpy port of the reference mask-trick semantics
    (``modules/fastspeech/tts_modules.py:140-170``)."""
    B, T = dur.shape
    out = np.zeros((B, max_frames), np.int64)
    for b in range(B):
        pos = 0
        for k in range(T):
            d = int(dur[b, k])
            out[b, pos : min(pos + d, max_frames)] = k + 1
            pos += d
    return out


def test_length_regulator_matches_reference_semantics(rng):
    dur = rng.integers(0, 5, size=(3, 7))
    dur[:, -1] = 0  # padding token
    got = np.asarray(length_regulator(jnp.asarray(dur), max_frames=30))
    want = _length_regulator_ref(dur, 30)
    np.testing.assert_array_equal(got, want)


def test_mel2ph_roundtrip(rng):
    dur = rng.integers(0, 6, size=(4, 9))
    mel2ph = length_regulator(jnp.asarray(dur), max_frames=int(dur.sum(1).max()))
    back = np.asarray(mel2ph_to_dur(mel2ph, 9))
    np.testing.assert_array_equal(back, dur)


def test_regulate_hidden(rng):
    enc = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
    mel2ph = jnp.asarray([[1, 1, 2, 4, 0, 0], [2, 3, 3, 3, 4, 0]])
    out = np.asarray(regulate_hidden(enc, mel2ph))
    np.testing.assert_allclose(out[0, 0], enc[0, 0])
    np.testing.assert_allclose(out[0, 2], enc[0, 1])
    np.testing.assert_allclose(out[0, 3], enc[0, 3])
    assert np.all(out[0, 4:] == 0)  # padding frames -> zeros
    np.testing.assert_allclose(out[1, 4], enc[1, 3])


def test_dur_to_mel2ph_host():
    # 3 phonemes of 0.1s at ~0.0116s timestep
    mel2ph = dur_to_mel2ph_host([0.1, 0.1, 0.1], 512 / 44100, 30)
    assert mel2ph.shape == (30,)
    assert mel2ph[0] == 1
    # final frames padded with last phoneme id
    assert mel2ph[-1] == 3
    # monotonic non-decreasing
    assert np.all(np.diff(mel2ph) >= 0)
