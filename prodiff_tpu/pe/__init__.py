"""Pitch-extractor registry (mirrors ``component/pe/base.py``)."""

from __future__ import annotations

from typing import Dict

PITCHEXTRACTORS: Dict[str, type] = {}


def register_pe(cls):
    PITCHEXTRACTORS[cls.__name__.lower()] = cls
    PITCHEXTRACTORS[cls.__name__] = cls
    return cls


def get_pe_cls(name: str):
    from prodiff_tpu.pe import acf  # noqa: F401

    try:
        # genuinely optional: wraps the external praat-parselmouth library
        from prodiff_tpu.pe import parselmouth_pe  # noqa: F401
    except ImportError:
        pass
    # first-party: a broken module must raise, not silently vanish
    from prodiff_tpu.pe import rmvpe  # noqa: F401
    key = name.lower()
    if key not in PITCHEXTRACTORS:
        if key in ("parselmouth", "rmvpe") and "acf" in PITCHEXTRACTORS:
            # extractor's backend unavailable; the built-in autocorrelation
            # extractor keeps the pipeline usable
            print(f"| pitch extractor {name!r} unavailable; falling back to built-in ACF PE")
            return PITCHEXTRACTORS["acf"]
        raise ValueError(f"Unknown pitch extractor: {name}")
    return PITCHEXTRACTORS[key]


class BasePitchExtractor:
    def __init__(self, hparams: dict):
        self.hparams = hparams

    def get_pitch(self, waveform, samplerate, length, *, hop_size,
                  f0_min=65, f0_max=1100, speed=1, interp_uv=False):
        """-> (f0 [length], uv [length])"""
        raise NotImplementedError


def pad_frames(frames, hop_size, n_samples, n_expect):
    """Center-pad a frame-rate curve to the mel frame count
    (cf. reference ``utils/data_gen_utils.pad_frames``)."""
    import numpy as np

    n_frames = len(frames)
    lpad = (int(n_samples // hop_size) - n_frames + 1) // 2
    rpad = n_expect - n_frames - lpad
    if rpad < 0:
        frames = frames[: n_expect - lpad]
        rpad = 0
    if lpad > 0 or rpad > 0:
        frames = np.pad(frames, (max(lpad, 0), rpad), mode="constant")
    if lpad < 0:
        frames = frames[-lpad:]
    return frames[:n_expect]
