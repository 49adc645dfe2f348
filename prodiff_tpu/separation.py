"""Harmonic/aperiodic source separation (VR CascadedNet).

The flax CascadedNet port lands in ``prodiff_tpu.models.vr``; this module is
the stable entry point the binarizers and infer handler use
(mirrors ``component/binarizer/binarizer_utils.py:97-113``).
"""

from __future__ import annotations

import numpy as np

_VR_MODEL = None


def extract_harmonic_aperiodic(waveform: np.ndarray, model_path: str):
    """-> (harmonic_part, aperiodic_part); aperiodic = wav - harmonic."""
    global _VR_MODEL
    if _VR_MODEL is None:
        from prodiff_tpu.models.vr import load_sep_model

        _VR_MODEL = load_sep_model(model_path)
    harmonic = _VR_MODEL.predict_from_audio(np.asarray(waveform, np.float32))
    return harmonic, np.asarray(waveform, np.float32) - harmonic


def get_kth_harmonic(k, harmonic_part, f0, hop_size, win_size, samplerate,
                     half_width=3.5):
    from prodiff_tpu.binarize.utils import get_kth_harmonic as _impl

    return _impl(k, harmonic_part, f0, hop_size, win_size, samplerate, half_width)
