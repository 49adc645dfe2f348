"""Praat autocorrelation PE via parselmouth (optional dependency).

Identical contract to the reference (``component/pe/parselmouth.py:9-26``).
Import fails cleanly when the praat bindings are absent; the registry then
falls back to the built-in ACF extractor.
"""

from __future__ import annotations

import numpy as np
import parselmouth

if not callable(getattr(parselmouth, "Sound", None)):
    # a stub/broken install (e.g. a test shim for the torch reference's
    # imports) must not shadow the real bindings — fall back to the ACF PE
    raise ImportError("parselmouth present but unusable (no Sound)")

from prodiff_tpu.pe import BasePitchExtractor, pad_frames, register_pe
from prodiff_tpu.utils.pitch_utils import interp_f0


@register_pe
class Parselmouth(BasePitchExtractor):
    def get_pitch(self, waveform, samplerate, length, *, hop_size,
                  f0_min=65, f0_max=1100, speed=1, interp_uv=False):
        hop = int(np.round(hop_size * speed))
        time_step = hop / samplerate
        f0 = (
            parselmouth.Sound(waveform, samplerate)
            .to_pitch_ac(
                time_step=time_step,
                voicing_threshold=0.6,
                pitch_floor=f0_min,
                pitch_ceiling=f0_max,
            )
            .selected_array["frequency"]
            .astype(np.float32)
        )
        f0 = pad_frames(f0, hop, waveform.shape[0], length)
        uv = f0 == 0
        if interp_uv:
            f0, uv = interp_f0(f0, uv)
        return f0, uv
