"""RMVPE pitch extractor (reference ``component/pe/rmvpe.py``).

Resample to 16 kHz -> 128-mel htk spectrogram (centered, hop 160) -> flax E2E0
-> local-weighted-average decode over 20-cent bins -> resample the 10 ms curve
back onto the hop grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import resample_poly

from prodiff_tpu.models.rmvpe import (
    E2E0,
    MEL_FMAX,
    MEL_FMIN,
    N_MELS,
    SAMPLE_RATE,
    WINDOW_LENGTH,
    convert_rmvpe,
    to_local_average_f0,
)
from prodiff_tpu.ops.mel import mel_filterbank, stft_magnitude
from prodiff_tpu.pe import BasePitchExtractor, register_pe
from prodiff_tpu.utils.pitch_utils import interp_f0, resample_align_curve


@register_pe
class RMVPE(BasePitchExtractor):
    def __init__(self, hparams: dict, model_path: str | None = None, hop_length: int = 160):
        self.hparams = hparams
        self.hop_length = hop_length
        if model_path is None:
            model_path = hparams["pe_ckpt"]
        from prodiff_tpu.utils.torch_convert import load_torch_state_dict

        sd = load_torch_state_dict(model_path)
        self.params = jax.tree.map(jnp.asarray, convert_rmvpe(sd))
        self.model = E2E0(4, 1, (2, 2))
        self.mel_basis = jnp.asarray(
            mel_filterbank(
                SAMPLE_RATE, WINDOW_LENGTH, N_MELS, MEL_FMIN, MEL_FMAX,
                htk=True, norm="slaney",
            )
        )
        self.window = jnp.asarray(
            (0.5 - 0.5 * np.cos(
                2 * np.pi * np.arange(WINDOW_LENGTH) / WINDOW_LENGTH
            )).astype(np.float32)
        )

    @functools.cached_property
    def _jitted(self):
        @jax.jit
        def run(params, mel):
            return self.model.apply(params, mel)

        return run

    def _mel(self, audio16k: np.ndarray) -> jnp.ndarray:
        spec = stft_magnitude(
            jnp.asarray(audio16k, jnp.float32)[None], self.window,
            WINDOW_LENGTH, self.hop_length, WINDOW_LENGTH, center=True,
        )  # [1, F, T]
        mel = jnp.einsum("mf,bft->bmt", self.mel_basis, spec)
        return jnp.log(jnp.clip(mel, 1e-5, None))

    def infer_from_audio(self, audio: np.ndarray, sample_rate=16000, thred=0.03,
                         use_viterbi=False) -> np.ndarray:
        if sample_rate != SAMPLE_RATE:
            from math import gcd

            g = gcd(int(sample_rate), SAMPLE_RATE)
            audio = resample_poly(audio, SAMPLE_RATE // g, int(sample_rate) // g)
        mel = self._mel(audio)  # [1, M, T]
        n_frames = mel.shape[-1]
        pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
        mel = jnp.pad(mel, [(0, 0), (0, 0), (0, pad)])
        hidden = np.asarray(
            self._jitted(self.params, mel.swapaxes(1, 2))
        )[0, :n_frames]  # [T, N_CLASS]
        if use_viterbi:
            from prodiff_tpu.models.rmvpe import to_viterbi_f0

            return to_viterbi_f0(hidden, thred=thred)
        return to_local_average_f0(hidden, thred=thred)

    def get_pitch(self, waveform, samplerate, length, *, hop_size,
                  f0_min=65, f0_max=1100, speed=1, interp_uv=False):
        f0 = self.infer_from_audio(np.asarray(waveform, np.float32), samplerate)
        uv = f0 == 0
        f0, uv = interp_f0(f0, uv)
        hop = int(np.round(hop_size * speed))
        time_step = hop / samplerate
        f0_res = resample_align_curve(f0.astype(np.float32), 0.01, time_step, length)
        uv_res = resample_align_curve(uv.astype(np.float32), 0.01, time_step, length) > 0.5
        if not interp_uv:
            f0_res[uv_res] = 0
        return f0_res, uv_res
