"""Pitch predictor: rectified flow over delta-pitch vs the smoothed base melody
(reference ``modules/variance_predictor/pitch_predictor.py:10-122``).

Conditioning: phoneme-category encoder (+dur embed) regulated to frames, plus
note encoder regulated via mel2note, speaker embed, retake embed (trainable
2-way, expression-interpolated at inference) and delta-pitch embed (ground
truth outside the retake mask).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from prodiff_tpu.models.common import Embedding, Linear
from prodiff_tpu.models.encoder import FastspeechEncoder, NoteEncoder
from prodiff_tpu.models.reflow import RectifiedFlow
from prodiff_tpu.models.wavenet import WaveNet
from prodiff_tpu.ops.seq import mel2ph_to_dur, regulate_hidden


class PitchPredictor(nn.Module):
    vocab_size: int
    hparams: Dict[str, Any]

    def setup(self):
        hp = self.hparams
        hidden = hp["hidden_size"]
        self.encoder = FastspeechEncoder(
            vocab_size=self.vocab_size + 1,
            hidden_size=hidden,
            num_layers=hp["enc_layers"],
            kernel_size=hp["enc_ffn_kernel_size"],
            dropout=hp["dropout"],
            num_heads=hp["num_heads"],
        )
        self.with_dur_embed = hp.get("use_dur_embed", True)
        if self.with_dur_embed:
            self.dur_embed = Linear(hidden)
        args = hp["f0_prediction_args"]
        self.note_encoder = NoteEncoder(
            hidden_size=args["encoder_args"]["hidden_size"],
            num_layers=args["encoder_args"]["num_layers"],
            kernel_size=args["encoder_args"]["ffn_kernel_size"],
            num_heads=args["encoder_args"]["num_heads"],
        )
        self.note_encode_out_linear = Linear(hidden)
        self.with_spk_embed = hp.get("use_spk_id", True)
        if self.with_spk_embed:
            self.spk_embed = Embedding(len(hp["datasets"]), hidden, padding_idx=None)
        self.delta_pitch_embed = Linear(hidden)
        self.pitch_retake_embed = Embedding(2, hidden, padding_idx=None)
        self.diffusion = RectifiedFlow(
            denoise_fn=WaveNet(
                in_dims=args["repeat_bins"],
                hidden_size=hidden,
                residual_layers=args["denoise_args"]["residual_layers"],
                residual_channels=args["denoise_args"]["residual_channels"],
                dilation_cycle_length=args["denoise_args"]["dilation_cycle_length"],
            ),
            out_dims=args["repeat_bins"],
            time_scale=args["timescale"],
            num_features=1,
            sampling_algorithm=hp.get("sampling_algorithm", "euler"),
            spec_min=(args["spec_min"],),
            spec_max=(args["spec_max"],),
            repeat_bins=args["repeat_bins"],
            clamp_min=args["clamp_min"],
            clamp_max=args["clamp_max"],
        )

    def __call__(
        self,
        txt_tokens: jnp.ndarray,
        mel2ph: jnp.ndarray,
        note_midi: jnp.ndarray,
        note_rest: jnp.ndarray,
        mel2note: jnp.ndarray,
        base_pitch: jnp.ndarray,
        pitch: Optional[jnp.ndarray] = None,
        pitch_retake: Optional[jnp.ndarray] = None,
        pitch_expr: Optional[jnp.ndarray] = None,
        spk_id: Optional[jnp.ndarray] = None,
        infer_step: int = 20,
        infer: bool = False,
        deterministic: bool = True,
    ):
        extra_embed = None
        if self.with_dur_embed:
            dur = mel2ph_to_dur(mel2ph, txt_tokens.shape[1]).astype(jnp.float32)
            extra_embed = self.dur_embed(dur[:, :, None])
        encoder_out = self.encoder(txt_tokens, extra_embed, deterministic=deterministic)
        condition = regulate_hidden(encoder_out, mel2ph)  # [B, T_mel, H]

        note_dur = mel2ph_to_dur(mel2note, note_midi.shape[1]).astype(jnp.float32)
        note_encoder_out = self.note_encoder(
            note_midi, note_rest, note_dur, deterministic=deterministic
        )
        note_encoder_out = self.note_encode_out_linear(note_encoder_out)
        condition += regulate_hidden(note_encoder_out, mel2note)

        if self.with_spk_embed:
            condition += self.spk_embed(spk_id)[:, None, :]

        is_pitch_retake = pitch_retake is not None
        if not is_pitch_retake:
            pitch_retake = jnp.ones_like(mel2note, dtype=jnp.int32)

        if pitch_expr is None:
            condition += self.pitch_retake_embed(pitch_retake.astype(jnp.int32))
        else:
            retake_true = self.pitch_retake_embed(jnp.ones((1, 1), jnp.int32))
            retake_false = self.pitch_retake_embed(jnp.zeros((1, 1), jnp.int32))
            expr = (pitch_expr * pitch_retake.astype(jnp.float32))[:, :, None]
            condition += retake_true * expr + retake_false * (1 - expr)

        if is_pitch_retake:
            delta_pitch = (pitch - base_pitch) * (1 - pitch_retake.astype(jnp.float32))
        else:
            delta_pitch = jnp.zeros_like(base_pitch)
        condition += self.delta_pitch_embed(delta_pitch[:, :, None])

        if not infer:
            # gt curve [B, T] -> [B, F=1, T]
            return self.diffusion(
                condition, gt_spec=(pitch - base_pitch)[:, None, :], infer=False
            )
        out = self.diffusion(condition, infer_step=infer_step, infer=True)
        return out[:, 0]  # delta pitch [B, T]
