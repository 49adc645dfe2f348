"""Phoneme and note encoders (reference ``modules/fastspeech/tts_modules.py:291-365``)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from prodiff_tpu.models.common import (
    Embedding,
    FFTBlocks,
    Linear,
    SinusoidalPositionalEmbedding,
)


class FastspeechEncoder(nn.Module):
    """Token embedding (×√H) + optional extra embed + sinusoidal positions ->
    FFT blocks. Padding = token id 0."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    kernel_size: int = 9
    dropout: float = 0.1
    num_heads: int = 2
    dtype: Optional[jnp.dtype] = None
    # Megatron-style tensor parallelism over a mesh axis (heads + FFN filter
    # channels sharded); beyond reference parity like the denoiser's
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        txt_tokens: jnp.ndarray,
        extra_embed: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        padding_mask = txt_tokens == 0
        x = self.hidden_size ** 0.5 * Embedding(
            self.vocab_size, self.hidden_size, name="embed_tokens"
        )(txt_tokens)
        if extra_embed is not None:
            x = x + extra_embed
        x = x + SinusoidalPositionalEmbedding(
            self.hidden_size, name="embed_positions"
        )(~padding_mask)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return FFTBlocks(
            self.hidden_size,
            self.num_layers,
            ffn_kernel_size=self.kernel_size,
            dropout=self.dropout,
            num_heads=self.num_heads,
            use_pos_embed=False,
            dtype=self.dtype,
            tp_axis=self.tp_axis,
            name="fft_blocks",
        )(x, padding_mask, deterministic=deterministic)


class NoteEncoder(nn.Module):
    """Note-midi/dur conditioning encoder. Padding = midi < 0; rest notes get
    their midi embedding zeroed (reference ``tts_modules.py:332-365``)."""

    hidden_size: int
    num_layers: int
    kernel_size: int = 9
    dropout: float = 0.1
    num_heads: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        note_midi: jnp.ndarray,
        note_rest: jnp.ndarray,
        note_dur: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        padding_mask = note_midi < 0
        x = self.hidden_size ** 0.5 * Linear(self.hidden_size, name="note_midi_embed")(
            note_midi[:, :, None]
        ) * (~note_rest[:, :, None]).astype(jnp.float32)
        x = x + Linear(self.hidden_size, name="note_dur_embed")(note_dur[:, :, None])
        x = x + SinusoidalPositionalEmbedding(
            self.hidden_size, name="embed_positions"
        )(~padding_mask)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return FFTBlocks(
            self.hidden_size,
            self.num_layers,
            ffn_kernel_size=self.kernel_size,
            dropout=self.dropout,
            num_heads=self.num_heads,
            use_pos_embed=False,
            dtype=self.dtype,
            name="fft_blocks",
        )(x, padding_mask, deterministic=deterministic)
