"""Duration predictor (reference ``modules/fastspeech/tts_modules.py:59-132``
+ ``modules/variance_predictor/dur_predictor.py``).

Conv stack predicting log-domain durations; linear-domain ``exp() - offset``
(clamped at 0) at inference.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from prodiff_tpu.models.common import Embedding, Linear
from prodiff_tpu.models.encoder import FastspeechEncoder


class DurationPredictor(nn.Module):
    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout_rate: float = 0.1
    offset: float = 1.0

    @nn.compact
    def __call__(self, xs: jnp.ndarray, x_masks: jnp.ndarray, infer: bool = True,
                 deterministic: bool = True) -> jnp.ndarray:
        """xs: [B, T, H]; x_masks: [B, T] True at padding -> dur [B, T]."""
        nonpad = (1 - x_masks.astype(xs.dtype))[:, :, None]
        for i in range(self.n_layers):
            xs = nn.Conv(
                self.n_chans, kernel_size=(self.kernel_size,), padding="SAME",
                name=f"conv_{i}",
            )(xs)
            xs = jax.nn.relu(xs)
            xs = nn.LayerNorm(epsilon=1e-12, name=f"norm_{i}")(xs)
            xs = nn.Dropout(self.dropout_rate)(xs, deterministic=deterministic)
            xs = xs * nonpad
        xs = nn.Dense(1, name="linear")(xs) * nonpad  # log-domain [B, T, 1]
        dur = jnp.exp(xs[..., 0]) - self.offset
        if infer:
            dur = jnp.clip(dur, 0.0, None)
        return dur


class DurPredictor(nn.Module):
    """Phoneme encoder (+onset/word-dur embeds) -> DurationPredictor."""

    vocab_size: int
    hparams: Dict[str, Any]

    def setup(self):
        hp = self.hparams
        self.encoder = FastspeechEncoder(
            vocab_size=self.vocab_size,
            hidden_size=hp["hidden_size"],
            num_layers=hp["enc_layers"],
            kernel_size=hp["enc_ffn_kernel_size"],
            num_heads=hp["num_heads"],
        )
        dur_hp = hp["dur_prediction_args"]
        self.onset_embed = Embedding(2, hp["hidden_size"], padding_idx=None)
        self.word_dur_embed = Linear(hp["hidden_size"])
        self.dur_pred = DurationPredictor(
            n_layers=dur_hp["num_layers"],
            n_chans=dur_hp["hidden_size"],
            dropout_rate=dur_hp["dropout"],
            kernel_size=dur_hp["kernel_size"],
            offset=dur_hp["log_offset"],
        )

    def __call__(self, txt_tokens, onset, word_dur, infer: bool = True,
                 deterministic: bool = True):
        extra_embed = self.onset_embed(onset)
        extra_embed += self.word_dur_embed(word_dur[:, :, None])
        encoder_out = self.encoder(txt_tokens, extra_embed, deterministic=deterministic)
        return self.dur_pred(
            encoder_out, x_masks=txt_tokens == 0, infer=infer,
            deterministic=deterministic,
        )
