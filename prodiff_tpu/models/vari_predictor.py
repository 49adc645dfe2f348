"""Variance predictor: multi-feature diffusion over {voicing, breath, tension}
curves (reference ``modules/variance_predictor/vari_predictor.py:10-142``).

The reference's MultiVariDiffusion path is broken at construction
(SURVEY §2.11.3-5); this is the working equivalent built on the multivari
mode of :class:`~prodiff_tpu.models.diffusion.GaussianDiffusion`.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from prodiff_tpu.models.common import Embedding, Linear
from prodiff_tpu.models.diffusion import GaussianDiffusion
from prodiff_tpu.models.encoder import FastspeechEncoder, NoteEncoder
from prodiff_tpu.models.wavenet import WaveNet
from prodiff_tpu.ops.seq import mel2ph_to_dur, regulate_hidden


def variance_list(hparams: dict) -> List[str]:
    out = []
    if hparams.get("use_voicing_embed", False):
        out.append("voicing")
    if hparams.get("use_breath_embed", False):
        out.append("breath")
    if hparams.get("use_tension_embed", False):
        out.append("tension")
    return out


def variance_clamp_ranges(hparams: dict):
    ranges = []
    for name in variance_list(hparams):
        if name == "voicing":
            ranges.append((hparams["voicing_db_min"], hparams["voicing_db_max"]))
        elif name == "breath":
            ranges.append((hparams["breath_db_min"], hparams["breath_db_max"]))
        else:
            ranges.append((hparams["tension_logit_min"], hparams["tension_logit_max"]))
    return tuple(ranges)


class VariPredictor(nn.Module):
    vocab_size: int
    hparams: Dict[str, Any]

    def setup(self):
        hp = self.hparams
        hidden = hp["hidden_size"]
        self.variance_names = variance_list(hp)
        assert self.variance_names, "vari task requires at least one of voicing/breath/tension"
        self.with_dur_embed = hp.get("use_dur_embed", True)
        if self.with_dur_embed:
            self.dur_embed = Linear(hidden)
        self.encoder = FastspeechEncoder(
            vocab_size=self.vocab_size,
            hidden_size=hidden,
            num_layers=hp["enc_layers"],
            kernel_size=hp["enc_ffn_kernel_size"],
            dropout=hp["dropout"],
            num_heads=hp["num_heads"],
        )
        args = hp["vari_prediction_args"]
        self.note_encoder = NoteEncoder(
            hidden_size=args["encoder_args"]["hidden_size"],
            num_layers=args["encoder_args"]["num_layers"],
            kernel_size=args["encoder_args"]["ffn_kernel_size"],
            num_heads=args["encoder_args"]["num_heads"],
        )
        self.note_encode_out_linear = Linear(hidden)
        self.with_spk_embed = hp.get("use_spk_id", True)
        if self.with_spk_embed:
            self.spk_embed = Embedding(hp["num_spk"], hidden, padding_idx=None)
        self.pitch_embed = Linear(hidden)

        n_feat = len(self.variance_names)
        repeat_bins = args["repeat_bins"] // n_feat
        self.diffusion = GaussianDiffusion(
            denoise_fn=WaveNet(
                in_dims=n_feat * repeat_bins,
                hidden_size=hidden,
                residual_layers=args["denoise_args"]["residual_layers"],
                residual_channels=args["denoise_args"]["residual_channels"],
                dilation_cycle_length=args["denoise_args"]["dilation_cycle_length"],
            ),
            out_dims=repeat_bins,
            num_features=n_feat,
            timesteps=args["timesteps"],
            time_scale=args["timescale"],
            schedule_type=hp["schedule_type"],
            max_beta=hp.get("max_beta", 0.06),
            repeat_bins=repeat_bins,
            clamp_ranges=variance_clamp_ranges(hp),
        )

    def __call__(
        self,
        txt_tokens: jnp.ndarray,
        mel2ph: jnp.ndarray,
        note_midi: jnp.ndarray,
        note_rest: jnp.ndarray,
        mel2note: jnp.ndarray,
        f0: jnp.ndarray,
        spk_embed_id: Optional[jnp.ndarray] = None,
        gt_curves: Optional[jnp.ndarray] = None,  # [B, F, T]
        infer: bool = False,
        infer_step: int = 4,
        deterministic: bool = True,
    ):
        extra_embed = None
        if self.with_dur_embed:
            dur = mel2ph_to_dur(mel2ph, txt_tokens.shape[1]).astype(jnp.float32)
            extra_embed = self.dur_embed(dur[:, :, None])
        encoder_out = self.encoder(txt_tokens, extra_embed, deterministic=deterministic)
        condition = regulate_hidden(encoder_out, mel2ph)

        note_dur = mel2ph_to_dur(mel2note, note_midi.shape[1]).astype(jnp.float32)
        note_out = self.note_encoder(
            note_midi, note_rest, note_dur, deterministic=deterministic
        )
        condition += regulate_hidden(self.note_encode_out_linear(note_out), mel2note)

        condition += self.pitch_embed(jnp.log(1 + f0 / 700)[:, :, None])
        if self.with_spk_embed:
            condition += self.spk_embed(spk_embed_id)[:, None, :]

        if not infer:
            return self.diffusion(condition, gt_spec=gt_curves, infer=False)
        curves = self.diffusion(condition, infer=True, infer_step=infer_step)  # [B, F, T]
        return {name: curves[:, i] for i, name in enumerate(self.variance_names)}
