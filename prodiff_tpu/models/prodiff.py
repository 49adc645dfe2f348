"""ProDiffTeacher: the SVS acoustic model.

Mirrors the reference (``modules/svs/prodiff_teacher.py:10-168``): phoneme
encoder with duration/language extra embeds -> length-regulate to frames via
mel2ph gather -> add pitch/speaker/gender/voicing/breath conditioning -> zero
padded frames -> diffusion (ProDiff DDPM or rectified flow) over mel.

Reference bug §2.11.9 (gender-by-id reading the language embedding table) is
fixed here: ``gender_embed_id`` looks up the gender table.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from prodiff_tpu.models.common import Embedding, Linear
from prodiff_tpu.models.diffusion import GaussianDiffusion
from prodiff_tpu.models.encoder import FastspeechEncoder
from prodiff_tpu.models.reflow import RectifiedFlow
from prodiff_tpu.models.wavenet import WaveNet
from prodiff_tpu.ops.seq import mel2ph_to_dur, regulate_hidden


def resolve_train_bf16(hp: Dict[str, Any]) -> Dict[str, Any]:
    """Resolve the tri-state ``bf16`` hparam for TRAINING.

    ``bf16: null`` (the shipped default) = auto: bf16 compute policy on TPU
    backends, f32 elsewhere; ``true``/``false`` force. The reference's AMP is
    a train-loop feature (``handler/train/handler.py:254,272-274``), so the
    auto flip is applied by the train tasks only — inference builds the model
    from the raw hparams and stays f32 for reference-output parity unless the
    user opts in (``bf16: true`` / ``amp: true``).

    Evidence for auto-on (round-4 decision): tests/test_bf16_convergence.py —
    250 steps, identical batches and per-step rng, f32 vs bf16 loss curves
    agree within 5% on the tail and 8% per 25-step window — plus the measured
    1.70x step time on v5e (14.5 vs 24.9 ms, 69% vs 40% MFU, BENCH r3).
    """
    import jax

    if hp.get("bf16", None) is not None or hp.get("amp", False):
        return hp
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    return dict(hp, bf16=on_tpu)


class ProDiffTeacher(nn.Module):
    vocab_size: int
    hparams: Dict[str, Any]

    def setup(self):
        hp = self.hparams
        hidden = hp["hidden_size"]
        self.mel_bins = hp["audio_num_mel_bins"]
        # bf16 compute policy (params stay f32): the TPU-native replacement
        # for the reference's fp16 AMP (``handler/train/handler.py:254``) —
        # a reference config's `amp: true` maps onto it directly.
        # Measured: 1.66x on the flagship train step (15.9 ms, 1.55M
        # frames/s/chip on v5e) with matching loss.
        dtype = (
            jnp.bfloat16
            if (hp.get("bf16", False) or hp.get("amp", False))
            else None
        )
        self.encoder = FastspeechEncoder(
            vocab_size=self.vocab_size,
            hidden_size=hidden,
            num_layers=hp["enc_layers"],
            kernel_size=hp["enc_ffn_kernel_size"],
            dropout=hp["dropout"],
            num_heads=hp["num_heads"],
            dtype=dtype,
            # model_parallel > 1 shards the encoder too (attention heads +
            # FFN filter channels), mirroring the denoiser's TP axis
            tp_axis="model" if hp.get("model_parallel", 1) > 1 else None,
        )
        self.with_dur_embed = hp.get("use_dur_embed", True)
        if self.with_dur_embed:
            self.dur_embed = Linear(hidden)
        self.with_spk_embed = hp.get("use_spk_id", True)
        if self.with_spk_embed:
            self.spk_embed = Embedding(hp["num_spk"], hidden, padding_idx=None)
        self.with_gender_embed = hp.get("use_gender_id", False)
        if self.with_gender_embed:
            self.gender_embed = Embedding(2, hidden, padding_idx=None)
        self.with_lang_embed = hp.get("use_lang_id", True)
        if self.with_lang_embed:
            self.lang_embed = Embedding(len(hp["languages"]) + 1, hidden, padding_idx=0)
        self.pitch_embed = Linear(hidden)
        self.with_voicing_embed = hp.get("use_voicing_embed", False)
        if self.with_voicing_embed:
            self.voicing_embed = Linear(hidden)
        self.with_breath_embed = hp.get("use_breath_embed", False)
        if self.with_breath_embed:
            self.breath_embed = Linear(hidden)

        denoiser = WaveNet(
            in_dims=self.mel_bins,
            hidden_size=hidden,
            residual_layers=hp["residual_layers"],
            residual_channels=hp["residual_channels"],
            dilation_cycle_length=hp["dilation_cycle_length"],
            dtype=dtype,
            # None = auto (Pallas kernel on TPU backends, XLA elsewhere)
            use_pallas=hp.get("use_pallas_wavenet", None),
            # model_parallel > 1: Megatron-style TP over the mesh "model" axis
            tp_axis="model" if hp.get("model_parallel", 1) > 1 else None,
            tp_size=hp.get("model_parallel", 1),
            pallas_stream_dtype=(
                jnp.float32
                if hp.get("pallas_wavenet_dtype", "bfloat16") == "float32"
                else jnp.bfloat16
            ),
            pallas_train_impl=hp.get("pallas_wavenet_train", "xla"),
        )
        self.diffusion_type = hp.get("diff_type", "prodiff")
        if self.diffusion_type == "prodiff":
            self.diffusion = GaussianDiffusion(
                denoise_fn=denoiser,
                out_dims=self.mel_bins,
                timesteps=hp["timesteps"],
                time_scale=hp["timescale"],
                schedule_type=hp["schedule_type"],
                max_beta=hp.get("max_beta", 0.06),
                # reference-compat: sampling starts from uniform noise
                # (SURVEY §2.11.6); set 'gaussian' for the standard init
                noise_init=hp.get("diff_noise_init", "uniform"),
            )
        elif self.diffusion_type == "reflow":
            self.diffusion = RectifiedFlow(
                denoise_fn=denoiser,
                out_dims=self.mel_bins,
                time_scale=hp["timescale"],
                num_features=1,
                sampling_algorithm=hp.get("sampling_algorithm", "euler"),
                spec_min=tuple(hp["spec_min"]),
                spec_max=tuple(hp["spec_max"]),
            )
        else:
            raise NotImplementedError(self.diffusion_type)

    def add_pitch(self, f0: jnp.ndarray) -> jnp.ndarray:
        f0_mel = jnp.log(1 + f0 / 700)
        return self.pitch_embed(f0_mel[:, :, None])

    def forward_condition(
        self,
        txt_tokens: jnp.ndarray,
        mel2ph: jnp.ndarray,
        f0: jnp.ndarray,
        lang_seq: Optional[jnp.ndarray] = None,
        spk_embed_id: Optional[jnp.ndarray] = None,
        spk_mix_embed: Optional[jnp.ndarray] = None,
        gender_embed_id: Optional[jnp.ndarray] = None,
        gender_mix_embed: Optional[jnp.ndarray] = None,
        voicing: Optional[jnp.ndarray] = None,
        breath: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        extra_embed = 0.0
        if self.with_dur_embed:
            dur = mel2ph_to_dur(mel2ph, txt_tokens.shape[1]).astype(jnp.float32)
            extra_embed = self.dur_embed(dur[:, :, None])
        if self.with_lang_embed:
            assert lang_seq is not None, "use_lang_id is True, lang_seq is required"
            extra_embed += self.lang_embed(lang_seq)
        encoder_out = self.encoder(
            txt_tokens, extra_embed, deterministic=deterministic
        )
        condition = regulate_hidden(encoder_out, mel2ph)  # [B, T_mel, H]
        condition += self.add_pitch(f0)
        if self.with_spk_embed:
            if spk_mix_embed is not None:
                condition += spk_mix_embed
            else:
                condition += self.spk_embed(spk_embed_id)[:, None, :]
        if self.with_gender_embed:
            if gender_mix_embed is not None:
                condition += gender_mix_embed
            else:
                condition += self.gender_embed(gender_embed_id)[:, None, :]
        if self.with_voicing_embed:
            assert voicing is not None, "use_voicing_embed is True, voicing is required"
            condition += self.voicing_embed(voicing[:, :, None])
        if self.with_breath_embed:
            assert breath is not None, "use_breath_embed is True, breath is required"
            condition += self.breath_embed(breath[:, :, None])
        nonpadding = (mel2ph > 0).astype(condition.dtype)[:, :, None]
        return condition * nonpadding

    def __call__(
        self,
        txt_tokens: jnp.ndarray,
        mel2ph: jnp.ndarray,
        f0: jnp.ndarray,
        lang_seq: Optional[jnp.ndarray] = None,
        spk_embed_id: Optional[jnp.ndarray] = None,
        spk_mix_embed: Optional[jnp.ndarray] = None,
        gender_embed_id: Optional[jnp.ndarray] = None,
        gender_mix_embed: Optional[jnp.ndarray] = None,
        voicing: Optional[jnp.ndarray] = None,
        breath: Optional[jnp.ndarray] = None,
        gt_spec: Optional[jnp.ndarray] = None,
        infer: bool = False,
        infer_step: int = 4,
        deterministic: bool = True,
        init_noise: Optional[jnp.ndarray] = None,
        step_noises: Optional[jnp.ndarray] = None,
    ):
        condition = self.forward_condition(
            txt_tokens,
            mel2ph,
            f0,
            lang_seq=lang_seq,
            spk_embed_id=spk_embed_id,
            spk_mix_embed=spk_mix_embed,
            gender_embed_id=gender_embed_id,
            gender_mix_embed=gender_mix_embed,
            voicing=voicing,
            breath=breath,
            deterministic=deterministic,
        )
        if not infer:
            x_0 = gt_spec[:, None, :, :]  # [B, 1, T, M]
            return self.diffusion(condition, gt_spec=x_0, infer=False)
        if self.diffusion_type == "prodiff":
            mel = self.diffusion(
                condition, infer=True, infer_step=infer_step,
                init_noise=init_noise, step_noises=step_noises,
            )
        else:  # reflow ODE integration only consumes the start point
            mel = self.diffusion(
                condition, infer=True, infer_step=infer_step,
                init_noise=init_noise,
            )
        return mel[:, 0]  # [B, T, M]
