"""NSF-HiFiGAN vocoder wrapper (reference ``component/vocoder/nsf_hifigan.py``).

Loads the released torch checkpoint + its ``config.json``, converts weights to
flax, and runs the generator jitted on TPU. The training convention is
log10-mel; the generator wants natural log, hence the ``* 2.30259``
(``nsf_hifigan.py:52``).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.models.nsf_hifigan import Generator
from prodiff_tpu.ops.mel import LOG10_TO_LN, MelSpectrogram
from prodiff_tpu.vocoders import BaseVocoder, register_vocoder


@register_vocoder
class NsfHifiGAN(BaseVocoder):
    def __init__(self, hparams: dict, params=None, config: Optional[dict] = None):
        super().__init__(hparams)
        if params is None:
            model_path = hparams["vocoder_ckpt"]
            config_file = os.path.join(os.path.dirname(model_path), "config.json")
            assert os.path.exists(model_path), f"HifiGAN model not found: {model_path}"
            with open(config_file) as f:
                self.h = json.load(f)
            from prodiff_tpu.utils.torch_convert import (
                convert_nsf_hifigan,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(model_path)
            self.params = jax.tree.map(jnp.asarray, convert_nsf_hifigan(sd, self.h))
        else:
            self.params = params
            self.h = config
        self._check_params()
        # nsf_packed: tri-state like fastdiff_packed — None/absent = auto
        # (packed trunk on TPU backends), true/false = force
        self.model = Generator.from_config(
            self.h, use_packed=hparams.get("nsf_packed", None)
        )

    def _check_params(self):
        hp, h = self.hparams, self.h
        pairs = [
            ("audio_sample_rate", "sampling_rate"),
            ("audio_num_mel_bins", "num_mels"),
            ("fft_size", "n_fft"),
            ("win_size", "win_size"),
            ("hop_size", "hop_size"),
            ("fmin", "fmin"),
            ("fmax", "fmax"),
        ]
        for hk, vk in pairs:
            if hk in hp and vk in h and hp[hk] != h[vk]:
                print(
                    f"| Mismatch parameters: hparams[{hk!r}]={hp[hk]} != {h[vk]} (vocoder)"
                )

    @functools.cached_property
    def _jitted(self):
        @functools.partial(jax.jit, static_argnames=("deterministic",))
        def run(params, mel_ln, f0, rng, deterministic=False):
            return self.model.apply(
                params, mel_ln, f0, deterministic=deterministic,
                rngs={"noise": rng},
            )

        return run

    @property
    def _packed_runner(self):
        """(runner, prepared-params) for the packed serving path: the
        selector-GEMM kernels are packed ONCE at load instead of being
        rebuilt in-graph every forward (~60 MB of mixing matrices), and the
        prepared tree rides as a jit argument so the forward executable
        stays small (see models/nsf_hifigan.py:prepare_packed_trunk_params).

        The prepared tree is cached keyed on the params object identity (not
        cached_property): a checkpoint reload that replaces ``self.params``
        must invalidate it instead of silently serving stale weights. The
        jitted fns depend only on the model config, so they are built ONCE
        per instance — a params swap costs one re-prepare, not a recompile
        of the generator program (~minutes through the axon relay).
        """
        fns = getattr(self, "_packed_fns", None)
        if fns is None:
            from prodiff_tpu.models.nsf_hifigan import PackedGeneratorRunner

            # nsf_fused_res_dtype: "auto" (default; bf16 tap stacks on TPU)
            # | "float32" | "off" — the f32 pin exists for exact-parity
            # renders (MCD vs the f32 torch reference): bf16 stacks add a
            # ~-53 dB broadband residual that log-mel metrics amplify
            frd = {"auto": "auto", "float32": jnp.float32, "off": None}[
                self.hparams.get("nsf_fused_res_dtype", "auto") or "auto"
            ]
            runner = PackedGeneratorRunner(self.model, fused_res_dtype=frd)

            @functools.partial(jax.jit, static_argnames=("deterministic",))
            def run(prepared, mel_ln, f0, rng, deterministic=False):
                return runner(prepared, mel_ln, f0,
                              None if deterministic else rng)

            fns = self._packed_fns = (jax.jit(runner.prepare), run)
        cache = getattr(self, "_packed_cache", None)
        if cache is None or cache[0] is not self.params:
            cache = self._packed_cache = (self.params, fns[0](self.params))
        return fns[1], cache[1]

    def _packed_active(self, t_mel: int) -> bool:
        up = self.model.use_packed
        if up is None:
            up = jax.devices()[0].platform in ("tpu", "axon")
        return bool(up) and self.model._packed_supported(t_mel)

    def spec2wav_batch(self, mel, f0, rng=None, deterministic=None):
        """mel: [B, T, M] log10 -> wav [B, T*upp] (jitted, device arrays).

        ``deterministic`` (or hparam ``vocoder_deterministic``) zeroes the sine
        source's random phases/noise for reproducible renders."""
        if deterministic is None:
            deterministic = bool(self.hparams.get("vocoder_deterministic", False))
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        mel = jnp.asarray(mel)
        if self._packed_active(mel.shape[1]):
            run, prepared = self._packed_runner
            return run(
                prepared, mel * LOG10_TO_LN, jnp.asarray(f0), rng,
                deterministic=deterministic,
            )
        return self._jitted(
            self.params, mel * LOG10_TO_LN, jnp.asarray(f0), rng,
            deterministic=deterministic,
        )

    def spec2wav(self, mel, f0=None, rng=None, deterministic=None, **kwargs):
        """mel: [T, M] log10 -> wav numpy [T*upp]."""
        wav = self.spec2wav_batch(
            np.asarray(mel)[None], np.asarray(f0)[None], rng,
            deterministic=deterministic,
        )
        return np.asarray(wav[0])

    @staticmethod
    def wav2spec(inp_path: str, hparams: dict, keyshift=0, speed=1):
        from prodiff_tpu.utils.audio import load_wav

        wav, _ = load_wav(inp_path, sr=hparams["audio_sample_rate"])
        extractor = MelSpectrogram(
            sr=hparams["audio_sample_rate"],
            n_mels=hparams["audio_num_mel_bins"],
            n_fft=hparams["fft_size"],
            win_size=hparams["win_size"],
            hop_length=hparams["hop_size"],
            fmin=hparams["fmin"],
            fmax=hparams["fmax"],
        )
        mel = extractor.wav2mel_log10(jnp.asarray(wav)[None], keyshift=keyshift, speed=speed)
        return wav, np.asarray(mel[0])
