"""HiFi-GAN and Parallel WaveGAN vocoder wrappers
(reference ``component/vocoder/hifigan.py``, ``pwg.py``).

Checkpoint resolution matches the reference: ``{ckpt_dir}/config.yaml`` +
newest ``model_ckpt_steps_*.ckpt`` (framework-trained), or
``config.json``/``generator_v1`` (official release). Optional
spectral-subtraction denoise (``vocoder_utils.py:6-14``).
"""

from __future__ import annotations

import functools
import glob
import json
import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from prodiff_tpu.ops.stft_extras import istft, stft_complex
from prodiff_tpu.utils.pitch_utils import f0_to_coarse
from prodiff_tpu.vocoders import BaseVocoder, register_vocoder


def denoise(wav, v=0.1, fft_size=2048, hop_size=512, win_size=512):
    """Spectral subtraction (librosa-equivalent centered hann STFT)."""
    win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win_size) / win_size)).astype(np.float32)
    if win_size < fft_size:
        lp = (fft_size - win_size) // 2
        win = np.pad(win, (lp, fft_size - win_size - lp))
    spec = np.asarray(
        stft_complex(jnp.asarray(wav, jnp.float32)[None], jnp.asarray(win), fft_size, hop_size)
    )[0]
    mag = np.clip(np.abs(spec) - v, 0, None)
    phase = np.angle(spec)
    out = istft(
        jnp.asarray(mag * np.exp(1j * phase))[None], jnp.asarray(win),
        fft_size, hop_size, len(wav),
    )
    return np.asarray(out[0])


def _latest_ckpt(base_dir: str):
    ckpts = sorted(
        glob.glob(os.path.join(base_dir, "model_ckpt_steps_*.ckpt")),
        key=lambda x: int(re.findall(r"model_ckpt_steps_(\d+)\.ckpt", x)[0]),
    )
    return ckpts[-1] if ckpts else None


@register_vocoder
class HifiGAN(BaseVocoder):
    def __init__(self, hparams: dict):
        super().__init__(hparams)
        from prodiff_tpu.config import load_config
        from prodiff_tpu.models.hifigan import HifiGanGenerator, convert_hifigan
        from prodiff_tpu.utils.torch_convert import load_torch_state_dict

        base_dir = hparams["vocoder_ckpt"]
        config_path = os.path.join(base_dir, "config.yaml")
        if os.path.exists(config_path):
            config = load_config(config_path)
            ckpt = _latest_ckpt(base_dir)
        else:
            config_path = os.path.join(base_dir, "config.json")
            with open(config_path) as f:
                config = json.load(f)
            ckpt = os.path.join(base_dir, "generator_v1")
        print("| load HifiGAN:", ckpt)
        sd = load_torch_state_dict(ckpt)
        # framework ckpts nest the generator under model_gen
        sd = {
            (k[len("model_gen."):] if k.startswith("model_gen.") else k): v
            for k, v in sd.items()
        }
        self.config = config
        self.params = jax.tree.map(jnp.asarray, convert_hifigan(sd, config))
        # hifigan_packed: tri-state like fastdiff_packed/nsf_packed — None/
        # absent = auto (packed trunk on TPU backends), true/false = force
        self.model = HifiGanGenerator.from_config(
            config, use_packed=self.hparams.get("hifigan_packed", None)
        )

    @functools.cached_property
    def _jitted(self):
        @jax.jit
        def run(params, mel, f0, rng):
            return self.model.apply(params, mel, f0, rngs={"noise": rng})

        @jax.jit
        def run_nof0(params, mel):
            return self.model.apply(params, mel)

        return run, run_nof0

    @property
    def _packed_runner(self):
        """Prepared-params serving path: kernels packed once at load, the
        prepared tree passed as a jit argument (see NsfHifiGAN). The prepared
        tree is keyed on the params object identity so a checkpoint reload
        replacing ``self.params`` rebuilds it instead of serving stale
        weights; the jitted fns depend only on the model config and are built
        once per instance (a params swap must not recompile the program)."""
        fns = getattr(self, "_packed_fns", None)
        if fns is None:
            from prodiff_tpu.models.hifigan import PackedHifiGanRunner

            runner = PackedHifiGanRunner(self.model)

            @jax.jit
            def run(prepared, mel, f0, rng):
                return runner(prepared, mel, f0, rng)

            @jax.jit
            def run_nof0(prepared, mel):
                return runner(prepared, mel)

            fns = self._packed_fns = (jax.jit(runner.prepare), run, run_nof0)
        cache = getattr(self, "_packed_cache", None)
        if cache is None or cache[0] is not self.params:
            cache = self._packed_cache = (self.params, fns[0](self.params))
        return fns[1], fns[2], cache[1]

    def _packed_active(self, t_mel: int) -> bool:
        up = self.model.use_packed
        if up is None:
            up = jax.devices()[0].platform in ("tpu", "axon")
        return bool(up) and self.model._packed_supported(t_mel)

    def spec2wav(self, mel, f0=None, rng=None, **kwargs):
        """mel: [T, M] (generator-native log-mel convention) -> wav."""
        c = jnp.asarray(np.asarray(mel, np.float32))[None]
        with_f0 = f0 is not None and self.hparams.get("use_nsf")
        if self._packed_active(c.shape[1]):
            run, run_nof0, params = self._packed_runner
        else:
            run, run_nof0 = self._jitted
            params = self.params
        if with_f0:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            wav = run(params, c, jnp.asarray(np.asarray(f0, np.float32))[None], rng)
        else:
            wav = run_nof0(params, c)
        wav_out = np.asarray(wav[0])
        if self.hparams.get("vocoder_denoise_c", 0.0) > 0:
            wav_out = denoise(
                wav_out, v=self.hparams["vocoder_denoise_c"],
                fft_size=self.hparams["fft_size"],
                hop_size=self.hparams["hop_size"],
                win_size=self.hparams["win_size"],
            )
        return wav_out

    @staticmethod
    def wav2spec(inp_path, hparams, keyshift=0, speed=1):
        from prodiff_tpu.vocoders.nsf_hifigan import NsfHifiGAN

        return NsfHifiGAN.wav2spec(inp_path, hparams, keyshift, speed)


@register_vocoder
class PWG(BaseVocoder):
    def __init__(self, hparams: dict):
        super().__init__(hparams)
        from prodiff_tpu.models.pwg import ParallelWaveGANGenerator, convert_pwg
        from prodiff_tpu.utils.torch_convert import load_torch_state_dict

        base_dir = hparams["vocoder_ckpt"] or "wavegan_pretrained"
        with open(os.path.join(base_dir, "config.yaml")) as f:
            self.config = yaml.safe_load(f)
        ckpt = _latest_ckpt(base_dir)
        if ckpt is None:
            pkls = sorted(
                glob.glob(os.path.join(base_dir, "checkpoint-*steps.pkl")),
                key=lambda x: int(re.findall(r"checkpoint-(\d+)steps", x)[0]),
            )
            ckpt = pkls[-1]
        print("| load PWG:", ckpt)
        sd = load_torch_state_dict(ckpt)
        sd = {
            (k[len("model_gen."):] if k.startswith("model_gen.") else k): v
            for k, v in sd.items()
        }
        gp = self.config["generator_params"]
        self.params = jax.tree.map(jnp.asarray, convert_pwg(sd, self.config))
        self.model = ParallelWaveGANGenerator(
            layers=gp.get("layers", 30),
            stacks=gp.get("stacks", 3),
            residual_channels=gp.get("residual_channels", 64),
            gate_channels=gp.get("gate_channels", 128),
            skip_channels=gp.get("skip_channels", 64),
            aux_channels=gp.get("aux_channels", 80),
            aux_context_window=gp.get("aux_context_window", 2),
            upsample_scales=tuple(gp["upsample_params"]["upsample_scales"]),
            use_pitch_embed=gp.get("use_pitch_embed", False),
            kernel_size=gp.get("kernel_size", 3),
        )
        self.scaler = None  # official hdf5 stats unsupported without h5py

    def spec2wav(self, mel, f0=None, rng=None, **kwargs):
        gp = self.config["generator_params"]
        window = gp.get("aux_context_window", 2)
        hop = self.config["hop_size"]
        c = np.pad(np.asarray(mel, np.float32), ((window, window), (0, 0)), "edge")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        z = jax.random.normal(rng, (1, mel.shape[0] * hop, 1))
        pitch = None
        if f0 is not None and gp.get("use_pitch_embed", False):
            p = f0_to_coarse(np.asarray(f0, np.float64).copy())
            pitch = jnp.asarray(np.pad(p, (window, window), "edge"))[None]
        wav = self.model.apply(self.params, z, jnp.asarray(c)[None], pitch)
        return np.asarray(wav[0])

    @staticmethod
    def wav2spec(inp_path, hparams, keyshift=0, speed=1):
        from prodiff_tpu.vocoders.nsf_hifigan import NsfHifiGAN

        return NsfHifiGAN.wav2spec(inp_path, hparams, keyshift, speed)
