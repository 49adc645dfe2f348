"""FastDiff vocoder wrapper (reference ``component/vocoder/fastdiff.py``).

Loads the released torch checkpoint + config.yaml, selects the baked-in
4/6/8/1000-step reverse noise schedules, and runs the scanned sampler jitted.
Fixes the reference's broken lowercase import (SURVEY §2.11.1) by existing.
"""

from __future__ import annotations

import functools
import glob
import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from prodiff_tpu.models.fastdiff import (
    FastDiff as FastDiffNet,
    compute_hyperparams_given_schedule,
    convert_fastdiff,
    prepare_inference_schedule,
    sampling_given_noise_schedule,
)
from prodiff_tpu.vocoders import BaseVocoder, register_vocoder

NOISE_SCHEDULES = {
    1000: np.linspace(0.000001, 0.01, 1000),
    200: np.linspace(0.0001, 0.02, 200),
    # derived by the reference's noise predictor (``fastdiff.py:66-77``)
    8: np.array([6.689325005027058e-07, 1.0033881153503899e-05,
                 0.00015496854030061513, 0.002387222135439515,
                 0.035597629845142365, 0.3681158423423767,
                 0.4735414385795593, 0.5]),
    6: np.array([1.7838445955931093e-06, 2.7984189728158526e-05,
                 0.00043231004383414984, 0.006634317338466644,
                 0.09357017278671265, 0.6000000238418579]),
    4: np.array([3.2176e-04, 2.5743e-03, 2.5376e-02, 7.0414e-01]),
    3: np.array([9.0000e-05, 9.0000e-03, 6.0000e-01]),
}


def load_fastdiff_model(config_path: str, checkpoint_path: str, reverse_step: int = 4,
                        use_pallas_lvc: bool = False, use_packed=None):
    with open(config_path) as f:
        config = yaml.safe_load(f)
    model = FastDiffNet(
        use_pallas_lvc=use_pallas_lvc,
        use_packed=use_packed,
        audio_channels=config["audio_channels"],
        inner_channels=config["inner_channels"],
        cond_channels=config["cond_channels"],
        upsample_ratios=tuple(config["upsample_ratios"]),
        lvc_layers_each_block=config["lvc_layers_each_block"],
        lvc_kernel_size=config["lvc_kernel_size"],
        kpnet_hidden_channels=config["kpnet_hidden_channels"],
        kpnet_conv_size=config["kpnet_conv_size"],
        diffusion_step_embed_dim_in=config["diffusion_step_embed_dim_in"],
        diffusion_step_embed_dim_mid=config["diffusion_step_embed_dim_mid"],
        diffusion_step_embed_dim_out=config["diffusion_step_embed_dim_out"],
    )
    from prodiff_tpu.utils.torch_convert import load_torch_state_dict

    sd = load_torch_state_dict(checkpoint_path)
    params = jax.tree.map(jnp.asarray, convert_fastdiff(sd, config))

    train_schedule = np.linspace(
        float(config["beta_0"]), float(config["beta_T"]), int(config["T"])
    )
    dh = compute_hyperparams_given_schedule(train_schedule)
    if config.get("noise_schedule", ""):
        noise_schedule = np.asarray(config["noise_schedule"], np.float64)
    else:
        noise_schedule = NOISE_SCHEDULES[reverse_step]
    return model, params, dh, noise_schedule, config


@register_vocoder
class FastDiff(BaseVocoder):
    def __init__(self, hparams: dict):
        super().__init__(hparams)
        base_dir = hparams["vocoder_ckpt"] or "checkpoint/FastDiff"
        config_path = os.path.join(base_dir, "config.yaml")
        ckpts = sorted(
            glob.glob(os.path.join(base_dir, "model_ckpt_steps_*.ckpt")),
            key=lambda x: int(re.findall(r"model_ckpt_steps_(\d+)\.ckpt", x)[0]),
        )
        assert ckpts, f"no FastDiff checkpoints in {base_dir}"
        print("| load FastDiff:", ckpts[-1])
        reverse_step = int(hparams.get("fastdiff_reverse_step", 4))
        # opt-in fused Pallas LVC (config key: fastdiff_fused_lvc) — measured
        # faster standalone but slower in-net on v5e; see models/fastdiff.py
        fused_lvc = bool(hparams.get("fastdiff_fused_lvc", False))
        # packed space-to-depth trunk: null = auto (on for TPU backends)
        packed = hparams.get("fastdiff_packed", None)
        self.model, self.params, self.dh, self.noise_schedule, self.config = (
            load_fastdiff_model(config_path, ckpts[-1], reverse_step,
                                use_pallas_lvc=fused_lvc, use_packed=packed)
        )
        (
            self.beta_infer,
            self.alpha_infer,
            self.sigma_infer,
            self.steps_infer,
        ) = prepare_inference_schedule(self.noise_schedule, self.dh["alpha"])

    @functools.cached_property
    def _jitted(self):
        from prodiff_tpu.models.fastdiff import (
            MAX_HOISTED_STEPS,
            fastdiff_step_kernels,
        )

        @functools.partial(jax.jit, static_argnames=("audio_length",))
        def run(params, cond, rng, audio_length):
            # hoisting materialises [n_steps, B, L, layers*k*2C^2] kernels —
            # fine for the 4/6/8-step schedules, ruinous for the 1000-step one
            if (self.model.packed_active(cond.shape[1])
                    and len(self.steps_infer) <= MAX_HOISTED_STEPS):
                # hoist the KernelPredictors out of the reverse loop (their
                # outputs depend only on (cond, step) — one batched KP per
                # block instead of one per reverse step)
                kp_all = fastdiff_step_kernels(
                    self.model, params, cond,
                    jnp.asarray(self.steps_infer, jnp.float32),
                )
                return sampling_given_noise_schedule(
                    lambda p, x, c, t, k: self.model.apply(p, x, c, t, kp_out=k),
                    params, rng, audio_length, cond,
                    self.beta_infer, self.alpha_infer, self.sigma_infer,
                    self.steps_infer, kp_all=kp_all,
                )
            return sampling_given_noise_schedule(
                lambda p, x, c, t: self.model.apply(p, x, c, t),
                params, rng, audio_length, cond,
                self.beta_infer, self.alpha_infer, self.sigma_infer,
                self.steps_infer,
            )

        return run

    def spec2wav(self, mel, rng=None, **kwargs):
        """mel: [T, M] (the FastDiff conditioning convention) -> wav [T*hop]."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        c = jnp.asarray(np.asarray(mel, np.float32))[None]  # [1, L, M]
        hop = int(np.prod(self.config["upsample_ratios"]))
        audio_length = c.shape[1] * hop
        wav = self._jitted(self.params, c, rng, audio_length)
        return np.asarray(wav[0])

    @staticmethod
    def wav2spec(inp_path: str, hparams: dict, keyshift=0, speed=1):
        from prodiff_tpu.vocoders.nsf_hifigan import NsfHifiGAN

        return NsfHifiGAN.wav2spec(inp_path, hparams, keyshift, speed)
