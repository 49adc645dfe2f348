"""Rectified flow (velocity-field flow matching) with scanned ODE samplers.

Mirrors the reference's ``RectifiedFlow`` / ``PitchRectifiedFlow``
(``modules/diffusion/reflow.py:5-144``): train on x_t = x0 + t(x1-x0) with
velocity target x1-x0; sample by integrating from N(0,1) with
euler/rk2/rk4/rk5 steppers. Specs are min-max normalised to [-1, 1].

TPU-first: tensors are [B, F, T, M]; the integration loop is a ``lax.scan``
with the stepper chosen at trace time; ``repeat_bins``/clamp implement the
pitch variant without subclass gymnastics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class RectifiedFlow(nn.Module):
    denoise_fn: nn.Module
    out_dims: int
    time_scale: int = 1000
    num_features: int = 1
    sampling_algorithm: str = "euler"
    spec_min: Tuple[float, ...] = (-12.0,)
    spec_max: Tuple[float, ...] = (0.0,)
    # Pitch/curve mode: clamp 1-D curves, repeat to repeat_bins, mean-decode.
    repeat_bins: Optional[int] = None
    clamp_min: Optional[float] = None
    clamp_max: Optional[float] = None

    def _spec_bounds(self):
        """spec_min/max broadcast against [B, F, T, M] (last-dim mel bins or
        per-feature scalars repeated over R bins)."""
        smin = jnp.asarray(self.spec_min, dtype=jnp.float32)
        smax = jnp.asarray(self.spec_max, dtype=jnp.float32)
        if self.repeat_bins is not None:
            # per-feature scalars -> [1, F, 1, 1]
            return smin[None, :, None, None], smax[None, :, None, None]
        # per-mel-bin (possibly length-1 broadcast) -> [1, 1, 1, M]
        return smin[None, None, None, :], smax[None, None, None, :]

    def norm_spec(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.repeat_bins is not None:
            if self.clamp_min is not None and self.clamp_max is not None:
                x = jnp.clip(x, self.clamp_min, self.clamp_max)
            x = jnp.repeat(x[..., None], self.repeat_bins, axis=-1)  # [B,F,T,R]
        smin, smax = self._spec_bounds()
        return (x - smin) / (smax - smin) * 2 - 1

    def denorm_spec(self, x: jnp.ndarray) -> jnp.ndarray:
        smin, smax = self._spec_bounds()
        x = (x + 1) / 2 * (smax - smin) + smin
        if self.repeat_bins is not None:
            x = x.mean(axis=-1)  # [B, F, T]
            if self.clamp_min is not None and self.clamp_max is not None:
                x = jnp.clip(x, self.clamp_min, self.clamp_max)
        return x

    def _velocity(self, x, t_scaled, cond, train: bool = False):
        b, f, tt, m = x.shape
        flat = x.transpose(0, 2, 1, 3).reshape(b, tt, f * m)
        out = self.denoise_fn(flat, t_scaled, cond, train=train)
        return out.reshape(b, tt, f, m).transpose(0, 2, 1, 3)

    def __call__(
        self,
        cond: jnp.ndarray,
        gt_spec: Optional[jnp.ndarray] = None,
        infer: bool = False,
        infer_step: int = 20,
        init_noise: Optional[jnp.ndarray] = None,
    ):
        """Train: -> (v_pred, v_gt, t). Infer: -> denormalised sample.
        ``init_noise`` [B, F, T, M] injects the ODE start point explicitly
        (deterministic sampling / golden parity); defaults to a fresh draw."""
        b, t_mel = cond.shape[0], cond.shape[1]
        if not infer:
            x_end = self.norm_spec(gt_spec)  # [B, F, T, M]
            rng_t, rng_n = jax.random.split(self.make_rng("diffusion"))
            t = jax.random.uniform(rng_t, (b,))
            x_start = jax.random.normal(rng_n, x_end.shape, x_end.dtype)
            x_t = x_start + t[:, None, None, None] * (x_end - x_start)
            t_b = jnp.broadcast_to(t, (b,))
            v_pred = self._velocity(x_t, t_b * self.time_scale, cond, train=True)
            return v_pred, x_end - x_start, t

        shape = (b, self.num_features, t_mel, self.out_dims
                 if self.repeat_bins is None else self.repeat_bins)
        if init_noise is not None:
            x = init_noise
        else:
            x = jax.random.normal(self.make_rng("diffusion"), shape)
        if self.is_initializing():
            x = self._velocity(x, jnp.zeros((b,)), cond)
            return self.denorm_spec(x)

        n = max(1, int(infer_step))
        dt = 1.0 / n
        ts = jnp.arange(n, dtype=jnp.float32) * dt

        velocity = lambda x, t: self._velocity(
            x, jnp.full((b,), t * self.time_scale), cond
        )

        def euler(x, t):
            return x + velocity(x, t) * dt

        def rk2(x, t):
            k1 = velocity(x, t)
            k2 = velocity(x + 0.5 * k1 * dt, t + 0.5 * dt)
            return x + k2 * dt

        def rk4(x, t):
            k1 = velocity(x, t)
            k2 = velocity(x + 0.5 * k1 * dt, t + 0.5 * dt)
            k3 = velocity(x + 0.5 * k2 * dt, t + 0.5 * dt)
            k4 = velocity(x + k3 * dt, t + dt)
            return x + (k1 + 2 * k2 + 2 * k3 + k4) * dt / 6

        def rk5(x, t):
            k1 = velocity(x, t)
            k2 = velocity(x + 0.25 * k1 * dt, t + 0.25 * dt)
            k3 = velocity(x + 0.125 * (k2 + k1) * dt, t + 0.25 * dt)
            k4 = velocity(x + 0.5 * (-k2 + 2 * k3) * dt, t + 0.5 * dt)
            k5 = velocity(x + 0.0625 * (3 * k1 + 9 * k4) * dt, t + 0.75 * dt)
            k6 = velocity(
                x + (-3 * k1 + 2 * k2 + 12 * k3 - 12 * k4 + 8 * k5) * dt / 7, t + dt
            )
            return x + (7 * k1 + 32 * k3 + 12 * k4 + 32 * k5 + 7 * k6) * dt / 90

        stepper = {"euler": euler, "rk2": rk2, "rk4": rk4, "rk5": rk5}.get(
            self.sampling_algorithm, euler
        )

        def body(x, t):
            return stepper(x, t), None

        x, _ = jax.lax.scan(body, x, ts)
        return self.denorm_spec(x)
