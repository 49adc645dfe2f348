"""Training losses, jittable.

Mirrors ``component/train_task/loss_utils.py``: ProDiff spectrogram losses
(l1/mse/ssim with nonpadding masking), logit-normal-weighted rectified-flow
loss, and the 3-level (phoneme/word/sentence) log-domain duration loss.

Framework-wide spec layout is [B, F, T, M] (the reference uses [B, F, M, T];
its ssim wrapper transposes to [B, F, T, M] internally, so SSIM here operates
on the identical image orientation).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from prodiff_tpu.ops.ssim import ssim


def parse_loss_spec(spec: str) -> Dict[str, float]:
    """Parse ``"l1:0.5|ssim:0.5"`` / ``"l1"`` into {name: weight}."""
    out: Dict[str, float] = {}
    for part in spec.split("|"):
        if ":" in part:
            name, w = part.split(":")
            out[name] = float(w)
        else:
            out[part] = 1.0
    return out


def ssim_loss(pred: jnp.ndarray, target: jnp.ndarray, bias: float = 6.0) -> jnp.ndarray:
    """1 - SSIM with the reference's +6.0 brightness bias
    (``component/train_task/loss_utils.py:8-16``). Inputs [B, F, T, M]."""
    return 1 - ssim(pred + bias, target + bias)


def spec_loss_prodiff(
    pred_spec: jnp.ndarray,
    gt_spec: jnp.ndarray,
    non_padding: jnp.ndarray | None,
    loss_type: Dict[str, float],
    name: str = "spec",
) -> Dict[str, jnp.ndarray]:
    """x0-prediction losses. pred/gt: [B, F, T, M]; non_padding: [B, T]."""
    if non_padding is not None:
        mask = non_padding[:, None, :, None].astype(pred_spec.dtype)
        pred_spec = pred_spec * mask
        gt_spec = gt_spec * mask
    losses = {}
    for loss_name, lbd in loss_type.items():
        if loss_name == "l1":
            l = jnp.abs(pred_spec - gt_spec).mean()
        elif loss_name in ("mse", "l2"):
            l = jnp.square(pred_spec - gt_spec).mean()
        elif loss_name == "ssim":
            l = ssim_loss(pred_spec, gt_spec)
        else:
            raise NotImplementedError(loss_name)
        losses[f"{name}_{loss_name}"] = l * lbd
    return losses


def spec_loss_reflow(
    v_pred: jnp.ndarray,
    v_gt: jnp.ndarray,
    t: jnp.ndarray,
    non_padding: jnp.ndarray | None,
    loss_type: str,
    log_norm: bool = True,
    name: str = "spec",
) -> Dict[str, jnp.ndarray]:
    """Velocity-matching loss with optional logit-normal time weighting.

    v_pred/v_gt: [B, F, T, M]; t: [B]; non_padding: [B, T].
    """
    if non_padding is not None:
        mask = non_padding[:, None, :, None].astype(v_pred.dtype)
        v_pred = v_pred * mask
        v_gt = v_gt * mask
    if loss_type == "l1":
        loss = jnp.abs(v_pred - v_gt)
    elif loss_type in ("l2", "mse"):
        loss = jnp.square(v_pred - v_gt)
    else:
        raise NotImplementedError(loss_type)
    if log_norm:
        eps = 1e-7
        tc = jnp.clip(t.astype(jnp.float32), eps, 1 - eps)
        weights = 0.398942 / tc / (1 - tc) * jnp.exp(
            -0.5 * jnp.log(tc / (1 - tc)) ** 2
        ) + eps
        loss = weights[:, None, None, None] * loss
    return {name: loss.mean()}


def dur_loss(
    dur_pred: jnp.ndarray,
    dur_tgt: jnp.ndarray,
    onset: jnp.ndarray,
    log_offset: float,
    lambda_pdur: float,
    lambda_wdur: float,
    lambda_sdur: float,
    max_words: int | None = None,
) -> jnp.ndarray:
    """3-granularity MSE duration loss in log domain
    (``loss_utils.py:75-101``).

    dur_pred/dur_tgt: [B, T_ph] (linear domain); onset: [B, T_ph] word-boundary
    0/1 indicators. Word durations are aggregated with a segment-sum over
    ``ph2word = cumsum(onset)`` (the scatter_add of the reference).
    """
    linear2log = lambda x: jnp.log(x + log_offset)
    mse = lambda a, b: jnp.square(a - b).mean()

    pdur_loss = lambda_pdur * mse(linear2log(dur_pred), linear2log(dur_tgt))

    dur_pred = jnp.clip(dur_pred, 0.0, None)
    ph2word = jnp.cumsum(onset.astype(jnp.int32), axis=1)  # [B, T_ph], 1-indexed
    n_words = max_words if max_words is not None else int(dur_pred.shape[1])
    seg = jax.vmap(
        lambda d, w: jax.ops.segment_sum(d, w, num_segments=n_words + 1)
    )
    wdur_pred = seg(dur_pred, ph2word)[:, 1:]
    wdur_tgt = seg(dur_tgt.astype(dur_pred.dtype), ph2word)[:, 1:]
    wdur_loss = lambda_wdur * mse(linear2log(wdur_pred), linear2log(wdur_tgt))

    sdur_pred = dur_pred.sum(axis=1)
    sdur_tgt = dur_tgt.sum(axis=1)
    sdur_loss = lambda_sdur * mse(linear2log(sdur_pred), linear2log(sdur_tgt))
    return pdur_loss + wdur_loss + sdur_loss
