"""optax optimizer stack mirroring the reference's training recipe.

AdamW(beta1, beta2, weight_decay) + RSQRT warmup schedule
(``utils/common_schedulers.py:24-50``, ``component/train_task/base_task.py:150-162``)
+ global-norm / value clipping + gradient accumulation
(``handler/train/handler.py:268,295``; ``base_task.py:231-235``).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def rsqrt_schedule(lr: float, warmup_updates: int, hidden_size: int):
    """lr * min(t/warmup, 1) * max(warmup, t)^-0.5 * H^-0.5, floored at 1e-7."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = jnp.minimum(step / warmup_updates, 1.0)
        rsqrt_decay = jnp.maximum(float(warmup_updates), step) ** -0.5
        return jnp.maximum(lr * warmup * rsqrt_decay * hidden_size ** -0.5, 1e-7)

    return schedule


def build_lr_schedule(hparams: dict):
    if hparams.get("scheduler", "rsqrt") == "rsqrt":
        return rsqrt_schedule(
            hparams["lr"], hparams["warmup_updates"], hparams["hidden_size"]
        )
    return lambda step: jnp.asarray(hparams["lr"], jnp.float32)


def build_optimizer(hparams: dict) -> optax.GradientTransformation:
    schedule = build_lr_schedule(hparams)
    chain = []
    if hparams.get("clip_grad_value", 0):
        chain.append(optax.clip(hparams["clip_grad_value"]))
    if hparams.get("clip_grad_norm", 0):
        chain.append(optax.clip_by_global_norm(hparams["clip_grad_norm"]))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=hparams.get("optimizer_adam_beta1", 0.9),
            b2=hparams.get("optimizer_adam_beta2", 0.98),
            weight_decay=hparams.get("weight_decay", 0) or 0.0,
        )
    )
    tx = optax.chain(*chain)
    accum = hparams.get("accumulate_grad_batches", 1)
    if accum and accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
