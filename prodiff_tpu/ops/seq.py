"""Sequence-regulation ops: duration <-> frame-to-token maps, under jit.

TPU-first equivalents of the reference's ``LengthRegulator`` /
``mel2ph_to_dur`` (``modules/fastspeech/tts_modules.py:135-170,223-229``).
``mel2ph`` uses the reference's 1-indexed convention: ``mel2ph[b, t] == k``
means frame ``t`` belongs to token ``k-1``; ``0`` marks padding frames.

All shapes are static; ragged sequences are handled with masks, which is what
lets these run inside a single compiled XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def length_regulator(dur: jnp.ndarray, max_frames: int, alpha: float = 1.0) -> jnp.ndarray:
    """Expand integer token durations into a frame->token index map.

    Args:
      dur: [B, T_txt] integer durations (padding tokens must have dur 0).
      max_frames: static output length T_mel.
      alpha: duration rescale coefficient.

    Returns:
      mel2ph: [B, max_frames] int32, 1-indexed token ids, 0 beyond the total.
    """
    dur = jnp.round(dur.astype(jnp.float32) * alpha).astype(jnp.int32)
    dur_cumsum = jnp.cumsum(dur, axis=1)  # [B, T_txt]
    total = dur_cumsum[:, -1:]  # [B, 1]
    pos = jnp.arange(max_frames, dtype=jnp.int32)[None, :]  # [1, T_mel]
    # mel2ph = 1 + #(cumsum <= pos): O(T log T) via searchsorted per row.
    mel2ph = jax.vmap(
        lambda c, p: jnp.searchsorted(c, p, side="right")
    )(dur_cumsum, jnp.broadcast_to(pos, (dur.shape[0], max_frames))).astype(jnp.int32) + 1
    return jnp.where(pos < total, mel2ph, 0)


def mel2ph_to_dur(mel2ph: jnp.ndarray, t_txt: int, max_dur: int | None = None) -> jnp.ndarray:
    """Invert ``length_regulator``: per-token frame counts via segment-sum.

    Args:
      mel2ph: [B, T_mel] 1-indexed token map (0 = padding frame).
      t_txt: static token-sequence length.

    Returns:
      dur: [B, t_txt] int32.
    """
    ones = jnp.ones_like(mel2ph, dtype=jnp.int32)
    dur = jax.vmap(
        lambda m, o: jax.ops.segment_sum(o, m, num_segments=t_txt + 1)
    )(mel2ph, ones)[:, 1:]
    if max_dur is not None:
        dur = jnp.minimum(dur, max_dur)
    return dur


def regulate_hidden(encoder_out: jnp.ndarray, mel2ph: jnp.ndarray) -> jnp.ndarray:
    """Gather token hiddens to frames through mel2ph (padding frames -> zeros).

    Equivalent to the reference's left-pad + gather
    (``modules/svs/prodiff_teacher.py:122-124``).

    Args:
      encoder_out: [B, T_txt, H]
      mel2ph: [B, T_mel] 1-indexed.

    Returns:
      [B, T_mel, H]
    """
    padded = jnp.pad(encoder_out, ((0, 0), (1, 0), (0, 0)))
    return jnp.take_along_axis(padded, mel2ph[..., None], axis=1)


def dur_to_mel2ph_host(ph_dur_sec, timestep: float, length: int):
    """Host-side (numpy) duration-seconds -> mel2ph, matching
    ``utils/data_gen_utils.py:337-347`` (cumsum + round(+0.5) trick)."""
    import numpy as np

    ph_acc = np.round(np.cumsum(np.asarray(ph_dur_sec, dtype=np.float64)) / timestep + 0.5).astype(
        np.int64
    )
    ph_dur = np.diff(ph_acc, prepend=0)
    cumsum = np.cumsum(ph_dur)
    total = int(cumsum[-1]) if len(cumsum) else 0
    mel2ph = np.zeros(max(length, total), dtype=np.int64)
    prev = 0
    for i, c in enumerate(cumsum):
        mel2ph[prev:c] = i + 1
        prev = c
    if total < length:
        mel2ph[total:length] = mel2ph[total - 1] if total > 0 else 0
    return mel2ph[:length]
