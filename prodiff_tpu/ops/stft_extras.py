"""Complex STFT / inverse STFT (torch.stft/istft conventions), jittable.

Used by the k-th-harmonic extraction (``binarizer_utils.get_kth_harmonic``)
and harmonic/aperiodic feature math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def nuttall_window(win_size: int) -> np.ndarray:
    phase = np.arange(win_size, dtype=np.float64) / win_size * 2 * np.pi
    return (
        0.355768
        - 0.487396 * np.cos(phase)
        + 0.144232 * np.cos(2 * phase)
        - 0.012604 * np.cos(3 * phase)
    ).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "center"))
def stft_complex(y: jnp.ndarray, window: jnp.ndarray, n_fft: int, hop: int,
                 center: bool = True) -> jnp.ndarray:
    """y: [B, L] -> complex spec [B, F, n_frames] (torch.stft semantics)."""
    if center:
        y = jnp.pad(y, [(0, 0), (n_fft // 2, n_fft // 2)], mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop
        + jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    )
    frames = y[:, idx] * window
    return jnp.fft.rfft(frames, n=n_fft, axis=-1).swapaxes(-1, -2)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "length"))
def istft(spec: jnp.ndarray, window: jnp.ndarray, n_fft: int, hop: int,
          length: int) -> jnp.ndarray:
    """spec: [B, F, n_frames] complex -> [B, length] (torch.istft, center=True):
    windowed overlap-add normalised by the summed squared window."""
    frames = jnp.fft.irfft(spec.swapaxes(-1, -2), n=n_fft, axis=-1)  # [B, T_f, n_fft]
    frames = frames * window
    b, n_frames, _ = frames.shape
    total = n_fft + hop * (n_frames - 1)

    frame_idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    flat_idx = frame_idx.reshape(-1)
    wav = jax.vmap(
        lambda fr: jnp.zeros(total).at[flat_idx].add(fr.reshape(-1))
    )(frames)
    wsq = jnp.zeros(total).at[flat_idx].add(
        jnp.broadcast_to(window ** 2, (n_frames, n_fft)).reshape(-1)
    )
    wav = wav / jnp.maximum(wsq, 1e-11)
    start = n_fft // 2
    avail = total - start
    if avail < length:  # torch.istft zero-pads up to the requested length
        wav = jnp.pad(wav, [(0, 0), (0, length - avail)])
    return jax.lax.dynamic_slice_in_dim(wav, start, length, axis=1)
