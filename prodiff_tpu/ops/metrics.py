"""Quality metrics: mel-cepstral distortion (the BASELINE.json quality axis)
and helpers. Jittable."""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _dct_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II basis [n_out, n_in] (sptk/librosa mfcc convention)."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    basis *= np.sqrt(2.0 / n_in)
    basis[0] *= np.sqrt(0.5)
    return basis.astype(np.float32)


def mel_to_cepstra(log_mel: jnp.ndarray, n_mfcc: int = 13) -> jnp.ndarray:
    """log-mel [T, M] (any log base — scale-invariant up to a constant) ->
    cepstra [T, n_mfcc] via DCT-II."""
    m = log_mel.shape[-1]
    dct = jnp.asarray(_dct_matrix(m, n_mfcc))
    return log_mel @ dct.T


def mel_cepstral_distortion(
    mel_a: jnp.ndarray,
    mel_b: jnp.ndarray,
    n_mfcc: int = 13,
    exclude_c0: bool = True,
) -> jnp.ndarray:
    """MCD in dB between two log10-mel spectrograms [T, M] (equal length).

    MCD = (10 / ln 10) * sqrt(2 * sum_k (c_a[k] - c_b[k])^2), averaged over
    frames; c0 (overall energy) excluded by convention.
    """
    # convert log10-mel to natural-log cepstra (the standard MCD domain)
    ca = mel_to_cepstra(mel_a * np.log(10), n_mfcc)
    cb = mel_to_cepstra(mel_b * np.log(10), n_mfcc)
    if exclude_c0:
        ca, cb = ca[:, 1:], cb[:, 1:]
    dist = jnp.sqrt(2.0 * jnp.sum((ca - cb) ** 2, axis=-1))
    return (10.0 / np.log(10)) * jnp.mean(dist)
