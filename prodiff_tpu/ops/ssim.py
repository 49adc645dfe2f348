"""SSIM on spectrogram "images", jittable.

Equivalent to the reference's window-11 Gaussian SSIM
(``modules/commons/ssim.py:330-391``): per-channel 2-D Gaussian blur
(sigma 1.5, SAME zero padding), C1=0.01^2, C2=0.03^2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _gaussian_window_np(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma ** 2)
    )
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    # cache holds numpy (trace-safe); conversion to a jnp constant happens
    # inside the current trace
    return jnp.asarray(_gaussian_window_np(window_size, sigma))


def _blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2-D convolution with SAME zero padding. img: [B, C, H, W]."""
    c = img.shape[1]
    kernel = jnp.broadcast_to(window[None, None], (c, 1, *window.shape))
    return jax.lax.conv_general_dilated(
        img,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over [B, C, H, W] images."""
    window = _gaussian_window(window_size)
    mu1, mu2 = _blur(img1, window), _blur(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window) - mu2_sq
    sigma12 = _blur(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()
