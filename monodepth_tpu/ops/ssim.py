"""SSIM and the SSIM+L1 photometric error, NHWC, pure jnp.

The reference computes SSIM with 3x3 average pools over reflection-padded
images (reference: model_loss/model_loss.py:11-41) and blends
0.85*SSIM + 0.15*L1 per pixel (model_loss/model_loss.py:92-103). Here the
average pool is a separable pair of matmul-free window reductions that
XLA fuses with the surrounding elementwise math into one VPU pass; a
Pallas fused kernel lives in ops/pallas/ for the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _avg_pool3(x: Array) -> Array:
    """3x3 mean over a reflect-padded NHWC tensor (output size == input)."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    # Separable 3-tap box filter: two shifted adds per axis (VPU-friendly).
    x = x[:, :-2] + x[:, 1:-1] + x[:, 2:]
    x = x[:, :, :-2] + x[:, :, 1:-1] + x[:, :, 2:]
    return x * (1.0 / 9.0)


def ssim(image1: Array, image2: Array) -> Array:
    """Per-pixel SSIM *distance* in [0, 1]: clamp((1 - SSIM)/2, 0, 1).

    NHWC in, NHWC out (same channel count). Matches the reference module
    exactly, including computing the local statistics on the padded images
    (reference: model_loss/model_loss.py:28-41).
    """
    mu_x = _avg_pool3(image1)
    mu_y = _avg_pool3(image2)

    sigma_x = _avg_pool3(image1 * image1) - mu_x * mu_x
    sigma_y = _avg_pool3(image2 * image2) - mu_y * mu_y
    sigma_xy = _avg_pool3(image1 * image2) - mu_x * mu_y

    num = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    den = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1.0 - num / den) * 0.5, 0.0, 1.0)


def reprojection_error(prediction: Array, target: Array) -> Array:
    """0.85 * mean_c(SSIM) + 0.15 * mean_c(L1) -> [B, H, W, 1]
    (reference: model_loss/model_loss.py:97-103)."""
    l1 = jnp.abs(target - prediction).mean(axis=-1, keepdims=True)
    ssim_term = ssim(prediction, target).mean(axis=-1, keepdims=True)
    return 0.85 * ssim_term + 0.15 * l1
