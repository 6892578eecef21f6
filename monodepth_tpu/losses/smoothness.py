"""Edge-aware disparity smoothness loss, NHWC, pure jnp.

Reference: model_loss/model_loss.py:45-88 (EdgeAwareSmooth) and :107-116
(SmoothLoss wrapper that mean-normalizes the disparity first).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def edge_aware_smoothness(disparity: Array, image: Array) -> Array:
    """|∂d| * exp(-|∂I|) averaged over both axes -> scalar.

    disparity: [B, h, w, 1]; image: [B, h, w, 3] (same scale).
    """
    grad_disp_x = jnp.abs(disparity[:, :, :-1, :] - disparity[:, :, 1:, :])
    grad_disp_y = jnp.abs(disparity[:, :-1, :, :] - disparity[:, 1:, :, :])

    grad_img_x = jnp.abs(image[:, :, :-1, :] - image[:, :, 1:, :]).mean(-1, keepdims=True)
    grad_img_y = jnp.abs(image[:, :-1, :, :] - image[:, 1:, :, :]).mean(-1, keepdims=True)

    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return grad_disp_x.mean() + grad_disp_y.mean()


def smooth_loss(disparity: Array, color: Array) -> Array:
    """Edge-aware smoothness on mean-normalized disparity
    (reference: model_loss/model_loss.py:112-116)."""
    mean_disp = disparity.mean(axis=(1, 2), keepdims=True)
    norm_disp = disparity / (mean_disp + 1e-7)
    return edge_aware_smoothness(norm_disp, color)
