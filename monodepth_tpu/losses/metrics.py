"""KITTI depth metrics: abs_rel / sq_rel / rmse / rmse_log / a1 / a2 / a3.

Two variants, mirroring the reference:
- `depth_errors`: the raw 7-metric formulas (reference:
  model_loss/model_metric.py:19-64), here in masked/weighted jnp form so
  they run inside jit with static shapes (the reference boolean-indexes,
  which is dynamic-shape and jit-hostile).
- `training_depth_metric`: the loose training-time batch metric
  (reference: model_loss/model_metric.py:70-106): bilinear-resize the
  prediction to 375x1242, gt>0 mask x fixed crop [153:371, 44:1197],
  one median-scale over the whole batch, clamp to [1e-3, 80].

The per-image Eigen *test* protocol lives in eval/eigen.py (host-side
numpy, matching model_test.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from monodepth_tpu.ops.sampling import resize_bilinear

Array = jax.Array

METRIC_NAMES = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")

GT_HEIGHT, GT_WIDTH = 375, 1242
CROP = (153, 371, 44, 1197)  # Garg crop rows/cols (model_metric.py:96)

# Host-side constant: a traced `.at[...].set` scatter here made XLA
# constant-fold a f32[375,1242] scatter at every eval compile (the
# ">1s constant folding" warning in the round-2 multichip dryrun).
import numpy as _np

_CROP_MASK = _np.zeros((GT_HEIGHT, GT_WIDTH), _np.float32)
_CROP_MASK[CROP[0]:CROP[1], CROP[2]:CROP[3]] = 1.0


def _masked_mean(x: Array, mask: Array) -> Array:
    denom = jnp.maximum(mask.sum(), 1.0)
    return (x * mask).sum() / denom


def masked_median_low(x: Array, mask: Array) -> Array:
    """Lower median of x[mask] (torch.median semantics) with static shapes:
    invalid entries are pushed to +inf, then we index the sorted array at
    (n_valid - 1) // 2."""
    flat = jnp.where(mask.astype(bool), x, jnp.inf).reshape(-1)
    n = mask.sum().astype(jnp.int32)
    idx = jnp.maximum(n - 1, 0) // 2
    return jnp.sort(flat)[idx]


def depth_errors(ground_truth: Array, prediction: Array, mask: Array):
    """Masked 7-metric tuple; means are over mask==1 elements only."""
    mask = mask.astype(ground_truth.dtype)
    # Keep masked-out entries benign for the log/div.
    gt = jnp.where(mask > 0, ground_truth, 1.0)
    pred = jnp.where(mask > 0, prediction, 1.0)

    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = _masked_mean((thresh < 1.25).astype(gt.dtype), mask)
    a2 = _masked_mean((thresh < 1.25 ** 2).astype(gt.dtype), mask)
    a3 = _masked_mean((thresh < 1.25 ** 3).astype(gt.dtype), mask)

    rmse = jnp.sqrt(_masked_mean((gt - pred) ** 2, mask))
    rmse_log = jnp.sqrt(_masked_mean((jnp.log(gt) - jnp.log(pred)) ** 2, mask))
    abs_rel = _masked_mean(jnp.abs(gt - pred) / gt, mask)
    sq_rel = _masked_mean((gt - pred) ** 2 / gt, mask)
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3


def training_depth_metric(depth_pred: Array, depth_gt: Array) -> dict:
    """Training-time batch metric (reference: model_metric.py:70-106).

    depth_pred: [B, H, W, 1] full-resolution predicted depth (scale 0).
    depth_gt:   [B, 375, 1242] sparse velodyne ground truth.
    Returns {metric_name: scalar}.
    """
    pred = resize_bilinear(depth_pred, GT_HEIGHT, GT_WIDTH, align_corners=False)
    pred = jnp.clip(pred[..., 0], 1e-3, 80.0)
    pred = jax.lax.stop_gradient(pred)

    mask = (depth_gt > 0).astype(pred.dtype)
    mask = mask * jnp.asarray(_CROP_MASK, pred.dtype)[None]

    ratio = masked_median_low(depth_gt, mask) / masked_median_low(pred, mask)
    pred = jnp.clip(pred * ratio, 1e-3, 80.0)

    errs = depth_errors(depth_gt, pred, mask)
    return dict(zip(METRIC_NAMES, errs))
