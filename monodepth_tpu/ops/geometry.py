"""Differentiable view-synthesis geometry, NHWC, pure jnp.

TPU-native rebuild of the reference geometry stack
(reference: model_layer/warp.py:29-153, 193-269). Everything here is a
pure function of arrays — no module state, no baked-in batch size (the
reference baked batch/H/W into `Depth2PointCloud` buffers, forcing
drop_last loaders; we fold the pixel grid into the jit trace instead, so
XLA constant-folds it per shape).

The backproject/project pipeline is fused into two einsums that XLA maps
straight onto the MXU; the per-pixel normalization runs on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def disparity_to_depth(disparity: Array, min_depth: float, max_depth: float):
    """Sigmoid disparity -> (scaled_disp, depth).

    depth = 1 / (min_disp + (max_disp - min_disp) * d) with
    min_disp = 1/max_depth, max_disp = 1/min_depth
    (reference: model_layer/warp.py:29-39).
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disparity
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def axis_angle_to_rotation(axisangle: Array) -> Array:
    """Rodrigues axis-angle -> [B, 4, 4] rotation matrices.

    `axisangle` is [B, 3] (unit-axis * angle). The axis is normalized by
    (|v| + 1e-5), matching the reference's numerical guard
    (reference: model_layer/warp.py:65-122).
    """
    axisangle = axisangle.reshape(-1, 3)
    angle = jnp.linalg.norm(axisangle, ord=2, axis=-1, keepdims=True)  # [B,1]
    axis = axisangle / (angle + 1e-5)

    cos = jnp.cos(angle)[..., 0]  # [B]
    sin = jnp.sin(angle)[..., 0]
    C = 1.0 - cos

    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    xs, ys, zs = x * sin, y * sin, z * sin
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    zero = jnp.zeros_like(cos)
    one = jnp.ones_like(cos)
    rot = jnp.stack([
        x * xC + cos, xyC - zs,     zxC + ys,     zero,
        xyC + zs,     y * yC + cos, yzC - xs,     zero,
        zxC - ys,     yzC + xs,     z * zC + cos, zero,
        zero,         zero,         zero,         one,
    ], axis=-1).reshape(-1, 4, 4)
    return rot


def translation_to_matrix(translation: Array) -> Array:
    """[B, 3] translation vector -> [B, 4, 4] homogeneous translation matrix
    (reference: model_layer/warp.py:43-61)."""
    translation = translation.reshape(-1, 3)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=translation.dtype),
                           (translation.shape[0], 4, 4))
    return eye.at[:, :3, 3].set(translation)


def transform_from_parameters(axisangle: Array, translation: Array,
                              invert: bool = False) -> Array:
    """(axis-angle, translation) -> [B, 4, 4] SE(3) camera-to-camera transform.

    invert=True computes the inverse transform (used when the source frame
    precedes the target; reference: model_layer/warp.py:126-153):
        invert:  M = R^T @ T(-t)
        forward: M = T(t) @ R
    """
    R = axis_angle_to_rotation(axisangle)
    t = translation.reshape(-1, 3)
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -t
    T = translation_to_matrix(t)
    prec = jax.lax.Precision.HIGHEST
    return jnp.matmul(R, T, precision=prec) if invert else jnp.matmul(T, R, precision=prec)


@functools.lru_cache(maxsize=None)
def _homogeneous_pixel_grid(height: int, width: int) -> np.ndarray:
    """[3, H*W] rows = (x, y, 1); folded into the jit trace as a constant
    (replaces the reference's persistent `pix_coords` buffers,
    model_layer/warp.py:193-234)."""
    xs, ys = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    ones = np.ones_like(xs)
    return np.stack([xs, ys, ones], axis=0).reshape(3, -1).astype(np.float32)


def backproject(depth: Array, inv_K: Array) -> Array:
    """Depth map -> homogeneous camera-frame point cloud.

    depth: [B, H, W] or [B, H, W, 1]; inv_K: [B, 4, 4].
    Returns cam_points [B, 4, H*W] (reference: model_layer/warp.py:237-246).
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    B, H, W = depth.shape
    pix = jnp.asarray(_homogeneous_pixel_grid(H, W), dtype=depth.dtype)  # [3, HW]
    rays = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], pix, precision="highest")  # [B,3,HW]
    cam = depth.reshape(B, 1, H * W) * rays
    ones = jnp.ones((B, 1, H * W), dtype=depth.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project(cam_points: Array, K: Array, T: Array, height: int, width: int,
            eps: float = 1e-7) -> Array:
    """Camera-frame points -> normalized [-1, 1] sample grid [B, H, W, 2].

    Normalization divides by (W-1)/(H-1), i.e. align_corners=True
    convention (reference: model_layer/warp.py:250-269).
    """
    B = cam_points.shape[0]
    P = jnp.matmul(K, T, precision="highest")[:, :3, :]  # [B,3,4]
    pts = jnp.einsum("bij,bjn->bin", P, cam_points, precision="highest")  # [B,3,HW]
    xy = pts[:, :2, :] / (pts[:, 2:3, :] + eps)
    xy = xy.reshape(B, 2, height, width).transpose(0, 2, 3, 1)  # [B,H,W,2]
    scale = jnp.asarray([width - 1, height - 1], dtype=xy.dtype)
    return (xy / scale - 0.5) * 2.0


def warp_grid(depth: Array, inv_K: Array, K: Array, T: Array) -> Array:
    """Fused backproject∘project: depth + intrinsics + SE(3) -> sample grid.

    Equivalent to `project(backproject(depth, inv_K), K, T)` but contracts
    the two 3x3/3x4 matmuls into one [B,3,4] @ [B,4,HW] einsum:
        pts = (K T)[:3] @ [depth * (inv_K[:3,:3] @ pix); 1]
            = M[:, :3] @ pix * depth + M[:, 3:]
    with M = (K T)[:3] @ diag-embed(inv_K). This keeps a single MXU pass
    over the pixel grid and avoids materializing the [B,4,HW] cloud.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    B, H, W = depth.shape
    pix = jnp.asarray(_homogeneous_pixel_grid(H, W), dtype=depth.dtype)  # [3,HW]

    P = jnp.matmul(K, T, precision="highest")[:, :3, :]  # [B,3,4]
    A = jnp.matmul(P[:, :, :3], inv_K[:, :3, :3], precision="highest")  # [B,3,3]
    rays = jnp.einsum("bij,jn->bin", A, pix, precision="highest")  # [B,3,HW]
    pts = rays * depth.reshape(B, 1, H * W) + P[:, :, 3:4]
    xy = pts[:, :2, :] / (pts[:, 2:3, :] + 1e-7)
    xy = xy.reshape(B, 2, H, W).transpose(0, 2, 3, 1)
    scale = jnp.asarray([W - 1, H - 1], dtype=xy.dtype)
    return (xy / scale - 0.5) * 2.0
