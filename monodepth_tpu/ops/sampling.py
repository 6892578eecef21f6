"""Image sampling primitives: grid-sample, resizes, pyramids. NHWC, pure jnp.

The reference delegates these to torch C++/CUDA kernels
(`F.grid_sample` / `F.interpolate`, reference: model_layer/warp.py:12-25);
XLA has no grid-sample primitive, so we build one TPU-first:

- `grid_sample`: bilinear, border padding, align_corners=True — exact
  PyTorch semantics (clamp the continuous coordinate to [0, size-1],
  then blend the 4 clamped neighbors). The gather is expressed over a
  flattened H*W axis (one gather instead of two chained ones).
- `resize_bilinear`: separable resize as two matmuls against constant
  interpolation matrices -> runs on the MXU instead of gather units.
  Matches `F.interpolate(mode="bilinear")` for both align_corners modes
  (no antialiasing, like torch).
- `upsample_nearest_2x`: exact `F.interpolate(scale_factor=2, "nearest")`.
- `downsample_2x_avg`: area downsample used for the on-device color
  pyramid (see data/: the host ships only full-res frames).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def grid_sample(image: Array, grid: Array, method: str = "packed") -> Array:
    """Bilinear sample `image` at `grid`, border padding, align_corners=True.

    image: [B, H, W, C]; grid: [B, Ho, Wo, 2] with (x, y) in [-1, 1].
    Returns [B, Ho, Wo, C]. Matches
    `F.grid_sample(img, grid, padding_mode="border", align_corners=True)`
    (reference call site: model_layer/warp.py:12-14, model_tool/processor.py:161).

    TPU note — three exact variants, honest fwd+dgrid timings on v5e-1
    (tools/bench_gather.py, b12, f32; see CLAUDE.md "gather bottleneck"):
    - method="packed" (default): pre-materialize every 2x2xC patch as a
      [B, H*W, 4C] tensor (static shifts, cheap VPU work), then ONE flat
      gather whose (1, 1, 4C) slice spans the entire minor dim — output
      padding is ~128/(4C) ≈ 10x. 30.6 ms/warp at 640x192 (20.8 ns/idx),
      93.9 ms at 1024x320; soak-tested 300 hot iterations.
    - method="patch": ONE `lax.gather` of a 2x2xC patch per pixel; XLA
      pads the [*, 2, 2, C] output ~40x onto (8,128) tiles. 43.9 ms/warp
      at 640x192; the 7.5 GB transient cannot exist at 1024x320 b12.
    - method="scalar": 4 taps x C channels as scalar gathers with clean
      [B, Ho, Wo] layouts — no padding at all, but 224 ms/warp (640x192)
      / 649 ms (1024x320): per-index cost dominates, 12 single-element
      gathers lose to one 12-element gather.
    Clamping y0/x0 to size-2 with wy/wx in [0, 1] reproduces border
    padding exactly: a coordinate at the top border becomes
    (y0=H-2, wy=1).
    """
    B, H, W, C = image.shape
    dtype = image.dtype

    # Unnormalize: align_corners=True maps [-1,1] -> [0, size-1].
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    # Border padding: clamp the continuous coordinate (PyTorch clip_coordinates).
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    # anchor in [0, size-2] so the 2x2 patch is in bounds; weights in [0,1]
    x0 = jnp.clip(jnp.floor(x), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2)
    wx = (x - x0).astype(dtype)[..., None]
    wy = (y - y0).astype(dtype)[..., None]
    # INT-side clamp: a NaN coordinate (e.g. a diverged training step)
    # survives the float clips and casts to an undefined int — which the
    # PROMISE_IN_BOUNDS gathers below would dereference out of bounds
    # (a TPU worker fault). Clamp after the cast; NaN weights still
    # propagate NaN to the output (torch-like garbage-in/NaN-out).
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 2)

    Ho, Wo = grid.shape[1], grid.shape[2]
    if method == "patch":
        starts = jnp.stack([y0.reshape(B, -1), x0.reshape(B, -1)],
                           axis=-1).astype(jnp.int32)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4), collapsed_slice_dims=(),
            start_index_map=(1, 2), operand_batching_dims=(0,),
            start_indices_batching_dims=(0,))
        patches = jax.lax.gather(
            image, starts, dn, slice_sizes=(1, 2, 2, C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            indices_are_sorted=False, unique_indices=False)
        patches = patches.reshape(B, Ho, Wo, 2, 2, C)
        v00, v01 = patches[..., 0, 0, :], patches[..., 0, 1, :]
        v10, v11 = patches[..., 1, 0, :], patches[..., 1, 1, :]
    elif method == "packed":
        # every (y, x) anchor's 2x2xC patch, contiguous on the minor dim;
        # anchors are clamped to (H-2, W-2) so the edge-replicated rows/
        # cols of the shifts are never addressed
        right = jnp.concatenate([image[:, :, 1:], image[:, :, -1:]], axis=2)
        down = jnp.concatenate([image[:, 1:], image[:, -1:]], axis=1)
        downright = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
        packed = jnp.concatenate([image, right, down, downright],
                                 axis=-1).reshape(B, H * W, 4 * C)
        starts = (y0 * W + x0).astype(jnp.int32).reshape(B, -1, 1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(1,),
            start_index_map=(1,), operand_batching_dims=(0,),
            start_indices_batching_dims=(0,))
        flat = jax.lax.gather(
            packed, starts, dn, slice_sizes=(1, 1, 4 * C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            indices_are_sorted=False, unique_indices=False)
        quad = flat.reshape(B, Ho, Wo, 4, C)
        v00, v01 = quad[..., 0, :], quad[..., 1, :]
        v10, v11 = quad[..., 2, :], quad[..., 3, :]
    else:  # "scalar"
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(1, 2),
            start_index_map=(1, 2), operand_batching_dims=(0,),
            start_indices_batching_dims=(0,))

        def take(yi, xi):
            starts = jnp.stack([yi, xi], axis=-1)
            chans = [jax.lax.gather(
                image[..., c], starts, dn, slice_sizes=(1, 1, 1),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                for c in range(C)]
            return jnp.stack(chans, axis=-1)

        v00 = take(y0i, x0i)
        v01 = take(y0i, x0i + 1)
        v10 = take(y0i + 1, x0i)
        v11 = take(y0i + 1, x0i + 1)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top + (bot - top) * wy


@functools.lru_cache(maxsize=None)
def _linear_resize_matrix(in_size: int, out_size: int,
                          align_corners: bool) -> np.ndarray:
    """[out, in] row-stochastic bilinear interpolation matrix (no antialias,
    torch `F.interpolate` coordinate conventions)."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = src - lo
    # keep f64: the caller casts to the compute dtype (f32/bf16 in
    # production; exact weights matter for the f64 lockstep parity tests)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), 1.0 - w)
    np.add.at(mat, (rows, hi), w)
    return mat


def resize_bilinear(image: Array, height: int, width: int,
                    align_corners: bool = False) -> Array:
    """Separable bilinear resize as two MXU matmuls.

    Matches `F.interpolate(x, [height, width], mode="bilinear",
    align_corners=...)` (reference call sites: model_tool/processor.py:142,
    model_loss/model_metric.py:87-88). image: [B, H, W, C].
    """
    B, H, W, C = image.shape
    if (H, W) == (height, width):
        return image
    dtype = image.dtype
    Rh = jnp.asarray(_linear_resize_matrix(H, height, align_corners), dtype)
    Rw = jnp.asarray(_linear_resize_matrix(W, width, align_corners), dtype)
    # precision="highest": keep f32 interpolation weights exact on the MXU
    # (TPU matmuls default to bf16 inputs); this path is parity-critical
    # (metric resize to 375x1242) and tiny next to the conv FLOPs.
    out = jnp.einsum("oh,bhwc->bowc", Rh, image, precision="highest")
    out = jnp.einsum("ow,bhwc->bhoc", Rw, out, precision="highest")
    return out


def upsample_nearest_2x(image: Array) -> Array:
    """Exact `F.interpolate(x, scale_factor=2, mode="nearest")`
    (reference: model_layer/depth_decoder.py:13-14): each pixel repeats 2x2."""
    return image.repeat(2, axis=1).repeat(2, axis=2)


def downsample_2x_avg(image: Array) -> Array:
    """2x2 area (average) downsample, used to build the on-device color
    pyramid for the smoothness loss. The reference instead re-resizes the
    PIL image per scale on the host (kitti_mono.py:287-290); an area
    pyramid is the TPU-native equivalent and keeps host IO 4x smaller."""
    B, H, W, C = image.shape
    x = image.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.mean(axis=(2, 4))


def pyramid(image: Array, num_scales: int) -> list[Array]:
    """[full, /2, /4, ...] — `num_scales` levels."""
    out = [image]
    for _ in range(num_scales - 1):
        out.append(downsample_2x_avg(out[-1]))
    return out
