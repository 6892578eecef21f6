"""Pallas TPU kernel: fused SSIM + L1 photometric (reprojection) error.

The BASELINE north-star names this the hot custom kernel: the reference
computes SSIM with five 3x3 average pools + a dozen elementwise passes
(reference: model_loss/model_loss.py:11-41, 92-103), which even after XLA
fusion reads/writes several [B,H,W,C] intermediates in HBM. This kernel
computes the complete per-pixel error

    0.85 * mean_c(clip((1 - SSIM)/2, 0, 1)) + 0.15 * mean_c(|t - p|)

in ONE pass over VMEM per image: both inputs stream in once, all five
box filters are shifted adds on the VPU, and only the [H, W] error map
goes back to HBM — an ~8x cut in HBM traffic for this op. (In the full
train/eval steps the end-to-end margin is small because the warp
gathers dominate both; see training/step.py `_loss_fns` and CLAUDE.md.)

Layout: NHWC inputs are transposed to planar [B, C, H, W] and the kernel
runs on a (B, C) grid — each invocation sees one [H, W] channel plane
with W on the lane axis, so the 3x3 box filter is six static-slice adds
(reflect-pad halos are static slices too). Channels are consecutive grid
steps writing the same [H, W] output block: c == 0 initializes, c > 0
accumulates the channel mean. No transpose inside the kernel, no gather.

Backward: `jax.custom_vjp` whose bwd re-derives gradients through the
pure-jnp reference implementation (ops/ssim.py) — numerically identical
(the kernel matches the jnp forward to <1e-6) and keeps the kernel
forward-only. The VMEM working set is one [H, W] channel plane plus ~8
same-shape temporaries; planes beyond `MAX_PLANE_ELEMENTS` fall back to
the jnp path (the caller checks `pallas_supported`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from monodepth_tpu.ops.ssim import reprojection_error as _jnp_reprojection_error

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2

# STATUS (round 2): retired from the training/eval step. Measured on
# v5e-1 at 640x192 b4: kernel 0.72 ms vs jnp 0.76 ms — XLA already
# fuses the five box filters well, so the kernel's win is ~5% of a
# sub-millisecond op (invisible end-to-end); at 1024x320 the full-plane
# block fails Mosaic compilation (internal error). Kept as a tested
# reference kernel; the step uses the jnp path everywhere
# (training/step.py). The warp sampler (warp_sample.py) is where Pallas
# actually pays.
MAX_ELEMENTS = 192 * 640 * 3


def pallas_supported(height: int, width: int, channels: int = 3) -> bool:
    return height * width * channels <= MAX_ELEMENTS


def _box3(x: jnp.ndarray, C: int) -> jnp.ndarray:
    """3x3 box *sum* over an [H, W*C] channel-interleaved image with
    reflect padding (matches the reference's reflection-padded AvgPool,
    model_loss.py:17-25). Pure static slices -> VPU shifts."""
    # vertical: reflect rows 1 and H-2
    x = jnp.concatenate([x[1:2], x, x[-2:-1]], axis=0)
    x = x[:-2] + x[1:-1] + x[2:]
    # horizontal: neighbor pixel is C lanes away in W*C layout
    x = jnp.concatenate([x[:, C:2 * C], x, x[:, -2 * C:-C]], axis=1)
    return x[:, :-2 * C] + x[:, C:-C] + x[:, 2 * C:]


def _kernel(pred_ref, targ_ref, out_ref, *, C: int):
    from jax.experimental import pallas as pl

    x = pred_ref[0, 0]  # [H, W], one channel
    y = targ_ref[0, 0]

    ninth = 1.0 / 9.0
    mu_x = _box3(x, 1) * ninth
    mu_y = _box3(y, 1) * ninth
    sigma_x = _box3(x * x, 1) * ninth - mu_x * mu_x
    sigma_y = _box3(y * y, 1) * ninth - mu_y * mu_y
    sigma_xy = _box3(x * y, 1) * ninth - mu_x * mu_y

    num = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    den = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    dist = jnp.clip((1.0 - num / den) * 0.5, 0.0, 1.0)

    err = (0.85 * dist + 0.15 * jnp.abs(y - x)) * (1.0 / C)

    # channels are consecutive grid steps on the same output block:
    # initialize at c == 0, accumulate the channel mean after
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        out_ref[0] = err

    @pl.when(c > 0)
    def _acc():
        out_ref[0] += err


@functools.partial(jax.jit, static_argnames=("interpret",))
def _forward(pred: jnp.ndarray, target: jnp.ndarray,
             interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl

    B, H, W, C = pred.shape
    # planar [B, C, H, W] puts W on the lane axis per channel block
    x = pred.astype(jnp.float32).transpose(0, 3, 1, 2)
    y = target.astype(jnp.float32).transpose(0, 3, 1, 2)

    out = pl.pallas_call(
        functools.partial(_kernel, C=C),
        grid=(B, C),
        in_specs=[pl.BlockSpec((1, 1, H, W), lambda b, c: (b, c, 0, 0)),
                  pl.BlockSpec((1, 1, H, W), lambda b, c: (b, c, 0, 0))],
        out_specs=pl.BlockSpec((1, H, W), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        interpret=interpret,
    )(x, y)
    return out[..., None]  # [B, H, W, 1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_reprojection_error(prediction, target, interpret: bool = False):
    """Drop-in Pallas replacement for ops.ssim.reprojection_error
    (same [B, H, W, 1] output). `interpret=True` runs the kernel in
    interpreter mode (CPU tests)."""
    return _forward(prediction, target, interpret)


def _fwd(prediction, target, interpret):
    return _forward(prediction, target, interpret), (prediction, target)


def _bwd(interpret, res, g):
    prediction, target = res
    _, vjp = jax.vjp(_jnp_reprojection_error, prediction, target)
    return vjp(g)


fused_reprojection_error.defvjp(_fwd, _bwd)
