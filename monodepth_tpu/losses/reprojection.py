"""Monodepth2 loss assembly: per-pixel minimum reprojection with
auto-masking + edge-aware smoothness, NHWC, pure jnp.

Exact semantics of the reference assembly (model_tool/processor.py:166-218,
documented in SURVEY.md §2.3):

  per scale s in scales:
    1. reprojection error of each full-res warped source vs the full-res
       target, concatenated along channels
    2. auto-masking: identity reprojection error of each *unwarped* source
       vs the target, plus 1e-5 * N(0,1) tie-breaking noise
    3. per-pixel min over all (identity + reprojection) channels -> mean
    4. + disp_smoothness * smooth(disp_s, color_s) / 2^s
  total = mean over scales

The identity term does not depend on the scale; the reference recomputes
it every scale (processor.py:186-191) — we hoist it out of the loop and
only redraw the tie-break noise per scale, which is numerically identical
in distribution and saves 3 redundant SSIM passes per step.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp

from monodepth_tpu.losses.smoothness import smooth_loss
from monodepth_tpu.ops.ssim import reprojection_error

Array = jax.Array


def min_reprojection(reproj: Array, identity: Array | None, rng) -> Array:
    """Per-pixel minimum over reprojection (+ noisy identity) channels.

    reproj: [B, H, W, F]; identity: [B, H, W, F] or None (automask off).
    Returns [B, H, W] (reference: model_tool/processor.py:194-204).
    """
    if identity is None:
        combined = reproj
    else:
        noise = 1e-5 * jax.random.normal(rng, identity.shape, identity.dtype)
        combined = jnp.concatenate([identity + noise, reproj], axis=-1)
    if combined.shape[-1] == 1:
        return combined[..., 0]
    return combined.min(axis=-1)


def monodepth_loss(
    disp_pyramid: Mapping[int, Array],
    warped_colors: Mapping[int, Sequence[Array]],
    source_colors: Sequence[Array],
    color_pyramid: Sequence[Array],
    rng,
    *,
    scales: Sequence[int] = (0, 1, 2, 3),
    disp_smoothness: float = 1e-3,
    use_automasking: bool = True,
) -> tuple[Array, dict]:
    """Assemble the total training loss.

    disp_pyramid:   scale -> [B, H/2^s, W/2^s, 1] sigmoid disparity
    warped_colors:  scale -> per-source-frame full-res warps [B, H, W, 3]
    source_colors:  per-source-frame full-res *unwarped* colors [B, H, W, 3]
    color_pyramid:  scale -> target color at that scale (index 0 = full res)
    Photometric error is the jnp SSIM+L1 (ops/ssim.py) — XLA fuses this
    VPU-bound elementwise class optimally (a Pallas version only matched
    it, 0.72 vs 0.76 ms; docs/PERF.md).
    Returns (scalar loss, aux dict of per-scale terms).
    """
    target = color_pyramid[0]

    identity = None
    if use_automasking:
        identity = jnp.concatenate(
            [reprojection_error(src, target) for src in source_colors],
            axis=-1)

    aux = {}
    total = 0.0
    for scale in scales:
        reproj = jnp.concatenate(
            [reprojection_error(w, target) for w in warped_colors[scale]],
            axis=-1)
        rng, sub = jax.random.split(rng)
        photometric = min_reprojection(reproj, identity, sub).mean()

        smooth = smooth_loss(disp_pyramid[scale], color_pyramid[scale])
        scale_loss = photometric + disp_smoothness * smooth / (2 ** scale)

        aux[f"photometric/{scale}"] = photometric
        aux[f"smooth/{scale}"] = smooth
        total = total + scale_loss

    total = total / len(scales)
    return total, aux
