"""Skip-connected U-Net depth decoder, Flax.

Rebuild of the reference decoder (model_layer/depth_decoder.py:54-112):
5 up-stages with channels [16, 32, 64, 128, 256], nearest 2x upsampling,
encoder skip concatenation, reflection-padded 3x3 convs + ELU, and
sigmoid disparity heads at the requested scales.

TPU layout note: the public interface is NHWC (matching the encoder and
the loss stack), but the low-channel stages (i <= 2, C in {16, 32, 64})
internally run NCHW with the 3x3 conv expressed as 9 static-shift
einsums. With NHWC at full resolution, XLA:TPU puts C=16 on the
128-lane minor axis and every decoder activation/cotangent moves ~8x
its logical bytes — the profiler measured the full-res stages at
~57 GB/s effective HBM bandwidth vs the chip's ~819 (docs/PERF.md).
Keeping (H, W) on the (8, 128) vreg tile and contracting channels with
tiny matmuls is 2.6x faster fwd+bwd (tools/bench_decoder.py: 7.0 ms vs
18.2 ms for the stage-0 chain at 640x192 b12 bf16). The deep stages
(C >= 128, W/8 < 128) stay NHWC where full channel lanes beat padded
spatial lanes.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from monodepth_tpu.ops.sampling import upsample_nearest_2x

NUM_CH_DEC = (16, 32, 64, 128, 256)

# Stages at or below this index run the NCHW shift-einsum formulation.
# NUM_CH_DEC[i] <= 64 there, so NHWC lane occupancy is <= 50% while the
# stage widths (>= W/4) fill the 128-lane tile (see module docstring).
_NCHW_MAX_STAGE = 2


class _ShiftConv3x3(nn.Module):
    """3x3 VALID conv on a reflect-padded NCHW input via 9 static-shift
    einsums: out[b,o,h,w] = sum_{c,dy,dx} k[dy,dx,c,o] * xp[b,c,h+dy,w+dx].

    Parameter-compatible with `nn.Conv` (kernel HWIO [3,3,Cin,Cout] +
    bias [Cout], identical initializers), so checkpoints, the torch
    weight converter, and the per-module npz export are layout-agnostic.
    Each shift is a static slice (no data movement off the vreg tile)
    plus a [Cin,Cout] x [B,Cin,H,W] dot_general contracting Cin — the
    channel contraction is a tiny matmul XLA keeps resident while the
    spatial dims stream through the (8, 128) tile.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):  # xp: [B, Cin, H+2, W+2]
        cin = xp.shape[1]
        # Initializers come from nn.Conv's own defaults so the two layouts
        # can never silently initialize differently (the parameter trees
        # are interchangeable — test_depth_decoder_nchw_matches_nhwc).
        kernel = self.param("kernel", nn.linear.default_kernel_init,
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        x = xp.astype(self.dtype)
        k = kernel.astype(self.dtype)
        b_, c, hp, wp = xp.shape
        # Accumulate the 9 taps in f32 so the whole contraction rounds
        # ONCE, matching nn.Conv's f32 conv accumulation — otherwise the
        # bf16 train path (NCHW) and eval path (NHWC, use_nchw=train)
        # would disagree by several ulps per tap on shared params. Also
        # FASTER: skipping the per-tap bf16 round-trips took the step
        # from 94 to 88 ms (127.8 -> 136.1 img/s, bench.py).
        out = None
        for dy in range(3):
            for dx in range(3):
                win = lax.slice(x, (0, 0, dy, dx),
                                (b_, c, dy + hp - 2, dx + wp - 2))
                t = jnp.einsum(
                    "co,bchw->bohw", k[dy, dx], win,
                    preferred_element_type=jnp.promote_types(
                        jnp.float32, self.dtype))
                out = t if out is None else out + t
        return (out.astype(self.dtype)
                + bias.astype(self.dtype)[None, :, None, None])


class Conv3x3(nn.Module):
    """Reflection-pad(1) + 3x3 VALID conv (reference: depth_decoder.py:36-50).

    `nchw=True` takes/returns NCHW and computes via `_ShiftConv3x3`;
    both layouts share the same parameter tree (HWIO kernel under
    "conv")."""

    features: int
    dtype: Any = jnp.float32
    nchw: bool = False

    @nn.compact
    def __call__(self, x):
        if self.nchw:
            xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
            return _ShiftConv3x3(self.features, self.dtype, name="conv")(xp)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.Conv(self.features, (3, 3), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU (reference: depth_decoder.py:18-32)."""

    features: int
    dtype: Any = jnp.float32
    nchw: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.elu(Conv3x3(self.features, self.dtype, self.nchw,
                              name="conv")(x))


def _upsample_nearest_2x_nchw(x):
    """NCHW twin of ops.sampling.upsample_nearest_2x."""
    return x.repeat(2, axis=2).repeat(2, axis=3)


class DepthDecoder(nn.Module):
    """Encoder pyramid (NHWC) -> {scale: sigmoid disparity [B, H/2^s, W/2^s, 1]}.

    Stage i (4..0): upconv_i_0 -> nearest x2 -> concat skip(enc[i-1]) ->
    upconv_i_1; dispconv_s head after stage s
    (reference: depth_decoder.py:96-112). Stages i <= 2 run NCHW
    internally (see module docstring); `nchw_low_stages=False` forces
    the plain NHWC formulation everywhere (same math, same params).
    """

    scales: Tuple[int, ...] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = jnp.float32
    nchw_low_stages: bool = True

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray],
                 use_nchw: bool | None = None) -> Dict[int, jnp.ndarray]:
        # The NCHW win is all in the BACKWARD (cotangent/pad-backward
        # traffic of the low-channel full-res stages); forward-only it
        # LOSES (b16 infer 21.8 vs 16.2 ms, tools/diag_infer_ab.py), so
        # callers pass use_nchw=train and inference stays NHWC.
        if use_nchw is None:
            use_nchw = self.nchw_low_stages
        outputs: Dict[int, jnp.ndarray] = {}
        x = features[-1]
        in_nchw = False
        for i in range(4, -1, -1):
            nchw = (self.nchw_low_stages and use_nchw
                    and i <= _NCHW_MAX_STAGE)
            if nchw and not in_nchw:
                x = x.transpose(0, 3, 1, 2)
                in_nchw = True
            x = ConvBlock(NUM_CH_DEC[i], self.dtype, nchw,
                          name=f"upconv_{i}_0")(x)
            x = (_upsample_nearest_2x_nchw(x) if nchw
                 else upsample_nearest_2x(x))
            if self.use_skips and i > 0:
                skip = features[i - 1].astype(x.dtype)
                if nchw:
                    skip = skip.transpose(0, 3, 1, 2)
                x = jnp.concatenate([x, skip], axis=1 if nchw else -1)
            x = ConvBlock(NUM_CH_DEC[i], self.dtype, nchw,
                          name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disp = Conv3x3(self.num_output_channels, self.dtype, nchw,
                               name=f"dispconv_{i}")(x)
                if nchw:
                    disp = disp.transpose(0, 2, 3, 1)
                # disparity head in >= f32: sigmoid saturation is
                # precision-sensitive (f64 under the lockstep parity tests)
                outputs[i] = nn.sigmoid(disp.astype(
                    jnp.promote_types(jnp.float32, disp.dtype)))
        return outputs
