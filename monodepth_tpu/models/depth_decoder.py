"""Skip-connected U-Net depth decoder, NHWC Flax.

Rebuild of the reference decoder (model_layer/depth_decoder.py:54-112):
5 up-stages with channels [16, 32, 64, 128, 256], nearest 2x upsampling,
encoder skip concatenation, reflection-padded 3x3 convs + ELU, and
sigmoid disparity heads at the requested scales.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from monodepth_tpu.ops.sampling import upsample_nearest_2x

NUM_CH_DEC = (16, 32, 64, 128, 256)


class Conv3x3(nn.Module):
    """Reflection-pad(1) + 3x3 VALID conv (reference: depth_decoder.py:36-50)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.Conv(self.features, (3, 3), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU (reference: depth_decoder.py:18-32)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.elu(Conv3x3(self.features, self.dtype, name="conv")(x))


class DepthDecoder(nn.Module):
    """Encoder pyramid -> {scale: sigmoid disparity [B, H/2^s, W/2^s, 1]}.

    Stage i (4..0): upconv_i_0 -> nearest x2 -> concat skip(enc[i-1]) ->
    upconv_i_1; dispconv_s head after stage s
    (reference: depth_decoder.py:96-112).
    """

    scales: Tuple[int, ...] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]) -> Dict[int, jnp.ndarray]:
        outputs: Dict[int, jnp.ndarray] = {}
        x = features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(NUM_CH_DEC[i], self.dtype, name=f"upconv_{i}_0")(x)
            x = upsample_nearest_2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, features[i - 1].astype(x.dtype)], axis=-1)
            x = ConvBlock(NUM_CH_DEC[i], self.dtype, name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disp = Conv3x3(self.num_output_channels, self.dtype,
                               name=f"dispconv_{i}")(x)
                # disparity head in f32: sigmoid saturation is precision-sensitive
                outputs[i] = nn.sigmoid(disp.astype(jnp.float32))
        return outputs
