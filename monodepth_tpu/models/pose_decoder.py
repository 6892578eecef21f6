"""Pose regressors: feature-pyramid PoseDecoder and image-space PoseCNN.

Rebuilds of reference model_layer/pose_decoder.py:13-98. Both emit
(axisangle, translation) of shape [B, num_frames_to_predict_for, 1, 3],
scaled by 0.01 (pose_decoder.py:53, 93).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class PoseDecoder(nn.Module):
    """Encoder feature pyramids -> relative pose(s).

    num_input_features: how many encoder pyramids are passed in (1 for the
    `separate` wiring on a concatenated pair, 2 for `shared`).
    num_frames_to_predict_for: defaults to num_input_features - 1
    (reference: pose_decoder.py:25-27).
    """

    num_input_features: int
    num_frames_to_predict_for: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features: Sequence[Sequence[jnp.ndarray]]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        num_frames = (self.num_frames_to_predict_for
                      if self.num_frames_to_predict_for is not None
                      else self.num_input_features - 1)

        last = [f[-1] for f in input_features]
        # ONE shared squeeze conv applied to every pyramid
        # (reference: pose_decoder.py:30, 42)
        squeeze = nn.Conv(256, (1, 1), dtype=self.dtype, name="squeeze")
        out = jnp.concatenate([nn.relu(squeeze(f)) for f in last], axis=-1)

        out = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                              dtype=self.dtype, name="pose_0")(out))
        out = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                              dtype=self.dtype, name="pose_1")(out))
        out = nn.Conv(6 * num_frames, (1, 1), dtype=self.dtype,
                      name="pose_2")(out)

        # global average in >= f32 (f64 under the lockstep parity tests)
        out = out.astype(jnp.promote_types(jnp.float32, out.dtype)
                         ).mean(axis=(1, 2))
        out = 0.01 * out.reshape(-1, num_frames, 1, 6)
        return out[..., :3], out[..., 3:]


class PoseCNN(nn.Module):
    """SfM-Learner-style pose regressor on channel-stacked raw frames
    (reference: pose_decoder.py:62-98).

    Note: the reference forgets the ReLU after its first conv
    (pose_decoder.py:86-89); we follow the official Monodepth2 PoseCNN
    (ReLU after every feature conv) — documented deviation.
    """

    num_input_frames: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        specs = [(16, 7, 2), (32, 5, 2), (64, 3, 2), (128, 3, 2),
                 (256, 3, 2), (256, 3, 2), (256, 3, 2)]
        x = x.astype(self.dtype)
        for i, (feat, k, s) in enumerate(specs):
            pad = (k - 1) // 2
            x = nn.Conv(feat, (k, k), strides=(s, s),
                        padding=[(pad, pad), (pad, pad)],
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(6 * (self.num_input_frames - 1), (1, 1),
                    dtype=self.dtype, name="pose_conv")(x)
        x = x.astype(jnp.promote_types(jnp.float32, x.dtype)
                     ).mean(axis=(1, 2))
        x = 0.01 * x.reshape(-1, self.num_input_frames - 1, 1, 6)
        return x[..., :3], x[..., 3:]
