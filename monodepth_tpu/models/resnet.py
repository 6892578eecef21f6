"""Flax ResNet encoder for depth/pose, NHWC, bf16-friendly.

Rebuild of the reference's torchvision-based encoder
(reference: model_layer/depth_encoder.py:14-101): ResNet-{18,34,50,101,152}
returning the 5-level feature pyramid
[relu1, layer1, layer2, layer3, layer4] with channels [64,64,128,256,512]
(x4 from layer1 up for depths >= 50). Supports multi-image input by
widening conv1 to `num_input_images * 3` channels; ImageNet conv1 weights
are tiled and averaged on import (utils/torch_import.py), matching the
reference's rule (depth_encoder.py:59).

Inputs are normalized (x - 0.45) / 0.225 inside the module
(depth_encoder.py:93). Parameter/submodule names mirror torchvision's
state_dict layout (conv1, bn1, layer1.0.conv2, ...) so the weight
importer is a mechanical rename.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# stage-depths and block type per torchvision resnet variant
STAGES = {
    18: ((2, 2, 2, 2), "basic"),
    34: ((3, 4, 6, 3), "basic"),
    50: ((3, 4, 6, 3), "bottleneck"),
    101: ((3, 4, 23, 3), "bottleneck"),
    152: ((3, 8, 36, 3), "bottleneck"),
}

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def num_ch_enc(num_layers: int) -> np.ndarray:
    """Encoder pyramid channel counts (reference: depth_encoder.py:73, 88-89)."""
    ch = np.array([64, 64, 128, 256, 512])
    if num_layers > 34:
        ch[1:] *= 4
    return ch


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    kernel_init=_KAIMING, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.bn_axis_name, name="bn")(x)
        return x


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = _ConvBN(self.features, 3, self.stride, self.dtype,
                      self.bn_axis_name, name="cb1")(x, train)
        out = nn.relu(out)
        out = _ConvBN(self.features, 3, 1, self.dtype,
                      self.bn_axis_name, name="cb2")(out, train)
        if self.downsample:
            identity = _ConvBN(self.features, 1, self.stride, self.dtype,
                               self.bn_axis_name, name="downsample")(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = nn.relu(_ConvBN(self.features, 1, 1, self.dtype,
                              self.bn_axis_name, name="cb1")(x, train))
        out = nn.relu(_ConvBN(self.features, 3, self.stride, self.dtype,
                              self.bn_axis_name, name="cb2")(out, train))
        out = _ConvBN(self.features * 4, 1, 1, self.dtype,
                      self.bn_axis_name, name="cb3")(out, train)
        if self.downsample:
            identity = _ConvBN(self.features * 4, 1, self.stride, self.dtype,
                               self.bn_axis_name, name="downsample")(x, train)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """5-level feature pyramid encoder. Input: [B, H, W, 3*num_input_images]
    in [0, 1]; returns features at strides [2, 4, 8, 16, 32]."""

    num_layers: int = 18
    num_input_images: int = 1
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None  # set to mesh axis for cross-device sync-BN
    remat: bool = False  # rematerialize residual blocks (high-res memory)

    @property
    def num_ch_enc(self) -> np.ndarray:
        return num_ch_enc(self.num_layers)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        if self.num_layers not in STAGES:
            raise ValueError(f"{self.num_layers} is not a valid resnet depth")
        depths, block_name = STAGES[self.num_layers]
        block = BasicBlock if block_name == "basic" else Bottleneck
        if self.remat:
            # recompute each residual block in the backward pass instead
            # of storing its activations — trades ~30% extra FLOPs for
            # fitting high-res batches in HBM (e.g. 1024x320 b12 on v5e)
            # argnums include the module instance: (self, x, train)
            block = nn.remat(block, static_argnums=(2,))

        x = (x - 0.45) / 0.225  # reference: depth_encoder.py:93
        x = x.astype(self.dtype)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=_KAIMING, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.bn_axis_name, name="bn1")(x)
        f0 = nn.relu(x)

        x = nn.max_pool(f0, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        features = [f0]
        widths = (64, 128, 256, 512)
        for stage, (depth, width) in enumerate(zip(depths, widths), start=1):
            for i in range(depth):
                stride = 2 if (stage > 1 and i == 0) else 1
                expansion = 1 if block_name == "basic" else 4
                needs_ds = (i == 0) and (stride != 1 or
                                         x.shape[-1] != width * expansion)
                x = block(width, stride, needs_ds, self.dtype,
                          self.bn_axis_name,
                          name=f"layer{stage}_{i}")(x, train)
            features.append(x)
        return features
