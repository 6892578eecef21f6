"""Monodepth model wiring: depth net + pose net under one Flax module.

Reproduces the reference's three pose wirings (SURVEY.md §2.2; reference:
model_tool/loader.py:70-96, model_tool/processor.py:33-136):

- ``separate``: dedicated 2-image pose ResNet encoder + PoseDecoder
- ``shared``:   depth-encoder features reused for pose; all frames are
                batch-concatenated through one encoder pass then split
- ``posecnn``:  PoseCNN on channel-stacked raw frames

plus the ``pose_frames == "all"`` variants (one joint pass over every
temporal frame; processor.py:116-135). Pose pairs follow the reference
ordering: past frame f<0 pairs as [f, 0] with an inverted transform,
future f>0 pairs as [0, f] (processor.py:58-114). In "all" mode the
reference never inverts (processor.py:130-135) — reproduced; the training
step asks `invert_for_frame` for the right rule.

Inputs are a stacked tensor `frames [B, F, H, W, 3]` (augmented color at
scale 0) whose F axis follows `frame_ids` order — static indexing keeps
everything jit-traceable with no dict-key gymnastics.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from monodepth_tpu.models.depth_decoder import DepthDecoder
from monodepth_tpu.models.pose_decoder import PoseCNN, PoseDecoder
from monodepth_tpu.models.resnet import ResNetEncoder

FrameId = Union[int, str]


class Monodepth(nn.Module):
    num_layers: int = 18
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    frame_ids: Tuple[FrameId, ...] = (0, -1, 1)
    pose_type: str = "separate"
    pose_frames: Union[int, str] = 2
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None
    remat: bool = False
    nchw_decoder: bool = True  # --nchw_decoder: train-time NCHW low-stage
                               # decoder layout (depth_decoder.py docstring)

    @property
    def temporal_ids(self) -> Tuple[int, ...]:
        return tuple(f for f in self.frame_ids if f != "s")

    @property
    def num_pose_frames(self) -> int:
        return len(self.temporal_ids) if self.pose_frames == "all" else 2

    def invert_for_frame(self, frame_id: int) -> bool:
        """Whether the predicted transform must be inverted at warp time.

        In "all" mode no transform is inverted: the joint pass predicts
        each source->target motion directly (reference processor.py:131-135
        builds every c2c with param2matrix's default invert=False).
        DELIBERATE DEVIATION for posecnn+"all": the reference's warp loop
        (processor.py:153-157) rebuilds posecnn transforms from the stored
        FULL prediction with index 0 and invert=(frame_id<0) — in "all"
        mode that discards every per-frame prediction and warps all frames
        with slot 0, a bug (official Monodepth2 doesn't support the combo
        at all: its posecnn warp path KeyErrors in "all" mode). We use the
        per-frame predictions with no invert, consistent with
        shared/separate "all" semantics."""
        return self.pose_frames != "all" and frame_id < 0

    def setup(self):
        self.encoder = ResNetEncoder(self.num_layers, 1, self.dtype,
                                     self.bn_axis_name, self.remat)
        self.decoder = DepthDecoder(self.scales, dtype=self.dtype,
                                    nchw_low_stages=self.nchw_decoder)
        if self.pose_type == "posecnn":
            self.pose_decoder = PoseCNN(self.num_pose_frames, self.dtype)
        elif self.pose_type == "shared":
            self.pose_decoder = PoseDecoder(self.num_pose_frames,
                                            dtype=self.dtype)
        elif self.pose_type == "separate":
            self.pose_encoder = ResNetEncoder(self.num_layers,
                                              self.num_pose_frames,
                                              self.dtype, self.bn_axis_name,
                                              self.remat)
            # reference always predicts 2 frames here (loader.py:85-86)
            self.pose_decoder = PoseDecoder(1, 2, dtype=self.dtype)
        else:
            raise ValueError(f"unknown pose_type {self.pose_type!r}")

    def depth(self, image, train: bool = False) -> Dict[int, jnp.ndarray]:
        """Depth-only forward (eval path; reference: model_test.py:80)."""
        return self.decoder(self.encoder(image, train), use_nchw=train)

    def _frame(self, frames, frame_id: FrameId):
        return frames[:, self.frame_ids.index(frame_id)]

    def __call__(self, frames, train: bool = False):
        """frames: [B, F, H, W, 3] -> (disps {scale: [B,h,w,1]},
        poses {frame_id: (axisangle [B,3], translation [B,3])})."""
        B = frames.shape[0]
        shared_features = None

        if self.pose_type == "shared":
            # batch-concat all frames through one encoder pass, then split
            # (reference: processor.py:41-49)
            stacked = frames.transpose(1, 0, 2, 3, 4).reshape(
                -1, *frames.shape[2:])
            feats = self.encoder(stacked, train)
            shared_features = {
                fid: [f.reshape(len(self.frame_ids), B, *f.shape[1:])[i]
                      for f in feats]
                for i, fid in enumerate(self.frame_ids)}
            disps = self.decoder(shared_features[0], use_nchw=train)
        else:
            disps = self.decoder(
                self.encoder(self._frame(frames, 0), train), use_nchw=train)

        poses = self._forward_pose(frames, shared_features, train)
        return disps, poses

    def _forward_pose(self, frames, shared_features, train: bool):
        sources = [f for f in self.frame_ids[1:] if f != "s"]
        poses: Dict[int, Tuple[jnp.ndarray, jnp.ndarray]] = {}

        if self.num_pose_frames == 2:
            for fid in sources:
                if fid < 0:
                    pair = (fid, 0)
                else:
                    pair = (0, fid)
                if self.pose_type == "posecnn":
                    x = jnp.concatenate([self._frame(frames, p) for p in pair],
                                        axis=-1)
                    aa, t = self.pose_decoder(x)
                elif self.pose_type == "shared":
                    aa, t = self.pose_decoder(
                        [shared_features[p] for p in pair])
                else:  # separate
                    x = jnp.concatenate([self._frame(frames, p) for p in pair],
                                        axis=-1)
                    aa, t = self.pose_decoder([self.pose_encoder(x, train)])
                poses[fid] = (aa[:, 0, 0], t[:, 0, 0])
        else:  # pose_frames == "all": one joint pass (processor.py:116-135)
            if self.pose_type == "posecnn":
                x = jnp.concatenate(
                    [self._frame(frames, f) for f in self.temporal_ids], axis=-1)
                aa, t = self.pose_decoder(x)
            elif self.pose_type == "shared":
                aa, t = self.pose_decoder(
                    [shared_features[f] for f in self.temporal_ids])
            else:
                x = jnp.concatenate(
                    [self._frame(frames, f) for f in self.temporal_ids], axis=-1)
                aa, t = self.pose_decoder([self.pose_encoder(x, train)])
            for index, fid in enumerate(sources):
                poses[fid] = (aa[:, index, 0], t[:, index, 0])
        return poses
