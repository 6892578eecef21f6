"""Export predicted camera trajectories (odometry) as poses.npy.

    python tools/export_poses.py --datapath ./dataset/kitti \
        --splits ./splits --datatype kitti_eigen_zhou --split test \
        --weights ./model_save/mono:24 --out poses.npy

Runs the pose network over consecutive frame pairs of each drive in the
split and chains the relative SE(3) transforms into global
camera-to-world poses, saved as [N, 4, 4] float32 — the artifact format
the reference ships as `model_save/official_monostereo/poses.npy`
(1590x4x4; SURVEY.md §2.1 "Shipped artifacts").
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monodepth_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()


def main():
    import jax
    import numpy as np

    from monodepth_tpu.config import Config
    from monodepth_tpu.data import kitti
    from monodepth_tpu.data.dataset import KittiDataset
    from monodepth_tpu.evaluation.eigen import state_from_modules
    from monodepth_tpu.ops.geometry import transform_from_parameters
    from monodepth_tpu.training.state import build_model

    p = argparse.ArgumentParser(description="pose (odometry) export")
    p.add_argument("--datapath", default="./dataset/kitti", type=str)
    p.add_argument("--splits", default="./splits", type=str)
    p.add_argument("--datatype", default="kitti_eigen_zhou", type=str)
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--weights", required=True, help="<dir>:<epoch>")
    p.add_argument("--num_layers", default=18, type=int)
    p.add_argument("--height", default=192, type=int)
    p.add_argument("--width", default=640, type=int)
    p.add_argument("--scales", default=None,
                   type=lambda t: tuple(int(x) for x in t.replace(",", " ").split()),
                   help="training scales of the checkpoint; default: "
                        "auto-detected from the decoder export")
    p.add_argument("--pose_type", default="separate",
                   choices=["separate", "shared", "posecnn"])
    p.add_argument("--batch", default=16, type=int)
    p.add_argument("--out", default="poses.npy", type=str)
    args = p.parse_args()

    from monodepth_tpu.evaluation.eigen import (
        detect_scales,
        parse_weights_spec,
    )

    directory, epoch = parse_weights_spec(args.weights)
    scales = (args.scales or detect_scales(directory, epoch)
              or (0, 1, 2, 3))
    # frame_ids=(0, 1): one pose pair per forward — poses[1] then indexes
    # the second frame explicitly (the default (0,-1,1) would also run a
    # discarded poses[-1] forward and rely on index clamping)
    cfg = Config(datapath=args.datapath, splits=args.splits,
                 datatype=args.datatype, num_layers=args.num_layers,
                 height=args.height, width=args.width, scales=scales,
                 pose_type=args.pose_type, weight_init=False,
                 frame_ids=(0, 1))
    state = state_from_modules(cfg, directory, epoch)
    model = build_model(cfg)

    lines = kitti.readlines(os.path.join(
        cfg.splits, cfg.datatype, f"{args.split}_files.txt"))
    # consecutive pairs within each drive/side, in frame order
    keyed = sorted((kitti.parse_split_line(line) for line in lines),
                   key=lambda t: (t[0], t[2], t[1]))
    pairs = [(f0, i0, s0) for (f0, i0, s0), (f1, i1, s1)
             in zip(keyed, keyed[1:]) if f0 == f1 and s0 == s1 and i1 == i0 + 1]
    if not pairs:
        raise SystemExit("no consecutive frame pairs in this split")

    dataset = KittiDataset(cfg.datapath, lines, is_training=False,
                           frame_ids=(0, 1), height=cfg.height,
                           width=cfg.width, load_depth=False)

    @jax.jit
    def pose_step(images):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        _, poses = model.apply(variables, images, train=False)
        aa, t = poses[1]
        return transform_from_parameters(aa, t, invert=False)

    relatives = []
    frames = np.empty((args.batch, 2, cfg.height, cfg.width, 3), np.uint8)
    for start in range(0, len(pairs), args.batch):
        chunk = pairs[start:start + args.batch]
        for j, (folder, index, side) in enumerate(chunk):
            frames[j, 0] = dataset._load_image(folder, index, side, False)
            frames[j, 1] = dataset._load_image(folder, index + 1, side, False)
        images = frames.astype(np.float32) / 255.0
        out = np.asarray(pose_step(images))
        relatives.append(out[: len(chunk)])
    relatives = np.concatenate(relatives)

    # chain camera-to-camera transforms into global poses
    poses = [np.eye(4, dtype=np.float32)]
    for rel in relatives:
        poses.append(poses[-1] @ np.linalg.inv(rel))
    poses = np.stack(poses).astype(np.float32)
    np.save(args.out, poses)
    print(f"{len(poses)} poses -> {args.out} (shape {poses.shape})")


if __name__ == "__main__":
    main()
