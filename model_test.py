"""KITTI Eigen evaluation CLI (reference: model_test.py:124-159).

Evaluates one or more weight sets over the test split and prints the
7-metric table per set:

    python model_test.py --datapath ./dataset/kitti --weights ./model_save/mono:22

Each --weights entry is `<dir>:<epoch>` pointing at per-module npz exports
(`encoder<epoch>.npz`, `decoder<epoch>.npz`, ... — written by the trainer's
Checkpointer.export_modules) — conceptually the reference's
`<key><epoch>.pt` layout. Official torch checkpoints can be converted
with monodepth_tpu/utils/torch_import.py first.
"""

import argparse
import os

from monodepth_tpu.utils.platform import apply_env_platform

apply_env_platform()

from monodepth_tpu.config import Config  # noqa: E402
from monodepth_tpu.data import kitti
from monodepth_tpu.evaluation import load_ground_truth
from monodepth_tpu.evaluation.eigen import print_table, state_from_modules


def main():
    p = argparse.ArgumentParser(description="KITTI Eigen evaluation")
    p.add_argument("--datapath", default="./dataset/kitti", type=str)
    p.add_argument("--splits", default="./splits", type=str)
    # kitti_benchmark is train-only: its test_files.txt uses the 2-token
    # "image N" format with no raw-drive paths to project GT from (the
    # reference cannot eval it either — model_test.py:47-57 assumes the
    # 3-token eigen format)
    p.add_argument("--datatype", default="kitti_eigen_zhou", type=str,
                   choices=["kitti_eigen_full", "kitti_eigen_zhou"])
    p.add_argument("--num_layers", default=18, type=int)
    p.add_argument("--height", default=192, type=int)
    p.add_argument("--width", default=640, type=int)
    p.add_argument("--scales", default=None,
                   type=lambda t: tuple(int(x) for x in t.replace(",", " ").split()),
                   help="training scales of the checkpoint; default: "
                        "auto-detected from the decoder export")
    p.add_argument("--eval_batch", default=16, type=int)
    p.add_argument("--weights", nargs="+", required=True,
                   help="<dir>:<epoch> per weight set")
    p.add_argument("--save_pred_disps", default="", type=str,
                   help="write predicted disparities [N,H,W] to this .npy")
    p.add_argument("--gt_cache", default="./model_save/gt_cache_eval", type=str,
                   help="cache dir for projected velodyne GT ('' disables)")
    args = p.parse_args()

    from monodepth_tpu.evaluation.eigen import (
        detect_scales,
        parse_weights_spec,
    )

    lines = kitti.readlines(os.path.join(
        args.splits, args.datatype, "test_files.txt"))
    print(f">>> Testset length {len(lines)}")
    ground_truths = load_ground_truth(args.datapath, lines,
                                      cache_dir=args.gt_cache or None)
    print(">>> Loaded ground truth depth")

    import jax

    from monodepth_tpu.parallel import make_mesh

    # the whole slice, data-parallel (the reference eval is single-GPU;
    # evaluation/eigen.py predict_disparities docstring)
    mesh = make_mesh() if jax.device_count() > 1 else None
    if mesh is not None:
        print(f">>> eval mesh: {dict(mesh.shape)}")

    for spec in args.weights:
        directory, epoch = parse_weights_spec(spec)
        scales = (args.scales or detect_scales(directory, epoch)
                  or (0, 1, 2, 3))
        cfg = Config(datapath=args.datapath, splits=args.splits,
                     datatype=args.datatype, num_layers=args.num_layers,
                     height=args.height, width=args.width, scales=scales,
                     weight_init=False)
        state = state_from_modules(cfg, directory, epoch)
        from monodepth_tpu.evaluation.eigen import (
            eigen_metrics,
            predict_disparities,
        )

        disps = predict_disparities(cfg, state, lines,
                                    eval_batch=args.eval_batch, mesh=mesh)
        if args.save_pred_disps:
            import numpy as np

            # one file per weights set: a fixed path would silently keep
            # only the LAST set's predictions when several are evaluated
            path = args.save_pred_disps
            if len(args.weights) > 1:
                root, ext = os.path.splitext(path)
                path = f"{root}_{os.path.basename(directory)}_{epoch}" \
                       f"{ext or '.npy'}"
            np.save(path, disps)
            print(f">>> saved predicted disparities to {path} "
                  f"{disps.shape}")
        metrics = eigen_metrics(disps, ground_truths, cfg.datatype)
        print_table(spec, metrics)


if __name__ == "__main__":
    main()
