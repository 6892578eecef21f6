"""Host input-pipeline throughput benchmark.

    python tools/bench_loader.py --datapath ./dataset/kitti \
        --splits ./splits --datatype kitti_eigen_zhou [--native false]

Measures samples/sec (and JPEG decodes/sec) of the threaded loader at
training settings — the number to compare against the device's img/s
from bench.py: if the loader is slower, the input pipeline is the
bottleneck and more loader threads / hosts are needed
(SURVEY.md §7.3 hard part 4).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monodepth_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()


def main():
    from monodepth_tpu.data import kitti
    from monodepth_tpu.data.dataset import KittiDataset
    from monodepth_tpu.data.pipeline import Loader

    p = argparse.ArgumentParser(description="loader throughput benchmark")
    p.add_argument("--datapath", default="./dataset/kitti", type=str)
    p.add_argument("--splits", default="./splits", type=str)
    p.add_argument("--datatype", default="kitti_eigen_zhou", type=str)
    p.add_argument("--height", default=192, type=int)
    p.add_argument("--width", default=640, type=int)
    p.add_argument("--batch", default=12, type=int)
    p.add_argument("--num_workers", default=12, type=int)
    p.add_argument("--frame_ids", default="0 -1 1", type=str)
    p.add_argument("--native", default=None,
                   type=lambda t: t.lower() in ("1", "true", "yes"))
    p.add_argument("--load_depth", default=True,
                   type=lambda t: t.lower() in ("1", "true", "yes"))
    p.add_argument("--max_batches", default=50, type=int)
    args = p.parse_args()

    frame_ids = tuple(t if t == "s" else int(t)
                      for t in args.frame_ids.split())
    lines = kitti.readlines(os.path.join(
        args.splits, args.datatype, "train_files.txt"))
    dataset = KittiDataset(
        args.datapath, lines, is_training=True, frame_ids=frame_ids,
        height=args.height, width=args.width, load_depth=args.load_depth,
        gt_cache_dir=os.path.join(args.datapath, ".gt_cache"),
        use_native=args.native)
    loader = Loader(dataset, batch_size=args.batch, shuffle=True,
                    num_workers=args.num_workers)
    print(f">>> native decode: {dataset.use_native}, "
          f"workers: {args.num_workers}, frames/sample: {len(frame_ids)}")

    n = 0
    t0 = time.perf_counter()
    for i, _ in enumerate(loader.epoch(0)):
        n += args.batch
        if i + 1 >= args.max_batches:
            break
    dt = time.perf_counter() - t0
    loader.close()
    print(f">>> {n / dt:.1f} samples/s "
          f"({n * len(frame_ids) / dt:.0f} decodes/s) over {n} samples")


if __name__ == "__main__":
    main()
