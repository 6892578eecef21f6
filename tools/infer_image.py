"""Single-image depth inference CLI.

    python tools/infer_image.py photo.jpg --weights ./model_save/mono:24

Loads the per-module npz weights, runs the jitted depth forward at the
model resolution, and writes `<stem>_disp.png` (magma colormap) +
`<stem>_depth.npy` next to the input — the user-facing capability the
Monodepth2 lineage exposes as `test_simple.py` (the reference covers it
via notebook `Tools` helpers, model_utility.py:239-297).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monodepth_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()


def main():
    import numpy as np
    from PIL import Image

    from monodepth_tpu.config import Config
    from monodepth_tpu.evaluation.eigen import state_from_modules
    from monodepth_tpu.ops.geometry import disparity_to_depth
    from monodepth_tpu.training.state import build_model
    from monodepth_tpu.training.step import make_infer_step
    from monodepth_tpu.utils.visualize import colormap_disparity

    p = argparse.ArgumentParser(description="single-image depth inference")
    p.add_argument("images", nargs="+")
    p.add_argument("--weights", required=True, help="<dir>:<epoch>")
    p.add_argument("--num_layers", default=18, type=int)
    p.add_argument("--height", default=192, type=int)
    p.add_argument("--width", default=640, type=int)
    p.add_argument("--scales", default=None,
                   type=lambda t: tuple(int(x) for x in t.replace(",", " ").split()),
                   help="training scales of the checkpoint; default: "
                        "auto-detected from the decoder export")
    p.add_argument("--min_depth", default=0.1, type=float)
    p.add_argument("--max_depth", default=100.0, type=float)
    args = p.parse_args()

    from monodepth_tpu.evaluation.eigen import (
        detect_scales,
        parse_weights_spec,
    )

    directory, epoch = parse_weights_spec(args.weights)
    scales = (args.scales or detect_scales(directory, epoch)
              or (0, 1, 2, 3))
    cfg = Config(num_layers=args.num_layers, height=args.height,
                 width=args.width, scales=scales,
                 min_depth=args.min_depth, max_depth=args.max_depth,
                 weight_init=False)
    state = state_from_modules(cfg, directory, epoch)
    model = build_model(cfg)
    infer = make_infer_step(model, cfg)

    for path in args.images:
        with Image.open(path) as img:
            rgb = img.convert("RGB")
            original = np.asarray(rgb)
            small = np.asarray(rgb.resize((cfg.width, cfg.height),
                                          Image.LANCZOS), dtype=np.float32)
        disp = np.asarray(infer(state, small[None] / 255.0))[0]
        # scaled disp at eval range -> metric depth at the training range
        sigmoid = (disp - 1 / 80.0) / (1 / 1e-3 - 1 / 80.0)
        _, depth = disparity_to_depth(sigmoid, cfg.min_depth, cfg.max_depth)

        stem = os.path.splitext(path)[0]
        vis = colormap_disparity(disp)
        Image.fromarray(vis).resize(
            (original.shape[1], original.shape[0]),
            Image.BILINEAR).save(stem + "_disp.png")
        np.save(stem + "_depth.npy", np.asarray(depth))
        print(f"{path} -> {stem}_disp.png, {stem}_depth.npy "
              f"(depth {float(np.min(depth)):.1f}..{float(np.max(depth)):.1f} m)")


if __name__ == "__main__":
    main()
