"""Serialize depth inference to a portable StableHLO artifact (jax.export).

The TPU-native serving story: the gather-free depth forward (encoder ->
decoder -> eval-range scaled disparity, reference model_test.py:80-83)
is exported ONCE with the weights baked in as constants and a SYMBOLIC
batch dimension, producing a self-contained artifact any JAX-compatible
runtime (or an AOT compiler) can load and run without this framework —
no Python model code, no checkpoint plumbing at serving time.

    python tools/export_inference.py --weights <dir>:<epoch> \
        --height 192 --width 640 [--num_layers 18] [--precision bf16] \
        [--platforms tpu,cpu] --out depth_infer.stablehlo

Round trip:

    from jax import export
    fn = export.deserialize(open("depth_infer.stablehlo", "rb").read())
    disp = fn.call(images)        # images [b, H, W, 3] f32 in [0, 1]

The artifact is platform-checked at call time: export with
``--platforms tpu,cpu`` to produce one file servable on both. The warp
kernel never appears here (inference is depth-only), so no custom-call
portability caveats apply. Verified end-to-end: an artifact exported
from a CPU-only process with --platforms tpu,cpu deserializes and runs
on a real v5e chip (and on CPU it matches direct model.apply to 5.8e-7
rel at f32 — tests/test_tools.py round-trip).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monodepth_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()


def build_exported(cfg, state, platforms=None, batch: int | None = None):
    """jax.export the depth-inference closure over `state`'s weights.

    `batch=None` exports a symbolic batch dimension b >= 1; an integer
    pins it (some serving stacks want static shapes)."""
    import jax
    import jax.numpy as jnp
    from jax import export

    from monodepth_tpu.training.state import build_model
    from monodepth_tpu.ops.geometry import disparity_to_depth

    model = build_model(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def infer(images):
        disps = model.apply(variables, images, train=False,
                            method=model.depth)
        scaled_disp, _ = disparity_to_depth(
            disps[0].astype(jnp.float32), 1e-3, 80.0)
        return scaled_disp[..., 0]

    if batch is None:
        (b,) = export.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, cfg.height, cfg.width, 3), jnp.float32)
    kwargs = {"platforms": platforms} if platforms else {}
    return export.export(jax.jit(infer), **kwargs)(spec)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", required=True, help="<dir>:<epoch>")
    p.add_argument("--height", default=192, type=int)
    p.add_argument("--width", default=640, type=int)
    p.add_argument("--num_layers", default=18, type=int)
    p.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--batch", default=0, type=int,
                   help="0 = symbolic batch dimension")
    p.add_argument("--platforms", default="",
                   help="comma list, e.g. tpu,cpu; empty = current backend")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from monodepth_tpu.config import Config
    from monodepth_tpu.evaluation.eigen import (
        detect_scales,
        parse_weights_spec,
        state_from_modules,
    )

    wdir, epoch = parse_weights_spec(args.weights)
    scales = detect_scales(wdir, epoch) or (0, 1, 2, 3)
    cfg = Config(height=args.height, width=args.width,
                 num_layers=args.num_layers, precision=args.precision,
                 scales=scales, weight_init=False)
    state = state_from_modules(cfg, wdir, epoch)

    platforms = tuple(s for s in args.platforms.split(",") if s) or None
    exported = build_exported(cfg, state, platforms=platforms,
                              batch=args.batch or None)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f">>> exported {exported.fun_name}: in {exported.in_avals} -> "
          f"out {exported.out_avals}")
    print(f">>> platforms {exported.platforms}; "
          f"{len(blob) / 1e6:.1f} MB -> {args.out}")


if __name__ == "__main__":
    main()
