"""Train-step timing breakdown on the real chip.

    python tools/bench_step.py --height 192 --width 640 --batch 12
    python tools/bench_step.py --height 320 --width 1024 --remat true --steps 4

Variants (each timed by chaining the state through N steps and fetching
the final loss — see CLAUDE.md on why value-fetch is the only honest
barrier here):
  full        the production train step
  nogather    grid_sample replaced by a constant shift with identical
              shapes/dtypes — isolates the in-situ cost of the 8 warp
              gathers (everything else, incl. their interpolation
              arithmetic, stays)
  gtmetrics   --train_gt_metrics true (ADDS the in-step GT median
              sort; the production default is false, so "full" is
              already metrics-free)
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
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from monodepth_tpu.config import Config
    from monodepth_tpu.training import step as step_mod
    from monodepth_tpu.training.state import (
        build_model,
        create_state,
        make_optimizer,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--height", default=192, type=int)
    p.add_argument("--width", default=640, type=int)
    p.add_argument("--batch", default=12, type=int)
    p.add_argument("--steps", default=20, type=int)
    p.add_argument("--remat", default=False,
                   type=lambda t: t.lower() in ("1", "true", "yes"))
    p.add_argument("--variants", default="full,nopallas,nogather",
                   help="full (default cfg incl. the Pallas warp on TPU) | "
                        "nopallas (jnp packed gather) | nogather (fake "
                        "sampler) | gtmetrics (adds the in-step GT median "
                        "sort)")
    args = p.parse_args()

    real_grid_sample = step_mod.grid_sample

    def fake_grid_sample(image, grid, method="packed"):
        # same shapes, same dtype, no gather: constant 1-pixel shift
        del grid, method
        return jnp.concatenate([image[:, :, 1:], image[:, :, -1:]], axis=2)

    batch0 = _example_batch(
        Config(height=args.height, width=args.width, batch=args.batch,
               weight_init=False), args.batch)
    batch = {k: jax.device_put(v) for k, v in batch0.items()}

    for variant in args.variants.split(","):
        cfg = Config(height=args.height, width=args.width, batch=args.batch,
                     weight_init=False, remat=args.remat,
                     use_pallas=(variant not in ("nopallas", "nogather")),
                     train_gt_metrics=(variant == "gtmetrics"))
        step_mod.grid_sample = (fake_grid_sample if variant == "nogather"
                                else real_grid_sample)
        try:
            model = build_model(cfg)
            tx = make_optimizer(cfg, 1000)
            state = create_state(cfg, model, tx)
            train_step = step_mod.make_train_step(model, tx, cfg)

            for _ in range(3):
                state, metrics = train_step(state, batch)
            _ = float(metrics["loss"])
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, metrics = train_step(state, batch)
            _ = float(metrics["loss"])
            dt = (time.perf_counter() - t0) / args.steps
            print(f"{args.height}x{args.width} b{args.batch}"
                  f"{' remat' if args.remat else ''} {variant:10s} "
                  f"{dt * 1e3:8.1f} ms/step  "
                  f"{args.batch / dt:6.1f} img/s/chip")
        finally:
            step_mod.grid_sample = real_grid_sample


if __name__ == "__main__":
    main()
