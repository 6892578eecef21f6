"""Eval/inference step timing on the real chip.

    python tools/bench_eval.py [--height 192 --width 640 --batch 12]

Times make_eval_step (full loss, grad-free Pallas warp primal path) and
make_infer_step (gather-free depth forward) steady-state, chaining
batches and forcing completion with a value fetch (CLAUDE.md). The
round-2 "eval ~343 ms" number predates warp kernel v3/v4 and the NCHW
decoder — this re-measures it.
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

    from monodepth_tpu.config import Config
    from monodepth_tpu.data.synthetic import make_planar_scenes
    from monodepth_tpu.training.state import (
        build_model,
        create_state,
        make_optimizer,
    )
    from monodepth_tpu.training.step import (
        make_eval_step,
        make_infer_step,
        make_train_step,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--height", default=192, type=int)
    p.add_argument("--width", default=640, type=int)
    p.add_argument("--batch", default=12, type=int)
    p.add_argument("--iters", default=20, type=int)
    p.add_argument("--warmup", default=120, type=int,
                   help="calibration train steps before timing — an "
                        "untrained net emits noise warps, the one regime "
                        "where the candidate kernel is pathological "
                        "(docs/PERF.md); bench.py does the same")
    args = p.parse_args()

    cfg = Config(height=args.height, width=args.width, batch=args.batch,
                 weight_init=False)
    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_state(cfg, model, tx)
    device = jax.devices()[0]
    state = jax.device_put(state, device)

    scenes = make_planar_scenes(2 * cfg.batch, cfg.height, cfg.width, seed=0)
    keys = ("frames", "jitter", "K", "inv_K", "depth_gt")
    batches = [{k: jax.device_put(scenes[k][i:i + cfg.batch], device)
                for k in keys if k in scenes}
               for i in range(0, 2 * cfg.batch, cfg.batch)]

    train_step = make_train_step(model, tx, cfg)
    for i in range(args.warmup):
        state, tm = train_step(state, batches[i % 2])
        if i % 30 == 29:
            print(f"warmup {i + 1}/{args.warmup} "
                  f"loss {float(tm['loss']):.4f}", file=sys.stderr)
    if args.warmup:
        _ = float(tm["loss"])

    from jax import lax

    eval_step = make_eval_step(model, cfg)

    # in-jit fori chain: at 640x192 this agrees with the chained python
    # loop to ~2%, and it is the ONLY form that stays honest at
    # 1024x320 (python-loop dispatch reads 3.5 s/iter there — a queue
    # artifact of this tunneled backend; tools/diag_eval.py).
    @jax.jit
    def eval_n(state, batch):
        def body(i, prev):
            b = dict(batch)
            b["frames"] = batch["frames"] + \
                (prev * 1e-12).astype(batch["frames"].dtype)
            return eval_step(state, b)["loss"]
        return lax.fori_loop(0, args.iters, body, jnp.float32(0.0))

    _ = float(eval_n(state, batches[0]))
    t0 = time.perf_counter()
    _ = float(eval_n(state, batches[0]))
    dt = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"eval_step (full loss): {dt:.1f} ms/batch-{cfg.batch} "
          f"({cfg.batch / dt * 1e3:.1f} img/s)")

    infer = make_infer_step(model, cfg)
    img = batches[0]["frames"][:, 0]

    @jax.jit
    def infer_n(state, img):
        def body(i, d):
            return infer(state, img + jnp.expand_dims(d, -1) * 1e-12)
        return lax.fori_loop(0, args.iters, body,
                             jnp.zeros(img.shape[:3], jnp.float32))

    d = infer_n(state, img)
    _ = float(jnp.sum(d))
    t0 = time.perf_counter()
    d = infer_n(state, img)
    _ = float(jnp.sum(d))
    dt = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"infer_step (disp fwd): {dt:.1f} ms/batch-{cfg.batch} "
          f"({cfg.batch / dt * 1e3:.1f} img/s)")


if __name__ == "__main__":
    main()
