"""Diagnose the eval/infer timing anomaly (see tools/bench_eval.py).

Times each step form two ways — python-loop chained (bench.py style)
and lax.fori_loop fully inside one jit — and prints the eval step's
warp_span telemetry to test whether eval-mode BN running stats on a
young net emit pathological warp fields.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monodepth_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

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

    cfg = Config(height=192, width=640, batch=12, weight_init=False)
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
    for i in range(120):
        state, tm = train_step(state, batches[i % 2])
    print(f"warmed: loss {float(tm['loss']):.4f} "
          f"warp_span {float(tm.get('warp_span', -1)):.2f}", file=sys.stderr)

    eval_step = make_eval_step(model, cfg)
    m = eval_step(state, batches[0])
    print("eval metrics:",
          {k: round(float(v), 4) for k, v in m.items()}, file=sys.stderr)

    # timing A: python loop, state-independent, single final fetch
    t0 = time.perf_counter()
    for i in range(10):
        m = eval_step(state, batches[i % 2])
    _ = float(m["loss"])
    print(f"eval python-loop: {(time.perf_counter()-t0)/10*1e3:.1f} ms/iter")

    # timing B: fori_loop inside one jit
    @jax.jit
    def eval_n(state, batch):
        def body(i, prev):
            b = dict(batch)
            b["frames"] = batch["frames"] + \
                (prev * 1e-12).astype(batch["frames"].dtype)
            return eval_step(state, b)["loss"]
        return lax.fori_loop(0, 10, body, jnp.float32(0.0))

    loss = eval_n(state, batches[0])
    _ = float(loss)
    t0 = time.perf_counter()
    loss = eval_n(state, batches[0])
    _ = float(loss)
    print(f"eval fori x10: {(time.perf_counter()-t0)/10*1e3:.1f} ms/iter")

    infer = make_infer_step(model, cfg)
    img = batches[0]["frames"][:, 0]

    @jax.jit
    def infer_n(state, img):
        def body(i, d):
            return infer(state, img + jnp.expand_dims(d, -1) * 1e-12)
        return lax.fori_loop(0, 10, body,
                             jnp.zeros(img.shape[:3], jnp.float32))

    d = infer_n(state, img)
    _ = float(jnp.sum(d))
    t0 = time.perf_counter()
    d = infer_n(state, img)
    _ = float(jnp.sum(d))
    print(f"infer fori x10: {(time.perf_counter()-t0)/10*1e3:.1f} ms/iter")

    # timing C: python loop, no chaining, one fetch (queue-drain style)
    t0 = time.perf_counter()
    for i in range(10):
        d = infer(state, img)
    _ = float(jnp.sum(d))
    print(f"infer python-loop: {(time.perf_counter()-t0)/10*1e3:.1f} ms/iter")


if __name__ == "__main__":
    main()
