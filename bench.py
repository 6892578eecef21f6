"""Benchmark: training throughput (images/sec/chip) at the reference's
headline config — 640x192, batch 12, ResNet-18, separate pose, full
min-reprojection + automask + smoothness loss (BASELINE.json config 3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing is value-fetch based: the loop threads the train state through N
steps and then fetches the final loss to the host, which forces real
completion of the whole chain. (`jax.block_until_ready` is NOT a
reliable completion barrier for queued work on the tunneled axon
backend — it can return while steps are still executing; see CLAUDE.md.)

vs_baseline divides by the PyTorch reference's training throughput. The
reference publishes no throughput numbers (SURVEY.md §6); the official
Monodepth2 repo (which this reference reimplements 1:1 at the same
config) reports ~12 h for 20 epochs of 39,810 images on a Titan Xp:
20 * 39810 / (12 * 3600) ≈ 18.4 img/s. That is our denominator.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

REFERENCE_IMG_PER_SEC = 18.4


def main():
    from __graft_entry__ import _example_batch
    from monodepth_tpu.config import Config
    from monodepth_tpu.training.state import build_model, create_state, make_optimizer
    from monodepth_tpu.training.step import make_train_step

    cfg = Config(weight_init=False)  # bf16 compute
    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_state(cfg, model, tx)
    train_step = make_train_step(model, tx, cfg, donate=False)

    batches = [_example_batch(cfg, cfg.batch, seed) for seed in range(4)]
    batches = [{k: jax.device_put(v) for k, v in b.items()} for b in batches]

    # warmup: compile + 2 steps, forced to completion by the value fetch
    for i in range(3):
        state, metrics = train_step(state, batches[i % len(batches)])
    _ = float(metrics["loss"])

    steps = 20
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = train_step(state, batches[i % len(batches)])
    _ = float(metrics["loss"])  # forces completion of the whole chain
    dt = time.perf_counter() - t0

    img_per_sec = steps * cfg.batch / dt
    n_chips = jax.device_count()
    per_chip = img_per_sec / n_chips
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip_640x192_b12",
        "value": round(per_chip, 2),
        "unit": "img/s",
        "vs_baseline": round(per_chip / REFERENCE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
