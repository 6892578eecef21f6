"""Benchmark: training throughput (images/sec/chip) at the reference's
headline config — 640x192, batch 12, ResNet-18, separate pose, full
min-reprojection + automask + smoothness loss (BASELINE.json config 3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"spread"} — value is the median of 3 disjoint timed windows and spread
their (max-min)/median, so a real regression is distinguishable from
the ~1% run-to-run noise.

STEADY-STATE measurement: the model is first trained for `WARMUP_STEPS`
on synthetic scenes with exact geometry (data/synthetic.py) so disparity
and pose calibrate, then throughput is timed on the same stream. This is
what a 24-epoch production run spends >99% of its time doing. It matters
because the Pallas warp sampler's cost adapts to the displacement field:
an UNTRAINED net emits ~±50 px noise warps (sigmoid-init disparity ~5 x
random pose) where the kernel is slower than the XLA gather, while
calibrated warps (a few px) run several times faster — timing a random
init would misstate the cost of every real run.

Timing is value-fetch based: the loop threads the train state through N
steps and then fetches the final loss, forcing completion of the chain
(`jax.block_until_ready` is NOT a reliable barrier on the tunneled axon
backend; see CLAUDE.md).

vs_baseline divides by the PyTorch reference's training throughput. The
reference publishes no throughput numbers (SURVEY.md §6); the official
Monodepth2 repo (which this reference reimplements 1:1 at the same
config) reports ~12 h for 20 epochs of 39,810 images on a Titan Xp:
20 * 39810 / (12 * 3600) ≈ 18.4 img/s. That is our denominator.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

REFERENCE_IMG_PER_SEC = 18.4
WARMUP_STEPS = 120
TIMED_STEPS = 20


def main():
    import argparse

    from monodepth_tpu.config import Config
    from monodepth_tpu.data.synthetic import make_planar_scenes
    from monodepth_tpu.training.state import build_model, create_state, make_optimizer
    from monodepth_tpu.training.step import make_train_step

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--height", default=192, type=int)
    p.add_argument("--width", default=640, type=int)
    p.add_argument("--batch", default=12, type=int)
    p.add_argument("--remat", default=False,
                   type=lambda t: t.lower() in ("1", "true", "yes"))
    p.add_argument("--use_pallas", default=True,
                   type=lambda t: t.lower() in ("1", "true", "yes"))
    p.add_argument("--warmup", default=WARMUP_STEPS, type=int)
    p.add_argument("--max_shift_px", default=14.0, type=float,
                   help="scene displacement scale; 40-60 brackets the "
                        "worst realistic KITTI near-field regime "
                        "(docs/PERF.md large-displacement row)")
    args = p.parse_args()

    cfg = Config(height=args.height, width=args.width, batch=args.batch,
                 remat=args.remat, use_pallas=args.use_pallas,
                 weight_init=False)  # bf16 (+ Pallas warp by default)
    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_state(cfg, model, tx)
    # this benchmark is per-chip by construction: on a multi-device host
    # state+batches are committed to device 0 so jit runs there, instead
    # of a mesh-less multi-device step that would run the Pallas warp
    # replicated after a GSPMD all-gather (training/step.py _make_sampler)
    # while dividing throughput by device_count
    device = jax.devices()[0]
    if jax.device_count() > 1:
        print(f"bench: {jax.device_count()} devices visible; committing "
              f"to {device} (per-chip measurement)", file=sys.stderr)
    state = jax.device_put(state, device)
    train_step = make_train_step(model, tx, cfg, donate=False)

    n_scenes = 3 * cfg.batch
    scenes = make_planar_scenes(n_scenes, cfg.height, cfg.width, seed=0,
                                max_shift_px=args.max_shift_px)
    keys = ("frames", "jitter", "K", "inv_K")
    batches = [{k: jax.device_put(scenes[k][i:i + cfg.batch], device)
                for k in keys}
               for i in range(0, n_scenes, cfg.batch)]

    # calibrate: disparity/pose reach their training-run operating range
    for i in range(args.warmup):
        state, metrics = train_step(state, batches[i % len(batches)])
        if i % 30 == 29:
            print(f"warmup {i + 1}/{args.warmup} "
                  f"loss {float(metrics['loss']):.4f}", file=sys.stderr)
    if args.warmup:
        _ = float(metrics["loss"])

    # three disjoint timed windows, report the median: ~1% run-to-run
    # noise is otherwise indistinguishable from a small regression
    rates = []
    for _w in range(3):
        t0 = time.perf_counter()
        for i in range(TIMED_STEPS):
            state, metrics = train_step(state, batches[i % len(batches)])
        _ = float(metrics["loss"])  # forces completion of the whole chain
        dt = time.perf_counter() - t0
        rates.append(TIMED_STEPS * cfg.batch / dt)

    # everything ran committed to ONE device — no division by device_count
    per_chip = float(np.median(rates))
    spread = (max(rates) - min(rates)) / per_chip
    print(json.dumps({
        "metric": f"train_images_per_sec_per_chip_"
                  f"{cfg.width}x{cfg.height}_b{cfg.batch}",
        "value": round(per_chip, 2),
        "unit": "img/s",
        "vs_baseline": round(per_chip / REFERENCE_IMG_PER_SEC, 3),
        # median of 3 disjoint 20-step windows; spread = (max-min)/median
        "spread": round(spread, 4),
        # the reference publishes no throughput; the denominator is an
        # ESTIMATE from official Monodepth2's published 12 h / 20 epochs
        # on a Titan Xp (module docstring) — the img/s value above is
        # the measured number
        "baseline_note": f"denominator {REFERENCE_IMG_PER_SEC} img/s is "
                         f"an estimate (official Monodepth2 12h/20ep)",
    }))


if __name__ == "__main__":
    main()
