"""Post-optimization HBM roofline of the train step (VERDICT r3 #4).

Compiles the production train step on the real chip and reports, from
XLA's cost analysis of the OPTIMIZED (post-fusion) HLO:

  - bytes accessed (GB) and FLOPs of one step
  - the bandwidth implied by the measured steady-state step time
  - % of the chip's HBM peak (v5e: ~819 GB/s)

CAVEAT (measured on chip): the HLO "bytes accessed" metric counts every
operand access per consumer, so it OVERCOUNTS real DMA traffic for
multi-consumer buffers — the NCHW shift-einsum decoder reads its inputs
up to 9x. On the final step it reports 93.2 GB while the hardware
counters (tools/profile_step.py, per-op measured BW x self-time) say
49.0 GB actually moved. Use profile_step.py for the honest roofline;
this tool gives the HLO-level upper envelope and the FLOP count.
Optionally runs the measured step time itself (--measure, value-fetch
chained timing like bench.py) instead of taking it from the CLI.

    python tools/roofline.py [--step_ms 88] [--measure] [--height ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monodepth_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()

HBM_PEAK_GBPS = 819.0  # v5e HBM bandwidth


def main():
    import jax

    from monodepth_tpu.config import Config
    from monodepth_tpu.data.synthetic import make_planar_scenes
    from monodepth_tpu.training.state import (
        build_model,
        create_state,
        make_optimizer,
    )
    from monodepth_tpu.training.step import make_train_step

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--height", default=192, type=int)
    p.add_argument("--width", default=640, type=int)
    p.add_argument("--batch", default=12, type=int)
    p.add_argument("--use_pallas", default=True,
                   type=lambda t: t.lower() in ("1", "true", "yes"))
    p.add_argument("--step_ms", default=0.0, type=float,
                   help="measured steady-state step time; 0 + --measure "
                        "times it here (120-step calibration first)")
    p.add_argument("--measure", action="store_true")
    p.add_argument("--warmup", default=120, type=int)
    args = p.parse_args()

    cfg = Config(height=args.height, width=args.width, batch=args.batch,
                 use_pallas=args.use_pallas, weight_init=False)
    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_state(cfg, model, tx)
    device = jax.devices()[0]
    state = jax.device_put(state, device)
    step = make_train_step(model, tx, cfg, donate=False)

    scenes = make_planar_scenes(cfg.batch, cfg.height, cfg.width, seed=0)
    keys = ("frames", "jitter", "K", "inv_K")
    batch = {k: jax.device_put(scenes[k][: cfg.batch], device) for k in keys}

    compiled = jax.jit(step).lower(state, batch).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    bytes_total = float(ca.get("bytes accessed", float("nan")))
    flops = float(ca.get("flops", float("nan")))
    print(f"config: {cfg.width}x{cfg.height} b{cfg.batch} "
          f"pallas={cfg.use_pallas}")
    print(f"bytes accessed : {bytes_total / 1e9:.1f} GB")
    print(f"flops          : {flops / 1e12:.2f} TFLOP")
    # memory-space breakdown when XLA reports it (0 = HBM)
    for k in sorted(ca):
        if k.startswith("bytes accessed") and k != "bytes accessed":
            v = float(ca[k])
            if v > 1e8:
                print(f"  {k:<28}: {v / 1e9:.1f} GB")

    step_ms = args.step_ms
    if args.measure and not step_ms:
        for i in range(args.warmup):
            state, metrics = step(state, batch)
        if args.warmup:
            _ = float(metrics["loss"])
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            state, metrics = step(state, batch)
        _ = float(metrics["loss"])
        step_ms = (time.perf_counter() - t0) / n * 1e3
        print(f"measured step  : {step_ms:.1f} ms "
              f"({cfg.batch / step_ms * 1e3:.1f} img/s)")
    if step_ms:
        bw = bytes_total / (step_ms / 1e3)
        print(f"implied HBM bw : {bw / 1e9:.0f} GB/s "
              f"= {bw / 1e9 / HBM_PEAK_GBPS * 100:.0f}% of "
              f"{HBM_PEAK_GBPS:.0f} GB/s peak "
              f"(HLO-count upper envelope; >100% means multi-counted "
              f"operands — see profile_step.py for measured traffic)")
        mxu_pct = flops / (step_ms / 1e3) / 394e12 * 100  # v5e bf16 peak
        print(f"implied MXU    : {mxu_pct:.0f}% of 394 TFLOP/s bf16 peak")


if __name__ == "__main__":
    main()
