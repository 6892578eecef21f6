"""Steady-state train-step op breakdown on the real chip.

    python tools/profile_step.py [--warmup 120] [--height 192 ...]

Calibrates the model like bench.py (the Pallas warp kernel's cost is
regime-dependent — an untrained profile misattributes ~2x the warp
time), traces a few steps with jax.profiler, then parses the xplane
with xprof and prints the top HLO ops by self-time. This is how the
docs/PERF.md "step composition" numbers are produced.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monodepth_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()


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
    p.add_argument("--warmup", default=120, type=int)
    p.add_argument("--steps", default=6, type=int,
                   help="steps inside the trace window")
    p.add_argument("--use_pallas", default=True,
                   type=lambda t: t.lower() in ("1", "true", "yes"))
    p.add_argument("--top", default=30, type=int)
    p.add_argument("--out", default="", help="keep the trace dir here")
    args = p.parse_args()

    cfg = Config(height=args.height, width=args.width, batch=args.batch,
                 use_pallas=args.use_pallas, weight_init=False)
    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_state(cfg, model, tx)
    device = jax.devices()[0]
    state = jax.device_put(state, device)
    step = make_train_step(model, tx, cfg)

    n_scenes = 3 * cfg.batch
    scenes = make_planar_scenes(n_scenes, cfg.height, cfg.width, seed=0)
    keys = ("frames", "jitter", "K", "inv_K")
    batches = [{k: jax.device_put(scenes[k][i:i + cfg.batch], device)
                for k in keys}
               for i in range(0, n_scenes, cfg.batch)]

    for i in range(args.warmup):
        state, metrics = step(state, batches[i % len(batches)])
        if i % 30 == 29:
            print(f"warmup {i + 1}/{args.warmup} "
                  f"loss {float(metrics['loss']):.4f}", file=sys.stderr)
    if args.warmup:
        _ = float(metrics["loss"])

    trace_dir = args.out or tempfile.mkdtemp(prefix="monodepth_trace_")
    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            state, metrics = step(state, batches[i % len(batches)])
        _ = float(metrics["loss"])

    xplanes = glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        print(f"no xplane under {trace_dir}", file=sys.stderr)
        sys.exit(1)
    report(xplanes[0], args.top, args.steps)
    print(f"trace: {trace_dir}", file=sys.stderr)


def report(xplane: str, top: int, steps: int):
    """Aggregate per-HLO self-time from the xprof framework_op_stats."""
    import collections

    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    # gviz json: rows under 'rows', columns under 'cols'
    cols = [c["label"] for c in rows[0]["cols"]]
    table = [[c.get("v") for c in r["c"]] for r in rows[0]["rows"]]
    idx = {k: cols.index(k) for k in (
        "Host/device", "Operation Type", "Operation Name",
        "Total self-time (us)", "#Occurrences", "Bound by",
        "Measured Memory BW (GBytes/Sec)",
        "Operational Intensity (FLOPs/Byte)")}
    dev = [r for r in table if r[idx["Host/device"]] == "Device"]
    bytype = collections.Counter()
    bytes_by_type = collections.Counter()
    for r in dev:
        us = float(r[idx["Total self-time (us)"]] or 0)
        bytype[r[idx["Operation Type"]]] += us
        # hardware-counter-derived traffic: self-time x measured BW.
        # This is the honest "bytes moved" figure (HLO cost analysis
        # multi-counts shared operands — see tools/roofline.py).
        bw = float(r[idx["Measured Memory BW (GBytes/Sec)"]] or 0)
        bytes_by_type[r[idx["Operation Type"]]] += us * bw / 1e3  # MB
    total = sum(bytype.values())
    total_gb = sum(bytes_by_type.values()) / 1e3 / steps
    print("== by op type (ms/step | measured GB/step) ==")
    for t, us in bytype.most_common(20):
        print(f"{us / 1000 / steps:9.3f}  {us / total * 100:5.1f}%  "
              f"{bytes_by_type[t] / 1e3 / steps:7.2f} GB  {t}")
    print(f"{total / 1000 / steps:9.3f}  TOTAL device self time; "
          f"measured traffic {total_gb:.1f} GB/step "
          f"= {total_gb / (total / 1e6 / steps) / 819 * 100:.0f}% of "
          f"819 GB/s over device self-time")
    print(f"\n== top {top} individual ops ==")
    key = idx["Total self-time (us)"]
    for r in sorted(dev, key=lambda r: -float(r[key] or 0))[:top]:
        us = float(r[key] or 0)
        print(f"{us / 1000 / steps:8.3f} ms  x{r[idx['#Occurrences']]}  "
              f"bound={r[idx['Bound by']]}  "
              f"BW={r[idx['Measured Memory BW (GBytes/Sec)']]}  "
              f"AI={r[idx['Operational Intensity (FLOPs/Byte)']]}  "
              f"{r[idx['Operation Name']][:86]}")


if __name__ == "__main__":
    main()
