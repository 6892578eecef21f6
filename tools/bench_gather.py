"""Micro-benchmark the exact grid_sample variants on the real chip.

    python tools/bench_gather.py --shapes 192x640x12,320x1024x12 --iters 50

Honest timing per CLAUDE.md: the workload runs inside ONE jit as a
data-dependent `fori_loop` (each iteration's grid is perturbed by the
carried scalar, so steps cannot overlap or be CSE'd), and completion is
forced by fetching the carried value — `block_until_ready` is NOT a
reliable barrier on the tunneled axon backend. Also serves as the soak
test NEXT.md mandates for any new gather formulation (the round-1
row-pair flat gather crashed the TPU worker only when run hot).
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
    import numpy as np

    from monodepth_tpu.ops.sampling import grid_sample

    p = argparse.ArgumentParser()
    p.add_argument("--shapes", default="192x640x12",
                   help="comma-separated HxWxB list")
    p.add_argument("--iters", default=50, type=int)
    p.add_argument("--methods", default="patch,packed,scalar")
    p.add_argument("--grad", default=True,
                   type=lambda t: t.lower() in ("1", "true", "yes"))
    p.add_argument("--grid", default="warp", choices=["warp", "random"],
                   help="warp: smooth small-displacement field (the real "
                        "workload distribution); random: uniform [-1,1] "
                        "coords (adversarial for candidate-select kernels)")
    p.add_argument("--dy_span", default=0.0, type=float,
                   help="with --grid warp: add per-pixel uniform vertical "
                        "noise of this total range (px), setting the "
                        "per-slab dy span the Pallas candidate loop "
                        "scales with — calibrates GUARD_SPAN "
                        "(warp_sample_guarded crossover)")
    args = p.parse_args()

    for shape in args.shapes.split(","):
        H, W, B = (int(t) for t in shape.split("x"))
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)
        if args.grid == "warp":
            # depth-parallax-shaped field: mostly-horizontal smooth
            # displacement, a few px vertical — what trained warps emit
            ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
            dx = 18.0 * np.sin(xs / 37.0) + 10.0 * (ys / H)
            dyf = 2.5 * np.cos(ys / 11.0 + xs / 53.0)
            if args.dy_span:
                dyf = dyf + rng.uniform(-0.5 * args.dy_span,
                                        0.5 * args.dy_span, dyf.shape)
            gx = (xs + dx) / (W - 1) * 2 - 1
            gy = (ys + dyf) / (H - 1) * 2 - 1
            grid = np.stack([gx, gy], -1)[None].repeat(B, 0).astype(np.float32)
            grid = jnp.asarray(grid)
        else:
            grid = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 2)), jnp.float32)

        for method in args.methods.split(","):
            if method == "pallas":
                from monodepth_tpu.ops.pallas.warp_sample import warp_sample

                def run_fwd(g):
                    return warp_sample(img, g).mean()
            elif method == "guarded":
                from monodepth_tpu.ops.pallas.warp_sample import (
                    warp_sample_guarded,
                )

                def run_fwd(g):
                    return warp_sample_guarded(img, g).mean()
            else:
                def run_fwd(g, method=method):
                    return grid_sample(img, g, method=method).mean()

            def run_fwdbwd(g):
                # pull the grid gradient (depth/pose need it); image is
                # data — no gradient flows to it in the train step
                val, dgrid = jax.value_and_grad(run_fwd)(g)
                return val + dgrid.mean()

            fn = run_fwdbwd if args.grad else run_fwd

            @jax.jit
            def loop(g, n):
                def body(i, carry):
                    return fn(g + carry * 1e-12)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            try:
                float(loop(grid, 2))  # compile + warm
                t0 = time.perf_counter()
                val = float(loop(grid, args.iters))  # value fetch = barrier
                dt = (time.perf_counter() - t0) / args.iters
                idx = B * H * W
                print(f"{shape} {method:7s} "
                      f"{'fwd+dgrid' if args.grad else 'fwd':9s} "
                      f"{dt * 1e3:8.2f} ms/warp  "
                      f"{dt / idx * 1e9:6.2f} ns/idx  (val {val:.4f})")
            except Exception as e:  # noqa: BLE001 — report and move on
                print(f"{shape} {method}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
