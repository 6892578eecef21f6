"""The full lockstep-parity documentation run (tests run a short version).

For each model variant (separate / shared / posecnn / stereo):
  1. f64 single-step parity — loss rel diff + per-module gradient rel-L2
     vs the torch twin from a shared converted init (semantic identity;
     backend rounding is ~1e-14 here).
  2. f32 trajectory — N lockstep Adam steps (default 200) at production
     precision; records the per-step loss rel-diff envelope.

The comparison drivers are shared with tests/test_lockstep.py
(tools/lockstep_oracle.py: lockstep_single_step / lockstep_trajectory) —
this run documents exactly what the test asserts, at length.

Writes docs/artifacts/lockstep_parity.json and prints the markdown table
embedded in docs/PARITY.md. Runtime: ~30-60 min on a 1-CPU host (mostly
the torch f64 convs); run nothing else concurrently.

Usage: python tools/lockstep_parity.py [steps] [variant ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tools.lockstep_oracle import (  # noqa: E402
    VARIANTS,
    lockstep_single_step,
    lockstep_trajectory,
)


def grad_rel_l2(ours, theirs):
    out = {}
    for mod in theirs:
        a = np.concatenate([np.asarray(x, np.float64).ravel()
                            for x in jax.tree.leaves(ours[mod])])
        b = np.concatenate([np.asarray(x, np.float64).ravel()
                            for x in jax.tree.leaves(theirs[mod])])
        out[mod] = float(np.linalg.norm(a - b) / np.linalg.norm(b))
    return out


def main():
    args = sys.argv[1:]
    steps = int(args[0]) if args and args[0].isdigit() else 200
    variants = [a for a in args if not a.isdigit()] or list(VARIANTS)

    results = {}
    for v in variants:
        print(f"== {v}: f64 single-step gradient parity", flush=True)
        single = lockstep_single_step(v, double=True)
        loss_rel = (abs(single["j_loss"] - single["t_loss"])
                    / abs(single["t_loss"]))
        grads = grad_rel_l2(single["j_grads"], single["t_grads"])
        print(f"    loss rel {loss_rel:.2e}; grads "
              f"{ {k: f'{e:.1e}' for k, e in grads.items()} }", flush=True)
        print(f"== {v}: f32 {steps}-step trajectory", flush=True)
        traj = lockstep_trajectory(v, steps, num_batches=8,
                                   check_structure=False, verbose_every=25)
        results[v] = {"f64_loss_rel": loss_rel, "f64_grad_rel_l2": grads,
                      "f32_trajectory": traj}

    out_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            "artifacts", "lockstep_parity.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({"steps": steps, "results": results}, f, indent=1)
    print(f"\nwrote {os.path.abspath(out_path)}\n")

    print("| variant | f64 loss rel | f64 grad rel-L2 (worst module) | "
          f"f32 traj: step-0 | max over {steps} | final |")
    print("|---|---|---|---|---|---|")
    for v, r in results.items():
        d = r["f32_trajectory"]["rel_diffs"]
        worst = max(r["f64_grad_rel_l2"].values())
        print(f"| {v} | {r['f64_loss_rel']:.1e} | {worst:.1e} | "
              f"{d[0]:.1e} | {max(d):.1e} | {d[-1]:.1e} |")


if __name__ == "__main__":
    main()
