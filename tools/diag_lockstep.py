"""Diagnose lockstep gradient error structure: per-leaf rel-L2 vs max-norm,
and whether the error is spread (backend rounding) or concentrated in few
elements (argmin tie flips in min-reprojection). The step itself runs
through the shared harness (tools/lockstep_oracle.lockstep_single_step) —
the same code path tests/test_lockstep.py asserts on."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tools.lockstep_oracle import lockstep_single_step  # noqa: E402


def main(variant="separate", mode="f32"):
    res = lockstep_single_step(variant, double=(mode == "f64"))
    t_grads, j_grads = res["t_grads"], res["j_grads"]
    rel = abs(res["j_loss"] - res["t_loss"]) / abs(res["t_loss"])
    print(f"loss rel diff: {rel:.2e}")

    rows = []
    for mod in t_grads:
        flat_t = jax.tree_util.tree_flatten_with_path(t_grads[mod])[0]
        flat_j = jax.tree.leaves(j_grads[mod])
        for (path, b), a in zip(flat_t, flat_j):
            a = np.asarray(a, np.float64)
            b = np.asarray(b.numpy() if hasattr(b, "numpy") else b, np.float64)
            scale = np.abs(b).max() + 1e-30
            maxerr = np.abs(a - b).max() / scale
            l2 = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30)
            nbig = int((np.abs(a - b) > 0.1 * scale * maxerr + 1e-4 * scale).sum())
            name = mod + "/" + "/".join(str(p) for p in path)
            rows.append((maxerr, l2, nbig, b.size, name))
    rows.sort(reverse=True)
    print(f"{'maxnorm':>9} {'relL2':>9} {'#big':>6} {'size':>8}  leaf")
    for maxerr, l2, nbig, size, name in rows[:15]:
        print(f"{maxerr:9.2e} {l2:9.2e} {nbig:6d} {size:8d}  {name}")
    per_mod = {}
    for mod in t_grads:
        a = np.concatenate([np.asarray(x, np.float64).ravel()
                            for x in jax.tree.leaves(j_grads[mod])])
        b = np.concatenate([np.asarray(x, np.float64).ravel()
                            for x in jax.tree.leaves(t_grads[mod])])
        per_mod[mod] = np.linalg.norm(a - b) / np.linalg.norm(b)
    print("per-module rel-L2:", {k: f"{v:.2e}" for k, v in per_mod.items()})


if __name__ == "__main__":
    main(*sys.argv[1:])
