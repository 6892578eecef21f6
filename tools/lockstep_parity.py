"""The full lockstep-parity documentation run (tests run a short version).

For each model variant (separate / shared / posecnn / stereo):
  1. f64 single-step parity — loss rel diff + per-module gradient rel-L2
     vs the torch twin from a shared converted init (semantic identity;
     backend rounding is ~1e-14 here).
  2. f32 trajectory — N lockstep Adam steps (default 200) at production
     precision; records the per-step loss rel-diff envelope.

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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tools.lockstep_oracle import (  # noqa: E402
    VARIANTS,
    TorchTwin,
    make_lockstep_batches,
    tie_noise,
    variant_config,
)

RNG = jax.random.PRNGKey(7)


def grad_rel_l2(ours, theirs):
    out = {}
    for mod in theirs:
        a = np.concatenate([np.asarray(x, np.float64).ravel()
                            for x in jax.tree.leaves(ours[mod])])
        b = np.concatenate([np.asarray(x, np.float64).ravel()
                            for x in jax.tree.leaves(theirs[mod])])
        out[mod] = float(np.linalg.norm(a - b) / np.linalg.norm(b))
    return out


def f64_step(variant):
    from monodepth_tpu.models.monodepth import Monodepth
    from monodepth_tpu.training.step import _loss_from_outputs, apply_and_warp

    with jax.enable_x64(True):
        cfg = variant_config(variant)
        twin = TorchTwin(variant, cfg, seed=0, double=True)
        params, batch_stats = twin.flax_variables()
        model = Monodepth(num_layers=cfg.num_layers, scales=cfg.scales,
                          frame_ids=cfg.frame_ids, pose_type=cfg.pose_type,
                          pose_frames=cfg.pose_frames, dtype=jnp.float64,
                          nchw_decoder=cfg.nchw_decoder)
        batch = make_lockstep_batches(cfg, 1, seed=0)[0]
        for k in ("jitter", "K", "inv_K", "stereo_T"):
            if k in batch:
                batch[k] = batch[k].astype(np.float64)
        noise = tie_noise(RNG, 0, cfg, np.float64)

        t_loss = twin.loss(batch, noise)
        t_loss.backward()
        t_grads = twin.grads_flax()

        rng = jax.random.fold_in(RNG, 0)
        batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
        to_j = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jnp.asarray(x, jnp.float64), t)

        def loss_fn(p):
            variables = {"params": p, "batch_stats": to_j(batch_stats)}
            out = apply_and_warp(model, variables, batch_j, cfg, train=True)
            return _loss_from_outputs(out, rng, cfg, train=True)[0]

        j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(to_j(params))
        loss_rel = abs(float(j_loss) - float(t_loss)) / abs(float(t_loss))
        return loss_rel, grad_rel_l2(j_grads, t_grads)


def f32_trajectory(variant, steps):
    from monodepth_tpu.training.state import (
        TrainState, build_model, make_optimizer)
    from monodepth_tpu.training.step import make_train_step

    cfg = variant_config(variant)
    twin = TorchTwin(variant, cfg, seed=0)
    params, batch_stats = twin.flax_variables()
    model = build_model(cfg)
    batches = make_lockstep_batches(cfg, num_batches=8, seed=0)

    to_f32 = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jnp.asarray(x, jnp.float32), t)
    tx = make_optimizer(cfg, steps_per_epoch=10 ** 6)
    params = to_f32(params)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       batch_stats=to_f32(batch_stats),
                       opt_state=tx.init(params), rng=RNG)
    step = make_train_step(model, tx, cfg, donate=False)
    twin.init_optimizer(cfg.learning_rate)

    t_losses, j_losses, diffs = [], [], []
    for k in range(steps):
        batch = batches[k % len(batches)]
        noise = tie_noise(RNG, k, cfg)
        t_loss = twin.train_step(batch, noise)
        state, metrics = step(state, {k_: jnp.asarray(v)
                                      for k_, v in batch.items()})
        j_loss = float(metrics["loss"])
        t_losses.append(t_loss)
        j_losses.append(j_loss)
        diffs.append(abs(j_loss - t_loss) / abs(t_loss))
        if (k + 1) % 25 == 0:
            print(f"    step {k+1:4d}: torch {t_loss:.6f} jax {j_loss:.6f} "
                  f"rel {diffs[-1]:.2e}", flush=True)
    return {"torch_losses": t_losses, "jax_losses": j_losses,
            "rel_diffs": diffs}


def main():
    args = sys.argv[1:]
    steps = int(args[0]) if args and args[0].isdigit() else 200
    variants = [a for a in args if not a.isdigit()] or list(VARIANTS)

    results = {}
    for v in variants:
        print(f"== {v}: f64 single-step gradient parity", flush=True)
        loss_rel, grads = f64_step(v)
        print(f"    loss rel {loss_rel:.2e}; grads "
              f"{ {k: f'{e:.1e}' for k, e in grads.items()} }", flush=True)
        print(f"== {v}: f32 {steps}-step trajectory", flush=True)
        traj = f32_trajectory(v, steps)
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
