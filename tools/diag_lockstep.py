"""Diagnose lockstep gradient error structure: per-leaf rel-L2 vs max-norm,
and whether the error is spread (backend rounding) or concentrated in few
elements (argmin tie flips in min-reprojection)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tools.lockstep_oracle import TorchTwin, make_lockstep_batches, tie_noise, variant_config
from monodepth_tpu.training.state import build_model
from monodepth_tpu.training.step import _loss_from_outputs, apply_and_warp


def main(variant="separate", mode="f32"):
    double = mode == "f64"
    if double:
        jax.config.update("jax_enable_x64", True)
    dt = np.float64 if double else np.float32
    cfg = variant_config(variant)
    twin = TorchTwin(variant, cfg, seed=0, double=double)
    params, batch_stats = twin.flax_variables()
    if double:
        from monodepth_tpu.models.monodepth import Monodepth

        model = Monodepth(num_layers=cfg.num_layers, scales=cfg.scales,
                          frame_ids=cfg.frame_ids, pose_type=cfg.pose_type,
                          pose_frames=cfg.pose_frames, dtype=jnp.float64,
                          nchw_decoder=cfg.nchw_decoder)
    else:
        model = build_model(cfg)
    batch = make_lockstep_batches(cfg, 1, seed=0)[0]
    for k in ("jitter", "K", "inv_K", "stereo_T"):
        if k in batch:
            batch[k] = batch[k].astype(dt)
    RNG = jax.random.PRNGKey(7)
    noise = tie_noise(RNG, 0, cfg, dt)

    t_loss = twin.loss(batch, noise)
    t_loss.backward()
    t_loss = t_loss.detach()
    t_grads = twin.grads_flax()

    rng = jax.random.fold_in(RNG, 0)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    to_j = lambda t: jax.tree.map(lambda x: jnp.asarray(x, dt), t)

    def loss_fn(p):
        variables = {"params": p, "batch_stats": to_j(batch_stats)}
        out = apply_and_warp(model, variables, batch_j, cfg, train=True)
        return _loss_from_outputs(out, rng, cfg, train=True)[0]

    j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(to_j(params))
    print(f"loss rel diff: {abs(float(j_loss)-float(t_loss))/float(t_loss):.2e}")

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
