"""Lockstep train-step parity vs a torch twin, from a shared converted init.

The strongest KITTI-free accuracy evidence: both frameworks start from ONE
weight set (torch default init, converted by utils/torch_import.py), see
the SAME synthetic batch and the SAME tie-break noise, and must produce

  (a) the same loss and per-module parameter gradients — compared in
      FLOAT64, where backend rounding vanishes and only semantics remain
      (measured floor ~3e-14 rel-L2, tools/diag_lockstep.py; in f32 the
      same comparison bottoms out at ~4e-3 of spread backend rounding,
      which would hide real formulation drift),
  (b) the same per-step loss trajectory under Adam in f32 (production
      precision), within a rounding-growth envelope,

for all four model variants (separate / shared / posecnn / stereo).
Module-level parity (test_models.py) + loss-assembly parity
(test_parity_loss.py) compose into training-dynamics parity here — the
closest obtainable proxy for the reference's published KITTI metrics
(reference: model_tool/processor.py:166-218 + model_train.py:64-71).

The CI run keeps trajectories short (LOCKSTEP_STEPS, default 12); the
200-step documentation run lives in tools/lockstep_parity.py and its
results in docs/PARITY.md.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.lockstep_oracle import (  # noqa: E402
    VARIANTS,
    TorchTwin,
    make_lockstep_batches,
    tie_noise,
    variant_config,
)
from monodepth_tpu.training.state import (  # noqa: E402
    TrainState,
    build_model,
    make_optimizer,
)
from monodepth_tpu.training.step import (  # noqa: E402
    _loss_from_outputs,
    apply_and_warp,
    make_train_step,
)

STEPS = int(os.environ.get("LOCKSTEP_STEPS", "12"))
RNG = jax.random.PRNGKey(7)  # the TrainState rng both sides draw noise from


def _grad_err(ours, theirs):
    """Per-module normalized error: max over leaves of
    max|a-b| / max|b| (b = torch grad)."""
    out = {}
    for mod in theirs:
        errs = []
        for a, b in zip(jax.tree.leaves(ours[mod]),
                        jax.tree.leaves(theirs[mod])):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            scale = np.abs(b).max()
            errs.append(np.abs(a - b).max() / (scale + 1e-30))
        out[mod] = max(errs)
    return out


@pytest.mark.parametrize("variant", VARIANTS)
def test_lockstep_loss_and_gradients_f64(variant):
    """One f64 train-step: loss to ~1e-12, every module's gradient to
    ~1e-10 max-norm — semantic identity of the full training graph
    (forward + pose wiring + warp + loss + backward) vs torch."""
    with jax.enable_x64(True):
        from monodepth_tpu.models.monodepth import Monodepth

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

        # ----- torch side: loss + grads (f64 params; grads convert via
        # the production importers, which preserve f64)
        t_loss = twin.loss(batch, noise)
        t_loss.backward()
        t_loss = t_loss.detach()
        t_grads = twin.grads_flax()
        assert all(g.dtype == np.float64
                   for m in t_grads.values() for g in jax.tree.leaves(m))

        # ----- jax side: the framework's own loss graph (training/step.py)
        rng = jax.random.fold_in(RNG, 0)
        batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
        to_j = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jnp.asarray(x, jnp.float64), t)

        def loss_fn(p):
            variables = {"params": p, "batch_stats": to_j(batch_stats)}
            out = apply_and_warp(model, variables, batch_j, cfg, train=True)
            loss, _ = _loss_from_outputs(out, rng, cfg, train=True)
            return loss

        j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(to_j(params))

        rel = abs(float(j_loss) - float(t_loss)) / abs(float(t_loss))
        assert rel < 1e-12, (float(j_loss), float(t_loss))

        errs = _grad_err(j_grads, t_grads)
        for mod, err in errs.items():
            assert err < 1e-10, (mod, errs)


@pytest.mark.parametrize("variant", VARIANTS)
def test_lockstep_trajectory(variant):
    """STEPS Adam steps in lockstep at f32 (production precision): the
    converted tree must BE the model's tree, step-0 losses must agree to
    the f32 rounding floor, and per-step losses must track inside a
    rounding-growth envelope (spread backend rounding — measured ~4e-3
    rel-L2 per gradient, diag_lockstep.py — compounds through Adam's
    per-parameter rescaling; a framework bug shows up orders of magnitude
    above this). The 200-step documented run is tools/lockstep_parity.py."""
    cfg = variant_config(variant)
    twin = TorchTwin(variant, cfg, seed=0)
    params, batch_stats = twin.flax_variables()
    model = build_model(cfg)
    batches = make_lockstep_batches(cfg, num_batches=4, seed=0)

    # the converted tree IS the model's tree (importer completeness guard)
    ref = model.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, len(cfg.frame_ids), cfg.height,
                                cfg.width, 3), jnp.float32), train=False)
    assert jax.tree.structure(params) == jax.tree.structure(
        dict(ref["params"]))
    assert jax.tree.structure(batch_stats) == jax.tree.structure(
        dict(ref["batch_stats"]))

    to_f32 = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jnp.asarray(x, jnp.float32), t)
    tx = make_optimizer(cfg, steps_per_epoch=10 ** 6)  # constant lr window
    params = to_f32(params)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       batch_stats=to_f32(batch_stats),
                       opt_state=tx.init(params), rng=RNG)
    step = make_train_step(model, tx, cfg, donate=False)
    twin.init_optimizer(cfg.learning_rate)

    diffs = []
    for k in range(STEPS):
        batch = batches[k % len(batches)]
        noise = tie_noise(RNG, k, cfg)
        t_loss = twin.train_step(batch, noise)
        state, metrics = step(state, {k_: jnp.asarray(v)
                                      for k_, v in batch.items()})
        j_loss = float(metrics["loss"])
        diffs.append(abs(j_loss - t_loss) / abs(t_loss))

    assert diffs[0] < 1e-5, diffs
    # growth envelope: f32 backend noise compounds through Adam's
    # rescaling; a framework bug shows up orders of magnitude above this
    assert max(diffs) < 3e-3, diffs
