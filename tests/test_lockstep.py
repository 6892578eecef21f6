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

The comparison drivers live in tools/lockstep_oracle.py (shared with the
200-step documentation run, tools/lockstep_parity.py, whose results are
in docs/PARITY.md); this file only asserts. The CI trajectory stays short
(LOCKSTEP_STEPS, default 12).
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.lockstep_oracle import (  # noqa: E402
    VARIANTS,
    lockstep_single_step,
    lockstep_trajectory,
)

STEPS = int(os.environ.get("LOCKSTEP_STEPS", "12"))


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
    res = lockstep_single_step(variant, double=True)

    # the twin really ran in f64 (grads convert via the production
    # importers, which must preserve the dtype)
    assert all(np.asarray(g).dtype == np.float64
               for m in res["t_grads"].values() for g in jax.tree.leaves(m))

    rel = abs(res["j_loss"] - res["t_loss"]) / abs(res["t_loss"])
    assert rel < 1e-12, (res["j_loss"], res["t_loss"])

    errs = _grad_err(res["j_grads"], res["t_grads"])
    for mod, err in errs.items():
        assert err < 1e-10, (mod, errs)


@pytest.mark.parametrize("variant", VARIANTS)
def test_lockstep_trajectory(variant):
    """STEPS Adam steps in lockstep at f32 (production precision): the
    converted tree must BE the model's tree (check_structure, the importer
    completeness guard), step-0 losses must agree to the f32 rounding
    floor, and per-step losses must track inside a rounding-growth
    envelope (spread backend rounding — measured ~4e-3 rel-L2 per
    gradient, diag_lockstep.py — compounds through Adam's per-parameter
    rescaling; a framework bug shows up orders of magnitude above this).
    The 200-step documented run is tools/lockstep_parity.py."""
    diffs = lockstep_trajectory(variant, STEPS, num_batches=4,
                                check_structure=True)["rel_diffs"]
    assert diffs[0] < 1e-5, diffs
    # growth envelope: f32 backend noise compounds through Adam's
    # rescaling; a framework bug shows up orders of magnitude above this
    assert max(diffs) < 3e-3, diffs
