"""Trajectory equivalence: the production Pallas warp sampler vs the XLA
packed-gather fallback, same init + same batch stream, N hundred steps.

    python tools/pallas_equivalence.py --steps 300 --out docs/convergence_pallas.md

The Pallas kernel (ops/pallas/warp_sample.py) is exactness-tested per-op
(fwd 2e-7, dgrid 2e-7 rel on chip) — this tool closes the remaining gap
in the quality-evidence chain: that a full TRAINING RUN through the
kernel's custom VJP reaches the same optimization trajectory and the
same converged depth quality as the stock XLA path. The hot op both
implement is the reference's F.grid_sample (model_layer/warp.py:12-14).

Both runs share one initial state and one deterministic batch stream
(synthetic exact-geometry scenes, data/synthetic.py). Reported:

- per-step loss agreement over an early lockstep window (the two
  trajectories are numerically identical until fp chaos amplifies the
  ~1e-7 sampler difference — same shape as the torch-lockstep study in
  docs/PARITY.md),
- loss-curve correlation over the whole run,
- converged loss windows and per-scene depth Spearman for both samplers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monodepth_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()


def main():
    import jax
    import numpy as np

    from monodepth_tpu.utils.platform import enable_compile_cache

    enable_compile_cache("/tmp/monodepth_proof_cache")

    from monodepth_tpu.config import Config
    from monodepth_tpu.data.synthetic import make_planar_scenes, spearman_rank
    from monodepth_tpu.training.state import (
        build_model,
        create_state,
        make_optimizer,
    )
    from monodepth_tpu.training.step import (
        _make_sampler,
        make_infer_step,
        make_train_step,
    )

    p = argparse.ArgumentParser(description="Pallas-vs-XLA trajectory run")
    p.add_argument("--steps", default=300, type=int)
    p.add_argument("--height", default=96, type=int)
    p.add_argument("--width", default=384, type=int,
                   help="must be kernel-supported (H%%8==0, W%%128==0)")
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--scenes", default=32, type=int)
    p.add_argument("--mode", default="mono", choices=["mono", "stereo"])
    p.add_argument("--precision", default="", choices=["", "bf16", "f32"])
    p.add_argument("--lockstep_window", default=20, type=int,
                   help="steps over which per-step losses must agree "
                        "tightly before fp chaos takes over")
    p.add_argument("--interpret", default=False,
                   type=lambda t: t.lower() in ("1", "true", "yes"),
                   help="Pallas interpret mode (CPU debugging only)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--out", default="", type=str)
    args = p.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    precision = args.precision or ("bf16" if on_tpu else "f32")
    frame_ids = (0, "s") if args.mode == "stereo" else (0, -1, 1)

    def make_cfg(use_pallas: bool) -> Config:
        return Config(height=args.height, width=args.width,
                      batch=args.batch, seed=args.seed, weight_init=False,
                      use_pallas=use_pallas, frame_ids=frame_ids,
                      precision=precision, train_gt_metrics=False,
                      pallas_interpret=args.interpret)

    cfg_pallas, cfg_packed = make_cfg(True), make_cfg(False)
    assert _make_sampler(cfg_pallas, None)[1], \
        "Pallas sampler inactive (unsupported shape/backend)"
    assert not _make_sampler(cfg_packed, None)[1]

    scenes = make_planar_scenes(args.scenes, args.height, args.width,
                                seed=args.seed, tx_sign=1.0)
    batch_keys = ["frames", "jitter", "K", "inv_K"]
    if args.mode == "stereo":
        scenes["frames"] = scenes["frames"][:, [0, 2]]
        stereo_T = np.tile(np.eye(4, dtype=np.float32), (args.scenes, 1, 1))
        stereo_T[:, 0, 3] = scenes["gt_tx"]
        scenes["stereo_T"] = stereo_T
        batch_keys.append("stereo_T")

    # ONE deterministic batch stream, replayed identically by both runs
    rng = np.random.default_rng(args.seed)
    orders = []
    steps_per_epoch = args.scenes // args.batch
    while len(orders) * steps_per_epoch < args.steps:
        orders.append(rng.permutation(args.scenes))
    stream = [perm[s * args.batch:(s + 1) * args.batch]
              for perm in orders for s in range(steps_per_epoch)]

    model = build_model(cfg_pallas)  # cfg geometry identical for both
    tx = make_optimizer(cfg_pallas, steps_per_epoch=args.steps)
    state0 = create_state(cfg_pallas, model, tx)

    def depth_corrs(cfg, st):
        infer = make_infer_step(model, cfg)
        corrs = []
        for start in range(0, args.scenes, args.batch):
            images = scenes["frames"][start:start + args.batch, 0]
            disp = np.asarray(infer(st, images.astype(np.float32) / 255.0))
            for i in range(disp.shape[0]):
                interior = np.s_[4:-4, 8:-8]
                corrs.append(spearman_rank(
                    disp[i][interior],
                    scenes["gt_disp"][start + i][interior]))
        return np.asarray(corrs)

    def run(cfg, label):
        step_fn = make_train_step(model, tx, cfg)
        st = state0
        losses = []
        t0 = time.perf_counter()
        for k in range(args.steps):
            batch = {key: scenes[key][stream[k]] for key in batch_keys}
            st, metrics = step_fn(st, batch)
            losses.append(float(metrics["loss"]))  # value fetch = barrier
            if (k + 1) % 50 == 0:
                print(f"    [{label}] step {k + 1:4d} "
                      f"loss {losses[-1]:.4f}")
        dt = time.perf_counter() - t0
        corr = depth_corrs(cfg, st)
        print(f">>> {label}: {args.steps} steps in {dt:.1f}s, "
              f"final loss {losses[-1]:.4f}, "
              f"depth Spearman {corr.mean():.4f}")
        return np.asarray(losses), corr

    loss_p, corr_p = run(cfg_pallas, "pallas")
    loss_x, corr_x = run(cfg_packed, "packed")

    rel = np.abs(loss_p - loss_x) / np.abs(loss_x)
    W = min(args.lockstep_window, args.steps)
    curve_corr = float(np.corrcoef(loss_p, loss_x)[0, 1])
    tail = max(args.steps // 10, 10)
    tail_p, tail_x = loss_p[-tail:], loss_x[-tail:]
    # Near convergence the per-step loss fluctuates O(30%) around its
    # mean (batch composition + chaos). Two independent-but-identical
    # optimizers land at different points of that noise ball, so their
    # tail MEANS differ by a random offset whose scale is the per-step
    # std divided by sqrt(N_eff) — and N_eff is small (O(few)), because
    # the optimizer state carries memory across steps (losses are
    # strongly autocorrelated; a naive SE with N=tail samples
    # overstates the precision ~10x and flags equivalent twins).
    # Criterion: tail means within ONE per-step std of each other —
    # a bounded-difference equivalence margin, not a significance test
    # (with enough steps ANY harmless systematic offset becomes
    # "significant"; what matters is that the offset is small vs the
    # noise the optimizer itself lives in). The SE-based z stays as a
    # reported diagnostic.
    tail_std = float(max(tail_p.std(), tail_x.std()))
    tail_diff = abs(float(tail_p.mean() - tail_x.mean()))
    tail_se = float(np.sqrt(tail_p.var() / tail + tail_x.var() / tail))
    tail_z = tail_diff / max(tail_se, 1e-12)

    result = {
        "mode": args.mode,
        "steps": args.steps,
        "resolution": f"{args.height}x{args.width}",
        "batch": args.batch,
        "backend": jax.default_backend(),
        "precision": precision,
        # the warp/loss stack runs f32 regardless (apply_and_warp casts),
        # so the step-0 sampler difference is ~1e-6 in BOTH precisions;
        # chaos then amplifies it ~x4/step (measured: 6e-7 -> 1.1e-4 over
        # 4 steps, tests/test_pallas.py calibration) until it saturates
        # around step ~10 — same shape as the torch-lockstep study
        # (docs/PARITY.md), where f32 backend rounding does the seeding.
        "lockstep_first8_rel": [round(float(r), 8) for r in rel[:8]],
        "lockstep_max_rel_dloss": round(float(rel[:W].max()), 8),
        "curve_pearson": round(curve_corr, 6),
        "tail_loss_pallas": round(float(tail_p.mean()), 5),
        "tail_loss_packed": round(float(tail_x.mean()), 5),
        "tail_loss_std_pallas": round(float(tail_p.std()), 5),
        "tail_loss_std_packed": round(float(tail_x.std()), 5),
        "tail_mean_diff_in_stds": round(tail_diff / max(tail_std, 1e-12), 3),
        "tail_mean_zscore_diag": round(tail_z, 3),
        "depth_spearman_pallas": round(float(corr_p.mean()), 4),
        "depth_spearman_packed": round(float(corr_x.mean()), 4),
        "depth_spearman_min_pallas": round(float(corr_p.min()), 4),
        "depth_spearman_min_packed": round(float(corr_x.min()), 4),
        "depth_spearman_mean_abs_diff":
            round(float(np.abs(corr_p - corr_x).mean()), 4),
    }
    # pass = the three claims the run is meant to establish, each sized
    # to MEASURED twin-run behavior (docs/PARITY.md torch-lockstep study;
    # on-chip runs r5):
    #  (1) numerically-lockstep start: the first optimizer steps agree to
    #      f32-rounding scale (step-0 rel ~1e-6; rtol 1e-3 holds through
    #      step ~4 before x4/step chaos escapes any tolerance — identical
    #      to the committed CPU lockstep test's calibrated window);
    #  (2) statistically identical curves: Pearson over the full run.
    #      The torch study measured 0.94-0.998 for KNOWN-equivalent
    #      twins; require > 0.94;
    #  (3) same converged quality: tail loss means within one per-step
    #      std of each other (the noise scale the optimizer itself
    #      fluctuates at; see the margin note above) and per-scene
    #      depth Spearman within 0.02.
    result["pass"] = bool(
        max(result["lockstep_first8_rel"][:4]) < 1e-3
        and curve_corr > 0.94
        and tail_diff < tail_std
        and abs(result["depth_spearman_pallas"]
                - result["depth_spearman_packed"]) < 0.02)
    print(json.dumps(result))

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(
                "# Pallas warp sampler: training-trajectory equivalence\n\n"
                "Same init, same deterministic batch stream, two full "
                "training runs — the production Pallas candidate-select "
                "sampler vs the XLA packed gather. The kernel's custom "
                "VJP is the one place a silent training-quality bug could "
                "hide (its per-op parity is 2e-7); this run binds it into "
                "the convergence evidence end-to-end.\n\n"
                f"Command: `python tools/pallas_equivalence.py --mode "
                f"{args.mode} --steps {args.steps} --height {args.height} "
                f"--width {args.width} --batch {args.batch}`\n\n"
                "| quantity | value |\n|---|---|\n"
                + "".join(f"| {k} | {v} |\n" for k, v in result.items())
                + "\nlockstep_first8_rel are the per-step loss rel diffs "
                "over the first 8 steps: step 0 sits at f32-rounding "
                "scale (the warp/loss stack is f32 in both precisions), "
                "then chaos amplifies ~x4/step until it saturates — the "
                "same divergence shape as the torch-lockstep study in "
                "docs/PARITY.md, whose measured twin-run envelope "
                "(curve Pearson 0.94-0.998) sizes the curve criterion. "
                "tail_mean_diff_in_stds compares converged tail-window "
                "means against the per-step loss noise (a bounded-"
                "difference equivalence margin; the SE-based z is kept "
                "as a diagnostic only — tail losses are autocorrelated "
                "through the optimizer state, so the naive SE "
                "overstates precision). Depth Spearman is "
                "per-scene rank correlation against the GT inverse-depth "
                "plane.\n")
        print(f">>> wrote {args.out}")
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
