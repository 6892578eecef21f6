"""Hermetic convergence proof: train on exact synthetic geometry, assert
the loss drops and predicted depth rank-correlates with ground truth.

    python tools/convergence_proof.py --steps 600 --out docs/convergence.md

No KITTI data is needed: `make_planar_scenes` renders multi-view scenes
whose photometric minimum provably sits at the GT (inverse-depth plane,
affine-exact source views — see data/synthetic.py). This is the
trainability evidence the reference carries as its shipped 24-epoch
KITTI curves (model_save/mono/loss/*.npy, README.md:65-74), obtainable
offline. Depth is only identifiable up to global scale (the usual
monodepth ambiguity), so the depth check is Spearman rank correlation,
and the pose check is the tx ratio between predicted and GT translation.
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
    from monodepth_tpu.training.step import make_infer_step, make_train_step

    p = argparse.ArgumentParser(description="hermetic convergence proof")
    p.add_argument("--mode", default="stereo", choices=["stereo", "mono"],
                   help="stereo: frame (0,'s') with the GT baseline "
                        "transform fed as stereo_T — pose is known, depth "
                        "must emerge through the warp (well-conditioned). "
                        "mono: (0,-1,1) with the pose net in the loop — "
                        "the full joint problem, needs several thousand "
                        "steps from scratch")
    p.add_argument("--steps", default=600, type=int)
    p.add_argument("--height", default=96, type=int)
    p.add_argument("--width", default=320, type=int)
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--scenes", default=32, type=int)
    p.add_argument("--learning_rate", default=1e-4, type=float)
    p.add_argument("--use_automasking", default=True,
                   type=lambda t: t.lower() in ("1", "true", "yes"),
                   help="False isolates whether stuck scenes are "
                        "automask/min local minima")
    p.add_argument("--augment", default=False,
                   type=lambda t: t.lower() in ("1", "true", "yes"),
                   help="per-step device-side color jitter (real training "
                        "has it; adds SGD stochasticity that can free "
                        "min-reprojection local minima)")
    p.add_argument("--frames", default="", type=str,
                   help="mono-mode temporal frame ids, e.g. '0 1' or "
                        "'0 -1' (default '0 -1 1'). Single-source runs "
                        "isolate the invert (past) vs no-invert (future) "
                        "pose wiring when chasing sign asymmetries")
    p.add_argument("--tx_sign", default=0.0, type=float,
                   help="force every scene's translation direction "
                        "(+1/-1); 0 = random per scene. Random signs are "
                        "adversarial for joint mono (pose sign lock-in, "
                        "see data/synthetic.py); a consistent sign is the "
                        "production-realistic regime (KITTI ego-motion)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--precision", default="", choices=["", "bf16", "f32"],
                   help="compute dtype; default bf16 on TPU / f32 on CPU "
                        "(matches real training). Explicit f32 on TPU "
                        "isolates whether a plateau is bf16-rounding")
    p.add_argument("--use_pallas", default=False,
                   type=lambda t: t.lower() in ("1", "true", "yes"),
                   help="run the PRODUCTION Pallas warp sampler (needs a "
                        "kernel-supported shape: H%%8==0, W%%128==0 — e.g. "
                        "--width 384). Default False = the XLA packed "
                        "gather, so CPU runs work unchanged; True binds "
                        "the kernel's custom VJP into the convergence "
                        "evidence (docs/convergence_pallas.md)")
    p.add_argument("--out", default="", type=str,
                   help="write a markdown report here")
    args = p.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    if args.mode == "stereo":
        frame_ids = (0, "s")
    elif args.frames:
        frame_ids = tuple(int(f) for f in args.frames.split())
        assert frame_ids[0] == 0 and set(frame_ids) <= {0, -1, 1}
    else:
        frame_ids = (0, -1, 1)
    precision = args.precision or ("bf16" if on_tpu else "f32")
    cfg = Config(height=args.height, width=args.width, batch=args.batch,
                 learning_rate=args.learning_rate, seed=args.seed,
                 weight_init=False, use_pallas=args.use_pallas,
                 frame_ids=frame_ids,
                 use_automasking=args.use_automasking,
                 precision=precision,
                 train_gt_metrics=False)
    if args.use_pallas:
        from monodepth_tpu.training.step import _make_sampler

        assert _make_sampler(cfg, None)[1], \
            (f"--use_pallas given but the kernel sampler is inactive "
             f"(shape {args.height}x{args.width} supported? backend "
             f"{jax.default_backend()}) — the proof would silently test "
             f"the fallback")
    print(f">>> backend {jax.default_backend()}, "
          f"{args.scenes} scenes at {args.height}x{args.width}, "
          f"batch {args.batch}, {args.steps} steps")

    scenes = make_planar_scenes(args.scenes, args.height, args.width,
                                seed=args.seed, tx_sign=args.tx_sign)
    if args.mode == "mono" and frame_ids != (0, -1, 1):
        slot = {0: 0, -1: 1, 1: 2}
        scenes["frames"] = scenes["frames"][:, [slot[f] for f in frame_ids]]
    if args.mode == "stereo":
        # slot 2 is the +tx view; feed it as the "s" frame with its GT
        # fixed-baseline transform (the training step consumes stereo_T
        # verbatim for fid "s", training/step.py)
        scenes["frames"] = scenes["frames"][:, [0, 2]]
        stereo_T = np.tile(np.eye(4, dtype=np.float32),
                           (args.scenes, 1, 1))
        stereo_T[:, 0, 3] = scenes["gt_tx"]
        scenes["stereo_T"] = stereo_T
    model = build_model(cfg)
    # Constant lr for the whole proof: steps_per_epoch=steps keeps the
    # StepLR(15 epochs) decay from ever firing. Passing the literal
    # scenes/batch (= 4 steps/"epoch") decayed lr 10x every 60 steps —
    # by step ~180 lr was 1e-7 and the run was frozen, which is exactly
    # why the round-2 mono proof plateaued at Spearman 0.59 "across runs
    # and step counts" (docs/convergence_mono.md history). The schedule
    # is an artifact of the reference's 26k-image epochs (loader.py:
    # 106-108), not part of what this proof demonstrates.
    tx = make_optimizer(cfg, steps_per_epoch=args.steps)
    state = create_state(cfg, model, tx)
    train_step = make_train_step(model, tx, cfg)
    infer = make_infer_step(model, cfg)

    batch_keys = ("frames", "jitter", "K", "inv_K") + (
        ("stereo_T",) if args.mode == "stereo" else ())

    aug_rng = np.random.default_rng(args.seed + 1)

    def batch_at(order, start):
        idx = order[start:start + args.batch]
        batch = {k: scenes[k][idx] for k in batch_keys}
        if args.augment:
            B = len(idx)
            jit = np.ones((B, 5), np.float32)
            jit[:, 1:4] = aug_rng.uniform(0.8, 1.2, (B, 3))
            jit[:, 4] = aug_rng.uniform(-0.1, 0.1, B)
            batch["jitter"] = jit
        return batch

    def depth_corrs(st):
        """Per-scene Spearman(pred disparity, gt disparity), interior."""
        corrs = []
        for start in range(0, args.scenes, args.batch):
            images = scenes["frames"][start:start + args.batch, 0]
            disp = np.asarray(infer(st, images.astype(np.float32) / 255.0))
            for i in range(disp.shape[0]):
                n = start + i
                interior = np.s_[4:-4, 8:-8]
                corrs.append(spearman_rank(disp[i][interior],
                                           scenes["gt_disp"][n][interior]))
        return np.asarray(corrs)

    corr0 = depth_corrs(state)
    rng = np.random.default_rng(args.seed)
    losses = []
    t0 = time.perf_counter()
    step = 0
    while step < args.steps:
        order = rng.permutation(args.scenes)
        for start in range(0, args.scenes - args.batch + 1, args.batch):
            if step >= args.steps:
                break
            state, metrics = train_step(state, batch_at(order, start))
            losses.append(float(metrics["loss"]))  # value fetch = barrier
            step += 1
            if step % 50 == 0 or step == 1:
                print(f"    step {step:4d} loss {losses[-1]:.4f}")
    train_time = time.perf_counter() - t0

    corr1 = depth_corrs(state)
    bad = [(i, round(float(c), 2), round(float(scenes["gt_tx"][i]), 4))
           for i, c in enumerate(corr1) if c < 0.5]
    if bad:
        print(f"    scenes with corr < 0.5 (idx, corr, gt_tx): {bad}")
    # collapse diagnostic: a flat disparity field gives corr ~ 0
    disp = np.asarray(infer(
        state, scenes["frames"][:args.batch, 0].astype(np.float32) / 255.0))
    print(f"    pred scaled-disp mean {disp.mean():.3f} "
          f"per-image std {disp.std(axis=(1, 2)).mean():.4f} "
          f"(gt plane std {scenes['gt_disp'][:args.batch].std(axis=(1, 2)).mean():.4f})")
    loss0 = float(np.mean(losses[:10]))
    loss1 = float(np.mean(losses[-10:]))

    # pass = the loss drops materially AND depth rank-correlation improves
    # far beyond the untrained baseline (the tint cue gives a random net
    # ~0.4 already) with no inverted scenes. Measured plateaus with the
    # constant-lr fix: stereo 0.994 mean / 0.984 min, mono 0.998 / 0.995
    # over 32 scenes (docs/convergence_{stereo,mono}.md) — the bar below
    # is deliberately looser; it flags trainability failures, not the
    # double-bilinear loss floor.
    ok_loss = loss1 < 0.5 * loss0
    ok_corr = (float(corr1.mean()) > 0.75
               and float(corr1.mean() - corr0.mean()) > 0.25
               and float(corr1.min()) > 0.0)
    result = {
        "mode": args.mode,
        "steps": args.steps,
        "resolution": f"{args.height}x{args.width}",
        "batch": args.batch,
        "backend": jax.default_backend(),
        "precision": precision,
        "use_pallas": args.use_pallas,
        "frame_ids": list(map(str, frame_ids)),
        "tx_sign": args.tx_sign,
        "loss_first10": round(loss0, 4),
        "loss_last10": round(loss1, 4),
        "loss_ratio": round(loss1 / loss0, 4),
        "rank_corr_untrained_mean": round(float(corr0.mean()), 4),
        "rank_corr_trained_mean": round(float(corr1.mean()), 4),
        "rank_corr_trained_min": round(float(corr1.min()), 4),
        "train_seconds": round(train_time, 1),
        "pass": bool(ok_loss and ok_corr),
        # per-scene detail so plateaus can be compared scene-by-scene
        # against the torch oracle (tools/torch_oracle_mono.py)
        "per_scene_corr": [round(float(c), 3) for c in corr1],
    }
    print(json.dumps(result))

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(
                "# Hermetic convergence proof\n\n"
                "Self-supervised training on exact synthetic geometry "
                "(`make_planar_scenes`): the photometric minimum sits at "
                "the GT inverse-depth plane by construction, so loss "
                "decrease + depth rank-correlation demonstrates the full "
                "train stack (model -> warp -> min-reprojection/automask "
                "loss -> Adam) optimizes toward true geometry.\n\n"
                f"Command: `python tools/convergence_proof.py --mode "
                f"{args.mode} --steps {args.steps} --height {args.height} "
                f"--width {args.width} --batch {args.batch} --scenes "
                f"{args.scenes} --use_pallas {args.use_pallas}`\n\n"
                "| quantity | value |\n|---|---|\n"
                + "".join(f"| {k} | {v} |\n" for k, v in result.items()
                          if k != "per_scene_corr")
                + "\nPer-scene Spearman: "
                + " ".join(str(c) for c in result["per_scene_corr"]) + "\n"
                + "\nSpearman is scale-free (monodepth depth is only "
                "identifiable up to global scale). Untrained correlation "
                "is the null baseline.\n")
        print(f">>> wrote {args.out}")
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
