"""Torch-CPU oracle for the hermetic mono convergence proof.

Trains a hand-built torch Monodepth2 (ResNet-18 encoder, official depth
decoder, separate 2-image pose ResNet + PoseDecoder — the same modules
tests/test_models.py proves numerically equivalent to ours) on the SAME
32 synthetic scenes, batch schedule, Adam(1e-4, constant), and loss
assembly as tools/convergence_proof.py --mode mono, then reports the
same per-scene Spearman metric.

Purpose (round-3 adjudication): if torch plateaus where the jax run
plateaus, the plateau is method-inherent (min-reprojection local minima
of the published objective on these scenes); if torch sails past it,
the gap is a framework bug. Run:

    python tools/torch_oracle_mono.py --steps 2000 --out /tmp/oracle.json

Pure torch CPU — hours on a 1-CPU box; keep the machine otherwise idle.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # never touch the TPU tunnel

    import numpy as np
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    # scene generator + metric come from the package (numpy-only paths);
    # torch module builders from the parity-test suite
    from monodepth_tpu.data.synthetic import make_planar_scenes, spearman_rank
    import test_models as tm

    p = argparse.ArgumentParser()
    p.add_argument("--steps", default=2000, type=int)
    p.add_argument("--height", default=96, type=int)
    p.add_argument("--width", default=320, type=int)
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--scenes", default=32, type=int)
    p.add_argument("--learning_rate", default=1e-4, type=float)
    p.add_argument("--tx_sign", default=0.0, type=float,
                   help="force every scene's translation direction "
                        "(mirrors convergence_proof.py --tx_sign)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--threads", default=0, type=int,
                   help=">0: torch.set_num_threads")
    p.add_argument("--out", default="", type=str)
    args = p.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)

    H, W = args.height, args.width
    MIN_DEPTH, MAX_DEPTH = 0.1, 100.0  # Config defaults (training range)
    SCALES = (0, 1, 2, 3)
    SMOOTHNESS = 1e-3

    scenes = make_planar_scenes(args.scenes, H, W, seed=args.seed,
                                tx_sign=args.tx_sign)
    frames = torch.from_numpy(
        scenes["frames"].astype(np.float32) / 255.0).permute(0, 1, 4, 2, 3)
    K_t = torch.from_numpy(scenes["K"])        # [N, 4, 4]
    inv_K_t = torch.from_numpy(scenes["inv_K"])

    torch.manual_seed(args.seed)
    encoder = tm._torch_resnet(18)
    decoder = tm._torch_depth_decoder([64, 64, 128, 256, 512])
    pose_encoder = tm._torch_resnet(18, in_images=2)
    pose_decoder = tm._torch_pose_decoder([64, 64, 128, 256, 512], 1, 2)
    modules = tnn.ModuleList([encoder, decoder, pose_encoder, pose_decoder])
    opt = torch.optim.Adam(modules.parameters(), lr=args.learning_rate)

    def depth_net(x):
        # the reference normalizes inside the encoder
        return decoder(encoder((x - 0.45) / 0.225))

    def pose_net(pair):
        aa, t = pose_decoder([pose_encoder((pair - 0.45) / 0.225)])
        return aa[:, 0, 0], t[:, 0, 0]

    def from_parameters(aa, t, invert):
        """transform_from_parameters twin (Rodrigues + translation;
        reference: model_layer/warp.py:100-160)."""
        B = aa.shape[0]
        angle = torch.norm(aa, dim=1, keepdim=True).clamp(min=1e-7)
        axis = aa / angle
        ca, sa = torch.cos(angle), torch.sin(angle)
        C = 1 - ca
        x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
        ca, sa, C = ca[:, 0], sa[:, 0], C[:, 0]
        R = torch.stack([
            x * x * C + ca, x * y * C - z * sa, x * z * C + y * sa,
            y * x * C + z * sa, y * y * C + ca, y * z * C - x * sa,
            z * x * C - y * sa, z * y * C + x * sa, z * z * C + ca,
        ], dim=1).reshape(B, 3, 3)
        if invert:
            R = R.transpose(1, 2)
            t = -torch.bmm(R, t.unsqueeze(-1)).squeeze(-1)
        T = torch.eye(4).repeat(B, 1, 1)
        T[:, :3, :3] = R
        T[:, :3, 3] = t
        return T

    def ssim(x, y):
        pad = tnn.ReflectionPad2d(1)
        pool = tnn.AvgPool2d(3, 1)
        x, y = pad(x), pad(y)
        mu_x, mu_y = pool(x), pool(y)
        sigma_x = pool(x ** 2) - mu_x ** 2
        sigma_y = pool(y ** 2) - mu_y ** 2
        sigma_xy = pool(x * y) - mu_x * mu_y
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
        d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
        return torch.clamp((1 - n / d) / 2, 0, 1)

    def reproj_err(pred, target):
        return (0.85 * ssim(pred, target).mean(1, True)
                + 0.15 * torch.abs(target - pred).mean(1, True))

    ys_g, xs_g = torch.meshgrid(torch.arange(H), torch.arange(W),
                                indexing="ij")
    pix = torch.stack([xs_g, ys_g, torch.ones_like(xs_g)], 0) \
        .reshape(3, -1).float()
    wh = torch.tensor([W - 1, H - 1]).float()

    def warp(src, depth, K, inv_K, T):
        B = src.shape[0]
        cam = inv_K[:, :3, :3] @ pix * depth.reshape(B, 1, -1)
        cam = torch.cat([cam, torch.ones(B, 1, H * W)], 1)
        P = (K @ T)[:, :3]
        proj = P @ cam
        xy = proj[:, :2] / (proj[:, 2:3] + 1e-7)
        grid = (2 * xy.reshape(B, 2, H, W).permute(0, 2, 3, 1) / wh) - 1
        return F.grid_sample(src, grid, mode="bilinear",
                             padding_mode="border", align_corners=True)

    g = torch.Generator().manual_seed(args.seed + 7)

    def total_loss(batch_frames, K, inv_K):
        target = batch_frames[:, 0]
        sources = {-1: batch_frames[:, 1], 1: batch_frames[:, 2]}
        disps = depth_net(target)
        poses = {}
        for fid in (-1, 1):
            pair = (sources[fid], target) if fid < 0 else (target, sources[fid])
            aa, t = pose_net(torch.cat(pair, 1))
            poses[fid] = from_parameters(aa, t, invert=fid < 0)

        identity = torch.cat(
            [reproj_err(sources[f], target) for f in (-1, 1)], 1)
        total = 0.0
        for s in SCALES:
            disp_full = F.interpolate(disps[s], (H, W), mode="bilinear",
                                      align_corners=False) if s else disps[0]
            min_d, max_d = 1 / MAX_DEPTH, 1 / MIN_DEPTH
            depth = 1.0 / (min_d + (max_d - min_d) * disp_full)
            reproj = torch.cat(
                [reproj_err(warp(sources[f], depth, K, inv_K, poses[f]),
                            target) for f in (-1, 1)], 1)
            noise = 1e-5 * torch.randn(identity.shape, generator=g)
            combined = torch.cat([identity + noise, reproj], 1)
            photometric = combined.min(1)[0].mean()

            disp_s = disps[s]
            color_s = F.interpolate(target, disp_s.shape[-2:], mode="area") \
                if s else target
            norm = disp_s / (disp_s.mean((2, 3), True) + 1e-7)
            gx = torch.abs(norm[..., :-1] - norm[..., 1:])
            gy = torch.abs(norm[..., :-1, :] - norm[..., 1:, :])
            ix = torch.abs(color_s[..., :-1] - color_s[..., 1:]).mean(1, True)
            iy = torch.abs(color_s[..., :-1, :] - color_s[..., 1:, :]).mean(1, True)
            smooth = (gx * torch.exp(-ix)).mean() + (gy * torch.exp(-iy)).mean()
            total = total + photometric + SMOOTHNESS * smooth / (2 ** s)
        return total / len(SCALES)

    def depth_corrs():
        corrs = []
        with torch.no_grad():
            for start in range(0, args.scenes, args.batch):
                disp = depth_net(frames[start:start + args.batch, 0])[0]
                for i in range(disp.shape[0]):
                    n = start + i
                    interior = np.s_[4:-4, 8:-8]
                    corrs.append(spearman_rank(
                        disp[i, 0].numpy()[interior],
                        scenes["gt_disp"][n][interior]))
        return np.asarray(corrs)

    corr0 = depth_corrs()
    print(f">>> torch oracle: {args.scenes} scenes {H}x{W} batch "
          f"{args.batch} steps {args.steps} (untrained corr "
          f"{corr0.mean():.3f})", flush=True)

    rng = np.random.default_rng(args.seed)
    losses = []
    t0 = time.perf_counter()
    step = 0
    while step < args.steps:
        order = rng.permutation(args.scenes)
        for start in range(0, args.scenes - args.batch + 1, args.batch):
            if step >= args.steps:
                break
            idx = order[start:start + args.batch]
            loss = total_loss(frames[idx], K_t[idx], inv_K_t[idx])
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
            step += 1
            if step % 50 == 0 or step == 1:
                el = time.perf_counter() - t0
                print(f"    step {step:4d} loss {losses[-1]:.4f} "
                      f"({el / step:.2f} s/step)", flush=True)
            if step % 250 == 0:
                # periodic per-scene signal so an interrupted run still
                # adjudicates (a 2000-step run is hours on 1 CPU)
                c = depth_corrs()
                stuck = [(i, round(float(ci), 2),
                          round(float(scenes["gt_tx"][i]), 4))
                         for i, ci in enumerate(c) if ci < 0.5]
                print(f"    [corr @ {step}] mean {c.mean():.3f} "
                      f"min {c.min():.3f} stuck<0.5: {stuck}", flush=True)

    corr1 = depth_corrs()
    result = {
        "framework": "torch-cpu",
        "steps": args.steps,
        "loss_first10": round(float(np.mean(losses[:10])), 4),
        "loss_last10": round(float(np.mean(losses[-10:])), 4),
        "rank_corr_untrained_mean": round(float(corr0.mean()), 4),
        "rank_corr_trained_mean": round(float(corr1.mean()), 4),
        "rank_corr_trained_min": round(float(corr1.min()), 4),
        "train_seconds": round(time.perf_counter() - t0, 1),
        "per_scene_corr": [round(float(c), 3) for c in corr1],
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
