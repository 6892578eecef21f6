"""Full loss-assembly parity vs a torch oracle.

Reimplements the reference's post-network compute graph in torch (warp +
loss assembly; reference: model_tool/processor.py:139-218 and
model_loss/model_loss.py) and checks our jax pipeline produces the same
total loss on identical inputs — the end-to-end guarantee that the
pieces (SSIM, grid-sample, resize, min-reprojection, smoothness) compose
in the same order with the same conventions. Tie-break noise is disabled
on both sides (it's 1e-5-scale and RNG-framework-specific).
"""

import numpy as np
import flax.linen  # noqa: F401
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from monodepth_tpu.losses.reprojection import monodepth_loss
from monodepth_tpu.ops.geometry import (
    disparity_to_depth,
    transform_from_parameters,
    warp_grid,
)
from monodepth_tpu.ops.sampling import pyramid, resize_bilinear

B, H, W = 2, 64, 96
SCALES = (0, 1, 2, 3)
MIN_DEPTH, MAX_DEPTH = 0.1, 100.0
SMOOTHNESS = 1e-3


def _make_inputs(rng):
    """Smooth random colors / disparities / poses / intrinsics."""
    def smooth(shape_hw, c):
        small = rng.uniform(0.1, 0.9, (B, shape_hw[0] // 8,
                                       shape_hw[1] // 8, c))
        t = torch.from_numpy(small.astype(np.float32)).permute(0, 3, 1, 2)
        t = F.interpolate(t, shape_hw, mode="bilinear", align_corners=False)
        return t.permute(0, 2, 3, 1).numpy()

    colors = {fid: smooth((H, W), 3) for fid in (0, -1, 1)}
    disps = {s: smooth((H // 2 ** s, W // 2 ** s), 1) for s in SCALES}
    poses = {fid: (rng.normal(0, 0.01, (B, 3)).astype(np.float32),
                   rng.normal(0, 0.05, (B, 3)).astype(np.float32))
             for fid in (-1, 1)}
    K = np.zeros((B, 4, 4), np.float32)
    K[:] = np.eye(4)
    K[:, 0, 0], K[:, 1, 1] = 0.58 * W, 1.92 * H
    K[:, 0, 2], K[:, 1, 2] = 0.5 * W, 0.5 * H
    inv_K = np.linalg.inv(K).astype(np.float32)
    return colors, disps, poses, K, inv_K


# ---------------------------------------------------------------- torch oracle
class _TorchSSIM(torch.nn.Module):
    """reference: model_loss/model_loss.py:11-41."""

    def forward(self, x, y):
        pad = torch.nn.ReflectionPad2d(1)
        pool = torch.nn.AvgPool2d(3, 1)
        x, y = pad(x), pad(y)
        mu_x, mu_y = pool(x), pool(y)
        sigma_x = pool(x ** 2) - mu_x ** 2
        sigma_y = pool(y ** 2) - mu_y ** 2
        sigma_xy = pool(x * y) - mu_x * mu_y
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
        d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
        return torch.clamp((1 - n / d) / 2, 0, 1)


def _torch_reproj(pred, target):
    ssim = _TorchSSIM()(pred, target).mean(1, True)
    l1 = torch.abs(target - pred).mean(1, True)
    return 0.85 * ssim + 0.15 * l1


def _torch_total_loss(colors, disps, poses, K, inv_K, automask):
    """reference: processor.py:139-218 with zero tie-break noise."""
    t = {fid: torch.from_numpy(c).permute(0, 3, 1, 2) for fid, c in colors.items()}
    K_t = torch.from_numpy(K)
    inv_K_t = torch.from_numpy(inv_K)

    # pairwise transforms (processor.py:99-114 semantics via our op —
    # transform construction itself is covered by test_geometry)
    T = {fid: torch.from_numpy(np.asarray(
        transform_from_parameters(jnp.asarray(aa), jnp.asarray(tr),
                                  invert=fid < 0)))
        for fid, (aa, tr) in poses.items()}

    total = 0.0
    for s in SCALES:
        disp = torch.from_numpy(disps[s]).permute(0, 3, 1, 2)
        disp_full = F.interpolate(disp, (H, W), mode="bilinear",
                                  align_corners=False)
        min_disp, max_disp = 1 / MAX_DEPTH, 1 / MIN_DEPTH
        depth = 1.0 / (min_disp + (max_disp - min_disp) * disp_full)

        reproj = []
        for fid in (-1, 1):
            # backproject/project (warp.py:193-269)
            ys, xs = torch.meshgrid(torch.arange(H), torch.arange(W),
                                    indexing="ij")
            pix = torch.stack([xs, ys, torch.ones_like(xs)], 0).reshape(3, -1).float()
            cam = inv_K_t[:, :3, :3] @ pix * depth.reshape(B, 1, -1)
            cam = torch.cat([cam, torch.ones(B, 1, H * W)], 1)
            P = (K_t @ T[fid])[:, :3]
            proj = P @ cam
            xy = proj[:, :2] / (proj[:, 2:3] + 1e-7)
            xy = xy.reshape(B, 2, H, W).permute(0, 2, 3, 1)
            grid = 2 * xy / torch.tensor([W - 1, H - 1]).float() - 1
            warped = F.grid_sample(t[fid], grid, mode="bilinear",
                                   padding_mode="border", align_corners=True)
            reproj.append(_torch_reproj(warped, t[0]))
        combined = torch.cat(reproj, 1)

        if automask:
            identity = torch.cat(
                [_torch_reproj(t[fid], t[0]) for fid in (-1, 1)], 1)
            combined = torch.cat([identity, combined], 1)
        photometric = combined.min(1)[0].mean()

        # smoothness (model_loss.py:45-88, 107-116)
        color_s = F.interpolate(t[0], disp.shape[-2:], mode="area") \
            if s else t[0]
        norm = disp / (disp.mean((2, 3), True) + 1e-7)
        gx = torch.abs(norm[..., :-1] - norm[..., 1:])
        gy = torch.abs(norm[..., :-1, :] - norm[..., 1:, :])
        ix = torch.abs(color_s[..., :-1] - color_s[..., 1:]).mean(1, True)
        iy = torch.abs(color_s[..., :-1, :] - color_s[..., 1:, :]).mean(1, True)
        smooth = (gx * torch.exp(-ix)).mean() + (gy * torch.exp(-iy)).mean()

        total = total + photometric + SMOOTHNESS * smooth / (2 ** s)
    return float(total) / len(SCALES)


# ------------------------------------------------------------------- jax side
def _jax_total_loss(colors, disps, poses, K, inv_K, automask, monkeypatch):
    target = jnp.asarray(colors[0])
    sources = [jnp.asarray(colors[f]) for f in (-1, 1)]
    disps_j = {s: jnp.asarray(d) for s, d in disps.items()}
    K_j, inv_K_j = jnp.asarray(K), jnp.asarray(inv_K)

    from monodepth_tpu.ops.sampling import grid_sample

    warped = {}
    for s in SCALES:
        disp_full = resize_bilinear(disps_j[s], H, W, align_corners=False)
        _, depth = disparity_to_depth(disp_full, MIN_DEPTH, MAX_DEPTH)
        ws = []
        for fid, src in zip((-1, 1), sources):
            aa, tr = poses[fid]
            T = transform_from_parameters(jnp.asarray(aa), jnp.asarray(tr),
                                          invert=fid < 0)
            ws.append(grid_sample(src, warp_grid(depth, inv_K_j, K_j, T)))
        warped[s] = ws

    # zero the tie-break noise for a deterministic comparison
    monkeypatch.setattr(jax.random, "normal",
                        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype))
    loss, _ = monodepth_loss(
        disps_j, warped, sources, pyramid(target, 4),
        jax.random.PRNGKey(0), scales=SCALES, disp_smoothness=SMOOTHNESS,
        use_automasking=automask)
    return float(loss)


@pytest.mark.parametrize("automask", [True, False])
def test_total_loss_matches_torch_oracle(rng, automask, monkeypatch):
    colors, disps, poses, K, inv_K = _make_inputs(rng)
    ours = _jax_total_loss(colors, disps, poses, K, inv_K, automask,
                           monkeypatch)
    oracle = _torch_total_loss(colors, disps, poses, K, inv_K, automask)
    assert ours == pytest.approx(oracle, rel=2e-4)
