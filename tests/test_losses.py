"""Loss stack vs independently-written torch formulations + golden cases."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from monodepth_tpu.losses import (
    depth_errors,
    masked_median_low,
    min_reprojection,
    monodepth_loss,
    smooth_loss,
    training_depth_metric,
)
from monodepth_tpu.ops.ssim import reprojection_error, ssim


def _torch_ssim(x, y):
    """SSIM distance per the Monodepth2 formulation (3x3 avg-pool stats on
    reflect-padded images, C1=0.01^2, C2=0.03^2)."""
    x = F.pad(x, (1, 1, 1, 1), mode="reflect")
    y = F.pad(y, (1, 1, 1, 1), mode="reflect")
    mu_x = F.avg_pool2d(x, 3, 1)
    mu_y = F.avg_pool2d(y, 3, 1)
    sx = F.avg_pool2d(x * x, 3, 1) - mu_x ** 2
    sy = F.avg_pool2d(y * y, 3, 1) - mu_y ** 2
    sxy = F.avg_pool2d(x * y, 3, 1) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01 ** 2) * (2 * sxy + 0.03 ** 2)
    d = (mu_x ** 2 + mu_y ** 2 + 0.01 ** 2) * (sx + sy + 0.03 ** 2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_matches_torch(rng):
    a = rng.uniform(0, 1, (2, 8, 10, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (2, 8, 10, 3)).astype(np.float32)
    ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
    ta = torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))
    tb = torch.from_numpy(np.transpose(b, (0, 3, 1, 2)))
    theirs = np.transpose(_torch_ssim(ta, tb).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_reprojection_error_blend(rng):
    a = rng.uniform(0, 1, (1, 8, 10, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 8, 10, 3)).astype(np.float32)
    out = np.asarray(reprojection_error(jnp.asarray(a), jnp.asarray(b)))
    assert out.shape == (1, 8, 10, 1)
    l1 = np.abs(b - a).mean(-1, keepdims=True)
    ss = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b))).mean(-1, keepdims=True)
    np.testing.assert_allclose(out, 0.85 * ss + 0.15 * l1, rtol=1e-5, atol=1e-6)


def test_smooth_loss_golden():
    """Constant disparity -> zero smoothness regardless of image."""
    disp = jnp.full((1, 4, 5, 1), 0.37)
    img = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 4, 5, 3)).astype(np.float32))
    assert float(smooth_loss(disp, img)) < 1e-6


def test_smooth_loss_matches_manual(rng):
    disp = rng.uniform(0.1, 1, (2, 5, 6, 1)).astype(np.float32)
    img = rng.uniform(0, 1, (2, 5, 6, 3)).astype(np.float32)
    ours = float(smooth_loss(jnp.asarray(disp), jnp.asarray(img)))

    nd = disp / (disp.mean(axis=(1, 2), keepdims=True) + 1e-7)
    gdx = np.abs(nd[:, :, :-1] - nd[:, :, 1:])
    gdy = np.abs(nd[:, :-1] - nd[:, 1:])
    gix = np.abs(img[:, :, :-1] - img[:, :, 1:]).mean(-1, keepdims=True)
    giy = np.abs(img[:, :-1] - img[:, 1:]).mean(-1, keepdims=True)
    manual = (gdx * np.exp(-gix)).mean() + (gdy * np.exp(-giy)).mean()
    np.testing.assert_allclose(ours, manual, rtol=1e-5)


def test_min_reprojection_picks_minimum(rng):
    reproj = jnp.asarray(rng.uniform(0.5, 1.0, (1, 4, 4, 2)).astype(np.float32))
    identity = jnp.asarray(rng.uniform(0.0, 0.2, (1, 4, 4, 2)).astype(np.float32))
    out = min_reprojection(reproj, identity, jax.random.PRNGKey(0))
    # identity is strictly smaller everywhere -> min comes from identity (+noise)
    assert float(out.max()) < 0.25
    out2 = min_reprojection(reproj, None, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(reproj.min(-1)))


def test_monodepth_loss_runs_and_is_finite(rng):
    B, H, W = 2, 16, 32
    scales = (0, 1, 2, 3)
    disp = {s: jnp.asarray(rng.uniform(0.01, 1, (B, H >> s, W >> s, 1)).astype(np.float32))
            for s in scales}
    colors = [jnp.asarray(rng.uniform(0, 1, (B, H >> s, W >> s, 3)).astype(np.float32))
              for s in scales]
    warped = {s: [jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
                  for _ in range(2)] for s in scales}
    sources = [jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
               for _ in range(2)]
    loss, aux = monodepth_loss(disp, warped, sources, colors,
                               jax.random.PRNGKey(0), scales=scales)
    assert np.isfinite(float(loss))
    assert set(aux) == {f"{k}/{s}" for k in ("photometric", "smooth") for s in scales}


def test_masked_median_low():
    x = jnp.asarray([5.0, 1.0, 3.0, 9.0, 7.0])
    mask = jnp.asarray([1, 1, 1, 1, 0], dtype=jnp.float32)
    # valid = [5,1,3,9] -> sorted [1,3,5,9] -> lower median = 3 (torch.median)
    assert float(masked_median_low(x, mask)) == 3.0
    t = torch.median(torch.tensor([5.0, 1.0, 3.0, 9.0]))
    assert float(t) == 3.0


def test_masked_median_low_fuzz_vs_torch(rng):
    """The jit twin must equal torch.median (lower median) for every
    valid-count parity, including n=1 and full masks (reference split:
    torch median in model_metric.py:101 vs np.median in model_test.py)."""
    for n in (1, 2, 3, 8, 63, 128):
        x = rng.normal(size=128).astype(np.float32)
        mask = np.zeros(128, np.float32)
        mask[rng.choice(128, size=n, replace=False)] = 1.0
        want = float(torch.median(torch.tensor(x[mask > 0])))
        got = float(masked_median_low(jnp.asarray(x), jnp.asarray(mask)))
        assert got == want, (n, got, want)


def test_depth_errors_perfect_prediction(rng):
    gt = rng.uniform(1, 50, (2, 8, 8)).astype(np.float32)
    mask = (rng.uniform(size=(2, 8, 8)) > 0.5).astype(np.float32)
    errs = depth_errors(jnp.asarray(gt), jnp.asarray(gt), jnp.asarray(mask))
    abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = [float(e) for e in errs]
    assert abs_rel == sq_rel == rmse == rmse_log == 0.0
    assert a1 == a2 == a3 == 1.0


def test_training_depth_metric_scale_invariant(rng):
    """Median scaling makes a globally-scaled prediction near-perfect."""
    B = 2
    gt = np.zeros((B, 375, 1242), np.float32)
    gt[:, 160:360, 100:1100] = rng.uniform(2, 60, (B, 200, 1000)).astype(np.float32)
    pred = jnp.asarray((gt * 0.5)[..., None][:, ::2, ::2][:, :192 // 2 * 2][..., :640, :])
    # build a [B, H, W, 1] pred whose resize approximates gt*0.5: use direct gt
    pred = jnp.asarray(gt[..., None] * 0.5)
    metrics = training_depth_metric(pred, jnp.asarray(gt))
    assert metrics["abs_rel"] < 0.05
    assert metrics["a1"] > 0.95
