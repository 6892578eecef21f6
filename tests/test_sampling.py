"""ops/sampling vs PyTorch reference semantics (F.grid_sample / F.interpolate)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from monodepth_tpu.ops import sampling


def _nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


@pytest.mark.parametrize("method", ["patch", "packed", "scalar"])
@pytest.mark.parametrize("oob", [False, True])
def test_grid_sample_matches_torch(rng, oob, method):
    img = rng.standard_normal((2, 6, 9, 3)).astype(np.float32)
    span = 1.6 if oob else 0.95
    grid = (rng.uniform(-span, span, (2, 5, 7, 2))).astype(np.float32)

    ours = sampling.grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                method=method)

    timg = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
    tgrid = torch.from_numpy(grid)
    theirs = F.grid_sample(timg, tgrid, mode="bilinear",
                           padding_mode="border", align_corners=True)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs.numpy()),
                               rtol=1e-5, atol=1e-5)


def test_grid_sample_identity(rng):
    """Sampling at the identity grid reproduces the image exactly."""
    img = rng.standard_normal((1, 4, 6, 2)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(4), np.arange(6), indexing="ij")
    gx = xs / (6 - 1) * 2 - 1
    gy = ys / (4 - 1) * 2 - 1
    grid = np.stack([gx, gy], axis=-1)[None].astype(np.float32)
    out = sampling.grid_sample(jnp.asarray(img), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(out), img, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("out_hw", [(12, 20), (3, 5), (6, 10)])
def test_resize_bilinear_matches_torch(rng, align_corners, out_hw):
    img = rng.standard_normal((2, 6, 10, 3)).astype(np.float32)
    ours = sampling.resize_bilinear(jnp.asarray(img), *out_hw,
                                    align_corners=align_corners)
    timg = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
    theirs = F.interpolate(timg, out_hw, mode="bilinear",
                           align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs.numpy()),
                               rtol=1e-5, atol=1e-5)


def test_upsample_nearest_matches_torch(rng):
    img = rng.standard_normal((2, 4, 5, 3)).astype(np.float32)
    ours = sampling.upsample_nearest_2x(jnp.asarray(img))
    timg = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
    theirs = F.interpolate(timg, scale_factor=2, mode="nearest")
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs.numpy()))


def test_pyramid_shapes(rng):
    img = jnp.asarray(rng.standard_normal((2, 16, 32, 3)).astype(np.float32))
    pyr = sampling.pyramid(img, 4)
    assert [p.shape for p in pyr] == [(2, 16, 32, 3), (2, 8, 16, 3),
                                      (2, 4, 8, 3), (2, 2, 4, 3)]
    # Area downsample preserves the mean.
    np.testing.assert_allclose(float(pyr[0].mean()), float(pyr[-1].mean()),
                               rtol=1e-5)


@pytest.mark.parametrize("method", ["patch", "packed", "scalar"])
def test_grid_sample_nan_grid_is_memory_safe(rng, method):
    """A NaN coordinate (diverged training step) must never become an
    out-of-bounds PROMISE_IN_BOUNDS gather index — the int-side clamp
    keeps reads in range; NaN weights poison only the affected outputs."""
    img = rng.standard_normal((1, 8, 12, 3)).astype(np.float32)
    grid = rng.uniform(-0.9, 0.9, (1, 8, 12, 2)).astype(np.float32)
    grid[0, 2, 3] = np.nan
    grid[0, 5, 7, 0] = np.inf
    out = np.asarray(sampling.grid_sample(jnp.asarray(img),
                                          jnp.asarray(grid), method=method))
    assert out.shape == (1, 8, 12, 3)
    assert np.isnan(out[0, 2, 3]).all()        # NaN position -> NaN
    mask = np.ones((8, 12), bool)
    mask[2, 3] = False
    mask[5, 7] = False                          # inf x clamps to border
    assert np.isfinite(out[0][mask]).all()
