"""make_planar_scenes exactness contract — the foundation of the
hermetic convergence proofs (tools/convergence_proof.py): warping the
rendered source views by the GROUND-TRUTH depth + pose through the
production warp ops must reproduce the target up to double-bilinear +
uint8 quantization error. If this drifts, "loss minimum sits at GT"
stops being true and every proof is meaningless."""

import jax.numpy as jnp
import numpy as np
import pytest

from monodepth_tpu.data.synthetic import make_planar_scenes, spearman_rank
from monodepth_tpu.ops.geometry import warp_grid
from monodepth_tpu.ops.sampling import grid_sample

H, W = 64, 128
SHIFT = 6.0


@pytest.fixture(scope="module")
def scenes():
    return make_planar_scenes(3, H, W, seed=1, max_shift_px=SHIFT)


def test_gt_warp_reproduces_target(scenes):
    frames = scenes["frames"].astype(np.float32) / 255.0
    depth = 1.0 / scenes["gt_disp"]  # plane in scaled-disparity units
    K = jnp.asarray(scenes["K"])
    inv_K = jnp.asarray(scenes["inv_K"])

    for slot, sign in ((1, -1.0), (2, 1.0)):
        T = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        T[:, 0, 3] = sign * scenes["gt_tx"]
        grid = warp_grid(jnp.asarray(depth), inv_K, K, jnp.asarray(T))
        warped = np.asarray(grid_sample(jnp.asarray(frames[:, slot]), grid))
        # interior: border-clamped columns are excluded
        pad = int(SHIFT) + 2
        err = np.abs(warped - frames[:, 0])[:, :, pad:-pad]
        assert err.mean() < 0.01, (slot, err.mean())
        assert np.median(err) < 0.005


def test_untrained_warp_is_wrong(scenes):
    """Sanity: the GT warp beats the zero-motion baseline by a wide
    margin (otherwise the contract test proves nothing)."""
    frames = scenes["frames"].astype(np.float32) / 255.0
    depth = 1.0 / scenes["gt_disp"]
    T = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    T[:, 0, 3] = scenes["gt_tx"]
    grid = warp_grid(jnp.asarray(depth), jnp.asarray(scenes["inv_K"]),
                     jnp.asarray(scenes["K"]), jnp.asarray(T))
    warped = np.asarray(grid_sample(jnp.asarray(frames[:, 2]), grid))
    pad = int(SHIFT) + 2
    gt_err = np.abs(warped - frames[:, 0])[:, :, pad:-pad].mean()
    identity_err = np.abs(frames[:, 2] - frames[:, 0])[:, :, pad:-pad].mean()
    assert identity_err > 4.0 * gt_err, (identity_err, gt_err)


def test_tx_sign_forced():
    pos = make_planar_scenes(4, H, W, seed=2, tx_sign=1.0)
    neg = make_planar_scenes(4, H, W, seed=2, tx_sign=-1.0)
    assert (pos["gt_tx"] > 0).all()
    assert (neg["gt_tx"] < 0).all()
    # same seed -> same planes/textures, only the motion direction flips
    np.testing.assert_allclose(pos["gt_disp"], neg["gt_disp"])
    np.testing.assert_allclose(pos["gt_tx"], -neg["gt_tx"])


def test_spearman_rank_basics():
    a = np.arange(100.0)
    assert spearman_rank(a, a) == pytest.approx(1.0)
    assert spearman_rank(a, -a) == pytest.approx(-1.0)
    rng = np.random.default_rng(0)
    assert abs(spearman_rank(rng.normal(size=1000),
                             rng.normal(size=1000))) < 0.1
