"""ops/geometry closed-form and round-trip tests (SURVEY.md §4 strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from monodepth_tpu.ops import geometry


def test_disparity_to_depth_endpoints():
    scaled, depth = geometry.disparity_to_depth(jnp.asarray([0.0, 1.0]), 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(depth), [100.0, 0.1], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(scaled), [1 / 100.0, 1 / 0.1], rtol=1e-6)


def test_axis_angle_known_rotation():
    # 90 degrees about z: x -> y.
    aa = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    R = np.asarray(geometry.axis_angle_to_rotation(aa))[0]
    expected = np.array([[0, -1, 0, 0], [1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                        dtype=np.float32)
    # the 1e-5 axis-norm guard (reference warp.py:81) shifts the angle slightly
    np.testing.assert_allclose(R, expected, atol=1e-4)


def test_axis_angle_zero_is_identity():
    R = np.asarray(geometry.axis_angle_to_rotation(jnp.zeros((1, 3))))[0]
    np.testing.assert_allclose(R, np.eye(4), atol=1e-6)


def test_transform_invert_composes_to_identity(rng):
    # The (angle + 1e-5) axis-norm guard (reference warp.py:81) makes R
    # slightly non-orthogonal; the composition error shrinks with angle.
    aa = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32) * 0.01)
    t = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
    M = np.asarray(geometry.transform_from_parameters(aa, t, invert=False))
    Minv = np.asarray(geometry.transform_from_parameters(aa, t, invert=True))
    for i in range(4):
        np.testing.assert_allclose(M[i] @ Minv[i], np.eye(4), atol=5e-3)


def test_transform_matches_manual_rodrigues(rng):
    """Exact check against an independent numpy Rodrigues with the same
    1e-5 norm guard, for both invert modes."""
    aa = rng.standard_normal((3, 3)).astype(np.float32) * 0.3
    t = rng.standard_normal((3, 3)).astype(np.float32)

    def manual(aa1, t1, invert):
        angle = np.linalg.norm(aa1)
        axis = aa1 / (angle + 1e-5)
        Kx = np.array([[0, -axis[2], axis[1]],
                       [axis[2], 0, -axis[0]],
                       [-axis[1], axis[0], 0]], dtype=np.float64)
        R3 = np.eye(3) + np.sin(angle) * Kx + (1 - np.cos(angle)) * (Kx @ Kx)
        R = np.eye(4); R[:3, :3] = R3
        tt = -t1 if invert else t1
        T = np.eye(4); T[:3, 3] = tt
        return (R.T @ T) if invert else (T @ R)

    for invert in (False, True):
        ours = np.asarray(geometry.transform_from_parameters(
            jnp.asarray(aa), jnp.asarray(t), invert=invert))
        for i in range(3):
            np.testing.assert_allclose(ours[i], manual(aa[i], t[i], invert),
                                       rtol=1e-4, atol=1e-5)


def _camera(batch, fx=100.0, fy=120.0, cx=4.0, cy=3.0):
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = fx, fy, cx, cy
    K = np.tile(K, (batch, 1, 1))
    return jnp.asarray(K), jnp.asarray(np.linalg.inv(K))


def test_backproject_project_identity(rng):
    """With T = I, project(backproject(depth)) is the identity grid."""
    B, H, W = 2, 6, 9
    depth = jnp.asarray(rng.uniform(1.0, 10.0, (B, H, W)).astype(np.float32))
    K, inv_K = _camera(B)
    cam = geometry.backproject(depth, inv_K)
    assert cam.shape == (B, 4, H * W)
    grid = np.asarray(geometry.project(cam, K, jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))), H, W))

    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = xs / (W - 1) * 2 - 1
    gy = ys / (H - 1) * 2 - 1
    expected = np.tile(np.stack([gx, gy], -1)[None], (B, 1, 1, 1))
    np.testing.assert_allclose(grid, expected, atol=1e-4)


def test_warp_grid_equals_unfused(rng):
    B, H, W = 2, 6, 9
    depth = jnp.asarray(rng.uniform(1.0, 10.0, (B, H, W)).astype(np.float32))
    K, inv_K = _camera(B)
    aa = jnp.asarray(rng.standard_normal((B, 3)).astype(np.float32) * 0.05)
    t = jnp.asarray(rng.standard_normal((B, 3)).astype(np.float32) * 0.1)
    T = geometry.transform_from_parameters(aa, t)

    unfused = geometry.project(geometry.backproject(depth, inv_K), K, T, H, W)
    fused = geometry.warp_grid(depth, inv_K, K, T)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               rtol=1e-4, atol=1e-5)


def test_translation_only_warp_shifts_grid():
    """A pure x-translation of fx*t/z pixels at constant depth."""
    B, H, W = 1, 5, 8
    depth = jnp.full((B, H, W), 5.0)
    K, inv_K = _camera(B, fx=10.0, fy=10.0, cx=3.5, cy=2.0)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 1.0  # 1m right
    grid = np.asarray(geometry.warp_grid(depth, inv_K, K, jnp.asarray(T[None])))
    # x shift in pixels: fx * tx / z = 10/5 = 2 px -> 2/(W-1)*2 in norm units
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    expected_x = (xs + 2.0) / (W - 1) * 2 - 1
    np.testing.assert_allclose(grid[0, ..., 0], expected_x, atol=1e-4)
    expected_y = ys / (H - 1) * 2 - 1
    np.testing.assert_allclose(grid[0, ..., 1], expected_y, atol=1e-4)


def test_full_warp_reconstructs_translated_view(rng):
    """End-to-end view synthesis on a synthetic scene: a fronto-parallel
    plane at depth Z seen from a camera translated by tx along +x.

    Derivation (pins the sign conventions of the whole stack): backproject
    lifts target pixel u to X = Z * K^-1 u; T = translation(tx) moves it
    to X + tx; projection lands at u + fx*tx/Z. So the warp samples the
    source at u + d with disparity d = fx*tx/Z, and reproducing the
    target requires source(v) = target(v - d). This is exactly the
    geometry the stereo baseline transform relies on
    (reference: processor.py:147-149, kitti_stereo.py:249-256).
    """
    import jax.numpy as jnp

    from monodepth_tpu.ops.geometry import warp_grid
    from monodepth_tpu.ops.sampling import grid_sample

    H, W = 48, 64
    Z = 10.0
    fx = 40.0
    d = 8  # integer pixel disparity
    tx = d * Z / fx

    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = fx, 40.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    inv_K = np.linalg.inv(K).astype(np.float32)

    # smooth texture so bilinear sampling error stays tiny
    coarse = rng.uniform(0, 1, (H // 8, W // 8, 3)).astype(np.float32)
    target = np.kron(coarse, np.ones((8, 8, 1), np.float32))
    source = np.roll(target, shift=d, axis=1)  # source(v) = target(v - d)

    depth = jnp.full((1, H, W), Z, jnp.float32)
    T = jnp.asarray(np.eye(4, dtype=np.float32)).at[0, 3].set(tx)[None]
    grid = warp_grid(depth, jnp.asarray(inv_K)[None], jnp.asarray(K)[None], T)
    warped = np.asarray(grid_sample(jnp.asarray(source)[None], grid))[0]

    interior = np.s_[2:-2, 2 : W - d - 2]
    np.testing.assert_allclose(warped[interior], target[interior], atol=2e-2)
