"""Data layer: velodyne projection, synthetic-tree loaders, jitter parity."""

import numpy as np
import pytest
import torch

from monodepth_tpu.data import augment, kitti
from monodepth_tpu.data.dataset import KittiDataset
from monodepth_tpu.data.pipeline import Loader
from monodepth_tpu.data.synthetic import DRIVE, make_kitti_tree, make_split_files


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    make_kitti_tree(root, num_frames=6)
    make_split_files(root, num_frames=6)
    return root


def test_velodyne_projection_known_point(tmp_path):
    """A single velodyne point at (z=10m forward, on-axis) must land at the
    principal point with depth 10."""
    root = str(tmp_path)
    make_kitti_tree(root, num_frames=1)
    # one on-axis point 10m ahead: velo (x=10 fwd, y=0, z=0) -> cam (0,0,10)
    # -> pixel (cx, cy) with depth 10
    pt = np.array([[10.0, 0.0, 0.0, 1.0]], dtype=np.float32)
    velo_path = f"{root}/{DRIVE}/velodyne_points/data/0000000000.bin"
    pt.tofile(velo_path)

    depth = kitti.velodyne_to_depth(f"{root}/2011_09_26", velo_path, cam=2)
    assert depth.shape == (375, 1242)
    ys, xs = np.nonzero(depth)
    assert len(ys) == 1
    # cx=609.56, cy=172.85; minus-1 matlab convention
    assert abs(xs[0] - (609.5593 - 1)) <= 1.0
    assert abs(ys[0] - (172.854 - 1)) <= 1.0
    assert np.isclose(depth[ys[0], xs[0]], 10.0, atol=1e-5)


def test_velodyne_duplicate_keeps_min(tmp_path):
    root = str(tmp_path)
    make_kitti_tree(root, num_frames=1)
    pts = np.array([[10.0, 0.0, 0.0, 1.0],
                    [10.0005, 0.0, 0.0, 1.0]], dtype=np.float32)  # same pixel
    velo_path = f"{root}/{DRIVE}/velodyne_points/data/0000000000.bin"
    pts.tofile(velo_path)
    depth = kitti.velodyne_to_depth(f"{root}/2011_09_26", velo_path, cam=2)
    assert np.isclose(depth.max(), 10.0, atol=1e-4)


def test_intrinsics_per_axis_scaling():
    K, inv_K = kitti.intrinsics(192, 640)
    assert np.isclose(K[0, 0], 0.58 * 640)
    assert np.isclose(K[1, 1], 1.92 * 192)  # fy scaled by HEIGHT (bug fixed)
    assert np.isclose(K[0, 2], 0.5 * 640)
    np.testing.assert_allclose(K @ inv_K, np.eye(4), atol=1e-5)


def test_stereo_transform_signs():
    assert kitti.stereo_transform("l", False)[0, 3] == -0.1
    assert kitti.stereo_transform("r", False)[0, 3] == 0.1
    assert kitti.stereo_transform("l", True)[0, 3] == 0.1


def test_dataset_sample_contract(kitti_tree):
    lines = kitti.readlines(f"{kitti_tree}/splits/kitti_eigen_zhou/train_files.txt")
    ds = KittiDataset(kitti_tree, lines, True, (0, -1, 1), 96, 320)
    s = ds.sample(0, np.random.default_rng(0))
    assert s["frames"].shape == (3, 96, 320, 3) and s["frames"].dtype == np.uint8
    assert s["depth_gt"].shape == (375, 1242)
    assert s["depth_gt"].max() > 0  # GT projection produced hits
    assert s["K"].shape == (4, 4) and s["jitter"].shape == (5,)
    assert "stereo_T" not in s


def test_dataset_stereo_sample(kitti_tree):
    lines = kitti.readlines(f"{kitti_tree}/splits/kitti_eigen_zhou/train_files.txt")
    ds = KittiDataset(kitti_tree, lines, True, (0, -1, 1, "s"), 96, 320)
    s = ds.sample(0, np.random.default_rng(3))
    assert s["frames"].shape == (4, 96, 320, 3)
    assert abs(s["stereo_T"][0, 3]) == np.float32(0.1)


def test_dataset_flip_is_deterministic(kitti_tree):
    lines = kitti.readlines(f"{kitti_tree}/splits/kitti_eigen_zhou/train_files.txt")
    ds = KittiDataset(kitti_tree, lines, True, (0,), 96, 320)
    a = ds.sample(0, np.random.default_rng(7))
    b = ds.sample(0, np.random.default_rng(7))
    np.testing.assert_array_equal(a["frames"], b["frames"])
    np.testing.assert_array_equal(a["jitter"], b["jitter"])


def test_loader_batches(kitti_tree):
    lines = kitti.readlines(f"{kitti_tree}/splits/kitti_eigen_zhou/train_files.txt")
    ds = KittiDataset(kitti_tree, lines, True, (0, -1, 1), 96, 320)
    loader = Loader(ds, batch_size=2, shuffle=True, num_workers=2, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == len(lines) // 2 == len(loader)
    assert batches[0]["frames"].shape == (2, 3, 96, 320, 3)
    # deterministic across re-iterations of the same epoch
    again = list(loader.epoch(0))
    np.testing.assert_array_equal(batches[0]["frames"], again[0]["frames"])
    # different epoch -> different order or augmentation
    other = list(loader.epoch(1))
    assert not all(
        np.array_equal(a["frames"], b["frames"]) for a, b in zip(batches, other))
    loader.close()


def test_color_jitter_matches_torchvision_functional(rng):
    """Check each jitter component against torchvision's documented blend
    formulas implemented in torch."""
    import jax.numpy as jnp

    img = rng.uniform(0, 1, (1, 4, 6, 3)).astype(np.float32)

    def blend(i1, i2, ratio):
        return np.clip(ratio * i1 + (1 - ratio) * i2, 0, 1)

    gray = (img * np.array([0.299, 0.587, 0.114])).sum(-1, keepdims=True)

    # brightness only
    out = augment.color_jitter(jnp.asarray(img),
                               jnp.asarray([[1, 1.1, 1.0, 1.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out), blend(img, 0, 1.1), atol=1e-6)

    # contrast only
    out = augment.color_jitter(jnp.asarray(img),
                               jnp.asarray([[1, 1.0, 0.9, 1.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out), blend(img, gray.mean(), 0.9),
                               atol=1e-6)

    # saturation only
    out = augment.color_jitter(jnp.asarray(img),
                               jnp.asarray([[1, 1.0, 1.0, 1.2, 0.0]]))
    np.testing.assert_allclose(np.asarray(out), blend(img, gray, 1.2), atol=1e-6)

    # apply=0 -> identity even with aggressive factors
    out = augment.color_jitter(jnp.asarray(img),
                               jnp.asarray([[0, 1.2, 0.8, 1.2, 0.1]]))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-7)


def test_hsv_roundtrip(rng):
    import jax.numpy as jnp

    img = jnp.asarray(rng.uniform(0, 1, (2, 5, 5, 3)).astype(np.float32))
    back = augment.hsv_to_rgb(augment.rgb_to_hsv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)


def test_hue_shift_matches_pil(rng):
    """Hue adjustment vs PIL's HSV implementation (torchvision's backend),
    loose tolerance for PIL's uint8 quantization."""
    from PIL import Image
    import jax.numpy as jnp

    img = (rng.uniform(0, 1, (8, 8, 3)) * 255).astype(np.uint8)
    delta = 0.08

    pil = Image.fromarray(img, "RGB").convert("HSV")
    h, s, v = pil.split()
    h = h.point(lambda px: (px + int(delta * 255)) % 256)
    expected = np.asarray(Image.merge("HSV", (h, s, v)).convert("RGB")) / 255.0

    out = augment.color_jitter(
        jnp.asarray(img[None].astype(np.float32) / 255.0),
        jnp.asarray([[1, 1.0, 1.0, 1.0, delta]]))
    np.testing.assert_allclose(np.asarray(out)[0], expected, atol=0.05)


def test_savelines_removelines(tmp_path):
    from monodepth_tpu.data.kitti import readlines, removelines, savelines

    path = str(tmp_path / "split.txt")
    lines = ["a 1 l", "a 2 l", "b 1 r"]
    savelines(lines, path)
    assert readlines(path) == lines
    kept = removelines(path, lambda ln: ln.startswith("b"))
    assert kept == ["a 1 l", "a 2 l"]
    assert readlines(path) == kept


def test_init_distributed_noop_single_host(monkeypatch):
    from monodepth_tpu.parallel import init_distributed

    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    assert init_distributed() is False


def test_loader_dataset_equal_to_window(kitti_tree):
    """Dataset size == prefetch window must not kill the generator
    (regression: bare next() raised StopIteration under PEP 479)."""
    root = kitti_tree
    from monodepth_tpu.data.dataset import KittiDataset
    from monodepth_tpu.data.pipeline import Loader

    lines = ["2011_09_26/2011_09_26_drive_0001_sync %d l" % i
             for i in range(1, 5)]  # 4 samples
    ds = KittiDataset(root, lines, is_training=False, frame_ids=(0,),
                      height=96, width=96, load_depth=False)
    # batch 2, prefetch 1 -> window = 4 == len(dataset)
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=2,
                    prefetch_batches=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert all(b["frames"].shape[0] == 2 for b in batches)
    loader.close()


def test_frame_cache_roundtrip(kitti_tree, tmp_path):
    """Cached decode returns identical frames (incl. flip) and survives
    repeat loads; cache files appear on first access."""
    root = kitti_tree
    from monodepth_tpu.data.dataset import KittiDataset

    lines = ["2011_09_26/2011_09_26_drive_0001_sync 1 l"]
    kw = dict(is_training=True, frame_ids=(0, 1), height=96, width=96,
              load_depth=False)
    plain = KittiDataset(root, lines, **kw)
    cached = KittiDataset(root, lines, frame_cache_dir=str(tmp_path), **kw)

    a = plain.sample(0, np.random.default_rng(3))["frames"]
    b = cached.sample(0, np.random.default_rng(3))["frames"]  # fills cache
    c = cached.sample(0, np.random.default_rng(3))["frames"]  # reads cache
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)
    import os
    assert len(os.listdir(tmp_path)) == 2  # two frames cached

    # flipped sample also matches (different rng draws)
    for seed in range(6):
        r1, r2 = np.random.default_rng(seed), np.random.default_rng(seed)
        np.testing.assert_array_equal(plain.sample(0, r1)["frames"],
                                      cached.sample(0, r2)["frames"])


def test_missing_velodyne_degrades_gracefully(kitti_tree, tmp_path):
    """A frame without a lidar scan yields an all-zero GT map (masked out
    by the metrics) instead of crashing the epoch."""
    import shutil

    root = str(tmp_path / "kitti")
    shutil.copytree(kitti_tree, root)
    from monodepth_tpu.data.dataset import KittiDataset
    from monodepth_tpu.data.synthetic import DRIVE
    import os

    os.remove(os.path.join(root, DRIVE, "velodyne_points/data",
                           f"{2:010d}.bin"))
    ds = KittiDataset(root, [f"{DRIVE} 2 l"], is_training=False,
                      frame_ids=(0,), height=96, width=96, load_depth=True)
    sample = ds.sample(0, np.random.default_rng(0))
    assert sample["depth_gt"].shape == (375, 1242)
    assert float(sample["depth_gt"].max()) == 0.0


def test_multihost_loader_slices_compose_to_global(kitti_tree):
    """Simulated 2-process loading: each rank's contiguous per-batch slice
    concatenates (in rank order) to exactly the single-process global
    batch — the contract jax.make_array_from_process_local_data assembles
    by (SURVEY.md §5.8)."""
    lines = kitti.readlines(
        f"{kitti_tree}/splits/kitti_eigen_zhou/train_files.txt")
    ds = KittiDataset(kitti_tree, lines, True, (0, -1, 1), 96, 320)
    global_loader = Loader(ds, batch_size=4, shuffle=True, num_workers=2,
                           seed=7)
    ranks = [Loader(ds, batch_size=4, shuffle=True, num_workers=2, seed=7,
                    process_index=p, process_count=2) for p in range(2)]
    try:
        global_batches = list(global_loader.epoch(0))
        rank_batches = [list(r.epoch(0)) for r in ranks]
        assert len(global_batches) == len(rank_batches[0]) == len(ranks[0])
        for g, r0, r1 in zip(global_batches, *rank_batches):
            assert r0["frames"].shape[0] == 2  # local slice
            for key in g:
                np.testing.assert_array_equal(
                    g[key], np.concatenate([r0[key], r1[key]]))
    finally:
        global_loader.close()
        for r in ranks:
            r.close()


def test_multihost_loader_requires_drop_last(kitti_tree):
    lines = kitti.readlines(
        f"{kitti_tree}/splits/kitti_eigen_zhou/train_files.txt")
    ds = KittiDataset(kitti_tree, lines, False, (0,), 96, 320)
    loader = Loader(ds, batch_size=2, shuffle=False, drop_last=False,
                    process_index=1, process_count=2)
    with pytest.raises(ValueError, match="drop_last"):
        next(loader.epoch(0))
    with pytest.raises(ValueError, match="divisible"):
        Loader(ds, batch_size=3, shuffle=False, process_index=0,
               process_count=2)


def test_put_global_single_process_matches_device_put(kitti_tree):
    """put_global == device_put when single-process (the multi-host branch
    needs real multiple processes; its data contract is covered above)."""
    from monodepth_tpu.parallel import make_mesh, shard_batch
    from monodepth_tpu.parallel.mesh import batch_shardings

    mesh = make_mesh(2, 1)
    batch = {"frames": np.arange(4 * 2 * 8 * 16 * 3, dtype=np.uint8)
             .reshape(4, 2, 8, 16, 3),
             "K": np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))}
    out = shard_batch(mesh, batch)
    shardings = batch_shardings(mesh, batch)
    for k, v in batch.items():
        np.testing.assert_array_equal(np.asarray(out[k]), v)
        assert out[k].sharding.is_equivalent_to(shardings[k], v.ndim)


def test_color_jitter_contrast_mean_is_per_frame(rng):
    """A [B, F, H, W, 3] stack must blend each frame toward ITS OWN gray
    mean (torchvision adjust_contrast applied per PIL image, as the
    reference does) — not a joint mean over all F frames (regression:
    round-4 review)."""
    import jax.numpy as jnp

    frames = rng.uniform(0, 1, (1, 2, 4, 6, 3)).astype(np.float32)
    frames[:, 1] *= 0.2  # a much darker second frame
    jit = jnp.asarray([[1, 1.0, 0.9, 1.0, 0.0]])  # contrast only
    out = np.asarray(augment.color_jitter(jnp.asarray(frames), jit))
    gray = (frames * np.array([0.299, 0.587, 0.114])).sum(-1, keepdims=True)
    for f in range(2):
        want = np.clip(0.9 * frames[:, f]
                       + 0.1 * gray[:, f].mean(), 0, 1)
        np.testing.assert_allclose(out[:, f], want, atol=1e-6,
                                   err_msg=f"frame {f}")
