"""End-to-end tests on the synthetic mini-KITTI tree: Trainer + Eigen eval."""

import os

import numpy as np
import pytest

from monodepth_tpu.config import Config
from monodepth_tpu.data.synthetic import make_kitti_tree, make_split_files
from monodepth_tpu.evaluation import evaluate
from monodepth_tpu.evaluation.eigen import (
    depth_errors_np,
    eigen_metrics,
    resize_bilinear_np,
    state_from_modules,
)
from monodepth_tpu.losses.metrics import METRIC_NAMES
from monodepth_tpu.parallel import make_mesh
from monodepth_tpu.training import Trainer


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    make_kitti_tree(root, num_frames=8, image_hw=(96, 320))
    splits = make_split_files(root, num_frames=8)
    return root, splits


def make_cfg(root, splits, save_root, **kw):
    base = dict(datapath=root, splits=splits, height=32, width=64,
                scales=(0, 1),
                batch=2, epoch=1, num_workers=2, precision="f32",
                weight_init=False, use_pallas=False, save_root=save_root,
                log_every=0, save="t")
    base.update(kw)
    return Config(**base)


def test_trainer_end_to_end(kitti_tree, tmp_path):
    root, splits = kitti_tree
    cfg = make_cfg(root, splits, str(tmp_path), eigen_every=1)
    mesh = make_mesh(2, 1)
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.train()
    assert int(state.step) == len(trainer.train_loader)

    # curves written for both splits (reference wrote valid only, §2.5)
    loss_dir = os.path.join(trainer.save_dir, "loss")
    assert os.path.exists(os.path.join(loss_dir, "train_loss.npy"))
    assert os.path.exists(os.path.join(loss_dir, "valid_abs_rel.npy"))

    # --eigen_every ran the full in-training Eigen sweep (mesh-sharded)
    # and recorded it in metrics.jsonl
    import json

    with open(os.path.join(trainer.save_dir, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert "eigen" in records[-1]
    assert set(records[-1]["eigen"]) == set(METRIC_NAMES)
    assert np.isfinite(records[-1]["eigen"]["abs_rel"])

    # per-module export usable by the eval CLI path
    eval_state = state_from_modules(cfg, trainer.save_dir, cfg.epoch)
    metrics = evaluate(cfg, eval_state, eval_batch=2)
    assert set(metrics) == set(METRIC_NAMES)
    assert np.isfinite(metrics["abs_rel"])

    # resume: a new trainer picks up after the saved epoch
    cfg2 = make_cfg(root, splits, str(tmp_path), resume=True, epoch=1)
    trainer2 = Trainer(cfg2, mesh=mesh)
    assert trainer2.start_epoch == 1


def test_predict_disparities_mesh_matches_single(kitti_tree):
    """The mesh-sharded Eigen sweep (whole slice, data axis) must produce
    the same per-image disparities and metrics as the single-device sweep
    — including an odd eval_batch that forces the divisibility round-up
    and tail padding (evaluation/eigen.py predict_disparities)."""
    from monodepth_tpu.data import kitti as K
    from monodepth_tpu.evaluation.eigen import predict_disparities
    from monodepth_tpu.training.state import (
        create_state,
        make_optimizer,
        build_model,
    )

    root, splits = kitti_tree
    cfg = Config(datapath=root, splits=splits, height=32, width=64,
                 scales=(0, 1), precision="f32", weight_init=False,
                 use_pallas=False).validate()
    lines = K.readlines(
        os.path.join(splits, "kitti_eigen_zhou", "test_files.txt"))
    model = build_model(cfg)
    state = create_state(cfg, model, make_optimizer(cfg, 1))

    single = predict_disparities(cfg, state, lines, eval_batch=3,
                                 num_workers=2, mesh=None)
    mesh = make_mesh()  # all 8 virtual devices on the data axis
    assert mesh.devices.size == 8
    sharded = predict_disparities(cfg, state, lines, eval_batch=3,
                                  num_workers=2, mesh=mesh)
    assert single.shape == sharded.shape == (len(lines), 32, 64)
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=1e-7)


def test_evaluate_multihost_single_process(kitti_tree):
    """evaluate_multihost (per-process local sweep + allgathered error
    sums) degenerates to the plain protocol single-process: identical
    metrics to evaluate(); its failure contract turns any local (or
    pre-collective, via `failure=`) exception into a RuntimeError AFTER
    the collective, so no rank can deadlock its peers."""
    from monodepth_tpu.data import kitti as K
    from monodepth_tpu.evaluation.eigen import (
        eigen_errors,
        evaluate_multihost,
        load_ground_truth,
        process_slice,
    )
    from monodepth_tpu.training.state import (
        build_model,
        create_state,
        make_optimizer,
    )

    root, splits = kitti_tree
    cfg = Config(datapath=root, splits=splits, height=32, width=64,
                 scales=(0, 1), precision="f32", weight_init=False,
                 use_pallas=False).validate()
    lines = K.readlines(
        os.path.join(splits, "kitti_eigen_zhou", "test_files.txt"))
    assert process_slice(lines) == lines  # 1 process: the whole split
    gts = load_ground_truth(root, lines)
    state = create_state(cfg, build_model(cfg), make_optimizer(cfg, 1))

    oracle = evaluate(cfg, state, lines, gts, eval_batch=3)
    multi = evaluate_multihost(cfg, state, lines, gts, eval_batch=3,
                               num_workers=2)
    assert set(multi) == set(METRIC_NAMES)
    for key in METRIC_NAMES:
        assert multi[key] == pytest.approx(oracle[key], rel=2e-5), key

    # a rank that failed BEFORE the call keeps the collective alive and
    # raises consistently afterwards
    with pytest.raises(RuntimeError, match=r"process\(es\) \[0\].*boom"):
        evaluate_multihost(cfg, state, [], [], failure=ValueError("boom"))
    # a local failure inside the sweep does the same
    with pytest.raises(RuntimeError, match="lines vs 1 ground truths"):
        evaluate_multihost(cfg, state, lines, gts[:1])

    assert eigen_errors(np.zeros((0, 4, 4)), []).shape == (0, 7)


def test_eigen_protocol_perfect_prediction():
    """A disparity field that matches GT exactly must score ~0 error /
    a1 = 1 under the protocol (median scaling makes it scale-free)."""
    rng = np.random.default_rng(0)
    H, W = 375, 1242
    gt = np.zeros((H, W), np.float32)
    ys = rng.integers(160, 370, 4000)
    xs = rng.integers(50, 1190, 4000)
    gt[ys, xs] = rng.uniform(2, 70, 4000).astype(np.float32)

    disp = 1.0 / np.maximum(gt, 1.0)  # exact inverse depth where valid
    # fill invalid pixels smoothly so resize noise stays local
    disp[gt == 0] = np.median(disp[gt > 0])
    metrics = eigen_metrics(disp[None], [gt], "kitti_eigen_zhou")
    assert metrics["a1"] > 0.97
    assert metrics["abs_rel"] < 0.05


def test_depth_errors_np_known_values():
    gt = np.array([10.0, 20.0, 40.0])
    pred = np.array([10.0, 25.0, 40.0])
    e = depth_errors_np(gt, pred)
    assert e[0] == pytest.approx(np.mean([0, 5 / 20, 0]))  # abs_rel
    assert e[1] == pytest.approx(np.mean([0, 25 / 20, 0]))  # sq_rel
    # a1: thresh = [1, 1.25, 1]; the strict < excludes the exact 1.25
    assert e[4] == pytest.approx(2 / 3)
    assert e[5] == pytest.approx(1.0)  # a2


def test_resize_bilinear_np_identity():
    img = np.random.default_rng(0).uniform(size=(8, 12)).astype(np.float32)
    out = resize_bilinear_np(img, 8, 12)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_eigen_metrics_benchmark_datatype():
    """kitti_benchmark uses gt > 0 masking, no Garg crop
    (reference: model_test.py:104-105)."""
    gt = np.zeros((375, 1242), np.float32)
    gt[5:20, 5:20] = 10.0  # outside the Garg crop rows
    disp = np.full((375, 1242), 0.1, np.float32)
    m = eigen_metrics(disp[None], [gt], "kitti_benchmark")
    assert np.isfinite(m["abs_rel"])
    # the eigen variant would see zero valid pixels in this region -> nan
    m2 = eigen_metrics(disp[None], [gt * 0 + (np.indices(gt.shape)[0] > 200) * gt.max()], "kitti_benchmark")
    assert np.isfinite(m2["rmse"])


def test_eval_gt_cache_roundtrip(kitti_tree, tmp_path):
    """Second load_ground_truth call serves from the .npy cache and
    matches the fresh projection exactly."""
    import time

    from monodepth_tpu.data import kitti as K
    from monodepth_tpu.evaluation.eigen import load_ground_truth

    root, splits = kitti_tree
    lines = K.readlines(
        os.path.join(splits, "kitti_eigen_zhou", "test_files.txt"))[:2]
    cache = str(tmp_path / "gtc")
    fresh = load_ground_truth(root, lines, cache_dir=cache)
    entries = [f for f in os.listdir(cache) if f.endswith(".npy")]
    assert len(entries) == len(lines)
    mtimes = {f: os.path.getmtime(os.path.join(cache, f)) for f in entries}
    cached = load_ground_truth(root, lines, cache_dir=cache)
    for a, b in zip(fresh, cached):
        np.testing.assert_array_equal(a, b)
    # cache files were read, not rewritten
    assert mtimes == {f: os.path.getmtime(os.path.join(cache, f))
                      for f in entries}


def test_stereo_cli_trainer_builds(kitti_tree, tmp_path):
    """The reference README stereo command shape builds verbatim —
    no explicit --frame_ids needed (reference: model_tool/loader.py:55-58)."""
    from monodepth_tpu.config import options

    root, splits = kitti_tree
    cfg = options(["--dataset", "kitti_stereo", "--datapath", root,
                   "--splits", splits, "--height", "32", "--width", "64",
                   "--batch", "2", "--num_workers", "1", "--epoch", "1",
                   "--weight_init", "false", "--use_pallas", "false",
                   "--save_root", str(tmp_path)])
    trainer = Trainer(cfg, mesh=make_mesh(1, 1))
    try:
        assert trainer.cfg.frame_ids == (0, -1, 1, "s")
        batch = next(iter(trainer.train_loader.epoch(0)))
        assert "stereo_T" in batch
        assert batch["frames"].shape[1] == 4
    finally:
        trainer.train_loader.close()
        trainer.valid_loader.close()


def test_official_layout_weights_through_cli(kitti_tree, tmp_path):
    """The reference's de-facto integration test, hermetically: a torch
    checkpoint in the official Monodepth2 layout (encoder.pth/depth.pth)
    converts through the tools/convert_torch_weights.py CLI and evaluates
    through the model_test.py CLI (reference: model_test.py:142-159); the
    CLI's printed table matches the library-path eval of the same
    converted weights."""
    import re
    import subprocess
    import sys

    import torch

    from monodepth_tpu.models import num_ch_enc
    from test_models import (
        _randomize_bn_stats,
        _torch_depth_decoder,
        _torch_resnet,
    )

    root, splits = kitti_tree
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = tmp_path / "torch_ckpt"
    conv = tmp_path / "converted"
    src.mkdir()

    torch.manual_seed(1)
    enc = _torch_resnet(18).eval()
    _randomize_bn_stats(enc, seed=3)
    dec = _torch_depth_decoder(num_ch_enc(18)).eval()
    torch.save(enc.state_dict(), src / "encoder.pth")
    torch.save(dec.state_dict(), src / "depth.pth")

    out = subprocess.run(
        [sys.executable, "tools/convert_torch_weights.py", "monodepth2",
         str(src), str(conv), "--epoch", "0"],
        cwd=repo, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-800:]
    assert os.path.exists(conv / "encoder0.npz")
    assert os.path.exists(conv / "decoder0.npz")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "model_test.py", "--datapath", root,
         "--splits", splits, "--height", "64", "--width", "96",
         "--eval_batch", "2", "--weights", f"{conv}:0",
         "--gt_cache", str(tmp_path / "gtc")],
        cwd=repo, capture_output=True, text=True, timeout=540, env=env)
    assert out.returncode == 0, out.stderr[-800:]
    rows = [ln for ln in out.stdout.splitlines()
            if re.match(r">>>\s+[\d.]+\s", ln)]
    assert rows, out.stdout
    cli_metrics = [float(v) for v in re.findall(r"[\d.]+", rows[-1])]
    assert len(cli_metrics) == 7 and all(np.isfinite(cli_metrics))

    cfg = Config(datapath=root, splits=splits, height=64, width=96,
                 weight_init=False, use_pallas=False)
    state = state_from_modules(cfg, str(conv), 0)
    lib = evaluate(cfg, state, eval_batch=2)
    for value, key in zip(cli_metrics, METRIC_NAMES):
        assert value == pytest.approx(lib[key], abs=2e-3)


def test_trainer_skips_train_gt_without_metrics(kitti_tree, tmp_path):
    """Default train_gt_metrics=False must drop the 375x1242 GT map from
    train batches entirely (dead weight: velodyne load + 22 MB/batch
    host->device); the valid pass keeps it for its metric table."""
    root, splits = kitti_tree
    cfg = make_cfg(root, splits, str(tmp_path))
    trainer = Trainer(cfg, mesh=make_mesh(1, 1))
    try:
        assert not trainer.train_dataset.load_depth
        assert trainer.valid_dataset.load_depth
        batch = next(iter(trainer.train_loader.epoch(0)))
        assert "depth_gt" not in batch
        vbatch = next(iter(trainer.valid_loader.epoch(0)), None)
        if vbatch is not None:  # tiny valid split may have 0 full batches
            assert "depth_gt" in vbatch
    finally:
        trainer.train_loader.close()
        trainer.valid_loader.close()


def test_meter_tracks_warp_span_max():
    """The divergence warning uses a running MAX, not the cumulative
    mean — 3,000 healthy steps must not dilute 300 diverged ones below
    the threshold (training/loop.py _MAX_KEYS)."""
    import jax.numpy as jnp

    from monodepth_tpu.training.loop import _Meter

    meter = _Meter()
    for span in (2.0, 3.0, 150.0, 2.0):
        meter.update({"loss": jnp.float32(0.1),
                      "warp_span": jnp.float32(span)})
    means = meter.means()
    assert means["warp_span"] == pytest.approx(39.25)   # diluted mean
    assert means["warp_span_max"] == pytest.approx(150.0)
    # stacked [K] metrics (steps_per_call > 1) reduce correctly too
    meter2 = _Meter()
    meter2.update({"loss": jnp.ones((3,), jnp.float32),
                   "warp_span": jnp.asarray([1.0, 90.0, 2.0])})
    m2 = meter2.means()
    assert m2["warp_span_max"] == pytest.approx(90.0)
    assert m2["loss"] == pytest.approx(1.0)


def test_warp_auto_swap_transitions(kitti_tree, tmp_path):
    """--warp_auto_swap (SURVEY §5.3 failure remediation): a degenerate
    epoch-mean warp span swaps the train step to the flat-cost packed
    sampler (with span telemetry kept alive so recovery is observable),
    and a recovered span swaps back to the cached original — no rebuild."""
    root, splits = kitti_tree
    cfg = make_cfg(root, splits, str(tmp_path))
    trainer = Trainer(cfg, mesh=make_mesh(1, 1))
    try:
        original = trainer.train_step

        # degenerate epoch (mean span far above GUARD_SPAN) -> packed
        assert trainer._maybe_swap_sampler({"warp_span": 100.0}) == "packed"
        assert trainer._warp_swapped
        assert trainer.train_step is trainer._train_step_cache["packed"]
        assert trainer.train_step is not original

        # the swapped step still runs AND still reports warp_span
        # (cfg.warp_telemetry) so the swap-back condition stays observable
        batch = next(iter(trainer.train_loader.epoch(0)))
        state, metrics = trainer.train_step(trainer.state, batch)
        assert "warp_span" in metrics
        assert np.isfinite(float(metrics["warp_span"]))
        assert np.isfinite(float(metrics["loss"]))

        # healthy span while swapped -> back to the ORIGINAL object
        # (cached: swap-back costs zero recompiles)
        assert trainer._maybe_swap_sampler({"warp_span": 3.0}) == "pallas"
        assert not trainer._warp_swapped
        assert trainer.train_step is original

        # healthy span while not swapped -> no-op
        assert trainer._maybe_swap_sampler({"warp_span": 3.0}) is None
        # missing telemetry -> no-op (non-Pallas configs never swap)
        assert trainer._maybe_swap_sampler({"loss": 1.0}) is None
    finally:
        trainer.train_loader.close()
        trainer.valid_loader.close()


def test_warp_auto_swap_end_to_end(kitti_tree, tmp_path, monkeypatch):
    """Feed a run whose real measured span exceeds (a monkeypatched)
    GUARD_SPAN through Trainer.train(): epoch 1 trains on the Pallas
    sampler (interpret mode), the epoch-boundary remediation swaps, and
    epoch 2 trains on the packed sampler — metrics.jsonl records the
    sampler each epoch ran on."""
    import json

    from monodepth_tpu.ops.pallas import warp_sample

    # any real field exceeds this -> the swap must fire after epoch 1
    monkeypatch.setattr(warp_sample, "GUARD_SPAN", 1e-6)

    root, splits = kitti_tree
    # kernel-supported shape (H % 8 == 0, W % 128 == 0) + interpret mode
    # so the Pallas sampler path is active on CPU
    cfg = make_cfg(root, splits, str(tmp_path), height=32, width=128,
                   epoch=2, use_pallas=True, pallas_interpret=True)
    trainer = Trainer(cfg, mesh=make_mesh(1, 1))
    trainer.train()
    assert trainer._warp_swapped

    with open(os.path.join(trainer.save_dir, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert [r["warp_sampler"] for r in records] == ["pallas", "packed"]
    # telemetry stayed alive across the swap
    assert records[1]["train"]["warp_span"] is not None
