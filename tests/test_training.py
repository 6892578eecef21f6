"""Training-step / state / checkpoint tests (tiny shapes, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monodepth_tpu.config import Config
from monodepth_tpu.training.checkpoint import Checkpointer
from monodepth_tpu.training.state import (
    build_model,
    create_state,
    make_optimizer,
    step_decay_schedule,
)
from monodepth_tpu.training.step import (
    make_eval_step,
    make_infer_step,
    make_train_step,
)

CFG = Config(height=32, width=64, batch=4, precision="f32", scales=(0, 1),
             weight_init=False, use_pallas=False,
             train_gt_metrics=True)  # exercise the reference's in-step metric


def make_batch(cfg=CFG, batch=None, seed=0, stereo=False, with_gt=True):
    from monodepth_tpu.data import kitti

    rng = np.random.default_rng(seed)
    B = batch or cfg.batch
    F = len(cfg.frame_ids)
    K, inv_K = kitti.intrinsics(cfg.height, cfg.width)
    out = {
        "frames": rng.integers(0, 255, (B, F, cfg.height, cfg.width, 3),
                               dtype=np.uint8),
        "jitter": np.tile(np.array([1, 1.1, 0.9, 1.05, 0.02], np.float32),
                          (B, 1)),
        "K": np.tile(K, (B, 1, 1)),
        "inv_K": np.tile(inv_K, (B, 1, 1)),
    }
    if with_gt:
        gt = rng.uniform(0, 80, (B, 375, 1242))
        out["depth_gt"] = (gt * (rng.random(gt.shape) < 0.02)).astype(np.float32)
    if stereo:
        out["stereo_T"] = np.tile(kitti.stereo_transform("l", False),
                                  (B, 1, 1))
    return out


@pytest.fixture(scope="module")
def setup():
    model = build_model(CFG)
    tx = make_optimizer(CFG, steps_per_epoch=10)
    state = create_state(CFG, model, tx)
    return model, tx, state


def test_train_step_updates_params(setup):
    model, tx, state = setup
    step = make_train_step(model, tx, CFG, donate=False)
    state2, metrics = step(state, make_batch())
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # parameters actually moved
    delta = jax.tree.reduce(
        lambda acc, x: acc + float(jnp.abs(x[0] - x[1]).sum()),
        jax.tree.map(lambda a, b: (a, b), state.params, state2.params), 0.0)
    assert delta > 0
    # training metric present alongside the loss (reference logger.py:27)
    for key in ("abs_rel", "a1", "rmse"):
        assert key in metrics


def test_eval_step_pure(setup):
    model, tx, state = setup
    ev = make_eval_step(model, CFG)
    batch = make_batch()
    m1 = {k: float(v) for k, v in ev(state, batch).items()}
    m2 = {k: float(v) for k, v in ev(state, batch).items()}
    assert m1 == m2


def test_infer_step_shape(setup):
    model, tx, state = setup
    infer = make_infer_step(model, CFG)
    images = make_batch(batch=2)["frames"][:, 0].astype(np.float32) / 255.0
    disp = infer(state, images)
    assert disp.shape == (2, CFG.height, CFG.width)
    # sigmoid disparity through the eval depth range 1e-3..80
    assert float(disp.min()) >= 1.0 / 80.0 - 1e-6
    assert float(disp.max()) <= 1.0 / 1e-3 + 1e-3


@pytest.mark.parametrize("pose_type", ["shared", "posecnn"])
def test_pose_variants_train(pose_type):
    cfg = Config(height=32, width=64, batch=2, precision="f32",
                 scales=(0, 1), weight_init=False, use_pallas=False,
                 pose_type=pose_type)
    model = build_model(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_state(cfg, model, tx)
    step = make_train_step(model, tx, cfg, donate=False)
    _, metrics = step(state, make_batch(cfg, batch=2, with_gt=False))
    assert np.isfinite(float(metrics["loss"]))


def test_stereo_train_step():
    cfg = Config(height=32, width=64, batch=2, precision="f32",
                 scales=(0, 1), weight_init=False, use_pallas=False,
                 dataset="kitti_stereo", frame_ids=(0, -1, 1, "s"))
    model = build_model(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_state(cfg, model, tx)
    step = make_train_step(model, tx, cfg, donate=False)
    _, metrics = step(state, make_batch(cfg, batch=2, stereo=True,
                                        with_gt=False))
    assert np.isfinite(float(metrics["loss"]))


def test_step_decay_schedule():
    # StepLR(step=15, gamma=0.1) stepped per epoch (loader.py:106-108)
    sched = step_decay_schedule(1e-4, 15, steps_per_epoch=100)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(14 * 100 + 99)) == pytest.approx(1e-4)
    assert float(sched(15 * 100)) == pytest.approx(1e-5)
    assert float(sched(30 * 100)) == pytest.approx(1e-6)


def test_checkpoint_roundtrip(setup, tmp_path):
    model, tx, state = setup
    ckpt = Checkpointer(str(tmp_path))
    step = make_train_step(model, tx, CFG, donate=False)
    state2, _ = step(state, make_batch())
    ckpt.save(0, state2)
    assert ckpt.latest_epoch() == 0

    restored, epoch = ckpt.restore(state2)
    assert epoch == 0
    for a, b in zip(jax.tree.leaves(state2.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # per-module export: one npz per top-level module
    ckpt.export_modules(0, state2)
    import os
    names = os.listdir(tmp_path)
    assert "encoder1.npz" in names and "decoder1.npz" in names


def test_checkpoint_retention(setup, tmp_path):
    """keep=2: only the newest 2 states + matching exports survive; the
    latest save is never pruned."""
    import os

    model, tx, state = setup
    ckpt = Checkpointer(str(tmp_path), keep=2)
    for epoch in range(4):
        ckpt.save(epoch, state)
        ckpt.export_modules(epoch, state)
    names = set(os.listdir(tmp_path))
    assert "state_0002" in names and "state_0003" in names
    assert "state_0000" not in names and "state_0001" not in names
    assert "encoder3.npz" in names and "encoder4.npz" in names
    assert "encoder1.npz" not in names and "encoder2.npz" not in names
    restored, epoch = ckpt.restore(state)
    assert epoch == 3


def test_checkpoint_async_roundtrip_and_retention(setup, tmp_path):
    """`async_save=True`: saves commit on a background thread, `wait()`
    makes them durable, restore is bit-identical, and keep-last-N pruning
    still converges (at most one extra generation transiently in flight —
    checkpoint.py save())."""
    import os

    model, tx, state = setup
    ckpt = Checkpointer(str(tmp_path), keep=2, async_save=True)
    step = make_train_step(model, tx, CFG, donate=False)
    state2, _ = step(state, make_batch())
    for epoch in range(4):
        ckpt.save(epoch, state2 if epoch == 3 else state)
    ckpt.wait()
    names = set(os.listdir(tmp_path))
    assert "state_0002" in names and "state_0003" in names
    assert "state_0000" not in names and "state_0001" not in names
    restored, epoch = ckpt.restore(state2)
    assert epoch == 3
    for a, b in zip(jax.tree.leaves(state2.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bn_stats_update_only_in_train(setup):
    model, tx, state = setup
    step = make_train_step(model, tx, CFG, donate=False)
    state2, _ = step(state, make_batch())
    before = jax.tree.leaves(state.batch_stats)
    after = jax.tree.leaves(state2.batch_stats)
    assert any(float(jnp.abs(a - b).max()) > 0
               for a, b in zip(before, after))


@pytest.mark.parametrize("pose_type", ["separate", "posecnn"])
def test_pose_frames_all(pose_type):
    """`--pose_frames all`: one joint pose pass over every temporal frame
    (reference: processor.py:116-135), no inversion at warp time."""
    cfg = Config(height=32, width=64, batch=2, precision="f32",
                 scales=(0, 1), weight_init=False, use_pallas=False,
                 pose_type=pose_type, pose_frames="all")
    model = build_model(cfg)
    assert model.num_pose_frames == 3
    assert not model.invert_for_frame(-1)
    tx = make_optimizer(cfg, 10)
    state = create_state(cfg, model, tx)
    step = make_train_step(model, tx, cfg, donate=False)
    _, metrics = step(state, make_batch(cfg, batch=2, with_gt=False))
    assert np.isfinite(float(metrics["loss"]))


def test_remat_matches_no_remat():
    """Remat changes memory, not math: losses agree to float tolerance."""
    results = {}
    for remat in (False, True):
        cfg = Config(height=32, width=64, batch=2, precision="f32",
                     scales=(0, 1), weight_init=False, use_pallas=False,
                     remat=remat)
        model = build_model(cfg)
        tx = make_optimizer(cfg, 10)
        state = create_state(cfg, model, tx)
        step = make_train_step(model, tx, cfg, donate=False)
        state2, metrics = step(state, make_batch(cfg, batch=2))
        results[remat] = (float(metrics["loss"]),
                          np.asarray(jax.tree.leaves(state2.params)[0]))
    assert results[False][0] == pytest.approx(results[True][0], rel=1e-5)
    np.testing.assert_allclose(results[False][1], results[True][1],
                               rtol=1e-4, atol=1e-6)


def test_stereo_only_training():
    """frame_ids (0, "s"): pure-stereo supervision — the fixed baseline
    transform replaces the pose net entirely (the reference's
    KITTIStereoDataset scenario, kitti_stereo.py:25-166)."""
    cfg = Config(height=32, width=64, batch=2, precision="f32",
                 scales=(0, 1), weight_init=False, use_pallas=False,
                 dataset="kitti_stereo", frame_ids=(0, "s"))
    model = build_model(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_state(cfg, model, tx)
    step = make_train_step(model, tx, cfg, donate=False)
    batch = make_batch(cfg, batch=2, stereo=True, with_gt=False)
    batch["frames"] = batch["frames"][:, :2]
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_multi_step_matches_k_single_steps(setup):
    """One scan dispatch of K steps == K sequential single steps."""
    from monodepth_tpu.training.step import make_train_multi_step

    model, tx, state = setup
    single = make_train_step(model, tx, CFG, donate=False)
    multi = make_train_multi_step(model, tx, CFG, donate=False)

    batches = [make_batch(seed=s, with_gt=False) for s in (0, 1)]
    s1 = state
    for b in batches:
        s1, m1 = single(s1, b)

    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    s2, m2 = multi(state, stacked)

    assert int(s2.step) == int(s1.step) == 2
    assert m2["loss"].shape == (2,)
    assert float(m2["loss"][-1]) == pytest.approx(float(m1["loss"]), rel=1e-5)
    # Exact param equality is not attainable: scan vs unrolled compile to
    # different reduction orders, and Adam's m/sqrt(v) at near-zero second
    # moments turns epsilon gradient differences into O(lr) update
    # differences. The loss equality above is the semantic check; here we
    # only bound the divergence to a few update magnitudes (lr = 1e-4).
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_resnet50_train_step():
    """Bottleneck-block encoder (depths >= 50) through the full step."""
    cfg = Config(height=32, width=64, batch=2, precision="f32",
                 scales=(0, 1), weight_init=False, use_pallas=False,
                 num_layers=50)
    model = build_model(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_state(cfg, model, tx)
    step = make_train_step(model, tx, cfg, donate=False)
    _, metrics = step(state, make_batch(cfg, batch=2, with_gt=False))
    assert np.isfinite(float(metrics["loss"]))


def test_kitti_stereo_auto_appends_s_frame():
    """--dataset kitti_stereo must work verbatim: validation auto-wires
    the "s" frame like the reference loader (model_tool/loader.py:55-58)."""
    from monodepth_tpu.config import options

    cfg = options(["--dataset", "kitti_stereo"])
    assert cfg.frame_ids == (0, -1, 1, "s")
    # library path too, and idempotent when "s" is already present
    assert "s" in Config(dataset="kitti_stereo").validate().frame_ids
    explicit = Config(dataset="kitti_stereo", frame_ids=(0, "s")).validate()
    assert explicit.frame_ids == (0, "s")


def test_train_gt_metrics_gate(setup):
    """--train_gt_metrics false drops the in-step GT median sort: the
    train step returns loss only (valid keeps the full table)."""
    import dataclasses

    model, tx, state = setup
    cfg = dataclasses.replace(CFG, train_gt_metrics=False)
    step = make_train_step(model, tx, cfg, donate=False)
    _, metrics = step(state, make_batch())
    assert set(metrics) == {"loss"}
    eval_metrics = make_eval_step(model, cfg)(state, make_batch())
    assert "abs_rel" in eval_metrics
