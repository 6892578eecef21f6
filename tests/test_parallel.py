"""Mesh / sharding tests on the 8-virtual-device CPU backend (conftest)."""

import jax
import numpy as np
import pytest

from monodepth_tpu.config import Config
from monodepth_tpu.parallel import make_mesh, replicate, shard_batch
from monodepth_tpu.training.state import build_model, create_state, make_optimizer
from monodepth_tpu.training.step import make_train_step

from tests.test_training import make_batch

CFG = Config(height=32, width=64, batch=8, precision="f32", scales=(0, 1),
             weight_init=False, use_pallas=False,
             train_gt_metrics=True)  # DP == single-device must hold for
                                     # the GT metric reductions too


@pytest.fixture(scope="module")
def setup():
    model = build_model(CFG)
    tx = make_optimizer(CFG, steps_per_epoch=10)
    state = create_state(CFG, model, tx)
    return model, tx, state


def test_mesh_shapes():
    assert dict(make_mesh().shape) == {"data": 8, "spatial": 1}
    assert dict(make_mesh(4, 2).shape) == {"data": 4, "spatial": 2}
    with pytest.raises(ValueError):
        make_mesh(16, 1)


def test_data_parallel_matches_single_device(setup):
    """The sharded step computes the same global math as single-device:
    loss/gradients are global means (psum over ICI), so metrics agree."""
    model, tx, state = setup
    step = make_train_step(model, tx, CFG, donate=False)
    batch = make_batch(CFG)

    s1, m1 = step(state, batch)

    mesh = make_mesh(8, 1)
    s2, m2 = step(replicate(mesh, state), shard_batch(mesh, batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    assert float(m1["abs_rel"]) == pytest.approx(float(m2["abs_rel"]),
                                                 rel=1e-3)
    # updated parameters agree across layouts
    p1 = jax.tree.leaves(s1.params)[0]
    p2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-4, atol=1e-6)


def test_spatial_sharding_compiles_and_runs(setup):
    """data x spatial mesh: H-sharded convs (halo exchange) still produce
    finite loss and a valid update."""
    model, tx, state = setup
    step = make_train_step(model, tx, CFG, donate=False)
    mesh = make_mesh(4, 2)
    batch = shard_batch(mesh, make_batch(CFG))
    s2, metrics = step(replicate(mesh, state), batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(s2.step) == 1


def test_batch_layout_on_mesh():
    mesh = make_mesh(4, 2)
    batch = shard_batch(mesh, make_batch(CFG))
    # frames sharded over data (B) and spatial (H)
    shard_shape = batch["frames"].sharding.shard_shape(batch["frames"].shape)
    assert shard_shape[0] == CFG.batch // 4
    assert shard_shape[2] == CFG.height // 2
    # gt only over data
    shard_shape = batch["depth_gt"].sharding.shard_shape(
        batch["depth_gt"].shape)
    assert shard_shape == (CFG.batch // 4, 375, 1242)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)

    ge.dryrun_multichip(8)


def test_spatial_pallas_sampler_exact():
    """The Pallas warp under spatial sharding (halo exchange,
    training/step._spatial_pallas_sampler) equals the global grid_sample
    in BOTH regimes on a {data:2, spatial:2} mesh: smooth in-halo fields
    run the shifted kernel, wild fields trip the per-group lax.cond into
    the exact all-gather fallback — outputs and dgrid identical either
    way."""
    import jax.numpy as jnp

    from monodepth_tpu.ops.sampling import grid_sample
    from monodepth_tpu.training.step import _spatial_pallas_sampler
    from tests.test_pallas import _warp_grid_np

    rng = np.random.default_rng(0)
    cfg = Config(height=32, width=128, batch=4, precision="f32",
                 scales=(0, 1), weight_init=False, use_pallas=True,
                 pallas_interpret=True, spatial_halo=8)
    mesh = make_mesh(2, 2)  # Hl = 16, halo = 8
    sampler = jax.jit(_spatial_pallas_sampler(cfg, mesh, interpret=True))

    B, H, W = cfg.batch, cfg.height, cfg.width
    img = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    smooth = _warp_grid_np(rng, B, H, W, wild_entry=False)
    wild = rng.uniform(-1.5, 1.5, (B, H, W, 2)).astype(np.float32)

    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data", "spatial"))
    for name, grid in (("smooth", smooth), ("wild", wild)):
        img_s = jax.device_put(img, sh)
        grid_s = jax.device_put(grid, sh)
        ref = grid_sample(jnp.asarray(img), jnp.asarray(grid))
        out = sampler(img_s, grid_s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6, err_msg=name)
        dref = jax.grad(lambda g: (grid_sample(jnp.asarray(img), g)
                                   ** 2).sum())(jnp.asarray(grid))
        dout = jax.grad(lambda g: (sampler(img_s, g) ** 2).sum())(grid_s)
        scale = max(float(jnp.abs(dref).max()), 1.0)
        np.testing.assert_allclose(np.asarray(dout), np.asarray(dref),
                                   atol=5e-6 * scale, err_msg=name)
