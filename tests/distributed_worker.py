"""Subprocess worker for the genuine multi-process `jax.distributed` test.

Each process sees 4 virtual CPU devices (XLA_FLAGS set by the parent);
with --num_processes 2 the two workers form one 8-device slice via
`jax.distributed.initialize`, then run EXACTLY the production multi-host
path: per-process `Loader` slices -> `prefetch_to_device` with
NamedShardings (which routes through `parallel.mesh.put_global`'s
`jax.make_array_from_process_local_data` branch) -> one jitted train
step over the global ("data", "spatial") mesh. With --num_processes 1
the same code is the single-process oracle (8 local devices); losses
must match (same global batch, same mesh, same seeds).

Run by tests/test_distributed.py — not a pytest module itself.
"""

import argparse
import json
import os


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize latches axon
    cache = os.environ.get("MONODEPTH_TEST_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="127.0.0.1:9911")
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--datapath", required=True)
    ap.add_argument("--splits", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt_dir", default="",
                    help="exercise multi-host checkpoint save/restore: "
                         "save after step 1, restore into a fresh state, "
                         "re-run step 2, report both losses")
    args = ap.parse_args()

    if args.num_processes > 1:
        jax.distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)

    from monodepth_tpu.config import Config
    from monodepth_tpu.data.dataset import KittiDataset
    from monodepth_tpu.data.kitti import readlines
    from monodepth_tpu.data.pipeline import Loader, prefetch_to_device
    from monodepth_tpu.parallel.mesh import (
        batch_shardings,
        make_mesh,
        replicate,
        warm_collectives,
    )
    from monodepth_tpu.training.state import (
        build_model,
        create_state,
        make_optimizer,
    )
    from monodepth_tpu.training.step import make_train_step

    cfg = Config(datapath=args.datapath, splits=args.splits,
                 height=32, width=64, batch=8, scales=(0, 1),
                 precision="f32", weight_init=False, use_pallas=False,
                 num_workers=2).validate()
    lines = readlines(os.path.join(args.splits, cfg.datatype,
                                   "train_files.txt"))
    ds = KittiDataset(cfg.datapath, lines, is_training=True,
                      frame_ids=cfg.frame_ids, height=cfg.height,
                      width=cfg.width, load_depth=False)
    loader = Loader(ds, batch_size=cfg.batch, shuffle=True,
                    num_workers=cfg.num_workers, seed=cfg.seed)

    mesh = make_mesh()  # all 8 global devices on the data axis
    # Pin the Gloo clique while ranks are still in lockstep — the train
    # step's first collective would otherwise race the ~30 s KV-store
    # handshake against cross-rank compile skew (warm_collectives doc).
    assert warm_collectives(mesh) == mesh.devices.size
    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=4)
    state = replicate(mesh, create_state(cfg, model, tx))
    step = make_train_step(model, tx, cfg,
                           mesh=mesh if mesh.devices.size > 1 else None)

    batch = next(loader.epoch(0))
    assert batch["frames"].shape[0] == cfg.batch // args.num_processes, \
        batch["frames"].shape
    shardings = batch_shardings(mesh, batch)
    (global_batch,) = list(prefetch_to_device(iter([batch]), size=1,
                                              sharding=shardings))
    assert global_batch["frames"].shape[0] == cfg.batch  # global view

    state, metrics = step(state, global_batch)
    loss = float(metrics["loss"])
    result = {"loss": loss,
              "devices": jax.device_count(),
              "local_devices": jax.local_device_count(),
              "processes": jax.process_count()}

    # Multi-host Eigen test sweep (evaluation/eigen.py evaluate_multihost,
    # the --eigen_every path): every process sweeps its interleaved slice
    # of the test split on its LOCAL devices, one allgather combines the
    # per-image error sums. The metrics are a mean over the same
    # per-image error set regardless of process layout, so the 2-process
    # values must match the single-process oracle's.
    from monodepth_tpu.evaluation import eigen

    test_lines = readlines(os.path.join(args.splits, cfg.datatype,
                                        "test_files.txt"))
    local_lines = eigen.process_slice(test_lines)
    gts = eigen.load_ground_truth(cfg.datapath, local_lines)
    result["eigen"] = eigen.evaluate_multihost(
        cfg, state, local_lines, gts, eval_batch=4, num_workers=2)
    result["eigen_local_images"] = len(local_lines)

    # --- spatial x multi-host: the halo ppermute ACROSS a process
    # boundary (BASELINE.json config 5's topology — the one sharding
    # shape with no other coverage). Mesh devices are interleaved so
    # every spatial pair spans both processes (the default order keeps
    # pairs intra-process); the _spatial_pallas_sampler's halo ppermute,
    # pmin agreement, and (cond) all-gather fallback then ride Gloo/DCN
    # instead of intra-process memory. Both ranks load the SAME full
    # global batch (process_count=1 slicing, same seed) and place it via
    # make_array_from_callback — the loader's per-process B-slices are
    # data-axis semantics, exercised by the phase above.
    import numpy as np

    from monodepth_tpu.training.step import _make_sampler

    spatial_cfg = Config(datapath=args.datapath, splits=args.splits,
                         height=32, width=128, batch=8, scales=(0, 1),
                         precision="f32", weight_init=False,
                         use_pallas=True, pallas_interpret=True,
                         num_workers=2).validate()
    devs = np.asarray(jax.devices())
    if args.num_processes > 1:
        devs = devs.reshape(args.num_processes, -1).T.reshape(-1)
    smesh = make_mesh(4, 2, devices=devs)
    assert _make_sampler(spatial_cfg, smesh)[1], \
        "spatial Pallas sampler inactive — the test would cover nothing"
    if args.num_processes > 1:
        cross = sum(a.process_index != b.process_index
                    for a, b in smesh.devices)
        assert cross == 4, f"only {cross}/4 spatial pairs cross processes"

    sds = KittiDataset(spatial_cfg.datapath, lines, is_training=True,
                       frame_ids=spatial_cfg.frame_ids,
                       height=spatial_cfg.height, width=spatial_cfg.width,
                       load_depth=False)
    sloader = Loader(sds, batch_size=spatial_cfg.batch, shuffle=True,
                     num_workers=2, seed=spatial_cfg.seed,
                     process_index=0, process_count=1)  # full global batch
    sbatch = next(sloader.epoch(0))
    sloader.close()
    sshardings = batch_shardings(smesh, sbatch)
    gbatch = {k: jax.make_array_from_callback(
                  v.shape, sshardings[k],
                  (lambda v_: lambda idx: v_[idx])(v))
              for k, v in sbatch.items()}

    # The interleaved mesh's Gloo contexts (full set in THIS device
    # order + the cross-process halo pairs) are distinct from the
    # data-mesh clique warmed above — pin them while the ranks are
    # still in lockstep, or the interpret-mode step's skewed execution
    # races the ~30 s context-init window (warm_collectives doc).
    assert warm_collectives(smesh) == smesh.devices.size
    smodel = build_model(spatial_cfg)
    stx = make_optimizer(spatial_cfg, steps_per_epoch=4)
    sstate = replicate(smesh, create_state(spatial_cfg, smodel, stx))
    sstep = make_train_step(smodel, stx, spatial_cfg, mesh=smesh)
    sstate, smetrics = sstep(sstate, gbatch)
    result["loss_spatial"] = float(smetrics["loss"])
    result["warp_span_spatial"] = float(smetrics.get("warp_span", -1.0))

    if args.ckpt_dir:
        # Multi-host checkpoint contract (SURVEY §5.4/§5.8): EVERY process
        # calls save/restore — Orbax coordinates the write internally
        # (primary-host writes + cross-process barriers once
        # jax.distributed is initialized); pruning alone is rank-0-guarded
        # (training/checkpoint.py). Save after step 1, take an
        # uninterrupted step 2, then restore into a FRESH replicated
        # state and re-run step 2: losses must match bit-for-bit.
        from monodepth_tpu.training.checkpoint import Checkpointer

        ckpt = Checkpointer(args.ckpt_dir)
        ckpt.save(0, state)

        # the tiny synthetic split yields one batch per epoch; step 2
        # draws from the next epoch (deterministic per-(seed,epoch) order)
        (batch2,) = list(prefetch_to_device(
            iter([next(loader.epoch(1))]), size=1, sharding=shardings))
        _, metrics2 = step(state, batch2)
        result["loss_step2"] = float(metrics2["loss"])

        fresh = replicate(mesh, create_state(cfg, model, tx))
        restored, epoch = ckpt.restore(fresh)
        assert epoch == 0
        restored = replicate(mesh, restored)
        _, metrics2r = step(restored, batch2)
        result["loss_step2_restored"] = float(metrics2r["loss"])

        # The async form must coordinate the commit across processes the
        # same way (ocp.AsyncCheckpointer background-thread write + commit
        # barrier): save, drain, restore, and require bit-identical params.
        ckpt_a = Checkpointer(args.ckpt_dir + "_async", async_save=True)
        ckpt_a.save(0, state)
        ckpt_a.wait()
        restored_a, _ = ckpt_a.restore(fresh)
        result["async_ckpt_ok"] = bool(jax.tree.all(jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(state.params), restored_a.params)))

    loader.close()

    if jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump(result, f)
    print(f"worker {args.process_id}: loss={loss:.6f} "
          f"devices={jax.device_count()} local={jax.local_device_count()}")


if __name__ == "__main__":
    main()
