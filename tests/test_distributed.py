"""Genuine 2-process `jax.distributed` run on CPU (SURVEY.md §5.8).

The round-2 suite contract-tested the per-process Loader slicing and the
`put_global` assembly in ONE process; this spawns two real processes
(local coordinator, 4 virtual devices each -> one 8-device slice) and
asserts the multi-host train-step loss equals the single-process value,
executing `jax.make_array_from_process_local_data` for real
(`parallel/mesh.py put_global` via `prefetch_to_device`).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from monodepth_tpu.data.synthetic import make_kitti_tree, make_split_files

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
_CACHE = os.path.join(os.path.dirname(__file__), ".jax_cache")
# Cold-compile-cache worst case: a train-step source change invalidates
# every cached executable, and a cold 8-device CPU compile under full-
# suite load on this 1-CPU host has been observed to blow a 1200 s
# budget (the root cause of the historical ~1-in-3 full-suite flake).
_TIMEOUT = 2400


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    make_kitti_tree(root, num_frames=8, image_hw=(96, 320))
    splits = make_split_files(root, num_frames=8)
    return root, splits


def _worker_env() -> dict:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["MONODEPTH_TEST_CACHE"] = _CACHE
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # never inherit this test process's distributed/coordinator state
    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"):
        env.pop(k, None)
    return env


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_matches_single(kitti_tree, tmp_path):
    root, splits = kitti_tree
    env = _worker_env()
    base = [sys.executable, _WORKER, "--datapath", root, "--splits", splits]

    # single-process oracle: one worker, 8 local devices (it also runs
    # the checkpoint save->restore->step2 exercise, single-process form)
    env8 = dict(env, XLA_FLAGS="--xla_force_host_platform_device_count=8")
    single_out = str(tmp_path / "single.json")
    res = subprocess.run(
        base + ["--out", single_out, "--ckpt_dir", str(tmp_path / "ckpt1")],
        env=env8, capture_output=True, text=True, timeout=_TIMEOUT)
    assert res.returncode == 0, res.stdout + res.stderr

    # the genuine 2-process slice. ONLY spawn-level failures (coordinator
    # port races, Gloo/distributed connect timeouts under a fully loaded
    # 1-CPU host) get ONE retry with a fresh port — gated on their log
    # signatures below, so a deterministic crash inside the train step
    # (or a loss mismatch) never retries; those would be real bugs.
    # NOTE: signatures must be failure-specific. Bare "gloo"/"coordinator"
    # match the NORMAL "[Gloo] Rank N is connected" / distributed-init
    # banners every worker prints, which silently turned the gate into
    # retry-on-anything (observed: a deterministic worker crash retried).
    spawn_sigs = ("connection refused", "timed out",
                  "deadline_exceeded", "unavailable",
                  "address already in use", "failed to bind")
    retried = False
    outs = [str(tmp_path / f"multi{i}.json") for i in range(2)]
    for attempt in range(2):
        coord = f"127.0.0.1:{_free_port()}"
        procs = []
        logs = []
        try:
            ckpt2 = str(tmp_path / f"ckpt2_attempt{attempt}")
            for i in range(2):
                procs.append(subprocess.Popen(
                    base + ["--coordinator", coord, "--num_processes", "2",
                            "--process_id", str(i), "--out", outs[i],
                            "--ckpt_dir", ckpt2],
                    env=env, stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT, text=True))
            for p in procs:
                out, _ = p.communicate(timeout=_TIMEOUT)
                logs.append(out)
        finally:
            # a hung/failed worker must not outlive the test: it would
            # pin this 1-CPU host (and the coordinator port) for the
            # rest of the pytest session
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait()
        if all(p.returncode == 0 for p in procs):
            break
        joined = "\n".join(logs).lower()
        if attempt == 0 and any(s in joined for s in spawn_sigs):
            retried = True
            print("2-process spawn failed (spawn-level signature), "
                  "retrying with a fresh port:\n" + "\n".join(logs))
        else:
            break  # deterministic worker failure: surface it, no retry
    # Root-caused full-suite slowness (round 4): a train-step source
    # change invalidates every persistent-cache entry, and a cold
    # f32 train-step compile for an 8-device CPU mesh takes minutes on
    # this 1-CPU host — under full-suite load the old 1200 s budget
    # could be exceeded (the only observed failure mode; never a wrong
    # loss). Workers share tests/.jax_cache, so only the FIRST run
    # after such a change is slow.
    assert all(p.returncode == 0 for p in procs), \
        (f"worker returncodes {[p.returncode for p in procs]} "
         f"(retried={retried})\n" + "\n".join(logs))

    with open(single_out) as f:
        single = json.load(f)
    with open(outs[0]) as f:
        multi = json.load(f)

    assert single["devices"] == multi["devices"] == 8
    assert single["processes"] == 1 and multi["processes"] == 2
    assert multi["local_devices"] == 4
    # same global batch, same mesh, same seeds -> same loss (fp reduction
    # order may differ across process layouts; tolerance is loose-tight)
    assert multi["loss"] == pytest.approx(single["loss"], rel=1e-4), \
        (single, multi, "\n".join(logs))

    # Multi-host checkpointing (SURVEY §5.4/§5.8): both processes saved
    # into ONE directory after step 1 (Orbax primary-host coordination —
    # no directory race), restored into a fresh state, and re-ran step 2.
    # An uninterrupted step 2 and a restored step 2 run the same jitted
    # fn on identical inputs -> bit-identical losses; and the 2-process
    # step-2 trajectory matches the single-process oracle's.
    assert multi["loss_step2_restored"] == multi["loss_step2"], multi
    assert single["loss_step2_restored"] == single["loss_step2"], single
    assert multi["loss_step2"] == pytest.approx(single["loss_step2"],
                                                rel=1e-4), (single, multi)
    # async form: cross-process commit barrier + bit-identical restore
    assert multi["async_ckpt_ok"] is True, multi
    assert single["async_ckpt_ok"] is True, single

    # Spatial x multi-host (round 5): one train step on a {data:4,
    # spatial:2} mesh whose spatial pairs each span BOTH processes, so
    # the Pallas warp's halo ppermute / pmin / all-gather-fallback ran
    # over the cross-process backend (Gloo here; DCN on a pod). Same
    # global batch + state as the single-process spatial oracle -> same
    # loss. warp_span >= 0 proves the Pallas telemetry path was live
    # (i.e. the kernel sampler, not the packed fallback, was compiled in).
    assert multi["warp_span_spatial"] >= 0.0, multi
    assert single["warp_span_spatial"] >= 0.0, single
    assert multi["loss_spatial"] == pytest.approx(single["loss_spatial"],
                                                  rel=1e-4), (single, multi)

    # Multi-host Eigen sweep (--eigen_every's evaluate_multihost path):
    # the 2-process sweep splits the test lines across ranks (rank 0 sees
    # only its slice) yet the allgathered metrics equal the
    # single-process oracle's — same per-image error set, same mean.
    assert multi["eigen_local_images"] < single["eigen_local_images"]
    for key, value in single["eigen"].items():
        assert multi["eigen"][key] == pytest.approx(value, rel=1e-4), \
            (key, single["eigen"], multi["eigen"])
