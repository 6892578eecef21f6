"""KITTI Eigen test protocol — the parity target (BASELINE.md).

Faithful rebuild of the reference eval pipeline (model_test.py:61-118):

  1. depth-only forward over the test split at 640x192, scaled disparity
     via disparity2depth(min=1e-3, max=80) — note the eval-specific depth
     range (model_test.py:62-63, 82)
  2. per image: bilinear-resize the disparity to the native GT resolution,
     depth = 1/disp
  3. Eigen mask (1e-3 < gt < 80) x fixed Garg crop [153:371, 44:1197]
     for the eigen splits; gt > 0 for benchmark (model_test.py:98-105)
  4. per-image median scaling, clamp to [1e-3, 80], 7-metric mean
     (model_test.py:107-115)

GT is projected straight from velodyne with vel_depth=True at the native
rectified size (model_test.py:47-57). The forward runs as one jitted
batched scan on device; the per-image metric loop is host numpy (shapes
vary per drive).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import jax
import numpy as np

from monodepth_tpu.config import Config
from monodepth_tpu.data import kitti
from monodepth_tpu.data.dataset import KittiDataset
from monodepth_tpu.losses.metrics import METRIC_NAMES
from monodepth_tpu.ops.sampling import _linear_resize_matrix
from monodepth_tpu.training.state import TrainState, build_model
from monodepth_tpu.training.step import make_infer_step
from monodepth_tpu.utils.serialization import load_npz

MIN_DEPTH, MAX_DEPTH = 1e-3, 80.0
GARG_CROP = (153, 371, 44, 1197)  # model_test.py:100


def depth_errors_np(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """The 7 KITTI depth metrics over flat valid pixels (numpy twin of
    losses/metrics.depth_errors; reference: model_metric.py:19-44)."""
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25 ** 2).mean()
    a3 = (thresh < 1.25 ** 3).mean()
    rmse = np.sqrt(((gt - pred) ** 2).mean())
    rmse_log = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())
    abs_rel = (np.abs(gt - pred) / gt).mean()
    sq_rel = ((gt - pred) ** 2 / gt).mean()
    return np.array([abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3])


def resize_bilinear_np(image: np.ndarray, height: int, width: int) -> np.ndarray:
    """cv2.resize(..., INTER_LINEAR) equivalent: separable half-pixel
    bilinear, no antialiasing (model_test.py:95)."""
    Rh = _linear_resize_matrix(image.shape[0], height, align_corners=False)
    Rw = _linear_resize_matrix(image.shape[1], width, align_corners=False)
    return Rh @ image.astype(np.float64) @ Rw.T


def load_ground_truth(datapath: str, lines: Sequence[str],
                      cache_dir: str | None = None) -> List[np.ndarray]:
    """Native-size velodyne GT depths, vel_depth=True (model_test.py:47-57).

    `cache_dir` persists each projected scan as .npy (atomic publish, same
    pattern as KittiDataset._load_depth) so repeat eval runs skip the 697
    velodyne projections. These maps are native-size/vel_depth — a
    different artifact from the dataset's resized training GT cache."""
    import hashlib

    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
    out = []
    for line in lines:
        folder, frame, side = kitti.parse_split_line(line)
        cache = None
        if cache_dir:
            # datapath is part of the key: the default cache dir is shared
            # (model_test.py --gt_cache), and without it an eval against a
            # different tree (synthetic vs real KITTI) would silently serve
            # the previous dataset's projections
            key = hashlib.md5(
                f"{os.path.abspath(datapath)}|{folder}|{frame}|{side}|"
                f"native_vel".encode()).hexdigest()
            cache = os.path.join(cache_dir, key + ".npy")
            if os.path.exists(cache):
                try:
                    out.append(np.load(cache))
                    continue
                except (EOFError, ValueError, OSError):
                    pass  # racing writer: recompute
        depth = kitti.velodyne_to_depth(
            kitti.calib_dir(datapath, folder),
            kitti.velodyne_path(datapath, folder, frame),
            cam=kitti.SIDE_MAP[side], vel_depth=True)
        if cache:
            tmp = f"{cache}.{os.getpid()}.tmp.npy"
            np.save(tmp, depth)
            os.replace(tmp, cache)
        out.append(depth)
    return out


def predict_disparities(cfg: Config, state: TrainState,
                        lines: Sequence[str],
                        eval_batch: int = 16,
                        num_workers: int = 8,
                        mesh=None,
                        infer=None) -> np.ndarray:
    """Jitted batched depth-only forward -> [N, H, W] scaled disparities.

    IO runs through the threaded Loader (native decode, in order, last
    partial batch padded to keep the jit shape static) so the TPU stays
    fed during the sweep (BASELINE config 2).

    Pass a `jax.sharding.Mesh` to shard each batch over the "data" axis
    and run the sweep on the whole slice (the reference eval is strictly
    single-GPU, model_test.py:61-83): state is replicated, images arrive
    P("data")-sharded, and the jitted forward runs fully data-parallel —
    per-image outputs are mesh-size-invariant, so metrics are identical
    to the single-device sweep (tests/test_eval_trainer.py). The mesh
    must be process-local (all devices addressable): `lines` is always
    THIS CALLER's responsibility — on a multi-host slice each process
    sweeps its own slice of the split on its own devices and combines
    sums afterwards (`evaluate_multihost`), so the Loader here never
    re-slices per process.

    `infer`: pass a cached `make_infer_step(...)` to skip the per-call
    retrace (Trainer.eigen_eval does, so --eigen_every pays one trace)."""
    from monodepth_tpu.data.pipeline import Loader

    sharding = None
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from monodepth_tpu.parallel.mesh import replicate

        ndata = mesh.shape["data"]
        eval_batch = -(-eval_batch // ndata) * ndata  # round up: divisible
        sharding = NamedSharding(mesh, P("data"))
        state = replicate(mesh, state)

    if infer is None:  # one-shot CLI path; in-training sweeps pass a
        # cached step (Trainer.eigen_eval) so repeat epochs skip the
        # retrace + remote compile-cache round trip
        infer = make_infer_step(build_model(cfg), cfg)
    dataset = KittiDataset(cfg.datapath, lines, is_training=False,
                           frame_ids=(0,), height=cfg.height,
                           width=cfg.width, load_depth=False)
    loader = Loader(dataset, batch_size=eval_batch, shuffle=False,
                    num_workers=num_workers, drop_last=False,
                    process_index=0, process_count=1)
    disps = []
    try:
        for batch in loader.epoch(0):
            frames = batch["frames"][:, 0]
            pad = eval_batch - len(frames)
            if pad:  # keep the batch shape static for jit
                frames = np.concatenate([frames, frames[-1:].repeat(pad, 0)])
            images = frames.astype(np.float32) / 255.0
            if sharding is not None:
                images = jax.device_put(images, sharding)
            out = np.asarray(jax.device_get(infer(state, images)))
            disps.append(out[: len(frames) - pad])
    finally:
        loader.close()
    return np.concatenate(disps)


def eigen_errors(disparities: np.ndarray,
                 ground_truths: Sequence[np.ndarray],
                 datatype: str = "kitti_eigen_zhou") -> np.ndarray:
    """Steps 2-4 of the protocol over precomputed disparities: the
    per-image [N, 7] error matrix (mean over axis 0 = the reference's
    table, model_test.py:114-115; kept per-image so multi-host sweeps
    can combine sums exactly)."""
    errors = []
    eigen = "eigen" in datatype
    for disp, gt in zip(disparities, ground_truths):
        height, width = gt.shape
        pred_depth = 1.0 / resize_bilinear_np(disp, height, width)

        if eigen:
            mask = np.logical_and(gt > MIN_DEPTH, gt < MAX_DEPTH)
            crop_mask = np.zeros_like(mask)
            crop_mask[GARG_CROP[0]:GARG_CROP[1],
                      GARG_CROP[2]:GARG_CROP[3]] = True
            mask = np.logical_and(mask, crop_mask)
        else:
            mask = gt > 0.0

        pred = pred_depth[mask]
        gt_m = gt[mask]
        pred *= np.median(gt_m) / np.median(pred)
        pred = np.clip(pred, MIN_DEPTH, MAX_DEPTH)
        errors.append(depth_errors_np(gt_m, pred))
    if not errors:
        return np.zeros((0, len(METRIC_NAMES)))
    return np.stack(errors)


def eigen_metrics(disparities: np.ndarray,
                  ground_truths: Sequence[np.ndarray],
                  datatype: str = "kitti_eigen_zhou") -> Dict[str, float]:
    """The 7-metric mean-over-images table (reference model_test.py).
    Plain-float values: callers json.dump these (metrics.jsonl, the
    distributed worker) and np.float64 is not JSON-serializable."""
    errors = eigen_errors(disparities, ground_truths, datatype)
    if not len(errors):
        # a mean over zero images would be a silent all-NaN row in
        # metrics.jsonl (evaluate_multihost guards this itself)
        raise ValueError("eigen_metrics: empty sweep (no images)")
    return dict(zip(METRIC_NAMES, errors.mean(0).tolist()))


def process_slice(lines: Sequence[str]) -> list:
    """This process's interleaved slice of the test split for a
    multi-host sweep. Interleaved (not contiguous) so drive-length
    imbalance spreads evenly across hosts; the final metric is a mean
    over per-image errors, which is order-invariant."""
    return list(lines)[jax.process_index()::jax.process_count()]


def evaluate_multihost(cfg: Config, state: TrainState,
                       local_lines: Sequence[str],
                       local_gts: Sequence[np.ndarray],
                       eval_batch: int = 16, num_workers: int = 8,
                       infer=None, failure: Exception | None = None
                       ) -> Dict[str, float]:
    """The full Eigen protocol on a multi-host slice — the TPU-native
    form of the reference's strictly single-GPU model_test.py sweep.

    SPMD over hosts with NO collectives in the hot loop: every process
    independently sweeps `local_lines` (its `process_slice` of the test
    split) on its OWN local devices — the replicated train state is
    fetched to host once and re-placed on a process-local mesh — then
    ONE tiny allgather combines the per-image error sums into the exact
    global mean (identical to the single-controller sweep: a mean over
    the same per-image error set).

    Collective-safety contract: every process MUST call this in lockstep
    (the Trainer does — same epoch schedule). A rank whose local sweep
    fails still joins the final allgather carrying ok=0 (no deadlock),
    then EVERY rank raises, so the failure surfaces consistently. A rank
    that failed before calling can pass its exception as `failure` to
    keep the collective alive. Works unchanged single-process (the
    allgather degenerates to identity)."""
    from jax.experimental import multihost_utils

    from monodepth_tpu.parallel.mesh import make_mesh

    nmetrics = len(METRIC_NAMES)
    err: Exception | None = failure
    sums, count = np.zeros(nmetrics), 0.0
    if err is None:
        try:
            if len(local_lines) != len(local_gts):
                raise ValueError(f"{len(local_lines)} lines vs "
                                 f"{len(local_gts)} ground truths")
            if local_lines:
                params, stats = jax.device_get((state.params,
                                                state.batch_stats))
                local_state = TrainState(
                    step=np.zeros((), np.int32), params=params,
                    batch_stats=stats, opt_state=(),
                    rng=np.zeros((2,), np.uint32))
                local_devices = jax.local_devices()
                mesh = (make_mesh(devices=local_devices)
                        if len(local_devices) > 1 else None)
                disps = predict_disparities(cfg, local_state, local_lines,
                                            eval_batch, num_workers,
                                            mesh=mesh, infer=infer)
                errors = eigen_errors(disps, local_gts, cfg.datatype)
                sums, count = errors.sum(0), float(len(errors))
        except Exception as exc:  # noqa: BLE001 — must reach the collective
            err = exc
            sums, count = np.zeros(nmetrics), 0.0
    payload = np.concatenate([sums, [count, 0.0 if err else 1.0]])
    gathered = np.asarray(multihost_utils.process_allgather(
        payload.astype(np.float64)))
    if gathered[:, -1].min() < 1.0:
        failed = np.nonzero(gathered[:, -1] < 1.0)[0].tolist()
        raise RuntimeError(
            f"eigen sweep failed on process(es) {failed}"
            + (f": {type(err).__name__}: {err}" if err is not None else
               " (this rank succeeded; see the failed ranks' logs)")
        ) from err
    total = gathered[:, nmetrics].sum()
    if total == 0:
        raise RuntimeError("eigen sweep saw zero test images")
    means = gathered[:, :nmetrics].sum(0) / total
    return dict(zip(METRIC_NAMES, means.tolist()))  # json-serializable


def evaluate(cfg: Config, state: TrainState,
             lines: Sequence[str] | None = None,
             ground_truths: Sequence[np.ndarray] | None = None,
             eval_batch: int = 16, mesh=None) -> Dict[str, float]:
    """Full protocol: forward + metrics. Returns {metric: value}."""
    if lines is None:
        lines = kitti.readlines(os.path.join(
            cfg.splits, cfg.datatype, "test_files.txt"))
    if ground_truths is None:
        ground_truths = load_ground_truth(cfg.datapath, lines)
    disps = predict_disparities(cfg, state, lines, eval_batch, mesh=mesh)
    return eigen_metrics(disps, ground_truths, cfg.datatype)


def parse_weights_spec(spec: str) -> tuple[str, int]:
    """`<dir>:<epoch>` -> (dir, epoch). The LAST colon splits, so a
    directory path containing colons still parses (the one shared parser
    for model_test.py / infer_image.py / export_poses.py /
    export_inference.py — these drifted apart once)."""
    directory, sep, epoch = spec.rpartition(":")
    if not sep or not epoch.isdigit():
        raise ValueError(f"weights spec {spec!r} must be <dir>:<epoch>")
    return directory, int(epoch)


def detect_scales(weights_dir: str, epoch: int) -> tuple[int, ...] | None:
    """Infer the training scales from a decoder npz export (its
    `dispconv_<s>` heads). Returns None if no decoder file exists."""
    path = os.path.join(weights_dir, f"decoder{epoch}.npz")
    if not os.path.exists(path):
        return None
    tree = load_npz(path)["params"]
    return tuple(sorted(int(k.rsplit("_", 1)[1]) for k in tree
                        if k.startswith("dispconv_")))


def state_from_modules(cfg: Config, weights_dir: str,
                       epoch: int) -> TrainState:
    """Assemble an eval-only TrainState from per-module npz exports
    (`encoder<epoch>.npz` etc — the reference's per-model checkpoint
    layout, model_tool/logger.py:60-66 / model_test.py:29-43)."""
    import jax.numpy as jnp

    from monodepth_tpu.training.state import create_state, make_optimizer

    model = build_model(cfg)
    tx = make_optimizer(cfg, 1)
    state = create_state(cfg, model, tx)
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for name in params:
        path = os.path.join(weights_dir, f"{name}{epoch}.npz")
        if not os.path.exists(path):
            # depth-only eval needs encoder+decoder; pose modules may be
            # absent (the reference's official-weight eval also loads
            # only those two, model_test.py:29-43) — left at init, unused
            if name in ("encoder", "decoder"):
                raise FileNotFoundError(path)
            print(f">>> {name}{epoch}.npz not found; leaving {name} at "
                  f"init (depth-only eval does not run it)")
            continue
        tree = load_npz(path)
        params[name] = tree["params"]
        if "batch_stats" in tree:
            stats[name] = tree["batch_stats"]
    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    return TrainState(step=state.step, params=params, batch_stats=stats,
                      opt_state=state.opt_state, rng=state.rng)


def print_table(name: str, metrics: Dict[str, float]) -> None:
    """The reference's console table (model_test.py:117-118)."""
    print(f">>> {name}")
    print(">>>   abs_rel   sqrt_rel  rmse      rmse_log  a1        a2        a3")
    print(">>>" + ("   {:4.3f}  " * 7).format(
        *[metrics[k] for k in METRIC_NAMES]))
