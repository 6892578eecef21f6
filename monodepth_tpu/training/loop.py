"""The training orchestrator: data, state, epoch loop, logging, checkpoints.

TPU-native rebuild of the reference trainer (model_train.py:25-97 +
model_tool/loader.py:16-118 + model_tool/logger.py:16-72):

- one compiled train step; batches stream through `prefetch_to_device`
  pre-sharded over the mesh, so host->HBM copies overlap compute
- metrics accumulate ON DEVICE and are fetched every `log_every` steps —
  the reference synced device->host every iteration (`loss.item()` print,
  model_train.py:69; SURVEY.md §3.2 flags this as the anti-pattern)
- epoch summary table matches the reference's 8-metric console log
  (logger.py:39-48); curves exported as .npy per split (the reference
  overwrote train curves with valid ones — logger.py:70-72; fixed here)
- full-state checkpoint every `ckpt_every` epochs + final, with resume
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from monodepth_tpu.config import Config
from monodepth_tpu.data.dataset import KittiDataset
from monodepth_tpu.data.kitti import readlines
from monodepth_tpu.data.pipeline import Loader, prefetch_to_device
from monodepth_tpu.losses.metrics import METRIC_NAMES
from monodepth_tpu.parallel import make_mesh, replicate, warm_collectives
from monodepth_tpu.parallel.mesh import batch_shardings
from monodepth_tpu.training.checkpoint import Checkpointer
from monodepth_tpu.training.state import (
    build_model,
    create_state,
    make_optimizer,
)
from monodepth_tpu.training.step import (
    make_eval_step,
    make_train_multi_step,
    make_train_step,
)
from monodepth_tpu.utils.serialization import load_npz
from monodepth_tpu.utils.torch_import import (
    load_torch_file,
    resnet_encoder_variables,
)

LOG_METRICS = ("loss",) + METRIC_NAMES  # reference: logger.py:27


def _stack_superbatches(batches, k: int):
    """Group k consecutive host batches into one [k, B, ...] superbatch
    for `make_train_multi_step`. A trailing partial group is dropped
    (same fixed-shape rationale as drop_last)."""
    group = []
    for batch in batches:
        group.append(batch)
        if len(group) == k:
            yield {key: np.stack([g[key] for g in group]) for key in group[0]}
            group = []


def load_pretrained(cfg: Config) -> Optional[dict]:
    """Converted ImageNet weights for the encoder(s) (`--weight_init`,
    reference: depth_encoder.py:44-62). Accepts either a pre-converted
    `resnet<N>.npz` (utils/serialization layout) or a raw torchvision
    `resnet<N>.pth`. Returns {module_name: variables} or None."""
    if not cfg.weight_init:
        return None
    base = os.path.join(cfg.pretrained_dir, f"resnet{cfg.num_layers}")
    if os.path.exists(base + ".npz"):
        sd = None
        single = load_npz(base + ".npz")
    elif os.path.exists(base + ".pth"):
        sd = load_torch_file(base + ".pth")
        single = resnet_encoder_variables(sd, cfg.num_layers, 1)
    else:
        print(f">>> no pretrained resnet{cfg.num_layers} under "
              f"{cfg.pretrained_dir}; using random init")
        return None
    out = {"encoder": single}
    if cfg.pose_type == "separate":
        if sd is None:
            # rebuild the torch-layout dict is impossible from npz; tile
            # the converted conv1 instead (same rule, depth_encoder.py:59)
            import copy

            pose = copy.deepcopy(single)
            conv1 = pose["params"]["conv1"]["kernel"]
            n = cfg.num_pose_frames
            pose["params"]["conv1"]["kernel"] = np.concatenate(
                [conv1] * n, axis=2) / n
        else:
            pose = resnet_encoder_variables(sd, cfg.num_layers,
                                            cfg.num_pose_frames)
        out["pose_encoder"] = pose
    return out


# Metrics whose epoch MAX matters, not just the mean: a cumulative mean
# dilutes late-epoch divergence (3,000 healthy steps hide 300 diverged
# ones), so these also get a running max (reported as "<key>_max").
_MAX_KEYS = ("warp_span",)


class _Meter:
    """Device-side running sums; one host fetch per flush. Metric values
    may be scalars or [K]-stacked (steps_per_call > 1)."""

    def __init__(self):
        self.sums: Dict[str, object] = {}
        self.maxes: Dict[str, object] = {}
        self.count = 0

    def update(self, metrics: Dict[str, object]):
        import jax.numpy as jnp

        k = 1
        for key, v in metrics.items():
            if getattr(v, "ndim", 0):
                k = v.shape[0]  # static shape: no device sync
                if key in _MAX_KEYS:
                    vm = v.max()
                    self.maxes[key] = (vm if key not in self.maxes
                                       else jnp.maximum(self.maxes[key], vm))
                v = v.sum()
            elif key in _MAX_KEYS:
                self.maxes[key] = (v if key not in self.maxes
                                   else jnp.maximum(self.maxes[key], v))
            self.sums[key] = v if key not in self.sums else self.sums[key] + v
        self.count += k

    def means(self) -> Dict[str, float]:
        if not self.count:
            return {k: float("nan") for k in LOG_METRICS}
        # ONE host fetch per flush (a fetch costs ~31 ms RTT here)
        sums, maxes = jax.device_get((self.sums, self.maxes))
        out = {k: float(v) / self.count for k, v in sums.items()}
        for k, v in maxes.items():
            out[k + "_max"] = float(v)
        return out


class Trainer:
    """`Trainer(options()).train()` — the reference entry contract
    (model_train.py:100-101)."""

    def __init__(self, cfg: Config, mesh=None,
                 train_files: Sequence[str] | None = None,
                 valid_files: Sequence[str] | None = None):
        self.cfg = cfg = cfg.validate()
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.data_parallel or 0)
        warm_collectives(self.mesh)  # multi-host: pin comm clique before
        # the big train-step compile. Batches shard over the "data" axis
        # only (H goes to "spatial" — parallel/mesh.py batch_sharding), so
        # divisibility is against data, not devices: a (data=4, spatial=2)
        # mesh takes --batch 12 fine.
        ndata = self.mesh.shape["data"]
        if cfg.batch % ndata:
            raise ValueError(f"global batch {cfg.batch} not divisible by "
                             f"the mesh's data axis ({ndata})")

        split_dir = os.path.join(cfg.splits, cfg.datatype)
        if train_files is None:
            train_files = readlines(os.path.join(split_dir, "train_files.txt"))
        if valid_files is None:
            valid_files = readlines(os.path.join(split_dir, "val_files.txt"))

        gt_cache = os.path.join(cfg.save_root, "gt_cache")
        frame_cache = (os.path.join(cfg.save_root, "frame_cache")
                       if cfg.cache_frames else None)
        ds_args = dict(datapath=cfg.datapath, frame_ids=cfg.frame_ids,
                       height=cfg.height, width=cfg.width,
                       gt_cache_dir=gt_cache, frame_cache_dir=frame_cache)
        # without in-step GT metrics the 375x1242 depth map is dead
        # weight on the train path — skipping it saves the velodyne
        # load AND a 22 MB/batch host->device transfer (the valid pass
        # always loads GT for its full metric table)
        self.train_dataset = KittiDataset(filenames=train_files,
                                          is_training=True,
                                          load_depth=cfg.train_gt_metrics,
                                          **ds_args)
        self.valid_dataset = KittiDataset(filenames=valid_files,
                                          is_training=False, **ds_args)
        loader_args = dict(batch_size=cfg.batch, num_workers=cfg.num_workers,
                           seed=cfg.seed, drop_last=True,
                           prefetch_batches=cfg.prefetch)
        self.train_loader = Loader(self.train_dataset, shuffle=True,
                                   **loader_args)
        self.valid_loader = Loader(self.valid_dataset, shuffle=False,
                                   **loader_args)

        self.model = build_model(cfg)
        self.tx = make_optimizer(cfg, steps_per_epoch=len(self.train_loader))
        self.state = create_state(cfg, self.model, self.tx,
                                  pretrained=load_pretrained(cfg))
        self.state = replicate(self.mesh, self.state)

        step_mesh = self.mesh if self.mesh.devices.size > 1 else None
        self.train_step = self._build_train_step(cfg)
        # warp auto-swap (--warp_auto_swap): both step objects stay cached
        # so oscillating across GUARD_SPAN costs one compile per direction
        # per run, nothing after (jit caches by function identity)
        self._train_step_cache = {"pallas": self.train_step}
        self._warp_swapped = False
        self.eval_step = make_eval_step(self.model, cfg, mesh=step_mesh)

        from monodepth_tpu.utils.platform import enable_compile_cache

        enable_compile_cache(os.path.join(cfg.save_root, ".jax_cache"))

        self.save_dir = os.path.join(cfg.save_root, cfg.save)
        self.checkpointer = Checkpointer(self.save_dir, keep=cfg.ckpt_keep,
                                         async_save=cfg.async_ckpt)
        self.start_epoch = 0
        if cfg.resume and self.checkpointer.latest_epoch() is not None:
            self.state, restored = self.checkpointer.restore(self.state)
            self.state = replicate(self.mesh, self.state)
            self.start_epoch = restored + 1
            print(f">>> resumed from epoch {restored}")

        self.history = {split: {k: [] for k in LOG_METRICS}
                        for split in ("train", "valid")}
        if self.start_epoch:
            self._load_curves()  # keep curves continuous across resume

        self._eigen = None  # lazy (lines, ground_truths) for --eigen_every
        self._eigen_infer = None  # cached jitted depth forward (one trace)

    # ------------------------------------------------------------------
    def _build_train_step(self, cfg: Config):
        step_mesh = self.mesh if self.mesh.devices.size > 1 else None
        if cfg.steps_per_call > 1:
            return make_train_multi_step(self.model, self.tx, cfg,
                                         donate=cfg.donate, mesh=step_mesh)
        return make_train_step(self.model, self.tx, cfg,
                               donate=cfg.donate, mesh=step_mesh)

    def _maybe_swap_sampler(self, train_log: Dict[str, float]):
        """Epoch-boundary divergence remediation (--warp_auto_swap).

        The Pallas candidate kernel's cost is linear in the displacement
        field's per-slab span; a diverged run (~±50 px noise warps) makes
        it ~10x slower than the flat-cost packed XLA gather. The per-warp
        `--warp_guard` cond fixes that at a measured 23% steady-state tax,
        so the default remediation acts at epoch boundaries instead: when
        a training epoch's MEAN warp_span exceeds GUARD_SPAN, the next
        epoch runs a rebuilt step on the packed sampler (with span
        telemetry kept alive via cfg.warp_telemetry), and swaps back the
        first epoch the mean span recovers. Zero cost while healthy; one
        recompile per swap direction per run. Returns the new sampler
        label on a swap, else None. Reference: SURVEY §5.3 — the
        reference has no failure detection at all; this makes unattended
        divergence a logged, self-correcting event instead of a silent
        10x slowdown."""
        import dataclasses
        import math

        cfg = self.cfg
        if not cfg.warp_auto_swap or cfg.warp_guard:
            return None
        span = train_log.get("warp_span")
        if span is None or math.isnan(span):
            return None
        from monodepth_tpu.ops.pallas.warp_sample import GUARD_SPAN

        if not self._warp_swapped and span > GUARD_SPAN:
            if "packed" not in self._train_step_cache:
                fb = dataclasses.replace(cfg, use_pallas=False,
                                         warp_telemetry=True)
                self._train_step_cache["packed"] = self._build_train_step(fb)
            self.train_step = self._train_step_cache["packed"]
            self._warp_swapped = True
            print(f">>> warp auto-swap: epoch-mean warp span {span:.0f} px "
                  f"> {GUARD_SPAN:.0f} (Pallas kernel out of its fast "
                  f"regime) — swapping to the flat-cost packed gather for "
                  f"the next epoch (one recompile; swaps back on recovery)")
            return "packed"
        if self._warp_swapped and span <= GUARD_SPAN:
            self.train_step = self._train_step_cache["pallas"]
            self._warp_swapped = False
            print(f">>> warp auto-swap: epoch-mean warp span recovered to "
                  f"{span:.0f} px <= {GUARD_SPAN:.0f} — back on the Pallas "
                  f"sampler")
            return "pallas"
        return None

    # ------------------------------------------------------------------
    def eigen_eval(self) -> Dict[str, float]:
        """The FULL Eigen test protocol (evaluation/eigen.py — the
        reference's post-hoc model_test.py run, here available in-training
        via --eigen_every N). Single-controller: mesh-sharded over the
        data axis. Multi-host: every process sweeps its `process_slice`
        of the split on its local devices and one allgather combines the
        error sums (eigen.evaluate_multihost) — identical metrics either
        way. Test lines + projected velodyne GT load once per process and
        cache for the run."""
        from monodepth_tpu.evaluation import eigen

        multihost = jax.process_count() > 1
        failure: Exception | None = None
        try:
            if self._eigen is None:
                lines = readlines(os.path.join(
                    self.cfg.splits, self.cfg.datatype, "test_files.txt"))
                if multihost:
                    lines = eigen.process_slice(lines)
                gts = eigen.load_ground_truth(
                    self.cfg.datapath, lines,
                    cache_dir=os.path.join(self.cfg.save_root,
                                           "gt_cache_eval"))
                self._eigen = (lines, gts)
        except Exception as exc:  # noqa: BLE001 — a multi-host rank must
            # still reach evaluate_multihost's collective (its peers are in
            # lockstep inside it); single-controller just re-raises
            if not multihost:
                raise
            failure, (lines, gts) = exc, ([], [])
        if self._eigen is not None:
            lines, gts = self._eigen
        try:
            if self._eigen_infer is None:
                from monodepth_tpu.training.step import make_infer_step

                self._eigen_infer = make_infer_step(self.model, self.cfg)
        except Exception as exc:  # noqa: BLE001 — same lockstep contract:
            # a rank-local failure building the infer step (OOM, import)
            # must still reach evaluate_multihost's allgather or the peer
            # ranks deadlock in the collective
            if not multihost:
                raise
            failure = failure or exc
        if multihost:
            return eigen.evaluate_multihost(
                self.cfg, self.state, lines, gts,
                eval_batch=max(self.cfg.batch, 1),
                num_workers=self.cfg.num_workers,
                infer=self._eigen_infer, failure=failure)
        disps = eigen.predict_disparities(
            self.cfg, self.state, lines,
            eval_batch=max(self.cfg.batch, 1),
            num_workers=self.cfg.num_workers,
            mesh=self.mesh if self.mesh.devices.size > 1 else None,
            infer=self._eigen_infer)
        return eigen.eigen_metrics(disps, gts, self.cfg.datatype)

    # ------------------------------------------------------------------
    def _epoch(self, epoch: int, training: bool) -> Dict[str, float]:
        cfg = self.cfg
        loader = self.train_loader if training else self.valid_loader
        step_fn = self.train_step if training else self.eval_step
        meter = _Meter()
        t0 = time.perf_counter()
        images = 0

        K = cfg.steps_per_call if training else 1
        batches = loader.epoch(epoch)
        if K > 1:
            batches = _stack_superbatches(batches, K)
        first = next(iter(batches), None)
        if first is None:
            return meter.means()
        shardings = batch_shardings(self.mesh, first, stacked=K > 1)

        def chain():
            yield first
            yield from batches

        span_warned = False

        def check_span(means):
            # warp_span telemetry (step.apply_and_warp): the Pallas
            # candidate kernel's cost is linear in this span; > ~40 px
            # means the run has diverged into the regime where the
            # packed XLA gather would be faster (docs/PERF.md). Warning
            # instead of a per-warp lax.cond guard: the cond was
            # measured at ~23% steady-state throughput (--warp_guard
            # opts back into it; --warp_auto_swap remediates at epoch
            # boundaries at zero steady-state cost).
            from monodepth_tpu.ops.pallas.warp_sample import GUARD_SPAN

            nonlocal span_warned
            if self._warp_swapped:
                return  # already on the flat-cost packed sampler
            # use the running MAX, not the epoch-cumulative mean: the
            # mean dilutes late-epoch divergence below the threshold
            span = means.get("warp_span_max", means.get("warp_span"))
            if span is not None and span > GUARD_SPAN and not span_warned:
                span_warned = True
                remedy = ("--warp_auto_swap moves to the flat-cost "
                          "packed gather at the epoch boundary"
                          if self.cfg.warp_auto_swap and not
                          self.cfg.warp_guard
                          else "--warp_guard true or --use_pallas false "
                               "would keep the step's cost flat")
                print(f">>> WARNING: warp dy-span {span:.0f} px — "
                      f"displacement fields far outside the Pallas "
                      f"kernel's fast regime (diverged training?); "
                      f"{remedy}")

        for step, batch in enumerate(
                prefetch_to_device(chain(), cfg.prefetch, shardings)):
            if training:
                self.state, metrics = step_fn(self.state, batch)
            else:
                metrics = step_fn(self.state, batch,
                                  jnp.uint32(step))  # per-batch tie noise
            meter.update(metrics)
            images += cfg.batch * K
            if training and cfg.log_every and (step + 1) % cfg.log_every == 0:
                dt = time.perf_counter() - t0
                means = meter.means()
                print(f"    epoch {epoch} step {(step + 1) * K}/"
                      f"{len(loader)} loss {means['loss']:.4f} "
                      f"({images / dt:.1f} img/s)")
                check_span(means)
        jax.block_until_ready(self.state.params if training else meter.sums)
        means = meter.means()
        means["img_per_sec"] = images / max(time.perf_counter() - t0, 1e-9)
        if training:
            check_span(means)
        return means

    def train(self):
        """Full run: epochs x (train pass + valid pass) + checkpoints
        (reference: model_train.py:54-88). SIGTERM/SIGINT (preemption)
        triggers a checkpoint at the end of the current epoch."""
        import signal

        cfg = self.cfg
        stop = {"now": False}

        def _handler(signum, frame):
            print(f">>> signal {signum}: will checkpoint and stop "
                  f"after this epoch")
            stop["now"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _handler)
            except ValueError:  # non-main thread
                pass
        print(f">>> devices: {self.mesh.devices.size} "
              f"(mesh {dict(self.mesh.shape)})")
        print(f">>> train iters/epoch {len(self.train_loader)}, "
              f"valid iters/epoch {len(self.valid_loader)}")

        profiling = bool(cfg.profile_dir)
        for epoch in range(self.start_epoch, cfg.epoch):
            if profiling and epoch == self.start_epoch:
                jax.profiler.start_trace(cfg.profile_dir)
            train_log = self._epoch(epoch, training=True)
            # which sampler THIS epoch ran on (recorded in metrics.jsonl),
            # then the epoch-boundary divergence remediation
            sampler_used = None
            if "warp_span" in train_log:
                sampler_used = "packed" if self._warp_swapped else "pallas"
                self._maybe_swap_sampler(train_log)
            valid_log = self._epoch(epoch, training=False)
            if profiling and epoch == self.start_epoch:
                jax.profiler.stop_trace()

            for split, log in (("train", train_log), ("valid", valid_log)):
                for key in LOG_METRICS:
                    self.history[split][key].append(log.get(key, float("nan")))
            self._print(epoch, train_log, valid_log)

            eigen_log = None
            if cfg.eigen_every and (epoch + 1) % cfg.eigen_every == 0:
                # Telemetry only (feeds metrics.jsonl) — a failure here
                # (e.g. a missing velodyne file for a TEST-split scene on a
                # partial KITTI download) must not abort training before the
                # epoch's checkpoint save below.
                try:
                    eigen_log = self.eigen_eval()
                except Exception as exc:  # noqa: BLE001
                    print(f">>> eigen sweep failed (training continues): "
                          f"{type(exc).__name__}: {exc}")
                if eigen_log:
                    from monodepth_tpu.evaluation.eigen import print_table

                    print_table(f"eigen test sweep (epoch {epoch + 1})",
                                eigen_log)
            self._append_jsonl(epoch, train_log, valid_log, eigen_log,
                               warp_sampler=sampler_used)

            if (epoch + 1) % max(cfg.ckpt_every, 1) == 0 \
                    or epoch == cfg.epoch - 1 or stop["now"]:
                self.checkpointer.save(epoch, self.state)
                self.checkpointer.export_modules(epoch, self.state)
            if stop["now"]:
                print(f">>> stopped after epoch {epoch + 1}; resume with "
                      f"--resume true")
                break
        for sig, handler in old_handlers.items():
            signal.signal(sig, handler)
        self.checkpointer.wait()  # commit any in-flight async save
        self._save_curves()
        self.train_loader.close()
        self.valid_loader.close()
        return self.state

    # ------------------------------------------------------------------
    def _print(self, epoch: int, train_log, valid_log):
        header = " | ".join(f"{k:>8}" for k in LOG_METRICS)
        row = lambda log: " | ".join(f"{log.get(k, float('nan')):8.4f}"  # noqa: E731
                                     for k in LOG_METRICS)
        print(f">>> epoch {epoch + 1}/{self.cfg.epoch} "
              f"[{train_log.get('img_per_sec', 0):.1f} img/s train]")
        print(f"    {'':>6} {header}")
        print(f"    {'train':>6} {row(train_log)}")
        print(f"    {'valid':>6} {row(valid_log)}")

    def _append_jsonl(self, epoch: int, train_log, valid_log,
                      eigen_log=None, warp_sampler: str | None = None):
        """Machine-readable per-epoch record (metrics.jsonl) alongside the
        console table and .npy curves."""
        import json
        import math

        def clean(log):  # NaN is not valid strict JSON
            return {k: (None if math.isnan(float(v)) else float(v))
                    for k, v in log.items()}

        from monodepth_tpu.training.state import step_decay_schedule

        # the exact schedule the optimizer applies (one source of truth):
        # steps_per_epoch=1 + step=epoch evaluates StepLR at this epoch
        lr = step_decay_schedule(self.cfg.learning_rate,
                                 self.cfg.scheduler_step, 1)(epoch)
        record = {"epoch": epoch, "time": time.time(), "lr": float(lr),
                  "train": clean(train_log), "valid": clean(valid_log)}
        if warp_sampler is not None:
            # the sampler the epoch's train pass ran on ("pallas" or
            # "packed") — an auto-swap shows up as this field changing
            record["warp_sampler"] = warp_sampler
        if eigen_log:
            record["eigen"] = clean(eigen_log)
        os.makedirs(self.save_dir, exist_ok=True)
        with open(os.path.join(self.save_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")

    def _save_curves(self):
        loss_dir = os.path.join(self.save_dir, "loss")
        os.makedirs(loss_dir, exist_ok=True)
        for split, curves in self.history.items():
            for key, values in curves.items():
                if values:  # never clobber existing curves with nothing
                    np.save(os.path.join(loss_dir, f"{split}_{key}.npy"),
                            np.asarray(values, dtype=np.float64))

    def _load_curves(self):
        loss_dir = os.path.join(self.save_dir, "loss")
        for split, curves in self.history.items():
            for key in curves:
                path = os.path.join(loss_dir, f"{split}_{key}.npy")
                if os.path.exists(path):
                    curves[key] = list(np.load(path)[: self.start_epoch])
