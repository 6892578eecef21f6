"""Typed configuration + CLI mirroring the reference flag surface.

The reference exposes ~18 argparse flags (reference: model_option.py:5-89).
We keep the exact flag names and defaults, fix its declared-type bugs
(``--learning_rate`` was `type=str`, ``--scales``/``--frame_ids``/
``--pose_frames`` unparseable from the CLI; model_option.py:36-38, 56-58,
67-72), and add TPU-native extras (precision, mesh, checkpoint/resume,
profiling) under new flags so the reference CLI remains a strict subset.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Sequence, Tuple, Union

FrameId = Union[int, str]  # ints for temporal frames, "s" for the stereo frame


@dataclasses.dataclass(frozen=True)
class Config:
    # --- paths / dataset (reference: model_option.py:7-20) ---
    datapath: str = "./dataset/kitti"
    splits: str = "./splits"
    dataset: str = "kitti_mono"          # kitti_mono | kitti_stereo
    datatype: str = "kitti_eigen_zhou"   # kitti_benchmark | kitti_eigen_full | kitti_eigen_zhou

    # --- schedule (reference: model_option.py:23-47) ---
    epoch: int = 24
    batch: int = 12                      # GLOBAL batch (divided over the data mesh axis)
    prefetch: int = 2
    num_workers: int = 12
    learning_rate: float = 1e-4
    scheduler_step: int = 15
    disp_smoothness: float = 1e-3
    save: str = "test"

    # --- geometry (reference: model_option.py:50-72) ---
    height: int = 192
    width: int = 640
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    min_depth: float = 0.1
    max_depth: float = 100.0
    frame_ids: Tuple[FrameId, ...] = (0, -1, 1)
    pose_frames: Union[int, str] = 2     # 2 | "all"

    # --- model (reference: model_option.py:73-87) ---
    num_layers: int = 18                 # 18 | 34 | 50 | 101 | 152
    weight_init: bool = True             # ImageNet init (needs a converted checkpoint, see utils/torch_import.py)
    pose_type: str = "separate"          # posecnn | shared | separate
    use_automasking: bool = True

    # --- TPU-native extras (no reference counterpart) ---
    pretrained_dir: str = "./pretrained"  # dir with converted ImageNet npz checkpoints
    precision: str = "bf16"              # bf16 | f32 compute dtype (params always f32)
    data_parallel: int = 0               # 0 = use all local devices
    seed: int = 42
    log_every: int = 50                  # steps between host-side metric fetches
    ckpt_every: int = 2                  # epochs between checkpoints (reference saved every 2)
    ckpt_keep: int = 3                   # keep-last-N full states + exports (0 = keep all,
                                         # the reference's unbounded layout)
    async_ckpt: bool = False             # overlap checkpoint serialization/IO with
                                         # training (ocp.AsyncCheckpointer); at most
                                         # one save in flight (checkpoint.py)
    resume: bool = False
    profile_dir: str = ""                # non-empty -> jax.profiler traces
    save_root: str = "./model_save"
    use_pallas: bool = True              # use Pallas kernels where available
    nchw_decoder: bool = True            # train-time NCHW shift-einsum decoder low
                                         # stages (the round-3 layout win, models/
                                         # depth_decoder.py docstring). False = plain
                                         # NHWC everywhere — the operational fallback
                                         # if a new jax/XLA release mislowers the
                                         # einsum form (same params either way)
    warp_guard: bool = False             # lax.cond each warp to the flat-cost packed
                                         # gather when the field is degenerate (mean
                                         # per-slab dy span > ~40 px). Costs ~23%
                                         # steady-state throughput (119 -> 91 img/s
                                         # measured — the cond is a fusion barrier),
                                         # so default off: the warp_span telemetry
                                         # metric + loop warning covers divergence
                                         # detection for attended runs
    warp_auto_swap: bool = True          # epoch-boundary divergence remediation: when
                                         # a training epoch's MEAN warp_span exceeds
                                         # GUARD_SPAN (the regime where the Pallas
                                         # kernel is slower than the flat-cost packed
                                         # gather), rebuild the train step on the
                                         # packed sampler for the next epoch and swap
                                         # back once the span recovers. Zero
                                         # steady-state cost (unlike --warp_guard's
                                         # per-warp cond, ~23%); one recompile per
                                         # swap direction per run (both steps stay
                                         # cached). training/loop.py
                                         # _maybe_swap_sampler
    warp_telemetry: bool = False         # INTERNAL (no CLI flag): force the warp_span
                                         # telemetry metric even on the packed-gather
                                         # sampler — set by the auto-swap's fallback
                                         # step so span recovery stays observable
    pallas_interpret: bool = False       # run Pallas kernels in interpret mode off-TPU
                                         # (CPU-mesh dryruns/tests exercise the kernel
                                         # code path; never set on real hardware)
    train_gt_metrics: bool = False       # True: compute the reference's per-step GT
                                         # depth metric inside the train step, exactly
                                         # as it did (model_tool/logger.py:30-35) — a
                                         # 5.6M-element median sort costing 27 ms/step
                                         # (measured, tools/bench_step.py). Default
                                         # False: train logs loss only; the valid pass
                                         # reports the full 8-metric table each epoch.
                                         # The reference paid this only because it
                                         # synced host<->device per iteration anyway.
    remat: bool = False                  # rematerialize encoder blocks (high-res memory)
    donate: bool = False                 # donate state buffers: halves peak param/opt
                                         # memory, measured time-neutral on v5e —
                                         # pair with remat for memory-tight configs
    steps_per_call: int = 1              # train steps per dispatch (lax.scan over K
                                         # stacked batches; amortizes host dispatch
                                         # when the input pipeline can stay ahead)
    cache_frames: bool = False           # cache decoded+resized frames on disk under
                                         # save_root (epoch >= 2 skips JPEG decode;
                                         # ~15 GB for the eigen_zhou train set)
    spatial_halo: int = 64               # halo rows exchanged per side for the Pallas
                                         # warp under spatial (H) sharding — the warp
                                         # kernel stays exact while every tap row lands
                                         # within +-halo of the shard (trained fields
                                         # are a few px; a lax.cond falls back to the
                                         # exact all-gather+gather path beyond it).
                                         # Clamped to the shard height.
    eigen_every: int = 0                 # > 0: run the FULL Eigen test sweep
                                         # (evaluation/eigen.py, the reference's
                                         # model_test.py protocol) every N epochs,
                                         # mesh-sharded over the data axis; metrics
                                         # land in metrics.jsonl under "eigen".
                                         # 0 = off (the reference only evals post-hoc)
    # NOTE on batch norm under data parallelism: BN statistics are always
    # computed over the GLOBAL batch (sync-BN) — with jit + sharded
    # batches every batch-axis mean is a global reduction. This matches
    # the reference exactly: it normalizes over its full batch of 12 on
    # one GPU (SURVEY.md §7.3 hard part 5), and our global batch equals
    # the reference batch regardless of how many chips shard it.

    @property
    def num_pose_frames(self) -> int:
        # reference: model_tool/loader.py:20-23
        if self.pose_frames == "all":
            return len([f for f in self.frame_ids if f != "s"])
        return 2

    @property
    def temporal_frame_ids(self) -> Tuple[int, ...]:
        return tuple(f for f in self.frame_ids if f != "s")

    @property
    def source_frame_ids(self) -> Tuple[FrameId, ...]:
        return tuple(self.frame_ids[1:])

    @property
    def num_scales(self) -> int:
        return len(self.scales)

    def validate(self) -> "Config":
        cfg = self
        if cfg.dataset == "kitti_stereo" and "s" not in cfg.frame_ids:
            # the reference wires the stereo frame automatically when the
            # stereo dataset is selected (model_tool/loader.py:55-58,
            # kitti_stereo.py:272-297) — the README stereo command must
            # work verbatim without an explicit --frame_ids
            cfg = dataclasses.replace(cfg, frame_ids=cfg.frame_ids + ("s",))
        if cfg.height % 32 or cfg.width % 32:
            raise ValueError("height/width must be multiples of 32 (reference: kitti_mono.py:264)")
        if cfg.frame_ids[0] != 0:
            raise ValueError("frame_ids must start with the key frame 0")
        if 0 not in cfg.scales:
            # the metric/eval path consumes the full-res disparity
            # ("depth0"); without scale 0 it would crash a full epoch in
            # (training/step.py _metrics) instead of failing here
            raise ValueError("scales must include 0 (the full-res output "
                             "every eval/metric path consumes)")
        if cfg.pose_type not in ("posecnn", "shared", "separate"):
            raise ValueError(f"unknown pose_type {cfg.pose_type!r}")
        if cfg.dataset not in ("kitti_mono", "kitti_stereo"):
            raise ValueError(f"unknown dataset {cfg.dataset!r}")
        if cfg.steps_per_call < 1:
            raise ValueError("steps_per_call must be >= 1")
        if cfg.data_parallel < 0:
            raise ValueError("data_parallel must be >= 0 (0 = all devices)")
        if cfg.precision not in ("bf16", "f32"):
            raise ValueError(f"unknown precision {cfg.precision!r}")
        return cfg


def _parse_frame_ids(text: str) -> Tuple[FrameId, ...]:
    out = []
    for token in text.replace(",", " ").split():
        out.append(token if token == "s" else int(token))
    return tuple(out)


def _parse_scales(text: str) -> Tuple[int, ...]:
    return tuple(int(t) for t in text.replace(",", " ").split())


def _parse_bool(text: str) -> bool:
    return str(text).lower() in ("1", "true", "yes", "y")


def _parse_pose_frames(text: str) -> Union[int, str]:
    return "all" if text == "all" else int(text)


def options(argv: Sequence[str] | None = None) -> Config:
    """argparse front-end; every reference flag keeps its name and default."""
    d = Config()
    p = argparse.ArgumentParser(description="monodepth_tpu training options")
    p.add_argument("--datapath", default=d.datapath, type=str)
    p.add_argument("--splits", default=d.splits, type=str)
    p.add_argument("--dataset", default=d.dataset, type=str,
                   choices=["kitti_mono", "kitti_stereo"])
    p.add_argument("--datatype", default=d.datatype, type=str,
                   choices=["kitti_benchmark", "kitti_eigen_full", "kitti_eigen_zhou"])
    p.add_argument("--epoch", default=d.epoch, type=int)
    p.add_argument("--batch", default=d.batch, type=int)
    p.add_argument("--prepetch", "--prefetch", dest="prefetch", default=d.prefetch, type=int)
    p.add_argument("--num_workers", default=d.num_workers, type=int)
    p.add_argument("--learning_rate", default=d.learning_rate, type=float)
    p.add_argument("--scheduler_step", default=d.scheduler_step, type=int)
    p.add_argument("--disp_smoothness", default=d.disp_smoothness, type=float)
    p.add_argument("--save", default=d.save, type=str)
    p.add_argument("--height", default=d.height, type=int)
    p.add_argument("--width", default=d.width, type=int)
    p.add_argument("--scales", default=d.scales, type=_parse_scales)
    p.add_argument("--min_depth", default=d.min_depth, type=float)
    p.add_argument("--max_depth", default=d.max_depth, type=float)
    p.add_argument("--frame_ids", default=d.frame_ids, type=_parse_frame_ids)
    p.add_argument("--pose_frames", default=d.pose_frames, type=_parse_pose_frames)
    p.add_argument("--num_layers", default=d.num_layers, type=int,
                   choices=[18, 34, 50, 101, 152])
    p.add_argument("--weight_init", default=d.weight_init, type=_parse_bool)
    p.add_argument("--pose_type", default=d.pose_type, type=str,
                   choices=["posecnn", "shared", "separate"])
    p.add_argument("--use_automasking", default=d.use_automasking, type=_parse_bool)
    # TPU extras
    p.add_argument("--pretrained_dir", default=d.pretrained_dir, type=str)
    p.add_argument("--precision", default=d.precision, type=str, choices=["bf16", "f32"])
    p.add_argument("--data_parallel", default=d.data_parallel, type=int)
    p.add_argument("--seed", default=d.seed, type=int)
    p.add_argument("--log_every", default=d.log_every, type=int)
    p.add_argument("--ckpt_every", default=d.ckpt_every, type=int)
    p.add_argument("--ckpt_keep", default=d.ckpt_keep, type=int)
    p.add_argument("--async_ckpt", default=d.async_ckpt, type=_parse_bool)
    p.add_argument("--resume", default=d.resume, type=_parse_bool)
    p.add_argument("--profile_dir", default=d.profile_dir, type=str)
    p.add_argument("--save_root", default=d.save_root, type=str)
    p.add_argument("--use_pallas", default=d.use_pallas, type=_parse_bool)
    p.add_argument("--nchw_decoder", default=d.nchw_decoder, type=_parse_bool)
    p.add_argument("--warp_guard", default=d.warp_guard, type=_parse_bool)
    p.add_argument("--warp_auto_swap", default=d.warp_auto_swap,
                   type=_parse_bool)
    p.add_argument("--pallas_interpret", default=d.pallas_interpret, type=_parse_bool)
    p.add_argument("--train_gt_metrics", default=d.train_gt_metrics, type=_parse_bool)
    p.add_argument("--remat", default=d.remat, type=_parse_bool)
    p.add_argument("--donate", default=d.donate, type=_parse_bool)
    p.add_argument("--steps_per_call", default=d.steps_per_call, type=int)
    p.add_argument("--cache_frames", default=d.cache_frames, type=_parse_bool)
    p.add_argument("--spatial_halo", default=d.spatial_halo, type=int)
    p.add_argument("--eigen_every", default=d.eigen_every, type=int)
    args = p.parse_args(argv)
    # fields without a CLI flag (internal, e.g. warp_telemetry) keep
    # their dataclass defaults
    return Config(**{f.name: getattr(args, f.name)
                     for f in dataclasses.fields(Config)
                     if hasattr(args, f.name)}).validate()
