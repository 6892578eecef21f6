"""The jitted training / eval step: decode -> forward -> warp -> loss -> update.

One `jax.jit` region per step (vs the reference's eager per-batch Python,
model_tool/processor.py:16-218 + model_train.py:64-71): XLA fuses the
device-side augmentation, the multi-scale warp and the loss assembly into
the conv graph; with `--donate` the optimizer update runs in place on
donated buffers.

Semantics mirrored from the reference compute graph:
- depth/pose nets consume `color_aug`; warping samples the *unaugmented*
  full-res source, and the loss target is unaugmented scale-0 color
  (processor.py:36-39, 125, 160-162, 172-181).
- disparity at every scale is bilinearly upsampled (align_corners=False)
  to full resolution before depth conversion + warping, with scale-0
  intrinsics (processor.py:141-144, 159-160).
- `posecnn` scales its translation by the mean inverse depth of the
  current scale at warp time (processor.py:152-157).
- stereo frames use the dataset-provided fixed-baseline transform
  (processor.py:147-149).

Under a `jax.sharding.Mesh`, the same jitted functions run data-parallel:
batches arrive sharded over the "data" axis (see parallel/), sharding
propagation makes every per-batch reduction (loss mean, gradients,
batch-norm statistics) a global reduction, and XLA inserts the psums over
ICI. Batch-norm therefore behaves as sync-BN over the global batch.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from monodepth_tpu.config import Config
from monodepth_tpu.data.augment import decode_frames
from monodepth_tpu.losses.metrics import training_depth_metric
from monodepth_tpu.losses.reprojection import monodepth_loss
from monodepth_tpu.models.monodepth import Monodepth
from monodepth_tpu.ops.geometry import (
    disparity_to_depth,
    transform_from_parameters,
    warp_grid,
)
from monodepth_tpu.ops.sampling import grid_sample, pyramid, resize_bilinear
from monodepth_tpu.training.state import TrainState

Array = jax.Array


def _shard_map(fn, mesh, in_specs, out_specs):
    """jax.shard_map across the API transition (check_vma replaced
    check_rep; older jax keeps it under jax.experimental.shard_map)."""
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map

        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def _spatial_pallas_sampler(cfg: Config, mesh, interpret: bool):
    """The Pallas warp under spatial (H) sharding: halo exchange instead
    of the all-gather GSPMD would need.

    Each shard owns H/n_spatial rows; a warp's tap rows stay within a few
    px of the output row in trained regimes (the dy-span argument,
    ops/pallas/warp_sample.py), so exchanging `spatial_halo` edge rows
    with the two neighbors (one ppermute each way over ICI) gives every
    shard a local slab that contains all its taps, and the candidate
    kernel runs on the slab with globally-correct coordinates
    (`warp_sample_shifted`). A per-spatial-group `lax.cond` (predicate
    pmin-agreed so the group branches together) falls back to the exact
    all-gather + packed-gather path when any tap escapes the halo
    (diverged fields) — sharded-regime cost stays O(halo) per shard
    instead of O(H), exactness is unconditional.
    Reference hot op: F.grid_sample (model_layer/warp.py:12-14)."""
    from jax.sharding import PartitionSpec as P

    from monodepth_tpu.ops.pallas import warp_sample as _ws

    n = mesh.shape["spatial"]
    H, W = cfg.height, cfg.width
    Hl = H // n
    halo = min(cfg.spatial_halo, Hl)

    def local_warp(img, grd):
        # img: this shard's rows [b, Hl, W, C]; grd: this shard's output
        # rows with GLOBAL [-1,1] coordinates. Sources carry no parameter
        # gradient (warp_sample contract), so the halo exchange needs no
        # backward collective.
        img = jax.lax.stop_gradient(img)
        s = jax.lax.axis_index("spatial")
        from_prev = jax.lax.ppermute(
            img[:, Hl - halo:], "spatial",
            [(i, i + 1) for i in range(n - 1)])  # zeros on shard 0
        from_next = jax.lax.ppermute(
            img[:, :halo], "spatial",
            [(i, i - 1) for i in range(1, n)])   # zeros on shard n-1
        ext = jnp.concatenate([from_prev, img, from_next], axis=1)
        row0 = (s * Hl - halo).astype(jnp.float32)

        # every tap row (anchor and anchor+1) inside the slab? The global
        # border clamp means edge shards never trip this at the borders.
        y = jnp.clip((grd[..., 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
        y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
        rel = y0 - (s * Hl - halo)
        ok = jnp.all((rel >= 0) & (rel + 1 <= Hl + 2 * halo - 1))
        ok = jax.lax.pmin(ok.astype(jnp.int32), "spatial") > 0

        def fast(img_, ext_, grd_):
            del img_
            return _ws.warp_sample_shifted(ext_, grd_, row0, H, interpret)

        def exact(img_, ext_, grd_):
            del ext_
            full = jax.lax.all_gather(img_, "spatial", axis=1, tiled=True)
            return grid_sample(full, grd_)

        return jax.lax.cond(ok, fast, exact, img, ext, grd)

    spec = P("data", "spatial")
    return _shard_map(local_warp, mesh, (spec, spec), spec)


def _make_sampler(cfg: Config, mesh):
    """The warp sampler for this config/mesh (the step's hot op —
    measurements in tools/bench_gather.py and docs/PERF.md):

    - Pallas candidate-select kernel when available: 2.8-6.0 ms/warp
      fwd+dgrid at 640x192 b12 in training's displacement regimes (v4)
      vs ~44 ms for the best XLA gather; exact parity incl. dgrid. Sources
      carry no parameter gradient, so its zero image-cotangent is exact
      here (warp_sample docstring). Under a multi-device mesh the kernel
      is shard_mapped over the "data" axis — GSPMD has no partitioning
      rule for pallas_call and would otherwise ALL-GATHER the inputs and
      run it fully replicated on every chip (verified in compiled HLO).
      Under spatial (H) sharding it runs on halo-extended local slabs
      (`_spatial_pallas_sampler`).
    - jnp "packed" gather otherwise (CPU, or kernel-unsupported shapes):
      fastest exact XLA form at every resolution; GSPMD partitions its
      batching-dim gathers natively.
    """
    from monodepth_tpu.ops.pallas import warp_sample as _ws

    on_tpu = jax.default_backend() == "tpu"
    spatial = mesh.shape.get("spatial", 1) if mesh is not None else 1
    if (cfg.use_pallas and spatial > 1 and cfg.height % spatial == 0
            and _ws.supported(cfg.height // spatial, cfg.width)
            and (on_tpu or cfg.pallas_interpret)):
        sampler = _spatial_pallas_sampler(cfg, mesh, interpret=not on_tpu)
        return (jax.checkpoint(sampler) if cfg.remat else sampler), True
    if (cfg.use_pallas and _ws.supported(cfg.height, cfg.width)
            and spatial == 1
            and (on_tpu or cfg.pallas_interpret)):
        # --warp_guard routes degenerate fields (mean per-slab dy span
        # > ~40 px — a diverged net) through the flat-cost packed gather
        # via lax.cond; measured at 119.1 -> 91.1 img/s steady-state
        # (the cond is a per-warp fusion barrier), so the default is the
        # bare kernel + the warp_span telemetry metric (apply_and_warp).
        fn = (_ws.warp_sample_guarded if cfg.warp_guard
              else _ws.warp_sample)

        def base_sample(img, grd, _interp=not on_tpu, _fn=fn):
            return _fn(img, grd, _interp)

        if mesh is not None and mesh.shape.get("data", 1) > 1:
            from jax.sharding import PartitionSpec as P

            spec = P("data")
            base_sample = _shard_map(base_sample, mesh, (spec, spec), spec)
        sampler = base_sample
        pallas = True
    else:
        sampler = grid_sample
        pallas = False
    return (jax.checkpoint(sampler) if cfg.remat else sampler), pallas


def apply_and_warp(model: Monodepth, variables, batch: Dict[str, Array],
                   cfg: Config, *, train: bool, mesh=None) -> Dict[str, Any]:
    """Forward the model and synthesize every (scale, source) warp.

    Returns disps / warped / sources / target_pyr / depth0 (full-res
    scale-0 depth for metrics) / batch_stats — everything float32 even
    when the net computes in bf16 (the loss stack is parity-critical).
    """
    color, color_aug = decode_frames(batch["frames"], batch["jitter"])

    if train:
        (disps, poses), mutated = model.apply(
            variables, color_aug, train=True, mutable=["batch_stats"])
        new_batch_stats = mutated["batch_stats"]
    else:
        disps, poses = model.apply(variables, color_aug, train=False)
        new_batch_stats = variables.get("batch_stats", {})

    # the loss stack is parity-critical: at least f32 even when the net
    # computes in bf16; follows wider inputs (f64 lockstep parity tests)
    f32 = jnp.promote_types(jnp.float32, color.dtype)
    H, W = cfg.height, cfg.width
    source_ids = list(cfg.source_frame_ids)

    target = color[:, 0].astype(f32)
    sources = [color[:, cfg.frame_ids.index(fid)].astype(f32)
               for fid in source_ids]
    K = batch["K"].astype(f32)
    inv_K = batch["inv_K"].astype(f32)
    disps = {s: d.astype(f32) for s, d in disps.items()}
    poses = {fid: (aa.astype(f32), t.astype(f32))
             for fid, (aa, t) in poses.items()}

    # Pairwise transforms are depth-independent for shared/separate — one
    # 4x4 per source frame, hoisted out of the scale loop.
    transforms: Dict[Any, Array] = {}
    if cfg.pose_type in ("shared", "separate"):
        for fid in source_ids:
            if fid != "s":
                aa, t = poses[fid]
                transforms[fid] = transform_from_parameters(
                    aa, t, invert=model.invert_for_frame(fid))

    sample, pallas_active = _make_sampler(cfg, mesh)

    warped: Dict[int, list] = {}
    depth0 = None
    warp_span = None
    for scale in cfg.scales:
        disp_full = resize_bilinear(disps[scale], H, W, align_corners=False)
        _, depth = disparity_to_depth(disp_full, cfg.min_depth, cfg.max_depth)
        if scale == 0:
            depth0 = depth

        warps = []
        for fid, src in zip(source_ids, sources):
            if fid == "s":
                T = batch["stereo_T"].astype(f32)
            elif cfg.pose_type == "posecnn":
                aa, t = poses[fid]
                mean_inv_depth = (1.0 / depth).mean(axis=(1, 2, 3))
                T = transform_from_parameters(
                    aa, t * mean_inv_depth[:, None],
                    invert=model.invert_for_frame(fid))
            else:
                T = transforms[fid]
            grid = warp_grid(depth, inv_K, K, T)
            if (pallas_active or cfg.warp_telemetry) and scale == 0:
                # telemetry: the candidate kernel's cost is linear in
                # this span (warp_sample.dy_span); scale-0 grids are
                # representative of all scales (full-res warp). Logged
                # per step, warned on in the loop — a diverged run shows
                # up in metrics.jsonl instead of silently slowing 10x.
                # cfg.warp_telemetry keeps the metric alive on the packed
                # sampler so the auto-swap can observe span RECOVERY
                # (loop.py _maybe_swap_sampler).
                from monodepth_tpu.ops.pallas.warp_sample import dy_span

                s = dy_span(grid)
                warp_span = s if warp_span is None \
                    else jnp.maximum(warp_span, s)
            warps.append(sample(src, grid))
        warped[scale] = warps

    return {
        "disps": disps,
        "warped": warped,
        "sources": sources,
        "target_pyr": pyramid(target, max(cfg.scales) + 1),
        "depth0": depth0,
        "batch_stats": new_batch_stats,
        "warp_span": warp_span,
    }


def _loss_from_outputs(out, rng, cfg: Config, train: bool):
    del train  # train/eval share the loss graph (reference does too)
    return monodepth_loss(
        out["disps"], out["warped"], out["sources"], out["target_pyr"], rng,
        scales=cfg.scales, disp_smoothness=cfg.disp_smoothness,
        use_automasking=cfg.use_automasking)


def _metrics(loss, out, batch, with_gt: bool = True):
    """with_gt=False (``--train_gt_metrics false``) skips the reference's
    per-step GT depth metric — its batch-median needs a sort over
    B x 375 x 1242 elements (losses/metrics.py), pure overhead in the
    train step once nothing else dominates. Validation always reports the
    full table (the reference's console log, model_tool/logger.py:27)."""
    metrics = {"loss": loss}
    if out.get("warp_span") is not None:
        metrics["warp_span"] = out["warp_span"]
    if with_gt and "depth_gt" in batch:
        metrics.update(training_depth_metric(out["depth0"], batch["depth_gt"]))
    return metrics


def _train_step_body(model: Monodepth, tx: optax.GradientTransformation,
                     cfg: Config, mesh=None):
    def train_step(state: TrainState, batch: Dict[str, Array]):
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out = apply_and_warp(model, variables, batch, cfg, train=True,
                                 mesh=mesh)
            loss, aux = _loss_from_outputs(out, rng, cfg, train=True)
            return loss, (aux, out)

        (loss, (aux, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               batch_stats=out["batch_stats"],
                               opt_state=opt_state, rng=state.rng)
        return new_state, _metrics(loss, out, batch,
                                   with_gt=cfg.train_gt_metrics)

    return train_step


def make_train_step(model: Monodepth, tx: optax.GradientTransformation,
                    cfg: Config, donate: bool = False, mesh=None):
    """Build the jitted train step: (TrainState, batch) -> (TrainState,
    metrics). donate=True updates parameters and optimizer state in place
    in HBM (halves their peak memory, costs ~0.8 ms/call of host-side
    bookkeeping); leave False when memory is plentiful or the caller must
    keep the pre-step state alive. Pass the device mesh when running
    multi-device so the Pallas warp kernel shard_maps over the data axis
    (see _make_sampler)."""
    return jax.jit(_train_step_body(model, tx, cfg, mesh),
                   donate_argnums=(0,) if donate else ())


def make_train_multi_step(model: Monodepth, tx: optax.GradientTransformation,
                          cfg: Config, donate: bool = False, mesh=None):
    """K training steps per dispatch via `lax.scan` over stacked batches.

    (TrainState, batches [K, B, ...]) -> (TrainState, metrics of [K]).
    One jit call runs K optimizer steps back-to-back on device, amortizing
    the per-call host dispatch (~2.8 ms on a slow host — more than the
    2.4 ms device step at 640x192 b12). This is the throughput path when
    the input pipeline can stay ahead (`--steps_per_call`)."""
    body = _train_step_body(model, tx, cfg, mesh)

    def multi_step(state: TrainState, batches: Dict[str, Array]):
        return jax.lax.scan(body, state, batches)

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: Monodepth, cfg: Config, mesh=None):
    """Validation step: full forward + loss + metrics, no mutation
    (reference: model_train.py:75-79 `no_grad` valid loop).

    `index` is the batch number within the pass: state.step and state.rng
    are constant during validation, so without it every batch would see
    the SAME automask tie-break noise field (the reference draws fresh
    torch.randn per batch, processor.py:195). Pass a uint32 array, not a
    python int — an int retraces per value."""

    def eval_step(state: TrainState, batch: Dict[str, Array],
                  index: Array = jnp.uint32(0)):
        rng = jax.random.fold_in(
            jax.random.fold_in(state.rng, state.step), index)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        out = apply_and_warp(model, variables, batch, cfg, train=False,
                             mesh=mesh)
        loss, aux = _loss_from_outputs(out, rng, cfg, train=False)
        return _metrics(loss, out, batch)

    return jax.jit(eval_step)


def make_infer_step(model: Monodepth, cfg: Config):
    """Depth-only batched inference -> scaled disparity [B, H, W]
    (reference eval forward, model_test.py:80-83: eval converts with
    min_depth=1e-3 / max_depth=80 regardless of the training range)."""

    def infer(state: TrainState, images: Array):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        disps = model.apply(variables, images, train=False,
                            method=model.depth)
        scaled_disp, _ = disparity_to_depth(
            disps[0].astype(jnp.float32), 1e-3, 80.0)
        return scaled_disp[..., 0]

    return jax.jit(infer)
