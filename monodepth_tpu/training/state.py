"""Train state + optimizer: optax Adam with the reference's StepLR decay.

The reference trains with `Adam(lr=1e-4)` + `StepLR(step_size=15, gamma=0.1)`
stepped once per epoch (reference: model_tool/loader.py:106-108,
model_train.py:81). Here the schedule is a pure function of the global
step (`steps_per_epoch` folds the epoch boundary in), so the whole update
lives inside one jitted step with no host-side scheduler object.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from monodepth_tpu.config import Config
from monodepth_tpu.models.monodepth import Monodepth


@flax.struct.dataclass
class TrainState:
    """Replicated training state — a pure pytree (the optimizer transform
    and model stay static at trace time)."""

    step: jax.Array          # int32 global step
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array           # folded per-step for loss tie-break noise


def step_decay_schedule(base_lr: float, scheduler_step: int,
                        steps_per_epoch: int, gamma: float = 0.1):
    """lr(step) = base * gamma^floor(epoch / scheduler_step) — StepLR."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * gamma ** (epoch // scheduler_step)

    return schedule


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam(b1=0.9, b2=0.999, eps=1e-8) — torch defaults the reference
    relies on — under the StepLR schedule."""
    schedule = step_decay_schedule(cfg.learning_rate, cfg.scheduler_step,
                                   steps_per_epoch)
    return optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)


def build_model(cfg: Config) -> Monodepth:
    dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
    return Monodepth(
        num_layers=cfg.num_layers,
        scales=cfg.scales,
        frame_ids=cfg.frame_ids,
        pose_type=cfg.pose_type,
        pose_frames=cfg.pose_frames,
        dtype=dtype,
        remat=cfg.remat,
        nchw_decoder=cfg.nchw_decoder,
    )


def create_state(cfg: Config, model: Monodepth,
                 tx: optax.GradientTransformation,
                 pretrained: dict | None = None) -> TrainState:
    """Initialize parameters (optionally splicing in converted ImageNet
    weights, mirroring the reference's `--weight_init` pretrained encoder
    init; reference: model_layer/depth_encoder.py:57-60)."""
    rng = jax.random.PRNGKey(cfg.seed)
    init_rng, state_rng = jax.random.split(rng)
    F = len(cfg.frame_ids)
    dummy = jnp.zeros((1, F, cfg.height, cfg.width, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, dummy, train=False))(init_rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if pretrained:
        params, batch_stats = _splice_pretrained(params, batch_stats,
                                                 pretrained)

    opt_state = tx.init(params)
    return TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state,
                      rng=state_rng)


def _splice_pretrained(params, batch_stats, pretrained):
    """Overwrite encoder subtrees with imported weights.

    `pretrained` maps top-level module names ("encoder", "pose_encoder")
    to {"params": ..., "batch_stats": ...} trees produced by
    utils/torch_import.py.
    """
    params = dict(params)
    batch_stats = dict(batch_stats)
    for name, tree in pretrained.items():
        if name in params:
            params[name] = tree["params"]
            if "batch_stats" in tree and name in batch_stats:
                batch_stats[name] = tree["batch_stats"]
    return flax.core.freeze(params).unfreeze(), \
        flax.core.freeze(batch_stats).unfreeze()
