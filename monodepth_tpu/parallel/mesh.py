"""Device mesh + sharding layout for scaling over ICI.

The reference is strictly single-device (`'cuda:0'`, model_train.py:28 —
no torch.distributed anywhere; SURVEY.md §2.7). This module is its
TPU-native replacement: a `jax.sharding.Mesh` with two axes,

  "data"    — batch parallelism: the global batch splits across chips;
              loss means, gradients and batch-norm statistics become
              global reductions (XLA inserts psums over ICI).
  "spatial" — optional image-height parallelism for high-res configs
              (BASELINE.json config 5): convolutions over an H-sharded
              tensor compile to halo exchanges between neighbors.

Nothing in the train step mentions the mesh: inputs arrive pre-sharded
(`shard_batch`), state is replicated, and GSPMD propagates the layout
through the whole step — the scaling-book recipe (pick a mesh, annotate
shardings, let XLA place the collectives).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "spatial")

# batch-dict key -> H-axis index for spatial sharding. frames are
# [B, F, H, W, 3]; only the model-resolution images shard spatially
# (depth_gt is 375 px tall — not divisible, and only read by metrics).
_SPATIAL_KEYS = {"frames": 2}


def init_distributed() -> bool:
    """Multi-host bring-up: call `jax.distributed.initialize` when the
    environment indicates a multi-process job (TPU pod slices set
    coordinator variables; explicit JAX_COORDINATOR_ADDRESS also works).
    Single-host runs are a no-op. Returns True if initialized.

    This is the TPU-native stand-in for the communication-backend setup
    the reference never had (SURVEY.md §2.7, §5.8): afterwards
    `jax.devices()` spans the whole slice and the same mesh/sharding
    code scales across hosts with collectives over ICI/DCN.
    """
    import os

    multiproc = any(os.environ.get(k) for k in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS"))
    if not multiproc:
        return False
    jax.distributed.initialize()
    return True


def warm_collectives(mesh: Mesh) -> float:
    """Establish the cross-process communicator contexts with tiny
    collectives BEFORE any expensive compile. Single-process: no-op.

    The first collective an executable runs creates its communicators;
    on the CPU multi-process backend the Gloo address exchange goes
    through the coordinator KV store with a hard ~30 s timeout measured
    from the first rank's arrival. Ranks that compile or execute the
    real train step concurrently on a contended host can skew past that
    window (observed on a 1-CPU host: the 2-process test failed with
    Gloo `GetKeyValue() timed out` inside the first train step; round 5
    hit the same thing again on a spatial mesh's interleaved-order
    full-set context DURING the interpret-mode step's skewed execution).
    Contexts are keyed by participant set, so one warm executable must
    touch every set the train step uses: the per-axis psum subgroups,
    the neighbor-ppermute pairs (the spatial halo exchange), and the
    full-set reduction in THIS mesh's device order. All are trivially
    compiled while ranks are still in lockstep; later executables reuse
    the cached communicators. Returns the global device count as
    computed ON DEVICE, so callers can sanity-assert the slice."""
    if jax.process_count() == 1:
        return float(mesh.devices.size)
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map

    sh = NamedSharding(mesh, P(mesh.axis_names))
    local = np.ones((jax.local_device_count(),), np.float32)
    ga = jax.make_array_from_process_local_data(sh, local)

    def _touch(v):
        keep = v
        for ax in mesh.axis_names:
            if mesh.shape[ax] > 1:
                keep = keep + 0.0 * jax.lax.psum(v, ax)
        n = mesh.shape[mesh.axis_names[-1]]
        if n > 1:  # halo-exchange pairs over the minor (spatial) axis
            perm = [(i, (i + 1) % n) for i in range(n)]
            keep = keep + 0.0 * jax.lax.ppermute(
                v, mesh.axis_names[-1], perm)
        return keep

    def warm(x):
        y = shard_map(_touch, mesh=mesh, in_specs=P(mesh.axis_names),
                      out_specs=P(mesh.axis_names))(x)
        return jnp.sum(y)

    total = jax.jit(warm, out_shardings=NamedSharding(mesh, P()))(ga)
    return float(total)


def make_mesh(data: int = 0, spatial: int = 1, devices=None) -> Mesh:
    """Build a ("data", "spatial") mesh. data=0 means "all remaining
    devices"; adjacent mesh coordinates map to ICI neighbors by using the
    default device order."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == 0:
        if n % spatial:
            raise ValueError(f"{n} devices not divisible by spatial={spatial}")
        data = n // spatial
    if data * spatial > n:
        raise ValueError(f"mesh {data}x{spatial} needs {data * spatial} "
                         f"devices, have {n}")
    grid = devices[: data * spatial].reshape(data, spatial)
    return Mesh(grid, AXES)


def batch_sharding(mesh: Mesh, key: str, ndim: int,
                   stacked: bool = False) -> NamedSharding:
    """Sharding for one batch entry: batch dim over "data"; H over
    "spatial" for image-like tensors. stacked=True for [K, B, ...]
    superbatches (steps_per_call > 1): the leading scan axis stays
    unsharded and everything shifts by one."""
    spec = [None] * ndim
    off = 1 if stacked else 0
    spec[off] = "data"
    axis = _SPATIAL_KEYS.get(key)
    if axis is not None and mesh.shape["spatial"] > 1:
        spec[axis + off] = "spatial"
    return NamedSharding(mesh, P(*spec))


def put_global(batch: Dict[str, np.ndarray], shardings: Dict[str, NamedSharding]):
    """Host batch -> global device arrays under `shardings`.

    Single-process: plain device_put. Multi-host: each process holds only
    its contiguous slice of every batch (Loader yields exactly that, see
    data/pipeline.py) and the global array is assembled with
    `jax.make_array_from_process_local_data` — no host ever materializes
    the full global batch (SURVEY.md §5.8 build plan)."""
    if jax.process_count() == 1:
        return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
    return {k: jax.make_array_from_process_local_data(shardings[k], v)
            for k, v in batch.items()}


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray],
                stacked: bool = False):
    """Put a host batch onto the mesh, each entry laid out per
    `batch_sharding`. Returns a dict of global jax.Arrays."""
    return put_global(batch, batch_shardings(mesh, batch, stacked))


def batch_shardings(mesh: Mesh, batch: Dict[str, np.ndarray],
                    stacked: bool = False):
    """The sharding pytree matching `batch` (for prefetch_to_device)."""
    return {k: batch_sharding(mesh, k, v.ndim, stacked)
            for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (train state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
