"""Orbax checkpoint/resume of the FULL train state.

The reference saves per-module `state_dict`s every 2 epochs and never
saves optimizer/scheduler state or offers resume (reference:
model_tool/logger.py:51-68; SURVEY.md §5.4). Here a checkpoint is the
whole `TrainState` (params + batch_stats + Adam moments + step + rng), so
a resumed run is bit-continuous with an uninterrupted one. A per-module
npz export preserves the reference's per-model artifact layout
(`encoder<epoch>.npz`, `decoder<epoch>.npz`, ...) for eval tooling.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from monodepth_tpu.training.state import TrainState
from monodepth_tpu.utils.serialization import save_npz


class Checkpointer:
    def __init__(self, directory: str, keep: int = 0,
                 async_save: bool = False):
        """`keep` > 0 bounds disk: after each save only the newest `keep`
        full TrainStates (and their per-module npz exports) survive — a
        24-epoch default run otherwise retains 12 full states incl. Adam
        moments. The newest checkpoint is always among the kept, so the
        final save of a run is never pruned. 0 = keep everything (the
        reference's behavior, model_tool/logger.py:60-68).

        `async_save` overlaps serialization + disk IO with continued
        training (`ocp.AsyncCheckpointer`): `save` returns once the host
        snapshot is taken (the `device_get`), the write commits on a
        background thread, and a new save (or `wait()`) blocks until the
        previous one has committed — so at most one save is in flight
        and an interrupted run can lose only the newest, uncommitted
        checkpoint (Orbax writes to a temp dir and renames on commit).
        Pruning is deferred to the commit point. Multi-host: the async
        commit barriers across processes exactly like the sync form."""
        self.directory = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)
        self._async = async_save
        if async_save:
            self._ckpt = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        else:
            self._ckpt = ocp.StandardCheckpointer()

    def _path(self, epoch: int) -> str:
        return os.path.join(self.directory, f"state_{epoch:04d}")

    def save(self, epoch: int, state: TrainState) -> str:
        path = self._path(epoch)
        # device_get snapshots to host numpy synchronously: the training
        # loop may donate/overwrite the device buffers immediately after.
        host_state = jax.device_get(state)
        if self._async:
            # AsyncCheckpointer(StandardCheckpointHandler) takes ocp.args;
            # StandardCheckpointer's convenience save takes the tree.
            self._ckpt.save(path, args=ocp.args.StandardSave(host_state),
                            force=True)
            # The new save is still uncommitted (temp-dir named, invisible
            # to _prune's state_NNNN match) but any PREVIOUS async save
            # has committed — AsyncCheckpointer.save blocks on it — so
            # prune the older generations now; the in-flight one is
            # covered by the next save's prune or by `wait()`.
            self._prune()
        else:
            self._ckpt.save(path, host_state, force=True)
            self._ckpt.wait_until_finished()
            self._prune()
        return path

    def wait(self) -> None:
        """Block until any in-flight async save has committed, then
        prune. A no-op for sync checkpointers (saves already waited)."""
        self._ckpt.wait_until_finished()
        self._prune()

    def _prune(self) -> None:
        if self.keep <= 0:
            return
        # Multi-host: Orbax coordinates the SAVE across processes, but
        # pruning is plain filesystem IO — only rank 0 may do it, and
        # removals tolerate races with stragglers reading the dir.
        if jax.process_index() != 0:
            return
        import shutil

        epochs = sorted(
            int(m.group(1)) for name in os.listdir(self.directory)
            if (m := re.fullmatch(r"state_(\d+)", name)))
        for old in epochs[:-self.keep]:
            shutil.rmtree(self._path(old), ignore_errors=True)
            # matching per-module exports (named <module><epoch+1>.npz)
            for name in os.listdir(self.directory):
                if re.fullmatch(rf"[a-z_]+{old + 1}\.npz", name):
                    try:
                        os.remove(os.path.join(self.directory, name))
                    except FileNotFoundError:
                        pass

    def latest_epoch(self) -> Optional[int]:
        epochs = [int(m.group(1))
                  for name in os.listdir(self.directory)
                  if (m := re.fullmatch(r"state_(\d+)", name))]
        return max(epochs) if epochs else None

    def restore(self, state: TrainState, epoch: int | None = None) -> tuple[TrainState, int]:
        """Restore into the structure of `state` (used as the abstract
        target). Returns (state, epoch_restored)."""
        if epoch is None:
            epoch = self.latest_epoch()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state)
        if self._async:
            restored = self._ckpt.restore(
                self._path(epoch), args=ocp.args.StandardRestore(abstract))
        else:
            restored = self._ckpt.restore(self._path(epoch), abstract)
        return restored, epoch

    def export_modules(self, epoch: int, state: TrainState) -> None:
        """Per-module npz export mirroring the reference layout
        (`<key><epoch+1>.pt`, logger.py:60-66)."""
        params = jax.device_get(state.params)
        stats = jax.device_get(state.batch_stats)
        for name, tree in params.items():
            out = {"params": tree}
            if name in stats and jax.tree.leaves(stats[name]):
                out["batch_stats"] = stats[name]
            save_npz(os.path.join(self.directory, f"{name}{epoch + 1}.npz"),
                     out)
