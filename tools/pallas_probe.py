"""Probe Mosaic support + throughput for the warp-sampler building blocks.

    python tools/pallas_probe.py

Experiments (each compiled on the real chip — interpret mode hides
Mosaic lowering errors, CLAUDE.md):
  A  in-kernel lane gather: take_along_axis on one [8, 128] vreg
  B  full-row gather via per-128-chunk candidate select ([8, W] slab)
  C  dynamic fori_loop trip count + dynamic row reads from VMEM
  D  throughput: B repeated over a full [B=12, 192, 640] warp's worth
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monodepth_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def probe_a():
    """Single-vreg lane gather."""
    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    tab = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 128, (8, 128)),
                      jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    expect = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
    ok = np.array_equal(np.asarray(out), expect)
    print(f"A take_along_axis [8,128]: {'OK' if ok else 'WRONG'}")


def _row_gather(row_bcast, idx, W):
    """row_bcast [8, W] (same row all sublanes), idx [8, W] in [0, W-1]
    -> out[s, l] = row[idx[s, l]] via per-128-chunk candidate select."""
    outs = []
    for j in range(W // 128):  # output lane blocks
        idx_j = idx[:, j * 128:(j + 1) * 128]
        acc = jnp.zeros((row_bcast.shape[0], 128), row_bcast.dtype)
        for k in range(W // 128):  # candidate source chunks
            chunk = row_bcast[:, k * 128:(k + 1) * 128]  # static slice
            local = idx_j - k * 128
            valid = (local >= 0) & (local < 128)
            got = jnp.take_along_axis(chunk, jnp.clip(local, 0, 127), axis=1)
            acc = jnp.where(valid, got, acc)
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


def probe_b(W=640):
    def kernel(row_ref, idx_ref, out_ref):
        out_ref[:] = _row_gather(row_ref[:], idx_ref[:], W)

    rng = np.random.default_rng(1)
    row = jnp.asarray(np.tile(rng.uniform(0, 1, (1, W)), (8, 1)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, W, (8, W)), jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(row, idx)
    expect = np.asarray(row)[0][np.asarray(idx)]
    ok = np.allclose(np.asarray(out), expect)
    print(f"B full-row candidate gather W={W}: {'OK' if ok else 'WRONG'}")


def probe_c(H=192, W=640):
    """Dynamic trip count + dynamic row reads: sum rows ymin..ymax."""
    def kernel(src_ref, lim_ref, out_ref):
        ymin, ymax = lim_ref[0], lim_ref[1]

        def body(y, acc):
            return acc + src_ref[pl.ds(y, 1), :]

        out_ref[:] = jax.lax.fori_loop(ymin, ymax, body,
                                       jnp.zeros((1, W), jnp.float32))

    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.uniform(0, 1, (H, W)), jnp.float32)
    lim = jnp.asarray([50, 61], jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, lim)
    ok = np.allclose(np.asarray(out)[0], np.asarray(src)[50:61].sum(0))
    print(f"C dynamic fori_loop + row reads: {'OK' if ok else 'WRONG'}")


def probe_d(B=12, H=192, W=640, n_y=4):
    """Throughput: per-slab loop doing n_y candidate row gathers -> the
    cost shape of one warp channel (no real warp logic, just the ops)."""
    def kernel(src_ref, idx_ref, out_ref):
        acc = jnp.zeros((8, W), jnp.float32)

        def body(y, acc):
            row = src_ref[0, pl.ds(y, 1), :]  # [1, W]
            # Mosaic cannot vector.broadcast a dynamically-sliced row
            # across sublanes; an 8-way concat lowers fine
            row8 = jnp.concatenate([row] * 8, axis=0)
            return acc + _row_gather(row8, idx_ref[0], W)

        slab = pl.program_id(1)
        out_ref[0] = jax.lax.fori_loop(slab * 8, slab * 8 + n_y, body, acc)

    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.uniform(0, 1, (B, H, W)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, W, (B, H, W)), jnp.int32)

    call = pl.pallas_call(
        kernel,
        grid=(B, H // 8),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, W), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, W), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
    )

    @jax.jit
    def loop(idx0, n):
        def body(i, carry):
            out = call(src, jnp.abs(idx0 + carry.astype(jnp.int32)))
            return out.mean().astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(idx, 2))
    iters = 50
    t0 = time.perf_counter()
    float(loop(idx, iters))
    dt = (time.perf_counter() - t0) / iters
    print(f"D slab loop n_y={n_y} [{B},{H},{W}]: {dt * 1e3:.2f} ms/channel "
          f"(x3 ch = {dt * 3e3:.2f} ms/warp-equivalent)")


if __name__ == "__main__":
    for name, fn in [("A", probe_a), ("B", probe_b), ("C", probe_c),
                     ("D", probe_d)]:
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")
