"""Micro-bench: ResNet conv1 stem (7x7/s2 on 3-6 channels) formulations.

    python tools/bench_stem.py [--iters 30]

The step profile shows both stems run at ~60 GB/s effective: with C=3
(depth) / C=6 (pose) on the 128-lane minor axis the MXU contracts
mostly padding. Candidates:

- conv7x7s2 (current): plain NHWC conv, stride 2, pad 3.
- space-to-depth: x -> [B,H/2,W/2,4C] phase blocks; the 7x7/s2 conv
  becomes a 4x4/s1 conv with 4C input channels (one zero tap from the
  7->8 pad) — 4x the lane occupancy, stride-1.
- im2col: materialize [B,H/2,W/2,49C] patches + one matmul (49C = 147
  or 294 lanes).

Backward is dW only — the stem input is the image, a leaf with no
gradient in the train step. Timing: data-dependent chain + value fetch
(CLAUDE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monodepth_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

B, H, W = 12, 192, 640
DTYPE = jnp.bfloat16


def conv_plain(x, k):
    return lax.conv_general_dilated(
        x, k, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def k_to_s2d(k):
    """[7,7,C,O] -> [4,4,4C,O]: tap (a,ry,bx,rx) reads k[2a+ry-1, 2b+rx-1]
    shifted so the 4-tap block conv with pad (2,1) reproduces pad-3/s2."""
    kh, kw, c, o = k.shape
    kp = jnp.zeros((8, 8, c, o), k.dtype).at[1:8, 1:8].set(k)
    # kp index i' = i + 1, so i' = 2a + ry with a in [0,3]; block offsets
    # a-2 in [-2,1] match pad (2,1)
    k4 = kp.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    return k4.reshape(4, 4, 2, 2, c, o).transpose(
        0, 1, 2, 3, 4, 5).reshape(4, 4, 4 * c, o)


def conv_s2d(x, k):
    x4 = s2d(x)
    k4 = k_to_s2d(k)
    return lax.conv_general_dilated(
        x4, k4, (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_im2col(x, k):
    c = x.shape[3]
    xp = jnp.pad(x, ((0, 0), (3, 4), (3, 4), (0, 0)))
    cols = []
    for dy in range(7):
        for dx in range(7):
            cols.append(lax.slice(
                xp, (0, dy, dx, 0), (B, dy + H, dx + W, c), (1, 2, 2, 1)))
    patches = jnp.concatenate(cols, axis=-1)  # [B, H/2, W/2, 49C]
    return patches.reshape(B, (H // 2) * (W // 2), 49 * c) @ \
        k.reshape(49 * c, k.shape[3])


def make_step(fn, out_reshape=None):
    def loss_fn(k, x):
        y = fn(x, k)
        return jnp.mean(y.astype(jnp.float32) ** 2), y

    @jax.jit
    def step(k, x):
        (loss, y), dk = jax.value_and_grad(loss_fn, has_aux=True)(k, x)
        bump = (jnp.mean(y.astype(jnp.float32)) * 1e-6).astype(x.dtype)
        return loss, dk, x + bump

    return step


def run(cin, iters=30):
    key = jax.random.PRNGKey(cin)
    kx, kk = jax.random.split(key)
    x = jax.random.normal(kx, (B, H, W, cin), DTYPE)
    k = jax.random.normal(kk, (7, 7, cin, 64), DTYPE) * 0.05

    ref = conv_plain(x, k)
    got = conv_s2d(x, k)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    got2 = conv_im2col(x, k).reshape(ref.shape)
    err2 = float(jnp.max(jnp.abs(got2.astype(jnp.float32)
                                 - ref.astype(jnp.float32))))
    print(f"C={cin} parity: s2d max|d|={err:.4f}  im2col max|d|={err2:.4f}")

    for name, fn in (("conv7x7s2 (current)", conv_plain),
                     ("space-to-depth", conv_s2d),
                     ("im2col", conv_im2col)):
        step = make_step(fn)
        xi = x
        loss, dk, xi = step(k, xi)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            loss, dk, xi = step(k, xi)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"  C={cin} {name:22s} {dt:8.2f} ms/iter (fwd+dW)")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", default=30, type=int)
    args = p.parse_args()
    run(3, args.iters)
    run(6, args.iters)


if __name__ == "__main__":
    main()
