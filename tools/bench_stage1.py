"""Micro-bench: decoder stage-1 (C=96->32 @ H/2) conv formulations.

    python tools/bench_stage1.py [--iters 30]

After the NCHW shift-einsum decoder landed, the profiler shows
upconv_1_1 as the remaining decoder hotspot (~15 ms of a 91 ms step):
unlike stage 0, XLA materializes the 9 shifted input windows (slice
4.9 ms, AI=0) and the reflect-pad concat (3.6 ms) instead of fusing
them into the dots. This times alternatives that move or shrink the
materialization:

- shifts9 (current): reflect-pad H+W, 9 static-slice einsums.
- outshift: reflect-pad H only; for each tap, dot the H-window and
  shift the *output* (O=32 < C=96 channels) in W with edge-reflect
  concat — 9 shifted adds of the small output instead of 9 copies of
  the big input.
- stack3: materialize the 3 W-shifted copies once (concat on C), then
  3 H-slice dots contracting 3C — 3x input copies instead of 9x.
- nhwc conv: plain XLA conv for this shape (C_in=96 fills 3/4 lanes).

Timing: data-dependent chain + value fetch (CLAUDE.md).
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

B, H, W, CIN, COUT = 12, 96, 320, 96, 32
DTYPE = jnp.bfloat16


def pad_hw(x):
    return jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")


def pad_h(x):
    return jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")


def conv_shifts9(x, k, b):
    xp = pad_hw(x)
    _, c, hp, wp = xp.shape
    out = None
    for dy in range(3):
        for dx in range(3):
            win = lax.slice(xp, (0, 0, dy, dx), (B, c, dy + hp - 2, dx + wp - 2))
            t = jnp.einsum("co,bchw->bohw", k[dy, dx], win,
                           preferred_element_type=DTYPE)
            out = t if out is None else out + t
    return out + b[None, :, None, None]


def _shift_w_reflect(t, dx):
    """out[..., w] = t[..., w + dx - 1] with reflect at the edges."""
    if dx == 1:
        return t
    if dx == 0:  # needs t at w-1; out[0] reflects to t[1]
        return jnp.concatenate([t[..., 1:2], t[..., : W - 1]], axis=-1)
    # dx == 2: needs t at w+1; out[W-1] reflects to t[W-2]
    return jnp.concatenate([t[..., 1:], t[..., W - 2: W - 1]], axis=-1)


def conv_outshift(x, k, b):
    xp = pad_h(x)
    out = None
    for dy in range(3):
        win = lax.slice(xp, (0, 0, dy, 0), (B, CIN, dy + H, W))
        for dx in range(3):
            t = jnp.einsum("co,bchw->bohw", k[dy, dx], win,
                           preferred_element_type=DTYPE)
            t = _shift_w_reflect(t, dx)
            out = t if out is None else out + t
    return out + b[None, :, None, None]


def conv_stack3(x, k, b):
    # 3 W-shifted copies stacked on C (reflect edges), then 3 H-slice dots
    left = jnp.concatenate([x[..., 1:2], x[..., : W - 1]], axis=-1)
    right = jnp.concatenate([x[..., 1:], x[..., W - 2: W - 1]], axis=-1)
    stack = jnp.concatenate([left, x, right], axis=1)  # [B, 3C, H, W]
    sp = pad_h(stack)
    # stack order is dx-major (left block first) == k[dy, dx] blocks
    k3 = jnp.concatenate([k[:, 0], k[:, 1], k[:, 2]], axis=1)  # [3, 3C, O]
    out = None
    for dy in range(3):
        win = lax.slice(sp, (0, 0, dy, 0), (B, 3 * CIN, dy + H, W))
        t = jnp.einsum("co,bchw->bohw", k3[dy], win,
                       preferred_element_type=DTYPE)
        out = t if out is None else out + t
    return out + b[None, :, None, None]


def conv_nhwc(x_nhwc, k_hwio, b):
    xp = jnp.pad(x_nhwc, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return lax.conv_general_dilated(
        xp, k_hwio, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def make_step(fn):
    def loss_fn(params, x):
        y = fn(x, *params)
        return jnp.mean(y.astype(jnp.float32) ** 2), y

    @jax.jit
    def step(params, x):
        (loss, y), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, x)
        bump = jnp.mean(y.astype(jnp.float32)) * 1e-6
        return loss, grads, x + bump.astype(x.dtype)

    return step


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", default=30, type=int)
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    kx, kk = jax.random.split(key)
    x = jax.random.normal(kx, (B, CIN, H, W), DTYPE)
    k = jax.random.normal(kk, (3, 3, CIN, COUT), DTYPE) * 0.05
    b = jnp.zeros((COUT,), DTYPE)

    # parity check (f32, CPU-safe magnitudes)
    ref = conv_shifts9(x, k, b)
    for name, fn in (("outshift", conv_outshift), ("stack3", conv_stack3)):
        got = fn(x, k, b)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"parity {name}: max|d|={err:.4f}")

    cases = {
        "shifts9 (current)": (conv_shifts9, (k, b), x),
        "outshift": (conv_outshift, (k, b), x),
        "stack3": (conv_stack3, (k, b), x),
        "nhwc conv": (conv_nhwc, (k.astype(DTYPE), b), x.transpose(0, 2, 3, 1)),
    }
    for name, (fn, params, x0) in cases.items():
        step = make_step(fn)
        xi = x0
        loss, grads, xi = step(params, xi)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            loss, grads, xi = step(params, xi)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:20s} {dt:8.2f} ms/iter (fwd+bwd, b{B} {CIN}->{COUT} @ {H}x{W})")


if __name__ == "__main__":
    main()
