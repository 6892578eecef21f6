"""Micro-bench: decoder stage-1 conv IN CONTEXT (upsample + skip concat).

    python tools/bench_stage1_ctx.py [--iters 30]

tools/bench_stage1.py showed the isolated 96->32 conv runs 4.1 ms
fwd+bwd, yet the step profile attributes ~15 ms to upconv_1_1 — the
difference is the input context: concat(upsample_2x(x_nchw),
transpose(skip_nhwc)). This reproduces that chain and times
formulations that remove the concat/transpose:

- concat (current): transpose skip -> concat on C -> pad -> 9 slice-dots
- split: conv(concat(a,b)) == conv_a(a) + conv_b(b) with the kernel
  split on Cin — no concat materialization
- split+nhwc-skip: the skip half contracts straight off the NHWC
  tensor ("co,bhwc->bohw") — no transpose either
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

B, H, W = 12, 96, 320  # stage-1 output resolution (H/2)
CUP, CSKIP, COUT = 32, 64, 32
CIN = CUP + CSKIP
DTYPE = jnp.bfloat16


def up2(x):  # NCHW nearest 2x
    return x.repeat(2, axis=2).repeat(2, axis=3)


def pad_hw(x):
    return jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")


def shifts9(xp, k):  # xp NCHW padded, k [3,3,C,O]
    _, c, hp, wp = xp.shape
    out = None
    for dy in range(3):
        for dx in range(3):
            win = lax.slice(xp, (0, 0, dy, dx),
                            (xp.shape[0], c, dy + hp - 2, dx + wp - 2))
            t = jnp.einsum("co,bchw->bohw", k[dy, dx], win,
                           preferred_element_type=DTYPE)
            out = t if out is None else out + t
    return out


def shifts9_nhwc_in(xp, k):  # xp NHWC padded, k [3,3,C,O] -> NCHW out
    _, hp, wp, c = xp.shape
    out = None
    for dy in range(3):
        for dx in range(3):
            win = lax.slice(xp, (0, dy, dx, 0),
                            (xp.shape[0], dy + hp - 2, dx + wp - 2, c))
            t = jnp.einsum("co,bhwc->bohw", k[dy, dx], win,
                           preferred_element_type=DTYPE)
            out = t if out is None else out + t
    return out


def form_concat(xs, skip, k, b):
    x = jnp.concatenate([up2(xs), skip.transpose(0, 3, 1, 2)], axis=1)
    return shifts9(pad_hw(x), k) + b[None, :, None, None]


def form_split(xs, skip, k, b):
    a = shifts9(pad_hw(up2(xs)), k[:, :, :CUP])
    c = shifts9(pad_hw(skip.transpose(0, 3, 1, 2)), k[:, :, CUP:])
    return a + c + b[None, :, None, None]


def form_split_nhwc(xs, skip, k, b):
    a = shifts9(pad_hw(up2(xs)), k[:, :, :CUP])
    skip_p = jnp.pad(skip, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    c = shifts9_nhwc_in(skip_p, k[:, :, CUP:])
    return a + c + b[None, :, None, None]


def make_step(fn):
    def loss_fn(params, xs, skip):
        y = fn(xs, skip, *params)
        return jnp.mean(y.astype(jnp.float32) ** 2), y

    @jax.jit
    def step(params, xs, skip):
        (loss, y), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, xs, skip)
        bump = (jnp.mean(y.astype(jnp.float32)) * 1e-6).astype(xs.dtype)
        return loss, grads, xs + bump, skip + bump

    return step


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", default=30, type=int)
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    xs = jax.random.normal(k1, (B, CUP, H // 2, W // 2), DTYPE)
    skip = jax.random.normal(k2, (B, H, W, CSKIP), DTYPE)
    k = jax.random.normal(k3, (3, 3, CIN, COUT), DTYPE) * 0.05
    b = jnp.zeros((COUT,), DTYPE)

    ref = form_concat(xs, skip, k, b)
    for name, fn in (("split", form_split), ("split+nhwc", form_split_nhwc)):
        got = fn(xs, skip, k, b)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"parity {name}: max|d|={err:.4f}")

    for name, fn in (("concat (current)", form_concat),
                     ("split", form_split),
                     ("split+nhwc-skip", form_split_nhwc)):
        step = make_step(fn)
        a, s = xs, skip
        loss, grads, a, s = step((k, b), a, s)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            loss, grads, a, s = step((k, b), a, s)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:20s} {dt:8.2f} ms/iter (fwd+bwd)")


if __name__ == "__main__":
    main()
