"""Micro-bench: full-res decoder conv formulations on the real chip.

    python tools/bench_decoder.py [--iters 30]

The profiler (tools/profile_step.py) shows the decoder's full-resolution
stages dominate the train step (~35 ms of ~98 ms at 640x192 b12):
with NHWC and C=16, XLA:TPU puts the channel dim on the 128-lane minor
axis, so every activation/cotangent moves ~8x its logical bytes
(measured 57 GB/s effective on pad-backward `add_any` ops vs the chip's
~819 GB/s). This script times the stage-0 chain

    reflect-pad + 3x3 conv(16->16) + ELU + reflect-pad + 3x3 conv(16->1)

fwd + full bwd (dx and dW) in several formulations to pick the layout
fix with evidence. Timing: data-dependent chain forced by a value fetch
(CLAUDE.md — block_until_ready lies on the tunneled backend).
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

B, H, W, C = 12, 192, 640, 16
DTYPE = jnp.bfloat16


def pad_reflect_nhwc(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


def pad_reflect_nchw(x):
    return jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")


def chain_nhwc(x, w1, b1, w2, b2):
    """Current form: NHWC nn.Conv-equivalent (HWIO weights)."""
    y = lax.conv_general_dilated(
        pad_reflect_nhwc(x), w1, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
    y = jax.nn.elu(y)
    d = lax.conv_general_dilated(
        pad_reflect_nhwc(y), w2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
    return y, d


def chain_nchw(x, w1, b1, w2, b2):
    """NCHW operands/outputs: spatial dims stay on the (8,128) tile."""
    y = lax.conv_general_dilated(
        pad_reflect_nchw(x), w1, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW")) + b1[:, None, None]
    y = jax.nn.elu(y)
    d = lax.conv_general_dilated(
        pad_reflect_nchw(y), w2, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW")) + b2[:, None, None]
    return y, d


def conv3x3_shifts(xp, w, b):
    """9-shift einsum on NCHW: out[b,o,h,w] = sum_{c,dy,dx} ...

    Each shift is a static slice of the padded input + a [O,C] x
    [B,C,H,W] dot_general contracting C — spatial dims never leave the
    vreg tile; the channel contraction is a tiny matmul XLA keeps in
    registers/VMEM.
    """
    O = w.shape[0]
    out = None
    for dy in range(3):
        for dx in range(3):
            win = lax.slice(
                xp, (0, 0, dy, dx),
                (xp.shape[0], xp.shape[1], dy + H, dx + W))
            t = jnp.einsum("oc,bchw->bohw", w[:, :, dy, dx], win,
                           preferred_element_type=DTYPE)
            out = t if out is None else out + t
    return out + b[:, None, None]


def chain_shifts(x, w1, b1, w2, b2):
    y = jax.nn.elu(conv3x3_shifts(pad_reflect_nchw(x), w1, b1))
    d = conv3x3_shifts(pad_reflect_nchw(y), w2, b2)
    return y, d


def chain_im2col(x, w1, b1, w2, b2):
    """NHWC im2col: materialize [B,H,W,9C] patches (C-minor but 9x
    denser: 144 lanes round to 256, a 1.8x pad vs 8x) + one matmul."""

    def conv(xp, w, b):  # xp NHWC padded, w [3,3,C,O]
        patches = jnp.concatenate(
            [lax.slice(xp, (0, dy, dx, 0),
                       (B, dy + H, dx + W, xp.shape[3]))
             for dy in range(3) for dx in range(3)], axis=-1)
        wf = w.reshape(-1, w.shape[3])
        return patches @ wf + b

    y = jax.nn.elu(conv(pad_reflect_nhwc(x), w1, b1))
    d = conv(pad_reflect_nhwc(y), w2, b2)
    return y, d


def make_step(chain):
    """One fwd+bwd 'training step' on the chain, chained through x so
    iterations are data-dependent."""

    def loss_fn(params, x):
        y, d = chain(x, *params)
        return (jnp.mean(d.astype(jnp.float32) ** 2)
                + jnp.mean(y.astype(jnp.float32) ** 2)), d

    @jax.jit
    def step(params, x):
        (loss, d), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x)
        # feed a d-dependent perturbation back into x: data dependence
        bump = jnp.mean(d.astype(jnp.float32)) * 1e-6
        x = x + bump.astype(x.dtype)
        return loss, grads, x

    return step


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", default=30, type=int)
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    kx, k1, k2 = jax.random.split(key, 3)
    x_nhwc = jax.random.normal(kx, (B, H, W, C), DTYPE)
    x_nchw = x_nhwc.transpose(0, 3, 1, 2)
    w1_hwio = jax.random.normal(k1, (3, 3, C, C), DTYPE) * 0.1
    w2_hwio = jax.random.normal(k2, (3, 3, C, 1), DTYPE) * 0.1
    w1_oihw = w1_hwio.transpose(3, 2, 0, 1)
    w2_oihw = w2_hwio.transpose(3, 2, 0, 1)
    b1 = jnp.zeros((C,), DTYPE)
    b2 = jnp.zeros((1,), DTYPE)

    cases = {
        "nhwc (current)": (chain_nhwc, (w1_hwio, b1, w2_hwio, b2), x_nhwc),
        "nchw conv": (chain_nchw, (w1_oihw, b1, w2_oihw, b2), x_nchw),
        "nchw 9-shift einsum": (chain_shifts,
                                (w1_oihw, b1, w2_oihw, b2), x_nchw),
        "nhwc im2col matmul": (chain_im2col,
                               (w1_hwio, b1, w2_hwio, b2), x_nhwc),
    }

    for name, (chain, params, x0) in cases.items():
        step = make_step(chain)
        x = x0
        loss, grads, x = step(params, x)  # compile
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            loss, grads, x = step(params, x)
        _ = float(loss)  # value fetch forces the whole chain
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:24s} {dt:8.2f} ms/iter (fwd+bwd, b{B} {H}x{W} C{C})")


if __name__ == "__main__":
    main()
