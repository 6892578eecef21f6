"""Pallas TPU kernel: exact bilinear grid-sample for the warp hot path.

The 8 per-step warp `grid_sample`s were THE training bottleneck (~55% of
the step even with the packed XLA gather, tools/bench_step.py; ~26%
after this kernel): XLA:TPU gather costs ~21 ns per index regardless of
form. This kernel replaces
the per-index gather with VPU candidate-select, exploiting the structure
of warp displacement fields (reference op: F.grid_sample border/
align_corners=True, model_layer/warp.py:12-14, processor.py:161):

  vertical   the integer source row for output row r is r + dy with dy
             varying only as much as the VERTICAL displacement varies
             inside an 8-row slab — typically 1-3 distinct values. For
             each candidate dy the 8 source rows are ONE aligned dynamic
             sublane read of the (row-padded) image; a dynamic
             `fori_loop` over [dy_min, dy_max+1] adapts the cost to the
             data (wild early-training depth just runs more iterations —
             still exact).
  horizontal within each 128-lane output block, the needed source
             columns span few 128-aligned chunks; a dynamic fori_loop
             over [kmin, kmax] reads each chunk (dynamic lane slice of
             the image ref) and gathers it with single-vreg
             `take_along_axis` — the one gather form Mosaic supports —
             selecting in-range lanes. Both x-taps (x0, x0+1) come from
             the same chunk load.

The kernel also emits the two tap-difference fields
  gx[c] = dval_c/dwx,  gy[c] = dval_c/dwy
so the backward pass needs NO second gather: dgrid is a pure jnp
contraction with the upstream cotangent, chained through the exact
coordinate-prep VJP (same clamp semantics as ops/sampling.grid_sample).

GRADIENT CAVEAT: the VJP returns ZERO for `image`. In the training step
sources are data (no parameter dependency), so this is exact there; do
NOT use this kernel where the sampled image itself requires gradients.

Shapes: H % 8 == 0 and W % 128 == 0 (the training resolutions 640x192 /
1024x320 qualify); callers fall back to the jnp path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SLAB = 8      # output rows per grid step (f32 sublane tile)
PAD = 16      # row padding: every aligned 16-row candidate read stays in
              # bounds (max start = align8(H-1+PAD), end <= H+2*PAD)
LANES = 128


def supported(height: int, width: int) -> bool:
    return height % SLAB == 0 and width % LANES == 0


def _floor_div(a, b):
    """Floor division for possibly-negative traced ints (`lax.div`
    truncates toward zero; shift negative numerators to compensate)."""
    return jax.lax.div(a - jnp.where(a < 0, b - 1, 0), b)


def _row_pair_gather(img_ref, channels, start16, t, lane_meta):
    """v0/v1 [C*SLAB, W_block] per output block: v0 rows ch*8+s hold
    row[idx[s,l]] of channel ch (v1 the +1 tap), for the 8-row window at
    sub-offset `t` of the aligned 16-row block at `start16`.

    ALL channels gather in one [C*8, 128] take_along_axis — the gather
    instruction's cost is nearly height-independent (measured 7.1 us for
    [8,128] vs 7.7 us for [24,128] in a latency chain), so stacking
    channels on sublanes cuts the dominant per-gather cost ~3x. Each
    128-lane output block runs a dynamic fori_loop over ONLY the source
    chunks its indices touch ([kmin, kmax] — usually one), reading the
    [C, 16, 128] chunk straight from the image ref (dynamic lane slices
    of refs lower fine; of values they don't). Both x-taps come from the
    same chunk load. A cond-per-static-chunk formulation was measured
    slower: its false branches copy the accumulators, and misses
    outnumber hits ~3:1."""
    from jax.experimental import pallas as pl

    v0s, v1s = [], []
    for idx_j, idx3_j, kmin, kmax in lane_meta:
        del idx_j
        zero = jnp.zeros((channels * SLAB, LANES), jnp.float32)

        def body(k, carry, idx3_j=idx3_j):
            a0, a1 = carry
            off = pl.multiple_of(k * LANES, LANES)
            chunk_all = img_ref[0, :, pl.ds(start16, 2 * SLAB),
                                pl.ds(off, LANES)]          # [C, 16, 128]
            win = jnp.concatenate(
                [chunk_all[c, t:t + SLAB] for c in range(channels)], axis=0)
            l0 = idx3_j - off
            l1 = l0 + 1
            g0 = jnp.take_along_axis(win, jnp.clip(l0, 0, LANES - 1),
                                     axis=1)
            g1 = jnp.take_along_axis(win, jnp.clip(l1, 0, LANES - 1),
                                     axis=1)
            return (jnp.where((l0 >= 0) & (l0 < LANES), g0, a0),
                    jnp.where((l1 >= 0) & (l1 < LANES), g1, a1))

        a0, a1 = jax.lax.fori_loop(kmin, kmax + 1, body, (zero, zero))
        v0s.append(a0)
        v1s.append(a1)
    return jnp.concatenate(v0s, axis=1), jnp.concatenate(v1s, axis=1)


def _kernel(img_ref, dy_ref, x0_ref, wx_ref, wy_ref,
            out_ref, *grad_refs, channels, width, with_grads):
    from jax.experimental import pallas as pl

    dyb = dy_ref[0]
    x0b = x0_ref[0]
    wxb = wx_ref[0]
    wyb = wy_ref[0]
    dmin = jnp.min(dyb)
    dmax = jnp.max(dyb)
    base = pl.program_id(1) * SLAB + PAD
    one = jnp.float32(1.0)

    def tile_c(a):  # [8, N] -> [C*8, N], channel-stacked on sublanes
        return jnp.concatenate([a] * channels, axis=0)

    # hoisted per-output-block lane metadata (candidate- and channel-
    # independent): indices (plain + channel-tiled) + their chunk range
    lane_meta = []
    for j in range(width // LANES):
        idx_j = x0b[:, j * LANES:(j + 1) * LANES]
        lane_meta.append((idx_j, tile_c(idx_j), jnp.min(idx_j) // LANES,
                          (jnp.max(idx_j) + 1) // LANES))
    wxb3 = tile_c(wxb)

    # Candidate vertical offsets c cover [dmin, dmax+1] (the +1 serves
    # the y0+1 tap). The outer dynamic loop walks ALIGNED 16-row blocks
    # (one VMEM read per 8 candidates — Mosaic only proves sublane
    # alignment for multiple-of-8 starts); the static sub-offset loop
    # slices the 8-row window statically and is skipped entirely when no
    # pixel matches that offset (dy values inside a slab are sparse in
    # their range). All channels share masks/weights and ride one
    # channel-stacked [C*8, W] accumulator set.
    def block_body(o8, carry):
        start = pl.multiple_of(base + o8 * SLAB, SLAB)

        for t in range(SLAB):
            c = o8 * SLAB + t
            m0b = dyb == c         # tap row y0
            m1b = dyb == c - 1     # tap row y0 + 1
            needed = jnp.any(m0b | m1b)

            def hit(carry=carry, t=t, m0b=m0b, m1b=m1b, start=start):
                m0 = m0b.astype(jnp.float32)
                m1 = m1b.astype(jnp.float32)
                w = tile_c(m0 * (one - wyb) + m1 * wyb)
                v0, v1 = _row_pair_gather(
                    img_ref, channels, start, t, lane_meta)
                diff = v1 - v0
                interp = v0 + wxb3 * diff
                if with_grads:
                    out_acc, gx_acc, gy_acc = carry
                    dm = tile_c(m1 - m0)
                    return (out_acc + w * interp,
                            gx_acc + w * diff,
                            gy_acc + dm * interp)
                return (carry[0] + w * interp,)

            carry = jax.lax.cond(needed, hit, lambda carry=carry: carry)
        return carry

    zero = jnp.zeros((channels * SLAB, width), jnp.float32)
    init = (zero, zero, zero) if with_grads else (zero,)
    final = jax.lax.fori_loop(
        _floor_div(dmin, SLAB), _floor_div(dmax + 1, SLAB) + 1,
        block_body, init)
    refs = (out_ref,) + grad_refs
    for acc, ref in zip(final, refs):
        for ch in range(channels):
            ref[0, ch] = acc[ch * SLAB:(ch + 1) * SLAB]


def _coords(grid, height, width):
    """Continuous clamped coords + integer anchors + weights — EXACTLY the
    prep of ops/sampling.grid_sample so the two paths share semantics.
    Integer anchors are re-clamped AFTER the int cast: a NaN coordinate
    casts to an undefined int that would otherwise blow up the kernel's
    candidate-loop bounds (NaN weights still poison the output values,
    never memory safety or loop trip counts)."""
    x = jnp.clip((grid[..., 0] + 1.0) * 0.5 * (width - 1), 0.0, width - 1)
    y = jnp.clip((grid[..., 1] + 1.0) * 0.5 * (height - 1), 0.0, height - 1)
    x0 = jnp.clip(jnp.floor(x), 0, width - 2)
    y0 = jnp.clip(jnp.floor(y), 0, height - 2)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, width - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, height - 2)
    return (x - x0).astype(jnp.float32), (y - y0).astype(jnp.float32), \
        x0i, y0i


@functools.partial(jax.jit,
                   static_argnames=("full_height", "interpret", "with_grads"))
def _forward(image, grid, row0=None, full_height=None,
             interpret=False, with_grads=True):
    """Kernel launch. The basic form (row0/full_height None) warps a
    same-size image. The SHIFTED form decouples the two row spaces for
    spatial (H) sharding: `image` is a LOCAL row slab (own rows + halo,
    [B, Himg, W, C] with Himg = Hout + 2*halo), `grid`'s y-coordinates
    are GLOBAL over `full_height` rows, and `row0` (traced i32/f32
    scalar) is the global row of the slab's first row — anchors shift
    into slab space and clamp to its bounds (out-of-halo anchors stay
    memory-safe but inexact; callers cond to an exact fallback,
    training/step.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Himg, W, C = image.shape
    Hout = grid.shape[1]
    if grid.shape != (B, Hout, W, 2):
        # same-width slabs only (spatial sharding splits H, never W);
        # the jnp grid_sample handles the general Ho/Wo case
        raise ValueError(f"warp_sample needs grid [B, Ho, W, 2] matching "
                         f"the image width; got image {image.shape}, "
                         f"grid {grid.shape}")
    if full_height is None:
        if Himg != Hout:
            raise ValueError("plain warp_sample needs image H == grid H; "
                             "pass row0/full_height for shifted slabs")
        full_height = Himg
    wx, wy, x0, y0 = _coords(grid, full_height, W)
    if row0 is not None:
        # slab space; clamp keeps the candidate loop + reads in bounds
        y0 = jnp.clip(y0 - jnp.asarray(row0, jnp.int32), 0, Himg - 2)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, Hout, 1), 1)
    dy = y0 - rows

    img_p = image.astype(jnp.float32).transpose(0, 3, 1, 2)
    img_pad = jnp.pad(img_p, ((0, 0), (0, 0), (PAD, PAD), (0, 0)))

    spec_img = pl.BlockSpec((1, C, Himg + 2 * PAD, W),
                            lambda b, s: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((1, SLAB, W), lambda b, s: (b, s, 0),
                            memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, C, SLAB, W), lambda b, s: (b, 0, s, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, C, Hout, W), jnp.float32)

    n_out = 3 if with_grads else 1
    outs = pl.pallas_call(
        functools.partial(_kernel, channels=C, width=W,
                          with_grads=with_grads),
        grid=(B, Hout // SLAB),
        in_specs=[spec_img, spec_row, spec_row, spec_row, spec_row],
        out_specs=(spec_out,) * n_out,
        out_shape=(shape,) * n_out,
        interpret=interpret,
    )(img_pad, dy, x0, wx, wy)
    out = outs[0].transpose(0, 2, 3, 1)
    return (out, outs[1], outs[2]) if with_grads else (out, None, None)


# Crossover (mean per-slab dy span, px) above which the packed XLA
# gather beats the candidate loop. The kernel's outer fori_loop runs
# ~span/8+2 aligned block reads per slab, so its cost is linear in the
# MEAN span while the packed gather is flat (~31-53 ms/warp at 640x192,
# docs/PERF.md). Real warp fields — even ~60 px displacements — have
# spans of a few px (displacement varies smoothly within 8 rows);
# only degenerate fields (uniform-random grids, diverged training)
# exceed tens of px.
GUARD_SPAN = 40.0


def dy_span(grid):
    """Mean per-slab vertical-index span (px) of a warp grid — the
    quantity the candidate kernel's cost is linear in (module docstring;
    per-warp cost ≈ 2.6 + 0.06*span ms at 640x192 b12, docs/PERF.md).
    One elementwise pass + a reduce, cheap enough to compute every step:
    the train step reports it as the `warp_span` telemetry metric so a
    diverged run (wild grids → slow candidate loops) is visible in the
    logs instead of silently 10x-ing the step (training/loop.py warns
    above GUARD_SPAN). Requires H % 8 == 0 (kernel-supported shapes)."""
    B, H, W, _ = grid.shape
    y = jnp.clip((grid[..., 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2)
    dy = y0 - jnp.arange(H, dtype=y0.dtype)[None, :, None]
    slabs = dy.reshape(B, H // SLAB, SLAB, W)
    return jnp.mean(jnp.max(slabs, axis=(2, 3))
                    - jnp.min(slabs, axis=(2, 3)))


def warp_sample_guarded(image, grid, interpret: bool = False,
                        span_threshold: float = GUARD_SPAN):
    """`warp_sample` with a runtime escape hatch: when the displacement
    field's mean per-slab vertical span exceeds `span_threshold`, a
    `lax.cond` routes the warp through the flat-cost jnp `grid_sample`
    (packed gather) instead. Same exactness either way; both branches
    are differentiable (grid cotangent identical; the Pallas branch's
    image cotangent is zero by contract — callers already require that).

    OPT-IN (`--warp_guard true`), not the default: the cond is NOT free —
    steady-state 640x192 b12 train drops 119.1 -> 91.1 img/s/chip
    (~101 -> ~132 ms/step, measured round 3) because each of the 8
    per-step conds is a fusion barrier that materializes its operands
    and serializes against the span reduction. Real training fields sit
    at span ~1-3 px from step 0 (displacement varies smoothly inside 8
    rows even for ~60 px warps), so the default hot path runs the kernel
    unconditionally and surfaces `dy_span` as the `warp_span` telemetry
    metric instead — divergence becomes a logged warning, not a silent
    slowdown. Use the guard for unattended runs where a diverged step
    must keep flat cost."""
    from monodepth_tpu.ops.sampling import grid_sample as _gs

    B, H, W, _ = image.shape
    if grid.shape != (B, H, W, 2):
        raise ValueError(f"warp_sample needs grid [B, H, W, 2] matching "
                         f"the image; got image {image.shape}, "
                         f"grid {grid.shape}")
    return jax.lax.cond(
        dy_span(grid) <= span_threshold,
        lambda img, grd: warp_sample(img, grd, interpret),
        lambda img, grd: _gs(img, grd),
        image, grid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def warp_sample(image, grid, interpret: bool = False):
    """Drop-in `grid_sample` (border, align_corners=True) as a Pallas
    kernel. Gradient flows to `grid` only — see module docstring.

    The primal (undifferentiated) path skips the gx/gy tap-difference
    accumulators and outputs entirely — eval/inference pays only the
    warp itself; under AD the custom_vjp fwd rule computes them."""
    out, _, _ = _forward(image, grid, interpret=interpret, with_grads=False)
    return out


def _fwd(image, grid, interpret):
    out, gx, gy = _forward(image, grid, interpret=interpret)
    return out, (grid, gx, gy)


def _grid_vjp(grid, dout, gx, gy, full_height, width):
    """(upstream cotangent, tap differences) -> dgrid, chained through the
    exact coordinate-prep VJP (same clamp semantics as _coords)."""
    dout_p = dout.transpose(0, 3, 1, 2)
    dwx = jnp.sum(dout_p * gx, axis=1)  # [B, Ho, W]
    dwy = jnp.sum(dout_p * gy, axis=1)

    def weights(g):
        wx, wy, _, _ = _coords(g, full_height, width)
        return wx, wy

    _, vjp = jax.vjp(weights, grid)
    (dgrid,) = vjp((dwx, dwy))
    return dgrid


def _bwd(interpret, res, dout):
    grid, gx, gy = res
    H, W = gx.shape[2], gx.shape[3]
    dgrid = _grid_vjp(grid, dout, gx, gy, H, W)
    return jnp.zeros(dout.shape[:3] + (gx.shape[1],), dout.dtype), dgrid


warp_sample.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def warp_sample_shifted(image, grid, row0, full_height: int,
                        interpret: bool = False):
    """`warp_sample` over a LOCAL row slab of an H-sharded image (the
    spatial mesh axis, training/step.py): `image` [B, Hout+2*halo, W, C]
    holds this shard's rows plus a halo exchanged from its neighbors,
    `grid` [B, Hout, W, 2] carries GLOBAL coordinates over `full_height`
    rows, `row0` (traced f32/i32 scalar) is the slab's first global row
    (shard_row0 - halo; negative on the first shard). Exact wherever
    every tap row lands inside the slab — anchors beyond it clamp to the
    slab edge (memory-safe, wrong values); callers must detect that and
    fall back (the `lax.cond` in step.py's spatial sampler). Gradient
    flows to `grid` only, like `warp_sample`.

    Verified on the REAL chip (Mosaic lowering, which interpret mode
    cannot check) at the {spatial:2} 640x192 slab shape — 224-row slab,
    both shard anchors: fwd max err 1.8e-7, dgrid rel err 2.4e-7 vs the
    full-image XLA grid_sample."""
    out, _, _ = _forward(image, grid, row0, full_height,
                         interpret=interpret, with_grads=False)
    return out


def _fwd_shifted(image, grid, row0, full_height, interpret):
    out, gx, gy = _forward(image, grid, row0, full_height,
                           interpret=interpret)
    # `image` rides along only to shape the zero cotangent below: the slab
    # height (Hout + 2*halo) differs from dout's Hout, so it can't be
    # reconstructed from the other residuals. Saving it is free — it's a
    # reference to the caller's source frame, which outlives the step.
    return out, (image, grid, row0, gx, gy)


def _bwd_shifted(full_height, interpret, res, dout):
    image, grid, row0, gx, gy = res
    dgrid = _grid_vjp(grid, dout, gx, gy, full_height, gx.shape[3])
    return (jnp.zeros_like(image), dgrid, jnp.zeros_like(row0))


warp_sample_shifted.defvjp(_fwd_shifted, _bwd_shifted)
