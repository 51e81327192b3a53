"""Contiguous-segment doubling-scan reductions as ONE Pallas kernel.

ops/segments.py reduces over contiguous segment members with doubling
scans: log2(SEG_CAP) steps of (shift, same-segment guard, combine) in each
direction. In jnp every step materializes concatenate/select ops over the
full (R, N) stack, so one chain lowers to ~32-64 separate XLA ops of ~20-40
us launch + HBM round-trip each; the coalesce pass runs ~7 chains per
encode and xplane traces showed this glue (hundreds of %copy / %reshape
ops) costing multiple ms per 4K (tools/profiling/xplane_top.py).

This kernel runs an entire chain in VMEM. Lanes are tiled into center
blocks of ``_TILE`` with a ``_HALO``-lane halo on each side: a doubling
scan's final value at lane i depends on raw inputs in [i - (SEG_CAP-1),
i + SEG_CAP - 1] only, so _HALO = SEG_CAP makes every center lane exact.
Out-of-range halos (grid edges, lanes beyond N) are neutralized by setting
their segment ids to a sentinel that never equals a real id -- the same
mechanism the jnp path uses for its shift fills, so results are
BIT-IDENTICAL to ops.segments.seg_mixed_all (same shift order, same
combine operand order, same fwd + bwd - x final for sums).

Reference context: the reference reduces per-region quantities serially
inside each region grower (src/limg.cpp:1294-1533); the scan formulation
is this rebuild's TPU-native equivalent (SURVEY.md section 7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 2048
_HALO = 256   # == ops.segments.SEG_CAP; max dependency distance of the scan
_SENT = -9    # never equals a real segment id (ids are buffer positions)


def _make_kernel(n_sum: int, rows: int, steps: int):
    def kernel(xl_ref, xc_ref, xr_ref, sl_ref, sc_ref, sr_ref, out_ref):
        pid = pl.program_id(0)
        last = pl.num_programs(0) - 1

        # Content-adaptive cost (full-capacity coalesce buffers are mostly
        # zeros past the run prefix): a window whose center AND halos are
        # all zero scans to exactly zero -- sums trivially; max rows
        # because callers only feed ints or non-negative f32 (a -0.0 max
        # row could differ bitwise; no coalesce row can carry one). The
        # halo check matters: a segment straddling the tile edge can give
        # a zero-valued center member a nonzero segment total.
        has_work = (jnp.any(xl_ref[...] != 0) | jnp.any(xc_ref[...] != 0)
                    | jnp.any(xr_ref[...] != 0))

        @pl.when(jnp.logical_not(has_work))
        def _zero_fill():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        @pl.when(has_work)
        def _body():
            seg_l = jnp.where(pid == 0, _SENT, sl_ref[...])
            seg_r = jnp.where(pid == last, _SENT, sr_ref[...])
            seg = jnp.concatenate([seg_l, sc_ref[...], seg_r], axis=-1)
            x = jnp.concatenate(
                [xl_ref[...], xc_ref[...], xr_ref[...]], axis=-1)
            w = x.shape[-1]

            if n_sum == rows:
                comb = jnp.add
            elif n_sum == 0:
                comb = jnp.maximum
            else:
                is_sum = lax.broadcasted_iota(
                    jnp.int32, (rows, 1), 0) < n_sum

                def comb(a, b):
                    return jnp.where(is_sum, a + b, jnp.maximum(a, b))

            fwd = x
            bwd = x
            d = 1
            for _ in range(steps):
                prev_seg = pltpu.roll(seg, shift=d, axis=1)
                fwd = jnp.where(
                    prev_seg == seg,
                    comb(fwd, pltpu.roll(fwd, shift=d, axis=1)), fwd)
                nxt_seg = pltpu.roll(seg, shift=w - d, axis=1)
                bwd = jnp.where(
                    nxt_seg == seg,
                    comb(bwd, pltpu.roll(bwd, shift=w - d, axis=1)),
                    bwd)
                d *= 2

            if n_sum == rows:
                res = fwd + bwd - x
            elif n_sum == 0:
                res = jnp.maximum(fwd, bwd)
            else:
                res = jnp.where(is_sum, fwd + bwd - x,
                                jnp.maximum(fwd, bwd))
            out_ref[...] = res[:, _HALO:_HALO + _TILE]

    return kernel


@functools.partial(jax.jit, static_argnames=("n_sum", "steps", "interpret"))
def _seg_scan_call(x, seg2, n_sum: int, steps: int, interpret: bool):
    rows, npad = x.shape
    grid = npad // _TILE
    hb = npad // _HALO
    ratio = _TILE // _HALO

    def c_map(i):
        return (0, i)

    def l_map(i):
        return (0, jnp.maximum(i * ratio - 1, 0))

    def r_map(i):
        return (0, jnp.minimum(i * ratio + ratio, hb - 1))

    return pl.pallas_call(
        _make_kernel(n_sum, rows, steps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, _HALO), l_map),
            pl.BlockSpec((rows, _TILE), c_map),
            pl.BlockSpec((rows, _HALO), r_map),
            pl.BlockSpec((1, _HALO), l_map),
            pl.BlockSpec((1, _TILE), c_map),
            pl.BlockSpec((1, _HALO), r_map),
        ],
        out_specs=pl.BlockSpec((rows, _TILE), c_map),
        out_shape=jax.ShapeDtypeStruct((rows, npad), x.dtype),
        interpret=interpret,
    )(x, x, x, seg2, seg2, seg2)


def seg_mixed_all_pallas(x, seg_c, n_sum: int, init_max, steps: int,
                         interpret: bool = False):
    """Kernel twin of ops.segments.seg_mixed_all (bit-identical).

    x: (R, N) single-dtype stack; seg_c: (N,) i32 (segment id == first
    member position); rows [:n_sum] summed, the rest maxed. ``steps`` must
    equal the jnp chain's step count (log2 of min(SEG_CAP, N) rounded up).
    ``init_max`` is accepted for signature parity; shifted-in fill values
    only ever sit behind a false same-segment guard, so it never reaches
    the combine (exactly as in the jnp chain).
    """
    del init_max
    rows, n = x.shape
    pad = (-n) % _TILE
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
        seg_c = jnp.pad(seg_c, (0, pad), constant_values=_SENT)
    out = _seg_scan_call(x, seg_c[None].astype(jnp.int32), n_sum, steps,
                         interpret)
    return out[:, :n]
