"""Fused segment (run/rectangle) encode: the whole coalesce re-encode in VMEM.

The coalesce pass re-encodes runs of matching blocks as single regions
(regions.coalesce_segments): refit over the union, factor extraction, the
full bit-crush search, dither, and the integer decode, with every per-region
reduction keyed by a *contiguous segment id* (ops/segments.py). The jnp
composition of those stages streams the compacted (64, cap) pixel buffer
through HBM a dozen times and launches ~200 small XLA ops (doubling-scan
chains, candidate evaluations, lattice ranking) -- measured as most of the
coalesce pass's device time (tools/profiling/xplane_detail.py, round 3).

This kernel runs the entire pipeline in ONE launch, reusing the fixed-grid
kernel's subroutines (_fit_and_factors, _crush_dither_decode) with a
segment reducer in place of the per-block reducer: cross-lane reductions
become doubling scans over contiguous segments, exactly the arithmetic of
ops.segments.seg_mixed_all (same shift order, same combine operand order,
same fwd + bwd - x sum identity), so shifts/endpoints/decode stay
BIT-IDENTICAL to the jnp path (fit_segments + find_shifts_segments +
decode_blocks) -- enforced by tests/test_segment_kernel.py and the real-
device gate (tools/tpu_parity_gate.py). Dither is the one statistical
exception: the kernel uses the TPU PRNG (like encode_fixed) while the jnp
path uses threefry, so bit-parity tests run with dithering off.

Lanes are tiled into center blocks of ``_T`` with a ``SEG_CAP``-lane halo on
each side (the scan's maximum dependency distance), the same scheme as
pallas_kernels/seg_scan.py; out-of-range halos are neutralized by a sentinel
segment id.

Reference context: the region re-encode this accelerates is the batched
analog of limg_encode_find_block_3d_expand + the region refit
(/root/reference/src/limg.cpp:1294-1533, 1752-1761).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.segments import SEG_CAP, SEG_ERR_SHIFT
from .encode_fixed import (
    KernelSpec,
    _RowOps,
    _apply_num_factors,
    _crush_dither_decode,
    _fit_and_factors,
    _pack_dec,
)

_T = 1024           # center lanes per tile (probe: tools/profiling/segenc_probe.py
                    # -- 1.9 ms vs 2.8/3.1 ms at 512/256 on the 4K cap buffer;
                    # halo overhead (2*_H)/(_T+2*_H) shrinks with _T and the
                    # (64, 1536)-lane working set still fits VMEM)
_H = SEG_CAP        # halo lanes per side == max segment span
_SENT = -9          # never equals a real segment id (ids are buffer positions)
_STEPS = SEG_CAP.bit_length() - 1


class _SegReducer(_RowOps):
    """Reduce (P, W) arrays over contiguous segments of lanes.

    Duck-types encode_fixed._Reducer: sum/max/min return (1, W) rows with the
    segment total broadcast to every member lane; ``_combine`` runs the scan
    on stacked candidate rows. ``seg_err_shift`` switches
    _crush_dither_decode into segment error scaling (per-block raw sums,
    >> SEG_ERR_SHIFT before the cross-lane combine, f32 admissibility) --
    mirroring ops.segments.find_shifts_segments exactly.
    """

    chunks = SEG_CAP               # only consulted via seg_err_shift bypass
    seg_err_shift = SEG_ERR_SHIFT

    def __init__(self, seg_row, lanes: int):
        self.seg = seg_row         # (1, W) i32; id == first member position
        self.lanes = lanes

    def _combine(self, rows, op):
        seg = self.seg
        w = self.lanes
        fwd = rows
        bwd = rows
        d = 1
        for _ in range(_STEPS):
            prev_seg = pltpu.roll(seg, shift=d, axis=1)
            fwd = jnp.where(prev_seg == seg,
                            op(fwd, pltpu.roll(fwd, shift=d, axis=1)), fwd)
            nxt_seg = pltpu.roll(seg, shift=w - d, axis=1)
            bwd = jnp.where(nxt_seg == seg,
                            op(bwd, pltpu.roll(bwd, shift=w - d, axis=1)),
                            bwd)
            d *= 2
        # Rolled-in values wrap across the window, but segment ids are buffer
        # positions (strictly ordered) and spans are <= SEG_CAP << window
        # width, so a wrapped id never equals the local id; padding lanes
        # share the sentinel only with other padding lanes.
        if op is jnp.add:
            return fwd + bwd - rows    # prefix + suffix both include x once
        return op(fwd, bwd)            # idempotent ops tolerate the overlap

    def sum(self, x):
        return self._combine(jnp.sum(x, axis=0, keepdims=True), jnp.add)

    def max(self, x):
        return self._combine(jnp.max(x, axis=0, keepdims=True), jnp.maximum)

    def min(self, x):
        return self._combine(jnp.min(x, axis=0, keepdims=True), jnp.minimum)


def _make_segment_kernel(spec: KernelSpec, emit_q: bool, t_lanes: int):
    channels = spec.channels

    def kernel(params_ref, pkl_ref, pkc_ref, pkr_ref, ml_ref, mc_ref, mr_ref,
               sl_ref, sc_ref, sr_ref, *out_refs):
        pid = pl.program_id(0)
        last = pl.num_programs(0) - 1

        # Content-adaptive cost: the buffer is sorted runs-first and the
        # member mask is pre-ANDed with the run selector, so a center
        # window with no masked pixel holds only rejected/padding lanes.
        # Its computed outputs are exactly zero anyway (empty fits project
        # to zero endpoints/factors, the crush finds no admissible shift,
        # the decode of zero endpoints is zero), so skipping the body and
        # zero-filling is value-identical -- which is what makes FULL
        # buffer capacity affordable: empty tiles cost a DMA, not compute.
        has_work = jnp.any(mc_ref[...] > 0)

        @pl.when(jnp.logical_not(has_work))
        def _zero_fill():
            for i, ref in enumerate(out_refs):
                if i == 0 and spec.num_factors < 3:
                    # statically dropped axes store shift 8 even on empty
                    # lanes (encode_fixed forces them after the search)
                    ref[...] = jnp.concatenate([
                        jnp.full((1, t_lanes),
                                 0 if k < spec.num_factors else 8, jnp.int32)
                        for k in range(3)], axis=0)
                else:
                    ref[...] = jnp.zeros(ref.shape, ref.dtype)

        @pl.when(has_work)
        def _body():
            seg_l = jnp.where(pid == 0, _SENT, sl_ref[...])
            seg_r = jnp.where(pid == last, _SENT, sr_ref[...])
            seg = jnp.concatenate([seg_l, sc_ref[...], seg_r], axis=-1)
            packed = jnp.concatenate(
                [pkl_ref[...], pkc_ref[...], pkr_ref[...]], axis=-1)
            mask_i = jnp.concatenate(
                [ml_ref[...], mc_ref[...], mr_ref[...]], axis=-1)
            w = packed.shape[-1]
            red = _SegReducer(seg, w)

            f8, endpoints, count, avg = _fit_and_factors(
                packed, mask_i, channels, red)
            endpoints = _apply_num_factors(endpoints, spec.num_factors)
            shifts, q, dec, _dist, err = _crush_dither_decode(
                packed, mask_i, f8, endpoints, count, spec, params_ref, red,
                emit_pixel_err=True,
            )

            def ctr(x):
                return x[:, _H:_H + t_lanes]

            refs = list(out_refs)
            refs.pop(0)[...] = ctr(jnp.concatenate(shifts, axis=0))
            if emit_q:
                refs.pop(0)[...] = ctr(q[0] + (q[1] << 8) + (q[2] << 16))
            refs.pop(0)[...] = ctr(_pack_dec(dec, channels))
            refs.pop(0)[...] = ctr(jnp.sum(err, axis=0, keepdims=True))
            refs.pop(0)[...] = ctr(jnp.sum(mask_i, axis=0, keepdims=True))
            refs.pop(0)[...] = ctr(count)
            eps_arr = tuple(
                jnp.concatenate(rows, axis=0) for rows in endpoints)
            for e in eps_arr:
                refs.pop(0)[...] = ctr(e)
            refs.pop(0)[...] = ctr(jnp.concatenate(avg, axis=0))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("kspec", "emit_q", "interpret",
                                    "t_lanes"))
def segment_encode_pallas(packed_c, mask_i, seg_c, params, kspec: KernelSpec,
                          emit_q: bool = True, interpret: bool = False,
                          t_lanes: int = _T):
    """Full refit + crush + dither + decode over contiguous segments.

    packed_c/mask_i: (64, N) i32 packed pixels / 0-1 mask of the compacted
    run buffer; seg_c: (N,) i32 segment ids (== first member position,
    members contiguous, span <= SEG_CAP); params: i32[3] [dither seed,
    maxPixelBitCrushError, maxBlockBitCrushError].

    Returns (shifts (3, N) i32, q_packed (64, N) i32 | None,
    dec_packed (64, N) i32, dist_blk (1, N) f32 per-BLOCK weighted error,
    count_blk (1, N) i32, count_mem (1, N) i32 per-segment pixel count,
    6 endpoint rows (ch, N) i32, avg (ch, N) f32). All per-segment values
    are broadcast to every member lane (the contiguous-segment contract of
    ops/segments.py).
    """
    p, n = packed_c.shape
    ch = kspec.channels
    assert t_lanes % _H == 0
    pad = (-n) % t_lanes
    if pad:
        packed_c = jnp.pad(packed_c, ((0, 0), (0, pad)))
        mask_i = jnp.pad(mask_i, ((0, 0), (0, pad)))
        seg_c = jnp.pad(seg_c, (0, pad), constant_values=_SENT)
    npad = n + pad
    grid = npad // t_lanes
    hb = npad // _H
    ratio = t_lanes // _H
    seg2 = seg_c[None].astype(jnp.int32)

    def c_map(i, *_):
        return (0, i)

    def l_map(i, *_):
        return (0, jnp.maximum(i * ratio - 1, 0))

    def r_map(i, *_):
        return (0, jnp.minimum(i * ratio + ratio, hb - 1))

    def halo_specs(rows):
        return [pl.BlockSpec((rows, _H), l_map),
                pl.BlockSpec((rows, t_lanes), c_map),
                pl.BlockSpec((rows, _H), r_map)]

    def out_spec(rows):
        return pl.BlockSpec((rows, t_lanes), c_map)

    q_specs = (out_spec(p),) if emit_q else ()
    q_shapes = ((jax.ShapeDtypeStruct((p, npad), jnp.int32),) if emit_q
                else ())
    outs = pl.pallas_call(
        _make_segment_kernel(kspec, emit_q, t_lanes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(grid,),
            in_specs=halo_specs(p) + halo_specs(p) + halo_specs(1),
            out_specs=(out_spec(3),) + q_specs + (
                out_spec(p), out_spec(1), out_spec(1), out_spec(1),
            ) + tuple([out_spec(ch)] * 7),
        ),
        out_shape=(jax.ShapeDtypeStruct((3, npad), jnp.int32),) + q_shapes + (
            jax.ShapeDtypeStruct((p, npad), jnp.int32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
        ) + tuple(
            jax.ShapeDtypeStruct((ch, npad), jnp.int32) for _ in range(6)
        ) + (jax.ShapeDtypeStruct((ch, npad), jnp.float32),),
        interpret=interpret or jax.default_backend() == "cpu",
    )(params, packed_c, packed_c, packed_c, mask_i, mask_i, mask_i,
      seg2, seg2, seg2)
    outs = tuple(o[:, :n] for o in outs)
    if not emit_q:
        outs = outs[:1] + (None,) + outs[1:]
    return outs
