"""Natural-layout (row-major) fused merged encode: zero relayouts.

The Morton pipeline (encode_merged.py) buys contiguous quadtree groups by
permuting blocks into Z-order lanes -- at the price of two big relayout
copies on the way in (blockify + Morton embed), two on the way out
(restore + unblockify), and ~40 small layout copies around the coalesce
pass (~6 ms of a 15 ms 4K merged encode, STATUS item 11-12 xplane
breakdowns). This module removes the relayouts entirely by keeping the
kernels in the image's OWN layout:

- the input is the (H', W') row-major packed-word image -- a free reshape
  of the (by, 8, bx, 8) host byte view (layout.host_block_view), no device
  relayout at all;
- a kernel tile is (64, 1024) pixels = 8 block-rows x 128 block-cols; a
  per-block "row" is an (8, T_W) array holding 8 block-rows in sublanes
  with each block's value replicated over its 8 lanes (probe P1-P3,
  tools/profiling/natural_layout_probe.py: the fit-shaped skeleton ran
  0.43 ms vs 6.25 ms for Morton fit + relayouts on a 4K);
- quadtree group reductions are lane butterflies (x, across block columns)
  plus sublane-roll butterflies (y, across block rows) -- levels <= 4 fit
  one tile (a level-3 group = 8x8 blocks = the full tile);
- per-block row outputs are compacted in-VMEM to (rows, 8, 128) blocks by
  a one-hot selection dot on the MXU (Mosaic rejects cross-lane gathers;
  Precision.HIGHEST passes every normal f32 through BIT-EXACTLY --
  verified on device by tools/profiling/onehot_exact_probe.py; -0.0 and
  denormals flush, which no compacted row can carry: they are non-negative
  error sums, int-valued endpoints, or small counters);
- the decoded image and the crushed-factor plane are written back natural
  (H', W'), so the driver's morton_restore / unblockify passes disappear
  and per-block rows come out in ROW-MAJOR block order -- the downstream
  coalesce / serializer code consumes them without any `to_orig` gather.

The fit/crush math is shared with the fixed kernel via the layout-generic
reducer interface (encode_fixed._RowOps): semantics and reference
citations live there. Reduction ORDER differs from both the Morton and the
dense jnp paths (sublane+lane trees), so merged parity stays gated on
owner maps / PSNR / bpp plus compiled==interpret bit-equality
(tools/tpu_parity_gate.py), exactly like the Morton kernels before it.

Reference: limg_blocked_encode3d_test (src/limg.cpp:2329-2453) is the
serial original of the merged driver this feeds.

STATUS (deliberate keep, round 5): measured on the real chip this layout
LOST to Morton -- natural merge-only 20.6 ms vs morton 9.5 on a 4K -- for
two structural reasons recorded in STATUS.md round-4 item 3: (a) per-block
row math is 8x-replicated in natural layout and un-replicating via MXU
compaction dots is launch-bound; (b) round 3's glue batch had already cut
Morton's relayout cost below 1 ms, the very cost this design removes. It
stays in the tree as a TESTED, GATED alternative (fused_layout="natural",
3 compiled-device gate cases + tests/test_natural.py) rather than a probe
because (1) it is the executable form of the negative result -- the
measurement can be reproduced against HEAD at any time, (2) its layout
pressure created the shared _RowOps reducer interface that the fixed,
Morton, segment, and natural kernels now all use, and (3) it is the only
path exercising sublane-roll butterflies and the bit-exact MXU one-hot
compaction, both likely ingredients of future kernels. The maintenance
bill is known: _RowOps changes pay a three-layout test pass (the round-4
refactor silently cost ~1.9 ms until re-measured, STATUS item 4a).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EncodeConfig, static_block_bits
from .encode_fixed import (
    KernelSpec,
    _RowOps,
    _apply_num_factors,
    _crush_dither_decode,
    _fit_and_factors,
    _pack_dec,
)
from .encode_merged import MATCH_REASON_BITS, _match_rows

_T_W = 512           # pixel lanes per tile = 64 block columns
_T_H = 64            # pixel sublanes per tile = 8 block rows
_C_W = 128           # compact row block width (Mosaic lane minimum); a
                     # (64, 512) tile holds 64 blocks per row, so compact
                     # columns 64..127 are exact zeros (one-hot dot with
                     # zero selection columns) and the driver drops them.
                     # (64, 1024) tiles with a fully-used 128-wide compact
                     # blew the ~16 MB VMEM scope: the crush kernel's
                     # scoped stack measured 18.7 MB.
MAX_NATURAL_LEVELS = 4   # level-3 groups (8x8 blocks) fill one tile's rows


def _lane_butterfly(rows, d: int, op, lanes: int, lane_iota):
    """Combine each lane with its partner at lane ^ d (aligned groups)."""
    up = pltpu.roll(rows, shift=d, axis=1)
    down = pltpu.roll(rows, shift=lanes - d, axis=1)
    return op(rows, jnp.where((lane_iota & d) != 0, up, down))


def _sub_butterfly(rows, d: int, op, sub_iota):
    """Combine each sublane with its partner at (sublane ^ d) within its
    8-sublane row group; d < 8, so full-array rolls never cross a group."""
    h = rows.shape[0]
    up = pltpu.roll(rows, shift=d, axis=0)
    down = pltpu.roll(rows, shift=h - d, axis=0)
    return op(rows, jnp.where((sub_iota & d) != 0, up, down))


def _sub_iota(h: int):
    return lax.broadcasted_iota(jnp.int32, (h, 1), 0) & 7


class _NatRowOps(_RowOps):
    """Row helpers for the natural layout: R = 8, block values replicated
    over each block's 8 lanes. See _RowOps for the contract."""

    R = 8

    def __init__(self, lanes: int):
        self.lanes = lanes
        self.lane = lax.broadcasted_iota(jnp.int32, (1, lanes), 1)

    def _block_lanes(self, s, op):
        for d in (1, 2, 4):
            s = _lane_butterfly(s, d, op, self.lanes, self.lane)
        return s

    def fold_sum(self, x):
        th = x.shape[0]
        s = jnp.sum(x.reshape(th // 8, 8, self.lanes), axis=1)
        return self._block_lanes(s, jnp.add)

    def fold_max(self, x):
        th = x.shape[0]
        s = jnp.max(x.reshape(th // 8, 8, self.lanes), axis=1)
        return self._block_lanes(s, jnp.maximum)

    def fold_min(self, x):
        th = x.shape[0]
        s = jnp.min(x.reshape(th // 8, 8, self.lanes), axis=1)
        return self._block_lanes(s, jnp.minimum)

    def up(self, row):
        """(8, T) block row -> (64, T) pixel broadcast (sublane repeat)."""
        return jnp.broadcast_to(
            row[:, None, :], (8, 8, self.lanes)
        ).reshape(64, self.lanes)


class NatGroupReducer(_NatRowOps):
    """Level-``lvl`` quadtree reductions: aligned 2^lvl x 2^lvl block
    squares, combined with lane (x) + sublane (y) butterflies; results
    replicated to every member block's lanes/sublanes."""

    def __init__(self, lvl: int, lanes: int):
        super().__init__(lanes)
        self.lvl = lvl
        self.chunks = 4 ** lvl   # blocks per region (err-scale decision)

    def _combine(self, rows, op):
        sub = _sub_iota(rows.shape[0])
        for b in range(self.lvl):
            rows = _lane_butterfly(rows, 8 << b, op, self.lanes, self.lane)
            rows = _sub_butterfly(rows, 1 << b, op, sub)
        return rows

    def sum(self, x):
        return self._combine(self.fold_sum(x), jnp.add)

    def max(self, x):
        return self._combine(self.fold_max(x), jnp.maximum)

    def min(self, x):
        return self._combine(self.fold_min(x), jnp.minimum)


class NatOwnerReducer(_NatRowOps):
    """Per-block reductions over each block's OWN owner-level group
    (natural twin of encode_merged._OwnerReducer)."""

    def __init__(self, owner_row, levels: int, lanes: int):
        super().__init__(lanes)
        self.owner = owner_row                  # (8, T) replicated
        self.levels = levels
        self.chunks = 4 ** (levels - 1)

    def _combine(self, rows, op):
        n = rows.shape[0] // 8
        own = self.owner if n == 1 else self.tile(self.owner, n)
        sub = _sub_iota(rows.shape[0])
        acc = rows
        out = rows
        for lvl in range(1, self.levels):
            b = lvl - 1
            acc = _lane_butterfly(acc, 8 << b, op, self.lanes, self.lane)
            acc = _sub_butterfly(acc, 1 << b, op, sub)
            out = jnp.where(own == lvl, acc, out)
        return out

    def sum(self, x):
        return self._combine(self.fold_sum(x), jnp.add)

    def max(self, x):
        return self._combine(self.fold_max(x), jnp.maximum)

    def min(self, x):
        return self._combine(self.fold_min(x), jnp.minimum)


def _compact(stack, lanes: int):
    """(h, T) f32 replicated rows -> (h, _C_W): one value per block.

    One-hot column-selection dot; Precision.HIGHEST makes the MXU pass
    normal f32 through exactly (onehot_exact_probe.py). Compact columns
    >= lanes//8 (the tile holds lanes//8 blocks per row) select nothing
    and are exact zeros."""
    row_i = lax.broadcasted_iota(jnp.int32, (lanes, _C_W), 0)
    col_i = lax.broadcasted_iota(jnp.int32, (lanes, _C_W), 1)
    sel = ((row_i == 8 * col_i) & (col_i < lanes // 8)).astype(jnp.float32)
    return jax.lax.dot_general(
        stack, sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)


def _expand(crows, lanes: int):
    """(h, _C_W) compact rows -> (h, T) lane-replicated (inverse of
    _compact): selection dot with E[c, j] = (c == j // 8); only compact
    columns < lanes//8 are addressed."""
    e = (lax.broadcasted_iota(jnp.int32, (_C_W, lanes), 0)
         == lax.broadcasted_iota(jnp.int32, (_C_W, lanes), 1) // 8
         ).astype(jnp.float32)
    return jax.lax.dot_general(
        crows, e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)


def _tile_mask(h: int, w: int, shape, iy, ix):
    """Validity mask of one natural tile from its pixel offsets."""
    row = iy + lax.broadcasted_iota(jnp.int32, shape, 0)
    col = ix + lax.broadcasted_iota(jnp.int32, shape, 1)
    return ((row < h) & (col < w)).astype(jnp.int32)


def rows_to_blocks(rows, by: int, bx: int):
    """(r, BYP, GX*_C_W) kernel row plane -> (r, by*bx) flat per-block rows
    in row-major block order: drop each tile group's zero upper half
    (compact cols >= _T_W//8) and the grid padding."""
    r, byp, wc = rows.shape
    gx = wc // _C_W
    bpt = _T_W // 8        # real block columns per tile group
    v = rows.reshape(r, byp, gx, _C_W)[..., :bpt].reshape(r, byp, gx * bpt)
    return jax.lax.optimization_barrier(
        v[:, :by, :bx].reshape(r, by * bx))


def nat_blockify(plane2d, by: int, bx: int):
    """(by*8, bx*8) pixel plane -> (64, NB) block columns, row-major block
    order (plain blockify transpose, no Morton embed). Fenced: unfenced
    XLA splits the relayout into multiple materialized passes
    (tools/profiling/blockify_probe.py)."""
    x = jax.lax.optimization_barrier(plane2d.reshape(by, 8, bx, 8))
    t = x.transpose(1, 3, 0, 2).reshape(64, by * bx)
    return jax.lax.optimization_barrier(t)


def nat_unblockify(rows64, by: int, bx: int):
    """(64, NB) row-major block columns -> (by, 8, bx, 8) word view (its
    row-major bytes ARE the (by*8, bx*8) image; host reshape/crop is
    free). C=1-specialized + fenced like morton_unblockify."""
    x = jax.lax.optimization_barrier(rows64)
    t = x.reshape(8, 8, by, bx).transpose(2, 0, 3, 1)
    return jax.lax.optimization_barrier(t)


def natural_mask_plane(h: int, w: int, by: int, bx: int):
    """(64, NB) i32 validity mask in row-major block order, built
    ELEMENTWISE (one fused iota/compare kernel -- no relayout and no
    baked-in constant)."""
    nb = by * bx
    p = jax.lax.broadcasted_iota(jnp.int32, (64, nb), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (64, nb), 1)
    row = (b // bx) * 8 + (p >> 3)
    col = (b % bx) * 8 + (p & 7)
    return ((row < h) & (col < w)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Fit + in-kernel match/owner-select kernel
# ---------------------------------------------------------------------------

def fit_rows_layout(channels: int, levels: int):
    """Row indices of the fit kernel's stacked f32 row-plane output:
    returns (names_in_order, total_rows). The owner-crush kernel consumes
    [owner] + eps slices of the same plane without conversion."""
    names = (["cnt0"]
             + [f"eps{k}" for k in range(6)]       # ch rows each
             + ["avg", "owner", "stats_bits"]
             + [f"reason{l}" for l in range(1, levels)])
    total = 1 + 6 * channels + channels + 2 + (levels - 1)
    return names, total


def _make_nat_fit_kernel(spec: KernelSpec, levels: int, hw: tuple):
    channels = spec.channels

    def kernel(params_ref, packed_ref, f8_ref, rows_ref):
        packed = packed_ref[...]
        th, tw = packed.shape
        iy = pl.program_id(0) * th
        ix = pl.program_id(1) * tw
        mask_i = _tile_mask(hw[0], hw[1], packed.shape, iy, ix)
        lane = lax.broadcasted_iota(jnp.int32, (1, tw), 1)
        sub8 = _sub_iota(8)

        owner = jnp.zeros((8, tw), jnp.int32)
        alive = jnp.ones((8, tw), jnp.int32)
        reason_rows = []
        count_lvls = []
        f8_lvls, eps_lvls = [], []
        prev = None
        for lvl in range(levels):
            red = NatGroupReducer(lvl, tw)
            f8, endpoints, count, avg = _fit_and_factors(
                packed, mask_i, channels, red
            )
            endpoints = _apply_num_factors(endpoints, spec.num_factors)
            eps_arr = tuple(jnp.concatenate(rows, axis=0)
                            for rows in endpoints)         # 6 x (8ch, T)
            avg_arr = jnp.concatenate(avg, axis=0)         # (8ch, T) f32
            f8_packed = f8[0] + (f8[1] << 8) + (f8[2] << 16)
            f8_lvls.append(f8_packed)
            eps_lvls.append(eps_arr + (avg_arr,))
            count_lvls.append(count)

            if lvl >= 1:
                # merge decision: each block compares its level-(lvl-1)
                # region against the group's top-left child, broadcast
                # across the group by one lane + one sublane select-roll;
                # empty (edge padding) children auto-match like the Morton
                # and jnp drivers
                c = 1 << (lvl - 1)
                p_eps, p_avg, p_count = prev

                def b0(row, c=c):
                    sub = _sub_iota(row.shape[0])
                    row = jnp.where(
                        (lane & (8 * c)) != 0,
                        pltpu.roll(row, shift=8 * c, axis=1), row)
                    return jnp.where(
                        (sub & c) != 0,
                        pltpu.roll(row, shift=c, axis=0), row)

                c0_eps = tuple(b0(e) for e in p_eps)
                c0_avg = b0(p_avg)
                c0_count = b0(p_count)
                m, reason = _match_rows(
                    p_avg, p_eps, c0_avg, c0_eps, channels, R=8)
                is_child0 = ((sub8 & c) == 0) & (((lane >> 3) & c) == 0)
                ok = (is_child0 | m | (p_count <= 0) | (c0_count <= 0))
                acc = alive & ok.astype(jnp.int32)
                racc = jnp.where(is_child0, 0, reason)
                for b in range(lvl):
                    acc = _lane_butterfly(acc, 8 << b, jnp.bitwise_and,
                                          tw, lane)
                    acc = _sub_butterfly(acc, 1 << b, jnp.bitwise_and, sub8)
                    racc = _lane_butterfly(racc, 8 << b, jnp.bitwise_or,
                                           tw, lane)
                    racc = _sub_butterfly(racc, 1 << b, jnp.bitwise_or, sub8)
                alive = acc
                owner = jnp.where(alive > 0, lvl, owner)
                reason_rows.append(racc)
            prev = (eps_arr, avg_arr, count)

        # owner select: per-level planes/rows never leave VMEM
        f8_sel = f8_lvls[0]
        eps_sel = list(eps_lvls[0])               # 6 eps + avg
        red0 = NatGroupReducer(0, tw)
        for lvl in range(1, levels):
            sel = owner == lvl
            sel_px = red0.up(sel)
            f8_sel = jnp.where(sel_px, f8_lvls[lvl], f8_sel)
            n = channels
            sel_n = red0.tile(sel, n)
            eps_sel = [jnp.where(sel_n, e, o)
                       for e, o in zip(eps_lvls[lvl], eps_sel)]
        f8_ref[...] = f8_sel

        # stats rows (bit l of stats_bits = nonempty level-l leader block
        # whose group merged to >= l); reasons only at nonempty leaders
        stats_bits = jnp.zeros((8, tw), jnp.int32)
        lead_masks = []
        for lvl in range(levels):
            g1 = (1 << lvl) - 1
            is_lead = ((sub8 & g1) == 0) & (((lane >> 3) & g1) == 0)
            lead_masks.append(is_lead)
            hit = is_lead & (owner >= lvl) & (count_lvls[lvl] > 0)
            stats_bits = stats_bits | (hit.astype(jnp.int32) << lvl)

        rows_out = [count_lvls[0]] + list(eps_sel[:6]) + [eps_sel[6]] + [
            owner, stats_bits]
        for i, rr in enumerate(reason_rows):
            lvl = i + 1
            keep = lead_masks[lvl] & (count_lvls[lvl] > 0)
            rows_out.append(jnp.where(keep, rr, 0))

        stack = jnp.concatenate(
            [r.astype(jnp.float32) for r in rows_out], axis=0)
        compact = _compact(stack, tw)              # (r_tot*8, _C_W)
        r_tot = compact.shape[0] // 8
        rows_ref[...] = compact.reshape(r_tot, 8, _C_W)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("kspec", "levels", "interpret", "hw"))
def fit_levels_natural(packed2d, params, kspec: KernelSpec, levels: int,
                       interpret: bool, hw: tuple):
    """All-levels fit + in-kernel match/owner-select on the natural layout.

    packed2d: (by*8, bx*8) int32 packed-word image (the free reshape of the
    host 4-D block view); ``hw`` = true (h, w) for the in-kernel validity
    mask. Returns (f8_sel (by*8, bx*8) i32 owner-selected factor plane,
    rows (r_tot, BYP, GX*_C_W) f32 compact per-block rows in the
    fit_rows_layout order, in the padded tile geometry: BYP = ceil(by/8)*8
    block rows; each tile's _C_W-wide compact group carries its
    _T_W//8 = 64 block columns in lanes [0, 64) and exact zeros above
    (``rows_to_blocks`` extracts the (r, by, bx) view).
    """
    hp, wp = packed2d.shape
    gy = -(-hp // _T_H)
    gx = -(-wp // _T_W)
    byp = gy * 8
    _, r_tot = fit_rows_layout(kspec.channels, levels)

    f8_sel, rows = pl.pallas_call(
        _make_nat_fit_kernel(kspec, levels, hw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(gy, gx),
            in_specs=[pl.BlockSpec((_T_H, _T_W), lambda i, j, *_: (i, j))],
            out_specs=(
                pl.BlockSpec((_T_H, _T_W), lambda i, j, *_: (i, j)),
                pl.BlockSpec((r_tot, 8, _C_W), lambda i, j, *_: (0, i, j)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((r_tot, byp, gx * _C_W), jnp.float32),
        ),
        interpret=interpret,
    )(params, packed2d)
    return f8_sel, rows


# ---------------------------------------------------------------------------
# Owner-level crush kernel
# ---------------------------------------------------------------------------

def _make_nat_crush_kernel(spec: KernelSpec, levels: int, emit_q: bool,
                           hw: tuple):
    channels = spec.channels

    def kernel(params_ref, packed_ref, f8_ref, rows_ref, *out_refs):
        outs = list(out_refs)
        q_ref = outs.pop(0) if emit_q else None
        dec_ref, orow_ref = outs
        packed = packed_ref[...]
        th, tw = packed.shape
        iy = pl.program_id(0) * th
        ix = pl.program_id(1) * tw
        mask_i = _tile_mask(hw[0], hw[1], packed.shape, iy, ix)

        # expand compact input rows (owner + 6*ch endpoints) to
        # lane-replicated block rows; values are exact ints in f32
        rin = rows_ref[...]
        r_in = rin.shape[0]
        rep = _expand(rin.reshape(r_in * 8, _C_W), tw)

        def rows_at(start, n):
            return rep[8 * start:8 * (start + n)]

        owner = rows_at(0, 1).astype(jnp.int32)
        eps_rows = [rows_at(1 + channels * k, channels).astype(jnp.int32)
                    for k in range(6)]

        red = NatOwnerReducer(owner, levels, tw)
        red.dither_pid = (pl.program_id(0) * pl.num_programs(1)
                          + pl.program_id(1))
        f8_packed = f8_ref[...]
        f8 = [(f8_packed >> (8 * k)) & 0xFF for k in range(3)]
        endpoints = tuple(
            [e[8 * c:8 * (c + 1), :] for c in range(channels)]
            for e in eps_rows
        )
        count = red.sum(mask_i)
        shifts, q, dec, dist, err = _crush_dither_decode(
            packed, mask_i, f8, endpoints, count, spec, params_ref, red,
            emit_pixel_err=True,
        )
        if emit_q:
            q_ref[...] = q[0] + (q[1] << 8) + (q[2] << 16)
        dec_ref[...] = _pack_dec(dec, channels)

        distb = red.fold_sum(err)
        cnt_blk = red.fold_sum(mask_i.astype(jnp.float32))
        s_eff = [jnp.minimum(s, 8) for s in shifts]
        fac_bits = sum((8 - s) * count for s in s_eff)
        block_bits = static_block_bits(channels) + fac_bits
        bpp = jnp.minimum(
            0xFF, (block_bits + count // 2) // jnp.maximum(count, 1)
        ) * (cnt_blk > 0)

        rows_out = [r.astype(jnp.float32) for r in shifts] + [
            dist, distb, bpp.astype(jnp.float32)]
        stack = jnp.concatenate(rows_out, axis=0)
        compact = _compact(stack, tw)
        orow_ref[...] = compact.reshape(6, 8, _C_W)

    return kernel


@functools.partial(jax.jit, static_argnames=("kspec", "levels", "interpret",
                                              "emit_q", "hw"))
def owner_crush_natural(packed2d, f8_sel, rows_in, params, kspec: KernelSpec,
                        levels: int, interpret: bool, hw: tuple,
                        emit_q: bool = True):
    """Crush + dither + decode once per pixel at each block's owner level,
    natural layout.

    rows_in: (1 + 6*ch, BYP, GX*_C_W) f32 -- the [owner] + eps slices of
    fit_levels_natural's row plane, consumed WITHOUT conversion or
    relayout (same padded tile geometry). Returns (q (H', W') i32 | None,
    dec (H', W') i32, out_rows (6, BYP, GX*_C_W) f32 = [shift_a, shift_b,
    shift_c, dist(region), dist_block, bpp_block]).
    """
    hp, wp = packed2d.shape
    gy = -(-hp // _T_H)
    gx = -(-wp // _T_W)
    byp = gy * 8
    r_in = rows_in.shape[0]

    q_specs = ((pl.BlockSpec((_T_H, _T_W), lambda i, j, *_: (i, j)),)
               if emit_q else ())
    q_shapes = ((jax.ShapeDtypeStruct((hp, wp), jnp.int32),)
                if emit_q else ())
    outs = pl.pallas_call(
        _make_nat_crush_kernel(kspec, levels, emit_q, hw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(gy, gx),
            in_specs=[
                pl.BlockSpec((_T_H, _T_W), lambda i, j, *_: (i, j)),
                pl.BlockSpec((_T_H, _T_W), lambda i, j, *_: (i, j)),
                pl.BlockSpec((r_in, 8, _C_W), lambda i, j, *_: (0, i, j)),
            ],
            out_specs=q_specs + (
                pl.BlockSpec((_T_H, _T_W), lambda i, j, *_: (i, j)),
                pl.BlockSpec((6, 8, _C_W), lambda i, j, *_: (0, i, j)),
            ),
        ),
        out_shape=q_shapes + (
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((6, byp, gx * _C_W), jnp.float32),
        ),
        interpret=interpret,
    )(params, packed2d, f8_sel, rows_in)
    if emit_q:
        q, dec, orows = outs
    else:
        q, (dec, orows) = None, outs
    return q, dec, orows
