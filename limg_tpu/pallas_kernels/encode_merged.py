"""Fused merged (quadtree) encode: crush every pixel once, not once per level.

The dense merged path (regions.encode_levels) runs the full fused kernel at
every quadtree level, so a 3-level encode pays 3x the fit AND 3x the crush
(the expensive part) for pixels that will be owned by exactly one level.
This module restructures the merged encode around a *Morton (Z-order) lane
layout*: level-0 blocks are permuted so that every aligned 2^L-square of
blocks (the quadtree's level-L regions) occupies a contiguous, aligned group
of 4^L lanes. That single property makes the whole quadtree static:

- **fit at every level in one kernel**: a level-L fit is the level-0 fit
  with each lane-row reduction extended across its aligned 4^L-lane group.
  Group reductions are log2(4^L) butterfly steps (roll + select + combine),
  which also broadcast the result to every lane of the group - so per-region
  rows stay per-lane rows and all downstream code is oblivious to levels.
- **merge decision in plain jnp**: the kernel emits per-level endpoint rows;
  region r's row sits at lane 4^L * r, and the four children of a parent are
  *contiguous* entries at the previous level, so the reference's similarity
  predicate (ops/match.py, from src/limg.cpp:1137-1275) runs on strided
  slices - no gathers, no index tables.
- **crush once, at the owner level**: a second kernel gets the per-block
  owner level plus the owner-selected factors/endpoints (selected lane-wise
  in jnp - the fit already broadcast region rows to every member lane) and
  runs the standard crush/dither/decode exactly once per pixel. Per-region
  admissibility reductions compute the butterfly hierarchy (block -> 4 -> 16
  -> ... lanes) and select each lane's own owner level from it.

Net cost: ~L fit passes + ONE crush pass over the image, vs L full encodes
in the dense path; measured ~2.5x faster end to end at 3 levels on a v5e
chip. Semantics match the dense path up to float reduction order (the
group-tree sums associate differently than one flat jnp.sum), so parity is
gated on owner maps / PSNR / bpp, not bitwise equality.

Reference: limg_blocked_encode3d_test (src/limg.cpp:2329-2453) is the serial
original; the quadtree reformulation is documented in regions.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EncodeConfig
from .encode_fixed import (
    KernelSpec,
    _apply_num_factors,
    _crush_dither_decode,
    _fit_and_factors,
    _pack_dec,
)

# lane tile: must be a multiple of the largest group (4^(levels-1)) and 128
_T_LANES = 256
MAX_FUSED_LEVELS = 4  # group of 4^3 = 64 lanes still divides _T_LANES


def morton_perm(blocks_y: int, blocks_x: int, levels: int):
    """Morton permutation of a block grid.

    Returns (perm (NBP,) int64, blocks_y_padded, blocks_x_padded) where
    ``perm[m]`` is the original flat block index sitting at Morton position
    ``m``, or -1 for grid padding. The grid is padded to multiples of
    g = 2^(levels-1); Morton position = row-major supercell index * g^2 +
    bit-interleave(y % g, x % g) with x in the even bits, so the four
    children of any parent appear in the reference's (0,0),(0,1),(1,0),(1,1)
    order and every aligned 2^l square (l < levels) is contiguous.
    """
    g = 1 << (levels - 1)
    byp = -(-blocks_y // g) * g
    bxp = -(-blocks_x // g) * g
    yy, xx = np.mgrid[0:byp, 0:bxp]
    sc = (yy >> (levels - 1)) * (bxp // g) + (xx >> (levels - 1))
    local = np.zeros_like(yy)
    for b in range(levels - 1):
        local |= ((xx >> b) & 1) << (2 * b)
        local |= ((yy >> b) & 1) << (2 * b + 1)
    key = sc * (g * g) + local
    orig = np.where((yy < blocks_y) & (xx < blocks_x), yy * blocks_x + xx, -1)
    perm = np.empty(byp * bxp, np.int64)
    perm[key.ravel()] = orig.ravel()
    return perm, byp, bxp


def _butterfly(row, d: int, op, lanes: int, lane_iota):
    """One butterfly step: combine each lane with its partner at lane^d.

    Lanes whose d-bit is set receive from lane-d (roll +d), others from
    lane+d (roll lanes-d). Within aligned power-of-two groups the partner
    never crosses the group (or tile) boundary.
    """
    up = pltpu.roll(row, shift=d, axis=1)
    down = pltpu.roll(row, shift=lanes - d, axis=1)
    return op(row, jnp.where((lane_iota & d) != 0, up, down))


class _GroupReducer:
    """Reduce (P, T) arrays over aligned groups of ``group`` lanes.

    Duck-types pallas_kernels.encode_fixed._Reducer: sum/max/min return
    (1, T) rows with the group result broadcast to every member lane.
    ``chunks`` reports the lanes-per-region so _crush_dither_decode sizes
    its block-error accumulator scale correctly.
    """

    def __init__(self, group: int, lanes: int):
        self.group = group
        self.chunks = group
        self.lanes = lanes
        self.lane = lax.broadcasted_iota(jnp.int32, (1, lanes), 1)

    def _combine(self, row, op):
        d = 1
        while d < self.group:
            row = _butterfly(row, d, op, self.lanes, self.lane)
            d *= 2
        return row

    def sum(self, x):
        return self._combine(jnp.sum(x, axis=0, keepdims=True), jnp.add)

    def max(self, x):
        return self._combine(jnp.max(x, axis=0, keepdims=True), jnp.maximum)

    def min(self, x):
        return self._combine(jnp.min(x, axis=0, keepdims=True), jnp.minimum)


class _OwnerReducer:
    """Per-lane reductions over each lane's OWN owner-level group.

    Computes the butterfly hierarchy once (groups of 4, 16, ...) and
    selects, per lane, the level matching ``owner`` (0 = the block itself).
    """

    def __init__(self, owner_row, levels: int):
        self.owner = owner_row
        self.levels = levels
        self.chunks = 4 ** (levels - 1)   # worst-case lanes per region
        self.lanes = owner_row.shape[-1]
        self.lane = lax.broadcasted_iota(jnp.int32, (1, self.lanes), 1)

    def _combine(self, row, op):
        acc = row
        out = row
        d = 1
        for lvl in range(1, self.levels):
            while d < 4 ** lvl:
                acc = _butterfly(acc, d, op, self.lanes, self.lane)
                d *= 2
            out = jnp.where(self.owner == lvl, acc, out)
        return out

    def sum(self, x):
        return self._combine(jnp.sum(x, axis=0, keepdims=True), jnp.add)

    def max(self, x):
        return self._combine(jnp.max(x, axis=0, keepdims=True), jnp.maximum)

    def min(self, x):
        return self._combine(jnp.min(x, axis=0, keepdims=True), jnp.minimum)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _make_fit_levels_kernel(spec: KernelSpec, levels: int):
    channels = spec.channels

    def kernel(params_ref, packed_ref, mask_ref, *out_refs):
        packed = packed_ref[...]
        mask_i = mask_ref[...]
        refs = list(out_refs)
        for lvl in range(levels):
            red = _GroupReducer(4 ** lvl, packed.shape[-1])
            f8, endpoints, count, avg = _fit_and_factors(
                packed, mask_i, channels, red
            )
            endpoints = _apply_num_factors(endpoints, spec.num_factors)
            f8_ref, *rest = refs[:9]
            f8_ref[...] = f8[0] + (f8[1] << 8) + (f8[2] << 16)
            for ref, rows in zip(rest[:6], endpoints):
                ref[...] = jnp.concatenate(rows, axis=0)       # (ch, T)
            rest[6][...] = jnp.concatenate(avg, axis=0)        # (ch, T) f32
            rest[7][...] = count                               # (1, T) i32
            refs = refs[9:]

    return kernel


def _make_owner_crush_kernel(spec: KernelSpec, levels: int):
    channels = spec.channels

    def kernel(params_ref, packed_ref, mask_ref, owner_ref, f8_ref, *rest):
        ep_in = rest[:6]
        shifts_ref, q_ref, dec_ref, dist_ref = rest[6:]
        packed = packed_ref[...]
        mask_i = mask_ref[...]
        owner = owner_ref[...]
        red = _OwnerReducer(owner, levels)
        f8_packed = f8_ref[...]
        f8 = [(f8_packed >> (8 * k)) & 0xFF for k in range(3)]
        endpoints = tuple(
            [ref[c:c + 1, :] for c in range(channels)]
            for ref in (e[...] for e in ep_in)
        )
        count = red.sum(mask_i)
        shifts, q, dec, dist = _crush_dither_decode(
            packed, mask_i, f8, endpoints, count, spec, params_ref, red
        )
        shifts_ref[...] = jnp.concatenate(shifts, axis=0)
        q_ref[...] = q[0] + (q[1] << 8) + (q[2] << 16)
        dec_ref[...] = _pack_dec(dec, channels)
        dist_ref[...] = dist

    return kernel


# ---------------------------------------------------------------------------
# Drivers
# ---------------------------------------------------------------------------

def _row_spec(rows):
    return pl.BlockSpec((rows, _T_LANES), lambda i, *_: (0, i))


def _pad_lanes(x, nbp):
    pad = (-x.shape[-1]) % _T_LANES
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


@functools.partial(jax.jit, static_argnames=("kspec", "levels", "interpret"))
def fit_levels_pallas(packed_px, mask_i, params, kspec: KernelSpec,
                      levels: int, interpret: bool):
    """All-levels fit over Morton-ordered blocks.

    packed_px: (64, NBP) int32 Morton-ordered packed pixels (NBP a multiple
    of 4^(levels-1)); mask_i: (64, NBP) int32. Returns a list of per-level
    dicts {f8 (64, NBP) i32, endpoints tuple of 6 (ch, NBP) i32, avg
    (ch, NBP) f32, count (1, NBP) i32}; region rows are broadcast across
    their member lanes.
    """
    p, nb = packed_px.shape
    packed_px = _pad_lanes(packed_px, nb)
    mask_i = _pad_lanes(mask_i, nb)
    nbp = packed_px.shape[-1]
    grid = nbp // _T_LANES
    ch = kspec.channels

    out_shapes, out_specs = [], []
    for _ in range(levels):
        out_shapes += [jax.ShapeDtypeStruct((p, nbp), jnp.int32)]
        out_specs += [_row_spec(p)]
        out_shapes += [jax.ShapeDtypeStruct((ch, nbp), jnp.int32)] * 6
        out_specs += [_row_spec(ch)] * 6
        out_shapes += [jax.ShapeDtypeStruct((ch, nbp), jnp.float32)]
        out_specs += [_row_spec(ch)]
        out_shapes += [jax.ShapeDtypeStruct((1, nbp), jnp.int32)]
        out_specs += [_row_spec(1)]

    outs = pl.pallas_call(
        _make_fit_levels_kernel(kspec, levels),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(grid,),
            in_specs=[_row_spec(p), _row_spec(p)],
            out_specs=tuple(out_specs),
        ),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(params, packed_px, mask_i)

    result = []
    for lvl in range(levels):
        f8, *rest = outs[9 * lvl:9 * (lvl + 1)]
        result.append(dict(
            f8=f8[:, :nb],
            endpoints=tuple(r[:, :nb] for r in rest[:6]),
            avg=rest[6][:, :nb],
            count=rest[7][:, :nb],
        ))
    return result


@functools.partial(jax.jit, static_argnames=("kspec", "levels", "interpret"))
def owner_crush_pallas(packed_px, mask_i, owner, f8_sel, eps_sel, params,
                       kspec: KernelSpec, levels: int, interpret: bool):
    """Crush + dither + decode once per pixel at each block's owner level.

    owner: (1, NBP) i32 in [0, levels); f8_sel / eps_sel: the owner region's
    packed factors / endpoint rows per lane. Returns (shifts (3, NBP),
    q_packed, dec_packed (64, NBP), dist (1, NBP) broadcast per region).
    """
    p, nb = packed_px.shape
    packed_px = _pad_lanes(packed_px, nb)
    mask_i = _pad_lanes(mask_i, nb)
    owner = _pad_lanes(owner, nb)
    f8_sel = _pad_lanes(f8_sel, nb)
    eps_sel = [_pad_lanes(e, nb) for e in eps_sel]
    nbp = packed_px.shape[-1]
    grid = nbp // _T_LANES
    ch = kspec.channels

    outs = pl.pallas_call(
        _make_owner_crush_kernel(kspec, levels),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(grid,),
            in_specs=[_row_spec(p), _row_spec(p), _row_spec(1), _row_spec(p)]
            + [_row_spec(ch)] * 6,
            out_specs=(_row_spec(3), _row_spec(p), _row_spec(p), _row_spec(1)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, nbp), jnp.int32),
            jax.ShapeDtypeStruct((p, nbp), jnp.int32),
            jax.ShapeDtypeStruct((p, nbp), jnp.int32),
            jax.ShapeDtypeStruct((1, nbp), jnp.float32),
        ),
        interpret=interpret,
    )(params, packed_px, mask_i, owner, f8_sel, *eps_sel)
    return tuple(o[:, :nb] for o in outs)
