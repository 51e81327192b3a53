"""Fused Pallas TPU kernels: the whole block/region encode in VMEM.

The jnp pipeline is HBM-bound: each of the ~30 bit-crush candidate
evaluations streams the factor planes and pixels from HBM and materializes
(axes, ch, P, NB)-shaped intermediates. These kernels keep one tile of
blocks resident in VMEM across fit -> factor extraction -> ladder crush ->
dither -> integer decode, so HBM traffic collapses to one packed-u32 read of
the pixels and small packed outputs.

Layout inside a kernel: every quantity is a 2-D (P, T) array (P = pixels per
region in sublanes, T = lane tile of regions) or a (1, T) per-region row;
channels are unrolled into separate arrays. RGBA pixels arrive packed in one
int32 word-plane; crushed factors and decoded pixels leave the same way.

Region sizes P = 64 / 256 / 1024 cover the merged encoder's 8/16/32 px
levels. P <= 256 runs as one mono-kernel; P = 1024 exceeds the 16 MB VMEM
budget in one pass, so it runs as two kernels (fit+factors, then
crush+dither+decode) with the packed factor planes round-tripping HBM once.

Semantics match the jnp path / golden model (reference citations in
limg_tpu/ops/*.py); the crush search is the same ladder: 27 exact per-axis
sweeps, additive-model ranking of a boxed 4^3 candidate lattice anchored at
each axis's max axis-alone-admissible shift, then exact verification of the
top-K candidates by peeling argmaxes of the ranking key.

Measured on one TPU v5e chip: 5.2 ms per 4K image (~1.6 Gpx/s) for the
fixed grid, ~230x the single-core CPU reference and ~14x the estimated
16-core baseline (BASELINE_MEASURED.md).
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
import dataclasses


@dataclasses.dataclass(frozen=True)
class KernelSpec:
    """Static kernel shape: everything else (error thresholds) is traced, so
    changing error_factor does not recompile."""

    channels: int
    crush: bool
    dither: bool
    ladder_k: int
    crush_mode: str = "ladder"   # "ladder" | "exhaustive" | "guess"
    num_factors: int = 3         # reduced-factor fast modes (1/2/3 axes)

    @classmethod
    def from_config(cls, cfg: EncodeConfig) -> "KernelSpec":
        mode = cfg.crush_mode if cfg.crush_mode in (
            "ladder", "exhaustive", "guess") else "ladder"
        return cls(
            channels=cfg.channels,
            crush=cfg.crush_bits,
            dither=cfg.dithering and cfg.crush_bits,
            ladder_k=cfg.ladder_k,
            crush_mode=mode,
            num_factors=cfg.num_factors,
        )

# kernel geometry per region pixel count: (sublane pixels, lane chunks,
# regions per tile). P = 1024 regions don't fit VMEM as 1024 sublanes, so
# each region is split into `chunks` 256-pixel column groups laid out along
# lanes; per-region reductions combine the chunks with lane rolls. Lane
# width = chunks * regions_per_tile must be a multiple of 128.
_GEOM_FOR_P = {64: (64, 1, 256), 256: (256, 1, 128), 1024: (256, 4, 32),
               4096: (256, 16, 8)}
_SPLIT_THRESHOLD_P = 4096   # split fit/crush into two kernels at this size


class _RowOps:
    """Layout-generic row helpers shared by every kernel reducer.

    A per-region "row" is an array of sublane height ``R`` (1 for the
    block-lane layouts where a lane is a whole block; 8 for the natural
    row-major layout of encode_natural.py, where a block's value is
    replicated over its 8 lanes and rows carry 8 block-rows in sublanes).
    Stacks of n rows concatenate along sublanes as (n*R, T). Every helper
    below is written so that the R == 1 implementations are semantically
    identical to the plain (1, T)-row code they replaced -- the fixed and
    Morton kernels keep their compiled bit-parity.
    """

    R = 1

    # pixel array -> per-block (NOT per-region) row; the cross-block
    # region combine is _combine, applied separately so candidate rows
    # can be batched through it (_finish)
    def fold_sum(self, x):
        return jnp.sum(x, axis=0, keepdims=True)

    def fold_max(self, x):
        return jnp.max(x, axis=0, keepdims=True)

    def fold_min(self, x):
        return jnp.min(x, axis=0, keepdims=True)

    def up(self, row):
        """Row -> pixel-shaped broadcast (identity where numpy
        broadcasting already handles (1, T) against (P, T))."""
        return row

    def full_row(self, v, dtype=jnp.int32):
        return jnp.full((self.R, self.lanes), v, dtype)

    def row(self, stack, k: int):
        """k-th row of a sublane-stacked row array."""
        return stack[k * self.R:(k + 1) * self.R]

    def rows_slice(self, stack, start: int, n: int):
        return stack[start * self.R:(start + n) * self.R]

    def nrows(self, stack):
        return stack.shape[0] // self.R

    def tile(self, row, n: int):
        """Tile one row to an n-row stack. For R == 1 this is the row
        itself: numpy broadcasting handles (1, T) against (n, T), and an
        explicit broadcast_to materializes in Mosaic (owner_crush measured
        +1.3 ms per 4K from exactly that)."""
        if n == 1 or self.R == 1:
            return row
        return jnp.broadcast_to(
            row[None], (n, self.R, row.shape[-1])
        ).reshape(n * self.R, row.shape[-1])

    def stack_reduce(self, stack, fn):
        """Reduce an n-row stack over the ROW axis -> one row."""
        if self.R == 1:
            return fn(stack, axis=0, keepdims=True)
        n = self.nrows(stack)
        return fn(stack.reshape(n, self.R, stack.shape[-1]), axis=0)

    def row_iota(self, n: int):
        """(n*R, lanes) i32 stack whose k-th row is the constant k."""
        return lax.broadcasted_iota(
            jnp.int32, (n * self.R, self.lanes), 0
        ) // self.R


class _Reducer(_RowOps):
    """Per-region reductions when a region spans `chunks` lane groups.

    Arrays are (sub_p, chunks * T); region r's chunk c occupies lane
    c * T + r. Reductions produce rows tiled back across all chunk groups so
    downstream broadcasting code is chunk-agnostic.
    """

    def __init__(self, chunks: int, lanes: int):
        self.chunks = chunks
        self.t = lanes // chunks
        self.lanes = lanes

    def _combine(self, row, op):
        if self.chunks == 1:
            return row
        acc = row
        for k in range(1, self.chunks):
            # left-roll by k*t expressed as a positive (right) roll
            acc = op(acc, pltpu.roll(row, shift=self.lanes - k * self.t, axis=1))
        # lanes [0, t) now hold the full per-region value; tile back
        lane = lax.broadcasted_iota(jnp.int32, (1, self.lanes), 1)
        out = acc
        for k in range(1, self.chunks):
            out = jnp.where(
                lane // self.t == k, pltpu.roll(acc, shift=k * self.t, axis=1), out
            )
        return out

    def sum(self, x):
        return self._combine(jnp.sum(x, axis=0, keepdims=True), jnp.add)

    def max(self, x):
        return self._combine(jnp.max(x, axis=0, keepdims=True), jnp.maximum)

    def min(self, x):
        return self._combine(jnp.min(x, axis=0, keepdims=True), jnp.minimum)

# dequant multiplier (1 << s) + bit-replication bias, s = 0..8
_MULT = (1, 2, 4, 8, 17, 36, 85, 255, 0)

# canned guess triples (src/limg_bit_crush.h:332-392)
_GUESS_TRIPLES = ((4, 5, 6), (5, 8, 8), (4, 6, 8), (2, 4, 5))


def _apply_num_factors(endpoints, num_factors: int):
    """Zero the endpoints of statically dropped axes (reduced-factor modes).

    Dropping axis k is the shift=8 encoding (normals and B/C offsets zeroed,
    src/limg_bit_crush.h:118-138); zeroing the endpoints *before* the crush
    search makes the search's error evaluation account for the drop, and
    leaves the dropped axis's error flat in its shift so the rank reduction
    naturally picks s=8. Must mirror ops.fit.drop_decomposition_axes."""
    if num_factors >= 3:
        return endpoints
    ia_min, ia_max, ib_off, ib_mag, ic_off, ic_mag = endpoints
    zero = [jnp.zeros_like(v) for v in ic_off]
    ic_off, ic_mag = zero, zero
    if num_factors < 2:
        ib_off, ib_mag = zero, zero
    return (ia_min, ia_max, ib_off, ib_mag, ic_off, ic_mag)


def _unpack_channels(packed, channels):
    """(P, T) int32 packed RGBA -> list of (P, T) int32 channel planes."""
    return [(packed >> (8 * c)) & 0xFF for c in range(channels)]


def _signed_unit_mean(vecs, mask, inv_count, red: _Reducer):
    """vecs: list of ch (P,T) f32. Returns list of ch (1,T) f32 directions."""
    len_sq = sum(v * v for v in vecs)
    best = jnp.abs(vecs[0])
    lead = vecs[0]
    for v in vecs[1:]:
        a = jnp.abs(v)
        take = a > best
        best = jnp.where(take, a, best)
        lead = jnp.where(take, v, lead)
    inv_len = jnp.where(len_sq > 0, lax.rsqrt(jnp.maximum(len_sq, 1e-38)), 0.0)
    inv_len = jnp.where(lead < 0, -inv_len, inv_len) * mask
    return [red.sum(v * inv_len) * inv_count for v in vecs]


def _project_row(vecs, direction, red: "_RowOps"):
    """Per-pixel projection factor. vecs: ch x (P,T); direction: ch rows."""
    dot = sum(v * red.up(d) for v, d in zip(vecs, direction))
    d2 = sum(d * d for d in direction)
    inv = jnp.where(d2 > 0, 1.0 / jnp.maximum(d2, 1e-38), 0.0)
    return dot * red.up(inv)


def _fast_round_i32(x):
    return jnp.floor(x + 0.5).astype(jnp.int32)


def _table_row(s, table):
    """Per-block (1,T) gather from a static 9-entry table."""
    out = jnp.zeros_like(s)
    for v in range(9):
        out = jnp.where(s == v, jnp.int32(table[v]), out)
    return out


# ---------------------------------------------------------------------------
# Shared kernel subroutines (pure functions of VMEM-resident arrays)
# ---------------------------------------------------------------------------

def _fit_and_factors(packed, mask_i, channels, red: _Reducer):
    """Fit + factor extraction (ops/fit.py + ops/factors.py semantics).

    Returns (f8 [3 x (P,T) i32], endpoints [6 lists of ch x (1,T) i32],
    count (1,T) i32).
    """
    mask = mask_i.astype(jnp.float32)
    px_i = _unpack_channels(packed, channels)
    px = [p.astype(jnp.float32) for p in px_i]
    count = red.sum(mask_i)
    inv_count = 1.0 / jnp.maximum(count.astype(jnp.float32), 1.0)

    avg = [red.sum(p * mask) * inv_count for p in px]
    corrected = [(p - red.up(a)) * mask for p, a in zip(px, avg)]
    dir_a = _signed_unit_mean(corrected, mask, inv_count, red)

    fac_a = _project_row(corrected, dir_a, red) * mask
    est = [red.up(a) + fac_a * red.up(d) for a, d in zip(avg, dir_a)]
    resid = [(p - e) * mask for p, e in zip(px, est)]
    dir_b = _signed_unit_mean(resid, mask, inv_count, red)

    if channels == 3:
        dir_c = [
            dir_a[1] * dir_b[2] - dir_a[2] * dir_b[1],
            dir_a[2] * dir_b[0] - dir_a[0] * dir_b[2],
            dir_a[0] * dir_b[1] - dir_a[1] * dir_b[0],
        ]
        fac_b = _project_row(resid, dir_b, red) * mask
        est_b = [e + fac_b * red.up(d) for e, d in zip(est, dir_b)]
        resid_b = [(p - e) * mask for p, e in zip(px, est_b)]
        fac_c = _project_row(resid_b, dir_c, red) * mask
    else:
        fac_b = _project_row(resid, dir_b, red) * mask
        est_b = [e + fac_b * red.up(d) for e, d in zip(est, dir_b)]
        resid_b = [(p - e) * mask for p, e in zip(px, est_b)]
        dir_c = _signed_unit_mean(resid_b, mask, inv_count, red)
        fac_c = _project_row(resid_b, dir_c, red) * mask

    big = jnp.float32(3.4e38)

    def minmax(f):
        mn = red.min(jnp.where(mask_i > 0, f, big))
        mx = red.max(jnp.where(mask_i > 0, f, -big))
        return mn, mx

    mn_a, mx_a = minmax(fac_a)
    mn_b, mx_b = minmax(fac_b)
    mn_c, mx_c = minmax(fac_c)

    flat = sum(d * d for d in dir_a) <= 0.0      # (1, T)

    def z(v):
        return jnp.where(flat, 0.0, v)

    ia_min = [_fast_round_i32(a + mn_a * d) for a, d in zip(avg, dir_a)]
    ia_max = [_fast_round_i32(a + mx_a * d) for a, d in zip(avg, dir_a)]
    ib_off = [_fast_round_i32(z(mn_b * d)) for d in dir_b]
    ib_mag = [_fast_round_i32(z(mx_b * d)) for d in dir_b]
    ic_off = [_fast_round_i32(z(mn_c * d)) for d in dir_c]
    ic_mag = [_fast_round_i32(z(mx_c * d)) for d in dir_c]

    na = [(mx - mn).astype(jnp.float32) for mx, mn in zip(ia_max, ia_min)]
    nb = [(mx - mn).astype(jnp.float32) for mx, mn in zip(ib_mag, ib_off)]
    nc = [(mx - mn).astype(jnp.float32) for mx, mn in zip(ic_mag, ic_off)]
    min_a_f = [m.astype(jnp.float32) for m in ia_min]
    off_b_f = [m.astype(jnp.float32) for m in ib_off]
    off_c_f = [m.astype(jnp.float32) for m in ic_off]

    va = [p - red.up(m) for p, m in zip(px, min_a_f)]
    fa = _project_row(va, na, red)
    ea = [red.up(m) + fa * red.up(n) for m, n in zip(min_a_f, na)]
    fb = _project_row(
        [p - e - red.up(o) for p, e, o in zip(px, ea, off_b_f)], nb, red)
    eb = [e + fb * red.up(n) for e, n in zip(ea, nb)]
    fc = _project_row(
        [p - e - red.up(o) for p, e, o in zip(px, eb, off_c_f)], nc, red)

    def q8(f):
        # ties-to-even like the jnp/golden rint (the codec spec follows the
        # reference's SSE path _mm_cvtps_epi32, src/limg_factorization.h:126);
        # floor(x+0.5) here cost exactly one pixel of compiled-kernel parity
        # on the TPU gate (a factor landing on .5)
        return jnp.clip(jnp.rint(f * 255.0), 0.0, 255.0).astype(jnp.int32)

    f8 = [q8(fa), q8(fb), q8(fc)]
    endpoints = (ia_min, ia_max, ib_off, ib_mag, ic_off, ic_mag)
    return f8, endpoints, count, avg


def _crush_dither_decode(packed, mask_i, f8, endpoints, count, spec: KernelSpec,
                         params_ref, red: _Reducer, emit_pixel_err: bool = False):
    """Ladder crush + dither + final integer decode.

    params_ref (scalar-prefetch, int32[3]): [dither seed,
    maxPixelBitCrushError, maxBlockBitCrushError] -- the thresholds are
    traced so changing error_factor does not recompile the kernel.
    Returns (shifts [3 x (1,T)], q [3 x (P,T)], dec [ch x (P,T)], dist);
    with ``emit_pixel_err`` also the masked per-pixel weighted error (P,T).
    """
    channels = spec.channels
    max_pix = params_ref[1]
    max_blk = params_ref[2]
    crush = spec.crush
    dither = spec.dither
    ladder_k = spec.ladder_k
    # Segment reducers (encode_segments._SegReducer) set seg_err_shift: the
    # per-BLOCK error sums are >> seg_err_shift before the cross-lane segment
    # combine and admissibility compares in f32 -- exactly mirroring
    # ops.segments.find_shifts_segments (seg_pm_be + _admissible(es=8)).
    ses = getattr(red, "seg_err_shift", None)
    if ses is not None:
        es = 0
    else:
        # pre-scale block-error accumulation on big regions (int32 headroom);
        # must match ops.crush._err_scale_shift for jnp/kernel bit parity
        es = 4 if packed.shape[0] * red.chunks >= 2048 else 0

    def blk_ok(be, count_row):
        if es == 0 and ses is None:
            return be * 0x10 < max_blk * count_row
        lhs = be.astype(jnp.float32) * float(0x10 << (es if ses is None else ses))
        rhs = count_row.astype(jnp.float32) * max_blk.astype(jnp.float32)
        return lhs < rhs

    ia_min, ia_max, ib_off, ib_mag, ic_off, ic_mag = endpoints

    px_i = _unpack_channels(packed, channels)
    n_int = [
        [mx - mn for mx, mn in zip(ia_max, ia_min)],
        [mx - mn for mx, mn in zip(ib_mag, ib_off)],
        [mx - mn for mx, mn in zip(ic_mag, ic_off)],
    ]
    m_int = [ia_min, ib_off, ic_off]

    def axis_contrib(k, s_row):
        """Axis k's decode contribution at shift s_row: ch x (P,T) int32.

        Products run in f32: f_dec <= 255 and |normal| <= ~1500, so every
        product is < 2^24 and exact -- int32 vector multiplies are far
        slower on the VPU. The arithmetic >> 8 of a possibly negative
        product is floor(x / 256), which jnp.floor reproduces exactly.
        """
        q = f8[k] >> red.up(jnp.minimum(s_row, 8))
        mult = red.up(_table_row(s_row, _MULT).astype(jnp.float32))
        f_dec = q.astype(jnp.float32) * mult
        dropped = s_row > 7
        out = []
        for c in range(channels):
            n_kc = jnp.where(dropped, 0, n_int[k][c]).astype(jnp.float32)
            if k == 0:
                m_kc = m_int[k][c]
            else:
                m_kc = jnp.where(dropped, 0, m_int[k][c])
            contrib = jnp.floor((f_dec * red.up(n_kc) + 128.0) * (1.0 / 256.0))
            out.append(red.up(m_kc) + contrib.astype(jnp.int32))
        return out

    def err_from_est(est):
        """Clamp + weighted error of summed contributions est (ch x (P,T)).

        Returns PER-BLOCK (sublane-reduced) rows; the cross-lane region
        combine is applied later, batched over many candidates at once
        (_finish) -- one butterfly/roll pass over a (K, T) stack costs the
        same as over a single row, so reducing 27 sweep candidates together
        is ~27x cheaper than combining each eval individually."""
        dec = [jnp.clip(e, 0, 255) for e in est]
        d_f = [(d - p).astype(jnp.float32) for d, p in zip(dec, px_i)]
        d2 = [x * x for x in d_f]
        red_lo = d2[0] < float(0x4000)
        err = d2[0] * jnp.where(red_lo, 2.0, 3.0) + d2[1] * 4.0
        if channels >= 3:
            err = err + d2[2] * jnp.where(red_lo, 3.0, 2.0)
        if channels == 4:
            err = err + d2[3] * 3.0
        err_i = err.astype(jnp.int32) * mask_i
        return (
            red.fold_max(err_i),
            red.fold_sum(err_i >> es),
        )

    def _finish(pix_parts, blk_parts):
        """Cross-lane combine of stacked per-block candidate rows.

        pix_parts/blk_parts: lists of (r, T) rows. Returns the two stacks
        with every row holding its region's max/sum (order preserved)."""
        pm = red._combine(jnp.concatenate(pix_parts, axis=0), jnp.maximum)
        be = jnp.concatenate(blk_parts, axis=0)
        if ses is not None:
            be = be >> ses
        be = red._combine(be, jnp.add)
        return pm, be

    def decode_eval(s, q):
        """s: 3 shift rows; q: 3 x (P,T) crushed factors -> decoded
        channels ch x (P,T) int32 (for the final decode; q may be dithered
        so it can't reuse axis_contrib's internal requantization)."""
        dec = [jnp.zeros_like(packed) for _ in range(channels)]
        for k in range(3):
            mult = red.up(_table_row(s[k], _MULT).astype(jnp.float32))
            f_dec = q[k].astype(jnp.float32) * mult
            dropped = s[k] > 7
            for c in range(channels):
                n_kc = jnp.where(dropped, 0, n_int[k][c]).astype(jnp.float32)
                if k == 0:
                    m_kc = m_int[k][c]
                else:
                    m_kc = jnp.where(dropped, 0, m_int[k][c])
                contrib = jnp.floor(
                    (f_dec * red.up(n_kc) + 128.0) * (1.0 / 256.0))
                dec[c] = dec[c] + red.up(m_kc) + contrib.astype(jnp.int32)
        return [jnp.clip(d, 0, 255) for d in dec]

    def crush_eval(s):
        """s: 3 shift rows -> (pix_max, block_err) rows, int32."""
        est = axis_contrib(0, s[0])
        for k in (1, 2):
            ck = axis_contrib(k, s[k])
            est = [e + c for e, c in zip(est, ck)]
        return err_from_est(est)


    t = packed.shape[-1]
    zero_row = red.full_row(0)

    # Reduced-factor modes: admissibility is relative to the zero-shift
    # error floor left by the statically dropped axes (see ops.crush
    # _admissible floors doc). num_factors == 3 keeps the exact reference
    # comparison (floor_pix is None) for bit parity.
    if crush and spec.num_factors < 3:
        fp, fb = crush_eval([zero_row, zero_row, zero_row])
        floor_pix, floor_blk = _finish([fp], [fb])
    else:
        floor_pix = floor_blk = None

    def adm(pm, be):
        # pm/be may be n-row candidate stacks; tile the per-region rows to
        # match (identity values for R == 1, where broadcasting used to
        # handle it)
        n = red.nrows(pm)
        cnt_n = red.tile(count, n)
        if floor_pix is None:
            return (pm <= max_pix) & blk_ok(be, cnt_n)
        pix_ok = pm <= max_pix + red.tile(floor_pix, n)
        scale = float(0x10 << (es if ses is None else ses))
        lhs = be.astype(jnp.float32) * scale
        rhs = (
            cnt_n.astype(jnp.float32) * max_blk.astype(jnp.float32)
            + red.tile(floor_blk, n).astype(jnp.float32) * scale
        )
        return pix_ok & (lhs < rhs)

    if crush and spec.crush_mode == "exhaustive":
        # ---- all 729 triples, exact (--accurate-bit-crushing) -------------
        # Ascending lex enumeration with later-wins ties matches the jnp
        # find_shifts_exhaustive selection rule exactly (maximize total
        # shift, tie-break min block error, then lexicographically largest).
        def exh_body(i, carry):
            bs0, bs1, bs2, b_tot, b_err = carry
            sa = red.full_row(i // 81)
            sb = red.full_row((i // 9) % 9)
            sc = red.full_row(i % 9)
            pm_b, be_b = crush_eval([sa, sb, sc])
            pm, be = _finish([pm_b], [be_b])
            ok = adm(pm, be)
            total = sa + sb + sc
            take = ok & ((total > b_tot) | ((total == b_tot) & (be <= b_err)))
            bs0 = jnp.where(take, sa, bs0)
            bs1 = jnp.where(take, sb, bs1)
            bs2 = jnp.where(take, sc, bs2)
            b_tot = jnp.where(take, total, b_tot)
            b_err = jnp.where(take, be, b_err)
            return bs0, bs1, bs2, b_tot, b_err

        init = (
            zero_row, zero_row, zero_row,
            red.full_row(-1),
            red.full_row(2**31 - 1),
        )
        s0, s1, s2, _, _ = lax.fori_loop(0, 729, exh_body, init)
        shifts = [s0, s1, s2]
    elif crush and spec.crush_mode == "guess":
        # ---- the reference's canned-guess acceptance logic ----------------
        # if ok(4,5,6): pick (5,8,8) if ok else (4,6,8) if ok else (4,5,6)
        # else:         pick (2,4,5) if ok else (0,0,0)
        pix_parts, blk_parts = [], []
        for tpl in _GUESS_TRIPLES:
            s = [red.full_row(v) for v in tpl]
            pm_b, be_b = crush_eval(s)
            pix_parts.append(pm_b)
            blk_parts.append(be_b)
        pm4, be4 = _finish(pix_parts, blk_parts)
        oks = [adm(red.row(pm4, i), red.row(be4, i)) for i in range(4)]

        def row(v):
            return red.full_row(v)

        shifts = []
        for k in range(3):
            hi = jnp.where(
                oks[1], row(_GUESS_TRIPLES[1][k]),
                jnp.where(oks[2], row(_GUESS_TRIPLES[2][k]),
                          row(_GUESS_TRIPLES[0][k])),
            )
            lo = jnp.where(oks[3], row(_GUESS_TRIPLES[3][k]), zero_row)
            shifts.append(jnp.where(oks[0], hi, lo))
    elif crush:
        # ---- 27 per-axis sweeps ------------------------------------------
        # (The zero-shift contributions of the two idle axes are common
        # subexpressions across the unrolled sweep; Mosaic CSEs them, and
        # hoisting them manually measured *slower* -- extra live ranges.)
        pix_parts, blk_parts = [], []
        for axis in range(3):
            for sv in range(9):
                s = [zero_row, zero_row, zero_row]
                s[axis] = red.full_row(sv)
                pm_b, be_b = crush_eval(s)
                pix_parts.append(pm_b)
                blk_parts.append(be_b)
        pix27, blk27 = _finish(pix_parts, blk_parts)        # 27-row stacks
        pix_ax = [red.rows_slice(pix27, 9 * a, 9) for a in range(3)]
        blk_ax = [red.rows_slice(blk27, 9 * a, 9) for a in range(3)]
        pix0 = red.row(pix_ax[0], 0)
        err0 = red.row(blk_ax[0], 0)
        d_blk = [b - red.tile(red.row(b, 0), 9) for b in blk_ax]
        d_pix = [p - red.tile(red.row(p, 0), 9) for p in pix_ax]

        # ---- per-axis base + boxed 4^3 candidate lattice -----------------
        # base_k = largest axis-alone-admissible shift; by monotonicity no
        # admissible joint triple exceeds it, so candidates are
        # s_k = max(base_k - o_k, 0), o_k in {0..3}.
        iota9 = red.row_iota(9)
        base = []
        for axis in range(3):
            adm_ax = adm(pix_ax[axis], blk_ax[axis])
            base.append(
                red.stack_reduce(jnp.where(adm_ax, iota9, 0), jnp.max)
            )                                               # one row

        def gather9(rows, s_row):
            """rows: 9-row stack; s_row: one row -> rows[s_row]."""
            out = jnp.zeros_like(s_row)
            for sv in range(9):
                out = jnp.where(s_row == sv, red.row(rows, sv), out)
            return out

        s_cand = [[jnp.maximum(base[ax] - o, 0) for o in range(4)]
                  for ax in range(3)]                       # [3][4] rows
        db_at = [jnp.concatenate([gather9(d_blk[ax], s) for s in s_cand[ax]], axis=0)
                 for ax in range(3)]                        # 4-row stacks
        dp_at = [jnp.concatenate([gather9(d_pix[ax], s) for s in s_cand[ax]], axis=0)
                 for ax in range(3)]
        sv_at = [jnp.concatenate(s_cand[ax], axis=0) for ax in range(3)]

        def cross(u, v):
            """u m-row, v n-row stack -> (m*n)-row stack, u-major. R == 1
            keeps the original broadcast-reshape form (a loop of tiled
            concats materializes in Mosaic); R > 1 uses a loop of 2-D
            concats (Mosaic handles stacked-row broadcasts poorly).
            Values identical either way."""
            m, n = red.nrows(u), red.nrows(v)
            if red.R == 1:
                return (u[:, None, :] + v[None, :, :]).reshape(m * n, t)
            return jnp.concatenate(
                [red.tile(red.row(u, i), n) + v for i in range(m)], axis=0)

        def lattice(vals):
            return cross(vals[0], cross(vals[1], vals[2]))

        approx_blk = red.tile(err0, 64) + lattice(db_at)
        approx_pix = red.tile(pix0, 64) + lattice(dp_at)
        totals = lattice(sv_at)
        adm_lat = adm(approx_pix, approx_blk).astype(jnp.int32)
        err_pack = (2**25 - 1) - jnp.minimum(approx_blk >> 6, 2**25 - 1)
        key = (adm_lat << 30) + (totals << 25) + err_pack   # 64-row stack
        iota64 = red.row_iota(64)

        # peel the top-K candidate indices first (key updates don't depend
        # on the exact evaluations), then evaluate all K and combine their
        # region reductions in ONE batched butterfly pass
        cand = []
        key_work = key
        for _ in range(ladder_k):
            m = red.stack_reduce(key_work, jnp.max)
            idx = red.stack_reduce(
                jnp.where(key_work == red.tile(m, 64), iota64, 64), jnp.min
            )                                               # one row
            cand.append((
                jnp.maximum(base[0] - idx // 16, 0),
                jnp.maximum(base[1] - (idx // 4) % 4, 0),
                jnp.maximum(base[2] - idx % 4, 0),
            ))
            key_work = jnp.where(
                iota64 == red.tile(idx, 64), -(2**31) + 1, key_work)

        pix_parts, blk_parts = [], []
        for sa, sb, sc in cand:
            pm_b, be_b = crush_eval([sa, sb, sc])
            pix_parts.append(pm_b)
            blk_parts.append(be_b)
        pm_k, be_k = _finish(pix_parts, blk_parts)          # K-row stacks

        bs0 = bs1 = bs2 = zero_row
        b_tot = red.full_row(-1)
        b_err = red.full_row(2**31 - 1)
        for k, (sa, sb, sc) in enumerate(cand):
            pm, be = red.row(pm_k, k), red.row(be_k, k)
            ok = adm(pm, be)
            total = sa + sb + sc
            take = ok & ((total > b_tot) | ((total == b_tot) & (be < b_err)))
            bs0 = jnp.where(take, sa, bs0)
            bs1 = jnp.where(take, sb, bs1)
            bs2 = jnp.where(take, sc, bs2)
            b_tot = jnp.where(take, total, b_tot)
            b_err = jnp.where(take, be, b_err)
        shifts = [bs0, bs1, bs2]
    else:
        shifts = [zero_row, zero_row, zero_row]

    # statically dropped axes always store shift 8 (their endpoints were
    # zeroed before the search so this changes no decode result, only the
    # stored shift / bits accounting)
    for k in range(spec.num_factors, 3):
        shifts[k] = jnp.maximum(shifts[k], 8)

    # ---- dither + crush (ops/dither.py) ----------------------------------
    if dither:
        # reducers on multi-dim kernel grids supply a flattened tile id so
        # every tile's stream is distinct (1-D grids keep program_id(0))
        pid = getattr(red, "dither_pid", None)
        pltpu.prng_seed(params_ref[0]
                        + (pl.program_id(0) if pid is None else pid))
        q = []
        for k in range(3):
            s = shifts[k]
            bits = pltpu.bitcast(
                pltpu.prng_random_bits(packed.shape), jnp.uint32
            ).astype(jnp.int32)
            live = red.up((s > 0) & (s < 8))
            noise = jnp.where(
                live,
                (bits & red.up((1 << s) - 1))
                - red.up(1 << jnp.maximum(s - 1, 0)),
                0,
            )
            q.append(jnp.clip(f8[k] + noise, 0, 255)
                     >> red.up(jnp.minimum(s, 8)))
    else:
        q = [f >> red.up(jnp.minimum(shifts[k], 8))
             for k, f in enumerate(f8)]

    dec = decode_eval(shifts, q)
    d_f = [(jnp.clip(d, 0, 255) - p).astype(jnp.float32) for d, p in zip(dec, px_i)]
    d2 = [x * x for x in d_f]
    red_lo = d2[0] < float(0x4000)
    err = d2[0] * jnp.where(red_lo, 2.0, 3.0) + d2[1] * 4.0
    if channels >= 3:
        err = err + d2[2] * jnp.where(red_lo, 3.0, 2.0)
    if channels == 4:
        err = err + d2[3] * 3.0
    err_masked = err * mask_i.astype(jnp.float32)
    dist = red.sum(err_masked)
    if emit_pixel_err:
        return shifts, q, dec, dist, err_masked
    return shifts, q, dec, dist


def _pack_dec(dec, channels):
    packed_dec = dec[0] + (dec[1] << 8)
    if channels >= 3:
        packed_dec = packed_dec + (dec[2] << 16)
    if channels == 4:
        packed_dec = packed_dec + (dec[3] << 24)
    else:
        packed_dec = packed_dec + jnp.int32(np.uint32(0xFF000000).view(np.int32))
    return packed_dec


# ---------------------------------------------------------------------------
# Kernel factories
# ---------------------------------------------------------------------------

def _make_mono_kernel(spec: KernelSpec, emit_endpoints: bool, chunks: int):
    channels = spec.channels

    def kernel(params_ref, packed_ref, mask_ref, shifts_ref, q_ref, dec_ref,
               dist_ref, *ep_refs):
        packed = packed_ref[...]
        mask_i = mask_ref[...]
        red = _Reducer(chunks, packed.shape[-1])
        f8, endpoints, count, avg = _fit_and_factors(packed, mask_i, channels, red)
        endpoints = _apply_num_factors(endpoints, spec.num_factors)
        shifts, q, dec, dist = _crush_dither_decode(
            packed, mask_i, f8, endpoints, count, spec, params_ref, red
        )
        shifts_ref[...] = jnp.concatenate(shifts, axis=0)
        q_ref[...] = q[0] + (q[1] << 8) + (q[2] << 16)
        dec_ref[...] = _pack_dec(dec, channels)
        dist_ref[...] = dist
        if emit_endpoints:
            for ref, rows in zip(ep_refs[:6], endpoints):
                ref[...] = jnp.concatenate(rows, axis=0)    # (ch, T)
            ep_refs[6][...] = jnp.concatenate(avg, axis=0)  # (ch, T) f32

    return kernel


def _make_fit_kernel(spec: KernelSpec, chunks: int):
    channels = spec.channels

    def kernel(params_ref, packed_ref, mask_ref, f8_ref, *ep_refs):
        packed = packed_ref[...]
        mask_i = mask_ref[...]
        red = _Reducer(chunks, packed.shape[-1])
        f8, endpoints, _, avg = _fit_and_factors(packed, mask_i, channels, red)
        endpoints = _apply_num_factors(endpoints, spec.num_factors)
        f8_ref[...] = f8[0] + (f8[1] << 8) + (f8[2] << 16)
        for ref, rows in zip(ep_refs[:6], endpoints):
            ref[...] = jnp.concatenate(rows, axis=0)
        ep_refs[6][...] = jnp.concatenate(avg, axis=0)

    return kernel


def _make_crush_kernel(spec: KernelSpec, chunks: int):
    channels = spec.channels

    def kernel(params_ref, packed_ref, mask_ref, f8_ref, *rest):
        ep_in = rest[:6]
        shifts_ref, q_ref, dec_ref, dist_ref = rest[6:]
        packed = packed_ref[...]
        mask_i = mask_ref[...]
        red = _Reducer(chunks, packed.shape[-1])
        f8_packed = f8_ref[...]
        f8 = [(f8_packed >> (8 * k)) & 0xFF for k in range(3)]
        endpoints = tuple(
            [ref[c:c + 1, :] for c in range(channels)] for ref in
            (e[...] for e in ep_in)
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


def encode_blocks_pallas(packed_px: jnp.ndarray, mask: jnp.ndarray,
                         cfg: EncodeConfig, seed: jnp.ndarray,
                         interpret: bool = False,
                         emit_endpoints: bool = False):
    """Fused block/region encode.

    packed_px: (P, NB) int32 RGBA-packed pixels (P = 64/256/1024 pixels per
    region for 8/16/32 px squares); mask: (P, NB) bool; seed: () int32.
    Returns (shifts (3, NB) i32, q_packed (P, NB) i32, decoded_packed
    (P, NB) i32, dist (1, NB) f32 per-region weighted error
    [, endpoints 6 x (ch, NB) i32 + avg (ch, NB) f32 when emit_endpoints]).
    NB is padded to the lane tile internally. The error thresholds travel
    as traced scalars, so changing error_factor reuses the compiled kernel.
    All crush modes run in-kernel: "ladder" (default), "exhaustive" (729
    exact evaluations, --accurate-bit-crushing), and "guess" (the canned
    triples); reduced-factor modes (cfg.num_factors < 3) zero the dropped
    axes before the search and force their stored shift to 8.
    """
    kspec = KernelSpec.from_config(cfg)
    params = jnp.stack([
        seed.astype(jnp.int32).reshape(()),
        jnp.int32(cfg.max_pixel_bit_crush_error),
        jnp.int32(cfg.max_block_bit_crush_error),
    ])
    # Mosaic only targets TPU; fall back to the interpreter on CPU so the
    # pallas-backed APIs stay testable on the virtual CPU mesh. (The
    # tunneled TPU backend reports its own platform name, so test for cpu
    # explicitly rather than for tpu.)
    interpret = interpret or jax.default_backend() == "cpu"
    return _encode_blocks_pallas_impl(
        packed_px, mask, params, kspec, interpret, emit_endpoints
    )


@functools.partial(
    jax.jit, static_argnames=("kspec", "interpret", "emit_endpoints")
)
def _encode_blocks_pallas_impl(packed_px, mask, params, kspec: KernelSpec,
                               interpret: bool, emit_endpoints: bool):
    p = packed_px.shape[0]
    sub_p, chunks, treg = _GEOM_FOR_P[p]
    lanes = chunks * treg
    nb = packed_px.shape[-1]
    pad = (-nb) % treg
    if pad:
        packed_px = jnp.pad(packed_px, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    nbp = nb + pad
    grid = nbp // treg
    ch = kspec.channels
    seed_arg = params
    mask_i = mask.astype(jnp.int32)

    def to_chunked(x):
        """(P, nbp) -> (sub_p, grid * lanes): region r's chunk c sits at
        lane c * treg + (r % treg) within its grid tile."""
        if chunks == 1:
            return x
        return (
            x.reshape(chunks, sub_p, grid, treg)
            .transpose(1, 2, 0, 3)
            .reshape(sub_p, grid * lanes)
        )

    def from_chunked(x):
        if chunks == 1:
            return x
        return (
            x.reshape(sub_p, grid, chunks, treg)
            .transpose(2, 0, 1, 3)
            .reshape(p, nbp)
        )

    def rows_from_tiled(x):
        """(rows, grid * lanes) tiled per-region rows -> (rows, nbp)."""
        if chunks == 1:
            return x
        r = x.shape[0]
        return x.reshape(r, grid, chunks, treg)[:, :, 0, :].reshape(r, nbp)

    packed_k = to_chunked(packed_px)
    mask_k = to_chunked(mask_i)

    def spec(rows):
        return pl.BlockSpec((rows, lanes), lambda i, *_: (0, i))

    nlanes_total = grid * lanes

    if p < _SPLIT_THRESHOLD_P:
        kernel = _make_mono_kernel(kspec, emit_endpoints, chunks)
        out_shapes = [
            jax.ShapeDtypeStruct((3, nlanes_total), jnp.int32),
            jax.ShapeDtypeStruct((sub_p, nlanes_total), jnp.int32),
            jax.ShapeDtypeStruct((sub_p, nlanes_total), jnp.int32),
            jax.ShapeDtypeStruct((1, nlanes_total), jnp.float32),
        ]
        out_specs = [spec(3), spec(sub_p), spec(sub_p), spec(1)]
        if emit_endpoints:
            out_shapes += [jax.ShapeDtypeStruct((ch, nlanes_total), jnp.int32)] * 6
            out_shapes += [jax.ShapeDtypeStruct((ch, nlanes_total), jnp.float32)]
            out_specs += [spec(ch)] * 7
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(grid,),
                in_specs=[spec(sub_p), spec(sub_p)], out_specs=tuple(out_specs),
            ),
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(seed_arg, packed_k, mask_k)
    else:
        # two-pass path: fit+factors, then crush+dither+decode
        fit_out = pl.pallas_call(
            _make_fit_kernel(kspec, chunks),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(grid,),
                in_specs=[spec(sub_p), spec(sub_p)],
                out_specs=tuple([spec(sub_p)] + [spec(ch)] * 7),
            ),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((sub_p, nlanes_total), jnp.int32)]
                + [jax.ShapeDtypeStruct((ch, nlanes_total), jnp.int32)] * 6
                + [jax.ShapeDtypeStruct((ch, nlanes_total), jnp.float32)]
            ),
            interpret=interpret,
        )(seed_arg, packed_k, mask_k)
        f8_packed, eps = fit_out[0], fit_out[1:]
        crush_out = pl.pallas_call(
            _make_crush_kernel(kspec, chunks),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(grid,),
                in_specs=[spec(sub_p), spec(sub_p), spec(sub_p)] + [spec(ch)] * 6,
                out_specs=(spec(3), spec(sub_p), spec(sub_p), spec(1)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((3, nlanes_total), jnp.int32),
                jax.ShapeDtypeStruct((sub_p, nlanes_total), jnp.int32),
                jax.ShapeDtypeStruct((sub_p, nlanes_total), jnp.int32),
                jax.ShapeDtypeStruct((1, nlanes_total), jnp.float32),
            ),
            interpret=interpret,
        )(seed_arg, packed_k, mask_k, f8_packed, *eps[:6])
        outs = tuple(crush_out) + (tuple(eps) if emit_endpoints else ())

    shifts = rows_from_tiled(outs[0])
    q_packed = from_chunked(outs[1])
    dec_packed = from_chunked(outs[2])
    dist = rows_from_tiled(outs[3])
    result = [shifts, q_packed, dec_packed, dist] + [
        rows_from_tiled(e) for e in outs[4:]
    ]
    if pad:
        result = [o[:, :nb] for o in result]
    return tuple(result)


def _make_eval_kernel(channels: int):
    """Per-block crush evaluation: decode-sim + weighted error for ONE
    per-block shift triple. The per-pixel math mirrors
    _crush_dither_decode's axis_contrib/err_from_est (bit-exact vs the jnp
    ops.crush.evaluate_shifts); region (segment) aggregation of the
    per-block rows happens outside in jnp."""

    def kernel(params_ref, packed_ref, mask_ref, f8_ref, shifts_ref, *rest):
        ep_in = rest[:6]
        pm_ref, be_ref = rest[6:]
        packed = packed_ref[...]
        mask_i = mask_ref[...]
        f8_packed = f8_ref[...]
        f8 = [(f8_packed >> (8 * k)) & 0xFF for k in range(3)]
        shifts = [shifts_ref[k:k + 1, :] for k in range(3)]
        eps = [e[...] for e in ep_in]
        ia_min, ia_max, ib_off, ib_mag, ic_off, ic_mag = (
            [e[c:c + 1, :] for c in range(channels)] for e in eps
        )
        n_int = [
            [mx - mn for mx, mn in zip(ia_max, ia_min)],
            [mx - mn for mx, mn in zip(ib_mag, ib_off)],
            [mx - mn for mx, mn in zip(ic_mag, ic_off)],
        ]
        m_int = [ia_min, ib_off, ic_off]
        px_i = _unpack_channels(packed, channels)

        est = [jnp.zeros_like(packed) for _ in range(channels)]
        for k in range(3):
            s_row = shifts[k]
            q = f8[k] >> jnp.minimum(s_row, 8)
            mult = _table_row(s_row, _MULT).astype(jnp.float32)
            f_dec = q.astype(jnp.float32) * mult
            dropped = s_row > 7
            for c in range(channels):
                n_kc = jnp.where(dropped, 0, n_int[k][c]).astype(jnp.float32)
                m_kc = m_int[k][c] if k == 0 else jnp.where(dropped, 0, m_int[k][c])
                contrib = jnp.floor((f_dec * n_kc + 128.0) * (1.0 / 256.0))
                est[c] = est[c] + m_kc + contrib.astype(jnp.int32)

        dec = [jnp.clip(e, 0, 255) for e in est]
        d_f = [(d - p).astype(jnp.float32) for d, p in zip(dec, px_i)]
        d2 = [x * x for x in d_f]
        red_lo = d2[0] < float(0x4000)
        err = d2[0] * jnp.where(red_lo, 2.0, 3.0) + d2[1] * 4.0
        if channels >= 3:
            err = err + d2[2] * jnp.where(red_lo, 3.0, 2.0)
        if channels == 4:
            err = err + d2[3] * 3.0
        err_i = err.astype(jnp.int32) * mask_i
        pm_ref[...] = jnp.max(err_i, axis=0, keepdims=True)
        be_ref[...] = jnp.sum(err_i, axis=0, keepdims=True)

    return kernel


@functools.partial(jax.jit, static_argnames=("channels", "interpret"))
def crush_eval_rows_pallas(packed_px, mask_i, f8_packed, eps, shifts,
                           channels: int, interpret: bool = False):
    """Per-block (pix_max, block_err) for per-block shift triples.

    packed_px/mask_i/f8_packed: (P, NB) i32 (P <= 256); eps: 6 x (ch, NB)
    i32 endpoint rows gathered to block granularity; shifts: (3, NB) i32.
    Returns (pm (NB,), be (NB,)) i32, bit-identical to
    ops.crush.evaluate_shifts at err-scale 0. Used by the segment
    (run-coalescing) crush search, whose jnp eval was HBM-bound.
    """
    p, nb = packed_px.shape
    treg = 256 if p <= 64 else 128
    pad = (-nb) % treg
    if pad:
        padder = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        packed_px, mask_i, f8_packed, shifts = map(
            padder, (packed_px, mask_i, f8_packed, shifts))
        eps = [padder(e) for e in eps]
    nbp = nb + pad
    grid = nbp // treg

    def spec(rows):
        return pl.BlockSpec((rows, treg), lambda i, *_: (0, i))

    params = jnp.zeros((1,), jnp.int32)  # unused; uniform prefetch signature
    pm, be = pl.pallas_call(
        _make_eval_kernel(channels),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(grid,),
            in_specs=[spec(p), spec(p), spec(p), spec(3)] + [spec(channels)] * 6,
            out_specs=(spec(1), spec(1)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, nbp), jnp.int32),
            jax.ShapeDtypeStruct((1, nbp), jnp.int32),
        ),
        interpret=interpret or jax.default_backend() == "cpu",
    )(params, packed_px, mask_i, f8_packed, shifts, *eps)
    return pm[0, :nb], be[0, :nb]


@functools.partial(jax.jit, static_argnames=("channels", "interpret"))
def crush_eval_rows_k_pallas(packed_px, mask_i, f8_packed, eps, shifts_k,
                             channels: int, interpret: bool = False):
    """Batched crush evaluation: K candidate shift triples in ONE launch.

    Same per-pixel math as crush_eval_rows_pallas, grid (K, NB/treg): the
    pixel slabs are revisited per candidate while only the (3, treg) shift
    rows and the (1, treg) outputs change with k. Replaces K sequential
    kernel+segment-reduction rounds in the segment crush search, whose
    per-candidate doubling scans were ~half the merged encode's device time.
    shifts_k: (K, 3, NB) i32 -> (pm (K, NB), be (K, NB)) i32.
    """
    p, nb = packed_px.shape
    k = shifts_k.shape[0]
    treg = 256 if p <= 64 else 128
    pad = (-nb) % treg
    if pad:
        padder = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        packed_px, mask_i, f8_packed, shifts_k = map(
            padder, (packed_px, mask_i, f8_packed, shifts_k))
        eps = [padder(e) for e in eps]
    nbp = nb + pad
    grid = nbp // treg
    # Mosaic requires the last-two block dims to divide 8/128 OR equal the
    # array dims; candidates therefore concatenate along the LANE axis so
    # the (3, treg)/(1, treg) blocks keep their dim-equality exemption and
    # the kernel body is byte-for-byte the unbatched one. The grid iterates
    # (tile, candidate) with the CANDIDATE axis innermost: the fixed pixel
    # slab blocks keep the same index across all K inner steps, so Mosaic's
    # block revisiting leaves them resident in VMEM -- grid (K, tiles)
    # re-fetched ~190 KB x K per tile and was HBM-bound (~3x slower,
    # tools/profiling/xplane_ops.py). Candidate kk of tile i lives at lane
    # block (i*K + kk).
    shifts_rows = (shifts_k.reshape(k, 3, grid, treg)
                   .transpose(1, 2, 0, 3).reshape(3, grid * k * treg))

    def fixed(rows):
        return pl.BlockSpec((rows, treg), lambda i, kk, *_: (0, i))

    def by_k(rows):
        return pl.BlockSpec((rows, treg), lambda i, kk, *_: (0, i * k + kk))

    params = jnp.zeros((1,), jnp.int32)  # unused; uniform prefetch signature
    pm, be = pl.pallas_call(
        _make_eval_kernel(channels),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(grid, k),
            in_specs=[fixed(p), fixed(p), fixed(p), by_k(3)]
                     + [fixed(channels)] * 6,
            out_specs=(by_k(1), by_k(1)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, k * nbp), jnp.int32),
            jax.ShapeDtypeStruct((1, k * nbp), jnp.int32),
        ),
        interpret=interpret or jax.default_backend() == "cpu",
    )(params, packed_px, mask_i, f8_packed, shifts_rows, *eps)

    def unshuffle(v):
        return (v.reshape(grid, k, treg).transpose(1, 0, 2)
                .reshape(k, nbp)[:, :nb])

    return unshuffle(pm), unshuffle(be)


def pack_channels(px_u8: jnp.ndarray) -> jnp.ndarray:
    """(C, P, NB) uint8 -> (P, NB) int32 packed (c0 | c1<<8 | c2<<16 ...)."""
    c = px_u8.shape[0]
    packed = px_u8[0].astype(jnp.int32)
    for i in range(1, min(c, 4)):
        packed = packed + (px_u8[i].astype(jnp.int32) << (8 * i))
    return packed


def unpack_plane(packed: jnp.ndarray, idx: int) -> jnp.ndarray:
    return (packed >> (8 * idx)) & 0xFF
