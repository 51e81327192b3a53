"""Segment (run/rectangle) refit + crush: ragged regions over the block grid.

The reference merges blocks into arbitrary rectangles and refits the
decomposition over the combined area (limg_encode_find_block_3d_expand,
src/limg.cpp:1294-1496; region refit at src/limg.cpp:1752-1761). The aligned
quadtree in regions.py only forms power-of-two squares; this module adds the
missing ragged geometry the TPU way (SURVEY.md section 7's label-propagation
plan): a *segment id per block* assigns each block to a run of matching
neighbors, and every per-region reduction of the fit/crush becomes a
segment reduction (per-block partial reduction over the pixel axis, then a
scatter-add/-min/-max over the block axis). All shapes stay static: S =
number of blocks, most segments are singletons, and a singleton segment
reproduces the plain per-block encode exactly.

Per-pixel math (factor extraction, dither, integer decode) is reused
unchanged from ops/{factors,dither,decode}.py by gathering the per-segment
decomposition/shifts back to block granularity.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..config import EncodeConfig
from .crush import (
    _admissible, evaluate_shifts, _err_scale_shift,
    exhaustive_core, guess_core, ladder_core,
)
from .fit import Decomposition, _fast_round

# Block-error accumulation over a segment is pre-scaled by this shift so the
# int32 sum holds the worst case (max per-pixel weighted error 780300 x
# SEG_CAP x 64 px >> 8 = 5.0e7 < 2^31).
SEG_ERR_SHIFT = 8
# Maximum members per segment: bounds the doubling-scan step count
# (log2(SEG_CAP) passes per reduction) and keeps the error sums in range.
# Raised from 128 in round 3 so multi-level runs (a level-2 square is
# already 16 level-0 blocks) can still span many squares.
SEG_CAP = 256


def seg_sum(x: jnp.ndarray, seg_id: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Sum per-block values (..., NB) into per-segment (..., S)."""
    out = jnp.zeros((*x.shape[:-1], num_segments), x.dtype)
    return out.at[..., seg_id].add(x)


# --- contiguous-segment variants (no scatters) ------------------------------
# XLA scatters (`.at[].add/max/min`) serialize on TPU and dominated the
# coalescing pass (~70 scatter-reductions per encode). When segment members
# are CONTIGUOUS along the last axis and the segment id equals the first
# member's position (the compacted run buffer sorts by segment id to
# guarantee this), every reduction becomes two log2(SEG_CAP)-step doubling
# scans (shift + same-segment guard + combine) -- pure vector ops.

def _use_scan_kernel(n: int) -> bool:
    """Route doubling-scan chains through the Pallas halo-tile kernel on
    accelerator backends: the jnp chain lowers to log2(SEG_CAP) x 6 small
    XLA concat/select ops whose launch + HBM round-trips dominated the
    coalesce pass (tools/profiling/coalesce_stages.py); the kernel runs the
    whole chain in VMEM, bit-identically (pallas_kernels/seg_scan.py)."""
    import jax

    return jax.default_backend() != "cpu" and n >= 1024


# with lanes >= 1024 (the kernel threshold) min(SEG_CAP, n) == SEG_CAP, so
# the jnp chain and the kernel both run exactly this many steps
_SCAN_STEPS = SEG_CAP.bit_length() - 1


def _shift_right(x, d, fill):
    pad = jnp.broadcast_to(jnp.asarray(fill, x.dtype), (*x.shape[:-1], d))
    return jnp.concatenate([pad, x[..., :-d]], axis=-1)


def _shift_left(x, d, fill):
    pad = jnp.broadcast_to(jnp.asarray(fill, x.dtype), (*x.shape[:-1], d))
    return jnp.concatenate([x[..., d:], pad], axis=-1)


def _seg_all_reduce_contig(x, seg_c, op, init, is_sum: bool):
    """Reduce-to-all over contiguous segments: out[i] = reduce over j with
    seg_c[j] == seg_c[i]. seg_c: (N,) i32, the segment's first position."""
    if _use_scan_kernel(x.shape[-1]):
        from ..pallas_kernels.seg_scan import seg_mixed_all_pallas

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        neg = op is jnp.minimum            # min == -max(-x), exact
        if neg:
            x2 = -x2
        out = seg_mixed_all_pallas(
            x2, seg_c, x2.shape[0] if is_sum else 0, init, _SCAN_STEPS
        )
        if neg:
            out = -out
        return out.reshape(*lead, x.shape[-1])
    fwd = x
    bwd = x
    d = 1
    while d < min(SEG_CAP, x.shape[-1]):
        prev_seg = _shift_right(seg_c, d, jnp.int32(-1))
        fwd = jnp.where(prev_seg == seg_c, op(fwd, _shift_right(fwd, d, init)), fwd)
        nxt_seg = _shift_left(seg_c, d, jnp.int32(-2))
        bwd = jnp.where(nxt_seg == seg_c, op(bwd, _shift_left(bwd, d, init)), bwd)
        d *= 2
    if is_sum:
        return fwd + bwd - x   # prefix + suffix both include x once
    return op(fwd, bwd)        # idempotent ops tolerate the overlap


def _dense_by_start(total, seg_c, init):
    """Reduce-to-all -> the dense (..., S) representation the generic API
    returns: segment ids ARE buffer positions, so the value sits at the
    segment's first position and `dense[..., seg_c]` gathers stay valid."""
    n = total.shape[-1]
    pos = jnp.arange(n, dtype=jnp.int32)
    return jnp.where(pos == seg_c, total, init)


def seg_sum_contig(x, seg_c, num_segments: int):
    assert num_segments == x.shape[-1]
    total = _seg_all_reduce_contig(x, seg_c, jnp.add, jnp.zeros((), x.dtype), True)
    return _dense_by_start(total, seg_c, jnp.zeros((), x.dtype))


def seg_max_contig(x, seg_c, num_segments: int, init):
    assert num_segments == x.shape[-1]
    init = jnp.asarray(init, x.dtype)
    total = _seg_all_reduce_contig(x, seg_c, jnp.maximum, init, False)
    return _dense_by_start(total, seg_c, init)


def seg_min_contig(x, seg_c, num_segments: int, init):
    assert num_segments == x.shape[-1]
    init = jnp.asarray(init, x.dtype)
    total = _seg_all_reduce_contig(x, seg_c, jnp.minimum, init, False)
    return _dense_by_start(total, seg_c, init)


def seg_sum_all(x, seg_c):
    """Per-member segment totals (contiguous layout, no dense trip)."""
    return _seg_all_reduce_contig(x, seg_c, jnp.add, jnp.zeros((), x.dtype), True)


def seg_max_all(x, seg_c, init):
    return _seg_all_reduce_contig(x, seg_c, jnp.maximum, jnp.asarray(init, x.dtype), False)


def seg_min_all(x, seg_c, init):
    return _seg_all_reduce_contig(x, seg_c, jnp.minimum, jnp.asarray(init, x.dtype), False)


def seg_mixed_all(x, seg_c, n_sum: int, init_max):
    """One doubling-scan chain for a MIX of reductions: rows ``[:n_sum]`` of
    the (R, N) stack are summed, rows ``[n_sum:]`` are maxed (to min, negate).

    Row-wise arithmetic is identical to running seg_sum_all / seg_max_all per
    row (same shift/combine order, so results stay bit-identical); batching
    every reduction of a stage into ONE chain is what matters on TPU -- each
    separate scan emits log2(SEG_CAP) x 6 small XLA ops of pure launch
    overhead (tools/profiling/coalesce_stages.py)."""
    if _use_scan_kernel(x.shape[-1]):
        from ..pallas_kernels.seg_scan import seg_mixed_all_pallas

        return seg_mixed_all_pallas(x, seg_c, n_sum, init_max, _SCAN_STEPS)
    return seg_mixed_all_jnp(x, seg_c, n_sum, init_max)


def seg_mixed_all_jnp(x, seg_c, n_sum: int, init_max):
    """The jnp doubling-scan chain (CPU path; the kernel's parity oracle)."""
    r = x.shape[0]
    init_max = jnp.asarray(init_max, x.dtype)
    is_sum_row = (jnp.arange(r) < n_sum)[:, None]          # (R, 1)
    fill = jnp.where(is_sum_row, jnp.zeros((), x.dtype), init_max)

    if n_sum == r:
        comb = jnp.add
    elif n_sum == 0:
        comb = jnp.maximum
    else:
        # rows select their op elementwise -- NO concatenate (a per-step
        # concat copies the whole stack and erased the batching win)
        def comb(a, b):
            return jnp.where(is_sum_row, a + b, jnp.maximum(a, b))

    fwd = x
    bwd = x
    d = 1
    while d < min(SEG_CAP, x.shape[-1]):
        prev_seg = _shift_right(seg_c, d, jnp.int32(-1))
        fwd = jnp.where(prev_seg == seg_c, comb(fwd, _shift_right(fwd, d, fill)), fwd)
        nxt_seg = _shift_left(seg_c, d, jnp.int32(-2))
        bwd = jnp.where(nxt_seg == seg_c, comb(bwd, _shift_left(bwd, d, fill)), bwd)
        d *= 2
    if n_sum == r:
        return fwd + bwd - x
    if n_sum == 0:
        return jnp.maximum(fwd, bwd)
    return jnp.where(is_sum_row, fwd + bwd - x, jnp.maximum(fwd, bwd))


def _member_reducers():
    """Reducers returning PER-MEMBER totals with identity back-gather: every
    member lane carries its segment's value, so all downstream per-block math
    is gather-free (1-D gathers lower to ~1 ms serial loops on TPU)."""
    s_sum = lambda x, seg, n: seg_sum_all(x, seg)
    s_max = lambda x, seg, n, init: seg_max_all(x, seg, init)
    s_min = lambda x, seg, n, init: seg_min_all(x, seg, init)
    return s_sum, s_max, s_min


def _reducers(contiguous: bool):
    if contiguous:
        return seg_sum_contig, seg_max_contig, seg_min_contig
    return seg_sum, seg_max, seg_min


def seg_max(x: jnp.ndarray, seg_id: jnp.ndarray, num_segments: int, init) -> jnp.ndarray:
    out = jnp.full((*x.shape[:-1], num_segments), init, x.dtype)
    return out.at[..., seg_id].max(x)


def seg_min(x: jnp.ndarray, seg_id: jnp.ndarray, num_segments: int, init) -> jnp.ndarray:
    out = jnp.full((*x.shape[:-1], num_segments), init, x.dtype)
    return out.at[..., seg_id].min(x)


def gather_decomp(d: Decomposition, seg_id: jnp.ndarray) -> Decomposition:
    """Per-segment decomposition (ch, S) -> per-block (ch, NB)."""
    return Decomposition(*(f[..., seg_id] for f in d))


def _seg_signed_unit_mean(v, mask, seg_id, num_segments, inv_count_seg,
                          s_sum=seg_sum):
    """Segment version of fit._signed_unit_mean.

    ``v``: (ch, P, NB) residuals. The per-pixel sign/normalization is
    unchanged; only the final mean is a segment reduction. Returns (ch, S).
    """
    from jax import lax

    ch = v.shape[0]
    len_sq = (v * v).sum(axis=0)
    best_abs = jnp.abs(v[0])
    lead = v[0]
    for j in range(1, ch):
        take = jnp.abs(v[j]) > best_abs
        best_abs = jnp.where(take, jnp.abs(v[j]), best_abs)
        lead = jnp.where(take, v[j], lead)
    inv_len = jnp.where(len_sq > 0, lax.rsqrt(jnp.maximum(len_sq, 1e-38)), 0.0)
    inv_len = jnp.where(lead < 0, -inv_len, inv_len) * mask
    per_block = (v * inv_len).sum(axis=1)            # (ch, NB)
    return s_sum(per_block, seg_id, num_segments) * inv_count_seg


# per-pixel projection onto the owning segment's direction: identical math
# and shapes to the per-block fit projection
from .fit import _project as _seg_project  # noqa: E402


def fit_segments(px_u8, mask, seg_id, num_segments: int, channels: int,
                 contiguous: bool = False) -> Decomposition:
    """3-axis sequential fit per *segment* (same passes as fit.fit_blocks,
    reductions keyed by seg_id). Returns a Decomposition with (ch, S) fields;
    segments with no blocks produce zeros (flat path). ``contiguous=True``
    (segment members adjacent, id = first position -- the compacted run
    buffer's layout) switches to scan-based reductions returning PER-MEMBER
    fields (ch, N): every member carries its segment's value, so downstream
    per-block math needs no gathers."""
    if contiguous:
        s_sum, s_max, s_min = _member_reducers()
        to_blk = lambda a: a          # per-member values: gathers are identity
    else:
        s_sum, s_max, s_min = _reducers(False)
        to_blk = lambda a: a[..., seg_id]
    px = px_u8[:channels].astype(jnp.float32)         # (ch, P, NB)
    m = mask.astype(jnp.float32)
    if contiguous:
        # count + per-channel sums in ONE scan chain (see seg_mixed_all)
        st = seg_mixed_all(
            jnp.concatenate([m.sum(axis=0)[None], (px * m).sum(axis=1)], axis=0),
            seg_id, 1 + channels, 0.0,
        )
        count = st[0]
        inv_count = 1.0 / jnp.maximum(count, 1.0)
        avg = st[1:] * inv_count
    else:
        count = s_sum(m.sum(axis=0), seg_id, num_segments)      # (S,)
        inv_count = 1.0 / jnp.maximum(count, 1.0)
        avg = s_sum((px * m).sum(axis=1), seg_id, num_segments) * inv_count
    corrected = (px - to_blk(avg)[:, None, :]) * m
    dir_a = _seg_signed_unit_mean(corrected, m, seg_id, num_segments, inv_count, s_sum)

    fac_a = _seg_project(corrected, to_blk(dir_a)) * m
    est = to_blk(avg)[:, None, :] + fac_a[None] * to_blk(dir_a)[:, None, :]
    resid_a = (px - est) * m
    dir_b = _seg_signed_unit_mean(resid_a, m, seg_id, num_segments, inv_count, s_sum)

    if channels == 3:
        dir_c = jnp.stack([
            dir_a[1] * dir_b[2] - dir_a[2] * dir_b[1],
            dir_a[2] * dir_b[0] - dir_a[0] * dir_b[2],
            dir_a[0] * dir_b[1] - dir_a[1] * dir_b[0],
        ])
        fac_b = _seg_project(resid_a, to_blk(dir_b)) * m
        est_b = est + fac_b[None] * to_blk(dir_b)[:, None, :]
        fac_c = _seg_project((px - est_b) * m, to_blk(dir_c)) * m
    else:
        fac_b = _seg_project(resid_a, to_blk(dir_b)) * m
        est_b = est + fac_b[None] * to_blk(dir_b)[:, None, :]
        resid_ab = (px - est_b) * m
        dir_c = _seg_signed_unit_mean(resid_ab, m, seg_id, num_segments, inv_count, s_sum)
        fac_c = _seg_project(resid_ab, to_blk(dir_c)) * m

    big = jnp.float32(3.4e38)

    def blk_minmax(fac):
        return (jnp.where(mask, fac, big).min(axis=0),            # (NB,)
                jnp.where(mask, fac, -big).max(axis=0))

    if contiguous:
        # all six min/max reductions in ONE max-scan chain (min == -max(-x),
        # exact for floats)
        mns_mxs = [blk_minmax(f) for f in (fac_a, fac_b, fac_c)]
        rows = jnp.stack([v for mn, mx in mns_mxs for v in (-mn, mx)])
        red = seg_mixed_all(rows, seg_id, 0, -big)
        (mn_a, mx_a), (mn_b, mx_b), (mn_c, mx_c) = (
            (-red[2 * i], red[2 * i + 1]) for i in range(3)
        )
    else:
        def seg_minmax(fac):
            blk_mn, blk_mx = blk_minmax(fac)
            return (
                s_min(blk_mn, seg_id, num_segments, big),
                s_max(blk_mx, seg_id, num_segments, -big),
            )

        mn_a, mx_a = seg_minmax(fac_a)
        mn_b, mx_b = seg_minmax(fac_b)
        mn_c, mx_c = seg_minmax(fac_c)
    # empty segments: collapse the +-big sentinels to 0
    empty = count <= 0.0
    mn_a, mx_a = jnp.where(empty, 0.0, mn_a), jnp.where(empty, 0.0, mx_a)
    mn_b, mx_b = jnp.where(empty, 0.0, mn_b), jnp.where(empty, 0.0, mx_b)
    mn_c, mx_c = jnp.where(empty, 0.0, mn_c), jnp.where(empty, 0.0, mx_c)

    flat = (dir_a * dir_a).sum(axis=0) <= 0.0         # (S,)
    dir_b = jnp.where(flat, 0.0, dir_b)
    dir_c = jnp.where(flat, 0.0, dir_c)
    mn_b, mx_b = jnp.where(flat, 0.0, mn_b), jnp.where(flat, 0.0, mx_b)
    mn_c, mx_c = jnp.where(flat, 0.0, mn_c), jnp.where(flat, 0.0, mx_c)

    return Decomposition(
        avg=avg,
        dirA_min=_fast_round(avg + mn_a * dir_a),
        dirA_max=_fast_round(avg + mx_a * dir_a),
        dirB_offset=_fast_round(mn_b * dir_b),
        dirB_mag=_fast_round(mx_b * dir_b),
        dirC_offset=_fast_round(mn_c * dir_c),
        dirC_mag=_fast_round(mx_c * dir_c),
    )


def find_shifts_segments(px_u8, mask, f8_u8, d_seg: Decomposition, seg_id,
                         num_segments: int, cfg: EncodeConfig,
                         contiguous: bool = False):
    """Bit-crush search with per-*segment* admissibility.

    Same searches as ops.crush (dispatch on cfg.crush_mode) but pixel-max /
    block-error reductions run over whole segments, so one shift triple is
    chosen per region exactly like the reference's region encode
    (src/limg.cpp:1514-1534). Returns (shifts (3, S) i32, block_err (S,)).
    With ``contiguous=True`` everything runs PER MEMBER (d_seg must come from
    fit_segments(contiguous=True)): the returned shifts/err are (3, N)/(N,)
    with every member carrying its segment's value -- no gathers anywhere.
    """
    import jax

    channels = cfg.channels
    if contiguous:
        s_sum, s_max, _ = _member_reducers()
        d_blk = d_seg                 # fit_segments(contiguous) is per-member
        to_blk = lambda a: a
    else:
        s_sum, s_max, _ = _reducers(False)
        d_blk = gather_decomp(d_seg, seg_id)
        to_blk = lambda a: a[..., seg_id]
    px = px_u8[:channels].astype(jnp.int32)
    mask_i = mask.astype(jnp.int32)
    f8 = jnp.stack([p.astype(jnp.int32) for p in f8_u8])
    count_seg = s_sum(mask_i.sum(axis=0), seg_id, num_segments)
    es_blk = _err_scale_shift(px.shape[1])

    # On accelerators the per-candidate decode-sim runs in a fused Pallas
    # kernel (bit-identical to evaluate_shifts); each jnp evaluation
    # otherwise streams (3, ch, P, NB) intermediates through HBM and
    # dominates the whole coalescing pass.
    use_kernel = (jax.default_backend() != "cpu"
                  and px.shape[1] <= 256 and es_blk == 0)
    if use_kernel:
        from ..pallas_kernels.encode_fixed import (
            crush_eval_rows_pallas, crush_eval_rows_k_pallas)

        packed = px[0] + (px[1] << 8)
        for c in range(2, channels):
            packed = packed + (px[c] << (8 * c))
        f8_packed = f8[0] + (f8[1] << 8) + (f8[2] << 16)
        eps = [d_blk.dirA_min, d_blk.dirA_max, d_blk.dirB_offset,
               d_blk.dirB_mag, d_blk.dirC_offset, d_blk.dirC_mag]

    def seg_pm_be(pm, be):
        """Segment reductions of a (…, N) pixel-max + block-error pair; in
        contiguous mode both run in ONE mixed scan chain (bit-identical to
        the separate seg_max_all/seg_sum_all, see seg_mixed_all)."""
        be = be >> (SEG_ERR_SHIFT - es_blk)
        if contiguous:
            k = be.shape[:-1]
            n = be.shape[-1]
            red = seg_mixed_all(
                jnp.concatenate([be.reshape(-1, n), pm.reshape(-1, n)]),
                seg_id, math.prod(k), 0,
            )
            half = red.shape[0] // 2
            return red[half:].reshape(*k, n), red[:half].reshape(*k, n)
        return (s_max(pm, seg_id, num_segments, 0),
                s_sum(be, seg_id, num_segments))

    def eval_fn(shifts_seg):
        shifts_blk = to_blk(shifts_seg)
        if use_kernel:
            pm, be = crush_eval_rows_pallas(
                packed, mask_i, f8_packed, eps, shifts_blk, channels
            )
        else:
            pm, be = evaluate_shifts(px, mask_i, f8, d_blk, shifts_blk, channels)
        return seg_pm_be(pm, be)

    def eval_batch(cands):
        """All K candidates at once: ONE batched kernel launch + ONE K-wide
        mixed segment reduction, vs K rounds of each -- the per-candidate
        doubling-scan chains were ~half the merged encode's device time
        (tools/profiling/fused_stages.py). Kernel path only: on CPU the
        unrolled K-way graphs blow up XLA:CPU's LLVM compile (observed
        segfaults mid-suite) while the lax.scan path stays compact; core
        selection parity is covered by tests/test_crush_cores.py and the
        real-device gate (tools/tpu_parity_gate.py)."""
        shifts_blk = to_blk(cands)                       # (K, 3, NB)
        pm_k, be_k = crush_eval_rows_k_pallas(
            packed, mask_i, f8_packed, eps, shifts_blk, channels
        )
        return seg_pm_be(pm_k, be_k)

    eval_batch = eval_batch if use_kernel else None

    nb = px.shape[-1]
    if not cfg.crush_bits:
        return jnp.zeros((3, num_segments), jnp.int32), jnp.zeros((num_segments,), jnp.int32)
    floors = None
    if cfg.num_factors < 3:
        floors = eval_fn(jnp.zeros((3, num_segments), jnp.int32))
    if cfg.crush_mode == "exhaustive":
        return exhaustive_core(eval_fn, count_seg, cfg, SEG_ERR_SHIFT,
                               num_segments, floors, eval_batch=eval_batch)
    if cfg.crush_mode == "guess":
        return guess_core(eval_fn, count_seg, cfg, SEG_ERR_SHIFT,
                          num_segments, floors, eval_batch=eval_batch)
    return ladder_core(eval_fn, count_seg, cfg, SEG_ERR_SHIFT,
                       num_segments, floors, eval_batch=eval_batch)
