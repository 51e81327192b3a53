"""Bit-crush: per-block adaptive factor bit depth, batched over all blocks.

TPU-first reformulation of the reference's serial shift searches
(src/limg_bit_crush.h:332-1051): instead of a data-dependent greedy scan with
early exits, candidate shift triples are evaluated for *all* blocks at once
(masked, fully vectorized) and the winner is selected by a rank-over-
candidates reduction. Selection rule: among admissible triples, maximize
total shift, tie-break by minimal block error, then lexicographically
largest triple; (0,0,0) if none is admissible. This dominates the
reference's greedy result at equal thresholds (>= total shift).

Admissibility per triple (limg_encode_try_bit_crush_block_3d_,
src/limg_bit_crush.h:96-313): simulated integer decode with factors >> s,
per-pixel weighted error <= maxPixelBitCrushError, and
blockError * 0x10 < maxBlockBitCrushError * numPixels.

Three search modes (config.crush_mode):
- "guess":      the reference's canned triples with its nested-acceptance
                logic (src/limg_bit_crush.h:332-392).
- "ladder":     per-axis sweeps -> additive error model ranks a boxed 4^3
                candidate lattice on scalars -> exact top-K verification.
- "exhaustive": all 729 triples exactly (the golden-model optimum).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import EncodeConfig
from .error import weighted_error
from .fit import Decomposition
from .decode import decode_params, dequant_mult

GUESS_TRIPLES = ((4, 5, 6), (5, 8, 8), (4, 6, 8), (2, 4, 5))

# numpy scalar (same strong int32 typing under jnp arithmetic) so importing
# the package never initializes a backend
_BIG_I32 = np.int32(2**31 - 1)


def _err_scale_shift(p: int) -> int:
    """Block-error accumulator pre-scale for big regions.

    Per-pixel weighted errors reach 780300; at >= 2048 pixels the int32 sum
    can overflow, so errors are floored by 16 before accumulation and the
    admissibility comparison compensates. Applied identically in the jnp
    path and the Pallas kernel so results stay bit-identical."""
    return 4 if p >= 2048 else 0


def _triple_errors(px, mask_i, f8, normals, mins, shifts):
    """Exact per-block errors for one (possibly per-block) shift triple.

    px: (ch, P, NB) i32 source pixels; mask_i: (P, NB) i32 (0/1);
    f8: (3, P, NB) i32 uncrushed factor planes; normals/mins: (3, ch, NB) i32
    already drop-adjusted for these shifts; shifts: (3, NB) i32.
    Returns (pix_max, block_err): (NB,) i32 each; block_err is pre-scaled by
    1/16 for regions >= 2048 px (see _err_scale_shift).
    """
    s_eff = jnp.minimum(shifts, 8)
    q = f8 >> s_eff[:, None, :]
    f_dec = q * dequant_mult(s_eff)[:, None, :]
    prod = f_dec[:, None] * normals[:, :, None, :] + 128
    est = (mins[:, :, None, :] + (prod >> 8)).sum(axis=0)
    dec = jnp.clip(est, 0, 255)
    err = weighted_error(dec, px) * mask_i       # (P, NB)
    es = _err_scale_shift(px.shape[1])
    return err.max(axis=0), (err >> es).sum(axis=0)


def evaluate_shifts(px, mask_i, f8, d: Decomposition, shifts, channels: int):
    """Errors for per-block shifts (3, NB). Returns (pix_max, block_err)."""
    normals, mins = decode_params(d, shifts, channels)
    return _triple_errors(px, mask_i, f8, normals, mins, shifts)


def _admissible(pix_max, block_err, count, cfg: EncodeConfig, err_scale: int = 0,
                floors=None):
    """Shift-triple admissibility (limg_encode_try_bit_crush_block_3d_).

    ``floors``: optional (pix_floor, blk_floor) -- the errors at zero shifts.
    Used by the reduced-factor modes (num_factors < 3): the statically
    dropped axes leave an irreducible reconstruction error, so the
    thresholds bound the quantization error *increment* above that floor
    instead of the absolute error (otherwise nothing would be admissible on
    non-flat content and every factor would stay at 8 bits). With floors
    None (the full 3-axis path) the comparison is bit-identical to the
    reference's absolute test."""
    max_pix = cfg.max_pixel_bit_crush_error
    max_blk = cfg.max_block_bit_crush_error
    if floors is None:
        pix_ok = pix_max <= max_pix
        if err_scale == 0:
            # exact integer comparison (bit parity with golden/kernel)
            return pix_ok & (block_err * 0x10 < max_blk * count)
        # pre-scaled big regions: both sides can exceed int32, compare in f32
        lhs = block_err.astype(jnp.float32) * float(0x10 << err_scale)
        rhs = count.astype(jnp.float32) * float(max_blk)
        return pix_ok & (lhs < rhs)
    pix_floor, blk_floor = floors
    pix_ok = pix_max <= max_pix + pix_floor
    scale = float(0x10 << err_scale)
    lhs = block_err.astype(jnp.float32) * scale
    rhs = (
        count.astype(jnp.float32) * float(max_blk)
        + blk_floor.astype(jnp.float32) * scale
    )
    return pix_ok & (lhs < rhs)


def _all_triples() -> np.ndarray:
    a, b, c = np.meshgrid(np.arange(9), np.arange(9), np.arange(9), indexing="ij")
    return np.stack([a.ravel(), b.ravel(), c.ravel()], axis=1).astype(np.int32)  # (729, 3)


def _scan_candidates_core(eval_fn, count, cfg, es, candidates, floors=None,
                          eval_batch=None):
    """Exact-evaluate K candidate triples per region, select the best.

    ``eval_fn(shifts (3, N)) -> (pix_max (N,), block_err (N,))`` defines the
    region granularity (plain blocks or coalesced segments).
    ``candidates``: (K, 3, N) i32, ordered so that on equal
    (total, block_err) the *later* candidate is the preferred
    (lexicographically larger) one. ``eval_batch(cands (K, 3, N)) ->
    (pix (K, N), blk (K, N))`` evaluates all candidates with BATCHED
    region reductions (the per-candidate scan chains otherwise emit
    thousands of tiny XLA ops on the segment path -- measured ~half the
    merged encode's device time). Returns (shifts (3, N), block_err (N,)).
    """
    n = candidates.shape[-1]
    init = (
        jnp.zeros((3, n), jnp.int32),
        jnp.full((n,), -1, jnp.int32),
        jnp.full((n,), 2**31 - 1, jnp.int32),
    )
    if eval_batch is not None:
        def fold(carry, cands, pm_k, be_k):
            best_s, best_total, best_err = carry
            for i in range(cands.shape[0]):
                shifts = cands[i]
                ok = _admissible(pm_k[i], be_k[i], count, cfg, es, floors)
                total = jnp.minimum(shifts, 8).sum(axis=0)
                take = ok & ((total > best_total)
                             | ((total == best_total) & (be_k[i] <= best_err)))
                best_s = jnp.where(take, shifts, best_s)
                best_total = jnp.where(take, total, best_total)
                best_err = jnp.where(take, be_k[i], best_err)
            return best_s, best_total, best_err

        k_tot = candidates.shape[0]
        chunk = 27
        if k_tot <= chunk:
            pm_k, be_k = eval_batch(candidates)
            best_s, _, best_err = fold(init, candidates, pm_k, be_k)
            return best_s, best_err
        # Big candidate sets (exhaustive: 729): chunked lax.scan so the
        # graph holds ONE batched evaluation, executed per chunk. Padding
        # repeats the last candidate -- a duplicate re-take is a no-op.
        pad = (-k_tot) % chunk
        if pad:
            candidates = jnp.concatenate(
                [candidates, jnp.broadcast_to(candidates[-1:], (pad, 3, n))])
        chunks = candidates.reshape(-1, chunk, 3, n)

        def body(carry, ch):
            pm_k, be_k = eval_batch(ch)
            return fold(carry, ch, pm_k, be_k), None

        (best_s, _, best_err), _ = lax.scan(body, init, chunks)
        return best_s, best_err

    def body(carry, shifts):
        best_s, best_total, best_err = carry
        pix_max, block_err = eval_fn(shifts)
        ok = _admissible(pix_max, block_err, count, cfg, es, floors)
        total = jnp.minimum(shifts, 8).sum(axis=0)
        take = ok & ((total > best_total) | ((total == best_total) & (block_err <= best_err)))
        best_s = jnp.where(take, shifts, best_s)
        best_total = jnp.where(take, total, best_total)
        best_err = jnp.where(take, block_err, best_err)
        return (best_s, best_total, best_err), None

    (best_s, _, best_err), _ = lax.scan(body, init, candidates)
    return best_s, best_err


def exhaustive_core(eval_fn, count, cfg: EncodeConfig, es: int, n: int, floors=None,
                    eval_batch=None):
    """All 729 triples, ascending lex order (ties -> later/larger wins)."""
    cand = jnp.broadcast_to(jnp.asarray(_all_triples())[:, :, None], (729, 3, n))
    return _scan_candidates_core(eval_fn, count, cfg, es, cand, floors,
                                 eval_batch=eval_batch)


def guess_core(eval_fn, count, cfg: EncodeConfig, es: int, n: int, floors=None,
               eval_batch=None):
    """The reference's canned-guess acceptance logic, batched.

    if ok(4,5,6): pick (5,8,8) if ok else (4,6,8) if ok else (4,5,6)
    else:         pick (2,4,5) if ok else (0,0,0)
    (src/limg_bit_crush.h:332-392)
    """
    if eval_batch is not None:
        cand = jnp.broadcast_to(
            jnp.asarray(GUESS_TRIPLES, jnp.int32)[:, :, None], (4, 3, n))
        pm_k, be_k = eval_batch(cand)
        oks = [_admissible(pm_k[i], be_k[i], count, cfg, es, floors)
               for i in range(4)]
        errs = [be_k[i] for i in range(4)]
    else:
        oks, errs = [], []
        for t in GUESS_TRIPLES:
            shifts = jnp.broadcast_to(jnp.asarray(t, jnp.int32)[:, None], (3, n))
            pix_max, block_err = eval_fn(shifts)
            oks.append(_admissible(pix_max, block_err, count, cfg, es, floors))
            errs.append(block_err)
    t456, t588, t468, t245 = [jnp.asarray(t, jnp.int32)[:, None] for t in GUESS_TRIPLES]
    zero = jnp.zeros((3, 1), jnp.int32)
    hi = jnp.where(oks[1], t588, jnp.where(oks[2], t468, t456))
    lo = jnp.where(oks[3], t245, zero)
    shifts = jnp.where(oks[0], hi, lo)
    err = jnp.where(
        oks[0],
        jnp.where(oks[1], errs[1], jnp.where(oks[2], errs[2], errs[0])),
        jnp.where(oks[3], errs[3], _BIG_I32),
    )
    return shifts, err


def ladder_core(eval_fn, count, cfg: EncodeConfig, es: int, n: int, floors=None,
                eval_batch=None):
    """Additive-model ranking over a boxed lattice + exact top-K verify.

    Stage 1: 27 exact evaluations -- each axis alone at shifts 0..8 (other
    axes unquantized). Stage 2: per axis, ``base_k`` = the largest shift that
    is admissible with the other axes unquantized; by error monotonicity no
    admissible joint triple exceeds base_k on axis k, so candidates are the
    4^3 box ``s_k = max(base_k - o_k, 0), o_k in {0..3}``. The additive
    block-error model ranks the 64 candidates by (approx-admissible, total
    shift, -approx error) in one int32 key. Stage 3: exact verification of
    the top-K; (0,0,0) if none verifies.
    """
    k = cfg.ladder_k

    # Stage 1: per-axis sweeps (one batched evaluation when available).
    pix_axis = []
    blk_axis = []
    if eval_batch is not None:
        sweep = np.zeros((27, 3), np.int32)
        for axis in range(3):
            sweep[axis * 9:(axis + 1) * 9, axis] = np.arange(9)
        pm27, be27 = eval_batch(
            jnp.broadcast_to(jnp.asarray(sweep)[:, :, None], (27, 3, n)))
        for axis in range(3):
            pix_axis.append(pm27[axis * 9:(axis + 1) * 9])  # (9, N)
            blk_axis.append(be27[axis * 9:(axis + 1) * 9])
    else:
        for axis in range(3):
            pix_s, blk_s = [], []
            for s in range(9):
                t = [0, 0, 0]
                t[axis] = s
                shifts = jnp.broadcast_to(jnp.asarray(t, jnp.int32)[:, None], (3, n))
                pm, be = eval_fn(shifts)
                pix_s.append(pm)
                blk_s.append(be)
            pix_axis.append(jnp.stack(pix_s))  # (9, N)
            blk_axis.append(jnp.stack(blk_s))
    err0 = blk_axis[0][0]                  # error at (0,0,0)
    pix0 = pix_axis[0][0]
    d_blk = [b - b[0][None] for b in blk_axis]   # (9, N) deltas
    d_pix = [p - p[0][None] for p in pix_axis]

    # Stage 2: per-axis base + boxed candidates.
    s_iota = jnp.arange(9, dtype=jnp.int32)[:, None]
    base = []
    for axis in range(3):
        adm_ax = _admissible(pix_axis[axis], blk_axis[axis], count[None], cfg, es,
                             None if floors is None else (floors[0][None], floors[1][None]))
        base.append(jnp.max(jnp.where(adm_ax, s_iota, 0), axis=0))  # (N,)

    # candidate shifts per axis and offset: (4, N)
    offs = jnp.arange(4, dtype=jnp.int32)[:, None]
    s_cand = [jnp.maximum(b[None] - offs, 0) for b in base]

    def table9(rows, s):
        """rows[s] as a 9-way select chain: 1-D/row gathers lower to ~1 ms
        serial loops on TPU, a select chain is a handful of vector ops."""
        out = jnp.zeros_like(s)
        for sv in range(9):
            out = jnp.where(s == sv, rows[sv][None], out)
        return out

    d_blk_at = [table9(d_blk[ax], s_cand[ax]) for ax in range(3)]
    d_pix_at = [table9(d_pix[ax], s_cand[ax]) for ax in range(3)]

    def lattice(vals):
        return (
            vals[0][:, None, None] + vals[1][None, :, None] + vals[2][None, None, :]
        ).reshape(64, n)

    approx_blk = err0[None] + lattice(d_blk_at)
    approx_pix = pix0[None] + lattice(d_pix_at)
    totals = lattice(s_cand)
    adm = _admissible(approx_pix, approx_blk, count[None], cfg, es,
                      None if floors is None else (floors[0][None], floors[1][None])).astype(jnp.int32)
    err_packed = (2**25 - 1) - jnp.minimum(approx_blk >> 6, 2**25 - 1)
    key = (adm << 30) + (totals << 25) + err_packed             # (64, N)

    # peel the K best indices by repeated argmax (lax.top_k lowers to a full
    # per-row sort on TPU and dominated the segment-crush profile); min-index
    # tie-breaking matches the fused kernel's peeling exactly
    iota64 = jnp.arange(64, dtype=jnp.int32)[:, None]
    key_work = key
    peeled = []
    for _ in range(k):
        m = key_work.max(axis=0)
        idx = jnp.where(key_work == m[None], iota64, 64).min(axis=0)
        peeled.append(idx)
        key_work = jnp.where(iota64 == idx[None], -(2**31) + 1, key_work)
    # evaluate worst-ranked first so the best-ranked wins ties in the scan
    top_idx = jnp.stack(peeled[::-1])                           # (K, N)
    o = [top_idx // 16, (top_idx // 4) % 4, top_idx % 4]
    cand = jnp.stack(
        [jnp.maximum(base[ax][None] - o[ax], 0) for ax in range(3)], axis=1
    ).astype(jnp.int32)                                         # (K, 3, N)
    return _scan_candidates_core(eval_fn, count, cfg, es, cand, floors,
                                 eval_batch=eval_batch)


def _block_eval_fn(px, mask_i, f8, d, channels):
    return lambda shifts: evaluate_shifts(px, mask_i, f8, d, shifts, channels)


def _floors_for(eval_fn, n, cfg: EncodeConfig):
    """Zero-shift error floors when statically dropped axes are in play."""
    if cfg.num_factors >= 3:
        return None
    return eval_fn(jnp.zeros((3, n), jnp.int32))


def find_shifts_exhaustive(px, mask_i, f8, d, count, cfg: EncodeConfig):
    eval_fn = _block_eval_fn(px, mask_i, f8, d, px.shape[0])
    n = px.shape[-1]
    return exhaustive_core(
        eval_fn, count, cfg, _err_scale_shift(px.shape[1]), n,
        _floors_for(eval_fn, n, cfg),
    )


def find_shifts_guess(px, mask_i, f8, d, count, cfg: EncodeConfig):
    eval_fn = _block_eval_fn(px, mask_i, f8, d, px.shape[0])
    n = px.shape[-1]
    return guess_core(
        eval_fn, count, cfg, _err_scale_shift(px.shape[1]), n,
        _floors_for(eval_fn, n, cfg),
    )


def find_shifts_ladder(px, mask_i, f8, d, count, cfg: EncodeConfig):
    eval_fn = _block_eval_fn(px, mask_i, f8, d, px.shape[0])
    n = px.shape[-1]
    return ladder_core(
        eval_fn, count, cfg, _err_scale_shift(px.shape[1]), n,
        _floors_for(eval_fn, n, cfg),
    )


def find_shifts(px_u8, mask, f8_u8, d: Decomposition, cfg: EncodeConfig):
    """Dispatch by cfg.crush_mode. Returns (shifts (3, NB) i32, block_err)."""
    channels = cfg.channels
    px = px_u8[:channels].astype(jnp.int32)
    mask_i = mask.astype(jnp.int32)
    count = mask_i.sum(axis=0)
    f8 = jnp.stack([p.astype(jnp.int32) for p in f8_u8])
    nb = px.shape[-1]
    if not cfg.crush_bits:
        return jnp.zeros((3, nb), jnp.int32), jnp.zeros((nb,), jnp.int32)
    if cfg.crush_mode == "exhaustive":
        return find_shifts_exhaustive(px, mask_i, f8, d, count, cfg)
    if cfg.crush_mode == "guess":
        return find_shifts_guess(px, mask_i, f8, d, count, cfg)
    return find_shifts_ladder(px, mask_i, f8, d, count, cfg)
