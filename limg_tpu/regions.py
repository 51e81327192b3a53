"""Region-merging encoder: the TPU equivalent of limg_blocked_encode3d_test.

The reference grows variable rectangles over the block grid with a serial
greedy scan, refits the decomposition over each merged area, and encodes the
region as one unit (src/limg.cpp:1294-1885). A serial grower is the opposite
of a TPU program, so this module replaces it with a **parallel quadtree
merge**:

- level 0 = the 8x8 block grid; level L = aligned 2^L-sized squares of
  blocks (16x16, 32x32 ... pixels);
- a level-L square is "alive" (merged) when all four level-(L-1) children
  are alive and pairwise similar under the reference's own match predicate
  (ops/match.py, from src/limg.cpp:1137-1275);
- every level refits its decomposition over the whole region (the batched
  analog of the reference's region refit at src/limg.cpp:1752-1761) and runs
  the full factor/crush/dither/decode pipeline densely;
- each pixel takes its output from the largest alive square containing it.

Merged regions amortize the per-region header bits exactly like the
reference (src/limg.cpp:1629-1636), which is where the bpp win comes from.
Region geometry differs (aligned power-of-two squares vs. greedy
rectangles); parity is gated on PSNR/bpp, not identical segmentation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .config import BLOCK_SIZE, EncodeConfig, static_block_bits
from .ops import layout
from .ops.fit import Decomposition, drop_decomposition_axes
from .ops.match import match_decomps
from .encoder import encode_blocks


def _child_indices(by: int, bx: int):
    """Flat child indices + validity for each parent of a (by, bx) grid.

    Returns (idx (4, NP) int array clipped in-range, valid (4, NP) bool)
    where NP = ceil(by/2) * ceil(bx/2). Child order: (0,0),(0,1),(1,0),(1,1).
    """
    py, px = -(-by // 2), -(-bx // 2)
    iy = np.arange(py) * 2
    ix = np.arange(px) * 2
    idx = np.empty((4, py, px), np.int64)
    valid = np.empty((4, py, px), bool)
    for k, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        cy = iy[:, None] + dy
        cx = ix[None, :] + dx
        valid[k] = (cy < by) & (cx < bx)
        idx[k] = np.clip(cy, 0, by - 1) * bx + np.clip(cx, 0, bx - 1)
    return idx.reshape(4, -1), valid.reshape(4, -1)


def _gather_decomp(d: Decomposition, idx) -> Decomposition:
    return Decomposition(*(f[..., idx] for f in d))


def merge_levels_alive(decomps, grids, channels: int):
    """Decide merges bottom-up. Returns (alive, merge_stats).

    ``alive[L]``: (NB_L,) bool -- region at level L is fully merged.
    """
    alive = [jnp.ones((grids[0].num_blocks,), bool)]
    stats = []
    for lvl in range(1, len(grids)):
        gy, gx = grids[lvl - 1].blocks_y, grids[lvl - 1].blocks_x
        idx, valid = _child_indices(gy, gx)
        idx = jnp.asarray(idx)
        valid_all = jnp.asarray(valid.all(axis=0))
        kids_alive = alive[lvl - 1][idx].all(axis=0)
        c = [_gather_decomp(decomps[lvl - 1], idx[k]) for k in range(4)]
        m1, s1 = match_decomps(c[0], c[1], channels)
        m2, s2 = match_decomps(c[0], c[2], channels)
        m3, s3 = match_decomps(c[0], c[3], channels)
        alive.append(valid_all & kids_alive & m1 & m2 & m3)
        stats.append({k: (s1[k] | s2[k] | s3[k]).sum() for k in s1})
    return alive, stats


def _owner_level(alive, grids, num_levels: int):
    """Per level-0 block: index of the largest alive ancestor (0-based)."""
    by0, bx0 = grids[0].blocks_y, grids[0].blocks_x
    yy, xx = np.mgrid[0:by0, 0:bx0]
    owner = jnp.zeros((by0 * bx0,), jnp.int32)
    for lvl in range(1, num_levels):
        gy, gx = grids[lvl].blocks_y, grids[lvl].blocks_x
        anc = (yy >> lvl) * gx + (xx >> lvl)  # ancestor flat index at lvl
        anc = jnp.asarray(anc.reshape(-1))
        owner = jnp.where(alive[lvl][anc], lvl, owner)
    return owner  # (NB0,)


def _encode_level_pallas(image, bsz, cfg: EncodeConfig, key):
    """One dense level through the fused Pallas kernel.

    Everything stays in the kernel's packed/per-region forms: the decode
    plane as a packed-u32 word plane, per-region distortion and the fit avg
    straight from the kernel (no full-image re-derivation)."""
    from .pallas_kernels.encode_fixed import encode_blocks_pallas, pack_channels

    if image.shape[2] == 4:
        packed, mask, grid = layout.blockify_packed(image, bsz)
    else:
        px, mask, grid = layout.blockify(image, bsz)
        packed = pack_channels(px)
    seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
    outs = encode_blocks_pallas(packed, mask, cfg, seed, emit_endpoints=True)
    shifts, q_packed, dec_packed, dist = outs[:4]
    d = Decomposition(
        avg=outs[10],
        dirA_min=outs[4], dirA_max=outs[5],
        dirB_offset=outs[6], dirB_mag=outs[7],
        dirC_offset=outs[8], dirC_mag=outs[9],
    )
    count = mask.astype(jnp.int32).sum(axis=0)
    s_eff = jnp.minimum(shifts, 8)
    block_bits = static_block_bits(ch := cfg.channels) + (
        (8 - s_eff) * count[None]
    ).sum(axis=0)
    bpp_block = jnp.minimum(0xFF, (block_bits + count // 2) // count)
    return dict(
        grid=grid, decomp=d, shifts=shifts, q_packed=q_packed,
        dec_packed=dec_packed, dist=dist[0], bits=block_bits,
        bpp_block=bpp_block, mask=mask, count=count,
    )


def _pack_dec_jnp(decoded_blocks, channels):
    """(ch, P, NB) int -> packed u32 word plane (P, NB) i32 (alpha 0xFF)."""
    packed = decoded_blocks[0].astype(jnp.int32)
    for c in range(1, channels):
        packed = packed + (decoded_blocks[c].astype(jnp.int32) << (8 * c))
    if channels == 3:
        packed = packed + jnp.int32(np.uint32(0xFF000000).view(np.int32))
    return packed


def encode_levels(image, cfg: EncodeConfig, dither_key, num_levels: int,
                  use_pallas: bool):
    """Dense per-level encode shared by the merged encoder and the
    bitstream writer. Returns (grids, list of per-level dicts); decode
    planes travel packed (``dec_packed``), factor planes packed
    (``q_packed``)."""
    from .ops.error import weighted_error

    keys = jax.random.split(dither_key, num_levels)
    grids, levels = [], []
    for lvl in range(num_levels):
        bsz = BLOCK_SIZE << lvl
        if use_pallas:
            lv = _encode_level_pallas(image, bsz, cfg, keys[lvl])
            grids.append(lv.pop("grid"))
            levels.append(lv)
            continue
        px, mask, grid = layout.blockify(image, bsz)
        res = encode_blocks(px, mask, cfg, keys[lvl])
        grids.append(grid)
        count = mask.astype(jnp.int32).sum(axis=0)
        s_eff = jnp.minimum(res.shifts, 8)
        bits = static_block_bits(cfg.channels) + ((8 - s_eff) * count[None]).sum(axis=0)
        dist = (
            weighted_error(res.decoded, px[: cfg.channels].astype(jnp.int32))
            * mask.astype(jnp.int32)
        ).astype(jnp.float32).sum(axis=0)                       # (NB,)
        q_packed = (
            res.factors[0] + (res.factors[1] << 8) + (res.factors[2] << 16)
        )
        levels.append(dict(
            decomp=res.decomposition, shifts=res.shifts, q_packed=q_packed,
            dec_packed=_pack_dec_jnp(res.decoded, cfg.channels),
            bpp_block=res.bpp_block, mask=mask, bits=bits, dist=dist,
            count=count,
        ))
    return grids, levels


def rd_merge_keep(levels, grids, num_levels: int, lam: float,
                  extra_header_bits: float = 0.0):
    """Rate-distortion-optimal quadtree cut (beyond-reference merge policy).

    Bottom-up dynamic program: a region's cost is its own
    bits + lam * weighted-squared-error; a parent is kept (merged) when its
    cost beats the best achievable by its children's subtrees. Returns
    keep[L] bool arrays compatible with _owner_level (a pixel is owned by
    the highest kept ancestor). ``extra_header_bits`` adjusts the per-region
    header cost (e.g. the real LTP1 header instead of the reference's
    110-bit estimate) so the cut optimizes actual file size.
    """
    def cost_of(lvl):
        return (
            levels[lvl]["bits"].astype(jnp.float32)
            + extra_header_bits
            + lam * levels[lvl]["dist"]
        )

    best = [cost_of(0)]
    keep = [jnp.ones_like(best[0], bool)]
    stats = []
    for lvl in range(1, num_levels):
        gy, gx = grids[lvl - 1].blocks_y, grids[lvl - 1].blocks_x
        idx, valid = _child_indices(gy, gx)
        idx = jnp.asarray(idx)
        # out-of-range children contribute nothing
        child_best = jnp.where(jnp.asarray(valid), best[lvl - 1][idx], 0.0).sum(axis=0)
        own = cost_of(lvl)
        merged = jnp.asarray(valid.all(axis=0)) & (own <= child_best)
        keep.append(merged)
        best.append(jnp.where(merged, own, child_best))
        # kept/child-cost breakdown (the RD analog of merge culprits)
        stats.append({
            "kept": merged.sum(),
            "rd_cost_saved": jnp.where(merged, child_best - own, 0.0).sum(),
            "cost_reject": ((~merged) & jnp.asarray(valid.all(axis=0))).sum(),
        })
    return keep, stats


def _slice_decomp_2d(d: Decomposition, gy: int, gx: int, sl_y, sl_x) -> Decomposition:
    """Slice a (ch, gy*gx) decomposition on its 2-D grid -> flattened again."""
    def f(v):
        return v.reshape(*v.shape[:-1], gy, gx)[..., sl_y, sl_x].reshape(*v.shape[:-1], -1)
    return Decomposition(*(f(v) for v in d))


def build_runs(d_lvl: Decomposition, owned: jnp.ndarray, grid, channels: int):
    """Coalesce owned grid cells into horizontal runs (plus vertical runs of
    horizontal singletons) of matching neighbors.

    The TPU replacement for the reference's greedy rectangle growth
    (src/limg.cpp:1294-1496): instead of a serial 4-direction grower, link
    each owned cell to its left (then up) neighbor when the reference's own
    similarity predicate (ops/match.py) accepts the pair, and resolve run
    ids with a prefix cummax -- one parallel pass per direction.

    ``owned``: (NB,) bool. Returns (seg_id (NB,) i32 -- the run's first
    block's flat index; run_len (NB,) i32 per block).
    """
    from jax import lax
    from .ops.segments import SEG_CAP

    gy, gx = grid.blocks_y, grid.blocks_x
    nb = gy * gx
    own2 = owned.reshape(gy, gx)
    idx2 = jnp.arange(nb, dtype=jnp.int32).reshape(gy, gx)

    from .ops.segments import seg_sum_all

    def axis_run_len(seg2, axis):
        """Per-cell run length for runs contiguous along ``axis`` of the 2-D
        grid, via the doubling scan (a generic seg_sum would be a TPU
        scatter). Row boundaries always break segments, so the flattened
        scan is safe."""
        s = seg2 if axis == 1 else seg2.T
        ln = seg_sum_all(jnp.ones((s.size,), jnp.int32), s.reshape(-1))
        ln = ln.reshape(s.shape)
        return ln if axis == 1 else ln.T

    # -- horizontal runs ---------------------------------------------------
    if gx > 1:
        da = _slice_decomp_2d(d_lvl, gy, gx, slice(None), slice(1, None))
        db = _slice_decomp_2d(d_lvl, gy, gx, slice(None), slice(0, -1))
        m_left, _ = match_decomps(da, db, channels)               # (gy*(gx-1),)
        m_left = m_left.reshape(gy, gx - 1)
        link_left = jnp.zeros((gy, gx), bool).at[:, 1:].set(
            m_left & own2[:, 1:] & own2[:, :-1]
        )
        # cap run length (segment error-accumulator headroom)
        link_left = link_left & (jnp.arange(gx)[None, :] % SEG_CAP != 0)
        ids = jnp.where(~link_left, idx2, -1)
        seg_h2 = lax.cummax(ids, axis=1)
        len_h = axis_run_len(seg_h2, 1).reshape(-1)
        seg_h = seg_h2.reshape(-1)
    else:
        seg_h = idx2.reshape(-1)
        len_h = jnp.ones((nb,), jnp.int32)

    # -- vertical runs of horizontal singletons -----------------------------
    if gy > 1:
        elig2 = (owned & (len_h == 1)).reshape(gy, gx)
        da = _slice_decomp_2d(d_lvl, gy, gx, slice(1, None), slice(None))
        db = _slice_decomp_2d(d_lvl, gy, gx, slice(0, -1), slice(None))
        m_up, _ = match_decomps(da, db, channels)
        m_up = m_up.reshape(gy - 1, gx)
        link_up = jnp.zeros((gy, gx), bool).at[1:, :].set(
            m_up & elig2[1:, :] & elig2[:-1, :]
        )
        link_up = link_up & (jnp.arange(gy)[:, None] % SEG_CAP != 0)
        ids_v = jnp.where(~link_up, idx2, -1)
        seg_v2 = lax.cummax(ids_v, axis=0)
        # vertical runs are contiguous along columns: scan the transpose.
        # ids must be first-positions IN THE SCANNED ORDER, so remap to the
        # transposed flat index space for the length scan only.
        ids_t = (seg_v2 % gx) * gy + seg_v2 // gx                 # y*gx+x -> x*gy+y
        len_v = axis_run_len(ids_t.T, 1).reshape(gx, gy).T.reshape(-1)
        elig = elig2.reshape(-1)
        seg_id = jnp.where(elig, seg_v2.reshape(-1), seg_h)
        run_len = jnp.where(elig, len_v, len_h)
    else:
        seg_id = seg_h
        run_len = len_h

    # -- rectangles: stack vertically-aligned equal-span horizontal runs ----
    # The reference's grower forms arbitrary rectangles (src/limg.cpp:
    # 1390-1496); runs already cover 1-D bands, and since the coalescing
    # buffer groups members by SORTING on segment id (not by geometry),
    # stacking rows costs nothing downstream. A run links to the run above
    # when the spans align exactly and every vertical block pair matches.
    # Width is capped at 8 and row chains break every 16 rows so a
    # rectangle never exceeds SEG_CAP = 128 members.
    if gy > 1 and gx > 1:
        len_h2 = len_h.reshape(gy, gx)
        is_hrun = own2 & (len_h2 >= 2) & (len_h2 <= 8)
        # AND of the per-block vertical matches across the run's span,
        # broadcast to every member by the contiguous scan (min == AND)
        from .ops.segments import seg_min_all

        vmatch = jnp.zeros((gy, gx), jnp.int32).at[1:, :].set(
            m_up.astype(jnp.int32)
        )
        vand = seg_min_all(
            vmatch.reshape(-1), seg_h, 1
        ).reshape(gy, gx)                                         # (gy, gx)
        same_span = jnp.zeros((gy, gx), bool).at[1:, :].set(
            (seg_h2[1:] - gx == seg_h2[:-1]) & (len_h2[1:] == len_h2[:-1])
        )
        link_rect = (
            same_span & (vand > 0) & is_hrun
            & jnp.concatenate([jnp.zeros((1, gx), bool), is_hrun[:-1]], axis=0)
            & (jnp.arange(gy)[:, None] % 16 != 0)
        )
        # top row of each rectangle, per cell (uniform across a run's span)
        yy = jnp.broadcast_to(jnp.arange(gy, dtype=jnp.int32)[:, None], (gy, gx))
        r0 = lax.cummax(jnp.where(link_rect, -1, yy), axis=0)
        # bottom row: reverse cummin of rows NOT linked from below
        linked_below = jnp.concatenate(
            [link_rect[1:], jnp.zeros((1, gx), bool)], axis=0
        )
        r1 = lax.cummin(
            jnp.where(linked_below, gy, yy)[::-1], axis=0
        )[::-1]
        rows_total = r1 - r0 + 1
        x_start = seg_h2 - yy * gx
        rect_id = r0 * gx + x_start
        in_rect = is_hrun & (rows_total >= 2)
        seg_id = jnp.where(in_rect.reshape(-1), rect_id.reshape(-1), seg_id)
        run_len = jnp.where(
            in_rect.reshape(-1), (rows_total * len_h2).reshape(-1), run_len
        )
    return seg_id, run_len


def coalesce_level_bands(image, lv: dict, grid, owned: jnp.ndarray,
                         cfg: EncodeConfig, key, bsz: int,
                         merge_policy: str, rd_lambda: float,
                         cap_frac: int = 4, header_bits: int | None = None):
    """Refit + re-encode coalesced runs at one level, updating ``lv``.

    ``header_bits`` overrides the per-region header cost used by the
    acceptance guard (default: the reference's static_block_bits estimate);
    the LTP1 serializer passes its real serialized header so runs are kept
    exactly when they shrink the actual file.

    Run blocks are compacted into a fixed-capacity buffer (static shapes;
    capacity = NB/cap_frac, so photo content with few runs pays almost
    nothing) and encoded with segment reductions (ops/segments.py). Returns
    the updated level dict plus per-block (applied, region_id) arrays.
    """
    from jax import lax
    from .ops.segments import (
        fit_segments, find_shifts_segments, seg_sum_all,
    )
    from .ops.factors import extract_factors, quantize_factors
    from .ops.dither import dither_crush
    from .ops.decode import decode_blocks
    from .ops.error import weighted_error

    ch = cfg.channels
    if image.ndim == 2 or image.shape[2] == 4:
        packed_blk, mask, _ = layout.blockify_packed(image, bsz)
    else:
        px_full, mask, _ = layout.blockify(image, bsz)
        from .pallas_kernels.encode_fixed import pack_channels
        packed_blk = pack_channels(px_full)
    nb = packed_blk.shape[-1]
    d_lvl = lv["decomp"]
    seg_id, run_len = build_runs(d_lvl, owned, grid, ch)
    is_run = owned & (run_len >= 2)

    # -- compact run blocks into a fixed-capacity buffer --------------------
    # Sorting by (is_run, seg_id) makes every segment's members CONTIGUOUS
    # in the buffer (stable sort; equal keys keep block order), which lets
    # all segment reductions run as doubling scans instead of TPU-hostile
    # scatters, and every per-member value IS its segment's value -- no
    # seg-id gathers (1-D gathers lower to ~1 ms serial loops on TPU).
    cap = nb if nb <= 256 else max(256, nb // cap_frac)
    sort_key = jnp.where(is_run, seg_id, jnp.int32(2**30))
    order = jnp.argsort(sort_key, stable=True)                   # runs first
    sel = order[:cap]                                            # (cap,)
    # batch the per-block 1-D row gathers into one multi-row plane gather
    rows_i = jnp.stack([
        seg_id, run_len, is_run.astype(jnp.int32), lv["bits"],
    ])[:, sel]                                                   # (4, cap)
    seg_orig, run_len_sel = rows_i[0], rows_i[1]
    sel_is_run = rows_i[2].astype(bool)
    old_bits_sel = rows_i[3]
    old_dist_sel = lv["dist"][sel]   # RD policy only; f32 so not in rows_i
    packed_c = packed_blk[:, sel]                                # (P, cap)
    mask_c = mask[:, sel] & sel_is_run[None, :]
    px_c = jnp.stack([(packed_c >> (8 * c)) & 0xFF for c in range(ch)])
    # contiguous remap: new id = first position of the segment in the buffer
    pos = jnp.arange(cap, dtype=jnp.int32)
    is_seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), seg_orig[1:] != seg_orig[:-1]]
    )
    seg_c = lax.cummax(jnp.where(is_seg_start, pos, -1))

    # runs split by the capacity boundary (or not selected at all) revert
    len_mem = seg_sum_all(sel_is_run.astype(jnp.int32), seg_c)
    ok_c = sel_is_run & (len_mem == run_len_sel)

    # -- segment refit + factor extraction + crush + decode -----------------
    # everything below is per-member: fit/crush broadcast each segment's
    # result to all of its member positions (ops/segments.py contiguous mode)
    d_blk = fit_segments(px_c, mask_c, seg_c, cap, ch, contiguous=True)
    if cfg.num_factors < 3:
        d_blk = drop_decomposition_axes(d_blk, cfg.num_factors)
    f8_u8 = quantize_factors(*extract_factors(px_c, d_blk, ch))
    shifts_blk, _ = find_shifts_segments(px_c, mask_c, f8_u8, d_blk, seg_c, cap,
                                         cfg, contiguous=True)
    if cfg.num_factors < 3:
        forced = jnp.asarray(
            [0] * cfg.num_factors + [8] * (3 - cfg.num_factors), jnp.int32
        )
        shifts_blk = jnp.maximum(shifts_blk, forced[:, None])
    f8 = jnp.stack([p.astype(jnp.int32) for p in f8_u8])
    q = dither_crush(key, f8, shifts_blk, enabled=cfg.dithering and cfg.crush_bits)
    decoded = decode_blocks(q, shifts_blk, d_blk, ch)            # (ch, P, cap)

    # -- per-block stats on the compacted buffer -----------------------------
    mask_ci = mask_c.astype(jnp.int32)
    count_blk = mask_ci.sum(axis=0)                              # (cap,)
    err = (weighted_error(decoded, px_c) * mask_ci)
    dist_blk = err.astype(jnp.float32).sum(axis=0)
    s_eff = jnp.minimum(shifts_blk, 8)
    fac_bits_blk = ((8 - s_eff) * count_blk[None]).sum(axis=0)   # (cap,)
    header = static_block_bits(ch) if header_bits is None else header_bits
    is_start = pos == seg_c
    bits_blk = fac_bits_blk + header * is_start.astype(jnp.int32)
    count_mem = seg_sum_all(count_blk, seg_c)
    bits_mem = seg_sum_all(fac_bits_blk, seg_c) + header
    bpp_mem = jnp.minimum(
        0xFF, (bits_mem + count_mem // 2) // jnp.maximum(count_mem, 1)
    )

    # -- acceptance ----------------------------------------------------------
    # Matching blocks can still cover *shifted* spans of the same color line;
    # refitting over the union extends the factor range and can cost more
    # factor bits than the amortized header saves (the reference pays this
    # silently, src/limg.cpp:1752-1761). Guard: a run is only kept when it
    # does not increase the bit cost (match policy) / the RD cost (rd).
    if header_bits is not None:
        # lv["bits"] was computed with the static header estimate; swap in
        # the real header so old and new costs use the same units
        old_bits_sel = old_bits_sel + (header_bits - static_block_bits(ch))
    if merge_policy == "rd":
        dist_mem = seg_sum_all(dist_blk, seg_c)
        new_cost = bits_mem.astype(jnp.float32) + rd_lambda * dist_mem
        old_cost_mem = seg_sum_all(
            jnp.where(sel_is_run, old_bits_sel.astype(jnp.float32)
                      + rd_lambda * old_dist_sel, 0.0),
            seg_c,
        )
        accept = ok_c & (new_cost <= old_cost_mem)
    else:
        old_bits_mem = seg_sum_all(
            jnp.where(sel_is_run, old_bits_sel, 0), seg_c
        )
        accept = ok_c & (bits_mem <= old_bits_mem)

    # -- scatter accepted run results back to the full block arrays ---------
    def put(dst, src_c):
        upd = jnp.where(accept, src_c, dst[..., sel])
        return dst.at[..., sel].set(upd)

    q_packed_c = q[0] + (q[1] << 8) + (q[2] << 16)
    dec_packed_c = _pack_dec_jnp(decoded, ch)
    lv = dict(lv)
    lv["dec_packed"] = put(lv["dec_packed"], dec_packed_c)
    lv["q_packed"] = put(lv["q_packed"], q_packed_c)
    lv["shifts"] = put(lv["shifts"], shifts_blk)
    lv["dist"] = put(lv["dist"], dist_blk)
    lv["bits"] = put(lv["bits"], bits_blk)
    lv["bpp_block"] = put(lv["bpp_block"], bpp_mem)
    # the run's refit decomposition, so downstream consumers (the LTP1
    # serializer's region headers) see the endpoints the run decodes with
    lv["decomp"] = Decomposition(*(
        put(dst, src) for dst, src in zip(lv["decomp"], d_blk)
    ))

    applied = jnp.zeros((nb,), bool).at[sel].set(accept)
    region_id = jnp.where(applied, seg_id, jnp.arange(nb, dtype=jnp.int32))
    n_runs = (is_start & accept).sum()
    return lv, applied, region_id, n_runs


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_levels", "use_pallas", "emit_planes",
                     "merge_policy", "rd_lambda", "coalesce"),
)
def encode_image_merged_device(image: jnp.ndarray, cfg: EncodeConfig,
                               dither_key: jax.Array, num_levels: int = 3,
                               use_pallas: bool = False, emit_planes: bool = True,
                               merge_policy: str = "match",
                               rd_lambda: float = 0.01,
                               coalesce: bool = True):
    """Merged encode on device. Returns (decoded u8 (H,W,4), per-pixel planes).

    num_levels=3 -> regions of 8x8, 16x16, 32x32 pixels. ``use_pallas`` runs
    every level through the fused kernel (TPU fast path). ``emit_planes=False``
    skips the full-resolution debug planes (factors/shift/bpp/region-id) --
    stats come from per-region reductions instead, which roughly halves the
    merged encode's device time. ``coalesce`` adds the band/rectangle pass:
    level-0 blocks left unmerged by the quadtree coalesce into horizontal or
    vertical runs of matching neighbors, refit as one region each (the
    reference's arbitrary-rectangle growth analog, src/limg.cpp:1294-1496).
    """
    ch = cfg.channels
    h, w = image.shape[:2]
    grids, levels = encode_levels(image, cfg, dither_key, num_levels, use_pallas)
    decomps = [lv["decomp"] for lv in levels]

    if merge_policy == "rd":
        alive, merge_stats = rd_merge_keep(levels, grids, num_levels, rd_lambda)
    else:
        alive, merge_stats = merge_levels_alive(decomps, grids, ch)
    owner_blocks = _owner_level(alive, grids, num_levels)          # (NB0,)
    owner_px = layout.broadcast_block_plane(owner_blocks, grids[0], BLOCK_SIZE)

    run_region_id = None
    n_runs = jnp.zeros((), jnp.int32)
    if coalesce:
        owned0 = owner_blocks == 0
        ckey = jax.random.fold_in(dither_key, 0x0C0A1E5C)
        levels[0], run_applied, run_region_id, n_runs = coalesce_level_bands(
            image, levels[0], grids[0], owned0, cfg, ckey, BLOCK_SIZE,
            merge_policy, rd_lambda,
        )

    dec_imgs, fac_imgs, shift_imgs, bpp_imgs = [], [], [], []
    for lvl in range(num_levels):
        bsz = BLOCK_SIZE << lvl
        grid, lv = grids[lvl], levels[lvl]
        # keep the decode as one packed-u32 word plane until after the
        # owner select -- 4x less traffic than per-channel planes
        dec_imgs.append(
            layout.unblockify(lv["dec_packed"][None], grid, bsz)[..., 0]
        )
        if emit_planes:
            q = jnp.stack([(lv["q_packed"] >> (8 * k)) & 0xFF for k in range(3)])
            f_shifted = (q << jnp.minimum(lv["shifts"], 8)[:, None, :]) & 0xFF
            fac_imgs.append(layout.unblockify(f_shifted.astype(jnp.uint8), grid, bsz))
            shift_imgs.append(layout.broadcast_block_plane(lv["shifts"], grid, bsz))
            bpp_imgs.append(layout.broadcast_block_plane(lv["bpp_block"], grid, bsz))

    def select(stack_list, hw_axes):
        """Per-pixel select by owning level. hw_axes: position of (H, W)."""
        out = stack_list[0]
        for lvl in range(1, num_levels):
            cond = owner_px == lvl
            if hw_axes == "hwc":
                cond = cond[..., None]
            elif hw_axes == "chw":
                cond = cond[None]
            out = jnp.where(cond, stack_list[lvl], out)
        return out

    dec_plane = select(dec_imgs, "hw")                             # (H, W) i32
    decoded4 = jax.lax.bitcast_convert_type(dec_plane, jnp.uint8)  # (H, W, 4)

    # per-region stats via owned-region reductions; "owned at L" is derived
    # from the owner map (NOT alive & ~parent-alive: the RD cut is not
    # nested -- a kept grandparent can own regions whose parent is not kept)
    by0, bx0 = grids[0].blocks_y, grids[0].blocks_x
    owner_grid = owner_blocks.reshape(by0, bx0)
    accum_bits = jnp.zeros((3,), jnp.int32)
    bits_histogram = jnp.zeros((3, 9), jnp.int32)
    bpp_weighted = jnp.zeros((), jnp.float32)
    total_err = jnp.zeros((), jnp.float32)
    for lvl in range(num_levels):
        own = (owner_grid[:: 1 << lvl, :: 1 << lvl] == lvl).reshape(-1)
        lv = levels[lvl]
        count = lv["count"]
        own_i = own.astype(jnp.int32)
        total_err = total_err + (lv["dist"] * own_i).sum()
        s_eff = jnp.minimum(lv["shifts"], 8)                      # (3, NB)
        accum_bits = accum_bits + ((8 - s_eff) * (count * own_i)[None]).sum(axis=1)
        one_hot = s_eff[:, None, :] == jnp.arange(9)[None, :, None]
        bits_histogram = bits_histogram + (
            one_hot * (count * own_i)[None, None, :]
        ).sum(axis=2)
        bpp_weighted = bpp_weighted + (
            lv["bpp_block"].astype(jnp.float32) * count * own_i
        ).sum()

    merged_counts = jnp.asarray([a.sum() for a in alive])

    out = dict(
        decoded=decoded4,
        owner_px=owner_px,
        accum_bits=accum_bits,
        bits_histogram=bits_histogram,
        alive_counts=merged_counts,
        mean_bpp=bpp_weighted / (h * w),
        total_err=total_err,
        merge_stats=merge_stats,
        n_runs=n_runs,
    )
    if emit_planes:
        out["factors"] = select(fac_imgs, "hwc")                   # (H, W, 3)
        out["shift"] = select(shift_imgs, "chw")                   # (3, H, W)
        out["bpp"] = select(bpp_imgs, "hw")                        # (H, W)
        region_ids = []
        offset = 0
        for lvl in range(num_levels):
            ids_blk = jnp.arange(grids[lvl].num_blocks, dtype=jnp.int32)
            if lvl == 0 and run_region_id is not None:
                ids_blk = run_region_id   # run blocks share their start id
            ids = layout.broadcast_block_plane(
                offset + ids_blk, grids[lvl], BLOCK_SIZE << lvl,
            )
            region_ids.append(ids)
            offset += grids[lvl].num_blocks
        out["region_id"] = select(region_ids, "hw")
    return out


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_levels", "emit_planes", "coalesce"),
)
def encode_image_merged_fused_device(image: jnp.ndarray, cfg: EncodeConfig,
                                     dither_key: jax.Array, num_levels: int = 3,
                                     emit_planes: bool = True,
                                     coalesce: bool = True):
    """Merged encode via the fused Morton-layout kernels (match policy).

    Functionally equivalent to ``encode_image_merged_device(...,
    use_pallas=True, merge_policy="match")`` but ~2.5x faster: every level's
    fit runs in ONE kernel pass (butterfly lane-group reductions over the
    Morton-ordered block axis) and the expensive crush/dither/decode runs
    exactly once per pixel at each block's owner level, instead of densely
    at every level. See pallas_kernels/encode_merged.py for the layout
    invariants. Reduction-tree order differs from the dense path, so parity
    is owner-map/PSNR/bpp-level, not bitwise.
    """
    from .pallas_kernels.encode_fixed import KernelSpec, pack_channels
    from .pallas_kernels import encode_merged as em

    ch = cfg.channels
    h, w = image.shape[:2]
    if image.ndim == 2 or image.shape[2] == 4:
        packed, mask, grid0 = layout.blockify_packed(image, BLOCK_SIZE)
    else:
        px, mask, grid0 = layout.blockify(image, BLOCK_SIZE)
        packed = pack_channels(px)
    nb = grid0.num_blocks
    perm, byp, bxp = em.morton_perm(grid0.blocks_y, grid0.blocks_x, num_levels)
    nbp = perm.size
    safe = jnp.asarray(np.maximum(perm, 0))
    valid = jnp.asarray(perm >= 0)
    packed_m = jnp.where(valid[None, :], packed[:, safe], 0)
    mask_m = (mask[:, safe] & valid[None, :]).astype(jnp.int32)
    inv = np.empty(nb, np.int64)
    inv[perm[perm >= 0]] = np.nonzero(perm >= 0)[0]
    inv_j = jnp.asarray(inv)

    def to_orig(x):
        return x[..., inv_j]

    kspec = KernelSpec.from_config(cfg)
    seed = jax.random.randint(dither_key, (), 0, 2**31 - 1, jnp.int32)
    params = jnp.stack([
        seed,
        jnp.int32(cfg.max_pixel_bit_crush_error),
        jnp.int32(cfg.max_block_bit_crush_error),
    ])
    interpret = jax.default_backend() == "cpu"
    fit = em.fit_levels_pallas(packed_m, mask_m, params, kspec, num_levels,
                               interpret)

    # per-level decompositions / counts at region-leader lanes (stride 4^lvl)
    decomps, counts = [], []
    for lvl in range(num_levels):
        s = 4 ** lvl
        eps = fit[lvl]["endpoints"]
        decomps.append(Decomposition(
            avg=fit[lvl]["avg"][:, ::s],
            dirA_min=eps[0][:, ::s], dirA_max=eps[1][:, ::s],
            dirB_offset=eps[2][:, ::s], dirB_mag=eps[3][:, ::s],
            dirC_offset=eps[4][:, ::s], dirC_mag=eps[5][:, ::s],
        ))
        counts.append(fit[lvl]["count"][0, ::s])

    # merge decisions: children of Morton parent j are entries 4j..4j+3.
    # Fully-empty (grid padding) children auto-match so edge regions merge
    # exactly as in the dense path (where ceil-division grids never produce
    # empty children).
    alive = [jnp.ones((nbp,), bool)]
    merge_stats = []
    for lvl in range(1, num_levels):
        dch, cnt = decomps[lvl - 1], counts[lvl - 1]
        c = [Decomposition(*(f[:, k::4] for f in dch)) for k in range(4)]
        empty = [cnt[k::4] <= 0 for k in range(4)]
        ka = alive[lvl - 1]
        ok = ka[0::4] & ka[1::4] & ka[2::4] & ka[3::4]
        stats_acc = None
        for k in (1, 2, 3):
            m, st = match_decomps(c[0], c[k], ch)
            ok = ok & (m | empty[k] | empty[0])
            stats_acc = st if stats_acc is None else {
                kk: stats_acc[kk] | st[kk] for kk in st
            }
        nonempty_parent = counts[lvl] > 0
        merge_stats.append(
            {kk: (stats_acc[kk] & nonempty_parent).sum() for kk in stats_acc}
        )
        alive.append(ok)

    owner = jnp.zeros((nbp,), jnp.int32)
    for lvl in range(1, num_levels):
        owner = jnp.where(jnp.repeat(alive[lvl], 4 ** lvl), lvl, owner)

    # owner-selected factors / endpoints per lane (fit rows are already
    # broadcast across each region's member lanes)
    owner_row = owner[None, :]
    f8_sel = fit[0]["f8"]
    eps_sel = list(fit[0]["endpoints"])
    for lvl in range(1, num_levels):
        sel = owner_row == lvl
        f8_sel = jnp.where(sel, fit[lvl]["f8"], f8_sel)
        eps_sel = [jnp.where(sel, e, o)
                   for e, o in zip(fit[lvl]["endpoints"], eps_sel)]

    shifts_m, q_m, dec_m, dist_m = em.owner_crush_pallas(
        packed_m, mask_m, owner_row, f8_sel, eps_sel, params, kspec,
        num_levels, interpret,
    )

    header = static_block_bits(ch)
    cnt0_m = fit[0]["count"][0]                                  # (NBP,)
    s_eff_m = jnp.minimum(shifts_m, 8)

    # per-block bpp at the owner region (region values broadcast to members)
    fac_bits_blk_m = ((8 - s_eff_m) * cnt0_m[None]).sum(axis=0)
    bpp_blk_m = jnp.minimum(
        0xFF, (header + fac_bits_blk_m + cnt0_m // 2) // jnp.maximum(cnt0_m, 1)
    )
    for lvl in range(1, num_levels):
        s = 4 ** lvl
        sh_l = jnp.minimum(shifts_m[:, ::s], 8)
        bits_l = header + ((8 - sh_l) * counts[lvl][None]).sum(axis=0)
        bpp_l = jnp.minimum(
            0xFF, (bits_l + counts[lvl] // 2) // jnp.maximum(counts[lvl], 1)
        )
        bpp_blk_m = jnp.where(owner == lvl, jnp.repeat(bpp_l, s), bpp_blk_m)

    # level-0 state: the coalesce pass and per-pixel plane assembly work on
    # the unpermuted grid, so they need orig-order copies; the no-coalesce
    # fast path keeps everything in Morton order and converts only the
    # decode plane. 1-D row conversions are batched into one stacked plane
    # gather (single-row gathers lower to ~1 ms serial loops on TPU).
    run_region_id = None
    n_runs = jnp.zeros((), jnp.int32)
    run_applied = jnp.zeros((nb,), bool)
    accum_bits = jnp.zeros((3,), jnp.int32)
    bits_histogram = jnp.zeros((3, 9), jnp.int32)
    total_err = jnp.zeros((), jnp.float32)

    if coalesce:
        eps0 = fit[0]["endpoints"]
        rows = to_orig(jnp.concatenate(
            [owner[None], cnt0_m[None], bpp_blk_m[None], shifts_m, *eps0],
            axis=0,
        ))
        owner0, count0, bpp0, shifts0 = rows[0], rows[1], rows[2], rows[3:6]
        ep_rows = [rows[6 + ch * k:6 + ch * (k + 1)] for k in range(6)]
        frows = to_orig(jnp.concatenate([dist_m, fit[0]["avg"]], axis=0))
        d0 = Decomposition(frows[1:1 + ch], *ep_rows)
        s_eff0 = jnp.minimum(shifts0, 8)
        bits0 = header + ((8 - s_eff0) * count0[None]).sum(axis=0)
        lv0 = dict(
            decomp=d0,
            shifts=shifts0,
            q_packed=to_orig(q_m),
            dec_packed=to_orig(dec_m),
            dist=frows[0],
            bits=bits0,
            bpp_block=bpp0,
            mask=mask,
            count=count0,
        )
        ckey = jax.random.fold_in(dither_key, 0x0C0A1E5C)
        lv0, run_applied, run_region_id, n_runs = coalesce_level_bands(
            image, lv0, grid0, owner0 == 0, cfg, ckey, BLOCK_SIZE, "match", 0.0,
        )
        # level-0 stats from the (coalesce-updated) orig-order arrays
        own0_i = (owner0 == 0).astype(jnp.int32)
        s_eff0 = jnp.minimum(lv0["shifts"], 8)
        accum_bits = accum_bits + ((8 - s_eff0) * (count0 * own0_i)[None]).sum(axis=1)
        one_hot0 = s_eff0[:, None, :] == jnp.arange(9)[None, :, None]
        bits_histogram = bits_histogram + (
            one_hot0 * (count0 * own0_i)[None, None, :]
        ).sum(axis=2)
        total_err = total_err + (lv0["dist"] * own0_i).sum()
        bpp_weighted = (lv0["bpp_block"].astype(jnp.float32) * count0).sum()
        dec_blk = lv0["dec_packed"]
        shifts_blk, q_blk, bpp_blk = lv0["shifts"], lv0["q_packed"], lv0["bpp_block"]
    else:
        # level-0 stats directly in Morton order (padding lanes have count 0)
        own0_i = ((owner == 0) & (cnt0_m > 0)).astype(jnp.int32)
        s0_m = jnp.minimum(shifts_m, 8)
        accum_bits = accum_bits + ((8 - s0_m) * (cnt0_m * own0_i)[None]).sum(axis=1)
        one_hot0 = s0_m[:, None, :] == jnp.arange(9)[None, :, None]
        bits_histogram = bits_histogram + (
            one_hot0 * (cnt0_m * own0_i)[None, None, :]
        ).sum(axis=2)
        total_err = total_err + (dist_m[0] * own0_i).sum()
        bpp_weighted = (bpp_blk_m.astype(jnp.float32) * cnt0_m).sum()
        dec_blk = to_orig(dec_m)
        owner0 = None
        if emit_planes:
            rows = to_orig(jnp.concatenate(
                [owner[None], bpp_blk_m[None], shifts_m], axis=0
            ))
            owner0, bpp_blk, shifts_blk = rows[0], rows[1], rows[2:5]
            q_blk = to_orig(q_m)

    for lvl in range(1, num_levels):
        s = 4 ** lvl
        own_l = (owner[::s] == lvl) & (counts[lvl] > 0)
        own_i = own_l.astype(jnp.int32)
        cnt_l = counts[lvl]
        sh_l = jnp.minimum(shifts_m[:, ::s], 8)
        total_err = total_err + (dist_m[0, ::s] * own_i).sum()
        accum_bits = accum_bits + ((8 - sh_l) * (cnt_l * own_i)[None]).sum(axis=1)
        one_hot = sh_l[:, None, :] == jnp.arange(9)[None, :, None]
        bits_histogram = bits_histogram + (
            one_hot * (cnt_l * own_i)[None, None, :]
        ).sum(axis=2)

    merged_counts = jnp.asarray([
        (alive[l] & (counts[l] > 0)).sum() for l in range(num_levels)
    ])

    # the decode plane stays as packed (H, W) i32 words; the host unpacks
    # them with a free numpy byte view (a device-side bitcast would force
    # another 33 MB layout pass)
    dec_plane = layout.unblockify(dec_blk[None], grid0, BLOCK_SIZE)[..., 0]

    out = dict(
        decoded_words=dec_plane,
        accum_bits=accum_bits,
        bits_histogram=bits_histogram,
        alive_counts=merged_counts,
        mean_bpp=bpp_weighted / (h * w),
        total_err=total_err,
        merge_stats=merge_stats,
        n_runs=n_runs,
    )
    if emit_planes:
        # all per-block byte planes broadcast in ONE u8 pass (separate i32
        # broadcasts cost ~4x the bytes and 5x the relayouts)
        rows8 = jnp.concatenate([
            jnp.minimum(shifts_blk, 8), bpp_blk[None], owner0[None]
        ], axis=0).astype(jnp.uint8)                      # (5, NB)
        planes8 = layout.broadcast_block_plane(rows8, grid0, BLOCK_SIZE)
        out["shift"] = planes8[:3]
        out["bpp"] = planes8[3]
        out["owner_px"] = planes8[4]
        q = jnp.stack([(q_blk >> (8 * k)) & 0xFF for k in range(3)])
        f_shifted = (q << jnp.minimum(shifts_blk, 8)[:, None, :]) & 0xFF
        out["factors"] = layout.unblockify(
            f_shifted.astype(jnp.uint8), grid0, BLOCK_SIZE
        )
        rid_m = jnp.asarray(np.maximum(perm, 0)).astype(jnp.int32)
        for lvl in range(1, num_levels):
            s = 4 ** lvl
            leader_orig = perm[(np.arange(nbp) // s) * s]
            rid_m = jnp.where(
                owner == lvl,
                jnp.asarray(np.maximum(leader_orig, 0)).astype(jnp.int32) + nb * lvl,
                rid_m,
            )
        rid_blk = to_orig(rid_m)
        if run_region_id is not None:
            rid_blk = jnp.where(run_applied, run_region_id, rid_blk)
        out["region_id"] = layout.broadcast_block_plane(rid_blk, grid0, BLOCK_SIZE)
    return out


def encode_image_merged(image, cfg: EncodeConfig, seed: int = 0, num_levels: int = 3,
                        fetch_planes: bool = True, use_pallas: bool | None = None,
                        merge_policy: str = "match", rd_lambda: float = 0.01,
                        coalesce: bool = True, fused: bool | None = None):
    """Host-facing merged encode. Output surface mirrors
    limg_blocked_encode3d_info (src/limg.h:39-44) + stats.

    ``fetch_planes=False`` keeps the big per-pixel planes on device and
    returns only the decoded image + scalar stats -- device->host transfers
    dominate wall time on tunneled TPU setups. ``fused`` selects the
    single-crush-pass Morton-layout path (encode_image_merged_fused_device);
    by default it is used whenever it applies (pallas backend, match policy)
    -- the RD policy needs dense per-level costs and stays on the dense path.
    """
    from .pallas_kernels.encode_merged import MAX_FUSED_LEVELS

    key = jax.random.PRNGKey(seed)
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if fused is None:
        fused = (use_pallas and merge_policy == "match"
                 and 2 <= num_levels <= MAX_FUSED_LEVELS)
    if (fused and isinstance(image, np.ndarray) and image.ndim == 3
            and image.shape[2] == 4 and image.dtype == np.uint8):
        # free host-side reinterpretation; an in-graph bitcast would make
        # XLA re-lay out the whole u8 image first (see layout.packed_words)
        image = layout.packed_words(image)
    else:
        image = jnp.asarray(image)
    if fused:
        out = encode_image_merged_fused_device(
            image, cfg, key, num_levels, emit_planes=fetch_planes,
            coalesce=coalesce,
        )
    else:
        out = encode_image_merged_device(
            image, cfg, key, num_levels, use_pallas, emit_planes=fetch_planes,
            merge_policy=merge_policy, rd_lambda=rd_lambda, coalesce=coalesce,
        )
    from .ops.error import max_possible_error

    n = image.shape[0] * image.shape[1]
    mse = float(out["total_err"]) / n
    psnr = 10.0 * np.log10(max_possible_error(cfg.channels) / max(mse, 1e-12))
    mean_bpp = out["mean_bpp"]

    if "decoded_words" in out:
        decoded_np = np.ascontiguousarray(np.asarray(out["decoded_words"]))
        decoded_np = decoded_np.view(np.uint8).reshape(*decoded_np.shape, 4)
    else:
        decoded_np = np.asarray(out["decoded"])
    np_out = dict(
        decoded=decoded_np,
        alive_counts=np.asarray(out["alive_counts"]),
        bits_histogram=np.asarray(out["bits_histogram"]),
        psnr=float(psnr),
        mse=float(mse),
        mean_bpp=float(mean_bpp),
        avg_block_bits=float(np.asarray(out["accum_bits"]).sum() / n),
        merge_stats=[
            {k: float(np.asarray(v)) for k, v in s.items()}
            for s in out["merge_stats"]
        ],
        n_runs=int(np.asarray(out["n_runs"])),
    )
    if fetch_planes:
        np_out.update(
            factors=np.asarray(out["factors"]),
            shift=np.asarray(out["shift"].astype(jnp.uint8)),
            bpp=np.asarray(out["bpp"].astype(jnp.uint8)),
            region_id=np.asarray(out["region_id"]),
            owner_px=np.asarray(out["owner_px"].astype(jnp.uint8)),
        )
    return np_out
