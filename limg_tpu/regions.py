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


def _encode_level_pallas(image, bsz, cfg: EncodeConfig, key,
                         hw: tuple | None = None):
    """One dense level through the fused Pallas kernel.

    Everything stays in the kernel's packed/per-region forms: the decode
    plane as a packed-u32 word plane, per-region distortion and the fit avg
    straight from the kernel (no full-image re-derivation). ``image`` may
    be a pre-packed 2-D word plane (possibly 8-padded; pass ``hw``)."""
    from .pallas_kernels.encode_fixed import encode_blocks_pallas, pack_channels

    if image.ndim == 2:
        packed, mask, grid = layout.blockify_packed(image, bsz, hw=hw)
    elif image.shape[2] == 4:
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


def _bcast0(v, grid_L, grid0, lvl: int):
    """Per-level-L values (..., NB_L) -> (..., NB0), broadcast to each
    level-0 block of the square (repeat + crop; no gathers)."""
    s = 1 << lvl
    t = v.reshape(*v.shape[:-1], grid_L.blocks_y, grid_L.blocks_x)
    t = jnp.repeat(jnp.repeat(t, s, axis=-2), s, axis=-1)
    t = t[..., : grid0.blocks_y, : grid0.blocks_x]
    return t.reshape(*v.shape[:-1], grid0.num_blocks)


def _q_level_to_block0(q, grid_L, grid0, lvl: int):
    """(P_L, NB_L) per-level pixel plane -> (64, NB0) level-0 block layout.

    Pure reshape/transpose (pixel p of a level-L block splits as
    (yb, iy, xb, ix) with the 8x8 sub-block (yb, xb) becoming a level-0
    block); used to express a dense level's factors at level-0 granularity
    for the LTP1 serializer."""
    s = 1 << lvl
    by_l, bx_l = grid_L.blocks_y, grid_L.blocks_x
    t = q.reshape(s, 8, s, 8, by_l, bx_l)          # (yb, iy, xb, ix, BY, BX)
    t = t.transpose(1, 3, 4, 0, 5, 2)              # (iy, ix, BY, yb, BX, xb)
    t = t.reshape(64, by_l * s, bx_l * s)
    t = t[:, : grid0.blocks_y, : grid0.blocks_x]
    return t.reshape(64, grid0.num_blocks)


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


def neighbor_pair_matches(decomps, grids, channels: int):
    """Left- and up-neighbor similarity for several levels in ONE
    match_decomps call.

    Each match_decomps evaluation is the reference's 27-probe cross
    projection (~250 elementwise XLA ops regardless of lane count); running
    it separately per level and direction made build_runs ~30% of the whole
    merged encode (tools/profiling/coalesce_stages.py). The pairs of every
    level and both directions concatenate along the lane axis into one call.

    decomps: list of Decomposition (ch, gy_l*gx_l) in original grid order,
    or of already-stacked (7*ch, gy_l*gx_l) arrays (avg + 6 endpoint rows,
    the Decomposition field order) -- the fused driver holds that stacked
    form already, so passing it skips one (7*ch, n) concat per level.
    Returns [(m_left (gy, gx-1) | None, m_up (gy-1, gx) | None)] per level.
    """
    # each part ships as ONE stacked (7*ch, n) f32 array (endpoints are
    # int16-range, exact in f32) so the cross-level concatenate is 7x fewer
    # XLA update-slices than per-field concats -- this assembly showed up as
    # ~0.7 ms of dynamic-update-slice/copy glue per 4K in the xplane profile.
    # BIG grids skip the assembly entirely: match_neighbors_pallas computes
    # the left/up matches on the (7ch, gy, gx) row plane in-kernel (roll +
    # halo seams), which removed the remaining ~0.9 ms of shifted-slice
    # fusions/pads/gathers the flat path still paid on a 4K
    # (tools/profiling/xplane_natural.py morton 1). Both paths are
    # bit-identical to match_decomps.
    ch = channels
    use_kernel = jax.default_backend() != "cpu"
    out_slots = [None] * len(grids)
    parts_a, parts_b, sizes = [], [], []
    flat_levels = []
    for li, (d, grid) in enumerate(zip(decomps, grids)):
        gy, gx = grid.blocks_y, grid.blocks_x
        stacked = (d if isinstance(d, jnp.ndarray)
                   else jnp.concatenate([f.astype(jnp.float32) for f in d],
                                        axis=0))
        rows = stacked.astype(jnp.float32).reshape(7 * ch, gy, gx)

        if use_kernel and gy * gx >= 16384:
            from .pallas_kernels.encode_merged import match_neighbors_pallas

            mr, md = match_neighbors_pallas(rows, ch)
            out_slots[li] = (mr[:, :gx - 1] if gx > 1 else None,
                            md[:gy - 1, :] if gy > 1 else None)
            continue

        def part(sl_y, sl_x, r=rows, n=7 * ch):
            return r[:, sl_y, sl_x].reshape(n, -1)

        flat_levels.append(li)
        if gx > 1:
            parts_a.append(part(slice(None), slice(1, None)))
            parts_b.append(part(slice(None), slice(0, -1)))
            sizes.append(gy * (gx - 1))
        else:
            sizes.append(0)
        if gy > 1:
            parts_a.append(part(slice(1, None), slice(None)))
            parts_b.append(part(slice(0, -1), slice(None)))
            sizes.append((gy - 1) * gx)
        else:
            sizes.append(0)

    if flat_levels:
        big_a = jnp.concatenate(parts_a, axis=-1)                # (7ch, N)
        big_b = jnp.concatenate(parts_b, axis=-1)
        if use_kernel:
            # one kernel launch; bit-identical to match_decomps on f32 rows
            # (tests/test_segment_kernel.py::test_match_pairs_kernel)
            from .pallas_kernels.encode_merged import match_pairs_pallas

            m = match_pairs_pallas(big_a, big_b, channels)
        else:
            def split(big):
                return Decomposition(
                    *(big[ch * i:ch * (i + 1)] for i in range(7)))

            m, _ = match_decomps(split(big_a), split(big_b), channels)
        off = 0
        it = iter(sizes)
        for li in flat_levels:
            grid = grids[li]
            gy, gx = grid.blocks_y, grid.blocks_x
            nl = next(it)
            ml = m[off:off + nl].reshape(gy, gx - 1) if nl else None
            off += nl
            nu = next(it)
            mu = m[off:off + nu].reshape(gy - 1, gx) if nu else None
            off += nu
            out_slots[li] = (ml, mu)
    return out_slots


def _stride_take(x, s: int):
    """x (..., H, W) -> x[..., ::s, ::s] expressed as pad + reshape + unit
    slices instead of a strided slice: XLA fuses the ``[::s, ::s]`` form
    (plus its consumers) into a serial kCustom gather (~0.3 ms per plane on
    a 4K block grid, xplane_natural.py), while unit slices of the reshaped
    (H/s, s, W/s, s) view lower as plain DMA slices. Fenced so the slices
    stay slices."""
    if s == 1:
        return x
    lead = x.shape[:-2]
    hgt, wid = x.shape[-2:]
    hp, wp = -(-hgt // s) * s, -(-wid // s) * s
    if (hp, wp) != (hgt, wid):
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, hp - hgt), (0, wp - wid)])
    x = jax.lax.optimization_barrier(
        x.reshape(*lead, hp // s, s, wp // s, s))
    nl = len(lead)
    x = jax.lax.index_in_dim(x, 0, axis=nl + 1, keepdims=False)
    x = jax.lax.index_in_dim(x, 0, axis=nl + 2, keepdims=False)
    out_h, out_w = -(-hgt // s), -(-wid // s)
    return jax.lax.optimization_barrier(x[..., :out_h, :out_w])


def build_runs(d_lvl: Decomposition, owned: jnp.ndarray, grid, channels: int,
               max_members: int | None = None, matches=None):
    """Coalesce owned grid cells into horizontal runs (plus vertical runs of
    horizontal singletons) of matching neighbors.

    The TPU replacement for the reference's greedy rectangle growth
    (src/limg.cpp:1294-1496): instead of a serial 4-direction grower, link
    each owned cell to its left (then up) neighbor when the reference's own
    similarity predicate (ops/match.py) accepts the pair, and resolve run
    ids with a prefix cummax -- one parallel pass per direction.

    ``owned``: (NB,) bool. ``max_members`` caps cells per run (default
    SEG_CAP; multi-level callers pass SEG_CAP >> 2L so a run of level-L
    squares never exceeds SEG_CAP level-0 blocks). ``matches`` passes
    precomputed (m_left, m_up) rows from neighbor_pair_matches so several
    levels share one match_decomps evaluation; ``d_lvl`` may then be None
    (it is only read to compute matches). Returns (seg_id (NB,)
    i32 -- the run's first block's flat index; run_len (NB,) i32 per cell).
    """
    from jax import lax
    from .ops.segments import SEG_CAP

    if max_members is None:
        max_members = SEG_CAP
    max_members = max(2, max_members)
    # rectangle geometry under the member budget: width x rows <= cap,
    # roughly square so small budgets (multi-level callers) can still stack
    rw_cap = min(16, max(2, int(max_members ** 0.5)))
    rh_cap = max(1, max_members // rw_cap)

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
        if matches is not None:
            m_left = matches[0]
        else:
            da = _slice_decomp_2d(d_lvl, gy, gx, slice(None), slice(1, None))
            db = _slice_decomp_2d(d_lvl, gy, gx, slice(None), slice(0, -1))
            m_left, _ = match_decomps(da, db, channels)           # (gy*(gx-1),)
            m_left = m_left.reshape(gy, gx - 1)
        link_left = jnp.zeros((gy, gx), bool).at[:, 1:].set(
            m_left & own2[:, 1:] & own2[:, :-1]
        )
        # cap run length (segment error-accumulator headroom)
        link_left = link_left & (jnp.arange(gx)[None, :] % max_members != 0)
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
        if matches is not None:
            m_up = matches[1]
        else:
            da = _slice_decomp_2d(d_lvl, gy, gx, slice(1, None), slice(None))
            db = _slice_decomp_2d(d_lvl, gy, gx, slice(0, -1), slice(None))
            m_up, _ = match_decomps(da, db, channels)
            m_up = m_up.reshape(gy - 1, gx)
        link_up = jnp.zeros((gy, gx), bool).at[1:, :].set(
            m_up & elig2[1:, :] & elig2[:-1, :]
        )
        link_up = link_up & (jnp.arange(gy)[:, None] % max_members != 0)
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
    # Width x rows is bounded by max_members (rw_cap x rh_cap).
    if gy > 1 and gx > 1:
        len_h2 = len_h.reshape(gy, gx)
        is_hrun = own2 & (len_h2 >= 2) & (len_h2 <= rw_cap)
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
            & (jnp.arange(gy)[:, None] % rh_cap != 0)
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
                         cap_frac: int = 8, header_bits: int | None = None,
                         packed_blk=None, mask=None):
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
    ch = cfg.channels
    if packed_blk is None:
        # callers that already hold the blockified packed planes pass them in
        # (the relayout costs ~1.2 ms per 4K)
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
    return coalesce_segments(
        packed_blk, mask, seg_id, is_run, lv, cfg, key, merge_policy,
        rd_lambda, cap_frac=cap_frac, header_bits=header_bits,
    )


def coalesce_segments(packed_blk, mask, seg_id, is_run, lv: dict,
                      cfg: EncodeConfig, key, merge_policy: str,
                      rd_lambda, cap_frac: int = 8,
                      header_bits: int | None = None, mpos=None,
                      use_kernel: bool | None = None,
                      cap: int | None = None,
                      old_header_included: bool = False,
                      embed_rows=None):
    """Segment refit/crush engine shared by the per-level and the unified
    multi-level coalesce: re-encodes the ``is_run`` blocks grouped by
    ``seg_id`` (each segment's leader flat index) and writes accepted
    segments back into the ``lv`` planes. Geometry-agnostic -- callers
    decide what links into a segment (build_runs at any quadtree level).

    ``mpos`` (NB,) i32, optional: when given, the big pixel planes
    (``packed_blk``, ``mask``, ``lv["dec_packed"]``, ``lv["q_packed"]``)
    are in MORTON lane order (NBP lanes) and ``mpos[b]`` is block b's
    Morton position -- the fused driver keeps those planes Morton-resident
    so each pays exactly one relayout for the whole encode; ``embed_rows``
    (required with mpos) maps (K, NB) block rows to the planes' (K, NBP)
    lane order for the gather-based write-back (a pure reshape/transpose
    for the Morton layout). All other rows stay in original block order. ``mask`` may be None for 8-aligned
    images (every real block fully valid): the member mask is then derived
    from the run selector alone and no mask plane is ever materialized.

    ``use_kernel``: run the whole refit/crush/dither/decode in the fused
    segment Pallas kernel (pallas_kernels/encode_segments.py) -- default on
    accelerator backends. Bit-identical to the jnp composition on
    shifts/endpoints/decode (tests/test_segment_kernel.py); dither noise is
    the TPU PRNG instead of threefry (statistical parity, like the fixed
    kernel).

    Run-buffer capacity (static; governs every buffer-width cost below):
    ``cap`` (explicit member capacity, clamped to NB) wins when given.
    Otherwise ``cap_frac`` selects it -- NOTE the value semantics at THIS
    layer: cap_frac > 1 is the latency-bounded buffer (NB // cap_frac,
    floor 4096); cap_frac <= 1 (INCLUDING 0) is FULL capacity;
    cap_frac < 0 pins the tiny test cap min(NB, -cap_frac). The host-API
    "cap_frac=0 means auto-sized" convention lives one layer up in
    encode_image_merged, which resolves it to an explicit ``cap`` before
    calling here -- passing 0 directly to this function or to
    encode_image_merged_fused_device silently means FULL capacity."""
    from jax import lax
    from .ops.segments import (
        fit_segments, find_shifts_segments, seg_mixed_all,
    )
    from .ops.factors import extract_factors, quantize_factors
    from .ops.dither import dither_crush
    from .ops.decode import decode_blocks
    from .ops.error import weighted_error

    ch = cfg.channels
    nb = seg_id.shape[-1]
    if use_kernel is None:
        use_kernel = jax.default_backend() != "cpu"

    # -- compact run blocks into a fixed-capacity buffer --------------------
    # Sorting by (is_run, seg_id) makes every segment's members CONTIGUOUS
    # in the buffer (stable sort; equal keys keep block order), which lets
    # all segment reductions run as doubling scans instead of TPU-hostile
    # scatters, and every per-member value IS its segment's value -- no
    # seg-id gathers (1-D gathers lower to ~1 ms serial loops on TPU).
    # Small/medium grids get FULL capacity (no run is ever dropped): the
    # fused segment kernel (encode_segments.py) made per-lane cost low enough
    # that only large grids bound the buffer, where nb/cap_frac bounds the
    # kernel + gather/scatter cost. A 301x437 CLI encode previously dropped
    # 978 of ~1500 run blocks at cap=522. Default cap_frac=8: on a 4K it
    # costs +0.026 bpp vs cap_frac=4 on run-heavy content (both caps
    # saturate there -- the linking predicate selects most blocks and the
    # bits guard rejects most candidates) while halving the coalesce pass
    # (tools/profiling/cap_frac_probe.py); truncation stays observable via
    # overflow_run_blocks/dropped_runs_at_capacity.
    # cap_frac > 1: latency-bounded buffer (nb // cap_frac); cap_frac <= 1:
    # FULL capacity (no run is ever dropped -- the segment kernel's
    # empty-window skip keeps its compute content-proportional, but the
    # buffer gather/scatter/scans still scale with nb: +9-13 ms per 4K,
    # tools/profiling/cap_full_probe.py). cap_frac < 0 pins an explicit
    # tiny cap for truncation tests.
    if cap is not None:
        cap = min(nb, cap)
    elif cap_frac < 0:
        cap = min(nb, -cap_frac)
    elif cap_frac <= 1 or nb <= 4096:
        cap = nb
    else:
        cap = max(4096, nb // cap_frac)
    sort_key = jnp.where(is_run, seg_id, jnp.int32(2**30))
    order = jnp.argsort(sort_key, stable=True)                   # runs first
    sel = order[:cap]                                            # (cap,)
    # batch the per-block 1-D row gathers into one multi-row plane gather
    # (the f32 dist row rides along bitcast to i32)
    rows_i = jnp.stack([
        seg_id, is_run.astype(jnp.int32), lv["bits"],
        lax.bitcast_convert_type(lv["dist"].astype(jnp.float32), jnp.int32),
    ] + ([] if mpos is None else [mpos]))[:, sel]                # (4|5, cap)
    seg_orig = rows_i[0]
    sel_is_run = rows_i[1].astype(bool)
    old_bits_sel = rows_i[2]
    # Morton-plane addresses of the selected blocks (== sel when the planes
    # are in original order)
    sel_p = rows_i[4] if mpos is not None else sel
    if header_bits is not None and not old_header_included:
        # lv["bits"] was computed with ONE static header estimate per member
        # (the dense per-level drivers: every member block is its own
        # region); swap in the real header so old and new costs use the
        # same units. Callers whose lv["bits"] already carry the real
        # header at region leaders only (the fused RD driver) pass
        # old_header_included=True to skip this per-member adjustment.
        old_bits_sel = old_bits_sel + (header_bits - static_block_bits(ch))
    old_dist_sel = lax.bitcast_convert_type(rows_i[3], jnp.float32)
    packed_c = packed_blk[:, sel_p]                              # (P, cap)
    if mask is None:
        # 8-aligned image: every selected block is fully valid (the fused
        # driver only materializes the Morton mask plane for edge-padded
        # images), so the member mask is just the run selector
        mask_c = jnp.broadcast_to(sel_is_run[None, :],
                                  (packed_c.shape[0], cap))
    else:
        mask_c = mask[:, sel_p].astype(bool) & sel_is_run[None, :]
    # contiguous remap: new id = first position of the segment in the buffer
    pos = jnp.arange(cap, dtype=jnp.int32)
    is_seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), seg_orig[1:] != seg_orig[:-1]]
    )
    seg_c = lax.cummax(jnp.where(is_seg_start, pos, -1))

    # The capacity boundary cuts a suffix of the sorted run blocks, so at
    # most ONE segment is split: the one whose members continue at the first
    # excluded position. It (and everything wholly beyond the boundary)
    # reverts -- and is counted, never silent.
    is_start = pos == seg_c
    if cap < nb:
        first_excl = order[cap]
        split_seg = jnp.where(is_run[first_excl], seg_id[first_excl],
                              jnp.int32(-1))
    else:
        split_seg = jnp.int32(-1)
    ok_c = sel_is_run & (seg_orig != split_seg)
    n_dropped_runs = (is_start & sel_is_run & (seg_orig == split_seg)).sum()
    n_overflow_blocks = is_run.sum() - sel_is_run.sum()

    # -- segment refit + factor extraction + crush + decode -----------------
    # everything below is per-member: fit/crush broadcast each segment's
    # result to all of its member positions (ops/segments.py contiguous mode)
    need_q = lv.get("q_packed") is not None
    old_bits_masked = jnp.where(sel_is_run, old_bits_sel, 0)
    if use_kernel:
        # the WHOLE re-encode in one fused kernel launch (bit-identical to
        # the jnp composition below on shifts/endpoints/decode; TPU-PRNG
        # dither instead of threefry -- see encode_segments.py)
        from .pallas_kernels.encode_fixed import KernelSpec
        from .pallas_kernels.encode_segments import segment_encode_pallas

        seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
        params = jnp.stack([
            seed,
            jnp.int32(cfg.max_pixel_bit_crush_error),
            jnp.int32(cfg.max_block_bit_crush_error),
        ])
        mask_ci = mask_c.astype(jnp.int32)
        (shifts_blk, q_packed_c, dec_packed_c, distb, count_blk_r,
         count_mem_r, *eps_avg) = segment_encode_pallas(
            packed_c, mask_ci, seg_c, params, KernelSpec.from_config(cfg),
            emit_q=need_q,
        )
        dist_blk = distb[0]
        count_blk = count_blk_r[0]
        count_mem = count_mem_r[0]
        d_blk = Decomposition(eps_avg[6], *eps_avg[:6])
        s_eff = jnp.minimum(shifts_blk, 8)
        fac_bits_blk = ((8 - s_eff) * count_blk[None]).sum(axis=0)
        header = static_block_bits(ch) if header_bits is None else header_bits
        bits_blk = fac_bits_blk + header * is_start.astype(jnp.int32)
        sums2 = seg_mixed_all(
            jnp.stack([fac_bits_blk, old_bits_masked]), seg_c, 2, 0,
        )
        bits_mem = sums2[0] + header
        old_bits_mem = sums2[1]
    else:
        px_c = jnp.stack([(packed_c >> (8 * c)) & 0xFF for c in range(ch)])
        d_blk = fit_segments(px_c, mask_c, seg_c, cap, ch, contiguous=True)
        if cfg.num_factors < 3:
            d_blk = drop_decomposition_axes(d_blk, cfg.num_factors)
        f8_u8 = quantize_factors(*extract_factors(px_c, d_blk, ch))
        shifts_blk, _ = find_shifts_segments(px_c, mask_c, f8_u8, d_blk, seg_c,
                                             cap, cfg, contiguous=True)
        if cfg.num_factors < 3:
            forced = jnp.asarray(
                [0] * cfg.num_factors + [8] * (3 - cfg.num_factors), jnp.int32
            )
            shifts_blk = jnp.maximum(shifts_blk, forced[:, None])
        f8 = jnp.stack([p.astype(jnp.int32) for p in f8_u8])
        q = dither_crush(key, f8, shifts_blk,
                         enabled=cfg.dithering and cfg.crush_bits)
        decoded = decode_blocks(q, shifts_blk, d_blk, ch)        # (ch, P, cap)
        q_packed_c = (q[0] + (q[1] << 8) + (q[2] << 16)) if need_q else None
        dec_packed_c = _pack_dec_jnp(decoded, ch)

        # -- per-block stats on the compacted buffer -------------------------
        mask_ci = mask_c.astype(jnp.int32)
        count_blk = mask_ci.sum(axis=0)                          # (cap,)
        err = (weighted_error(decoded, px_c) * mask_ci)
        dist_blk = err.astype(jnp.float32).sum(axis=0)
        s_eff = jnp.minimum(shifts_blk, 8)
        fac_bits_blk = ((8 - s_eff) * count_blk[None]).sum(axis=0)  # (cap,)
        header = static_block_bits(ch) if header_bits is None else header_bits
        bits_blk = fac_bits_blk + header * is_start.astype(jnp.int32)
        # count/bits/old-bits segment totals in ONE scan chain (seg_mixed_all)
        sums3 = seg_mixed_all(
            jnp.stack([count_blk, fac_bits_blk, old_bits_masked]), seg_c, 3, 0,
        )
        count_mem = sums3[0]
        bits_mem = sums3[1] + header
        old_bits_mem = sums3[2]
    bpp_mem = jnp.minimum(
        0xFF, (bits_mem + count_mem // 2) // jnp.maximum(count_mem, 1)
    )

    # -- acceptance ----------------------------------------------------------
    # Matching blocks can still cover *shifted* spans of the same color line;
    # refitting over the union extends the factor range and can cost more
    # factor bits than the amortized header saves (the reference pays this
    # silently, src/limg.cpp:1752-1761). Guard: a run is only kept when it
    # does not increase the bit cost (match policy) / the RD cost (rd).
    if merge_policy == "rd":
        sums_f = seg_mixed_all(
            jnp.stack([
                dist_blk,
                jnp.where(sel_is_run, old_bits_sel.astype(jnp.float32)
                          + rd_lambda * old_dist_sel, 0.0),
            ]),
            seg_c, 2, 0.0,
        )
        new_cost = bits_mem.astype(jnp.float32) + rd_lambda * sums_f[0]
        accept = ok_c & (new_cost <= sums_f[1])
    else:
        accept = ok_c & (bits_mem <= old_bits_mem)

    # -- write accepted run results back to the full block arrays -----------
    # TWO value-identical strategies, chosen by buffer width (static):
    #
    # WIDE buffers (cap >= nb/2, the auto path's run-heavy buckets): merge
    # by GATHER -- every destination column b takes src[:, rank(b)] where
    # rank = b's position in the sorted compaction order (the inverse
    # permutation, one extra ~0.1 ms argsort). The scatters this replaces
    # lowered to ~1.3 ms serial column loops EACH at full capacity (xplane
    # on a 4K: 3.3 ms across the three write-backs) while the equivalent
    # multi-row gathers run at ~0.2 ms; measured finish-stage device time
    # 12.45 -> 10.87 ms (tools/profiling/xplane_auto_cap.py).
    #
    # NARROW buffers (latency-bounded caps): scatter only the accepted
    # columns -- the gather merge always pays full nb-width src+dst+out
    # traffic (~1.5 ms on the 33 MB planes) while the scatter's serial-loop
    # cost scales with cap (~0.4 ms at nb/8); measured merged8 12.05
    # (scatter) vs 13.57 (gather).
    use_gather = 2 * cap >= nb
    lv = dict(lv)
    if need_q:
        # planes/serializer callers need the run's refit decomposition
        # written back (the LTP1 region headers decode with it); perf
        # callers don't read decomp after coalesce, and the 18 endpoint
        # rows were most of this write-back's assembly+layout cost
        src_i = jnp.concatenate([shifts_blk, bits_blk[None],
                                 bpp_mem[None], *d_blk[1:7]], axis=0)
        dst_i = jnp.concatenate([lv["shifts"], lv["bits"][None],
                                 lv["bpp_block"][None], *lv["decomp"][1:7]],
                                axis=0)
        src_f = jnp.concatenate([dist_blk[None], d_blk.avg], axis=0)
        dst_f = jnp.concatenate([lv["dist"][None], lv["decomp"].avg], axis=0)
    else:
        src_i = jnp.concatenate([shifts_blk, bits_blk[None],
                                 bpp_mem[None]], axis=0)
        dst_i = jnp.concatenate([lv["shifts"], lv["bits"][None],
                                 lv["bpp_block"][None]], axis=0)
        src_f = dist_blk[None]
        dst_f = lv["dist"][None]

    if use_gather:
        inv = jnp.argsort(order)                             # (nb,) rank
        took = inv < cap
        inv_c = jnp.minimum(inv, jnp.int32(cap - 1))
        acc_i = accept.astype(jnp.int32)[None]               # (1, cap)
        gi = jnp.concatenate([acc_i.astype(dst_i.dtype),
                              src_i.astype(dst_i.dtype)], axis=0)[:, inv_c]
        applied = took & (gi[0] > 0)                         # accept per block
        rows_new = jnp.where(applied[None], gi[1:], dst_i)
        f_new = jnp.where(applied[None], src_f[:, inv_c], dst_f)
        # big pixel planes: rank + accept travel to the planes' own lane
        # order (identity for plain block layout; the Morton embed is a pure
        # reshape/transpose whose grid-padding lanes zero-fill -> keep dst)
        pr = jnp.stack([inv_c, applied.astype(jnp.int32)])   # (2, nb)
        if embed_rows is not None:
            pr = embed_rows(pr)
        elif mpos is not None:
            raise ValueError("coalesce_segments: mpos without embed_rows")
        p_idx, p_ok = pr[0], (pr[1] > 0)[None]

        def merge_plane(dst, src_c):
            return jnp.where(p_ok, src_c[:, p_idx], dst)
    else:
        def put_at(idx, width):
            safe = jnp.where(accept, idx, jnp.int32(width))

            def put(dst, src_c):
                return dst.at[..., safe].set(src_c, mode="drop")
            return put

        put = put_at(sel, nb)
        merge_plane = put_at(sel_p, packed_blk.shape[-1])
        rows_new = put(dst_i, src_i.astype(dst_i.dtype))
        f_new = put(dst_f, src_f)
        applied = jnp.zeros((nb,), bool).at[sel].set(accept)

    if need_q:
        eps_new = rows_new[5:]
        lv["decomp"] = Decomposition(
            f_new[1:1 + ch],
            *(eps_new[ch * k:ch * (k + 1)] for k in range(6))
        )
    lv["shifts"], lv["bits"], lv["bpp_block"] = (
        rows_new[:3], rows_new[3], rows_new[4])
    lv["dist"] = f_new[0]

    lv["dec_packed"] = merge_plane(lv["dec_packed"], dec_packed_c)
    if need_q:
        # perf callers that consume neither planes nor serializer state skip
        # the crushed-factor plane entirely
        lv["q_packed"] = merge_plane(lv["q_packed"], q_packed_c)
    region_id = jnp.where(applied, seg_id, jnp.arange(nb, dtype=jnp.int32))
    n_runs = (is_start & accept).sum()
    stats = dict(
        dropped_runs_at_capacity=n_dropped_runs,
        overflow_run_blocks=n_overflow_blocks,
        rejected_runs=(is_start & sel_is_run & ~accept).sum() - n_dropped_runs,
    )
    return lv, applied, region_id, n_runs, stats


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_levels", "use_pallas", "emit_planes",
                     "merge_policy", "coalesce", "return_state",
                     "rd_header_bits", "cap_frac"),
)
def encode_image_merged_device(image: jnp.ndarray, cfg: EncodeConfig,
                               dither_key: jax.Array, num_levels: int = 3,
                               use_pallas: bool = False, emit_planes: bool = True,
                               merge_policy: str = "match",
                               rd_lambda: float = 0.01,
                               coalesce: bool = True,
                               return_state: bool = False,
                               rd_header_bits: int | None = None,
                               cap_frac: int = 8):
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
        # rd_header_bits swaps the reference's static estimate for the real
        # serialized header so the cut optimizes actual file size
        extra = (rd_header_bits - static_block_bits(ch)
                 if rd_header_bits is not None else 0.0)
        alive, merge_stats = rd_merge_keep(levels, grids, num_levels,
                                           rd_lambda, extra)
    else:
        alive, merge_stats = merge_levels_alive(decomps, grids, ch)
    owner_blocks = _owner_level(alive, grids, num_levels)          # (NB0,)
    owner_px = layout.broadcast_block_plane(owner_blocks, grids[0], BLOCK_SIZE)

    run_region_id = None
    run_applied = jnp.zeros((grids[0].num_blocks,), bool)
    n_runs = jnp.zeros((), jnp.int32)
    coalesce_stats = {}
    run_info = [None] * num_levels
    if coalesce:
        # coalesce EVERY level's leftover regions, not just level 0: on
        # large flat surfaces the quadtree leaves unmerged level-1/2 squares
        # whose headers the reference's unbounded grower would amortize
        # (src/limg.cpp:1390-1496)
        by0c, bx0c = grids[0].blocks_y, grids[0].blocks_x
        owner_grid_c = owner_blocks.reshape(by0c, bx0c)
        run_region_id = jnp.arange(grids[0].num_blocks, dtype=jnp.int32)
        hdr = rd_header_bits if merge_policy == "rd" else None
        for lvl in range(num_levels):
            owned_l = (owner_grid_c[:: 1 << lvl, :: 1 << lvl] == lvl).reshape(-1)
            ckey = jax.random.fold_in(dither_key, 0x0C0A1E5C + lvl)
            (levels[lvl], applied_l, rid_l, n_runs_l,
             stats_l) = coalesce_level_bands(
                image, levels[lvl], grids[lvl], owned_l, cfg, ckey,
                BLOCK_SIZE << lvl, merge_policy, rd_lambda, header_bits=hdr,
                cap_frac=cap_frac,
            )
            n_runs = n_runs + n_runs_l
            coalesce_stats = {
                k: coalesce_stats.get(k, 0) + v for k, v in stats_l.items()
            }
            run_info[lvl] = (applied_l, rid_l)
            # level-0 membership of the level-L runs (serializer state):
            # run id becomes the leader square's top-left level-0 block
            bxl = grids[lvl].blocks_x
            rid0 = (((rid_l // bxl) << lvl) * bx0c + ((rid_l % bxl) << lvl))
            sel0 = (owner_blocks == lvl) & _bcast0(applied_l, grids[lvl],
                                                   grids[0], lvl)
            run_applied = run_applied | sel0
            run_region_id = jnp.where(
                sel0, _bcast0(rid0, grids[lvl], grids[0], lvl), run_region_id
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
        coalesce_stats=coalesce_stats,
    )
    if emit_planes:
        out["factors"] = select(fac_imgs, "hwc")                   # (H, W, 3)
        out["shift"] = select(shift_imgs, "chw")                   # (3, H, W)
        out["bpp"] = select(bpp_imgs, "hw")                        # (H, W)
        region_ids = []
        offset = 0
        for lvl in range(num_levels):
            ids_blk = jnp.arange(grids[lvl].num_blocks, dtype=jnp.int32)
            if run_info[lvl] is not None:
                applied_l, rid_l = run_info[lvl]
                ids_blk = jnp.where(applied_l, rid_l, ids_blk)
            ids = layout.broadcast_block_plane(
                offset + ids_blk, grids[lvl], BLOCK_SIZE << lvl,
            )
            region_ids.append(ids)
            offset += grids[lvl].num_blocks
        out["region_id"] = select(region_ids, "hw")
    if return_state or emit_planes:
        # owner-level values broadcast down to each level-0 member block
        # (serializer state / endpoint debug planes)
        st_shifts = levels[0]["shifts"]
        st_eps = list(levels[0]["decomp"][1:7])
        st_q = levels[0]["q_packed"]
        yy0, xx0 = np.mgrid[0:by0, 0:bx0]
        for lvl in range(1, num_levels):
            anc = jnp.asarray(
                ((yy0 >> lvl) * grids[lvl].blocks_x + (xx0 >> lvl)).reshape(-1)
            )
            sel = (owner_blocks == lvl)[None]
            st_eps = [jnp.where(sel, e[:, anc], o)
                      for e, o in zip(levels[lvl]["decomp"][1:7], st_eps)]
            if return_state:
                st_shifts = jnp.where(sel, levels[lvl]["shifts"][:, anc],
                                      st_shifts)
                q_l0 = _q_level_to_block0(
                    levels[lvl]["q_packed"], grids[lvl], grids[0], lvl
                )
                st_q = jnp.where(sel, q_l0, st_q)
        if emit_planes:
            out["endpoint_rows"] = jnp.concatenate(st_eps, axis=0)
        if return_state:
            st_rr = (run_region_id if run_region_id is not None
                     else jnp.arange(grids[0].num_blocks, dtype=jnp.int32))
            out["ser_rows"] = jnp.concatenate(
                [owner_blocks[None], st_shifts, *st_eps,
                 st_rr[None], run_applied.astype(jnp.int32)[None]], axis=0
            )
            out["ser_q"] = st_q
    return out


def _build_runs_multilevel(owner0, avg0, ep_rows, lead0, grids, grid0,
                           num_levels: int, ch: int):
    """Multi-level run building shared by the fused match and RD drivers:
    link matching neighbor REGIONS at every level (level-L linking runs on
    tiny level-L rows), producing the segment map for ONE unified refit/
    crush pass at level-0 block granularity.

    Every level's match rows come from the OWNER-SELECTED rows: build_runs
    only links cells owned at that level, where the selected rows equal
    that level's own fit, so each level is a cheap 2-D strided slice -- the
    per-level leader-lane Morton restores and their serial ::4^l lane
    gathers this replaced measured ~0.9 ms per 4K
    (tools/profiling/xplane_detail.py). ``avg0`` is f32, so the stacked
    rows are already the f32 field-order array neighbor_pair_matches
    consumes (no per-level Decomposition re-concat, ~0.7 ms of update-slice
    glue per 4K). Returns (seg0, is_run0) at level-0 block granularity."""
    from .ops.segments import SEG_CAP

    by0, bx0 = grid0.blocks_y, grid0.blocks_x
    nb = grid0.num_blocks
    seg0 = lead0
    is_run0 = jnp.zeros((nb,), bool)
    d_ls, owned_ls = [], []
    big_rows = jnp.concatenate(
        [avg0.astype(jnp.float32)]
        + [r.astype(jnp.float32) for r in ep_rows], axis=0)      # (7ch, nb)
    big2d = big_rows.reshape(7 * ch, by0, bx0)
    for lvl in range(num_levels):
        s = 1 << lvl
        owned_ls.append(
            (_stride_take(owner0.reshape(by0, bx0), s) == lvl
             ).reshape(-1)
        )
        d_ls.append(_stride_take(big2d, s).reshape(7 * ch, -1) if lvl
                    else big_rows)
    # every level x direction in ONE 27-probe match evaluation
    matches_all = neighbor_pair_matches(d_ls, grids[:num_levels], ch)
    for lvl in range(num_levels):
        grid_l = grids[lvl]
        owned_l = owned_ls[lvl]
        # d_lvl is unused when matches are precomputed
        seg_l, len_l = build_runs(None, owned_l, grid_l, ch,
                                  max_members=SEG_CAP >> (2 * lvl),
                                  matches=matches_all[lvl])
        is_run_l = owned_l & (len_l >= 2)
        if lvl == 0:
            take = is_run_l & (owner0 == 0)
            seg0 = jnp.where(take, seg_l, seg0)
            is_run0 = is_run0 | take
        else:
            bxl = grid_l.blocks_x
            lead0_of = (((seg_l // bxl) << lvl) * bx0
                        + ((seg_l % bxl) << lvl))
            take = (owner0 == lvl) & _bcast0(is_run_l, grid_l, grid0, lvl)
            seg0 = jnp.where(
                take, _bcast0(lead0_of, grid_l, grid0, lvl), seg0
            )
            is_run0 = is_run0 | take
    return seg0, is_run0


def _coalesce_cap(cap_frac: int, nb: int) -> int:
    """Resolve the driver's ``cap_frac`` knob to a concrete run-buffer
    member capacity (the value semantics are documented on
    coalesce_segments): < 0 pins min(nb, -cap_frac); <= 1 or a small grid
    is FULL capacity; > 1 is the latency-bounded nb // cap_frac."""
    if cap_frac < 0:
        return min(nb, -cap_frac)
    if cap_frac <= 1 or nb <= 4096:
        return nb
    return max(4096, nb // cap_frac)


def _fused_hw(image, hw):
    """Concrete (h, w) for any of the fused driver's input forms."""
    if hw is not None:
        return hw
    if image.ndim == 4:                    # (by, 8, bx, 8) host word view
        return image.shape[0] * 8, image.shape[2] * 8
    return int(image.shape[0]), int(image.shape[1])


def _fused_pre_body(image, cfg: EncodeConfig, dither_key, num_levels: int,
                    coalesce: bool, need_q: bool, hw, fused_layout: str):
    """Stages A-E of the fused merged encode (trace-time body): input
    relayout, per-level fit + match + owner select in one kernel, owner-level
    crush, and run building. Returns the state dict consumed by
    _fused_finish_body. The split exists so the host can pick the coalesce
    buffer capacity from the measured run count (state["n_run_blocks"])
    and run the coalesce stage exactly once -- the old auto-capacity path
    re-ran fit/match/crush a second time whenever the fast buffer reported
    truncation (2.9x the pinned-cap latency on run-heavy 4Ks)."""
    from .pallas_kernels.encode_fixed import KernelSpec
    from .pallas_kernels import encode_merged as em
    from .pallas_kernels import encode_natural as en

    ch = cfg.channels
    if image.ndim == 4:
        # the free (by, 8, bx, 8) host view (layout.host_block_view); hw
        # carries the real extent for edge-padded images
        h, w = hw if hw is not None else (image.shape[0] * 8,
                                          image.shape[2] * 8)
        packed2d = image
    elif image.ndim == 2:
        h, w = image.shape
        packed2d = image
    elif image.shape[2] == 4:
        h, w = image.shape[:2]
        packed2d = jax.lax.bitcast_convert_type(image, jnp.int32)
    else:
        h, w = image.shape[:2]
        im = image.astype(jnp.int32)
        packed2d = im[..., 0] | (im[..., 1] << 8) | (im[..., 2] << 16)
    grid0 = layout.grid_for(h, w, BLOCK_SIZE)
    nb = grid0.num_blocks
    by0, bx0 = grid0.blocks_y, grid0.blocks_x
    aligned = h % BLOCK_SIZE == 0 and w % BLOCK_SIZE == 0

    kspec = KernelSpec.from_config(cfg)
    seed = jax.random.randint(dither_key, (), 0, 2**31 - 1, jnp.int32)
    params = jnp.stack([
        seed,
        jnp.int32(cfg.max_pixel_bit_crush_error),
        jnp.int32(cfg.max_block_bit_crush_error),
    ])
    interpret = jax.default_backend() == "cpu"
    need_q0 = need_q
    header = static_block_bits(ch)
    from .ops.segments import SEG_CAP

    grids = [layout.grid_for(h, w, BLOCK_SIZE << lvl) for lvl in range(num_levels)]
    use_natural = (fused_layout == "natural"
                   and num_levels <= en.MAX_NATURAL_LEVELS)

    if use_natural:
        # ---- natural (row-major) kernels: ZERO input relayouts -----------
        # the (H', W') padded word image is a free reshape of the 4-D host
        # view; per-block rows come out compact in row-major block order
        # (no to_orig restores), the decode/factor planes come out natural.
        if packed2d.ndim == 4:
            p2 = packed2d.reshape(by0 * 8, bx0 * 8)
        else:
            pad_y, pad_x = by0 * 8 - h, bx0 * 8 - w
            p2 = (jnp.pad(packed2d, ((0, pad_y), (0, pad_x)))
                  if (pad_y or pad_x) else packed2d)
        f8_sel_n, rows_all = en.fit_levels_natural(
            p2, params, kspec, num_levels, interpret, hw=(h, w))
        rows_nb = en.rows_to_blocks(rows_all, by0, bx0)
        cnt0 = rows_nb[0].astype(jnp.int32)
        ep_rows = [rows_nb[1 + ch * k:1 + ch * (k + 1)].astype(jnp.int32)
                   for k in range(6)]
        avg0 = rows_nb[1 + 6 * ch:1 + 7 * ch]
        owner0 = rows_nb[1 + 7 * ch].astype(jnp.int32)
        stats_row = rows_nb[2 + 7 * ch].astype(jnp.int32)
        merge_stats = []
        for lvl in range(1, num_levels):
            r = rows_nb[2 + 7 * ch + lvl].astype(jnp.int32)
            merge_stats.append({
                name: ((r & bit) != 0).sum()
                for name, bit in em.MATCH_REASON_BITS
            })
        # crush consumes the [owner]+eps slices of the fit's row plane
        # directly (f32, compact block layout -- no conversion/relayout)
        rows_in = jnp.concatenate(
            [rows_all[1 + 7 * ch:2 + 7 * ch], rows_all[1:1 + 6 * ch]], axis=0)
        q_nat, dec_nat, orows = en.owner_crush_natural(
            p2, f8_sel_n, rows_in, params, kspec, num_levels, interpret,
            hw=(h, w), emit_q=need_q0)
        orows_nb = en.rows_to_blocks(orows, by0, bx0)
        shifts0 = orows_nb[:3].astype(jnp.int32)
        distb0 = orows_nb[4]
        bpp0 = orows_nb[5].astype(jnp.int32)

        # the coalesce pass addresses per-block pixel COLUMNS; one fenced
        # blockify transpose (no Morton embed) per big plane replaces the
        # Morton path's blockify+embed+restore chain. The planes/serializer
        # consumers also want (64, NB) block layout for the factor plane.
        dec_blk = en.nat_blockify(dec_nat, by0, bx0) if coalesce else None
        q_blk = en.nat_blockify(q_nat, by0, bx0) if need_q0 else None
    else:
        # blockify + Morton embed as the two-pass reshape/transpose chain
        # (lane gathers lower to serial loops on TPU, and a fused
        # single-chain variant measured slower -- morton_blockify_packed
        # docstring). The validity mask is computed IN-KERNEL from (h, w)
        # iotas (no materialized 33 MB plane); only the coalesce pass of an
        # edge-padded image still needs the elementwise Morton-order plane.
        packed_m = em.morton_blockify_packed(packed2d, h, w, num_levels)
        mask_m = None if aligned else em.morton_mask(h, w, num_levels)

        def to_orig(x):
            return em.morton_restore_rows(x, by0, bx0, num_levels)

        # fit + merge decisions + owner in ONE kernel: the match predicate
        # runs on VMEM rows (butterfly child-0 broadcasts) instead of as
        # ~250 jnp ops over strided leader slices -- that glue measured
        # ~8 ms per 4K (tools/profiling/xplane_top.py). Empty (grid
        # padding) children auto-match as in the dense path.
        (cnt0_m, f8_sel, eps_sel_m, avg_sel_m, owner_row_m, stats_bits_m,
         reason_rows) = em.fit_levels_pallas(
            packed_m, params, kspec, num_levels, interpret, hw=(h, w),
            emit_match=True,
        )
        owner = owner_row_m[0]

        # reason rows leave the kernel masked to nonempty level-l leader
        # lanes (zero elsewhere), so each stat is a plain full-row bit count
        merge_stats = []
        for lvl in range(1, num_levels):
            r = reason_rows[lvl - 1][0]
            merge_stats.append({
                name: ((r & bit) != 0).sum()
                for name, bit in em.MATCH_REASON_BITS
            })

        # crush at the owner level; the owner select of factors/endpoints
        # ran inside the FIT kernel (per-level f8 planes never leave VMEM),
        # and the crush emits per-BLOCK dist/bpp rows -- everything
        # downstream works at flat level-0 block granularity
        owner_row = owner[None, :]
        eps_sel = list(eps_sel_m)
        (shifts_m, q_m, dec_m, dist_m, distb_m, bpp_m) = em.owner_crush_pallas(
            packed_m, owner_row, f8_sel, eps_sel_m,
            params, kspec, num_levels, interpret, hw=(h, w), emit_q=need_q0,
        )

        # ---- orig-order level-0 rows: one stacked restore for the small
        # rows, separate multi-row restores for the big pixel planes -------
        rows = to_orig(jnp.concatenate(
            [owner[None], cnt0_m, bpp_m, shifts_m, *eps_sel], axis=0,
        ))
        owner0, cnt0, bpp0, shifts0 = rows[0], rows[1], rows[2], rows[3:6]
        ep_rows = [rows[6 + ch * k:6 + ch * (k + 1)] for k in range(6)]
        frows = to_orig(jnp.concatenate([distb_m, avg_sel_m], axis=0))
        distb0, avg0 = frows[0], frows[1:1 + ch]
        # stats_row feeds popcounts only (order-free): keep Morton order
        stats_row = stats_bits_m[0]
    # the big (64, NBP) pixel planes STAY in Morton order through the
    # coalesce pass (which gathers/scatters them by Morton position via
    # ``mpos``), so each pays exactly one relayout: the composed
    # morton_unblockify at the end / one to_orig for the factor plane

    # per-block segment leader (square top-left / self) from host constants
    yy0, xx0 = np.mgrid[0:by0, 0:bx0]
    lead0 = jnp.asarray((yy0 * bx0 + xx0).reshape(-1).astype(np.int32))
    for lvl in range(1, num_levels):
        lp = ((((yy0 >> lvl) << lvl) * bx0)
              + ((xx0 >> lvl) << lvl)).reshape(-1).astype(np.int32)
        lead0 = jnp.where(owner0 == lvl, jnp.asarray(lp), lead0)
    s_eff0 = jnp.minimum(shifts0, 8)
    fac_bits0 = ((8 - s_eff0) * cnt0[None]).sum(axis=0)
    is_leader0 = lead0 == jnp.arange(nb, dtype=jnp.int32)
    bits0 = fac_bits0 + header * is_leader0.astype(jnp.int32)

    lv0 = dict(
        decomp=Decomposition(avg0, *ep_rows), shifts=shifts0,
        q_packed=(q_blk if use_natural else q_m) if need_q0 else None,
        dec_packed=dec_blk if use_natural else dec_m,
        dist=distb0, bits=bits0, bpp_block=bpp0,
        count=cnt0,
    )

    seg0 = is_run0 = None
    px_plane = mask_plane = None
    if coalesce:
        seg0, is_run0 = _build_runs_multilevel(
            owner0, avg0, ep_rows, lead0, grids, grid0, num_levels, ch)
        # the planes the coalesce stage will gather from (stage F consumes
        # them via the state dict; nothing in this stage reads them)
        if use_natural:
            # natural planes are addressed by plain block index: one fenced
            # blockify transpose of the input (no Morton embed, no mpos
            # indirection, and the member mask comes from the run selector /
            # an elementwise natural-order plane for edge-padded images)
            px_plane = en.nat_blockify(p2, by0, bx0)
            mask_plane = (None if aligned
                          else en.natural_mask_plane(h, w, by0, bx0))
        else:
            px_plane = packed_m
            mask_plane = mask_m

    return dict(
        lv0=lv0, px=px_plane, mask=mask_plane, seg0=seg0, is_run0=is_run0,
        # the host-side auto-capacity decision reads this ONE scalar: with
        # cap >= n_run_blocks the sorted compaction keeps every run block,
        # so truncation is impossible by construction
        n_run_blocks=(is_run0.sum().astype(jnp.int32) if coalesce
                      else jnp.zeros((), jnp.int32)),
        owner0=owner0, lead0=lead0, stats_row=stats_row,
        merge_stats=merge_stats,
        dec_nat=(dec_nat if use_natural and not coalesce else None),
    ), (h, w)


def _fused_finish_body(state, cfg: EncodeConfig, dither_key, num_levels: int,
                       emit_planes: bool, coalesce: bool, return_state: bool,
                       hw, fused_layout: str, cap: int,
                       merge_policy: str = "match", rd_lambda=0.0,
                       header_bits: int | None = None):
    """Stages F-G of the fused merged encode: the coalesce pass at an
    explicit run-buffer member capacity, then stats + plane/serializer
    emission. ``fused_layout="block"`` means the state's pixel planes are
    in plain row-major block order, like "natural" (the fused RD driver's
    layout); "morton" planes are addressed through the Morton position
    row. For merge_policy="rd" the state's lv0 bits already carry the real
    header at region leaders (old_header_included)."""
    from .pallas_kernels import encode_merged as em
    from .pallas_kernels import encode_natural as en

    ch = cfg.channels
    h, w = hw
    grid0 = layout.grid_for(h, w, BLOCK_SIZE)
    nb = grid0.num_blocks
    by0, bx0 = grid0.blocks_y, grid0.blocks_x
    use_natural = (fused_layout == "natural"
                   and num_levels <= en.MAX_NATURAL_LEVELS)
    plain_layout = use_natural or fused_layout == "block"
    need_q0 = emit_planes or return_state

    lv0 = dict(state["lv0"])
    owner0, lead0 = state["owner0"], state["lead0"]
    stats_row = state["stats_row"]
    merge_stats = state["merge_stats"]
    cnt0 = lv0["count"]
    dec_nat = state["dec_nat"]

    def to_orig(x):
        return em.morton_restore_rows(x, by0, bx0, num_levels)

    run_region_id = None
    n_runs = jnp.zeros((), jnp.int32)
    run_applied = jnp.zeros((nb,), bool)
    coalesce_stats = {}
    if coalesce:
        ckey = jax.random.fold_in(dither_key, 0x0C0A1E5C)
        if plain_layout:
            mpos = None
        else:
            # Morton position of each original block: the coalesce engine
            # maps its selected block indices through this row to address
            # the Morton-layout pixel planes (host constant; rides the
            # multi-row index gather)
            perm_m, _, _ = em.morton_perm(by0, bx0, num_levels)
            valid_p = perm_m >= 0
            mpos_np = np.zeros(nb, np.int32)
            mpos_np[perm_m[valid_p]] = np.nonzero(valid_p)[0].astype(np.int32)
            mpos = jnp.asarray(mpos_np)
        (lv0, run_applied, run_region_id, n_runs,
         coalesce_stats) = coalesce_segments(
            state["px"], state["mask"], state["seg0"], state["is_run0"],
            lv0, cfg, ckey, merge_policy, rd_lambda, mpos=mpos, cap=cap,
            header_bits=header_bits,
            old_header_included=merge_policy == "rd",
            embed_rows=(None if plain_layout else (
                lambda r: em.morton_embed_rows(r, by0, bx0, num_levels))),
        )

    # ---- stats: flat level-0 sums (region values broadcast per block) ------
    s_eff0 = jnp.minimum(lv0["shifts"], 8)
    accum_bits = ((8 - s_eff0) * cnt0[None]).sum(axis=1)
    one_hot = s_eff0[:, None, :] == jnp.arange(9)[None, :, None]
    bits_histogram = (one_hot * cnt0[None, None, :]).sum(axis=2)
    total_err = lv0["dist"].sum()
    bpp_weighted = (lv0["bpp_block"].astype(jnp.float32) * cnt0).sum()
    # bit l of the kernel's stats row marks a nonempty level-l leader block
    # whose group merged to >= l, so each per-level region count is a plain
    # full-row popcount of that bit (no strided leader slices)
    merged_counts = jnp.asarray([
        ((stats_row >> l) & 1).sum() for l in range(num_levels)
    ])

    # the decode plane leaves as the packed (by, 8, bx, 8) i32 word view:
    # its row-major bytes ARE the (by*8, bx*8) image (the host reshapes +
    # crops for free, then unpacks channels with a numpy byte view); the
    # (H, W) form would pay a second 33 MB T(8,128) retile pass on device
    # (reshape.215 in tools/profiling/xplane_detail.py, ~0.8 ms per 4K).
    if plain_layout:
        if lv0["dec_packed"] is not None:
            # coalesce scattered run decodes into the blockified plane
            dec_plane = en.nat_unblockify(lv0["dec_packed"], by0, bx0)
        else:
            dec_plane = jax.lax.optimization_barrier(
                dec_nat.reshape(by0, 8, bx0, 8))
        q0 = lv0["q_packed"] if need_q0 else None
    else:
        dec_plane = em.morton_unblockify(lv0["dec_packed"], h, w, num_levels,
                                         as_4d=True)
        q0 = to_orig(lv0["q_packed"]) if need_q0 else None

    out = dict(
        decoded_words=dec_plane,
        accum_bits=accum_bits,
        bits_histogram=bits_histogram,
        alive_counts=merged_counts,
        mean_bpp=bpp_weighted / (h * w),
        total_err=total_err,
        merge_stats=merge_stats,
        n_runs=n_runs,
        coalesce_stats=coalesce_stats,
    )
    if emit_planes:
        # per-block endpoint rows for the 6 endpoint-color debug planes
        # (src/main.cpp:363-368); the CLI broadcasts them to pixels on host
        out["endpoint_rows"] = jnp.concatenate(list(lv0["decomp"][1:7]), axis=0)
        # per-block-constant planes (shift/bpp/owner/region-id) ship as
        # (rows, NB) -- ~1 MB on a 4K; the host wrapper expands them with
        # np.repeat. Broadcasting them to pixels on device cost ~73 MB of
        # HBM writes + tunnel transfer per encode for bytes that are pure
        # 8x8 repetition.
        rid_blk = (jnp.where(run_applied, run_region_id, lead0)
                   if run_region_id is not None else lead0)
        out["block_rows8"] = jnp.concatenate([
            s_eff0, lv0["bpp_block"][None], owner0[None]
        ], axis=0).astype(jnp.uint8)                      # (5, NB)
        out["region_rows"] = owner0 * nb + rid_blk        # (NB,) i32
        # factors ship block-major (3, P, NB) u8: the device-side unblockify
        # relayout of a non-row-major u8 plane lowers poorly on TPU (CLAUDE.md
        # perf lore) and the bytes are the same; the host wrapper restores
        # (H, W, 3) with a numpy transpose
        q = jnp.stack([(q0 >> (8 * k)) & 0xFF for k in range(3)])
        out["factors_pnb"] = ((q << s_eff0[:, None, :]) & 0xFF).astype(jnp.uint8)
    if return_state:
        # LTP1 serializer state: owner level, owner-region shifts/endpoints
        # (broadcast to member blocks; run refits applied), crushed factors,
        # and the run segmentation -- all level-0, original order
        st_rr = (run_region_id if run_region_id is not None
                 else jnp.arange(nb, dtype=jnp.int32))
        out["ser_rows"] = jnp.concatenate(
            [owner0[None], lv0["shifts"], *lv0["decomp"][1:7],
             st_rr[None], run_applied.astype(jnp.int32)[None]], axis=0
        )
        # ship the factor planes as (3, P, NB) u8 -- 25 MB instead of the
        # 33 MB packed-i32 row on a 4K; the host<->device link dominates
        # serialize wall time on tunneled setups
        out["ser_q"] = jnp.stack(
            [(q0 >> (8 * k)).astype(jnp.uint8) for k in range(3)]
        )
    return out


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_levels", "emit_planes", "coalesce",
                     "return_state", "hw", "cap_frac", "fused_layout"),
)
def encode_image_merged_fused_device(image: jnp.ndarray, cfg: EncodeConfig,
                                     dither_key: jax.Array, num_levels: int = 3,
                                     emit_planes: bool = True,
                                     coalesce: bool = True,
                                     return_state: bool = False,
                                     hw: tuple | None = None,
                                     cap_frac: int = 8,
                                     fused_layout: str = "morton"):
    """Merged encode via the fused kernels (match policy), as ONE jitted
    graph (stage bodies _fused_pre_body + _fused_finish_body traced
    together -- identical to the pre-split single function).

    Functionally equivalent to ``encode_image_merged_device(...,
    use_pallas=True, merge_policy="match")`` but ~2.5x faster: every level's
    fit runs in ONE kernel pass (butterfly group reductions) and the
    expensive crush/dither/decode runs exactly once per pixel at each
    block's owner level, instead of densely at every level.

    ``cap_frac`` picks the coalesce run-buffer capacity DIRECTLY at this
    layer (no auto-sizing): 0 and 1 both mean FULL capacity here; the
    "0 = auto-sized buffer" convention lives in encode_image_merged, which
    resolves it against the measured run count via the split entry points
    (fused_merged_pre / fused_merged_finish) before any capacity is fixed.

    ``fused_layout`` selects the kernel layout: "natural" keeps every
    kernel in the image's own row-major layout (pallas_kernels/
    encode_natural.py -- zero Morton relayouts, rows come out in row-major
    block order); "morton" is the Z-order lane pipeline
    (pallas_kernels/encode_merged.py). Reduction-tree order differs from
    the dense path either way, so parity is owner-map/PSNR/bpp-level, not
    bitwise.
    """
    need_q = emit_planes or return_state
    state, hw_real = _fused_pre_body(image, cfg, dither_key, num_levels,
                                     coalesce, need_q, hw, fused_layout)
    nb = layout.grid_for(*hw_real, BLOCK_SIZE).num_blocks
    return _fused_finish_body(state, cfg, dither_key, num_levels, emit_planes,
                              coalesce, return_state, hw_real, fused_layout,
                              _coalesce_cap(cap_frac, nb))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_levels", "need_q", "hw", "fused_layout"),
)
def fused_merged_pre(image: jnp.ndarray, cfg: EncodeConfig,
                     dither_key: jax.Array, num_levels: int = 3,
                     need_q: bool = True, hw: tuple | None = None,
                     fused_layout: str = "morton"):
    """Stages A-E of the fused merged encode as their own jitted graph
    (coalesce run building included). Pair with fused_merged_finish; the
    state dict's ``n_run_blocks`` scalar is the host's input for sizing the
    coalesce buffer exactly (encode_image_merged's cap_frac=0 auto mode)."""
    state, _ = _fused_pre_body(image, cfg, dither_key, num_levels,
                               True, need_q, hw, fused_layout)
    return state


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_levels", "emit_planes", "return_state",
                     "hw", "fused_layout", "cap"),
)
def fused_merged_finish(state, cfg: EncodeConfig, dither_key: jax.Array,
                        num_levels: int, emit_planes: bool,
                        return_state: bool, hw: tuple, fused_layout: str,
                        cap: int):
    """Stages F-G (coalesce at an explicit member capacity + emission) on a
    fused_merged_pre state. Bit-identical to the single-call function at
    the same capacity: the stage boundary only materializes arrays that the
    kernels materialized anyway."""
    return _fused_finish_body(state, cfg, dither_key, num_levels, emit_planes,
                              True, return_state, hw, fused_layout, cap)


def _rd_pre_body(image, cfg: EncodeConfig, dither_key, num_levels: int,
                 need_q: bool, hw, rd_lambda, header_bits: int | None):
    """Stages A-E of the fused RD merged encode (trace-time body).

    The RD cut needs every level's real bits and distortion
    (src/limg.cpp:1629-1636 bits estimate, :2455-2491 metric), so unlike the
    match policy it cannot crush once at the owner level: each level runs
    through the fused fixed-grid kernel (fit+crush+decode in ONE launch per
    level), the quadtree cut is a tiny row DP (rd_merge_keep), and the
    owner's planes are selected at level-0 block granularity with pure
    relayouts -- no (H, W)-image-level selects, no Morton embed. This is
    the device-speed replacement for the dense encode_image_merged_device
    RD path, whose giant glue graph could not be compiled for 4K on the
    tunneled TPU (STATUS r4 item 7)."""
    ch = cfg.channels
    h, w = _fused_hw(image, hw)
    grid0 = layout.grid_for(h, w, BLOCK_SIZE)
    nb = grid0.num_blocks
    by0, bx0 = grid0.blocks_y, grid0.blocks_x
    aligned = h % BLOCK_SIZE == 0 and w % BLOCK_SIZE == 0

    # normalize input to the 8-padded (by0*8, bx0*8) word plane (every
    # level blockifies from this one plane; the 4-D host view reshape is
    # free)
    if image.ndim == 4:
        p2 = image.reshape(by0 * 8, bx0 * 8)
    else:
        if image.ndim == 2:
            packed2d = image
        elif image.shape[2] == 4:
            packed2d = jax.lax.bitcast_convert_type(image, jnp.int32)
        else:
            im = image.astype(jnp.int32)
            packed2d = im[..., 0] | (im[..., 1] << 8) | (im[..., 2] << 16)
        pad_y, pad_x = by0 * 8 - h, bx0 * 8 - w
        p2 = (jnp.pad(packed2d, ((0, pad_y), (0, pad_x)))
              if (pad_y or pad_x) else packed2d)

    keys = jax.random.split(dither_key, num_levels)
    grids, levels = [], []
    for lvl in range(num_levels):
        lv = _encode_level_pallas(p2, BLOCK_SIZE << lvl, cfg, keys[lvl],
                                  hw=(h, w))
        grids.append(lv.pop("grid"))
        levels.append(lv)

    hdr = static_block_bits(ch) if header_bits is None else header_bits
    keep, merge_stats = rd_merge_keep(levels, grids, num_levels, rd_lambda,
                                      float(hdr - static_block_bits(ch)))
    owner0 = _owner_level(keep, grids, num_levels)                # (NB0,)

    # ---- owner-selected rows/planes at level-0 block granularity ----------
    # per-level rows broadcast down with repeat+crop (_bcast0, no gathers);
    # the per-level pixel planes relayout level-L blocks into their level-0
    # sub-blocks with pure reshape/transposes (_q_level_to_block0)
    yy0, xx0 = np.mgrid[0:by0, 0:bx0]
    shifts0 = levels[0]["shifts"]
    eps0 = list(levels[0]["decomp"][1:7])
    avg0 = levels[0]["decomp"].avg
    q0 = levels[0]["q_packed"] if need_q else None
    dec0 = levels[0]["dec_packed"]
    dist0 = levels[0]["dist"]
    cnt0 = levels[0]["count"]
    rbits0 = levels[0]["bits"]
    rcnt0 = cnt0
    for lvl in range(1, num_levels):
        sel = (owner0 == lvl)[None]                               # (1, NB0)
        glvl = grids[lvl]

        def b0(v, lvl=lvl, glvl=glvl):
            return _bcast0(v, glvl, grid0, lvl)

        shifts0 = jnp.where(sel, b0(levels[lvl]["shifts"]), shifts0)
        eps0 = [jnp.where(sel, b0(e), o)
                for e, o in zip(levels[lvl]["decomp"][1:7], eps0)]
        avg0 = jnp.where(sel, b0(levels[lvl]["decomp"].avg), avg0)
        if need_q:
            q0 = jnp.where(sel, _q_level_to_block0(
                levels[lvl]["q_packed"], glvl, grid0, lvl), q0)
        dec0 = jnp.where(sel, _q_level_to_block0(
            levels[lvl]["dec_packed"], glvl, grid0, lvl), dec0)
        # region totals park on the region's leader level-0 block so that
        # level-0 segment sums reproduce region sums exactly (runs always
        # contain whole regions)
        lmask = jnp.asarray(
            ((yy0 % (1 << lvl) == 0) & (xx0 % (1 << lvl) == 0)).reshape(-1))
        dist0 = jnp.where(sel[0],
                          jnp.where(lmask, b0(levels[lvl]["dist"]), 0.0),
                          dist0)
        rbits0 = jnp.where(sel[0], b0(levels[lvl]["bits"]), rbits0)
        rcnt0 = jnp.where(sel[0], b0(levels[lvl]["count"]), rcnt0)

    lead0 = jnp.asarray((yy0 * bx0 + xx0).reshape(-1).astype(np.int32))
    for lvl in range(1, num_levels):
        lp = ((((yy0 >> lvl) << lvl) * bx0)
              + ((xx0 >> lvl) << lvl)).reshape(-1).astype(np.int32)
        lead0 = jnp.where(owner0 == lvl, jnp.asarray(lp), lead0)
    is_leader0 = lead0 == jnp.arange(nb, dtype=jnp.int32)
    s_eff0 = jnp.minimum(shifts0, 8)
    fac_bits0 = ((8 - s_eff0) * cnt0[None]).sum(axis=0)
    # the real header at region leaders ONLY (coalesce_segments is told via
    # old_header_included that no per-member adjustment applies)
    bits0 = fac_bits0 + hdr * is_leader0.astype(jnp.int32)
    # per-block bpp = its owning REGION's bpp (region bits over region
    # pixels), mirroring the dense path's per-region bpp_block broadcast.
    # NOTE the reported bpp stat keeps the reference's STATIC header
    # estimate (src/limg.cpp:1629-1636) like every other path/column --
    # the real serialized header only steers the DP cut and the coalesce
    # acceptance; reporting it here once inflated the rd column by
    # ~0.56 bpp vs the match column at equal encodes
    bpp0 = jnp.minimum(
        0xFF, (rbits0 + rcnt0 // 2) // jnp.maximum(rcnt0, 1))

    # the fused stats row, synthesized: bit l marks a level-l-aligned
    # level-0 leader whose owner merged to >= l (popcount = region count)
    stats_row = jnp.zeros((nb,), jnp.int32)
    for lvl in range(num_levels):
        lmask = jnp.asarray(
            ((yy0 % (1 << lvl) == 0) & (xx0 % (1 << lvl) == 0)).reshape(-1))
        stats_row = stats_row | jnp.where(
            lmask & (owner0 >= lvl), jnp.int32(1 << lvl), 0)

    lv0 = dict(
        decomp=Decomposition(avg0, *eps0), shifts=shifts0,
        q_packed=q0, dec_packed=dec0, dist=dist0, bits=bits0,
        bpp_block=bpp0, count=cnt0,
    )
    seg0, is_run0 = _build_runs_multilevel(
        owner0, avg0, eps0, lead0, grids, grid0, num_levels, ch)
    px_plane, mask0, _ = layout.blockify_packed(p2, BLOCK_SIZE, hw=(h, w))
    return dict(
        lv0=lv0, px=px_plane, mask=None if aligned else mask0.astype(bool),
        seg0=seg0, is_run0=is_run0,
        n_run_blocks=is_run0.sum().astype(jnp.int32),
        owner0=owner0, lead0=lead0, stats_row=stats_row,
        merge_stats=merge_stats, dec_nat=None,
    ), (h, w)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_levels", "emit_planes", "coalesce",
                     "return_state", "hw", "cap_frac", "header_bits"),
)
def encode_image_merged_rd_device(image: jnp.ndarray, cfg: EncodeConfig,
                                  dither_key: jax.Array, rd_lambda,
                                  num_levels: int = 3,
                                  emit_planes: bool = True,
                                  coalesce: bool = True,
                                  return_state: bool = False,
                                  hw: tuple | None = None,
                                  cap_frac: int = 8,
                                  header_bits: int | None = None):
    """RD-policy merged encode on the fused kernel path, as ONE jitted
    graph. Per-level fit+crush through the fused fixed kernel, RD quadtree
    cut (rd_merge_keep), owner select at block granularity, unified
    coalesce with the RD acceptance guard. ``header_bits`` feeds the real
    serialized region header so the cut optimizes actual file size."""
    need_q = emit_planes or return_state
    state, hw_real = _rd_pre_body(image, cfg, dither_key, num_levels,
                                  need_q, hw, rd_lambda, header_bits)
    nb = layout.grid_for(*hw_real, BLOCK_SIZE).num_blocks
    return _fused_finish_body(state, cfg, dither_key, num_levels, emit_planes,
                              coalesce, return_state, hw_real, "block",
                              _coalesce_cap(cap_frac, nb), merge_policy="rd",
                              rd_lambda=rd_lambda, header_bits=header_bits)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_levels", "need_q", "hw", "header_bits"),
)
def fused_rd_pre(image: jnp.ndarray, cfg: EncodeConfig,
                 dither_key: jax.Array, rd_lambda, num_levels: int = 3,
                 need_q: bool = True, hw: tuple | None = None,
                 header_bits: int | None = None):
    """Stages A-E of the fused RD merged encode as their own jitted graph
    (see fused_merged_pre for the split rationale)."""
    state, _ = _rd_pre_body(image, cfg, dither_key, num_levels, need_q, hw,
                            rd_lambda, header_bits)
    return state


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_levels", "emit_planes", "return_state",
                     "hw", "cap", "header_bits"),
)
def fused_rd_finish(state, cfg: EncodeConfig, dither_key: jax.Array,
                    rd_lambda, num_levels: int, emit_planes: bool,
                    return_state: bool, hw: tuple, cap: int,
                    header_bits: int | None = None):
    """Stages F-G of the fused RD merged encode on a fused_rd_pre state."""
    return _fused_finish_body(state, cfg, dither_key, num_levels, emit_planes,
                              True, return_state, hw, "block", cap,
                              merge_policy="rd", rd_lambda=rd_lambda,
                              header_bits=header_bits)


def auto_run_capacity(n_run_blocks: int, nb: int) -> int:
    """Bucketed coalesce capacity for the measured run count: the smallest
    power-of-two bucket (floor 4096) holding every run block, clamped to
    NB. Buckets bound recompilation (one finish graph per bucket) while the
    buffer-width costs stay within 2x of minimal."""
    if n_run_blocks <= 0:
        return min(nb, 4096)
    return min(nb, max(4096, 1 << (int(n_run_blocks) - 1).bit_length()))


def encode_image_merged(image, cfg: EncodeConfig, seed: int = 0, num_levels: int = 3,
                        fetch_planes: bool = True, use_pallas: bool | None = None,
                        merge_policy: str = "match", rd_lambda: float = 0.01,
                        coalesce: bool = True, fused: bool | None = None,
                        return_state: bool = False,
                        rd_header_bits: int | None = None,
                        fetch_decoded: bool = True,
                        cap_frac: int = 0,
                        fused_layout: str = "morton"):
    """Host-facing merged encode. Output surface mirrors
    limg_blocked_encode3d_info (src/limg.h:39-44) + stats.

    ``fetch_planes=False`` keeps the big per-pixel planes on device and
    returns only the decoded image + scalar stats -- device->host transfers
    dominate wall time on tunneled TPU setups. ``fused`` selects the
    single-crush-pass Morton-layout path (encode_image_merged_fused_device);
    by default it is used whenever it applies (pallas backend, match policy)
    -- the RD policy needs dense per-level costs and stays on the dense path.
    ``return_state=True`` additionally returns the LTP1 serializer state of
    THIS encode (bitstream.serialize_from_state input) as a second value, so
    writing a stream never re-encodes. ``rd_header_bits`` feeds the RD cut
    the real serialized header cost instead of the reference's estimate.
    ``cap_frac=0`` (default, fused path) is AUTO run-buffer capacity, sized
    in ONE pass: the fit/match/crush/run-building stages run once
    (fused_merged_pre), the host reads the measured run-block count, and
    the coalesce stage runs once with the smallest buffer bucket that holds
    every run block -- so no run is ever dropped (the reference's region
    growth is unbounded, src/limg.cpp:1294-1496) and photo-like content
    pays only the smallest bucket. Explicit cap_frac >= 1 pins the buffer
    (single fused graph, may truncate -- truncation stays observable via
    coalesce_stats).
    """
    from .pallas_kernels.encode_merged import MAX_FUSED_LEVELS

    key = jax.random.PRNGKey(seed)
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if fused is None:
        fused = (use_pallas and merge_policy in ("match", "rd")
                 and 2 <= num_levels <= MAX_FUSED_LEVELS)
    hw = None
    if (fused and isinstance(image, np.ndarray)
            and ((image.ndim == 3 and image.shape[2] == 4
                  and image.dtype == np.uint8)
                 or (image.ndim == 2 and image.dtype == np.int32))):
        # free host-side reinterpretation to the (by, 8, bx, 8) word view
        # (layout.host_block_view): packing is a byte view and the 4-D view
        # skips the on-device (H, W) -> 4-D retile pass; an in-graph bitcast
        # would make XLA re-lay out the whole u8 image first
        image, h0, w0 = layout.host_block_view(image)
        hw = (h0, w0)
    else:
        image = jnp.asarray(image)
    if fused:
        auto_cap = cap_frac == 0 and coalesce
        rd = merge_policy == "rd"
        lam = jnp.float32(rd_lambda)
        if auto_cap:
            # auto capacity in ONE pass: run stages A-E once, read the
            # measured run-block count, size the coalesce buffer to hold
            # EVERY run block, and run the coalesce stage once. Photo-like
            # content lands in the smallest bucket (cheaper than the old
            # latency-bounded default); run-heavy content pays the wide
            # buffer exactly once instead of the old full re-encode retry
            # (which cost 2.9x the pinned-cap latency on the bench 4K).
            hw_real = _fused_hw(image, hw)
            need_q = fetch_planes or return_state
            if rd:
                state = fused_rd_pre(image, cfg, key, lam, num_levels,
                                     need_q=need_q, hw=hw,
                                     header_bits=rd_header_bits)
            else:
                state = fused_merged_pre(image, cfg, key, num_levels,
                                         need_q=need_q, hw=hw,
                                         fused_layout=fused_layout)
            n_run = int(np.asarray(state["n_run_blocks"]))
            nb = layout.grid_for(*hw_real, BLOCK_SIZE).num_blocks
            cap = auto_run_capacity(n_run, nb)
            if rd:
                out = fused_rd_finish(
                    state, cfg, key, lam, num_levels, fetch_planes,
                    return_state, hw_real, cap, header_bits=rd_header_bits,
                )
            else:
                out = fused_merged_finish(
                    state, cfg, key, num_levels, fetch_planes, return_state,
                    hw_real, fused_layout, cap,
                )
        elif rd:
            out = encode_image_merged_rd_device(
                image, cfg, key, lam, num_levels, emit_planes=fetch_planes,
                coalesce=coalesce, return_state=return_state, hw=hw,
                cap_frac=cap_frac if cap_frac != 0 else 1,
                header_bits=rd_header_bits,
            )
        else:
            out = encode_image_merged_fused_device(
                image, cfg, key, num_levels, emit_planes=fetch_planes,
                coalesce=coalesce, return_state=return_state, hw=hw,
                cap_frac=cap_frac if cap_frac != 0 else 1,
                fused_layout=fused_layout,
            )
    else:
        # the dense path has no split auto mode: cap_frac=0 resolves to FULL
        # capacity per level (no run ever dropped, matching the fused
        # default's invariant at a latency cost on big grids)
        out = encode_image_merged_device(
            image, cfg, key, num_levels, use_pallas, emit_planes=fetch_planes,
            merge_policy=merge_policy, rd_lambda=rd_lambda, coalesce=coalesce,
            return_state=return_state, rd_header_bits=rd_header_bits,
            cap_frac=1 if cap_frac == 0 else cap_frac,
        )
    from .ops.error import max_possible_error

    h_img, w_img = hw if hw is not None else (
        int(image.shape[0]), int(image.shape[1]))
    n = h_img * w_img
    mse = float(out["total_err"]) / n
    psnr = 10.0 * np.log10(max_possible_error(cfg.channels) / max(mse, 1e-12))
    mean_bpp = out["mean_bpp"]

    if not fetch_decoded:
        # serialize-only callers skip the big decoded-image fetch (33 MB on
        # a 4K; the tunnel transfer dominates the whole serialize)
        decoded_np = None
    elif "decoded_words" in out:
        decoded_np = np.ascontiguousarray(np.asarray(out["decoded_words"]))
        if decoded_np.ndim == 4:
            # fused path ships the uncropped (by, 8, bx, 8) word view; its
            # row-major bytes are the image, so this reshape is free (the
            # crop only slices the u8 view)
            by4, _, bx4, _ = decoded_np.shape
            decoded_np = decoded_np.reshape(by4 * 8, bx4 * 8)
            decoded_np = decoded_np.view(np.uint8).reshape(
                by4 * 8, bx4 * 8, 4)[:h_img, :w_img]
        else:
            decoded_np = decoded_np.view(np.uint8).reshape(
                *decoded_np.shape, 4)
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
        coalesce_stats={
            k: int(np.asarray(v)) for k, v in out["coalesce_stats"].items()
        },
    )
    if fetch_planes:
        if "block_rows8" in out:
            # fused path ships per-block rows; expand the 8x8-constant
            # planes host-side (pure np.repeat -- the device-side broadcast
            # plus transfer of ~73 MB/4K was most of the emit_planes cost)
            h, w = h_img, w_img
            by, bx = -(-h // BLOCK_SIZE), -(-w // BLOCK_SIZE)

            def expand(rows):
                v = np.asarray(rows).reshape(-1, by, bx)
                v = np.repeat(np.repeat(v, BLOCK_SIZE, 1), BLOCK_SIZE, 2)
                return v[:, :h, :w]

            # block-major factor planes -> (H, W, 3) on host (mirror of
            # layout.unblockify, pure numpy)
            f = np.asarray(out["factors_pnb"]).reshape(
                3, BLOCK_SIZE, BLOCK_SIZE, by, bx
            )
            factors = f.transpose(3, 1, 4, 2, 0).reshape(
                by * BLOCK_SIZE, bx * BLOCK_SIZE, 3
            )[:h, :w]
            rows8 = np.asarray(out["block_rows8"])
            np_out.update(
                factors=factors,
                shift=expand(rows8[:3]),
                bpp=expand(rows8[3])[0],
                region_id=expand(np.asarray(out["region_rows"]))[0],
                owner_px=expand(rows8[4])[0],
                endpoint_rows=np.asarray(out["endpoint_rows"]),
            )
        else:
            np_out.update(
                factors=np.asarray(out["factors"]),
                shift=np.asarray(out["shift"].astype(jnp.uint8)),
                bpp=np.asarray(out["bpp"].astype(jnp.uint8)),
                region_id=np.asarray(out["region_id"]),
                owner_px=np.asarray(out["owner_px"].astype(jnp.uint8)),
                endpoint_rows=np.asarray(out["endpoint_rows"]),
            )
    if return_state:
        for arr in (out["ser_rows"], out["ser_q"]):
            if hasattr(arr, "copy_to_host_async"):
                # start the device->host DMA now; serialize_from_state's
                # np.asarray then finds the bytes already (partially) staged
                arr.copy_to_host_async()
        state = dict(
            height=h_img, width=w_img,
            num_levels=num_levels, channels=cfg.channels,
            rows=out["ser_rows"], q=out["ser_q"], n_runs=out["n_runs"],
        )
        return np_out, state
    return np_out
