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
from .ops.fit import Decomposition
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
    return keep


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_levels", "use_pallas", "emit_planes",
                     "merge_policy", "rd_lambda"),
)
def encode_image_merged_device(image: jnp.ndarray, cfg: EncodeConfig,
                               dither_key: jax.Array, num_levels: int = 3,
                               use_pallas: bool = False, emit_planes: bool = True,
                               merge_policy: str = "match",
                               rd_lambda: float = 0.01):
    """Merged encode on device. Returns (decoded u8 (H,W,4), per-pixel planes).

    num_levels=3 -> regions of 8x8, 16x16, 32x32 pixels. ``use_pallas`` runs
    every level through the fused kernel (TPU fast path). ``emit_planes=False``
    skips the full-resolution debug planes (factors/shift/bpp/region-id) --
    stats come from per-region reductions instead, which roughly halves the
    merged encode's device time.
    """
    ch = cfg.channels
    h, w = image.shape[:2]
    grids, levels = encode_levels(image, cfg, dither_key, num_levels, use_pallas)
    decomps = [lv["decomp"] for lv in levels]

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

    if merge_policy == "rd":
        alive = rd_merge_keep(levels, grids, num_levels, rd_lambda)
        merge_stats = []
    else:
        alive, merge_stats = merge_levels_alive(decomps, grids, ch)
    owner_blocks = _owner_level(alive, grids, num_levels)          # (NB0,)
    owner_px = layout.broadcast_block_plane(owner_blocks, grids[0], BLOCK_SIZE)

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
    decoded4 = jnp.stack(
        [((dec_plane >> (8 * c)) & 0xFF).astype(jnp.uint8) for c in range(4)],
        axis=-1,
    )

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
    )
    if emit_planes:
        out["factors"] = select(fac_imgs, "hwc")                   # (H, W, 3)
        out["shift"] = select(shift_imgs, "chw")                   # (3, H, W)
        out["bpp"] = select(bpp_imgs, "hw")                        # (H, W)
        region_ids = []
        offset = 0
        for lvl in range(num_levels):
            ids = layout.broadcast_block_plane(
                offset + jnp.arange(grids[lvl].num_blocks, dtype=jnp.int32),
                grids[lvl], BLOCK_SIZE << lvl,
            )
            region_ids.append(ids)
            offset += grids[lvl].num_blocks
        out["region_id"] = select(region_ids, "hw")
    return out


def encode_image_merged(image, cfg: EncodeConfig, seed: int = 0, num_levels: int = 3,
                        fetch_planes: bool = True, use_pallas: bool | None = None,
                        merge_policy: str = "match", rd_lambda: float = 0.01):
    """Host-facing merged encode. Output surface mirrors
    limg_blocked_encode3d_info (src/limg.h:39-44) + stats.

    ``fetch_planes=False`` keeps the big per-pixel planes on device and
    returns only the decoded image + scalar stats -- device->host transfers
    dominate wall time on tunneled TPU setups.
    """
    image = jnp.asarray(image)
    key = jax.random.PRNGKey(seed)
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() != "cpu"
            and cfg.crush_mode in ("ladder", "none")
        )
    out = encode_image_merged_device(
        image, cfg, key, num_levels, use_pallas, emit_planes=fetch_planes,
        merge_policy=merge_policy, rd_lambda=rd_lambda,
    )
    from .ops.error import max_possible_error

    n = image.shape[0] * image.shape[1]
    mse = float(out["total_err"]) / n
    psnr = 10.0 * np.log10(max_possible_error(cfg.channels) / max(mse, 1e-12))
    mean_bpp = out["mean_bpp"]

    np_out = dict(
        decoded=np.asarray(out["decoded"]),
        alive_counts=np.asarray(out["alive_counts"]),
        bits_histogram=np.asarray(out["bits_histogram"]),
        psnr=float(psnr),
        mse=float(mse),
        mean_bpp=float(mean_bpp),
        avg_block_bits=float(np.asarray(out["accum_bits"]).sum() / n),
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
