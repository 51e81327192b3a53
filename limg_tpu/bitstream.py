"""Serialized bitstream: a real compressed file format for limg content.

The reference is a research harness with NO bitstream at all -- its
"Compression Average" is an estimate (src/limg.cpp:1629-1636), and a dead
append-blob prototype at src/limg_internal.h:96-144 shows a format was
planned but never built. This module completes that capability:

Format "LTP1" v2/v3/v4 (little-endian):
  magic    4s   b"LTP1"
  version  u8   2 (raw factor bits), 3 (rANS-entropy-coded factors), or
                4 (v3 + coalesced run/rectangle regions at level 0)
  flags    u8   bit0 = has_alpha; bit1 (v4) = entropy-coded factors
  width    u32
  height   u32
  levels   u8   quadtree levels (1 = fixed grid)
  efactor  u16  error_factor (decoder doesn't need it; kept for tooling)
  owner    ceil(NB0/4) bytes: 2-bit owner level per 8x8 block, row-major
  codes    v4 only, ceil(NB0/4) bytes: 2-bit join code per 8x8 block
           (0 = region start / uncoalesced, 1 = join left neighbor's
           region, 2 = join upper neighbor's region); resolving the joins
           reconstructs the run/rectangle segmentation
           (regions.build_runs geometry)
  per level L in 0..levels-1, for each region owned at L (row-major; in
  v4, level-0 regions are SEGMENTS: one header per segment leader, factor
  pixels concatenated over member blocks in ascending flat order):
    shifts   u16: sA | sB<<4 | sC<<8  (0..8 each)
    endpoints 6*ch x 12-bit signed (value+2048), bit-packed LSB-first:
              dirA_min/max, dirB_off/mag, dirC_off/mag per channel
    factors  v2 only, bit-packed: for each axis with s<8, count*(8-s) bits
             of the crushed factors in row-major region pixel order
  v3 only, after all regions -- per axis k in 0..2:
    mode     u8   1 = rANS, 0 = raw fixed-width packing (chosen per axis by
                  whichever is smaller, so v3 never loses to v2 by more
                  than 3 bytes total)
    mode 1:  n_syms u32, n_bytes u32, n_freq u16,
             n_freq x u16 quantized frequencies (sum = 4096; symbols >=
             n_freq never occur), rANS stream (native/limg_rt_rans_* codec,
             runtime/limg_runtime.cpp)
    mode 0:  n_bytes u32, per-region _pack_bits(width = 8-s) concatenation
  v3 factor symbols are *deltas* along each region's pixel stream, modulo
  2^(8-s): smooth content concentrates them near 0, which the order-0 rANS
  then codes in far fewer bits than the raw fixed-width packing.

Decoding reverses the packing and runs the standard integer reconstruction
(ops/decode.py), so encode->serialize->parse->decode is exact. Real file
bits-per-pixel can now be compared against the reference's estimate
(the reference has NO bitstream; src/limg.cpp:1629-1636 is an estimate).
"""

from __future__ import annotations

import functools
import struct

import numpy as np
import jax
import jax.numpy as jnp

from .config import BLOCK_SIZE, EncodeConfig
from .ops import layout
from .ops.fit import Decomposition
from .ops.decode import decode_blocks

_MAGIC = b"LTP1"
_VERSION = 2
_VERSION_ENTROPY = 3
_VERSION_RUNS = 4
_EP_BITS = 12          # signed endpoint field width (value + 2048)
_EP_BIAS = 2048


def region_header_bits(channels: int) -> int:
    """Real serialized per-region header cost (shift word + endpoints)."""
    return 16 + 6 * channels * _EP_BITS


def _pack_bits(values: np.ndarray, width: int) -> np.ndarray:
    """values (N,) uints -> bit-packed bytes, LSB-first within each value."""
    if width == 0 or values.size == 0:
        return np.zeros(0, np.uint8)
    bits = (values[:, None].astype(np.uint32) >> np.arange(width)) & 1
    return np.packbits(bits.astype(np.uint8).ravel(), bitorder="little")


def _unpack_bits(data: np.ndarray, count: int, width: int) -> np.ndarray:
    """Inverse of _pack_bits: first `count` values of `width` bits each."""
    if width == 0 or count == 0:
        return np.zeros(count, np.uint32)
    bits = np.unpackbits(data, count=count * width, bitorder="little")
    vals = (bits.reshape(count, width).astype(np.uint32) << np.arange(width)).sum(axis=1)
    return vals.astype(np.uint32)


def _region_pixel_counts(grid, bsz, h, w):
    """(NB,) real-pixel count per region (edge regions are smaller)."""
    ys = np.minimum((np.arange(grid.blocks_y) + 1) * bsz, h) - np.arange(grid.blocks_y) * bsz
    xs = np.minimum((np.arange(grid.blocks_x) + 1) * bsz, w) - np.arange(grid.blocks_x) * bsz
    return (ys[:, None] * xs[None, :]).reshape(-1)


def _owned_masks_from_owner(owner0: np.ndarray, grids, num_levels):
    """Per level: bool (NB_L,) -- region is final/owned at that level.

    Derived from the per-block owner map (works for both the nested match
    policy and the non-nested RD cut)."""
    by0, bx0 = grids[0].blocks_y, grids[0].blocks_x
    owner_grid = owner0.reshape(by0, bx0)
    return [
        (owner_grid[:: 1 << lvl, :: 1 << lvl] == lvl).reshape(-1)
        for lvl in range(num_levels)
    ]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_levels", "use_pallas", "merge_policy",
                     "rd_lambda", "coalesce"),
)
def _serialize_device(image, key, cfg: EncodeConfig, num_levels: int,
                      use_pallas: bool, merge_policy: str, rd_lambda: float,
                      coalesce: bool):
    """Everything device-side of serialize in ONE jitted program.

    Running the encode eagerly dispatched ~14k primitives one by one; on the
    tunneled TPU each dispatch is a network round trip (~8 min for a 1080p
    serialize). Returns (levels, owner0, run arrays)."""
    from .regions import (
        coalesce_level_bands, encode_levels, merge_levels_alive, rd_merge_keep,
    )

    ch = cfg.channels
    grids, levels = encode_levels(image, cfg, key, num_levels, use_pallas)
    if num_levels > 1 and merge_policy == "rd":
        # optimize the *real* stream cost: swap the estimate's header for
        # the serialized one
        from .config import static_block_bits
        extra = region_header_bits(ch) - static_block_bits(ch)
        alive, _ = rd_merge_keep(levels, grids, num_levels, rd_lambda, extra)
    elif num_levels > 1:
        alive, _ = merge_levels_alive(
            [lv["decomp"] for lv in levels], grids, ch
        )
    else:
        alive = [jnp.ones((grids[0].num_blocks,), bool)]
    # owner level per level-0 block (highest kept ancestor wins)
    by0, bx0 = grids[0].blocks_y, grids[0].blocks_x
    yy, xx = np.mgrid[0:by0, 0:bx0]
    owner0 = jnp.zeros(by0 * bx0, jnp.int32)
    for lvl in range(1, num_levels):
        anc = (yy >> lvl) * grids[lvl].blocks_x + (xx >> lvl)
        owner0 = jnp.where(alive[lvl][jnp.asarray(anc.reshape(-1))], lvl, owner0)

    nb0 = grids[0].num_blocks
    run_region_id = jnp.arange(nb0, dtype=jnp.int32)
    run_applied = jnp.zeros((nb0,), bool)
    n_runs = jnp.zeros((), jnp.int32)
    lv0_run = levels[0]
    if coalesce:
        ckey = jax.random.fold_in(key, 0x0C0A1E5C)
        # rd optimizes the REAL serialized header (matching rd_merge_keep
        # above); the match policy keeps the reference's estimate so streams
        # stay bit-matched to the in-memory merged encode
        hdr = region_header_bits(ch) if merge_policy == "rd" else None
        owned0 = owner0 == 0
        lv0_run, run_applied, run_region_id, n_runs = coalesce_level_bands(
            image, levels[0], grids[0], owned0, cfg, ckey,
            BLOCK_SIZE, merge_policy, rd_lambda, header_bits=hdr,
        )
    return levels, lv0_run, owner0, run_region_id, run_applied, n_runs


def serialize(image, cfg: EncodeConfig, seed: int = 0, num_levels: int = 3,
              use_pallas: bool = False, merge_policy: str = "match",
              rd_lambda: float = 0.01, entropy: bool = True,
              coalesce: bool = True) -> bytes:
    """Encode an (H, W, 4) uint8 image into an LTP1 blob.

    ``entropy=True`` writes delta + rANS coded factor planes (smaller real
    files); ``entropy=False`` writes raw fixed-width factor bits.
    ``coalesce=True`` runs the band/rectangle pass at level 0 and, when any
    run is kept, writes v4 with a 2-bit join-code plane so ragged regions
    share one header (the serialized analog of the reference's
    arbitrary-rectangle growth)."""
    image = jnp.asarray(image)
    h, w = int(image.shape[0]), int(image.shape[1])
    ch = cfg.channels
    key = jax.random.PRNGKey(seed)
    grids = [layout.grid_for(h, w, BLOCK_SIZE << lvl) for lvl in range(num_levels)]
    levels, lv0_run, owner0_j, run_region_id, run_applied, n_runs = (
        _serialize_device(image, key, cfg, num_levels, use_pallas,
                          merge_policy, rd_lambda, coalesce)
    )
    owner0 = np.asarray(owner0_j).astype(np.uint8)
    owned = _owned_masks_from_owner(owner0, grids, num_levels)

    nb0 = grids[0].num_blocks
    run_seg = None
    if coalesce:
        # v4 pays a 2-bit-per-block join-code plane; only choose it when the
        # headers the runs share actually save more than that
        n_segments = int(np.asarray(n_runs))
        n_joined = int(np.asarray(run_applied).sum()) - n_segments
        if n_segments > 0 and n_joined * region_header_bits(ch) > 2 * nb0:
            levels = [lv0_run] + list(levels[1:])
            run_seg = np.asarray(run_region_id)
            run_app = np.asarray(run_applied)

    out = bytearray()
    flags = int(cfg.has_alpha)
    if run_seg is not None:
        version = _VERSION_RUNS
        flags |= int(entropy) << 1
    else:
        version = _VERSION_ENTROPY if entropy else _VERSION
    out += struct.pack("<4sBBIIBH", _MAGIC, version, flags, w, h,
                       num_levels, cfg.error_factor & 0xFFFF)
    out += _pack_bits(owner0.astype(np.uint8), 2).tobytes()

    if run_seg is not None:
        # 2-bit join codes: every run member joins its left or upper
        # neighbor (guaranteed by the run/rectangle geometry)
        bx0 = grids[0].blocks_x
        idx = np.arange(nb0)
        member = run_app & (run_seg != idx)
        codes = np.zeros(nb0, np.uint8)
        left_same = np.zeros(nb0, bool)
        left_same[1:] = member[1:] & (run_seg[1:] == run_seg[:-1]) & (idx[1:] % bx0 != 0)
        up_same = np.zeros(nb0, bool)
        up_same[bx0:] = member[bx0:] & (run_seg[bx0:] == run_seg[:-bx0])
        codes[left_same] = 1
        codes[up_same & ~left_same] = 2
        if not (codes[member] != 0).all():
            raise RuntimeError("run member with no joinable neighbor")
        out += _pack_bits(codes, 2).tobytes()

    axis_syms = [[], [], []]    # v3: per-axis delta symbol chunks
    for lvl in range(num_levels):
        lv = levels[lvl]
        bsz = BLOCK_SIZE << lvl
        counts = _region_pixel_counts(grids[lvl], bsz, h, w)
        shifts = np.asarray(lv["shifts"])            # (3, NB)
        q_packed = np.asarray(lv["q_packed"])        # (P, NB) 3 bytes/px
        q = np.stack([(q_packed >> (8 * k)) & 0xFF for k in range(3)])
        mask = np.asarray(lv["mask"])                # (P, NB)
        d = lv["decomp"]
        eps = [np.asarray(getattr(d, f)).astype(np.int16)
               for f in ("dirA_min", "dirA_max", "dirB_offset", "dirB_mag",
                         "dirC_offset", "dirC_mag")]
        own_idx = np.nonzero(owned[lvl])[0]
        if lvl == 0 and run_seg is not None:
            order = own_idx[np.argsort(run_seg[own_idx], kind="stable")]
            bounds = np.flatnonzero(np.diff(run_seg[order])) + 1
            groups = np.split(order, bounds)        # members share a leader
        else:
            groups = [np.array([r]) for r in own_idx]
        for members in groups:
            r = int(members[0])                      # leader = smallest idx
            s = np.minimum(shifts[:, r], 8)
            out += struct.pack("<H", int(s[0]) | int(s[1]) << 4 | int(s[2]) << 8)
            ep_vals = np.concatenate([e[:, r].astype(np.int32) for e in eps])
            out += _pack_bits((ep_vals + _EP_BIAS).astype(np.uint32), _EP_BITS).tobytes()
            for k in range(3):
                width = 8 - int(s[k])
                if width <= 0:
                    continue
                vals = np.concatenate(
                    [q[k][mask[:, m], m] for m in members]
                ).astype(np.uint8)
                if entropy:
                    axis_syms[k].append((_delta_mod(vals, width), width))
                else:
                    out += _pack_bits(vals, width).tobytes()

    if entropy:
        from . import native

        for k in range(3):
            chunks = axis_syms[k]
            syms = (np.concatenate([c for c, _ in chunks]) if chunks
                    else np.zeros(0, np.uint8))
            raw_len = sum(-(-c.size * wd // 8) for c, wd in chunks)
            freqs = native.rans_quantize_freqs(np.bincount(syms, minlength=256))
            stream = native.rans_encode(syms, freqs) if syms.size else b""
            n_freq = int(np.max(np.nonzero(freqs)[0])) + 1 if freqs.any() else 1
            rans_size = 8 + 2 + 2 * n_freq + len(stream)
            if rans_size < 4 + raw_len:
                out += struct.pack("<BIIH", 1, syms.size, len(stream), n_freq)
                out += freqs[:n_freq].astype(np.uint16).tobytes()
                out += stream
            else:
                # only materialize the multi-MB raw packing when it wins
                raw = b"".join(_pack_bits(c, wd).tobytes() for c, wd in chunks)
                out += struct.pack("<BI", 0, len(raw))
                out += raw
    return bytes(out)


def _delta_mod(vals: np.ndarray, width: int) -> np.ndarray:
    """Per-region delta transform modulo 2^width (first value kept)."""
    d = np.empty_like(vals)
    d[0] = vals[0]
    d[1:] = (vals[1:].astype(np.int16) - vals[:-1].astype(np.int16)) & ((1 << width) - 1)
    return d


def _undelta_mod(d: np.ndarray, width: int) -> np.ndarray:
    return (np.cumsum(d.astype(np.int64)) & ((1 << width) - 1)).astype(np.uint8)


def _scatter_members(q_plane, mask_np, members, vals):
    """Distribute a segment's concatenated pixel values back to its member
    blocks (ascending flat order -- the serializer's concatenation order)."""
    pos_m = 0
    for m in members:
        sel = mask_np[:, m]
        cnt_m = int(sel.sum())
        q_plane[sel, m] = vals[pos_m:pos_m + cnt_m]
        pos_m += cnt_m


def deserialize(blob: bytes):
    """Parse an LTP1 blob and reconstruct the image.

    Returns ((H, W, 4) uint8 decoded image, info dict)."""
    magic, ver, flags, w, h, num_levels, ef = struct.unpack_from("<4sBBIIBH", blob, 0)
    if magic != _MAGIC or ver not in (_VERSION, _VERSION_ENTROPY, _VERSION_RUNS):
        raise ValueError("not an LTP1 v2/v3/v4 stream")
    entropy = ver == _VERSION_ENTROPY or (ver == _VERSION_RUNS and bool(flags & 2))
    has_alpha = bool(flags & 1)
    ch = 4 if has_alpha else 3
    off = struct.calcsize("<4sBBIIBH")

    grids = [layout.grid_for(h, w, BLOCK_SIZE << lvl) for lvl in range(num_levels)]
    nb0 = grids[0].num_blocks
    owner_bytes = -(-nb0 * 2 // 8)
    owner0 = _unpack_bits(
        np.frombuffer(blob, np.uint8, owner_bytes, off), nb0, 2
    )
    off += owner_bytes

    run_seg = None
    if ver == _VERSION_RUNS:
        codes = _unpack_bits(
            np.frombuffer(blob, np.uint8, owner_bytes, off), nb0, 2
        ).astype(np.uint8)
        off += owner_bytes
        # resolve join codes row by row: up-joins copy the (already
        # resolved) row above, left-joins forward-fill within the row
        by0, bx0 = grids[0].blocks_y, grids[0].blocks_x
        seg2d = np.arange(nb0, dtype=np.int64).reshape(by0, bx0)
        codes2d = codes.reshape(by0, bx0)
        col = np.arange(bx0)
        for y in range(by0):
            row = seg2d[y]
            up = codes2d[y] == 2
            if y and up.any():
                row[up] = seg2d[y - 1][up]
            left = codes2d[y] == 1
            if left.any():
                fill = np.maximum.accumulate(np.where(left, -1, col))
                seg2d[y] = row[np.maximum(fill, 0)]
        run_seg = seg2d.reshape(-1)

    # owned masks per level from the owner map
    by0, bx0 = grids[0].blocks_y, grids[0].blocks_x
    owner_grid = owner0.reshape(by0, bx0)
    owned = []
    for lvl in range(num_levels):
        gy, gx = grids[lvl].blocks_y, grids[lvl].blocks_x
        o = np.zeros((gy, gx), bool)
        anchor = owner_grid[:: 1 << lvl, :: 1 << lvl]
        o[: anchor.shape[0], : anchor.shape[1]] = anchor == lvl
        owned.append(o.reshape(-1))

    dec_imgs = []
    level_arrays = []
    pending = []              # v3: (lvl, r, n, s) in stream order
    for lvl in range(num_levels):
        grid = grids[lvl]
        bsz = BLOCK_SIZE << lvl
        p = bsz * bsz
        nb = grid.num_blocks
        counts = _region_pixel_counts(grid, bsz, h, w)
        _, mask, _ = layout.blockify(jnp.zeros((h, w, 1), jnp.uint8), bsz)
        mask_np = np.asarray(mask)
        shifts = np.zeros((3, nb), np.int32)
        q = np.zeros((3, p, nb), np.int32)
        eps = [np.zeros((ch, nb), np.int32) for _ in range(6)]
        own_idx = np.nonzero(owned[lvl])[0]
        if lvl == 0 and run_seg is not None:
            order = own_idx[np.argsort(run_seg[own_idx], kind="stable")]
            bounds = np.flatnonzero(np.diff(run_seg[order])) + 1
            groups = np.split(order, bounds)
        else:
            groups = [np.array([r]) for r in own_idx]
        ep_bytes = -(-6 * ch * _EP_BITS // 8)
        if entropy and groups:
            # v3/v4 defer factor bits to the per-axis sections, so the
            # region headers are CONTIGUOUS fixed-size records: bulk-parse
            # them instead of ~1.5 ms of numpy-call overhead per region
            rec = 2 + ep_bytes
            ng = len(groups)
            raw = np.frombuffer(blob, np.uint8, rec * ng, off).reshape(ng, rec)
            off += rec * ng
            swords = raw[:, 0].astype(np.uint32) | (raw[:, 1].astype(np.uint32) << 8)
            s_all = np.stack(
                [swords & 0xF, (swords >> 4) & 0xF, (swords >> 8) & 0xF]
            ).astype(np.int32)                                   # (3, ng)
            bits = np.unpackbits(raw[:, 2:], axis=1, bitorder="little")
            bits = bits[:, :6 * ch * _EP_BITS].reshape(ng, 6 * ch, _EP_BITS)
            ep_all = (
                (bits.astype(np.int32) << np.arange(_EP_BITS)).sum(axis=2)
                - _EP_BIAS
            )                                                    # (ng, 6*ch)
            for gi, members in enumerate(groups):
                shifts[:, members] = s_all[:, gi:gi + 1]
                for j, e in enumerate(eps):
                    e[:, members] = ep_all[gi, j * ch:(j + 1) * ch, None]
                pending.append(
                    (lvl, members, int(counts[members].sum()), s_all[:, gi])
                )
        else:
            for members in groups:
                (sword,) = struct.unpack_from("<H", blob, off)
                off += 2
                s = [sword & 0xF, (sword >> 4) & 0xF, (sword >> 8) & 0xF]
                shifts[:, members] = np.asarray(s)[:, None]
                ep_vals = _unpack_bits(
                    np.frombuffer(blob, np.uint8, ep_bytes, off), 6 * ch, _EP_BITS
                ).astype(np.int32) - _EP_BIAS
                off += ep_bytes
                for j, e in enumerate(eps):
                    e[:, members] = ep_vals[j * ch:(j + 1) * ch, None]
                n = int(counts[members].sum())
                for k in range(3):
                    width = 8 - s[k]
                    if width > 0:
                        nbytes = -(-n * width // 8)
                        vals = _unpack_bits(
                            np.frombuffer(blob, np.uint8, nbytes, off), n, width
                        )
                        off += nbytes
                        _scatter_members(q[k], mask_np, members, vals)
        level_arrays.append((shifts, q, eps, mask_np))

    if entropy:
        from . import native

        # three per-axis sections, then scatter the decoded symbols back
        for k in range(3):
            (mode,) = struct.unpack_from("<B", blob, off)
            off += 1
            if mode == 1:
                n_syms, n_bytes, n_freq = struct.unpack_from("<IIH", blob, off)
                off += 10
                freqs = np.zeros(256, np.uint32)
                freqs[:n_freq] = np.frombuffer(blob, np.uint16, n_freq, off)
                off += 2 * n_freq
                syms = (
                    native.rans_decode(blob[off:off + n_bytes], freqs, n_syms)
                    if n_syms else np.zeros(0, np.uint8)
                )
                off += n_bytes
                live = [(lvl, members, n, 8 - s[k]) for lvl, members, n, s
                        in pending if 8 - s[k] > 0]
                lens = np.array([n for _, _, n, _ in live], np.int64)
                if lens.sum() != n_syms:
                    raise ValueError("corrupt LTP1 stream: symbol count mismatch")
                if live:
                    # vectorized segmented undelta over the WHOLE stream:
                    # within a segment, undelta[i] = (C[i] - C[start-1]) mod
                    # 2^w (mod commutes with the subtraction); the per-region
                    # python loop was ~100k numpy calls on a 1080p image
                    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                    widths = np.array([w for *_, w in live], np.int64)
                    c = np.cumsum(syms.astype(np.int64))
                    seg_base = np.repeat(
                        c[starts] - syms[starts].astype(np.int64), lens
                    )
                    u = ((c - seg_base) & np.repeat((1 << widths) - 1, lens)
                         ).astype(np.uint8)
                    # bulk-scatter full singleton blocks (the mass); loop the
                    # rest (runs, edge-partial regions)
                    by_level_full = {}
                    pos = 0
                    for ei, (lvl, members, n, _) in enumerate(live):
                        q_l = level_arrays[lvl][1]
                        p_l = q_l.shape[1]
                        if len(members) == 1 and n == p_l:
                            by_level_full.setdefault(lvl, ([], []))
                            by_level_full[lvl][0].append(int(members[0]))
                            by_level_full[lvl][1].append(pos)
                        else:
                            mask_np = level_arrays[lvl][3]
                            _scatter_members(q_l[k], mask_np, members,
                                             u[pos:pos + n])
                        pos += n
                    for lvl, (cols, offs) in by_level_full.items():
                        q_l = level_arrays[lvl][1]
                        p_l = q_l.shape[1]
                        gather = (np.asarray(offs)[:, None]
                                  + np.arange(p_l)[None, :])
                        q_l[k][:, np.asarray(cols)] = u[gather].T
            else:
                (n_bytes,) = struct.unpack_from("<I", blob, off)
                off += 4
                pos = off
                for lvl, members, n, s in pending:
                    width = 8 - s[k]
                    if width <= 0:
                        continue
                    _, q_l, _, mask_np = level_arrays[lvl]
                    nbytes = -(-n * width // 8)
                    d_vals = _unpack_bits(
                        np.frombuffer(blob, np.uint8, nbytes, pos), n, width
                    ).astype(np.uint8)
                    pos += nbytes
                    _scatter_members(q_l[k], mask_np, members,
                                     _undelta_mod(d_vals, width))
                if pos != off + n_bytes:
                    raise ValueError("corrupt LTP1 stream: raw section length mismatch")
                off = pos

    for lvl in range(num_levels):
        grid = grids[lvl]
        bsz = BLOCK_SIZE << lvl
        shifts, q, eps, _ = level_arrays[lvl]
        d = Decomposition(
            avg=jnp.zeros((ch, grid.num_blocks), jnp.float32),
            dirA_min=jnp.asarray(eps[0]), dirA_max=jnp.asarray(eps[1]),
            dirB_offset=jnp.asarray(eps[2]), dirB_mag=jnp.asarray(eps[3]),
            dirC_offset=jnp.asarray(eps[4]), dirC_mag=jnp.asarray(eps[5]),
        )
        dec = decode_blocks(jnp.asarray(q), jnp.asarray(shifts), d, ch)
        dec_imgs.append(layout.unblockify(dec.astype(jnp.uint8), grid, bsz))

    owner_px = layout.broadcast_block_plane(
        jnp.asarray(owner0.astype(np.int32)), grids[0], BLOCK_SIZE
    )
    decoded = dec_imgs[0]
    for lvl in range(1, num_levels):
        decoded = jnp.where((owner_px == lvl)[..., None], dec_imgs[lvl], decoded)
    if ch == 3:
        decoded = jnp.concatenate(
            [decoded, jnp.full((h, w, 1), 0xFF, jnp.uint8)], axis=-1
        )
    info = dict(
        width=w, height=h, has_alpha=has_alpha, levels=num_levels,
        error_factor=ef, stream_bytes=len(blob),
        real_bpp=len(blob) * 8.0 / (w * h),
    )
    return np.asarray(decoded), info
