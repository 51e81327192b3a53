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

import jax.numpy as jnp

from ..config import EncodeConfig
from .crush import (
    _admissible, evaluate_shifts, _err_scale_shift,
    exhaustive_core, guess_core, ladder_core,
)
from .fit import Decomposition, _fast_round

# Block-error accumulation over a segment is pre-scaled by this shift so the
# int32 sum holds the worst case (max per-pixel weighted error 780300 x
# SEG_CAP regions x 4096 px >> 8 = 1.6e9 < 2^31).
SEG_ERR_SHIFT = 8
# Maximum blocks per segment (run length cap; keeps the error sums bounded
# and region headers addressable).
SEG_CAP = 128


def seg_sum(x: jnp.ndarray, seg_id: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Sum per-block values (..., NB) into per-segment (..., S)."""
    out = jnp.zeros((*x.shape[:-1], num_segments), x.dtype)
    return out.at[..., seg_id].add(x)


def seg_max(x: jnp.ndarray, seg_id: jnp.ndarray, num_segments: int, init) -> jnp.ndarray:
    out = jnp.full((*x.shape[:-1], num_segments), init, x.dtype)
    return out.at[..., seg_id].max(x)


def seg_min(x: jnp.ndarray, seg_id: jnp.ndarray, num_segments: int, init) -> jnp.ndarray:
    out = jnp.full((*x.shape[:-1], num_segments), init, x.dtype)
    return out.at[..., seg_id].min(x)


def gather_decomp(d: Decomposition, seg_id: jnp.ndarray) -> Decomposition:
    """Per-segment decomposition (ch, S) -> per-block (ch, NB)."""
    return Decomposition(*(f[..., seg_id] for f in d))


def _seg_signed_unit_mean(v, mask, seg_id, num_segments, inv_count_seg):
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
    return seg_sum(per_block, seg_id, num_segments) * inv_count_seg


def _seg_project(v, dir_seg, seg_id):
    """Per-pixel projection onto the owning segment's direction.

    v: (ch, P, NB); dir_seg: (ch, S). Returns (P, NB)."""
    d_blk = dir_seg[:, seg_id]                        # (ch, NB)
    dot = jnp.einsum("cpn,cn->pn", v, d_blk)
    d2 = (d_blk * d_blk).sum(axis=0)
    inv = jnp.where(d2 > 0, 1.0 / jnp.maximum(d2, 1e-38), 0.0)
    return dot * inv


def fit_segments(px_u8, mask, seg_id, num_segments: int, channels: int) -> Decomposition:
    """3-axis sequential fit per *segment* (same passes as fit.fit_blocks,
    reductions keyed by seg_id). Returns a Decomposition with (ch, S) fields;
    segments with no blocks produce zeros (flat path)."""
    px = px_u8[:channels].astype(jnp.float32)         # (ch, P, NB)
    m = mask.astype(jnp.float32)
    count = seg_sum(m.sum(axis=0), seg_id, num_segments)          # (S,)
    inv_count = 1.0 / jnp.maximum(count, 1.0)

    avg = seg_sum((px * m).sum(axis=1), seg_id, num_segments) * inv_count
    corrected = (px - avg[:, seg_id][:, None, :]) * m
    dir_a = _seg_signed_unit_mean(corrected, m, seg_id, num_segments, inv_count)

    fac_a = _seg_project(corrected, dir_a, seg_id) * m
    est = avg[:, seg_id][:, None, :] + fac_a[None] * dir_a[:, seg_id][:, None, :]
    resid_a = (px - est) * m
    dir_b = _seg_signed_unit_mean(resid_a, m, seg_id, num_segments, inv_count)

    if channels == 3:
        dir_c = jnp.stack([
            dir_a[1] * dir_b[2] - dir_a[2] * dir_b[1],
            dir_a[2] * dir_b[0] - dir_a[0] * dir_b[2],
            dir_a[0] * dir_b[1] - dir_a[1] * dir_b[0],
        ])
        fac_b = _seg_project(resid_a, dir_b, seg_id) * m
        est_b = est + fac_b[None] * dir_b[:, seg_id][:, None, :]
        fac_c = _seg_project((px - est_b) * m, dir_c, seg_id) * m
    else:
        fac_b = _seg_project(resid_a, dir_b, seg_id) * m
        est_b = est + fac_b[None] * dir_b[:, seg_id][:, None, :]
        resid_ab = (px - est_b) * m
        dir_c = _seg_signed_unit_mean(resid_ab, m, seg_id, num_segments, inv_count)
        fac_c = _seg_project(resid_ab, dir_c, seg_id) * m

    big = jnp.float32(3.4e38)

    def seg_minmax(fac):
        blk_mn = jnp.where(mask, fac, big).min(axis=0)            # (NB,)
        blk_mx = jnp.where(mask, fac, -big).max(axis=0)
        return (
            seg_min(blk_mn, seg_id, num_segments, big),
            seg_max(blk_mx, seg_id, num_segments, -big),
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
                         num_segments: int, cfg: EncodeConfig):
    """Bit-crush search with per-*segment* admissibility.

    Same searches as ops.crush (dispatch on cfg.crush_mode) but pixel-max /
    block-error reductions run over whole segments, so one shift triple is
    chosen per region exactly like the reference's region encode
    (src/limg.cpp:1514-1534). Returns (shifts (3, S) i32, block_err (S,)).
    """
    import jax

    channels = cfg.channels
    px = px_u8[:channels].astype(jnp.int32)
    mask_i = mask.astype(jnp.int32)
    f8 = jnp.stack([p.astype(jnp.int32) for p in f8_u8])
    d_blk = gather_decomp(d_seg, seg_id)
    count_seg = seg_sum(mask_i.sum(axis=0), seg_id, num_segments)
    es_blk = _err_scale_shift(px.shape[1])

    # On accelerators the per-candidate decode-sim runs in a fused Pallas
    # kernel (bit-identical to evaluate_shifts); each jnp evaluation
    # otherwise streams (3, ch, P, NB) intermediates through HBM and
    # dominates the whole coalescing pass.
    use_kernel = (jax.default_backend() != "cpu"
                  and px.shape[1] <= 256 and es_blk == 0)
    if use_kernel:
        from ..pallas_kernels.encode_fixed import crush_eval_rows_pallas

        packed = px[0] + (px[1] << 8)
        for c in range(2, channels):
            packed = packed + (px[c] << (8 * c))
        f8_packed = f8[0] + (f8[1] << 8) + (f8[2] << 16)
        eps = [d_blk.dirA_min, d_blk.dirA_max, d_blk.dirB_offset,
               d_blk.dirB_mag, d_blk.dirC_offset, d_blk.dirC_mag]

    def eval_fn(shifts_seg):
        shifts_blk = shifts_seg[:, seg_id]
        if use_kernel:
            pm, be = crush_eval_rows_pallas(
                packed, mask_i, f8_packed, eps, shifts_blk, channels
            )
        else:
            pm, be = evaluate_shifts(px, mask_i, f8, d_blk, shifts_blk, channels)
        pm_s = seg_max(pm, seg_id, num_segments, 0)
        be_s = seg_sum(be >> (SEG_ERR_SHIFT - es_blk), seg_id, num_segments)
        return pm_s, be_s

    nb = px.shape[-1]
    if not cfg.crush_bits:
        return jnp.zeros((3, num_segments), jnp.int32), jnp.zeros((num_segments,), jnp.int32)
    floors = None
    if cfg.num_factors < 3:
        floors = eval_fn(jnp.zeros((3, num_segments), jnp.int32))
    if cfg.crush_mode == "exhaustive":
        return exhaustive_core(eval_fn, count_seg, cfg, SEG_ERR_SHIFT, num_segments, floors)
    if cfg.crush_mode == "guess":
        return guess_core(eval_fn, count_seg, cfg, SEG_ERR_SHIFT, num_segments, floors)
    return ladder_core(eval_fn, count_seg, cfg, SEG_ERR_SHIFT, num_segments, floors)
