"""Batched 3-axis sequential linear fit over all blocks at once.

TPU-first reformulation of the reference's per-block scalar fit
(limg_encode_get_block_factors_accurate_from_state_3d_{3,4},
src/limg_factorization.h:796-1247): the 3-4 sequential passes over one
block's pixels become 3-4 batched passes over the ``(ch, P, NB)`` tensor of
*every* block in the image. Per-block reductions (means, direction
accumulation, factor min/max) are reductions over the pixel (sublane) axis.

All arithmetic is float32, mirroring the reference's float path; rsqrt is
exact rather than the SSE 12-bit approximation (quality-gated deviation).
Ragged edge blocks are handled with a validity mask instead of variable trip
counts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax


class Decomposition(NamedTuple):
    """Per-block fit result (reference limg_encode_3d_output,
    src/limg_internal.h:343-353). All fields (ch, NB)."""

    avg: jnp.ndarray        # float32
    dirA_min: jnp.ndarray   # int16-valued int32
    dirA_max: jnp.ndarray
    dirB_offset: jnp.ndarray
    dirB_mag: jnp.ndarray
    dirC_offset: jnp.ndarray
    dirC_mag: jnp.ndarray


def _fast_round(x: jnp.ndarray) -> jnp.ndarray:
    """limg_fast_round_int16: floor(x + 0.5) (src/limg_internal.h:689-692)."""
    return jnp.floor(x + 0.5).astype(jnp.int32)


def drop_decomposition_axes(d: Decomposition, num_factors: int) -> Decomposition:
    """Zero the endpoints of statically dropped axes (reduced-factor modes).

    Dropping axis k is the shift=8 encoding (normals and B/C offsets zeroed,
    src/limg_bit_crush.h:118-138). Zeroing the endpoints *before* the crush
    search makes every candidate evaluation include the drop-induced error,
    so the live axes' shifts are chosen against the true reconstruction.
    Mirrored in the Pallas kernel (_apply_num_factors)."""
    if num_factors >= 3:
        return d
    zero = jnp.zeros_like(d.dirC_offset)
    d = d._replace(dirC_offset=zero, dirC_mag=zero)
    if num_factors < 2:
        d = d._replace(dirB_offset=zero, dirB_mag=zero)
    return d


def _signed_unit_mean(v: jnp.ndarray, mask: jnp.ndarray, inv_count: jnp.ndarray) -> jnp.ndarray:
    """Mean over pixels of sign-corrected unit vectors.

    ``v``: (ch, P, NB) residual vectors; sign comes from the first
    largest-|component| channel (reference: copysign(rsqrt(len2), v[argmax]),
    src/limg_factorization.h:816-851). Zero vectors and masked-out pixels
    contribute nothing. Returns (ch, NB).
    """
    ch = v.shape[0]
    len_sq = (v * v).sum(axis=0)  # (P, NB)
    best_abs = jnp.abs(v[0])
    lead = v[0]
    for j in range(1, ch):
        take = jnp.abs(v[j]) > best_abs
        best_abs = jnp.where(take, jnp.abs(v[j]), best_abs)
        lead = jnp.where(take, v[j], lead)
    inv_len = jnp.where(len_sq > 0, lax.rsqrt(jnp.maximum(len_sq, 1e-38)), 0.0)
    inv_len = jnp.where(lead < 0, -inv_len, inv_len) * mask
    return (v * inv_len).sum(axis=1) * inv_count  # (ch, NB)


def _project(v: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel projection factor of v onto direction: dot/|d|^2.

    v: (ch, P, NB); direction: (ch, NB). Returns (P, NB). Zero direction
    gives factor 0 (reference zeroes inv lengths for degenerate axes).
    """
    d_b = direction[:, None, :]
    dot = v[0] * d_b[0]
    for c in range(1, v.shape[0]):
        dot = dot + v[c] * d_b[c]
    d2 = (direction * direction).sum(axis=0)  # (NB,)
    inv = jnp.where(d2 > 0, 1.0 / jnp.maximum(d2, 1e-38), 0.0)
    return dot * inv


def _masked_minmax(fac: jnp.ndarray, mask: jnp.ndarray):
    big = jnp.float32(3.4e38)
    mn = jnp.where(mask > 0, fac, big).min(axis=0)
    mx = jnp.where(mask > 0, fac, -big).max(axis=0)
    return mn, mx


def fit_blocks(px_u8: jnp.ndarray, mask: jnp.ndarray, channels: int) -> Decomposition:
    """Fit every block. ``px_u8``: (>=ch, P, NB) uint8; ``mask``: (P, NB) bool.

    Returns int16-valued endpoints as int32 (TPU-friendly) in a
    ``Decomposition``.
    """
    px = px_u8[:channels].astype(jnp.float32)  # (ch, P, NB)
    m = mask.astype(jnp.float32)               # (P, NB)
    count = m.sum(axis=0)                      # (NB,)
    inv_count = 1.0 / count

    avg = (px * m).sum(axis=1) * inv_count     # (ch, NB)
    corrected = (px - avg[:, None, :]) * m
    dir_a = _signed_unit_mean(corrected, m, inv_count)

    fac_a = _project(corrected, dir_a) * m
    est = avg[:, None, :] + fac_a[None] * dir_a[:, None, :]  # (ch, P, NB)
    resid_a = (px - est) * m
    dir_b = _signed_unit_mean(resid_a, m, inv_count)

    if channels == 3:
        # dirC = cross(dirA, dirB) (src/limg_factorization.h:946)
        dir_c = jnp.stack([
            dir_a[1] * dir_b[2] - dir_a[2] * dir_b[1],
            dir_a[2] * dir_b[0] - dir_a[0] * dir_b[2],
            dir_a[0] * dir_b[1] - dir_a[1] * dir_b[0],
        ])
        fac_b = _project(resid_a, dir_b) * m
        est_b = est + fac_b[None] * dir_b[:, None, :]
        fac_c = _project((px - est_b) * m, dir_c) * m
    else:
        # R^4: third residual sweep instead of a cross product
        # (src/limg_factorization.h:1002-1247).
        fac_b = _project(resid_a, dir_b) * m
        est_b = est + fac_b[None] * dir_b[:, None, :]
        resid_ab = (px - est_b) * m
        dir_c = _signed_unit_mean(resid_ab, m, inv_count)
        fac_c = _project(resid_ab, dir_c) * m

    mn_a, mx_a = _masked_minmax(fac_a, m)
    mn_b, mx_b = _masked_minmax(fac_b, m)
    mn_c, mx_c = _masked_minmax(fac_c, m)

    # Degenerate (flat) blocks: dirA == 0 short-circuits the whole fit in the
    # reference (src/limg_factorization.h:874-882): endpoints collapse to avg
    # and B/C vanish. _project already yields fac==0 there, so min=max=0 and
    # the formulas below reduce to exactly that, *except* dirB/dirC which we
    # must zero explicitly.
    flat = (dir_a * dir_a).sum(axis=0) <= 0.0  # (NB,)
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
