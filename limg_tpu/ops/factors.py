"""Batched factor extraction: project every pixel onto its block's axes.

Reference: limg_color_error_state_3d_get_factors / _get_all_factors
(src/limg_factorization.h:9-96). Unlike the fit, this uses the *rounded*
int16 endpoints: normalA = dirA_max - dirA_min etc., with zero-length normals
giving factor 0 (limg_init_color_error_state_3d, src/limg_internal.h:427-452).

Quantization to u8 uses round-to-nearest like the reference's SSE path
(_mm_cvtps_epi32 at src/limg_factorization.h:126).
"""

from __future__ import annotations

import jax.numpy as jnp

from .fit import Decomposition


def axis_normals(d: Decomposition):
    """Float normals + inverse squared lengths from int16 endpoints.

    Returns (na, nb, nc, ila, ilb, ilc): normals (ch, NB) f32, inverse
    lengths (NB,) f32 (0 for degenerate axes).
    """
    na = (d.dirA_max - d.dirA_min).astype(jnp.float32)
    nb = (d.dirB_mag - d.dirB_offset).astype(jnp.float32)
    nc = (d.dirC_mag - d.dirC_offset).astype(jnp.float32)

    def inv_sq(v):
        s = (v * v).sum(axis=0)
        return jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-38), 0.0)

    return na, nb, nc, inv_sq(na), inv_sq(nb), inv_sq(nc)


def extract_factors(px_u8: jnp.ndarray, d: Decomposition, channels: int):
    """Sequential per-pixel projections -> float factors.

    ``px_u8``: (>=ch, P, NB) uint8. Returns (fa, fb, fc), each (P, NB) f32.
    """
    px = px_u8[:channels].astype(jnp.float32)
    na, nb, nc, ila, ilb, ilc = axis_normals(d)
    min_a = d.dirA_min.astype(jnp.float32)[:, None, :]
    off_b = d.dirB_offset.astype(jnp.float32)[:, None, :]
    off_c = d.dirC_offset.astype(jnp.float32)[:, None, :]

    v = px - min_a

    # contraction over the tiny channel axis as an unrolled left-fold:
    # einsum lowers to MXU-hostile 3-wide batched matmuls on TPU, and the
    # explicit c0+c1+c2 order matches the fused kernel's bit-exactly
    def dot_ch(u, n):
        acc = u[0] * n[0]
        for c in range(1, u.shape[0]):
            acc = acc + u[c] * n[c]
        return acc

    fa = dot_ch(v, na[:, None, :]) * ila
    est = min_a + fa[None] * na[:, None, :]
    fb = dot_ch(px - est - off_b, nb[:, None, :]) * ilb
    est = est + fb[None] * nb[:, None, :]
    fc = dot_ch(px - est - off_c, nc[:, None, :]) * ilc
    return fa, fb, fc


def quantize_factors(fa, fb, fc):
    """float factors -> u8 planes: clamp(rint(f * 255), 0, 255)."""

    def q(f):
        return jnp.clip(jnp.rint(f * 255.0), 0, 255).astype(jnp.uint8)

    return q(fa), q(fb), q(fc)
