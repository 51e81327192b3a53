"""Batched block-similarity predicate for region merging.

Reference: limg_encode_3d_matches_sse2 (src/limg.cpp:1137-1275) decides
whether two block decompositions are similar enough to merge:

1. fast accept: perceptually weighted squared avg-color distance
   < 16*3*ch AND both weighted axis-length sums < 200*3*ch;
2. otherwise reject if the length-sum ratio leaves [1/1.375, 1.375];
3. otherwise cross-project 27 probe colors (combinations of half-steps
   along the other frame's axes) between the two frames and accept when
   the mean factor deviation < 3.0.

Deviation from the reference: the reference's second-direction probe
projects `a.avg` 27 times (src/limg.cpp:1239 passes a.avg instead of the
probe color built at :1236-1237); we project the probe color symmetrically,
which is the evident intent. Quality-gated (PSNR/bpp), not bit-gated.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .fit import Decomposition

_COLOR_DIFF_FACTORS = (2.0, 4.0, 3.0, 3.0)
_MAX_RATIO = 1.375
_MAX_FACTOR_SUM = 3.0


def _state(d: Decomposition, channels: int):
    """Normals (3, ch, N) f32 + weighted squared lengths (3, N) with +3 bias."""
    n = jnp.stack([
        (d.dirA_max - d.dirA_min).astype(jnp.float32),
        (d.dirB_mag - d.dirB_offset).astype(jnp.float32),
        (d.dirC_mag - d.dirC_offset).astype(jnp.float32),
    ])[:, :channels]
    w = jnp.asarray(_COLOR_DIFF_FACTORS[:channels], jnp.float32).reshape(1, channels, 1)
    len_sq = 3.0 + (n * n * w).sum(axis=1)  # (3, N)
    return n, len_sq


def _probe_factors(colors, d: Decomposition, normals, channels: int):
    """Project probe colors onto a decomposition's three axes.

    ``colors``: (27, ch, N); ``normals``: (3, ch, N). Returns (fa, fb, fc),
    each (27, N). Mirrors limg_color_error_state_3d_get_factors
    (src/limg_factorization.h:9-41) with float probe colors.
    """
    def inv_sq(v):
        s = (v * v).sum(axis=0)
        return jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-38), 0.0)

    na, nb, nc = normals[0], normals[1], normals[2]          # (ch, N)
    ila, ilb, ilc = inv_sq(na), inv_sq(nb), inv_sq(nc)       # (N,)
    min_a = d.dirA_min.astype(jnp.float32)[:channels]
    off_b = d.dirB_offset.astype(jnp.float32)[:channels]
    off_c = d.dirC_offset.astype(jnp.float32)[:channels]

    v = colors - min_a[None]
    fa = jnp.einsum("pcn,cn->pn", v, na) * ila
    est = min_a[None] + fa[:, None, :] * na[None]
    fb = jnp.einsum("pcn,cn->pn", colors - est - off_b[None], nb) * ilb
    est = est + fb[:, None, :] * nb[None]
    fc = jnp.einsum("pcn,cn->pn", colors - est - off_c[None], nc) * ilc
    return fa, fb, fc


def _probe_weights() -> np.ndarray:
    """(27, 3) half-step combinations along the three axes."""
    g = np.array([0.0, 0.5, 1.0], np.float32)
    z, y, x = np.meshgrid(g, g, g, indexing="ij")
    return np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)  # (27, 3): A,B,C


def match_decomps(da: Decomposition, db: Decomposition, channels: int):
    """Elementwise merge test between paired decompositions.

    All fields (ch, N); returns (match (N,) bool, stats dict of per-reason
    bool arrays -- the batched analog of the reference's culprit counters).
    """
    na_, lsq_a = _state(da, channels)
    nb_, lsq_b = _state(db, channels)
    w = jnp.asarray(_COLOR_DIFF_FACTORS[:channels], jnp.float32).reshape(channels, 1)
    avg_diff = da.avg[:channels] - db.avg[:channels]
    avg_diff_sq = (avg_diff * avg_diff * w).sum(axis=0)      # (N,)

    sum_a = lsq_a.sum(axis=0)
    sum_b = lsq_b.sum(axis=0)
    max_avg = 16.0 * 3.0 * channels
    max_range = 200.0 * 3.0 * channels
    fast_accept = (avg_diff_sq < max_avg) & (sum_a < max_range) & (sum_b < max_range)

    ratio = (sum_a + 1.0) / (sum_b + 1.0)
    ratio_ok = (ratio <= _MAX_RATIO) & (ratio >= 1.0 / _MAX_RATIO)

    # 27 cross-projected probes, both directions.
    pw = jnp.asarray(_probe_weights())                        # (27, 3)
    colors_from_b = jnp.einsum("pk,kcn->pcn", pw, nb_)        # probe in B's frame
    colors_from_a = jnp.einsum("pk,kcn->pcn", pw, na_)
    fa, fb, fc = _probe_factors(colors_from_b, da, na_, channels)
    ga, gb, gc = _probe_factors(colors_from_a, db, nb_, channels)

    inv_a = 1.0 / lsq_a                                       # (3, N), perceptual 1/len^2
    inv_b = 1.0 / lsq_b
    dev = (
        jnp.abs(fa) * inv_a[0] + jnp.abs(0.5 - fb) * 2.0 * inv_a[1] + jnp.abs(0.5 - fc) * 2.0 * inv_a[2]
        + jnp.abs(ga) * inv_b[0] + jnp.abs(0.5 - gb) * 2.0 * inv_b[1] + jnp.abs(0.5 - gc) * 2.0 * inv_b[2]
    )                                                         # (27, N)
    probe_ok = dev.mean(axis=0) < _MAX_FACTOR_SUM

    match = fast_accept | (ratio_ok & probe_ok)
    stats = {
        "fast_accept": fast_accept,
        "avg_diff_reject": ~fast_accept & (avg_diff_sq >= max_avg),
        "range_reject": ~fast_accept & ~((sum_a < max_range) & (sum_b < max_range)),
        "ratio_reject": ~fast_accept & ~ratio_ok,
        "probe_reject": ~fast_accept & ratio_ok & ~probe_ok,
    }
    return match, stats
