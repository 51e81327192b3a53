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

Implementation note: channels are unrolled into per-channel (27, N) arrays
(no einsum/stacked (27, ch, N) intermediates) so XLA fuses the whole
predicate into a few elementwise passes -- this sits on the merged encoder's
critical path at N = NB/4 pairs x 3 comparisons per level.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .fit import Decomposition

_COLOR_DIFF_FACTORS = (2.0, 4.0, 3.0, 3.0)
_MAX_RATIO = 1.375
_MAX_FACTOR_SUM = 3.0


def _normals(d: Decomposition, channels: int):
    """Per-axis per-channel normals (lists of (N,) f32) + weighted squared
    lengths with the reference's +3 bias (list of 3 (N,) f32)."""
    na = [(d.dirA_max[c] - d.dirA_min[c]).astype(jnp.float32)
          for c in range(channels)]
    nb = [(d.dirB_mag[c] - d.dirB_offset[c]).astype(jnp.float32)
          for c in range(channels)]
    nc = [(d.dirC_mag[c] - d.dirC_offset[c]).astype(jnp.float32)
          for c in range(channels)]
    w = _COLOR_DIFF_FACTORS
    len_sq = [
        3.0 + sum(n[c] * n[c] * w[c] for c in range(channels))
        for n in (na, nb, nc)
    ]
    return (na, nb, nc), len_sq


def _inv_sq(n):
    s = sum(x * x for x in n)
    return jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-38), 0.0)


def _probe_weights() -> np.ndarray:
    """(27, 3) half-step combinations along the three axes."""
    g = np.array([0.0, 0.5, 1.0], np.float32)
    z, y, x = np.meshgrid(g, g, g, indexing="ij")
    return np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)  # (27, 3): A,B,C


def _probe_factors(colors, d: Decomposition, normals, channels: int):
    """Project probe colors onto a decomposition's three axes.

    ``colors``: list of ch (27, N); ``normals``: (na, nb, nc) per-channel
    lists. Returns (fa, fb, fc), each (27, N). Mirrors
    limg_color_error_state_3d_get_factors (src/limg_factorization.h:9-41)
    with float probe colors.
    """
    na, nb, nc = normals
    ila, ilb, ilc = _inv_sq(na), _inv_sq(nb), _inv_sq(nc)        # (N,)
    min_a = [d.dirA_min[c].astype(jnp.float32) for c in range(channels)]
    off_b = [d.dirB_offset[c].astype(jnp.float32) for c in range(channels)]
    off_c = [d.dirC_offset[c].astype(jnp.float32) for c in range(channels)]

    v = [colors[c] - min_a[c] for c in range(channels)]
    fa = sum(v[c] * na[c] for c in range(channels)) * ila        # (27, N)
    est = [min_a[c] + fa * na[c] for c in range(channels)]
    fb = sum((colors[c] - est[c] - off_b[c]) * nb[c]
             for c in range(channels)) * ilb
    est = [est[c] + fb * nb[c] for c in range(channels)]
    fc = sum((colors[c] - est[c] - off_c[c]) * nc[c]
             for c in range(channels)) * ilc
    return fa, fb, fc


def match_decomps(da: Decomposition, db: Decomposition, channels: int):
    """Elementwise merge test between paired decompositions.

    All fields (ch, N); returns (match (N,) bool, stats dict of per-reason
    bool arrays -- the batched analog of the reference's culprit counters).
    """
    na_, lsq_a = _normals(da, channels)
    nb_, lsq_b = _normals(db, channels)
    w = _COLOR_DIFF_FACTORS
    avg_diff_sq = sum(
        (da.avg[c] - db.avg[c]) * (da.avg[c] - db.avg[c]) * w[c]
        for c in range(channels)
    )                                                            # (N,)

    sum_a = lsq_a[0] + lsq_a[1] + lsq_a[2]
    sum_b = lsq_b[0] + lsq_b[1] + lsq_b[2]
    max_avg = 16.0 * 3.0 * channels
    max_range = 200.0 * 3.0 * channels
    fast_accept = (avg_diff_sq < max_avg) & (sum_a < max_range) & (sum_b < max_range)

    ratio = (sum_a + 1.0) / (sum_b + 1.0)
    ratio_ok = (ratio <= _MAX_RATIO) & (ratio >= 1.0 / _MAX_RATIO)

    # 27 cross-projected probes, both directions. Probe colors are built
    # per channel as (27, N) = sum_k pw[:, k] * normal_k[c].
    pw = _probe_weights()
    pw_col = [jnp.asarray(pw[:, k:k + 1]) for k in range(3)]     # (27, 1) each
    colors_from_b = [
        pw_col[0] * nb_[0][c] + pw_col[1] * nb_[1][c] + pw_col[2] * nb_[2][c]
        for c in range(channels)
    ]
    colors_from_a = [
        pw_col[0] * na_[0][c] + pw_col[1] * na_[1][c] + pw_col[2] * na_[2][c]
        for c in range(channels)
    ]
    fa, fb, fc = _probe_factors(colors_from_b, da, na_, channels)
    ga, gb, gc = _probe_factors(colors_from_a, db, nb_, channels)

    inv_a = [1.0 / l for l in lsq_a]                             # perceptual 1/len^2
    inv_b = [1.0 / l for l in lsq_b]
    dev = (
        jnp.abs(fa) * inv_a[0]
        + jnp.abs(0.5 - fb) * 2.0 * inv_a[1]
        + jnp.abs(0.5 - fc) * 2.0 * inv_a[2]
        + jnp.abs(ga) * inv_b[0]
        + jnp.abs(0.5 - gb) * 2.0 * inv_b[1]
        + jnp.abs(0.5 - gc) * 2.0 * inv_b[2]
    )                                                            # (27, N)
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
