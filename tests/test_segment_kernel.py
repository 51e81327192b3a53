"""Bit-parity of the fused segment-encode kernel vs the jnp composition.

The coalesce pass's segment re-encode (regions.coalesce_segments) runs as
ONE Pallas kernel on accelerators (pallas_kernels/encode_segments.py). The
jnp composition (fit_segments -> extract/quantize factors ->
find_shifts_segments -> decode_blocks) is its parity oracle: shifts,
endpoints, crushed factors, decoded pixels, and per-block error sums must
match BIT-exactly (dithering off -- the kernel's TPU PRNG is statistical
parity only, like the fixed-grid kernel). Interpret mode on CPU; the
compiled-device twin lives in tools/tpu_parity_gate.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from limg_tpu.config import EncodeConfig
from limg_tpu.ops.fit import Decomposition, drop_decomposition_axes
from limg_tpu.ops.segments import (
    SEG_CAP, fit_segments, find_shifts_segments,
)
from limg_tpu.ops.factors import extract_factors, quantize_factors
from limg_tpu.ops.decode import decode_blocks
from limg_tpu.ops.error import weighted_error
from limg_tpu.pallas_kernels.encode_fixed import KernelSpec, pack_channels
from limg_tpu.pallas_kernels.encode_segments import segment_encode_pallas


def _random_segments(rng, n):
    """Contiguous segments with spans 1..SEG_CAP; some crossing the kernel's
    tile/halo boundaries (lane 512 with _T=512)."""
    seg = np.empty(n, np.int32)
    i = 0
    while i < n:
        span = int(rng.integers(1, min(SEG_CAP, n - i) + 1))
        seg[i:i + span] = i
        i += span
    return seg


def _jnp_segment_encode(px, mask_b, seg, cfg):
    n = px.shape[-1]
    ch = cfg.channels
    d_blk = fit_segments(px, mask_b, seg, n, ch, contiguous=True)
    if cfg.num_factors < 3:
        d_blk = drop_decomposition_axes(d_blk, cfg.num_factors)
    f8_u8 = quantize_factors(*extract_factors(px, d_blk, ch))
    shifts, _ = find_shifts_segments(px, mask_b, f8_u8, d_blk, seg, n, cfg,
                                     contiguous=True)
    if cfg.num_factors < 3:
        forced = jnp.asarray(
            [0] * cfg.num_factors + [8] * (3 - cfg.num_factors), jnp.int32)
        shifts = jnp.maximum(shifts, forced[:, None])
    f8 = jnp.stack([p.astype(jnp.int32) for p in f8_u8])
    q = f8 >> jnp.minimum(shifts, 8)[:, None, :]
    decoded = decode_blocks(q, shifts, d_blk, ch)
    mask_ci = mask_b.astype(jnp.int32)
    dist_blk = (weighted_error(decoded, px) * mask_ci).astype(
        jnp.float32).sum(axis=0)
    return d_blk, shifts, q, decoded, dist_blk, mask_ci.sum(axis=0)


def _make_buffer(rng, n, channels):
    px = rng.integers(0, 256, (channels, 64, n), np.int32)
    # smooth some segments so crushing actually picks nonzero shifts
    px[:, :, : n // 2] = (px[:, :, : n // 2] // 32) * 32
    mask = np.ones((64, n), bool)
    mask[:, rng.integers(0, n, n // 10)] = False       # some empty blocks
    mask[32:, rng.integers(0, n, n // 10)] = False     # some partial blocks
    seg = _random_segments(rng, n)
    return jnp.asarray(px), jnp.asarray(mask), jnp.asarray(seg)


@pytest.mark.parametrize("mode", [
    "ladder", "guess",
    pytest.param("exhaustive", marks=pytest.mark.slow),
])
def test_segment_kernel_matches_jnp(mode):
    rng = np.random.default_rng(123)
    # ladder pads to 1024 -> 2 tiles, exercising halo crossings; the 729-eval
    # exhaustive stays at one tile (interpret-mode cost)
    n = 600 if mode == "ladder" else 300
    cfg = EncodeConfig(error_factor=100, crush_mode=mode, dithering=False)
    px, mask_b, seg = _make_buffer(rng, n, 3)
    d, shifts, q, dec, dist, cnt = _jnp_segment_encode(px, mask_b, seg, cfg)

    params = jnp.asarray([0, cfg.max_pixel_bit_crush_error,
                          cfg.max_block_bit_crush_error], jnp.int32)
    (k_shifts, k_q, k_dec, k_dist, k_cntb, k_cntm, *eps_avg
     ) = segment_encode_pallas(
        pack_channels(px.astype(jnp.uint8)), mask_b.astype(jnp.int32),
        seg, params, KernelSpec.from_config(cfg), interpret=True,
    )
    assert np.array_equal(np.asarray(shifts), np.asarray(k_shifts))
    m = np.asarray(mask_b)
    for c in range(3):
        kq = np.asarray((k_q >> (8 * c)) & 0xFF)
        assert np.array_equal(np.where(m, np.asarray(q[c]), 0),
                              np.where(m, kq, 0))
        kd = np.asarray((k_dec >> (8 * c)) & 0xFF)
        assert np.array_equal(np.where(m, np.asarray(dec[c]), 0),
                              np.where(m, kd, 0))
    assert np.array_equal(np.asarray(dist), np.asarray(k_dist[0]))
    assert np.array_equal(np.asarray(mask_b).sum(0), np.asarray(k_cntb[0]))
    # endpoints + avg: jnp fields are f32 holding exact ints
    for j in range(6):
        assert np.array_equal(
            np.asarray(d[1 + j]).astype(np.int64),
            np.asarray(eps_avg[j]).astype(np.int64), )
    assert np.array_equal(np.asarray(d.avg), np.asarray(eps_avg[6]))


@pytest.mark.parametrize("channels,num_factors", [(4, 3), (3, 2), (3, 1)])
def test_segment_kernel_channels_factors(channels, num_factors):
    rng = np.random.default_rng(321)
    n = 384
    cfg = EncodeConfig(error_factor=100, has_alpha=(channels == 4),
                       crush_mode="ladder", dithering=False,
                       num_factors=num_factors)
    px, mask_b, seg = _make_buffer(rng, n, channels)
    d, shifts, q, dec, dist, _ = _jnp_segment_encode(px, mask_b, seg, cfg)
    params = jnp.asarray([0, cfg.max_pixel_bit_crush_error,
                          cfg.max_block_bit_crush_error], jnp.int32)
    (k_shifts, k_q, k_dec, k_dist, *_rest) = segment_encode_pallas(
        pack_channels(px.astype(jnp.uint8)), mask_b.astype(jnp.int32),
        seg, params, KernelSpec.from_config(cfg), interpret=True,
    )
    assert np.array_equal(np.asarray(shifts), np.asarray(k_shifts))
    m = np.asarray(mask_b)
    for c in range(channels):
        kd = np.asarray((k_dec >> (8 * c)) & 0xFF)
        assert np.array_equal(np.where(m, np.asarray(dec[c]), 0),
                              np.where(m, kd, 0))
    assert np.array_equal(np.asarray(dist), np.asarray(k_dist[0]))


@pytest.mark.parametrize("channels", [3, 4])
def test_match_pairs_kernel(channels):
    """The neighbor-match kernel must equal ops.match.match_decomps
    bit-exactly on f32 decomposition rows."""
    from limg_tpu.ops.match import match_decomps
    from limg_tpu.pallas_kernels.encode_merged import match_pairs_pallas

    rng = np.random.default_rng(7)
    n = 3000

    def rand_decomp_rows():
        avg = rng.uniform(0, 255, (channels, n)).astype(np.float32)
        ia_min = rng.integers(-30, 200, (channels, n)).astype(np.float32)
        ia_max = ia_min + rng.integers(0, 120, (channels, n))
        ib_off = rng.integers(-40, 40, (channels, n)).astype(np.float32)
        ib_mag = ib_off + rng.integers(0, 60, (channels, n))
        ic_off = rng.integers(-20, 20, (channels, n)).astype(np.float32)
        ic_mag = ic_off + rng.integers(0, 30, (channels, n))
        rows = [avg, ia_min, ia_max, ib_off, ib_mag, ic_off, ic_mag]
        # make a slice of pairs near-identical so fast-accept paths trigger
        return [r.astype(np.float32) for r in rows]

    ra = rand_decomp_rows()
    rb = [r + (rng.random((channels, n)) < 0.3) * rng.integers(
        0, 6, (channels, n)) for r in ra]
    big_a = jnp.asarray(np.concatenate(ra, axis=0))
    big_b = jnp.asarray(np.concatenate(rb, axis=0).astype(np.float32))
    from limg_tpu.ops.fit import Decomposition as D
    da = D(*(big_a[channels * i:channels * (i + 1)] for i in range(7)))
    db = D(*(big_b[channels * i:channels * (i + 1)] for i in range(7)))
    m_j, _ = match_decomps(da, db, channels)
    m_k = match_pairs_pallas(big_a, big_b, channels, interpret=True)
    assert np.array_equal(np.asarray(m_j), np.asarray(m_k))


@pytest.mark.parametrize("channels", [3, 4])
def test_match_neighbors_kernel(channels):
    """The plane-form neighbor-match kernel (roll + halo seams) must equal
    the flat shifted-slice assembly + match_decomps bit-exactly, including
    tile seams and non-multiple grid sizes."""
    from limg_tpu.ops.fit import Decomposition as D
    from limg_tpu.ops.match import match_decomps
    from limg_tpu.pallas_kernels.encode_merged import match_neighbors_pallas

    rng = np.random.default_rng(17)
    gy, gx = 19, 210                     # crosses both tile seams, not %8/128
    n = gy * gx

    avg = rng.uniform(0, 255, (channels, n)).astype(np.float32)
    ia_min = rng.integers(-30, 200, (channels, n)).astype(np.float32)
    rows = [avg, ia_min, ia_min + rng.integers(0, 120, (channels, n))]
    for lo, hi in ((-40, 60), (-20, 30)):
        off = rng.integers(lo, -lo, (channels, n)).astype(np.float32)
        rows += [off, off + rng.integers(0, hi, (channels, n))]
    # flat-ish patches so both accept paths trigger
    flat = rng.random(n) < 0.3
    for r in rows[1:]:
        r[:, flat] = r[:, flat] // 8 * 8
    big = jnp.asarray(np.concatenate(rows, axis=0, dtype=np.float32))
    plane = big.reshape(7 * channels, gy, gx)

    mr, md = match_neighbors_pallas(plane, channels, interpret=True)

    def flat_pairs(sl_a, sl_b):
        a = np.asarray(plane)[:, sl_a[0], sl_a[1]].reshape(7 * channels, -1)
        b = np.asarray(plane)[:, sl_b[0], sl_b[1]].reshape(7 * channels, -1)
        da = D(*(jnp.asarray(a[channels * i:channels * (i + 1)])
                 for i in range(7)))
        db = D(*(jnp.asarray(b[channels * i:channels * (i + 1)])
                 for i in range(7)))
        m, _ = match_decomps(da, db, channels)
        return np.asarray(m)

    want_l = flat_pairs((slice(None), slice(1, None)),
                        (slice(None), slice(0, -1))).reshape(gy, gx - 1)
    want_u = flat_pairs((slice(1, None), slice(None)),
                        (slice(0, -1), slice(None))).reshape(gy - 1, gx)
    assert np.array_equal(np.asarray(mr)[:, :gx - 1], want_l)
    assert np.array_equal(np.asarray(md)[:gy - 1, :], want_u)


def test_coalesce_segments_kernel_path_matches_jnp():
    """The full coalesce engine with use_kernel=True (interpret mode) must
    reproduce the jnp path bit-exactly: acceptance, written-back planes,
    bits/dist rows, and stats."""
    from limg_tpu.ops import layout
    from limg_tpu.regions import coalesce_segments, encode_levels

    rng = np.random.default_rng(99)
    h, w = 64, 128
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    img[:24] = (img[:24] // 64) * 64          # flat band -> real runs
    img[24:40] = img[24:25]
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder", dithering=False)
    key = jax.random.PRNGKey(3)
    grids, levels = encode_levels(jnp.asarray(img), cfg, key, 1, False)
    grid = grids[0]
    px, mask, _ = layout.blockify(jnp.asarray(img))
    packed = pack_channels(px)
    nb = grid.num_blocks
    seg = np.arange(nb, dtype=np.int32)
    seg[: nb // 2] = (seg[: nb // 2] // 6) * 6    # synthetic runs of 6
    is_run = np.zeros(nb, bool)
    is_run[: nb // 2] = True
    outs = {}
    for uk in (False, True):
        outs[uk] = coalesce_segments(
            packed, mask, jnp.asarray(seg), jnp.asarray(is_run), levels[0],
            cfg, key, "match", 0.0, use_kernel=uk,
        )
    lv_a, app_a, rid_a, nr_a, st_a = outs[False]
    lv_b, app_b, rid_b, nr_b, st_b = outs[True]
    assert np.array_equal(np.asarray(app_a), np.asarray(app_b))
    assert np.array_equal(np.asarray(rid_a), np.asarray(rid_b))
    assert int(nr_a) == int(nr_b)
    assert {k: int(v) for k, v in st_a.items()} == {
        k: int(v) for k, v in st_b.items()}
    for k in ("dec_packed", "q_packed", "bits", "dist", "bpp_block"):
        assert np.array_equal(np.asarray(lv_a[k]), np.asarray(lv_b[k])), k
    for j in range(7):
        assert np.array_equal(np.asarray(lv_a["decomp"][j]),
                              np.asarray(lv_b["decomp"][j])), j
    assert np.array_equal(np.asarray(lv_a["shifts"]), np.asarray(lv_b["shifts"]))
