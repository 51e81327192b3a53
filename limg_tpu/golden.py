"""NumPy golden model of the limg codec.

This is the test oracle for every TPU kernel: a direct, unoptimized NumPy
statement of the algorithm the reference implements in C++/SSE. The reference
ships no tests (SURVEY.md section 4), so this model *is* the missing test
layer. Semantics follow the scalar (non-SIMD) reference paths:

- weighted color error        reference: src/limg_internal.h:376-410
- 3-factor sequential fit     reference: src/limg_factorization.h:796-1247
- factor extraction           reference: src/limg_factorization.h:9-96
- bit-crush admissibility     reference: src/limg_bit_crush.h:96-313
- integer decode              reference: src/limg_decode.h:238-324
- weighted PSNR               reference: src/limg.cpp:2455-2491
- bits-per-pixel estimate     reference: src/limg.cpp:1629-1636

Documented deviations from the reference (quality-gated, not bit-gated):

1. Shift search: the reference runs a greedy serial scan with early exits
   (src/limg_bit_crush.h:395-500); the golden model computes the true optimum
   over all 9^3 shift triples -- max total shift, tie-broken by min block
   error then lexicographically largest triple. This dominates the
   reference's greedy result (>= total shift at equal thresholds).
2. Factor quantization rounds to nearest (ties-to-even) like the reference's
   SSE path (_mm_cvtps_epi32, src/limg_factorization.h:126), not the scalar
   path's trunc(x*255+0.5).
3. For RGBA, dropping a factor (shift=8) zeroes the normal on *all four*
   channels; the reference zeroes only the first three
   (src/limg_bit_crush.h:118-138 loops `i < 3` even for channels==4).
4. rsqrt is exact, not the SSE 12-bit approximation.
"""

from __future__ import annotations

import numpy as np

from .config import EncodeConfig, static_block_bits

# Bit-replication decode bias per shift (reference: src/limg_decode.h:282-286
# computes this on the fly; the closed form for shifts 0..8 is below --
# dequantized = (q << s) + q * DECODE_BIAS[s], reproducing the high bits of q
# into the low bits of the dequantized value).
DECODE_BIAS = np.array([0, 0, 0, 0, 1, 4, 21, 127, 0], dtype=np.int32)

# Reference guess triples (src/limg_bit_crush.h:337-389).
GUESS_TRIPLES = ((4, 5, 6), (5, 8, 8), (4, 6, 8), (2, 4, 5))


# --------------------------------------------------------------------------
# Error model
# --------------------------------------------------------------------------

def weighted_color_error(a: np.ndarray, b: np.ndarray, channels: int) -> np.ndarray:
    """Perceptually weighted squared error between u8 colors.

    ``a``/``b``: (..., ch>=channels) uint8. Channel weights depend on the
    red value of ``a``: {2,4,3,3} if a.red < 0x80 else {3,4,2,3}
    (reference: src/limg_internal.h:376-410).
    """
    a_i = a[..., :channels].astype(np.int64)
    b_i = b[..., :channels].astype(np.int64)
    d2 = (a_i - b_i) ** 2
    w_lo = np.array([2, 4, 3, 3][:channels], dtype=np.int64)
    w_hi = np.array([3, 4, 2, 3][:channels], dtype=np.int64)
    red_lo = d2[..., 0] < 0x4000  # (a.red - b.red)^2 < 0x80^2
    w = np.where(red_lo[..., None], w_lo, w_hi)
    return (d2 * w).sum(axis=-1)


def compare_psnr(img_a: np.ndarray, img_b: np.ndarray, channels: int):
    """Weighted-MSE PSNR over a full image (reference: src/limg.cpp:2455-2491).

    Returns (psnr_db, mse, max_possible_error).
    """
    black = np.zeros(4, dtype=np.uint8)
    white = np.full(4, 0xFF, dtype=np.uint8)
    max_err = int(weighted_color_error(black, white, channels))
    err = weighted_color_error(
        img_a.reshape(-1, img_a.shape[-1]), img_b.reshape(-1, img_b.shape[-1]), channels
    ).sum()
    n = img_a.shape[0] * img_a.shape[1] if img_a.ndim == 3 else img_a.shape[0]
    mse = err / n
    psnr = 10.0 * np.log10(max_err / mse) if mse > 0 else np.inf
    return psnr, mse, max_err


# --------------------------------------------------------------------------
# 3-factor fit
# --------------------------------------------------------------------------

def _signed_unit_mean(vecs: np.ndarray) -> np.ndarray:
    """Mean of sign-corrected unit vectors, the reference's direction estimate.

    Each row is normalized to unit length with the sign chosen so the
    largest-|component| entry is positive (reference:
    src/limg_factorization.h:816-851: copysign(rsqrt(len^2), v[argmax|v|])).
    Zero rows contribute nothing. Result is divided by the row count
    (including zero rows), matching `diff_xi *= inv_count`.
    """
    vecs = vecs.astype(np.float32)
    n = vecs.shape[0]
    len_sq = (vecs * vecs).sum(axis=1)
    nonzero = len_sq > 0
    max_idx = np.argmax(np.abs(vecs), axis=1)
    lead = vecs[np.arange(n), max_idx]
    inv_len = np.zeros(n, dtype=np.float32)
    inv_len[nonzero] = np.float32(1.0) / np.sqrt(len_sq[nonzero], dtype=np.float32)
    inv_len = np.copysign(inv_len, np.where(lead == 0, 1.0, lead)).astype(np.float32)
    contrib = vecs * inv_len[:, None]
    return contrib.sum(axis=0, dtype=np.float32) / np.float32(n)


def fast_round(x: np.ndarray) -> np.ndarray:
    """limg_fast_round_int16: floor(x + 0.5) as int16 (src/limg_internal.h:689)."""
    return np.floor(x.astype(np.float32) + np.float32(0.5)).astype(np.int16)


def fit_3d(pixels: np.ndarray, channels: int) -> dict:
    """Sequential 3-axis linear fit of one block.

    ``pixels``: (N, >=channels) uint8. Returns the decomposition
    (reference ``limg_encode_3d_output``, src/limg_internal.h:343-353):
    avg float32[ch], int16 endpoints dirA_min/max, dirB_offset/mag,
    dirC_offset/mag. Mirrors limg_encode_get_block_factors_accurate_from_
    state_3d_{3,4} (src/limg_factorization.h:796-1247).
    """
    px = pixels[:, :channels].astype(np.float32)
    n = px.shape[0]
    avg = px.sum(axis=0, dtype=np.int64).astype(np.float32) / np.float32(n)

    corrected = px - avg
    dir_a = _signed_unit_mean(corrected)

    zeros16 = np.zeros(channels, dtype=np.int16)
    if not np.any(dir_a != 0):
        a16 = fast_round(avg)
        return dict(
            avg=avg,
            dirA_min=a16, dirA_max=a16.copy(),
            dirB_offset=zeros16, dirB_mag=zeros16.copy(),
            dirC_offset=zeros16.copy(), dirC_mag=zeros16.copy(),
        )

    inv_len_a = np.float32(1.0) / np.dot(dir_a, dir_a)
    fac_a = corrected @ dir_a * inv_len_a
    est = avg + fac_a[:, None] * dir_a
    resid_a = px - est
    dir_b = _signed_unit_mean(resid_a)

    if channels == 3:
        dir_c = np.cross(dir_a, dir_b).astype(np.float32)
        inv_len_b = np.float32(1.0) / max(np.dot(dir_b, dir_b), np.float32(1e-38))
        inv_len_c = np.float32(1.0) / max(np.dot(dir_c, dir_c), np.float32(1e-38))
        fac_b = (px - est) @ dir_b * inv_len_b
        est_b = est + fac_b[:, None] * dir_b
        fac_c = (px - est_b) @ dir_c * inv_len_c
    else:
        # R^4 has no cross product; the reference runs a third residual sweep
        # (src/limg_factorization.h:1002-1247).
        inv_len_b = np.float32(1.0) / max(np.dot(dir_b, dir_b), np.float32(1e-38))
        fac_b = (px - est) @ dir_b * inv_len_b
        est_b = est + fac_b[:, None] * dir_b
        resid_ab = px - est_b
        dir_c = _signed_unit_mean(resid_ab)
        inv_len_c = np.float32(1.0) / max(np.dot(dir_c, dir_c), np.float32(1e-38))
        fac_c = resid_ab @ dir_c * inv_len_c

    mn_a, mx_a = np.float32(fac_a.min()), np.float32(fac_a.max())
    mn_b, mx_b = np.float32(fac_b.min()), np.float32(fac_b.max())
    mn_c, mx_c = np.float32(fac_c.min()), np.float32(fac_c.max())

    return dict(
        avg=avg,
        dirA_min=fast_round(avg + mn_a * dir_a),
        dirA_max=fast_round(avg + mx_a * dir_a),
        dirB_offset=fast_round(mn_b * dir_b),
        dirB_mag=fast_round(mx_b * dir_b),
        dirC_offset=fast_round(mn_c * dir_c),
        dirC_mag=fast_round(mx_c * dir_c),
    )


# --------------------------------------------------------------------------
# Factor extraction
# --------------------------------------------------------------------------

def _normals(decomp: dict) -> tuple[np.ndarray, ...]:
    """Axis normals + inverse squared lengths from int16 endpoints.

    Reference: limg_init_color_error_state_3d (src/limg_internal.h:427-452).
    """
    na = (decomp["dirA_max"].astype(np.int32) - decomp["dirA_min"]).astype(np.float32)
    nb = (decomp["dirB_mag"].astype(np.int32) - decomp["dirB_offset"]).astype(np.float32)
    nc = (decomp["dirC_mag"].astype(np.int32) - decomp["dirC_offset"]).astype(np.float32)

    def inv_sq(v):
        s = np.float32(np.dot(v, v))
        return np.float32(0.0) if s == 0 else np.float32(1.0) / s

    return na, nb, nc, inv_sq(na), inv_sq(nb), inv_sq(nc)


def extract_factors(pixels: np.ndarray, decomp: dict, channels: int):
    """Project pixels onto the three axes -> float factors (fa, fb, fc).

    Reference: limg_color_error_state_3d_get_factors
    (src/limg_factorization.h:9-75).
    """
    px = pixels[:, :channels].astype(np.float32)
    na, nb, nc, ila, ilb, ilc = _normals(decomp)
    min_a = decomp["dirA_min"].astype(np.float32)
    off_b = decomp["dirB_offset"].astype(np.float32)
    off_c = decomp["dirC_offset"].astype(np.float32)

    fa = (px - min_a) @ na * ila
    est = min_a + fa[:, None] * na
    fb = (px - est - off_b) @ nb * ilb
    est = est + fb[:, None] * nb
    fc = (px - est - off_c) @ nc * ilc
    return fa, fb, fc


def quantize_factors(fa, fb, fc):
    """float factors -> u8 planes: clamp(rint(f*255), 0, 255).

    (deviation 2 in the module docstring: rint, matching the reference SSE
    path at src/limg_factorization.h:126.)
    """
    def q(f):
        return np.clip(np.rint(f * np.float32(255.0)), 0, 255).astype(np.uint8)

    return q(fa), q(fb), q(fc)


# --------------------------------------------------------------------------
# Integer decode / crush simulation
# --------------------------------------------------------------------------

def decode_3d(fa_u8, fb_u8, fc_u8, decomp: dict, shift, channels: int) -> np.ndarray:
    """Integer reconstruction from crushed factor planes.

    ``f*_u8`` are the *crushed* factors (already >> shift). Reference:
    limg_decode_block_from_factors_3d_ (src/limg_decode.h:238-324).
    Returns (N, channels) uint8.
    """
    s = np.asarray(shift, dtype=np.int32)
    normal = np.stack([
        decomp["dirA_max"].astype(np.int32) - decomp["dirA_min"],
        decomp["dirB_mag"].astype(np.int32) - decomp["dirB_offset"],
        decomp["dirC_mag"].astype(np.int32) - decomp["dirC_offset"],
    ])  # (3, ch)
    mins = np.stack([
        decomp["dirA_min"].astype(np.int32),
        decomp["dirB_offset"].astype(np.int32),
        decomp["dirC_offset"].astype(np.int32),
    ])
    # shift > 7 drops the factor: normal zeroed; B/C also zero their offset,
    # A keeps dirA_min (src/limg_decode.h:260-280). Deviation 3: all channels.
    dropped = s > 7
    normal = np.where(dropped[:, None], 0, normal)
    mins[1] = np.where(dropped[1], 0, mins[1])
    mins[2] = np.where(dropped[2], 0, mins[2])

    s_eff = np.minimum(s, 8)
    bias = DECODE_BIAS[s_eff]
    f = np.stack([fa_u8, fb_u8, fc_u8]).astype(np.int32)  # (3, N)
    f_dec = (f << s_eff[:, None]) + f * bias[:, None]     # (3, N)

    # (3, N, ch): per-axis contribution, then summed. >> is arithmetic.
    contrib = mins[:, None, :] + ((f_dec[:, :, None] * normal[:, None, :] + 128) >> 8)
    est = contrib.sum(axis=0)
    return np.clip(est, 0, 255).astype(np.uint8)


def try_crush(pixels, fa_u8, fb_u8, fc_u8, decomp, shift, cfg: EncodeConfig):
    """Admissibility of one shift triple.

    Simulated decode with factors >> shift, then per-pixel and block error
    checks (reference: limg_encode_try_bit_crush_block_3d_,
    src/limg_bit_crush.h:96-313). Returns (ok, block_error).
    """
    s = np.asarray(shift, dtype=np.int32)
    s_eff = np.minimum(s, 8)
    qa = (fa_u8.astype(np.int32) >> s_eff[0]).astype(np.uint8)
    qb = (fb_u8.astype(np.int32) >> s_eff[1]).astype(np.uint8)
    qc = (fc_u8.astype(np.int32) >> s_eff[2]).astype(np.uint8)
    dec = decode_3d(qa, qb, qc, decomp, shift, cfg.channels)
    err = weighted_color_error(dec, pixels[:, :cfg.channels], cfg.channels)
    if (err > cfg.max_pixel_bit_crush_error).any():
        return False, int(err.sum())
    block_error = int(err.sum())
    n = pixels.shape[0]
    ok = block_error * 0x10 < cfg.max_block_bit_crush_error * n
    return ok, block_error


def find_shift_exhaustive(pixels, fa_u8, fb_u8, fc_u8, decomp, cfg: EncodeConfig):
    """Optimal shift triple over the full 9^3 lattice (deviation 1).

    Maximize total shift; tie-break min block error, then lexicographically
    largest (a, b, c). Returns ((a, b, c), block_error_of_choice).
    """
    best = (0, 0, 0)
    best_total = -1
    best_err = None
    for a in range(9):
        for b in range(9):
            for c in range(9):
                ok, berr = try_crush(pixels, fa_u8, fb_u8, fc_u8, decomp, (a, b, c), cfg)
                if not ok:
                    continue
                total = a + b + c
                key = (total, -berr, a, b, c)
                if best_err is None or key > (best_total, -best_err, *best):
                    best, best_total, best_err = (a, b, c), total, berr
    if best_err is None:
        return (0, 0, 0), None
    return best, best_err


# --------------------------------------------------------------------------
# Dither
# --------------------------------------------------------------------------

def dither_and_crush(factors_u8: np.ndarray, shift: int, rng: np.random.Generator):
    """Add uniform noise in [-2^(s-1), 2^(s-1)), clamp, then >> shift.

    Statistical parity with the reference's PCG/AES dither
    (src/limg.cpp:799-887); the PRNG differs by design.
    """
    if shift == 0 or shift > 7:
        return (factors_u8 >> min(shift, 8)).astype(np.uint8)
    noise = rng.integers(0, 1 << shift, size=factors_u8.shape, dtype=np.int32) - (1 << (shift - 1))
    out = np.clip(factors_u8.astype(np.int32) + noise, 0, 255).astype(np.uint8)
    return (out >> shift).astype(np.uint8)


# --------------------------------------------------------------------------
# Full fixed-grid encode (the oracle pipeline)
# --------------------------------------------------------------------------

def bits_per_pixel_u8(shift, n: int, channels: int) -> int:
    """Rounded per-pixel bits estimate (reference: src/limg.cpp:1629-1636)."""
    pixel_bits = n * sum(8 - min(int(s), 8) for s in shift)
    bits = static_block_bits(channels) + pixel_bits
    return min(0xFF, (bits + n // 2) // n)


def encode_image_fixed_grid(image: np.ndarray, cfg: EncodeConfig, seed: int = 0):
    """Encode an (H, W, 4) uint8 image on the fixed 8x8 grid, no merging.

    Oracle for the TPU pipeline (reference driver: limg_encode3d_test,
    src/limg.cpp:1887-2265). Returns a dict of planes + stats.
    """
    from .config import BLOCK_SIZE

    h, w = image.shape[:2]
    ch = cfg.channels
    rng = np.random.default_rng(seed)
    decoded = np.zeros((h, w, 4), dtype=np.uint8)
    decoded[..., 3] = 0xFF
    fac_planes = [np.zeros((h, w), dtype=np.uint8) for _ in range(3)]
    shift_plane = np.zeros((h, w, 3), dtype=np.uint8)
    bpp_plane = np.zeros((h, w), dtype=np.uint8)
    accum_bits = np.zeros(3, dtype=np.int64)

    for y0 in range(0, h, BLOCK_SIZE):
        for x0 in range(0, w, BLOCK_SIZE):
            ry = min(BLOCK_SIZE, h - y0)
            rx = min(BLOCK_SIZE, w - x0)
            block = image[y0:y0 + ry, x0:x0 + rx].reshape(-1, image.shape[-1])
            n = block.shape[0]
            decomp = fit_3d(block, ch)
            fa, fb, fc = extract_factors(block, decomp, ch)
            fa8, fb8, fc8 = quantize_factors(fa, fb, fc)

            shift = (0, 0, 0)
            if cfg.crush_bits:
                shift, _ = find_shift_exhaustive(block, fa8, fb8, fc8, decomp, cfg)

            if cfg.dithering and any(shift):
                qa = dither_and_crush(fa8, shift[0], rng)
                qb = dither_and_crush(fb8, shift[1], rng)
                qc = dither_and_crush(fc8, shift[2], rng)
            else:
                qa = (fa8 >> shift[0]).astype(np.uint8)
                qb = (fb8 >> shift[1]).astype(np.uint8)
                qc = (fc8 >> shift[2]).astype(np.uint8)

            dec = decode_3d(qa, qb, qc, decomp, shift, ch)
            blk = np.zeros((n, 4), dtype=np.uint8)
            blk[:, 3] = 0xFF
            blk[:, :ch] = dec
            decoded[y0:y0 + ry, x0:x0 + rx] = blk.reshape(ry, rx, 4)

            for plane, q, s in zip(fac_planes, (qa, qb, qc), shift):
                plane[y0:y0 + ry, x0:x0 + rx] = (
                    (q.astype(np.int32) << s) & 0xFF
                ).astype(np.uint8).reshape(ry, rx)
            shift_plane[y0:y0 + ry, x0:x0 + rx] = np.asarray(shift, dtype=np.uint8)
            bpp_plane[y0:y0 + ry, x0:x0 + rx] = bits_per_pixel_u8(shift, n, ch)
            accum_bits += [(8 - min(s, 8)) * n for s in shift]

    psnr, mse, _ = compare_psnr(image, decoded, ch)
    total_px = h * w
    return dict(
        decoded=decoded,
        factors=fac_planes,
        shift=shift_plane,
        bpp=bpp_plane,
        psnr=psnr,
        mse=mse,
        mean_bpp=float(bpp_plane.mean()),
        avg_block_bits=float(accum_bits.sum() / total_px),
    )
