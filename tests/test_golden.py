"""Self-consistency tests of the NumPy golden model (the test oracle)."""

import numpy as np
import pytest

from limg_tpu import golden
from limg_tpu.config import EncodeConfig


def test_weighted_error_weight_selection():
    a = np.array([10, 20, 30, 40], dtype=np.uint8)
    b = np.array([12, 25, 33, 44], dtype=np.uint8)
    # red diff^2 = 4 < 0x4000 -> weights {2,4,3,3}
    assert golden.weighted_color_error(a, b, 4) == 4 * 2 + 25 * 4 + 9 * 3 + 16 * 3
    c = np.array([200, 20, 30, 40], dtype=np.uint8)
    # red diff^2 = 190^2 >= 0x4000 -> weights {3,4,2,3}
    assert golden.weighted_color_error(c, b, 4) == 188 * 188 * 3 + 25 * 4 + 9 * 2 + 16 * 3


def test_psnr_max_error():
    img = np.zeros((4, 4, 4), dtype=np.uint8)
    white = np.full((4, 4, 4), 255, dtype=np.uint8)
    psnr, mse, mx = golden.compare_psnr(img, white, 3)
    assert mx == 255 * 255 * (3 + 4 + 2)
    assert mse == mx
    assert abs(psnr) < 1e-9


def test_fit_flat_block():
    px = np.full((64, 4), 77, dtype=np.uint8)
    d = golden.fit_3d(px, 3)
    assert np.all(d["dirA_min"] == 77) and np.all(d["dirA_max"] == 77)
    assert np.all(d["dirB_offset"] == 0) and np.all(d["dirC_mag"] == 0)


def test_fit_linear_gradient_recoverable():
    # pixels exactly on a line: decode at shift 0 should be near-exact
    t = np.linspace(0, 1, 64, dtype=np.float32)
    base = np.array([20, 40, 60], np.float32)
    tip = np.array([220, 180, 140], np.float32)
    px = np.zeros((64, 4), dtype=np.uint8)
    px[:, :3] = np.rint(base + t[:, None] * (tip - base)).astype(np.uint8)
    d = golden.fit_3d(px, 3)
    fa, fb, fc = golden.extract_factors(px, d, 3)
    assert fa.min() > -0.01 and fa.max() < 1.01
    fa8, fb8, fc8 = golden.quantize_factors(fa, fb, fc)
    dec = golden.decode_3d(fa8, fb8, fc8, d, (0, 0, 0), 3)
    err = np.abs(dec.astype(int) - px[:, :3].astype(int))
    assert err.max() <= 2


def test_decode_bias_bit_replication():
    # shift 4: q in [0,15] -> q*17 spans 0..255 exactly
    q = np.arange(16, dtype=np.uint8)
    d = dict(
        dirA_min=np.array([0, 0, 0], np.int16),
        dirA_max=np.array([255, 255, 255], np.int16),
        dirB_offset=np.zeros(3, np.int16), dirB_mag=np.zeros(3, np.int16),
        dirC_offset=np.zeros(3, np.int16), dirC_mag=np.zeros(3, np.int16),
    )
    zeros = np.zeros(16, dtype=np.uint8)
    dec = golden.decode_3d(q, zeros, zeros, d, (4, 0, 0), 3)
    expected = ((q.astype(np.int32) * 17 * 255 + 128) >> 8).clip(0, 255)
    assert np.array_equal(dec[:, 0], expected)


def test_factor_drop_semantics():
    # shift 8 on axis A keeps only dirA_min as the contribution
    d = dict(
        dirA_min=np.array([10, 20, 30], np.int16),
        dirA_max=np.array([200, 210, 220], np.int16),
        dirB_offset=np.array([-5, -5, -5], np.int16),
        dirB_mag=np.array([5, 5, 5], np.int16),
        dirC_offset=np.zeros(3, np.int16), dirC_mag=np.zeros(3, np.int16),
    )
    f = np.full(4, 200, dtype=np.uint8)
    dec = golden.decode_3d(f, f, f, d, (8, 8, 8), 3)
    assert np.array_equal(dec, np.tile([10, 20, 30], (4, 1)))


def test_exhaustive_shift_search_monotone_threshold():
    rng = np.random.default_rng(0)
    px = np.clip(
        rng.normal(128, 25, size=(64, 4)), 0, 255
    ).astype(np.uint8)
    px[:, 3] = 255
    d = golden.fit_3d(px, 3)
    fa, fb, fc = golden.extract_factors(px, d, 3)
    f8 = golden.quantize_factors(fa, fb, fc)
    lo = EncodeConfig(error_factor=20)
    hi = EncodeConfig(error_factor=400)
    s_lo, _ = golden.find_shift_exhaustive(px, *f8, d, lo)
    s_hi, _ = golden.find_shift_exhaustive(px, *f8, d, hi)
    assert sum(s_hi) >= sum(s_lo)
    # chosen triple must actually be admissible (or the (0,0,0) fallback)
    if any(s_hi):
        ok, _ = golden.try_crush(px, *f8, d, s_hi, hi)
        assert ok


def test_golden_roundtrip_psnr_reasonable(test_image):
    cfg = EncodeConfig(error_factor=100, has_alpha=False)
    out = golden.encode_image_fixed_grid(test_image, cfg, seed=0)
    assert out["psnr"] > 30.0, f"PSNR too low: {out['psnr']}"
    assert 0 < out["avg_block_bits"] <= 24.0
    assert out["mean_bpp"] < 30


def test_golden_lossless_factors_when_error_factor_zero(test_image):
    cfg = EncodeConfig(error_factor=0, crush_mode="none")
    out = golden.encode_image_fixed_grid(test_image, cfg, seed=0)
    assert np.all(out["shift"] == 0)
    # 8 bits per factor per pixel
    assert out["avg_block_bits"] == pytest.approx(24.0)
