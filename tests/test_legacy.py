"""Tests for the legacy 1-factor encoder (limg_encode_test analog)."""

import numpy as np
import jax.numpy as jnp

from limg_tpu.legacy import (
    LegacyConfig, decode_1d, encode_legacy, find_shift_1d, fit_2pt,
)
from limg_tpu.ops import layout
from tests.conftest import make_test_image


def test_decode_1d_mod256_semantics():
    # b < a on a channel: the reference's unsigned wrap-around decode
    # (src/limg_decode.h:6-34) is mod-256, not clamped
    a = jnp.asarray([[200], [10], [100]], jnp.int32)
    b = jnp.asarray([[100], [240], [100]], jnp.int32)
    q = jnp.full((4, 1), 255, jnp.int32)  # factor 1.0 at shift 0
    dec = np.asarray(decode_1d(q, jnp.zeros((1,), jnp.int32), a, b, 3))
    # a + round((255*diff)/256): diff=-100 -> 200-100=100ish; diff=230 -> ~239
    assert abs(int(dec[0, 0, 0]) - 100) <= 1
    assert abs(int(dec[1, 0, 0]) - 239) <= 1
    assert int(dec[2, 0, 0]) == 100


def test_shift_prefix_search_monotone():
    rng = np.random.default_rng(0)
    img = make_test_image(rng, 16, 16)
    px, mask, _ = layout.blockify(jnp.asarray(img))
    cfg_hi = LegacyConfig(error_factor=800)
    cfg_lo = LegacyConfig(error_factor=50)
    a, b, fac, _, _ = fit_2pt(px, mask, cfg_hi)
    f8 = jnp.clip(jnp.rint(fac * 255.0), 0, 255).astype(jnp.int32)
    s_hi = np.asarray(find_shift_1d(px, mask, f8, a, b, cfg_hi))
    s_lo = np.asarray(find_shift_1d(px, mask, f8, a, b, cfg_lo))
    assert (s_hi >= s_lo).all()
    assert (s_hi <= 7).all() and (s_lo >= 0).all()


def test_legacy_flat_image_full_coverage():
    img = np.full((32, 32, 4), 99, np.uint8)
    img[..., 3] = 255
    out = encode_legacy(img, LegacyConfig(error_factor=100))
    assert out["coverage"] == 100.0
    assert out["mse"] == 0.0


def test_legacy_noisy_content_partial_coverage_lossless_fallback(rng):
    # the reference's legacy path rejects blocks whose mean fit error
    # exceeds maxBlockPixelError and copies those pixels from the source
    # (src/limg.cpp:1072-1074) -- heavy noise means partial coverage but
    # the fallback keeps overall PSNR high
    img = make_test_image(rng, 48, 64)
    out = encode_legacy(img, LegacyConfig(error_factor=100))
    assert out["coverage"] < 100.0
    assert out["psnr"] > 40.0  # uncovered pixels are lossless
    # uncovered pixels must be identical to the source
    unc = ~out["covered"]
    assert np.array_equal(out["decoded"][unc][..., :3], img[unc][..., :3])


def test_legacy_smooth_gradient_mostly_covered():
    y, x = np.mgrid[0:48, 0:64].astype(np.float32)
    img = np.stack([60 + 2 * x, 40 + y, 90 + x + y, np.full((48, 64), 255.0)], -1)
    img = np.clip(img, 0, 255).astype(np.uint8)
    out = encode_legacy(img, LegacyConfig(error_factor=100))
    assert out["coverage"] > 90.0
    assert out["psnr"] > 35.0


def test_legacy_pixel_grow_extends_boundaries(rng):
    """Pixel-granular boundary growth (src/limg.cpp:508-796 analog): a
    smooth surface whose edge is NOT 8-aligned gets covered past the last
    accepted block boundary in 2-px steps, with the grown pixels decoded
    through the borrowed region line (not the lossless fallback)."""
    h, w = 40, 64
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 3] = 255
    # smooth gradient everywhere; hard noise only in x >= 36 (mid-block of
    # block column 4) so blocks 0..3 fit, block 4 fails its own fit
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img[..., 0] = np.clip(60 + 2 * x, 0, 255)
    img[..., 1] = np.clip(40 + y, 0, 255)
    img[..., 2] = np.clip(90 + x, 0, 255)
    noise = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    img[:, 36:, :3] = noise[:, 36:]

    grown = encode_legacy(img, LegacyConfig(error_factor=100))
    flat = encode_legacy(
        img, LegacyConfig(error_factor=100, pixel_grow=False))
    assert grown["grown_px"] > 0
    assert flat["grown_px"] == 0
    assert grown["coverage"] > flat["coverage"]
    # growth happens in the 32..36 px fringe left of the noisy band
    fringe = grown["covered"][:, 32:36] & ~flat["covered"][:, 32:36]
    assert fringe.any()
    # grown pixels decode through the region line yet stay acceptable
    assert grown["psnr"] > 30.0
