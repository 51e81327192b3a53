"""Parity of the batched JAX pipeline against the NumPy golden model.

Integer stages (decode, crush admissibility) must match bit-exactly given
identical inputs. Float stages (fit, factor extraction) are compared with
small tolerances: reduction order differs between NumPy and XLA, so rounded
u8/int16 outputs may disagree on a tiny fraction of borderline values.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from limg_tpu import golden
from limg_tpu.config import EncodeConfig, BLOCK_SIZE
from limg_tpu.ops import layout
from limg_tpu.ops.fit import fit_blocks, Decomposition
from limg_tpu.ops.factors import extract_factors, quantize_factors
from limg_tpu.ops.decode import decode_blocks
from limg_tpu.ops.crush import evaluate_shifts, find_shifts
from limg_tpu.ops.error import weighted_error, psnr


def _golden_blocks(image, ch):
    """Per-block golden decompositions + pixel lists, row-major grid order."""
    h, w = image.shape[:2]
    blocks = []
    for y0 in range(0, h, BLOCK_SIZE):
        for x0 in range(0, w, BLOCK_SIZE):
            ry = min(BLOCK_SIZE, h - y0)
            rx = min(BLOCK_SIZE, w - x0)
            blocks.append(image[y0:y0 + ry, x0:x0 + rx].reshape(-1, 4))
    return blocks


def _decomp_field(d: Decomposition, name, b):
    return np.asarray(getattr(d, name))[:, b]


def test_blockify_roundtrip(test_image):
    px, mask, grid = layout.blockify(jnp.asarray(test_image))
    back = layout.unblockify(px, grid)
    assert np.array_equal(np.asarray(back), test_image)
    assert int(mask.sum()) == test_image.shape[0] * test_image.shape[1]


def test_weighted_error_matches_golden(rng):
    a = rng.integers(0, 256, (4, 50), dtype=np.uint8)
    b = rng.integers(0, 256, (4, 50), dtype=np.uint8)
    got = np.asarray(weighted_error(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32)))
    want = golden.weighted_color_error(a.T, b.T, 4)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("channels", [3, 4])
def test_fit_matches_golden(test_image, channels):
    image = test_image
    px, mask, grid = layout.blockify(jnp.asarray(image))
    d = jax.jit(fit_blocks, static_argnames="channels")(px, mask, channels)
    blocks = _golden_blocks(image, channels)
    fields = ["dirA_min", "dirA_max", "dirB_offset", "dirB_mag", "dirC_offset", "dirC_mag"]
    mismatches = 0
    for b, blk in enumerate(blocks):
        gd = golden.fit_3d(blk, channels)
        for f in fields:
            got = _decomp_field(d, f, b)
            want = gd[f].astype(np.int32)
            # float32 reduction-order differences can move a rounded int16
            # endpoint by 1; count anything larger as a real mismatch
            if not np.all(np.abs(got - want) <= 1):
                mismatches += 1
    assert mismatches == 0


def test_factors_match_golden(test_image):
    ch = 3
    image = test_image
    px, mask, grid = layout.blockify(jnp.asarray(image))
    d = fit_blocks(px, mask, ch)
    fa, fb, fc = extract_factors(px, d, ch)
    qa, qb, qc = quantize_factors(fa, fb, fc)
    blocks = _golden_blocks(image, ch)
    total = 0
    off_by_more = 0
    for b, blk in enumerate(blocks):
        gd = {k: _decomp_field(d, k, b).astype(np.int16) for k in
              ["dirA_min", "dirA_max", "dirB_offset", "dirB_mag", "dirC_offset", "dirC_mag"]}
        gd["avg"] = np.asarray(d.avg)[:, b]
        gfa, gfb, gfc = golden.extract_factors(blk, gd, ch)
        g8 = golden.quantize_factors(gfa, gfb, gfc)
        n = blk.shape[0]
        for got, want in zip((qa, qb, qc), g8):
            gv = np.asarray(got)[:n, b]
            off_by_more += int((np.abs(gv.astype(int) - want.astype(int)) > 1).sum())
            total += n
    assert off_by_more / total < 0.001


def test_decode_matches_golden_bitexact(rng):
    """Integer decode must match the golden model exactly."""
    nb = 17
    ch = 3
    d = Decomposition(
        avg=jnp.zeros((ch, nb), jnp.float32),
        dirA_min=jnp.asarray(rng.integers(-50, 100, (ch, nb)), jnp.int32),
        dirA_max=jnp.asarray(rng.integers(100, 300, (ch, nb)), jnp.int32),
        dirB_offset=jnp.asarray(rng.integers(-60, 0, (ch, nb)), jnp.int32),
        dirB_mag=jnp.asarray(rng.integers(0, 60, (ch, nb)), jnp.int32),
        dirC_offset=jnp.asarray(rng.integers(-30, 0, (ch, nb)), jnp.int32),
        dirC_mag=jnp.asarray(rng.integers(0, 30, (ch, nb)), jnp.int32),
    )
    q = jnp.asarray(rng.integers(0, 256, (3, 64, nb)), jnp.int32)
    shifts_np = rng.integers(0, 9, (3, nb)).astype(np.int32)
    shifts = jnp.asarray(shifts_np)
    # q must be consistent with shift (q = f >> s fits in 8-s bits)
    q = q >> jnp.minimum(shifts, 8)[:, None, :]
    got = np.asarray(decode_blocks(q, shifts, d, ch))

    for b in range(nb):
        gd = {k: np.asarray(getattr(d, k))[:, b].astype(np.int16) for k in
              ["dirA_min", "dirA_max", "dirB_offset", "dirB_mag", "dirC_offset", "dirC_mag"]}
        want = golden.decode_3d(
            np.asarray(q[0, :, b], np.uint8),
            np.asarray(q[1, :, b], np.uint8),
            np.asarray(q[2, :, b], np.uint8),
            gd, shifts_np[:, b], ch,
        )
        assert np.array_equal(got[:, :, b].T, want), f"block {b}"


def test_crush_eval_matches_golden(test_image):
    ch = 3
    cfg = EncodeConfig(error_factor=100)
    image = test_image
    px, mask, grid = layout.blockify(jnp.asarray(image))
    d = fit_blocks(px, mask, ch)
    fa, fb, fc = extract_factors(px, d, ch)
    f8_u8 = quantize_factors(fa, fb, fc)
    f8 = jnp.stack([p.astype(jnp.int32) for p in f8_u8])
    mask_i = mask.astype(jnp.int32)
    nb = px.shape[-1]

    for triple in [(0, 0, 0), (4, 5, 6), (2, 4, 5), (8, 8, 8), (1, 7, 3)]:
        shifts = jnp.broadcast_to(jnp.asarray(triple, jnp.int32)[:, None], (3, nb))
        pix_max, block_err = evaluate_shifts(
            px[:ch].astype(jnp.int32), mask_i, f8, d, shifts, ch
        )
        blocks = _golden_blocks(image, ch)
        for b, blk in enumerate(blocks):
            gd = {k: _decomp_field(d, k, b).astype(np.int16) for k in
                  ["dirA_min", "dirA_max", "dirB_offset", "dirB_mag", "dirC_offset", "dirC_mag"]}
            n = blk.shape[0]
            ga = np.asarray(f8_u8[0])[:n, b]
            gb = np.asarray(f8_u8[1])[:n, b]
            gc = np.asarray(f8_u8[2])[:n, b]
            ok, berr = golden.try_crush(blk, ga, gb, gc, gd, triple, cfg)
            assert int(block_err[b]) == berr, (triple, b)


def test_find_shifts_exhaustive_matches_golden(test_image):
    ch = 3
    cfg = EncodeConfig(error_factor=100, crush_mode="exhaustive")
    # small crop to keep the 729-triple golden loop fast
    image = test_image[:16, :24]
    px, mask, grid = layout.blockify(jnp.asarray(image))
    d = fit_blocks(px, mask, ch)
    f8_u8 = quantize_factors(*extract_factors(px, d, ch))
    shifts, _ = find_shifts(px, mask, f8_u8, d, cfg)
    shifts = np.asarray(shifts)

    blocks = _golden_blocks(image, ch)
    for b, blk in enumerate(blocks):
        gd = {k: _decomp_field(d, k, b).astype(np.int16) for k in
              ["dirA_min", "dirA_max", "dirB_offset", "dirB_mag", "dirC_offset", "dirC_mag"]}
        n = blk.shape[0]
        ga, gb, gc = (np.asarray(f8_u8[i])[:n, b] for i in range(3))
        want, _ = golden.find_shift_exhaustive(blk, ga, gb, gc, gd, cfg)
        assert tuple(shifts[:, b]) == want, f"block {b}"


def test_psnr_matches_golden(test_image, rng):
    noisy = np.clip(
        test_image.astype(int) + rng.integers(-9, 10, test_image.shape), 0, 255
    ).astype(np.uint8)
    got, _ = psnr(jnp.asarray(test_image), jnp.asarray(noisy), 3)
    want, _, _ = golden.compare_psnr(test_image, noisy, 3)
    assert abs(float(got) - want) < 1e-3
