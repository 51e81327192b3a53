"""Randomized property tests: golden oracle vs the batched JAX pipeline.

Each case draws a small image from a different content family and checks
that the exhaustive shift search agrees exactly (given the JAX fit's
endpoints) and that decode stays bit-exact, across error factors.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from limg_tpu import golden
from limg_tpu.config import EncodeConfig
from limg_tpu.ops import layout
from limg_tpu.ops.fit import fit_blocks
from limg_tpu.ops.factors import extract_factors, quantize_factors
from limg_tpu.ops.crush import find_shifts
from limg_tpu.ops.decode import decode_blocks


def _image(kind: str, rng) -> np.ndarray:
    h, w = 16, 16
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 3] = 255
    if kind == "noise":
        img[..., :3] = rng.integers(0, 256, (h, w, 3))
    elif kind == "flat":
        img[..., :3] = rng.integers(0, 256, 3)
    elif kind == "gradient":
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        img[..., 0] = np.clip(rng.integers(0, 100) + 8 * x, 0, 255)
        img[..., 1] = np.clip(rng.integers(0, 100) + 8 * y, 0, 255)
        img[..., 2] = np.clip(rng.integers(0, 100) + 4 * (x + y), 0, 255)
    elif kind == "two-tone":
        img[:, : w // 2, :3] = rng.integers(0, 256, 3)
        img[:, w // 2:, :3] = rng.integers(0, 256, 3)
    elif kind == "speckle":
        img[..., :3] = rng.integers(100, 140, (h, w, 3))
        ys, xs = rng.integers(0, h, 8), rng.integers(0, w, 8)
        img[ys, xs, :3] = rng.integers(0, 256, (8, 3))
    return img


@pytest.mark.parametrize("kind", ["noise", "flat", "gradient", "two-tone", "speckle"])
@pytest.mark.parametrize("ef", [50, 400])
def test_exhaustive_search_and_decode_match_golden(kind, ef):
    rng = np.random.default_rng(hash((kind, ef)) % 2**31)
    img = _image(kind, rng)
    cfg = EncodeConfig(error_factor=ef, crush_mode="exhaustive", dithering=False)
    px, mask, _ = layout.blockify(jnp.asarray(img))
    d = fit_blocks(px, mask, 3)
    f8 = quantize_factors(*extract_factors(px, d, 3))
    shifts, _ = find_shifts(px, mask, f8, d, cfg)
    shifts_np = np.asarray(shifts)

    names = ["dirA_min", "dirA_max", "dirB_offset", "dirB_mag",
             "dirC_offset", "dirC_mag"]
    for b in range(px.shape[-1]):
        gd = {n: np.asarray(getattr(d, n))[:, b].astype(np.int16) for n in names}
        ga, gb_, gc = (np.asarray(f8[i])[:, b] for i in range(3))
        blk = np.asarray(px)[:, :, b].T  # (P, ch)
        want, _ = golden.find_shift_exhaustive(blk, ga, gb_, gc, gd, cfg)
        assert tuple(shifts_np[:, b]) == want, (kind, ef, b)

    # decode bit-exactness on the chosen shifts
    q = jnp.stack([p.astype(jnp.int32) for p in f8]) >> jnp.minimum(shifts, 8)[:, None, :]
    dec = np.asarray(decode_blocks(q, shifts, d, 3))
    for b in range(px.shape[-1]):
        gd = {n: np.asarray(getattr(d, n))[:, b].astype(np.int16) for n in names}
        want = golden.decode_3d(
            np.asarray(q[0, :, b], np.uint8), np.asarray(q[1, :, b], np.uint8),
            np.asarray(q[2, :, b], np.uint8), gd, shifts_np[:, b], 3,
        )
        assert np.array_equal(dec[:, :, b].T, want)


def test_dither_noise_distribution():
    """Dither adds uniform noise in [-2^(s-1), 2^(s-1)) before crushing
    (src/limg.cpp:799-822): verify range and approximate uniformity."""
    from limg_tpu.ops.dither import dither_crush

    nb, s = 512, 4
    f8 = jnp.full((3, 64, nb), 128, jnp.int32)
    shifts = jnp.full((3, nb), s, jnp.int32)
    q = np.asarray(dither_crush(jax.random.PRNGKey(1), f8, shifts))
    # q = (128 + noise) >> 4 with noise in [-8, 8) -> q in {7, 8}
    assert set(np.unique(q)) <= {7, 8}
    frac = (q == 8).mean()
    assert 0.45 < frac < 0.55  # 128+noise >= 128 for noise in [0,8): p=0.5
