"""Fused (Morton single-crush-pass) merged encoder vs the dense path.

The fused path reorders float reductions (group butterfly trees vs flat
sums), so parity is gated at the owner-map / PSNR / bpp level, not bitwise.
It also intentionally merges grid-edge regions whose quadtree parents the
dense path rejects for having out-of-grid children (auto-matching empty
children), so owner maps agree on interior content but may differ at the
padded edge in fused's favor.
"""

import numpy as np
import pytest

from limg_tpu import EncodeConfig
from limg_tpu.pallas_kernels.encode_merged import morton_perm
from limg_tpu.regions import encode_image_merged

from tests.conftest import make_test_image


def test_morton_perm_is_permutation():
    perm, byp, bxp = morton_perm(9, 12, 3)
    assert byp == 12 and bxp == 12
    real = perm[perm >= 0]
    assert sorted(real.tolist()) == list(range(9 * 12))
    # children of any parent are contiguous and in (0,0),(0,1),(1,0),(1,1) order
    for j in (0, 5, 17):
        quad = perm[4 * j:4 * j + 4]
        ys, xs = quad[quad >= 0] // 12, quad[quad >= 0] % 12
        if len(ys) == 4:
            assert ys.tolist() == sorted(ys.tolist())
            assert (ys.max() - ys.min(), xs.max() - xs.min()) == (1, 1)


def test_morton_groups_are_aligned_squares():
    perm, byp, bxp = morton_perm(8, 8, 3)
    for lvl, g in ((1, 4), (2, 16)):
        side = 1 << lvl
        for j in range(64 // g):
            grp = perm[g * j:g * (j + 1)]
            ys, xs = grp // 8, grp % 8
            assert ys.min() % side == 0 and xs.min() % side == 0
            assert ys.max() - ys.min() == side - 1
            assert xs.max() - xs.min() == side - 1


@pytest.mark.parametrize("has_alpha", [False, True])
def test_fused_matches_dense_quality(has_alpha):
    # dedicated rng: content-marginal assertions must not depend on how many
    # earlier tests consumed the shared session rng (module order varies)
    img = make_test_image(np.random.default_rng(881), h=70, w=90)
    if not has_alpha:
        img = img[:, :, :3].copy()
    img[0:32, :, :3] = [40, 90, 200]  # flat band forces merges
    cfg = EncodeConfig(error_factor=100, has_alpha=has_alpha, dithering=False)
    dense = encode_image_merged(img, cfg, num_levels=3, use_pallas=True,
                                fused=False)
    fused = encode_image_merged(img, cfg, num_levels=3, use_pallas=True,
                                fused=True)
    assert abs(dense["psnr"] - fused["psnr"]) < 0.3
    assert abs(dense["mean_bpp"] - fused["mean_bpp"]) < 0.1
    assert (dense["decoded"] == fused["decoded"]).mean() > 0.9
    assert (dense["owner_px"] == fused["owner_px"]).mean() > 0.9
    # fused may merge strictly more at grid edges (auto-matched empties)
    assert (fused["alive_counts"][1:] >= dense["alive_counts"][1:]).all()
    assert fused["decoded"].shape == img.shape[:2] + (4,)
    assert set(fused["bits_histogram"].shape) == {3, 9}


def test_fused_two_levels_flat_image(rng):
    img = np.full((40, 48, 3), [120, 60, 200], np.uint8)
    cfg = EncodeConfig(error_factor=100, dithering=False)
    out = encode_image_merged(img, cfg, num_levels=2, use_pallas=True,
                              fused=True, coalesce=False)
    # a constant image merges everything at the top level: 5x6 blocks ->
    # ceil(5/2) * ceil(6/2) = 9 non-empty parents, all alive
    assert out["alive_counts"][0] == 30 and out["alive_counts"][1] == 9
    assert (out["owner_px"] == 1).all()
    assert out["psnr"] > 50


def test_rectangle_coalescing_on_straddling_band():
    """A flat band straddling the quadtree's 16-px lines cannot merge in the
    quadtree; rectangle coalescing must stack its vertically aligned runs
    (reference analog: arbitrary-rectangle growth, src/limg.cpp:1390-1496).

    Dedicated rng: with the shared session rng this test's image (and its
    content-marginal <=3-region assertion) depended on module order."""
    rng = np.random.default_rng(4711)
    img = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
    img[8:24, :] = [60, 120, 200]
    cfg = EncodeConfig(error_factor=100, dithering=False)
    a = encode_image_merged(img, cfg, num_levels=3, use_pallas=True,
                            fused=True, coalesce=False)
    b = encode_image_merged(img, cfg, num_levels=3, use_pallas=True,
                            fused=True, coalesce=True)
    assert b["mean_bpp"] < a["mean_bpp"] - 0.5
    # coalescing is an RD trade: per-pixel error stays bounded by the crush
    # thresholds, but merging similar noise blocks may cost a fraction of a
    # dB for the >=0.5 bpp saving (0.27 dB on this image)
    assert b["psnr"] > a["psnr"] - 0.5
    # the 2x12-block band must collapse to a handful of multi-row regions
    band_ids = np.unique(b["region_id"][8:24, :])
    assert len(band_ids) <= 3


def test_fused_four_levels(rng):
    """num_levels=4 (64x64-px regions, 8x8 Morton supercells, es=4 error
    scaling in the owner reducer) runs end to end and merges a flat image
    to the top level."""
    img = np.full((70, 70, 3), [90, 150, 60], np.uint8)
    cfg = EncodeConfig(error_factor=100, dithering=False)
    out = encode_image_merged(img, cfg, num_levels=4, use_pallas=True,
                              fused=True, coalesce=False)
    assert out["alive_counts"].shape == (4,)
    assert out["psnr"] > 50
    assert (out["owner_px"] == 3).all()  # fully flat -> all top-level owned


@pytest.mark.parametrize("levels", [2, 3, 4])
def test_morton_perm_random_grids(levels):
    """Randomized invariants: permutation covers the grid, and every aligned
    4^l-lane group maps to one aligned 2^l-block square."""
    rng2 = np.random.default_rng(levels)
    for _ in range(5):
        by, bx = int(rng2.integers(1, 40)), int(rng2.integers(1, 40))
        perm, byp, bxp = morton_perm(by, bx, levels)
        g = 1 << (levels - 1)
        assert byp % g == 0 and bxp % g == 0 and perm.size == byp * bxp
        real = perm[perm >= 0]
        assert sorted(real.tolist()) == list(range(by * bx))
        for lvl in range(1, levels):
            s = 4 ** lvl
            side = 1 << lvl
            for j in rng2.integers(0, perm.size // s, size=8):
                grp = perm[s * j:s * (j + 1)]
                grp = grp[grp >= 0]
                if grp.size == 0:
                    continue
                ys, xs = grp // bx, grp % bx
                assert np.unique(ys // side).size == 1
                assert np.unique(xs // side).size == 1


@pytest.mark.parametrize("levels", [2, 3, 4])
def test_morton_embed_restore_match_gather(levels):
    """The reshape/transpose Morton embed/restore (the TPU-friendly relayout
    the fused driver uses) is bit-identical to the perm/inverse-perm gathers,
    including zero fill of grid-padding lanes and non-multiple-of-g grids."""
    import jax.numpy as jnp
    from limg_tpu.pallas_kernels.encode_merged import (
        morton_embed_rows, morton_restore_rows,
    )

    rng2 = np.random.default_rng(100 + levels)
    for _ in range(4):
        by, bx = int(rng2.integers(1, 40)), int(rng2.integers(1, 40))
        perm, byp, bxp = morton_perm(by, bx, levels)
        nb = by * bx
        x = rng2.integers(0, 1 << 30, (3, nb)).astype(np.int32)
        safe = np.maximum(perm, 0)
        ref_m = np.where(perm[None, :] >= 0, x[:, safe], 0)
        got_m = np.asarray(morton_embed_rows(jnp.asarray(x), by, bx, levels))
        assert np.array_equal(ref_m, got_m)
        inv = np.empty(nb, np.int64)
        inv[perm[perm >= 0]] = np.nonzero(perm >= 0)[0]
        got_o = np.asarray(
            morton_restore_rows(jnp.asarray(ref_m), by, bx, levels)
        )
        assert np.array_equal(ref_m[:, inv], got_o)


@pytest.mark.parametrize("levels", [2, 3, 4])
def test_morton_composed_relayouts_match_two_pass(levels):
    """The composed single-copy relayouts the fused driver uses
    (morton_blockify_packed / morton_unblockify / the analytic morton_mask)
    are bit-identical to the two-pass blockify+embed / restore+unblockify
    chains, including ragged (non-multiple-of-8) edges and grid padding."""
    import jax.numpy as jnp
    from limg_tpu.ops import layout
    from limg_tpu.pallas_kernels.encode_merged import (
        morton_blockify_packed, morton_unblockify, morton_mask,
        morton_embed_rows, morton_restore_rows,
    )

    rng2 = np.random.default_rng(200 + levels)
    for _ in range(4):
        h, w = int(rng2.integers(8, 150)), int(rng2.integers(8, 150))
        img = rng2.integers(0, 1 << 30, (h, w)).astype(np.int32)
        grid = layout.grid_for(h, w)
        by, bx = grid.blocks_y, grid.blocks_x
        packed, mask, _ = layout.blockify_packed(jnp.asarray(img))
        ref_m = np.asarray(
            morton_embed_rows(packed, by, bx, levels))
        got_m = np.asarray(
            morton_blockify_packed(jnp.asarray(img), h, w, levels))
        assert np.array_equal(ref_m, got_m)
        ref_mask = np.asarray(
            morton_embed_rows(mask.astype(jnp.int32), by, bx, levels))
        got_mask = np.asarray(morton_mask(h, w, levels))
        assert np.array_equal(ref_mask, got_mask)
        # inverse: restore + unblockify == composed unblockify == original
        back = np.asarray(morton_unblockify(jnp.asarray(got_m), h, w, levels))
        assert np.array_equal(back, img)


def test_fused_state_serializes_exactly():
    """The fused encode's serializer state round-trips bit-exactly through
    LTP1 v5 (the production CLI path: one encode serves stats + stream)."""
    from limg_tpu.bitstream import serialize_from_state, deserialize
    from limg_tpu.regions import encode_image_merged
    from tests.conftest import make_test_image

    rng = np.random.default_rng(7)
    img = make_test_image(rng, 48, 72)
    img[:16, :, :3] = [80, 120, 160]      # mergeable band
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder", dithering=False)
    out, state = encode_image_merged(img, cfg, seed=0, num_levels=3,
                                     fused=True, use_pallas=True,
                                     return_state=True)
    blob = serialize_from_state(state, cfg)
    dec, info = deserialize(blob)
    assert np.array_equal(dec, out["decoded"])
    assert info["n_segments"] < 6 * 9     # some squares actually merged


def test_host_factor_unblockify_mirror():
    """The host-side numpy transpose that restores (H, W, 3) factors from the
    fused driver's block-major (3, P, NB) planes is exactly
    layout.unblockify (regions.encode_image_merged fetch_planes path)."""
    import jax.numpy as jnp
    from limg_tpu.ops import layout
    from limg_tpu.config import BLOCK_SIZE

    rng2 = np.random.default_rng(3)
    h, w = 37, 53
    g = layout.grid_for(h, w, BLOCK_SIZE)
    by, bx = g.blocks_y, g.blocks_x
    x = rng2.integers(0, 256, (3, BLOCK_SIZE * BLOCK_SIZE, g.num_blocks))
    x = x.astype(np.uint8)
    ref = np.asarray(layout.unblockify(jnp.asarray(x), g, BLOCK_SIZE))
    f = x.reshape(3, BLOCK_SIZE, BLOCK_SIZE, by, bx)
    host = f.transpose(3, 1, 4, 2, 0).reshape(
        by * BLOCK_SIZE, bx * BLOCK_SIZE, 3
    )[:h, :w]
    assert np.array_equal(ref, host)
