"""Natural-layout (row-major) merged kernels vs the Morton path.

The natural kernels (pallas_kernels/encode_natural.py) reorder nothing the
codec can observe: on every image tried so far they reproduce the Morton
fused path EXACTLY (owners, shifts, factors, decode, stats) because both
reduce over the same 4^l-block groups -- only the butterfly pairing
differs, and the f32 group sums land identically. The tests still gate at
exact-equality-or-tolerance per field so a future divergence localizes.
Compiled-device bit parity (compiled Mosaic vs interpreter, including the
one-hot MXU compaction) is gated separately by tools/tpu_parity_gate.py.
"""

import numpy as np
import pytest

from limg_tpu import EncodeConfig
from limg_tpu.regions import encode_image_merged

from tests.conftest import make_test_image


def _encode_both(img, cfg, num_levels=3, coalesce=True, **kw):
    m = encode_image_merged(img, cfg, num_levels=num_levels, use_pallas=True,
                            fused=True, coalesce=coalesce,
                            fused_layout="morton", **kw)
    n = encode_image_merged(img, cfg, num_levels=num_levels, use_pallas=True,
                            fused=True, coalesce=coalesce,
                            fused_layout="natural", **kw)
    return m, n


@pytest.mark.parametrize("has_alpha", [False, True])
def test_natural_matches_morton(has_alpha):
    img = make_test_image(np.random.default_rng(881), h=70, w=150)
    if not has_alpha:
        img = img[:, :, :3].copy()
    img[0:32, :, :3] = [40, 90, 200]  # flat band forces merges + runs
    cfg = EncodeConfig(error_factor=100, has_alpha=has_alpha, dithering=False)
    m, n = _encode_both(img, cfg)
    assert n["psnr"] == pytest.approx(m["psnr"], abs=0.05)
    assert n["mean_bpp"] == pytest.approx(m["mean_bpp"], abs=0.02)
    assert (n["decoded"] == m["decoded"]).mean() > 0.999
    assert np.array_equal(n["owner_px"], m["owner_px"])
    assert np.array_equal(n["alive_counts"], m["alive_counts"])
    assert np.array_equal(n["region_id"], m["region_id"])
    assert n["n_runs"] == m["n_runs"]
    assert n["coalesce_stats"] == m["coalesce_stats"]


def test_natural_serializer_state_matches_morton():
    img = make_test_image(np.random.default_rng(7), h=40, w=72)
    img[:16, :, :3] = [120, 60, 200]
    cfg = EncodeConfig(error_factor=100, dithering=False)
    mo, st_m = encode_image_merged(img, cfg, num_levels=2, use_pallas=True,
                                   fused=True, return_state=True,
                                   fused_layout="morton")
    na, st_n = encode_image_merged(img, cfg, num_levels=2, use_pallas=True,
                                   fused=True, return_state=True,
                                   fused_layout="natural")
    assert np.array_equal(np.asarray(st_m["rows"]), np.asarray(st_n["rows"]))
    assert np.array_equal(np.asarray(st_m["q"]), np.asarray(st_n["q"]))


def test_rows_to_blocks_geometry():
    """rows_to_blocks drops each tile group's zero upper half and the grid
    padding, returning row-major flat blocks."""
    import jax.numpy as jnp
    from limg_tpu.pallas_kernels.encode_natural import (
        _C_W, _T_W, rows_to_blocks,
    )

    by, bx = 9, 70                     # gx = 2 tile groups (64 bcols each)
    gx = -(-bx // (_T_W // 8))
    byp = -(-by // 8) * 8
    bpt = _T_W // 8
    full = np.zeros((2, byp, gx * _C_W), np.float32)
    for j in range(gx):
        for c in range(bpt):
            col = j * bpt + c
            if col < gx * bpt:
                full[:, :, j * _C_W + c] = col + 1000 * np.arange(
                    2)[:, None] + 0.5
    # row-major block value encodes its (row-ignored) column
    out = np.asarray(rows_to_blocks(jnp.asarray(full), by, bx))
    assert out.shape == (2, by * bx)
    want_col = np.tile(np.arange(bx), by)
    assert np.array_equal(out[0], (want_col + 0.5).astype(np.float32))
    assert np.array_equal(out[1], (want_col + 1000.5).astype(np.float32))
