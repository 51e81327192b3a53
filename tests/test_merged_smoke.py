"""Fast-tier merged-path smoke test (NOT in conftest._SLOW_MODULES).

One small dense-jnp merged+coalesce encode with pinned expectations, so the
~10-min fast loop (`tools/run_tests.sh -m "not slow"`) exercises the
quadtree merge, the run coalescing, and the stats surface end to end --
previously every merged-path module was blanket-slow and a merged/coalesce
regression could only be caught by the 45-min full suite or the TPU gate.
Kernel parity for the same pipeline lives in test_merged_fused (slow) and
tools/tpu_parity_gate.py (device).
"""

import numpy as np
import pytest

from limg_tpu import EncodeConfig
from limg_tpu.regions import encode_image_merged


def _smoke_image():
    """Deterministic 48x64 exercising every merged-path stage: 8-px flat
    bands separated by textured bands (level-0 horizontal runs the bits
    guard ACCEPTS -- the texture blocks the cross-color rectangle stacking
    that a flat-only image triggers, whose refits the guard rejects), plus
    a 16-px flat band that quadtree-merges at level 1 and coalesces as a
    level-1 run."""
    rng = np.random.default_rng(42)
    h, w = 48, 64
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 3] = 255
    img[0:8, :, :3] = [60, 110, 200]                   # flat -> level-0 run
    img[8:16, :, :3] = np.clip(
        120 + rng.integers(-60, 61, (8, w, 3)), 0, 255)   # texture separator
    img[16:24, :, :3] = [200, 160, 40]                 # flat -> level-0 run
    img[24:32, :, :3] = np.clip(
        90 + rng.integers(-60, 61, (8, w, 3)), 0, 255)    # texture separator
    img[32:48, :, :3] = [30, 190, 120]                 # flat -> level-1 run
    return img


@pytest.fixture(scope="module")
def smoke_out():
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder", dithering=False)
    return encode_image_merged(
        _smoke_image(), cfg, num_levels=2, use_pallas=False, fused=False,
    )


def test_merged_coalesce_smoke_quality(smoke_out):
    # pinned at the recording of this test; a drift beyond the tolerance is
    # an unintended codec change (the pipeline is deterministic here:
    # dithering off, fixed seed)
    assert smoke_out["psnr"] == pytest.approx(43.905, abs=0.3)
    assert smoke_out["mean_bpp"] == pytest.approx(5.0, abs=0.15)


def test_merged_coalesce_smoke_structure(smoke_out):
    # the 16-px flat band must quadtree-merge (4 level-1 squares) ...
    assert int(smoke_out["alive_counts"][1]) >= 4
    # ... and the flat bands coalesce into accepted runs at both levels
    assert smoke_out["n_runs"] >= 3
    st = smoke_out["coalesce_stats"]
    assert st["overflow_run_blocks"] == 0
    assert st["dropped_runs_at_capacity"] == 0
    # owner map: both levels represented, planes shaped like the image
    owners = np.unique(smoke_out["owner_px"])
    assert 0 in owners and 1 in owners
    assert smoke_out["factors"].shape == (48, 64, 3)
    assert smoke_out["region_id"].shape == (48, 64)
    # each coalesced flat band row shares ONE region id across its blocks
    assert len(np.unique(smoke_out["region_id"][0, :])) == 1    # level-0 run
    assert len(np.unique(smoke_out["region_id"][32, :])) == 1   # level-1 run


def test_merged_coalesce_smoke_decode_matches_flat(smoke_out):
    # flat regions must decode exactly (shift-8 drop => avg reproduces)
    dec = smoke_out["decoded"]
    src = _smoke_image()
    assert np.array_equal(dec[0:8, :, :3], src[0:8, :, :3])
    assert np.array_equal(dec[32:, :, :3], src[32:, :, :3])
