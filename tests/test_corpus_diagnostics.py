"""Streaming corpus pipeline and culprit diagnostics."""

import numpy as np
import jax.numpy as jnp
import pytest

from limg_tpu import native
from limg_tpu.config import EncodeConfig
from limg_tpu.ops import layout
from limg_tpu.ops.fit import fit_blocks
from limg_tpu.ops.factors import extract_factors, quantize_factors
from limg_tpu.ops.crush import find_shifts
from limg_tpu.parallel.corpus import encode_corpus_streaming
from limg_tpu.utils.diagnostics import crush_culprits, format_culprits
from tests.conftest import make_test_image


def test_corpus_streaming(tmp_path, rng):
    paths = []
    for i in range(4):
        img = make_test_image(rng, 40, 56)
        p = str(tmp_path / f"c{i}.tga")
        native.write_tga(p, img)
        paths.append(p)
    out = encode_corpus_streaming(
        paths, 40, 56, EncodeConfig(error_factor=100, crush_mode="guess"),
        use_pallas=False,
    )
    assert not out["failed"]
    assert (out["psnr"] > 30).all()
    assert (out["bpp"] > 0).all() and (out["bpp"] < 30).all()


def test_corpus_streaming_missing_file(tmp_path, rng):
    img = make_test_image(rng, 40, 56)
    good = str(tmp_path / "ok.tga")
    native.write_tga(good, img)
    if not native.available():
        pytest.skip("failure reporting needs the native pool")
    out = encode_corpus_streaming(
        [good, str(tmp_path / "missing.tga")], 40, 56,
        EncodeConfig(error_factor=100, crush_mode="guess"), use_pallas=False,
    )
    assert out["failed"] == [1]
    assert out["psnr"][0] > 30


def test_crush_culprits(rng):
    img = make_test_image(rng, 40, 56)
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder")
    px, mask, _ = layout.blockify(jnp.asarray(img))
    d = fit_blocks(px, mask, 3)
    f8 = quantize_factors(*extract_factors(px, d, 3))
    shifts, _ = find_shifts(px, mask, f8, d, cfg)
    c = crush_culprits(px, mask, f8, d, shifts, cfg)
    assert c["blocks"] == px.shape[-1]
    total = c["pixel_bound"] + c["block_bound"] + c["saturated"] + c["expandable"]
    assert total <= c["blocks"]
    # the ladder should leave very few admissible single-step improvements
    assert c["expandable"] / c["blocks"] < 0.25
    assert "CULPRIT" in format_culprits(c)


def test_crush_culprits_merged(rng):
    """Region-granular culprits computed from the merged encode's own state
    (the encode that ran, not a fixed-grid re-encode): culprit counts must
    track the encode's region count and differ from the fixed-grid counts
    when regions merged."""
    from limg_tpu.regions import encode_image_merged
    from limg_tpu.utils.diagnostics import crush_culprits_merged

    img = make_test_image(rng, 48, 64)
    img[:16, :, :3] = [80, 120, 160]      # mergeable band
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder")
    out, state = encode_image_merged(img, cfg, seed=0, num_levels=3,
                                     fused=False, return_state=True)
    c = crush_culprits_merged(img, state, cfg)
    nb0 = 6 * 8
    assert c["blocks"] < nb0              # merged/coalesced regions < blocks
    total = (c["pixel_bound"] + c["block_bound"] + c["saturated"]
             + c["expandable"])
    assert total <= c["blocks"]
    assert "CULPRIT" in format_culprits(c, out.get("merge_stats"))
