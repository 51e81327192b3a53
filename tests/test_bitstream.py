"""LTP1 bitstream: serialize -> parse -> decode must reproduce the
in-memory encode exactly (the reference has no bitstream at all; this is a
new capability, SURVEY.md section 0/5)."""

import numpy as np
import pytest

from limg_tpu.config import EncodeConfig
from limg_tpu.bitstream import serialize, deserialize, _pack_bits, _unpack_bits
from limg_tpu.regions import encode_image_merged
from limg_tpu.encoder import encode_image
from tests.conftest import make_test_image


def test_pack_unpack_bits(rng):
    for width in range(1, 9):
        vals = rng.integers(0, 1 << width, 1000).astype(np.uint8)
        packed = _pack_bits(vals, width)
        assert len(packed) == -(-1000 * width // 8)
        assert np.array_equal(_unpack_bits(packed, 1000, width), vals)


@pytest.mark.parametrize("num_levels", [1, 3])
def test_roundtrip_exact(rng, num_levels):
    img = make_test_image(rng, 48, 72)
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder")
    blob = serialize(img, cfg, seed=0, num_levels=num_levels)
    dec, info = deserialize(blob)
    # the v5 stream always represents exactly the encode that ran
    # (coalesced runs included)
    ref = encode_image_merged(img, cfg, seed=0, num_levels=num_levels,
                              coalesce=True, fused=False)
    assert np.array_equal(dec, ref["decoded"])
    assert info["levels"] == num_levels
    assert info["real_bpp"] < 32  # always beats raw RGBA


def test_roundtrip_rgba(rng):
    img = make_test_image(rng, 40, 48)
    img[..., 3] = np.clip(
        100 + np.arange(48, dtype=np.int32) * 3, 0, 255
    ).astype(np.uint8)[None, :]
    cfg = EncodeConfig(error_factor=100, has_alpha=True, crush_mode="ladder")
    blob = serialize(img, cfg, seed=0, num_levels=2)
    dec, info = deserialize(blob)
    assert info["has_alpha"]
    ref = encode_image_merged(img, cfg, seed=0, num_levels=2,
                              coalesce=True, fused=False)
    assert np.array_equal(dec, ref["decoded"])


def test_serialize_from_state_matches_wrapper(rng):
    """serialize() == serialize_from_state(encode's state): one encode
    serves both the stats and the stream (the CLI single-encode path)."""
    from limg_tpu.bitstream import serialize_from_state

    img = make_test_image(rng, 48, 56)
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder")
    out, state = encode_image_merged(img, cfg, seed=0, num_levels=3,
                                     fused=False, return_state=True)
    blob = serialize_from_state(state, cfg)
    assert blob == serialize(img, cfg, seed=0, num_levels=3)
    dec, _ = deserialize(blob)
    assert np.array_equal(dec, out["decoded"])


def test_stream_smaller_at_higher_error_factor(rng):
    img = make_test_image(rng, 48, 72)
    lo = serialize(img, EncodeConfig(error_factor=50), seed=0)
    hi = serialize(img, EncodeConfig(error_factor=400), seed=0)
    assert len(hi) < len(lo)


def test_rd_policy_shrinks_real_stream(rng):
    """The RD cut fed with the real LTP1 header cost should not produce a
    larger file than the similarity policy at the default lambda."""
    img = make_test_image(rng, 48, 72)
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder")
    match = serialize(img, cfg, seed=0, num_levels=3, merge_policy="match")
    rd = serialize(img, cfg, seed=0, num_levels=3, merge_policy="rd")
    dec, info = deserialize(rd)
    assert len(rd) <= len(match) * 1.02
    assert dec.shape == (48, 72, 4)


def test_reject_garbage():
    with pytest.raises(ValueError):
        deserialize(b"NOPE" + b"\x00" * 100)


def test_entropy_roundtrip_and_never_larger():
    """Delta + rANS factor sections decode identically to the raw var-width
    packing, and the per-axis mode fallback keeps entropy=True from ever
    losing to entropy=False."""
    from limg_tpu.bitstream import serialize, deserialize

    cfg = EncodeConfig(error_factor=100, crush_mode="ladder")
    img = make_test_image(np.random.default_rng(3), 72, 96)
    b2 = serialize(img, cfg, entropy=False)
    b3 = serialize(img, cfg, entropy=True)
    d2, i2 = deserialize(b2)
    d3, i3 = deserialize(b3)
    assert np.array_equal(d2, d3)
    assert len(b3) <= len(b2) + 3
    assert i3["real_bpp"] <= i2["real_bpp"] + 0.01


def test_rans_codec_roundtrip():
    from limg_tpu import native

    rng = np.random.default_rng(0)
    syms = np.minimum(rng.geometric(0.3, 5000) - 1, 255).astype(np.uint8)
    freqs = native.rans_quantize_freqs(np.bincount(syms, minlength=256))
    assert freqs.sum() == native.RANS_PROB_SCALE
    blob = native.rans_encode(syms, freqs)
    assert np.array_equal(native.rans_decode(blob, freqs, syms.size), syms)
    # skewed data compresses well below 8 bits/symbol
    assert len(blob) * 8 < 4 * syms.size


def test_runs_roundtrip_and_smaller():
    """Coalesced runs serialize as explicit rectangles sharing one header,
    decode exactly, and shrink the stream on banded content."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (64, 96, 4)).astype(np.uint8)
    img[..., 3] = 255
    img[8:24, :, :3] = [60, 120, 200]   # band straddling the quadtree lines
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder")
    b_run = serialize(img, cfg, seed=0, num_levels=3, coalesce=True)
    b_no = serialize(img, cfg, seed=0, num_levels=3, coalesce=False)
    dec, info = deserialize(b_run)
    assert info["n_runs"] > 0
    _, info_no = deserialize(b_no)
    assert info_no["n_runs"] == 0
    ref = encode_image_merged(img, cfg, seed=0, num_levels=3,
                              coalesce=True, fused=False)
    assert np.array_equal(dec, ref["decoded"])
    assert len(b_run) < len(b_no)


def test_flat_image_single_region():
    """A fully flat image must collapse to ~one region: the quadtree merges
    to the top level and the multi-level coalesce pass runs the remaining
    squares into one rectangle (the analog of the reference's unbounded
    region growth, src/limg.cpp:1390-1496)."""
    img = np.full((128, 128, 4), 90, np.uint8)
    img[..., 3] = 255
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder")
    blob = serialize(img, cfg, seed=0, num_levels=3)
    dec, info = deserialize(blob)
    assert info["n_segments"] <= 2
    assert info["n_runs"] >= 1
    ref = encode_image_merged(img, cfg, seed=0, num_levels=3, fused=False)
    assert np.array_equal(dec, ref["decoded"])
    # ~one header: the stream is dominated by the fixed planes, far below
    # one header per 8x8 block
    assert len(blob) < 16 * 16 * 4


def test_truncated_streams_raise():
    """Corrupt/truncated blobs must raise, never silently decode garbage."""
    img = make_test_image(np.random.default_rng(5), 48, 64)
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder")
    blob = serialize(img, cfg, seed=0, num_levels=2)
    for cut in (9, len(blob) // 3, len(blob) - 3):
        with pytest.raises(Exception):
            deserialize(blob[:cut])
