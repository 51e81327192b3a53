"""LTP1 bitstream: serialize -> parse -> decode must reproduce the
in-memory encode exactly (the reference has no bitstream at all; this is a
new capability, SURVEY.md section 0/5).

Compile budget: every distinct (shape, static-config) pair costs a full
XLA:CPU merged-encode compile (~2 min on the 1-core box), so the module
standardizes on ONE canonical (48, 72) image / levels=3 config whose
compile is shared by six tests, and reference encodes call
``_ref`` -- the exact static signature of serialize's internal encode
(fetch_planes=False, return_state=True) -- so they hit the same jit cache
entry instead of compiling an emit_planes variant. The remaining extra
compiles (levels=1, the RD policy) are slow-tier.
"""

import numpy as np
import pytest

from limg_tpu.config import EncodeConfig
from limg_tpu.bitstream import serialize, deserialize, _pack_bits, _unpack_bits
from limg_tpu.regions import encode_image_merged
from tests.conftest import make_test_image

H, W = 48, 72
CFG = EncodeConfig(error_factor=100, crush_mode="ladder")


def _ref(img, cfg, **kw):
    """Reference encode sharing serialize()'s compiled graph exactly."""
    out, _ = encode_image_merged(img, cfg, fetch_planes=False,
                                 return_state=True, fused=False, **kw)
    return out


def test_pack_unpack_bits(rng):
    for width in range(1, 9):
        vals = rng.integers(0, 1 << width, 1000).astype(np.uint8)
        packed = _pack_bits(vals, width)
        assert len(packed) == -(-1000 * width // 8)
        assert np.array_equal(_unpack_bits(packed, 1000, width), vals)


def test_roundtrip_exact(rng):
    img = make_test_image(rng, H, W)
    blob = serialize(img, CFG, seed=0, num_levels=3)
    dec, info = deserialize(blob)
    # the v5 stream always represents exactly the encode that ran
    # (coalesced runs included)
    ref = _ref(img, CFG, seed=0, num_levels=3, coalesce=True)
    assert np.array_equal(dec, ref["decoded"])
    assert info["levels"] == 3
    assert info["real_bpp"] < 32  # always beats raw RGBA


@pytest.mark.slow
def test_roundtrip_exact_single_level(rng):
    img = make_test_image(rng, H, W)
    blob = serialize(img, CFG, seed=0, num_levels=1)
    dec, info = deserialize(blob)
    ref = _ref(img, CFG, seed=0, num_levels=1, coalesce=True)
    assert np.array_equal(dec, ref["decoded"])
    assert info["levels"] == 1


def test_roundtrip_rgba(rng):
    img = make_test_image(rng, H, W)
    img[..., 3] = np.clip(
        100 + np.arange(W, dtype=np.int32) * 2, 0, 255
    ).astype(np.uint8)[None, :]
    cfg = EncodeConfig(error_factor=100, has_alpha=True, crush_mode="ladder")
    blob = serialize(img, cfg, seed=0, num_levels=3)
    dec, info = deserialize(blob)
    assert info["has_alpha"]
    ref = _ref(img, cfg, seed=0, num_levels=3, coalesce=True)
    assert np.array_equal(dec, ref["decoded"])


def test_serialize_from_state_matches_wrapper(rng):
    """serialize() == serialize_from_state(encode's state): one encode
    serves both the stats and the stream (the CLI single-encode path)."""
    from limg_tpu.bitstream import serialize_from_state

    img = make_test_image(rng, H, W)
    out, state = encode_image_merged(img, CFG, seed=0, num_levels=3,
                                     fused=False, fetch_planes=False,
                                     return_state=True)
    blob = serialize_from_state(state, CFG)
    assert blob == serialize(img, CFG, seed=0, num_levels=3)
    dec, _ = deserialize(blob)
    assert np.array_equal(dec, out["decoded"])


def test_stream_smaller_at_higher_error_factor(rng):
    img = make_test_image(rng, H, W)
    # error_factor is traced, so both serializes reuse the shared compile
    lo = serialize(img, EncodeConfig(error_factor=50, crush_mode="ladder"),
                   seed=0)
    hi = serialize(img, EncodeConfig(error_factor=400, crush_mode="ladder"),
                   seed=0)
    assert len(hi) < len(lo)


@pytest.mark.slow
def test_rd_policy_shrinks_real_stream(rng):
    """The RD cut fed with the real LTP1 header cost should not produce a
    larger file than the similarity policy at the default lambda."""
    img = make_test_image(rng, H, W)
    match = serialize(img, CFG, seed=0, num_levels=3, merge_policy="match")
    rd = serialize(img, CFG, seed=0, num_levels=3, merge_policy="rd")
    dec, info = deserialize(rd)
    assert len(rd) <= len(match) * 1.02
    assert dec.shape == (H, W, 4)


def test_reject_garbage():
    with pytest.raises(ValueError):
        deserialize(b"NOPE" + b"\x00" * 100)


def test_entropy_roundtrip_and_never_larger():
    """Delta + rANS factor sections decode identically to the raw var-width
    packing, and the per-axis mode fallback keeps entropy=True from ever
    losing to entropy=False."""
    img = make_test_image(np.random.default_rng(3), H, W)
    b2 = serialize(img, CFG, entropy=False)
    b3 = serialize(img, CFG, entropy=True)
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
    img = rng.integers(0, 255, (H, W, 4)).astype(np.uint8)
    img[..., 3] = 255
    img[8:24, :, :3] = [60, 120, 200]   # band straddling the quadtree lines
    b_run = serialize(img, CFG, seed=0, num_levels=3, coalesce=True)
    b_no = serialize(img, CFG, seed=0, num_levels=3, coalesce=False)
    dec, info = deserialize(b_run)
    assert info["n_runs"] > 0
    _, info_no = deserialize(b_no)
    assert info_no["n_runs"] == 0
    ref = _ref(img, CFG, seed=0, num_levels=3, coalesce=True)
    assert np.array_equal(dec, ref["decoded"])
    assert len(b_run) < len(b_no)


def test_flat_image_single_region():
    """A fully flat image must collapse to ~one region: the quadtree merges
    to the top level and the multi-level coalesce pass runs the remaining
    squares into one rectangle (the analog of the reference's unbounded
    region growth, src/limg.cpp:1390-1496)."""
    img = np.full((H, W, 4), 90, np.uint8)
    img[..., 3] = 255
    blob = serialize(img, CFG, seed=0, num_levels=3)
    dec, info = deserialize(blob)
    # the ragged 6x9 block grid leaves a couple of edge regions the
    # level-2 squares can't absorb; the body still collapses to ~one run
    assert info["n_segments"] <= 3
    assert info["n_runs"] >= 1
    ref = _ref(img, CFG, seed=0, num_levels=3, coalesce=True)
    assert np.array_equal(dec, ref["decoded"])
    # ~one header: the stream is dominated by the fixed planes, far below
    # one header per 8x8 block (6x9 = 54 blocks here)
    assert len(blob) < 54 * 16


def test_truncated_streams_raise():
    """Corrupt/truncated blobs must raise, never silently decode garbage."""
    img = make_test_image(np.random.default_rng(5), H, W)
    blob = serialize(img, CFG, seed=0, num_levels=3)
    for cut in (9, len(blob) // 3, len(blob) - 3):
        with pytest.raises(Exception):
            deserialize(blob[:cut])
