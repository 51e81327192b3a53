"""Parity of the fused Pallas encode kernel vs the jnp pipeline.

Runs in Pallas interpret mode on CPU; on real TPU hardware the compiled
kernel was additionally verified bit-exact on shifts and 99.98% on decode
(float reduction-order differences in the fit).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from limg_tpu.config import EncodeConfig
from limg_tpu.ops import layout
from limg_tpu.encoder import encode_blocks
from limg_tpu.pallas_kernels.encode_fixed import (
    encode_blocks_pallas, pack_channels, unpack_plane,
)
from tests.conftest import make_test_image


@pytest.fixture(scope="module")
def setup():
    # dedicated rng: the shared session rng's state depends on which tests
    # ran first, which made these parity images order-dependent
    img = make_test_image(np.random.default_rng(77), 40, 56)
    px, mask, grid = layout.blockify(jnp.asarray(img))
    return img, px, mask


@pytest.mark.parametrize("channels", [3, 4])
def test_pallas_matches_jnp_no_dither(setup, channels):
    img, px, mask = setup
    cfg = EncodeConfig(
        error_factor=100, has_alpha=(channels == 4),
        crush_mode="ladder", dithering=False,
    )
    res = encode_blocks(px, mask, cfg, jax.random.PRNGKey(0))
    shifts, qp, decp = encode_blocks_pallas(
        pack_channels(px), mask, cfg, jnp.int32(0), interpret=True
    )[:3]
    assert np.array_equal(np.asarray(res.shifts), np.asarray(shifts))
    dec_pal = np.stack(
        [np.asarray(unpack_plane(decp, c)) for c in range(channels)]
    )
    m = np.asarray(mask)[None].astype(bool)
    agree = (np.asarray(res.decoded) == dec_pal) | ~m
    assert agree.mean() == 1.0
    q_pal = np.stack([np.asarray(unpack_plane(qp, c)) for c in range(3)])
    agree_q = (np.asarray(res.factors) == q_pal) | ~m
    assert agree_q.mean() == 1.0


@pytest.mark.parametrize("bsz", [16, 32, 64])
def test_pallas_region_sizes_match_jnp(bsz):
    """P=256 (mono) and P=1024 (chunked lane-roll reductions) parity."""
    img = make_test_image(np.random.default_rng(78), 64, 96)
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder", dithering=False)
    px, mask, _ = layout.blockify(jnp.asarray(img), bsz)
    res = encode_blocks(px, mask, cfg, jax.random.PRNGKey(0))
    outs = encode_blocks_pallas(
        pack_channels(px), mask, cfg, jnp.int32(0),
        interpret=True, emit_endpoints=True,
    )
    shifts, qp, decp = outs[:3]
    assert np.array_equal(np.asarray(res.shifts), np.asarray(shifts))
    dec_pal = np.stack([np.asarray(unpack_plane(decp, c)) for c in range(3)])
    m = np.asarray(mask)[None].astype(bool)
    assert (((np.asarray(res.decoded) == dec_pal) | ~m)).all()
    # outs[3] is the per-region distortion; endpoints follow at 4:10
    names = ["dirA_min", "dirA_max", "dirB_offset", "dirB_mag",
             "dirC_offset", "dirC_mag"]
    for n, e in zip(names, outs[4:10]):
        assert np.array_equal(
            np.asarray(getattr(res.decomposition, n)), np.asarray(e)
        ), n


def test_pallas_crush_none(setup):
    img, px, mask = setup
    cfg = EncodeConfig(error_factor=0, crush_mode="none", dithering=False)
    shifts, qp, decp = encode_blocks_pallas(
        pack_channels(px), mask, cfg, jnp.int32(0), interpret=True
    )[:3]
    assert (np.asarray(shifts) == 0).all()
    res = encode_blocks(px, mask, cfg, jax.random.PRNGKey(0))
    dec_pal = np.stack([np.asarray(unpack_plane(decp, c)) for c in range(3)])
    m = np.asarray(mask)[None].astype(bool)
    # float reduction order can differ between the full-array jnp fit and
    # the tiled kernel fit, occasionally moving a rounded endpoint by 1 --
    # allow a tiny off-by-small tail instead of bit equality here
    diff = np.abs(np.asarray(res.decoded).astype(int) - dec_pal.astype(int))
    diff = np.where(m, diff, 0)
    assert (diff <= 2).all()
    assert (diff > 0).mean() < 0.01


@pytest.mark.parametrize("mode", ["exhaustive", "guess"])
def test_pallas_crush_modes_match_jnp(setup, mode):
    """Exhaustive (--accurate-bit-crushing) and guess run in-kernel now."""
    img, px, mask = setup
    cfg = EncodeConfig(error_factor=100, crush_mode=mode, dithering=False)
    res = encode_blocks(px, mask, cfg, jax.random.PRNGKey(0))
    shifts, qp, decp = encode_blocks_pallas(
        pack_channels(px), mask, cfg, jnp.int32(0), interpret=True
    )[:3]
    assert np.array_equal(np.asarray(res.shifts), np.asarray(shifts))
    dec_pal = np.stack([np.asarray(unpack_plane(decp, c)) for c in range(3)])
    m = np.asarray(mask)[None].astype(bool)
    assert ((np.asarray(res.decoded) == dec_pal) | ~m).all()


@pytest.mark.parametrize("num_factors", [1, 2])
def test_pallas_num_factors_match_jnp(setup, num_factors):
    """Reduced-factor fast modes (BASELINE config 4): dropped axes are
    forced to the shift=8 encoding in both backends, endpoints zeroed
    before the search."""
    img, px, mask = setup
    cfg = EncodeConfig(
        error_factor=100, crush_mode="ladder", dithering=False,
        num_factors=num_factors,
    )
    res = encode_blocks(px, mask, cfg, jax.random.PRNGKey(0))
    outs = encode_blocks_pallas(
        pack_channels(px), mask, cfg, jnp.int32(0),
        interpret=True, emit_endpoints=True,
    )
    shifts, qp, decp = outs[:3]
    s = np.asarray(shifts)
    assert np.array_equal(np.asarray(res.shifts), s)
    # dropped axes store shift >= 8 everywhere
    assert (s[num_factors:] >= 8).all()
    dec_pal = np.stack([np.asarray(unpack_plane(decp, c)) for c in range(3)])
    m = np.asarray(mask)[None].astype(bool)
    assert ((np.asarray(res.decoded) == dec_pal) | ~m).all()
    # dropped axes' endpoints are zeroed identically
    names = ["dirA_min", "dirA_max", "dirB_offset", "dirB_mag",
             "dirC_offset", "dirC_mag"]
    for n, e in zip(names, outs[4:10]):
        assert np.array_equal(
            np.asarray(getattr(res.decomposition, n)), np.asarray(e)
        ), n
    for e in outs[4 + 2 * num_factors:10]:
        assert (np.asarray(e) == 0).all()


def test_num_factors_bpp_psnr_trade():
    """On flat content, dropping axes should cut bits at modest PSNR cost."""
    from limg_tpu.ops.error import psnr as weighted_psnr

    rng = np.random.default_rng(99)
    flat = np.full((64, 64, 4), 120, np.uint8)
    flat[:, :, 0] = np.linspace(60, 200, 64, dtype=np.uint8)[None, :]
    flat[:, :, 3] = 255
    px, mask, grid = layout.blockify(jnp.asarray(flat))
    stats = {}
    for nf in (1, 2, 3):
        cfg = EncodeConfig(error_factor=100, crush_mode="ladder",
                           dithering=False, num_factors=nf)
        res = encode_blocks(px, mask, cfg, jax.random.PRNGKey(0))
        dec = layout.unblockify(res.decoded.astype(jnp.uint8), grid)
        p, _ = weighted_psnr(jnp.asarray(flat[..., :3]), dec, 3)
        stats[nf] = (float(np.asarray(res.accum_bits).sum()), float(p))
    # fewer axes => fewer (or equal) factor bits
    assert stats[1][0] <= stats[2][0] <= stats[3][0]
    # a pure horizontal gradient is 1-axis content: quality stays high
    assert stats[1][1] > 38.0


def test_crush_eval_rows_matches_evaluate_shifts(setup):
    """crush_eval_rows_pallas (segment-crush eval) vs ops.crush.evaluate_shifts."""
    from limg_tpu.ops.crush import evaluate_shifts
    from limg_tpu.ops.fit import fit_blocks
    from limg_tpu.ops.factors import extract_factors, quantize_factors
    from limg_tpu.pallas_kernels.encode_fixed import crush_eval_rows_pallas

    _, px, mask = setup
    ch = 3
    d = fit_blocks(px, mask, ch)
    f8_u8 = quantize_factors(*extract_factors(px, d, ch))
    f8 = jnp.stack([p.astype(jnp.int32) for p in f8_u8])
    pxi = px[:ch].astype(jnp.int32)
    mask_i = mask.astype(jnp.int32)
    nb = px.shape[-1]
    rng = np.random.default_rng(5)
    shifts = jnp.asarray(rng.integers(0, 9, size=(3, nb)), jnp.int32)

    pm_ref, be_ref = evaluate_shifts(pxi, mask_i, f8, d, shifts, ch)

    packed = pxi[0] + (pxi[1] << 8) + (pxi[2] << 16)
    f8_packed = f8[0] + (f8[1] << 8) + (f8[2] << 16)
    eps = [d.dirA_min, d.dirA_max, d.dirB_offset, d.dirB_mag,
           d.dirC_offset, d.dirC_mag]
    pm_k, be_k = crush_eval_rows_pallas(packed, mask_i, f8_packed, eps,
                                        shifts, ch, interpret=True)
    np.testing.assert_array_equal(np.asarray(pm_ref), np.asarray(pm_k))
    np.testing.assert_array_equal(np.asarray(be_ref), np.asarray(be_k))


def _contig_segments(rng, n, cap):
    seg = np.zeros(n, np.int32)
    i = 0
    while i < n:
        w = min(int(rng.integers(1, cap + 1)), n - i)
        seg[i:i + w] = i
        i += w
    return seg


@pytest.mark.parametrize("n", [1024, 3000, 8192])
@pytest.mark.parametrize("n_sum,rows,dtype", [
    (4, 4, np.float32),    # pure sums (fit count + channel sums)
    (0, 6, np.float32),    # pure max (factor min/max rows)
    (2, 4, np.int32),      # mixed (block-err sums + pixel-max rows)
])
def test_seg_scan_kernel_matches_jnp_chain(n, n_sum, rows, dtype):
    """The Pallas halo-tile segment-scan kernel is bit-identical to the jnp
    doubling-scan chain it replaces on accelerators (seg id == first member
    position, members contiguous -- the compacted run-buffer layout)."""
    from limg_tpu.ops.segments import seg_mixed_all, SEG_CAP
    from limg_tpu.pallas_kernels.seg_scan import seg_mixed_all_pallas

    rng = np.random.default_rng(n * 31 + n_sum)
    seg = _contig_segments(rng, n, SEG_CAP)
    if dtype == np.float32:
        x = (rng.normal(size=(rows, n)) * 100).astype(np.float32)
        init = np.float32(0.0 if n_sum == rows else -3.4e38)
    else:
        x = rng.integers(0, 1 << 20, size=(rows, n)).astype(np.int32)
        init = np.int32(0)
    a = np.asarray(seg_mixed_all(jnp.asarray(x), jnp.asarray(seg), n_sum, init))
    b = np.asarray(seg_mixed_all_pallas(
        jnp.asarray(x), jnp.asarray(seg), n_sum, init,
        SEG_CAP.bit_length() - 1, interpret=True,
    ))
    assert np.array_equal(a, b)


def test_seg_scan_kernel_min_via_negation():
    """seg_min_all's kernel route (-max(-x)) is exact vs the jnp minimum."""
    from limg_tpu.ops.segments import _seg_all_reduce_contig, SEG_CAP
    from limg_tpu.pallas_kernels.seg_scan import seg_mixed_all_pallas

    rng = np.random.default_rng(5)
    n = 2048
    seg = _contig_segments(rng, n, SEG_CAP)
    x = rng.integers(-(1 << 20), 1 << 20, size=(3, n)).astype(np.int32)
    ref = np.asarray(_seg_all_reduce_contig(
        jnp.asarray(x), jnp.asarray(seg), jnp.minimum,
        jnp.int32(np.iinfo(np.int32).max), False,
    ))
    out = -np.asarray(seg_mixed_all_pallas(
        jnp.asarray(-x), jnp.asarray(seg), 0,
        jnp.int32(np.iinfo(np.int32).min), SEG_CAP.bit_length() - 1,
        interpret=True,
    ))
    assert np.array_equal(ref, out)
