"""Native host runtime tests (ctypes bindings to runtime/limg_runtime.cpp).

Skipped when the shared library has not been built
(tools/build_runtime.sh); the Python fallbacks are covered either way.
"""

import numpy as np
import pytest

from limg_tpu import native


@pytest.fixture(scope="module")
def img(rng):
    return rng.integers(0, 256, (37, 53, 4), dtype=np.uint8)


def test_blockify_fallback_matches_layout(img):
    """NumPy fallback must match the jnp blockify+pack layout bit-exactly."""
    import jax.numpy as jnp
    from limg_tpu.ops import layout
    from limg_tpu.pallas_kernels.encode_fixed import pack_channels

    # force fallback path
    packed_py, mask_py = native.blockify_packed.__wrapped__(img) if hasattr(
        native.blockify_packed, "__wrapped__") else (None, None)
    packed, mask = native.blockify_packed(img)
    px, m_jnp, _ = layout.blockify(jnp.asarray(img))
    assert np.array_equal(packed, np.asarray(pack_channels(px)).astype(np.uint32))
    assert np.array_equal(mask.astype(bool), np.asarray(m_jnp))


def test_roundtrip(img):
    packed, mask = native.blockify_packed(img)
    back = native.unblockify_packed(packed, *img.shape[:2])
    assert np.array_equal(back, img)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_tga_roundtrip(tmp_path, img):
    p = str(tmp_path / "x.tga")
    native.write_tga(p, img)
    assert np.array_equal(native.read_tga(p), img)
    # grayscale
    native.write_tga(str(tmp_path / "g.tga"), img[..., 0].copy())


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_staging_pool(tmp_path, img):
    p = str(tmp_path / "s.tga")
    native.write_tga(p, img)
    pool = native.StagingPool(2)
    try:
        packed_ref, mask_ref = native.blockify_packed(img)
        slots = [pool.stage(p, *img.shape[:2]) for _ in range(4)]
        pool.await_all()
        for packed, mask, status in slots:
            assert status[0] == 1
            assert np.array_equal(packed, packed_ref)
            assert np.array_equal(mask, mask_ref)
    finally:
        pool.close()


@pytest.mark.skipif(not native.factor_kernels_available(),
                    reason="factor kernels not built")
def test_factor_kernels_match_numpy(rng):
    """The C++ LTP1 factor-section kernels must be byte-identical to the
    bitstream NumPy formulation (gather order, delta transform, width-group
    raw packing, header records, integer decode)."""
    from limg_tpu import bitstream as bs

    for trial in range(3):
        nb = int(rng.integers(5, 700))
        n_sel = int(rng.integers(1, nb + 1))
        ck = np.sort(rng.choice(nb, n_sel, replace=False)).astype(np.int32)
        segk = np.cumsum(rng.random(n_sel) < 0.3).astype(np.int32)
        wb = rng.integers(1, 9, n_sel).astype(np.uint8)
        maskb = (rng.random((nb, 64)) < 0.97).astype(np.uint8)
        qk = rng.integers(0, 256, (nb, 64), dtype=np.uint8)
        for i in range(n_sel):
            qk[ck[i]] &= np.uint8((1 << int(wb[i])) - 1)

        mm = maskb[ck].astype(bool)
        vals_np = qk[ck][mm]
        n_pix = int(vals_np.size)
        wv = np.broadcast_to(wb[:, None], (n_sel, 64))[mm]
        sv = np.broadcast_to(segk[:, None], (n_sel, 64))[mm]
        syms_np = (bs._delta_seg(vals_np, sv, wv.astype(np.int16))
                   if n_pix else np.zeros(0, np.uint8))

        vals_c, syms_c, hist_c, raw_c, gb_c = native.factor_pack_axis(
            qk, maskb, ck, segk, wb, n_pix)
        assert np.array_equal(vals_c, vals_np)
        assert np.array_equal(syms_c, syms_np)
        assert np.array_equal(hist_c, np.bincount(syms_np, minlength=256))
        raw_np = np.concatenate(
            [bs._pack_bits(vals_np[wv == v], v) for v in range(1, 9)]
            + [np.zeros(0, np.uint8)])
        assert np.array_equal(raw_c, raw_np)

        scattered = np.zeros((nb, 64), np.uint8)
        scattered[np.repeat(ck, mm.sum(axis=1)),
                  np.concatenate([np.flatnonzero(m) for m in mm])] = vals_np
        out_s = np.zeros((nb, 64), np.uint8)
        native.factor_unpack_axis_syms(syms_c, maskb, ck, segk, wb, out_s)
        assert np.array_equal(out_s, scattered)
        out_r = np.zeros((nb, 64), np.uint8)
        native.factor_unpack_axis_raw(raw_c, gb_c, maskb, ck, wb, out_r)
        assert np.array_equal(out_r, scattered)


@pytest.mark.skipif(not native.factor_kernels_available(),
                    reason="factor kernels not built")
def test_header_records_match_numpy(rng):
    for ch in (3, 4):
        nseg = 311
        s_hdr = rng.integers(0, 9, (3, nseg)).astype(np.int32)
        ep_hdr = rng.integers(-2048, 2047, (nseg, 6 * ch)).astype(np.int32)
        recs = native.pack_headers(s_hdr, ep_hdr, ch)
        # numpy reference packing (bitstream fallback formulation)
        swords = (s_hdr[0] | (s_hdr[1] << 4) | (s_hdr[2] << 8)).astype("<u2")
        bits = ((ep_hdr + 2048).astype(np.uint32)[:, :, None]
                >> np.arange(12)) & 1
        ep_bytes = np.packbits(
            bits.astype(np.uint8).reshape(nseg, -1), axis=1, bitorder="little")
        ref = np.concatenate(
            [swords.view(np.uint8).reshape(nseg, 2), ep_bytes], axis=1)
        assert np.array_equal(recs, ref)
        s2, ep2 = native.unpack_headers(recs, ch)
        assert np.array_equal(s2, s_hdr)
        assert np.array_equal(ep2, ep_hdr)


@pytest.mark.skipif(not native.factor_kernels_available(),
                    reason="factor kernels not built")
def test_decode_blocks_native_matches_numpy(rng):
    from limg_tpu.bitstream import _decode_blocks_np

    for ch in (3, 4):
        nb = 257
        q3 = rng.integers(0, 256, (3, nb, 64), dtype=np.uint8)
        shifts = rng.integers(0, 9, (3, nb)).astype(np.int32)
        eps = rng.integers(-300, 500, (6 * ch, nb)).astype(np.int32)
        ref = _decode_blocks_np(
            q3.astype(np.int32).transpose(0, 1, 2), shifts, eps, ch)
        words = native.decode_blocks_native(q3, shifts, eps, ch)
        got = np.stack([((words >> (8 * c)) & 0xFF).astype(np.uint8).T
                        for c in range(ch)])
        assert np.array_equal(got, ref)
        if ch == 3:
            assert ((words >> 24) == 0xFF).all()
