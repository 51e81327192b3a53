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
