"""Cumulative stage timings of the fused merged path + layout experiments.

Stages (4K RGB, errorFactor=100, 3 levels, match policy):
  s_blockify    blockify_packed only
  s_morton      + Morton lane gather (current: batched row gather)
  s_morton_rt   ALTERNATIVE: one reshape/transpose relayout image->Morton
  s_fit         + fit_levels_pallas incl. in-kernel match/owner
  s_crush       + owner_crush_pallas
  s_out         + to_orig + unblockify of the decode plane
  full_nc/full_c  the real device fn (coalesce off/on, no planes)

Run: python tools/profiling/fused_stages.py
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)

from limg_tpu import EncodeConfig
from limg_tpu.ops import layout
from limg_tpu.pallas_kernels.encode_fixed import KernelSpec
from limg_tpu.pallas_kernels import encode_merged as em
from limg_tpu.regions import encode_image_merged_fused_device
from limg_tpu.utils.timing import time_device_fn
from tools.make_test_image import make_4k

LEVELS = 3


def _prep(image, cfg):
    packed, mask, grid0 = layout.blockify_packed(image, 8)
    perm, byp, bxp = em.morton_perm(grid0.blocks_y, grid0.blocks_x, LEVELS)
    safe = jnp.asarray(np.maximum(perm, 0))
    valid = jnp.asarray(perm >= 0)
    packed_m = jnp.where(valid[None, :], packed[:, safe], 0)
    mask_m = (mask[:, safe] & valid[None, :]).astype(jnp.int32)
    return packed_m, mask_m, grid0, perm


def _morton_reshape(image, by, bx, levels):
    """(H, W) i32 -> (64, NBP) Morton lanes via pure reshape/transpose."""
    g = 1 << (levels - 1)
    byp = -(-by // g) * g
    bxp = -(-bx // g) * g
    h, w = image.shape
    pad = jnp.pad(image, ((0, byp * 8 - h), (0, bxp * 8 - w)))
    t = pad.reshape(byp // g, g, 8, bxp // g, g, 8)
    # split the g-axis into level bits (g = 4 -> (2, 2))
    t = t.reshape(byp // g, 2, 2, 8, bxp // g, 2, 2, 8)
    # -> (iy, ix, BY, BX, y1, x1, y0, x0)
    t = t.transpose(3, 7, 0, 4, 1, 5, 2, 6)
    return t.reshape(64, byp * bxp)


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img = jax.device_put(layout.packed_words(np.concatenate([img_np, alpha], -1)))
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    kspec = KernelSpec.from_config(cfg)
    key = jax.random.PRNGKey(0)
    params = jnp.stack([jnp.int32(1234),
                        jnp.int32(cfg.max_pixel_bit_crush_error),
                        jnp.int32(cfg.max_block_bit_crush_error)])
    res = {"device": str(jax.devices()[0]), "mpx": h * w * 1e-6}

    @jax.jit
    def s_blockify(img):
        return layout.blockify_packed(img, 8)[0]

    @jax.jit
    def s_morton(img):
        return _prep(img, cfg)[0]

    @jax.jit
    def s_morton_rt(img):
        gy, gx = -(-h // 8), -(-w // 8)
        return _morton_reshape(img, gy, gx, LEVELS)

    @jax.jit
    def s_fit(img):
        # the REAL path: fit + in-kernel match decisions + owner row
        packed_m, mask_m, grid0, _ = _prep(img, cfg)
        (cnt0, f8_sel, eps_sel, avg_sel, owner_row, stats_bits,
         _) = em.fit_levels_pallas(
            packed_m, params, kspec, LEVELS, False, hw=(h, w),
            emit_match=True)
        return owner_row

    def _crush(img):
        packed_m, mask_m, grid0, _ = _prep(img, cfg)
        (cnt0, f8_sel, eps_sel, avg_sel, owner_row, stats_bits,
         _) = em.fit_levels_pallas(
            packed_m, params, kspec, LEVELS, False, hw=(h, w),
            emit_match=True)
        return em.owner_crush_pallas(
            packed_m, owner_row, f8_sel, eps_sel,
            params, kspec, LEVELS, False, hw=(h, w))

    @jax.jit
    def s_crush(img):
        return _crush(img)[2]

    @jax.jit
    def s_out(img):
        dec_m = _crush(img)[2]
        gy, gx = -(-h // 8), -(-w // 8)
        grid0 = layout.grid_for(h, w, 8)
        perm, _, _ = em.morton_perm(gy, gx, LEVELS)
        inv = np.empty(grid0.num_blocks, np.int64)
        inv[perm[perm >= 0]] = np.nonzero(perm >= 0)[0]
        dec_blk = dec_m[:, jnp.asarray(inv)]
        return layout.unblockify(dec_blk[None], grid0, 8)[..., 0]

    probes = [
        ("s_blockify", s_blockify), ("s_morton", s_morton),
        ("s_morton_rt", s_morton_rt), ("s_fit", s_fit),
        ("s_crush", s_crush), ("s_out", s_out),
    ]
    for name, fn in probes:
        t, _ = time_device_fn(lambda f=fn: f(img), iters=15, inner=5)
        res[name + "_ms"] = round(t * 1e3, 2)

    for coal in (False, True):
        f = lambda c=coal: encode_image_merged_fused_device(
            img, cfg, key, 3, emit_planes=False, coalesce=c)["decoded_words"]
        t, _ = time_device_fn(f, iters=15, inner=5)
        res[f"full_coal{int(coal)}_ms"] = round(t * 1e3, 2)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
