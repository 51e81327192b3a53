"""Micro-bisect of find_shifts_segments stages on the TPU.

Run: python tools/profiling/coalesce_micro.py
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
from limg_tpu.ops.segments import (
    fit_segments, gather_decomp, seg_max_contig, seg_sum_contig, SEG_ERR_SHIFT,
)
from limg_tpu.ops.crush import _admissible
from limg_tpu.ops.factors import extract_factors, quantize_factors
from limg_tpu.pallas_kernels.encode_fixed import crush_eval_rows_pallas
from limg_tpu.utils.timing import time_device_fn
from tools.make_test_image import make_4k

cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
CH = 3


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    img = jnp.asarray(img_np)
    px_all, mask_all, grid = layout.blockify(
        jnp.asarray(np.dstack([img_np, np.full((h, w), 255, np.uint8)])), 8)
    nb = grid.num_blocks
    cap = nb // 4
    px_c = jax.device_put(px_all[:, :, :cap])
    mask_c = jax.device_put(mask_all[:, :cap])
    # every 2 blocks form a segment (contiguous, id = first position)
    pos = np.arange(cap, dtype=np.int32)
    seg_c = jax.device_put(jnp.asarray(pos - (pos % 2)))

    res = {}

    @jax.jit
    def fitseg(px_c, mask_c, seg_c):
        return fit_segments(px_c, mask_c, seg_c, cap, CH, contiguous=True)

    t, _ = time_device_fn(lambda: fitseg(px_c, mask_c, seg_c).avg,
                          iters=12, inner=4)
    res["fitseg_ms"] = round(t * 1e3, 2)

    d_seg = jax.tree_util.tree_map(jax.device_put, fitseg(px_c, mask_c, seg_c))

    @jax.jit
    def prep(px_c, mask_c, seg_c, d_seg):
        d_blk = gather_decomp(d_seg, seg_c)
        f8_u8 = quantize_factors(*extract_factors(px_c, d_blk, CH))
        px = px_c[:CH].astype(jnp.int32)
        packed = px[0] + (px[1] << 8) + (px[2] << 16)
        f8 = jnp.stack([p.astype(jnp.int32) for p in f8_u8])
        f8_packed = f8[0] + (f8[1] << 8) + (f8[2] << 16)
        return packed, f8_packed, d_blk

    packed, f8_packed, d_blk = map(jax.device_put, prep(px_c, mask_c, seg_c, d_seg))
    mask_i = jax.device_put(mask_c.astype(jnp.int32))
    eps = [d_blk.dirA_min, d_blk.dirA_max, d_blk.dirB_offset, d_blk.dirB_mag,
           d_blk.dirC_offset, d_blk.dirC_mag]
    count_seg = seg_sum_contig(mask_i.sum(axis=0), seg_c, cap)

    def eval_fn(shifts_seg):
        shifts_blk = shifts_seg[:, seg_c]
        pm, be = crush_eval_rows_pallas(packed, mask_i, f8_packed, eps,
                                        shifts_blk, CH)
        pm_s = seg_max_contig(pm, seg_c, cap, 0)
        be_s = seg_sum_contig(be >> SEG_ERR_SHIFT, seg_c, cap)
        return pm_s, be_s

    @functools.partial(jax.jit, static_argnames=("n_evals",))
    def sweeps(count_seg, n_evals):
        acc = jnp.zeros((cap,), jnp.int32)
        accb = acc
        for i in range(n_evals):
            t = [0, 0, 0]
            t[i % 3] = i % 9
            shifts = jnp.broadcast_to(jnp.asarray(t, jnp.int32)[:, None], (3, cap))
            pm, be = eval_fn(shifts)
            acc = acc | pm
            accb = accb | be
        return acc.sum() + accb.sum()

    for n in (1, 9, 27):
        t, _ = time_device_fn(lambda n=n: sweeps(count_seg, n), iters=9, inner=3)
        res[f"sweeps{n}_ms"] = round(t * 1e3, 2)

    from limg_tpu.ops.segments import find_shifts_segments
    f8_u8 = tuple(((f8_packed >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(3))

    @jax.jit
    def full(px_c, mask_c, seg_c, d_seg):
        f8_u8 = quantize_factors(*extract_factors(px_c, gather_decomp(d_seg, seg_c), CH))
        s, e = find_shifts_segments(px_c, mask_c, f8_u8, d_seg, seg_c, cap, cfg,
                                    contiguous=True)
        return s.sum()

    t, _ = time_device_fn(lambda: full(px_c, mask_c, seg_c, d_seg),
                          iters=9, inner=3)
    res["factors_plus_crush_full_ms"] = round(t * 1e3, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
