"""Probe variants of the merged driver's OUTPUT relayout (Morton (64, NBP)
decode plane -> (H, W) words): xplane traces show the composed
morton_restore + unblockify materializing THREE ~33 MB steps
(reshape + copy + reshape, ~2.4 ms per 4K) instead of one transpose copy.

Variants:
  cur    morton_unblockify as shipped
  plane  restore_rows, then a C=1-specialized unblockify fenced with
         optimization_barrier (one transpose, reshape free)
  plane0 same without the barriers (lets XLA re-fuse)

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/profiling/unblockify_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)

from limg_tpu.ops import layout
from limg_tpu.pallas_kernels import encode_merged as em
from limg_tpu.utils.timing import time_device_fn


def main():
    h, w, levels = 2160, 3840, 3
    grid = layout.grid_for(h, w)
    by, bx = grid.blocks_y, grid.blocks_x
    g = 1 << (levels - 1)
    nbp = (-(-by // g) * g) * (-(-bx // g) * g)
    rng = np.random.default_rng(0)
    dec_m = jax.device_put(
        jnp.asarray(rng.integers(-2**31, 2**31, (64, nbp), np.int64)
                    .astype(np.int32)))
    res = {"device": str(jax.devices()[0])}

    @jax.jit
    def cur(x):
        return em.morton_unblockify(x, h, w, levels)

    def unblockify_plane(rows, barrier):
        x = lax.optimization_barrier(rows) if barrier else rows
        t = x.reshape(8, 8, by, bx).transpose(2, 0, 3, 1).reshape(
            by * 8, bx * 8)
        if barrier:
            t = lax.optimization_barrier(t)
        return t[:h, :w]

    @jax.jit
    def plane(x):
        rows = em.morton_restore_rows(x, by, bx, levels)
        return unblockify_plane(rows, True)

    @jax.jit
    def plane0(x):
        rows = em.morton_restore_rows(x, by, bx, levels)
        return unblockify_plane(rows, False)

    a = np.asarray(cur(dec_m))
    for name, fn in (("cur", cur), ("plane", plane), ("plane0", plane0)):
        assert np.array_equal(a, np.asarray(fn(dec_m))), name
        t, _ = time_device_fn(lambda f=fn: f(dec_m), iters=20, inner=5)
        res[name + "_ms"] = round(t * 1e3, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
