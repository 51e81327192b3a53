"""Probe the merged driver's INPUT relayout ((H, W) packed words -> Morton
(64, NBP)): the shipped two-pass chain (blockify transpose + fenced Morton
embed) vs a fenced blockify variant.

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/profiling/blockify_probe.py
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
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.integers(-2**31, 2**31, (h, w), np.int64).astype(np.int32)))
    res = {"device": str(jax.devices()[0])}

    @jax.jit
    def cur(x):
        return em.morton_blockify_packed(x, h, w, levels)

    @jax.jit
    def fenced(x):
        xb = lax.optimization_barrier(x)
        t = xb.reshape(by, 8, bx, 8).transpose(1, 3, 0, 2).reshape(
            64, by * bx)
        t = lax.optimization_barrier(t)
        return em.morton_embed_rows(t, by, bx, levels)

    a = np.asarray(cur(img))
    for name, fn in (("cur", cur), ("fenced", fenced)):
        assert np.array_equal(a, np.asarray(fn(img))), name
        t, _ = time_device_fn(lambda f=fn: f(img), iters=20, inner=5)
        res[name + "_ms"] = round(t * 1e3, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
