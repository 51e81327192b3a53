"""Feasibility probe: Pallas spatial-tile <-> lane relayout on TPU.

Tests whether a Pallas kernel can read (128, 128)-px spatial tiles of the
packed (H, W) i32 image directly (BlockSpec index_map walking tiles) and
emit (64, 256) block lanes via an in-kernel reshape/transpose -- and the
inverse. If this runs at ~HBM speed it replaces the XLA blockify +
Morton-gather (in) and to_orig + unblockify (out) relayouts, which cost
~3.6 ms of the merged encode's ~21 ms (tools/profiling/xplane_ops.py).

Lane order produced: tile-major, row-major within the 16x16-block tile
(lane = by16 * 16 + bx16), sublane = py * 8 + px.

Run: python tools/profiling/tile_relayout_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)

from limg_tpu.ops import layout
from limg_tpu.utils.timing import time_device_fn
from tools.make_test_image import make_4k

TPX = 128  # tile is 16x16 blocks = 128x128 px


def img_to_lanes_kernel(img_ref, out_ref):
    t = img_ref[...]                       # (128, 128) i32
    t = t.reshape(16, 8, 16, 8)
    t = t.transpose(1, 3, 0, 2)            # (8, 8, 16, 16)
    out_ref[...] = t.reshape(64, 256)


def lanes_to_img_kernel(lanes_ref, out_ref):
    t = lanes_ref[...]                     # (64, 256)
    t = t.reshape(8, 8, 16, 16)
    t = t.transpose(2, 0, 3, 1)            # (16, 8, 16, 8)
    out_ref[...] = t.reshape(128, 128)


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    packed_np = layout.packed_words(np.concatenate([img_np, alpha], -1))
    hp = -(-h // TPX) * TPX
    wp = -(-w // TPX) * TPX
    pad = np.zeros((hp, wp), np.int32)
    pad[:h, :w] = packed_np
    img = jax.device_put(jnp.asarray(pad))
    ty, tx = hp // TPX, wp // TPX
    n_tiles = ty * tx

    @jax.jit
    def to_lanes(img):
        return pl.pallas_call(
            img_to_lanes_kernel,
            grid=(ty, tx),
            in_specs=[pl.BlockSpec((TPX, TPX), lambda i, j: (i, j))],
            out_specs=pl.BlockSpec((64, 256), lambda i, j: (0, i * tx + j)),
            out_shape=jax.ShapeDtypeStruct((64, n_tiles * 256), jnp.int32),
        )(img)

    @jax.jit
    def to_img(lanes):
        return pl.pallas_call(
            lanes_to_img_kernel,
            grid=(ty, tx),
            in_specs=[pl.BlockSpec((64, 256), lambda i, j: (0, i * tx + j))],
            out_specs=pl.BlockSpec((TPX, TPX), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        )(lanes)

    res = {"device": str(jax.devices()[0]), "tiles": n_tiles}

    lanes = to_lanes(img)
    # correctness vs numpy
    ln = np.asarray(lanes)
    # (py, px, TY, TX, by, bx) -> (64, tiles*256)
    t2 = pad.reshape(ty, 16, 8, tx, 16, 8)
    ref = t2.transpose(2, 5, 0, 3, 1, 4).reshape(64, ty * tx * 256)
    res["to_lanes_exact"] = bool(np.array_equal(ln, ref))
    back = np.asarray(to_img(lanes))
    res["roundtrip_exact"] = bool(np.array_equal(back, pad))

    t1, _ = time_device_fn(lambda: to_lanes(img), iters=10, inner=5)
    res["to_lanes_ms"] = round(t1 * 1e3, 3)
    t2_, _ = time_device_fn(lambda: to_img(lanes), iters=10, inner=5)
    res["to_img_ms"] = round(t2_ * 1e3, 3)

    # comparison: current XLA blockify + morton gather chain
    from limg_tpu.pallas_kernels import encode_merged as em

    @jax.jit
    def xla_chain(img):
        packed, mask, grid0 = layout.blockify_packed(img[:h, :w], 8)
        perm, _, _ = em.morton_perm(grid0.blocks_y, grid0.blocks_x, 3)
        safe = jnp.asarray(np.maximum(perm, 0))
        return packed[:, safe]

    t3, _ = time_device_fn(lambda: xla_chain(img), iters=10, inner=5)
    res["xla_blockify_gather_ms"] = round(t3 * 1e3, 3)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
