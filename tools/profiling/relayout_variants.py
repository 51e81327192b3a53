"""Probe: cheaper Morton relayout strategies for the fused merged driver.

The round-3 xplane per-op profile (tools/profiling/xplane_ops.py) shows the
fused merged encode spending ~7 ms per 4K in relayout copies:
  - blockify + morton_embed of the packed pixels (2 passes, ~2.2 ms)
  - morton_restore + unblockify of the decode plane (2 passes, ~1.7 ms)
  - SEVEN separate (3, NBP) row restores at ~0.38 ms each (~2.7 ms): XLA
    splits reshape(concat(...)) into per-operand reshapes whose (2,2) minor
    dims tile at 4/1024 utilization.
This script times the current chains against composed single chains and
an optimization_barrier'd batched row restore. Run on the TPU:
  python tools/profiling/relayout_variants.py
"""

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

from limg_tpu.ops import layout
from limg_tpu.pallas_kernels import encode_merged as em
from limg_tpu.utils.timing import time_device_fn
from tools.make_test_image import make_4k

LEVELS = 3


def morton_blockify_packed(packed2d, h, w, levels):
    """(H, W) i32 words -> (64, NBP) Morton-ordered block lanes, ONE chain."""
    g = 1 << (levels - 1)
    by, bx = -(-h // 8), -(-w // 8)
    byp, bxp = -(-by // g) * g, -(-bx // g) * g
    x = jnp.pad(packed2d, ((0, byp * 8 - h), (0, bxp * 8 - w)))
    L = levels - 1
    # y splits as (scy, y_{L-1}..y_0, py); x as (scx, x_{L-1}..x_0, px)
    x = x.reshape(byp // g, *([2] * L), 8, bxp // g, *([2] * L), 8)
    ny = 2 + L  # dims in the y group
    perm = (
        [ny - 1, 2 * ny - 1]                     # py, px
        + [0, ny]                                # scy, scx
        + [i for b in range(L) for i in (1 + b, ny + 1 + b)]  # y_b, x_b (msb..lsb)
    )
    return x.transpose(perm).reshape(64, byp * bxp)


def morton_unblockify_dec(dec_m, h, w, levels):
    """(64, NBP) Morton decode plane -> (H, W) i32 words, ONE chain."""
    g = 1 << (levels - 1)
    by, bx = -(-h // 8), -(-w // 8)
    byp, bxp = -(-by // g) * g, -(-bx // g) * g
    L = levels - 1
    x = dec_m.reshape(8, 8, byp // g, bxp // g, *([2] * (2 * L)))
    # -> (scy, y_{L-1}..y_0, py, scx, x_{L-1}..x_0, px)
    perm = (
        [2] + [4 + 2 * b for b in range(L)] + [0]
        + [3] + [5 + 2 * b for b in range(L)] + [1]
    )
    x = x.transpose(perm).reshape(byp * 8, bxp * 8)
    return x[:h, :w]


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img = jax.device_put(layout.packed_words(np.concatenate([img_np, alpha], -1)))
    res = {"device": str(jax.devices()[0])}

    packed, mask, grid0 = layout.blockify_packed(jnp.asarray(img), 8)
    by0, bx0 = grid0.blocks_y, grid0.blocks_x
    packed_m = jax.jit(
        lambda p: em.morton_embed_rows(p, by0, bx0, LEVELS))(packed)
    nbp = packed_m.shape[-1]
    dec_m = packed_m  # same shape/dtype; content irrelevant for relayout cost
    rows_m = jax.device_put(
        jnp.asarray(np.random.randint(0, 255, (24, nbp), np.int32)))

    def run(name, fn):
        f = jax.jit(fn)
        t, _ = time_device_fn(lambda: f(), iters=12, inner=5)
        res[name + "_ms"] = round(t * 1e3, 3)
        print(name, res[name + "_ms"], flush=True)

    # --- input side --------------------------------------------------------
    run("in_current", lambda: em.morton_embed_rows(
        layout.blockify_packed(img, 8)[0], by0, bx0, LEVELS))
    run("in_composed", lambda: morton_blockify_packed(img, h, w, LEVELS))

    # --- decode side --------------------------------------------------------
    def dec_current():
        d0 = em.morton_restore_rows(dec_m, by0, bx0, LEVELS)
        return layout.unblockify(d0[None], grid0, 8)[..., 0]

    run("dec_current", dec_current)
    run("dec_composed", lambda: morton_unblockify_dec(dec_m, h, w, LEVELS))

    # --- small rows ---------------------------------------------------------
    run("rows_current", lambda: em.morton_restore_rows(rows_m, by0, bx0, LEVELS))
    run("rows_barrier", lambda: em.morton_restore_rows(
        jax.lax.optimization_barrier(rows_m), by0, bx0, LEVELS))
    run("rows_split7", lambda: [
        em.morton_restore_rows(rows_m[i * 3:(i + 1) * 3], by0, bx0, LEVELS)
        for i in range(7)
    ])

    def rows_ride_dec():
        both = jnp.concatenate([dec_m, rows_m], axis=0)
        both = jax.lax.optimization_barrier(both)
        out = em.morton_restore_rows(both, by0, bx0, LEVELS)
        return out[64:], layout.unblockify(out[:64][None], grid0, 8)[..., 0]

    run("rows_ride_dec", rows_ride_dec)

    # sanity: composed chains match the 2-pass versions bitwise
    a = jax.jit(dec_current)()
    b = jax.jit(lambda: morton_unblockify_dec(dec_m, h, w, LEVELS))()
    assert bool(jnp.array_equal(a, b)), "dec composed mismatch"
    c = jax.jit(lambda: em.morton_embed_rows(
        layout.blockify_packed(img, 8)[0], by0, bx0, LEVELS))()
    d = jax.jit(lambda: morton_blockify_packed(img, h, w, LEVELS))()
    assert bool(jnp.array_equal(c, d)), "input composed mismatch"
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
