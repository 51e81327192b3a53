"""Micro: match_decomps standalone cost at merged-encoder scale + full paths.

Run: python tools/profiling/match_micro.py
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
from limg_tpu.ops.fit import fit_blocks
from limg_tpu.ops.match import match_decomps
from limg_tpu.regions import encode_image_merged_fused_device
from limg_tpu.utils.timing import time_device_fn
from tools.make_test_image import make_4k


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img = jax.device_put(jnp.asarray(np.concatenate([img_np, alpha], axis=-1)))
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    key = jax.random.PRNGKey(0)
    res = {}

    # decomps at level-1 parent scale (NB/4) from a 16px blockify
    px, mask, _ = layout.blockify(jnp.asarray(img), 16)
    d = fit_blocks(px, mask, 3)
    d = jax.tree_util.tree_map(jax.device_put, d)
    n = d.avg.shape[-1]

    @jax.jit
    def match3(d):
        m1, _ = match_decomps(d, d, 3)
        m2, _ = match_decomps(d, d, 3)
        m3, _ = match_decomps(d, d, 3)
        return m1 & m2 & m3

    t, _ = time_device_fn(lambda: match3(d), iters=15, inner=5)
    res["match3_n%d_ms" % n] = round(t * 1e3, 2)

    for coal in (False, True):
        f = lambda c=coal: encode_image_merged_fused_device(
            img, cfg, key, 3, emit_planes=False, coalesce=c)["decoded_words"]
        t, _ = time_device_fn(f, iters=12, inner=4)
        res[f"fused_coal{int(coal)}_ms"] = round(t * 1e3, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
