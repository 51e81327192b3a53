"""Timing breakdown of the merged encoder on the current backend.

Measures (4K RGB, errorFactor=100):
  - fixed-grid fused kernel (reference point)
  - per-level dense encode_levels cost (1/2/3 levels, pallas)
  - full merged device fn: {planes, no-planes} x {coalesce, no-coalesce}
Run: python tools/profiling/merged_breakdown.py
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
from limg_tpu.pallas_kernels.encode_fixed import encode_blocks_pallas, pack_channels
from limg_tpu.regions import encode_image_merged_device, encode_levels
from limg_tpu.utils.timing import time_device_fn
from tools.make_test_image import make_4k


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img = jax.device_put(jnp.asarray(np.concatenate([img_np, alpha], axis=-1)))
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    key = jax.random.PRNGKey(0)
    mpx = h * w * 1e-6
    results = {}

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def fixed(img, cfg):
        px, mask, _ = layout.blockify(img)
        return encode_blocks_pallas(pack_channels(px), mask, cfg, jnp.int32(0))[:3]

    t, _ = time_device_fn(lambda: fixed(img, cfg), iters=20, inner=5)
    results["fixed_grid_ms"] = round(t * 1e3, 2)

    levels_fn = jax.jit(
        lambda im, k: encode_levels(im, cfg, k, 3, True)[1][0]["shifts"],
        static_argnames=(),
    )
    for nl in (1, 2, 3):
        f = jax.jit(
            functools.partial(
                lambda im, k, n: encode_levels(im, cfg, k, n, True)[1][0]["shifts"],
                n=nl,
            )
        )
        t, _ = time_device_fn(lambda: f(img, key), iters=12, inner=3)
        results[f"encode_levels_{nl}_ms"] = round(t * 1e3, 2)

    for planes in (True, False):
        for coal in (True, False):
            f = lambda: encode_image_merged_device(
                img, cfg, key, 3, True, emit_planes=planes,
                merge_policy="match", coalesce=coal,
            )["decoded"]
            t, _ = time_device_fn(f, iters=12, inner=3)
            results[f"merged_planes{int(planes)}_coal{int(coal)}_ms"] = round(t * 1e3, 2)

    results["backend"] = jax.default_backend()
    results["mpx"] = mpx
    results["merged_best_mpxs"] = round(
        mpx / (min(v for k, v in results.items() if k.startswith("merged")) * 1e-3), 1
    )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
