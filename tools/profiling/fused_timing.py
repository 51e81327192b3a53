"""Consolidated same-session timing of the encode paths on the TPU.

Prints one JSON object: fixed grid, fused merged (all variants), dense
merged reference. Run: python tools/profiling/fused_timing.py
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

from limg_tpu import EncodeConfig
from limg_tpu.encoder import encode_perf_step_pallas
from limg_tpu.regions import (
    encode_image_merged_device, encode_image_merged_fused_device,
)
from limg_tpu.utils.timing import time_device_fn
from tools.make_test_image import make_4k


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    from limg_tpu.ops import layout
    rgba = np.concatenate([img_np, alpha], axis=-1)
    img = jax.device_put(layout.packed_words(rgba))
    img4 = jax.device_put(jnp.asarray(rgba))  # dense path wants (H, W, 4)
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    key = jax.random.PRNGKey(0)
    mpx = h * w * 1e-6
    res = {"mpx": mpx, "device": str(jax.devices()[0])}

    f = lambda: encode_perf_step_pallas(img, cfg, key)[0]
    t, _ = time_device_fn(f, iters=20, inner=5)
    res["fixed_grid_ms"] = round(t * 1e3, 2)

    for coal in (False, True):
        for planes in (False, True):
            f = lambda p=planes, c=coal: encode_image_merged_fused_device(
                img, cfg, key, 3, emit_planes=p, coalesce=c)["decoded_words"]
            t, _ = time_device_fn(f, iters=15, inner=5)
            res[f"fused_planes{int(planes)}_coal{int(coal)}_ms"] = round(t * 1e3, 2)

    f = lambda: encode_image_merged_device(
        img4, cfg, key, 3, True, emit_planes=False,
        merge_policy="match", coalesce=False)["decoded"]
    t, _ = time_device_fn(f, iters=9, inner=3)
    res["dense_planes0_coal0_ms"] = round(t * 1e3, 2)

    res["fused_best_mpxs"] = round(mpx / (res["fused_planes0_coal0_ms"] * 1e-3), 1)
    res["fixed_mpxs"] = round(mpx / (res["fixed_grid_ms"] * 1e-3), 1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
