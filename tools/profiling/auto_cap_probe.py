"""Auto-capacity (split pre/finish) merged encode vs pinned caps on the TPU.

Times, interleaved on one contention level:
  fixed      -- fixed-grid anchor
  merged8    -- single fused graph, latency-bounded cap (nb//8)
  mergedfull -- single fused graph, FULL cap (the old auto retry's 2nd pass)
  auto       -- the NEW default: fused_merged_pre -> host reads n_run_blocks
                -> fused_merged_finish at the bucketed capacity (one coalesce
                pass, no re-encode)

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/profiling/auto_cap_probe.py
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
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..",
                 ".jax_cache"),
)

from limg_tpu import EncodeConfig
from limg_tpu.ops import layout
from limg_tpu.regions import (
    auto_run_capacity, encode_image_merged_fused_device, fused_merged_pre,
    fused_merged_finish,
)
from limg_tpu.utils.timing import time_device_fns
from tools.make_test_image import make_4k


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img4d, _, _ = layout.host_block_view(
        np.concatenate([img_np, alpha], axis=-1))
    img = jax.device_put(img4d)
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    key = jax.random.PRNGKey(0)
    nb = layout.grid_for(h, w, 8).num_blocks

    from limg_tpu.encoder import encode_perf_step_pallas
    from limg_tpu.ops.layout import packed_words
    imgp = jax.device_put(packed_words(np.concatenate([img_np, alpha], -1)))
    fixed = lambda: encode_perf_step_pallas(imgp, cfg, key)[0]

    def pinned(cf):
        return lambda: encode_image_merged_fused_device(
            img, cfg, key, 3, emit_planes=False, coalesce=True, cap_frac=cf,
        )["decoded_words"]

    def auto():
        state = fused_merged_pre(img, cfg, key, 3, need_q=False,
                                 hw=(h, w), fused_layout="morton")
        n_run = int(np.asarray(state["n_run_blocks"]))
        cap = auto_run_capacity(n_run, nb)
        return fused_merged_finish(state, cfg, key, 3, False, False,
                                   (h, w), "morton", cap)["decoded_words"]

    # report the content's run count + chosen bucket once
    st = fused_merged_pre(img, cfg, key, 3, need_q=False, hw=(h, w),
                          fused_layout="morton")
    n_run = int(np.asarray(st["n_run_blocks"]))
    print(json.dumps({"n_run_blocks": n_run, "nb": nb,
                      "bucket": auto_run_capacity(n_run, nb)}))

    samples, rtt = time_device_fns(
        {"fixed": fixed, "merged8": pinned(8), "mergedfull": pinned(1),
         "auto": auto},
        rounds=10, inner=4,
    )
    res = {"rtt_ms": round(rtt * 1e3, 2), "device": str(jax.devices()[0])}
    for k, v in samples.items():
        res[k + "_ms"] = round(float(np.median(np.asarray(v))) * 1e3, 3)
    sf = np.asarray(samples["fixed"])
    sa = np.asarray(samples["auto"])
    res["auto_minus_fixed_ms"] = round(float(np.median(sa - sf)) * 1e3, 3)
    res["old_auto_equiv_ms"] = round(
        (float(np.median(np.asarray(samples["merged8"])))
         + float(np.median(np.asarray(samples["mergedfull"])))) * 1e3, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
