"""A/B: natural-layout vs Morton merged pipeline on a real 4K, interleaved.

Times encode_image_merged_fused_device(coalesce=True/False) under both
fused_layout values plus the fixed-grid anchor in ONE interleaved
time_device_fns session, so every path sees the same pool contention
(CLAUDE.md: contention is additive; sequential A/B timing has produced
fantasy ratios).

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/profiling/natural_vs_morton.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import functools
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from limg_tpu import EncodeConfig
    from limg_tpu.ops import layout
    from limg_tpu.pallas_kernels.encode_fixed import encode_blocks_pallas
    from limg_tpu.regions import encode_image_merged_fused_device
    from limg_tpu.utils.timing import time_device_fns
    from tools.make_test_image import make_4k

    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img4d, _, _ = layout.host_block_view(
        np.concatenate([img_np, alpha], axis=-1))
    img = jax.device_put(img4d)
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    key = jax.random.PRNGKey(0)
    seed = jnp.int32(0)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def fixed_step(img, cfg, seed):
        packed, mask, _ = layout.blockify_packed(img)
        return encode_blocks_pallas(packed, mask, cfg, seed)[:3]

    def merged(layout_name, coalesce):
        return lambda: encode_image_merged_fused_device(
            img, cfg, key, 3, emit_planes=False, coalesce=coalesce,
            fused_layout=layout_name,
        )["decoded_words"]

    fns = {
        "fixed": lambda: fixed_step(img, cfg, seed),
        "nat_mergeonly": merged("natural", False),
        "nat_coalesce": merged("natural", True),
        "mor_mergeonly": merged("morton", False),
        "mor_coalesce": merged("morton", True),
    }
    print("compiling (5 paths) ...", flush=True)
    samples, rtt = time_device_fns(fns, rounds=8, inner=4)
    print(f"rtt {rtt * 1e3:.1f} ms")
    sf = np.asarray(samples["fixed"])
    for name, vals in samples.items():
        v = np.asarray(vals)
        print(f"{name:15s} median {np.median(v) * 1e3:7.3f} ms  "
              f"minus-fixed {np.median(v - sf) * 1e3:7.3f} ms  "
              f"(rounds: " + " ".join(f"{x * 1e3:.2f}" for x in v) + ")")


if __name__ == "__main__":
    main()
