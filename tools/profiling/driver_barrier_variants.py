"""Probe: optimization_barrier placement for the fused driver's relayouts.

Round-3 xplane profiling showed the Morton relayout chains cost ~7 ms/4K
in-driver while being near-bandwidth in isolation: XLA splits
reshape(concat(...)) into per-operand reshape chains whose (2,2) minor dims
tile at 4/1024 utilization, and re-fuses transposes into every consumer.
This times the FULL fused driver under different barrier placements by
monkeypatching encode_merged.morton_{embed,restore}_rows and clearing the
driver's jit cache between variants. Run on the TPU:
  python tools/profiling/driver_barrier_variants.py
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
from limg_tpu.ops import layout
from limg_tpu.pallas_kernels import encode_merged as em
from limg_tpu import regions
from limg_tpu.utils.timing import time_device_fn
from tools.make_test_image import make_4k

EMBED0 = em.morton_embed_rows
RESTORE0 = em.morton_restore_rows
barrier = jax.lax.optimization_barrier


def patched(embed_in=False, embed_out=False, rest_in=False, rest_out=False):
    def emb(rows, by, bx, lv):
        if embed_in:
            rows = barrier(rows)
        out = EMBED0(rows, by, bx, lv)
        return barrier(out) if embed_out else out

    def rest(rows_m, by, bx, lv):
        if rest_in:
            rows_m = barrier(rows_m)
        out = RESTORE0(rows_m, by, bx, lv)
        return barrier(out) if rest_out else out

    return emb, rest


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img = jax.device_put(layout.packed_words(np.concatenate([img_np, alpha], -1)))
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    key = jax.random.PRNGKey(0)
    res = {"device": str(jax.devices()[0])}

    # contention yardstick: fixed grid, same session
    t, _ = time_device_fn(lambda: encode_perf_step_pallas(img, cfg, key)[0],
                          iters=20, inner=5)
    res["fixed_grid_ms"] = round(t * 1e3, 2)
    print("fixed_grid", res["fixed_grid_ms"], flush=True)

    variants = {
        "base": dict(),
        "rin": dict(rest_in=True),
        "rinout": dict(rest_in=True, rest_out=True),
        "rinout_ein": dict(rest_in=True, rest_out=True, embed_in=True),
        "all": dict(rest_in=True, rest_out=True, embed_in=True, embed_out=True),
    }
    for name, kw in variants.items():
        emb, rest = patched(**kw)
        em.morton_embed_rows, em.morton_restore_rows = emb, rest
        regions.encode_image_merged_fused_device.clear_cache()
        try:
            for planes in (False, True):
                f = lambda p=planes: regions.encode_image_merged_fused_device(
                    img, cfg, key, 3, emit_planes=p, coalesce=True,
                )["decoded_words"]
                t, _ = time_device_fn(f, iters=12, inner=4)
                res[f"{name}_planes{int(planes)}_ms"] = round(t * 1e3, 2)
                print(name, planes, res[f"{name}_planes{int(planes)}_ms"],
                      flush=True)
        finally:
            em.morton_embed_rows, em.morton_restore_rows = EMBED0, RESTORE0
    regions.encode_image_merged_fused_device.clear_cache()
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
