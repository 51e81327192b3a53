"""Standalone timing of the fused segment-encode kernel at the coalesce
pass's real 4K geometry (cap = NB/4 = 32400 lanes), across tile widths.

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/profiling/segenc_probe.py
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
from limg_tpu.ops.segments import SEG_CAP
from limg_tpu.pallas_kernels.encode_fixed import KernelSpec
from limg_tpu.pallas_kernels.encode_segments import segment_encode_pallas
from limg_tpu.utils.timing import time_device_fn


def main():
    n = 32400
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (64, n), np.int64).astype(np.int32)
    mask = np.ones((64, n), np.int32)
    seg = np.zeros(n, np.int32)
    i = 0
    while i < n:
        wdt = min(int(rng.integers(2, 24)), n - i)   # realistic short runs
        seg[i:i + wdt] = i
        i += wdt
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder")
    kspec = KernelSpec.from_config(cfg)
    params = jnp.asarray([1, cfg.max_pixel_bit_crush_error,
                          cfg.max_block_bit_crush_error], jnp.int32)
    px_d = jax.device_put(jnp.asarray(px))
    mask_d = jax.device_put(jnp.asarray(mask))
    seg_d = jax.device_put(jnp.asarray(seg))
    res = {"n": n, "device": str(jax.devices()[0])}
    for t in (256, 512, 1024):
        for emit_q in (False, True):
            try:
                f = lambda t=t, e=emit_q: segment_encode_pallas(
                    px_d, mask_d, seg_d, params, kspec, emit_q=e,
                    t_lanes=t)[0]
                tt, _ = time_device_fn(f, iters=15, inner=5)
                res[f"t{t}_q{int(emit_q)}_ms"] = round(tt * 1e3, 3)
            except Exception as e:
                res[f"t{t}_q{int(emit_q)}_ms"] = repr(e)[:120]
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
