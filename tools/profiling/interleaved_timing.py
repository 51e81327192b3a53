"""Interleaved A/B timing of the encode paths on the shared TPU.

The pool's contention varies on a ~minute timescale, so timing path A for
30 s and then path B for 30 s (what fused_timing.py does) can charge the two
paths DIFFERENT contention levels and produce fantasy ratios — we measured
fixed-grid "3x slower than merged-only" and "2.6x faster than merged-only"
from the same code on the same day that way. This probe round-robins small
batches of every path (fixed anchor first in each round), so each round's
samples share one contention level, and reports per-path medians, mins, and
the per-round ratio to the fixed anchor.

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/profiling/interleaved_timing.py
"""

import json
import os
import sys
import time

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
from limg_tpu.encoder import encode_perf_step_pallas
from limg_tpu.regions import encode_image_merged_fused_device
from limg_tpu.utils.timing import _sync_scalar
from tools.make_test_image import make_4k

INNER = 5
ROUNDS = 12


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    rgba = np.concatenate([img_np, alpha], axis=-1)
    img4d, _, _ = layout.host_block_view(rgba)
    img = jax.device_put(img4d)
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    key = jax.random.PRNGKey(0)
    mpx = h * w * 1e-6

    paths = {
        "fixed": lambda: encode_perf_step_pallas(img, cfg, key)[0],
        "merged": lambda: encode_image_merged_fused_device(
            img, cfg, key, 3, emit_planes=False, coalesce=False
        )["decoded_words"],
        "merged_coal": lambda: encode_image_merged_fused_device(
            img, cfg, key, 3, emit_planes=False, coalesce=True
        )["decoded_words"],
        "merged_planes": lambda: encode_image_merged_fused_device(
            img, cfg, key, 3, emit_planes=True, coalesce=True
        )["decoded_words"],
    }

    # compile everything up front so rounds only measure execution
    for name, fn in paths.items():
        t0 = time.perf_counter()
        _sync_scalar(fn())
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s", flush=True)

    # pure fetch RTT
    out = paths["fixed"]()
    _sync_scalar(out)
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync_scalar(out)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    samples = {name: [] for name in paths}
    for r in range(ROUNDS):
        for name, fn in paths.items():
            t0 = time.perf_counter()
            o = None
            for _ in range(INNER):
                o = fn()
            _sync_scalar(o)
            samples[name].append(
                max(time.perf_counter() - t0 - rtt, 1e-9) / INNER
            )
        print(f"round {r}: " + " ".join(
            f"{n}={samples[n][-1] * 1e3:.2f}" for n in paths), flush=True)

    res = {"mpx": mpx, "rtt_ms": round(rtt * 1e3, 2), "rounds": ROUNDS}
    for name in paths:
        s = np.asarray(samples[name]) * 1e3
        res[name] = {
            "median_ms": round(float(np.median(s)), 2),
            "min_ms": round(float(s.min()), 2),
            "max_ms": round(float(s.max()), 2),
        }
    for name in paths:
        if name == "fixed":
            continue
        ratios = np.asarray(samples[name]) / np.asarray(samples["fixed"])
        res[f"ratio_{name}_vs_fixed"] = round(float(np.median(ratios)), 3)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
