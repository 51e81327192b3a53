"""Device-busy ground truth for the split auto-capacity merged encode.

Compares, per 4K iteration (contention-free xplane totals):
  fixed, merged8 (single graph, cap nb//8), mergedfull (single, cap=nb),
  pre (stages A-E alone), finish_full (coalesce+emission at cap=nb),
  auto = pre + host cap decision + finish (the API default).

Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
     JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/profiling/xplane_auto_cap.py
"""

import functools
import glob
import json
import os
import shutil
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
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
from limg_tpu.pallas_kernels.encode_fixed import encode_blocks_pallas
from limg_tpu.regions import (
    auto_run_capacity, encode_image_merged_fused_device, fused_merged_pre,
    fused_merged_finish,
)
from tools.make_test_image import make_4k

ITERS = 4


def device_busy_ms(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    total = 0
    for path in glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                          recursive=True):
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    total += ev.duration_ps
    return total / 1e9 / ITERS


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img4d, _, _ = layout.host_block_view(np.concatenate([img_np, alpha], -1))
    img = jax.device_put(img4d)
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    seed = jnp.int32(0)
    key = jax.random.PRNGKey(0)
    nb = layout.grid_for(h, w, 8).num_blocks

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step(img, cfg, seed):
        packed, mask, _ = layout.blockify_packed(img)
        return encode_blocks_pallas(packed, mask, cfg, seed)[:3]

    def pre():
        return fused_merged_pre(img, cfg, key, 3, need_q=False, hw=(h, w),
                                fused_layout="morton")

    st0 = pre()
    n_run = int(np.asarray(st0["n_run_blocks"]))
    cap = auto_run_capacity(n_run, nb)
    print(json.dumps({"n_run_blocks": n_run, "cap": cap}), flush=True)

    def finish(state):
        return fused_merged_finish(state, cfg, key, 3, False, False,
                                   (h, w), "morton", cap)["decoded_words"]

    def auto():
        state = pre()
        c = auto_run_capacity(int(np.asarray(state["n_run_blocks"])), nb)
        return fused_merged_finish(state, cfg, key, 3, False, False,
                                   (h, w), "morton", c)["decoded_words"]

    paths = {
        "fixed": lambda: step(img, cfg, seed)[0],
        "merged8": lambda: encode_image_merged_fused_device(
            img, cfg, key, 3, emit_planes=False, coalesce=True, cap_frac=8,
        )["decoded_words"],
        "mergedfull": lambda: encode_image_merged_fused_device(
            img, cfg, key, 3, emit_planes=False, coalesce=True, cap_frac=1,
        )["decoded_words"],
        "pre": lambda: pre()["n_run_blocks"],
        "finish_full": lambda: finish(st0),
        "auto": auto,
    }
    out = {}
    for name, fn in paths.items():
        np.asarray(fn())                       # compile + warm
        trace_dir = f"/tmp/xplane_auto_{name}"
        shutil.rmtree(trace_dir, ignore_errors=True)
        with jax.profiler.trace(trace_dir):
            for _ in range(ITERS):
                np.asarray(fn())
        out[name + "_device_ms"] = round(device_busy_ms(trace_dir), 3)
        print(name, out[name + "_device_ms"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
