"""Device-busy ground truth for the two bench.py paths (fixed + merged).

The shared-pool wall-clock numbers in bench.py are rtt-subtracted and can
drift with pool load; the xplane device-time total is contention-free. Run:
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/profiling/xplane_bench_paths.py
"""

import collections
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
from limg_tpu.regions import encode_image_merged_fused_device
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

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step(img, cfg, seed):
        packed, mask, _ = layout.blockify_packed(img)
        return encode_blocks_pallas(packed, mask, cfg, seed)[:3]

    paths = {
        "fixed": lambda: step(img, cfg, seed)[0],
        "merged_coal": lambda: encode_image_merged_fused_device(
            img, cfg, key, 3, emit_planes=False, coalesce=True
        )["decoded_words"],
    }
    out = {}
    for name, fn in paths.items():
        np.asarray(fn())                       # compile + warm
        trace_dir = f"/tmp/xplane_bench_{name}"
        shutil.rmtree(trace_dir, ignore_errors=True)
        with jax.profiler.trace(trace_dir):
            for _ in range(ITERS):
                np.asarray(fn())
        out[name + "_device_ms_per_iter"] = round(device_busy_ms(trace_dir), 3)
        print(name, out[name + "_device_ms_per_iter"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
