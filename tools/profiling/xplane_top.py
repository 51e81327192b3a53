"""Trace the fused merged encode (coalesce on) and print the top XLA ops.

jax.profiler.trace works on the tunneled TPU; the tensorboard converter does
not, so this parses the xplane proto directly
(tensorflow.tsl.profiler.protobuf.xplane_pb2 under
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python) and aggregates the "XLA Ops"
line by sanitized op-name prefix -- the fastest way to see which jnp glue
lowered to serial loops.

Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/profiling/xplane_top.py
"""

import collections
import glob
import json
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
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
from limg_tpu.regions import encode_image_merged_fused_device
from tools.make_test_image import make_4k


def _prefix(name: str) -> str:
    """fusion.123 -> fusion; dynamic-slice.4 -> dynamic-slice."""
    return re.split(r"[.\d]", name, 1)[0]


def main():
    trace_dir = "/tmp/xplane_fused"
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img = jax.device_put(layout.packed_words(np.concatenate([img_np, alpha], -1)))
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    key = jax.random.PRNGKey(0)

    fn = lambda: encode_image_merged_fused_device(
        img, cfg, key, 3, emit_planes=False, coalesce=True)["decoded_words"]
    np.asarray(fn())  # compile + warm
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            np.asarray(fn())

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    agg = collections.Counter()
    events_n = collections.Counter()
    total = 0
    for path in paths:
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
                    meta = plane.event_metadata[ev.metadata_id]
                    key_name = _prefix(meta.name)
                    agg[key_name] += ev.duration_ps
                    events_n[key_name] += 1
                    total += ev.duration_ps
    print(json.dumps({"total_ms_over_3_iters": round(total / 1e9, 2)}))
    for name, ps in agg.most_common(25):
        print(f"{ps / 1e9 / 3:8.3f} ms/iter  x{events_n[name] // 3:<6} {name}")


if __name__ == "__main__":
    main()
