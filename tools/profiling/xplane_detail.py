"""Per-op (unaggregated) device-time listing of the fused merged encode.

Same trace as xplane_top.py but keyed by the full op name, so individual
big copies/fusions can be attributed to graph positions. Run:
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/profiling/xplane_detail.py
"""

import collections
import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)

from limg_tpu import EncodeConfig
from limg_tpu.ops import layout
from limg_tpu.regions import encode_image_merged_fused_device
from tools.make_test_image import make_4k


def main():
    import shutil

    trace_dir = "/tmp/xplane_fused_detail"
    shutil.rmtree(trace_dir, ignore_errors=True)   # stale traces double-count
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img4d, _, _ = layout.host_block_view(np.concatenate([img_np, alpha], -1))
    img = jax.device_put(img4d)
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
    shapes = {}
    total = 0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            stat_meta = plane.stat_metadata
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    meta = plane.event_metadata[ev.metadata_id]
                    agg[meta.name] += ev.duration_ps
                    events_n[meta.name] += 1
                    total += ev.duration_ps
                    if meta.name not in shapes:
                        for st in ev.stats:
                            sm = stat_meta.get(st.metadata_id)
                            if sm is not None and sm.name in (
                                    "shape_with_layout", "expression"):
                                shapes.setdefault(meta.name, str(
                                    st.str_value or st.ref_value))[:90]
    print(json.dumps({"total_ms_over_3_iters": round(total / 1e9, 2)}))
    full = os.environ.get("XPLANE_FULL_EXPR")
    for name, ps in agg.most_common(45):
        extra = shapes.get(name, "")[: (2000 if full else 110)]
        print(f"{ps / 1e9 / 3:8.3f} ms/iter x{events_n[name] // 3:<4} {name[:60]:62s} {extra}")


if __name__ == "__main__":
    main()
