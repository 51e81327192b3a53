"""Per-op device-time breakdown of the NATURAL-layout merged encode.

Same methodology as xplane_ops.py but parameterized over fused_layout and
coalesce, to attribute the natural-vs-morton gap (natural_vs_morton.py)
to specific kernels/ops.

Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
     python tools/profiling/xplane_natural.py [natural|morton] [0|1]
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

from limg_tpu import EncodeConfig
from limg_tpu.ops import layout
from limg_tpu.regions import encode_image_merged_fused_device
from tools.make_test_image import make_4k


def main():
    fused_layout = sys.argv[1] if len(sys.argv) > 1 else "natural"
    coalesce = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    trace_dir = f"/tmp/xplane_{fused_layout}_{int(coalesce)}"
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img4d, _, _ = layout.host_block_view(
        np.concatenate([img_np, alpha], axis=-1))
    img = jax.device_put(img4d)
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    key = jax.random.PRNGKey(0)

    fn = lambda: encode_image_merged_fused_device(
        img, cfg, key, 3, emit_planes=False, coalesce=coalesce,
        fused_layout=fused_layout)["decoded_words"]
    np.asarray(fn())  # compile + warm
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            np.asarray(fn())

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    agg = collections.Counter()
    n = collections.Counter()
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
                    agg[meta.name] += ev.duration_ps
                    n[meta.name] += 1
                    total += ev.duration_ps

    kern = sum(ps for nm, ps in agg.items()
               if "custom-call" in nm or "_pallas" in nm or "_natural" in nm)
    print(json.dumps({"layout": fused_layout, "coalesce": coalesce,
                      "device_ms_per_iter": round(total / 3e9, 3),
                      "kernel_ms": round(kern / 3e9, 3),
                      "glue_ms": round((total - kern) / 3e9, 3)}))
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    for name, ps in agg.most_common(top):
        print(f"{ps / 1e9 / 3:7.3f} ms/iter x{n[name] // 3:<4} "
              f"{name[:160]}")


if __name__ == "__main__":
    main()
