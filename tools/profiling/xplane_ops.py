"""Top INDIVIDUAL XLA ops of the fused merged encode, with HLO source
attribution.

xplane_top.py aggregates by op-name prefix, which hides whether "fusion" is
one big loop or hundreds of launches. This prints the top-N individual op
instances and, when an HLO dump is available (XLA_FLAGS=--xla_dump_to=DIR set
by this script), resolves each op's source location from the HLO metadata.

Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/profiling/xplane_ops.py
"""

import collections
import glob
import json
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
HLO_DIR = "/tmp/hlo_fused"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_dump_to={HLO_DIR}"
                           " --xla_dump_hlo_pass_re=.*optimizations.*")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax

from limg_tpu import EncodeConfig
from limg_tpu.ops import layout
from limg_tpu.regions import encode_image_merged_fused_device
from tools.make_test_image import make_4k


def _load_hlo_locs():
    """op name -> metadata source string from the biggest after-opt dump."""
    paths = glob.glob(os.path.join(HLO_DIR, "*after_optimizations*.txt"))
    if not paths:
        paths = glob.glob(os.path.join(HLO_DIR, "*.txt"))
    if not paths:
        return {}
    path = max(paths, key=os.path.getsize)
    locs = {}
    pat = re.compile(r"%(\S+?) = .*?metadata={([^}]*)}")
    for line in open(path):
        m = pat.search(line)
        if m:
            md = m.group(2)
            om = re.search(r'op_name="([^"]*)"', md)
            sf = re.search(r'source_file="([^"]*)"', md)
            sl = re.search(r"source_line=(\d+)", md)
            loc = ""
            if sf:
                loc = os.path.basename(sf.group(1))
                if sl:
                    loc += ":" + sl.group(1)
            locs[m.group(1)] = ((om.group(1)[-110:] if om else ""), loc)
    return locs


def main():
    trace_dir = "/tmp/xplane_fused_ops"
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

    locs = _load_hlo_locs()
    print(json.dumps({"total_ms_over_3_iters": round(total / 1e9, 2),
                      "hlo_ops_resolved": len(locs)}))
    for name, ps in agg.most_common(40):
        op, loc = locs.get(name, ("", ""))
        print(f"{ps / 1e9 / 3:7.3f} ms/iter x{n[name] // 3:<4} {name:<28} "
              f"{loc:<22} {op}")


if __name__ == "__main__":
    main()
