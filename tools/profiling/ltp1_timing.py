"""LTP1 production-pipeline timing: warm serialize/deserialize on a 4K image.

VERDICT r2 item 1's acceptance: warm 4K --write-ltp1 < 1 s device+host,
--decode-ltp1 < 1 s. Measures:
  encode_ser  encode_image_merged(..., return_state=True), planes skipped
  pack        serialize_from_state (host: numpy packing + native rANS)
  parse_dec   deserialize (host parse + device decode)

Run: python tools/profiling/ltp1_timing.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)

from limg_tpu import EncodeConfig
from limg_tpu.regions import encode_image_merged
from limg_tpu.bitstream import serialize_from_state, deserialize
from tools.make_test_image import make_4k


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img = np.concatenate([img_np, alpha], axis=-1)
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    res = {"device": str(jax.devices()[0]), "px": h * w}

    def timed(name, fn, reps=3):
        fn()  # warm (compile)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            ts.append(time.perf_counter() - t0)
        res[name + "_s"] = round(float(np.median(ts)), 4)
        return out

    state_box = {}

    def enc():
        out, state = encode_image_merged(
            img, cfg, num_levels=3, fetch_planes=False, fetch_decoded=False,
            return_state=True,
        )
        state_box["state"] = state
        return out

    timed("encode_ser", enc)

    def enc_fetch():
        enc()
        st = state_box["state"]
        st["rows"] = np.asarray(st["rows"])
        st["q"] = np.asarray(st["q"])

    # jax.Array caches the host copy after the first np.asarray, so the
    # transfer is measured as (fresh encode + fetch) - (fresh encode)
    timed("encode_fetch", enc_fetch)
    res["fetch_est_s"] = round(res["encode_fetch_s"] - res["encode_ser_s"], 4)
    res["q_mbytes"] = round(np.asarray(state_box["state"]["q"]).nbytes / 1e6, 1)
    blob = timed("pack", lambda: serialize_from_state(state_box["state"], cfg))
    res["bytes"] = len(blob)
    res["real_bpp"] = round(len(blob) * 8.0 / (h * w), 4)
    dec, info = timed("parse_dec", lambda: deserialize(blob))
    res["write_total_s"] = round(res["encode_fetch_s"] + res["pack_s"], 4)
    # round-trip exactness vs the in-memory encode is covered by
    # tests/test_bitstream.py; here we just sanity-check shape
    assert dec.shape == (h, w, 4)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
