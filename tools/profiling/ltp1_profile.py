"""Host-side stage profile of LTP1 serialize_from_state / deserialize.

Runs ONE warm 4K merged encode (state fetch), then cProfiles the host pack
and parse+decode. Prints the top cumulative entries of each, to find where
pack_s (~2.6 s) and parse_dec_s (~5.6 s) actually go
(tools/profiling/ltp1_timing.py measured the totals).

Run: python tools/profiling/ltp1_profile.py
"""

import cProfile
import io
import os
import pstats
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


def top(profile, n=18):
    s = io.StringIO()
    pstats.Stats(profile, stream=s).sort_stats("cumulative").print_stats(n)
    # keep only the table
    txt = s.getvalue()
    lines = txt.splitlines()
    keep = [l for l in lines if l.strip()][:n + 6]
    print("\n".join(keep))


def main():
    img = make_4k()
    h, w = img.shape[:2]
    img4 = np.dstack([img, np.full((h, w), 255, np.uint8)])
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")

    _, state = encode_image_merged(
        img4, cfg, num_levels=3, fetch_planes=False, fetch_decoded=False,
        return_state=True,
    )
    # state arrays to host once, outside the profile
    state = {k: (np.asarray(v) if hasattr(v, "shape") else v)
             for k, v in state.items()}

    t0 = time.perf_counter()
    blob = serialize_from_state(state, cfg)
    t1 = time.perf_counter()
    print(f"pack_s {t1 - t0:.3f}  bytes {len(blob)}")

    pr = cProfile.Profile()
    pr.enable()
    serialize_from_state(state, cfg)
    pr.disable()
    print("== serialize_from_state ==")
    top(pr)

    t0 = time.perf_counter()
    dec, info = deserialize(blob)
    t1 = time.perf_counter()
    print(f"parse_dec_s {t1 - t0:.3f}")

    pr = cProfile.Profile()
    pr.enable()
    deserialize(blob)
    pr.disable()
    print("== deserialize ==")
    top(pr)


if __name__ == "__main__":
    main()
