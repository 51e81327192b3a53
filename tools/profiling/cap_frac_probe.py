"""Is cap_frac=8 safe? Count run blocks / dropped runs on representative
content at both capacities.

The coalesce pass compacts run blocks into a cap = max(4096, NB/cap_frac)
buffer; halving the buffer (cap_frac 4 -> 8) halves the segment kernel +
gather/scatter cost on a 4K, but drops runs past the boundary (observable:
coalesce_stats.dropped_runs_at_capacity). This probe reports, per content
family, the run-block population and what cap_frac=8 would drop.

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/profiling/cap_frac_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)

from limg_tpu import EncodeConfig
from limg_tpu.regions import encode_image_merged
from tools.make_test_image import make_4k


def banded(h, w, seed=7):
    """Worst case: wide horizontal gradient bands -> many long runs."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.uint8)
    y = 0
    while y < h:
        bh = int(rng.integers(8, 40))
        base = rng.integers(0, 200, 3)
        ramp = np.linspace(0, 55, w)[None, :, None]
        img[y:y + bh] = np.clip(base[None, None] + ramp, 0, 255)
        y += bh
    return img


def main():
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    fams = {
        "bench_4k": make_4k(),
        "banded_4k": banded(2160, 3840),
    }
    res = {}
    for name, img in fams.items():
        nb = (-(-img.shape[0] // 8)) * (-(-img.shape[1] // 8))
        row = {"nb": nb}
        for cf in (4, 8):
            out = encode_image_merged(img, cfg, seed=0, num_levels=3,
                                      fetch_planes=False,
                                      fetch_decoded=False, cap_frac=cf)
            cs = {k: int(v) for k, v in out["coalesce_stats"].items()}
            row[f"cap_frac_{cf}"] = {
                "cap": nb if nb <= 4096 else max(4096, nb // cf),
                "n_runs": int(out["n_runs"]),
                "psnr": round(out["psnr"], 3),
                "bpp": round(float(out["mean_bpp"]), 4),
                **cs,
            }
        res[name] = row
        print(json.dumps({name: row}, indent=1), flush=True)


if __name__ == "__main__":
    main()
