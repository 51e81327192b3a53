"""4K RD-policy merged encode ON THE DEVICE: quality + latency.

VERDICT r4 item 2's done-criterion: the RD policy (the repo's best
published quality mode) must encode a real 4K on the TPU at <= ~1.5x the
match-policy latency. Runs the fused RD path (encode_image_merged_rd_device)
at three lambdas on the bench 4K, interleaved with the match-policy lane
for contention-fair timing, and prints PSNR/bpp per lambda for the
PARITY_RESULTS.md device row.

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/profiling/rd_device_4k.py
"""

import json
import os
import sys

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
from limg_tpu.bitstream import region_header_bits
from limg_tpu.ops import layout
from limg_tpu.ops.error import max_possible_error
from limg_tpu.regions import (
    encode_image_merged_fused_device, encode_image_merged_rd_device,
)
from limg_tpu.utils.timing import time_device_fns, device_busy_ms
from tools.make_test_image import make_4k


def main():
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img4d, _, _ = layout.host_block_view(
        np.concatenate([img_np, alpha], axis=-1))
    img = jax.device_put(img4d)
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    key = jax.random.PRNGKey(0)
    hdr = region_header_bits(3)

    def quality(out):
        mse = float(np.asarray(out["total_err"])) / (h * w)
        return (10.0 * np.log10(max_possible_error(3) / max(mse, 1e-12)),
                float(np.asarray(out["mean_bpp"])))

    def rd(lam):
        return encode_image_merged_rd_device(
            img, cfg, key, jnp.float32(lam), 3, emit_planes=False,
            hw=(h, w), cap_frac=1, header_bits=hdr)

    match_fn = lambda: encode_image_merged_fused_device(
        img, cfg, key, 3, emit_planes=False, coalesce=True, hw=(h, w),
        cap_frac=1)["decoded_words"]

    qual = {}
    for lam in (0.003, 0.01, 0.03):
        out = rd(lam)
        qual[f"rd_{lam}"] = [round(v, 3) for v in quality(out)]
        print(lam, qual[f"rd_{lam}"], flush=True)
    qm = quality(encode_image_merged_fused_device(
        img, cfg, key, 3, emit_planes=False, coalesce=True, hw=(h, w),
        cap_frac=1))
    qual["match_full"] = [round(v, 3) for v in qm]

    samples, rtt = time_device_fns(
        {"match_full": match_fn,
         "rd_001": lambda: rd(0.01)["decoded_words"]},
        rounds=8, inner=4,
    )
    res = {"quality_psnr_bpp": qual, "rtt_ms": round(rtt * 1e3, 2)}
    for k, v in samples.items():
        res[k + "_ms"] = round(float(np.median(np.asarray(v))) * 1e3, 3)
    res["rd_vs_match_ratio"] = round(
        float(np.median(np.asarray(samples["rd_001"])
                        / np.asarray(samples["match_full"]))), 3)
    for name, fn in (("match_full", match_fn),
                     ("rd_001", lambda: rd(0.01)["decoded_words"])):
        b = device_busy_ms(fn, iters=3)
        if b is not None:
            res[name + "_device_busy_ms"] = round(b, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
