"""Cost of FULL coalesce run-buffer capacity vs the NB/8 cap on a real 4K.

With the segment kernel's empty-window skip (encode_segments.py), the
re-encode cost scales with run content, not buffer size -- but the
gather/scatter/scan widths still scale with the cap. This times the fused
merged encode at cap_frac=8 (cap 16200) vs cap_frac=1 (cap = NB = 129600)
interleaved, on photo-like content (few runs) AND banded content (run-
heavy, where the old cap truncated runs).

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/profiling/cap_full_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from limg_tpu import EncodeConfig
    from limg_tpu.ops import layout
    from limg_tpu.regions import encode_image_merged_fused_device
    from limg_tpu.utils.timing import time_device_fns
    from tools.make_test_image import make_4k

    h, w = 2160, 3840
    img_np = make_4k()
    alpha = np.full((h, w, 1), 255, np.uint8)
    photo4d, _, _ = layout.host_block_view(
        np.concatenate([img_np, alpha], axis=-1))
    # banded content: horizontal flat bands -> long run rows at every level
    rng = np.random.default_rng(3)
    bands = np.zeros((h, w, 4), np.uint8)
    bands[..., 3] = 255
    yband = (np.arange(h) // 96)[:, None]
    for c in range(3):
        bands[..., c] = (37 * (yband + 2 * c) % 211 + 20).astype(np.uint8)
    bands[: h // 4, :, :3] += rng.integers(
        0, 6, (h // 4, w, 3)).astype(np.uint8)
    band4d, _, _ = layout.host_block_view(bands)

    photo = jax.device_put(photo4d)
    band = jax.device_put(band4d)
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    key = jax.random.PRNGKey(0)

    def enc(im, cf):
        return lambda: encode_image_merged_fused_device(
            im, cfg, key, 3, emit_planes=False, coalesce=True, cap_frac=cf,
        )["decoded_words"]

    fns = {
        "photo_cap8": enc(photo, 8),
        "photo_full": enc(photo, 1),
        "band_cap8": enc(band, 8),
        "band_full": enc(band, 1),
    }
    print("compiling 4 variants ...", flush=True)
    samples, rtt = time_device_fns(fns, rounds=8, inner=4)
    print(f"rtt {rtt * 1e3:.1f} ms")
    for name, vals in samples.items():
        v = np.asarray(vals)
        print(f"{name:12s} median {np.median(v) * 1e3:7.3f} ms  (rounds: "
              + " ".join(f"{x * 1e3:.2f}" for x in v) + ")")

    # quality: does full capacity change bpp/psnr on the banded content?
    for name, im, cf in (("band_cap8", band, 8), ("band_full", band, 1)):
        out = encode_image_merged_fused_device(
            im, cfg, key, 3, emit_planes=False, coalesce=True, cap_frac=cf)
        st = {k: int(np.asarray(v)) for k, v in out["coalesce_stats"].items()}
        print(f"{name}: mean_bpp {float(out['mean_bpp']):.4f} "
              f"n_runs {int(out['n_runs'])} stats {st}")


if __name__ == "__main__":
    main()
