"""Why does owner_crush_pallas cost ~1.7x the WHOLE mono fixed kernel?

Times, interleaved on one 4K block set:
  mono       encode_blocks_pallas (fit + crush + dither + decode)
  fit3       fit_levels_pallas(levels=3, emit_match)
  ocrush     owner_crush_pallas(levels=3)  [the suspect]
  ocrush_l1  owner_crush_pallas(levels=1)  [no owner butterflies/selects]
  ocrush_q   owner_crush_pallas(levels=3, emit_q=True)

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/profiling/owner_crush_micro.py
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
    from limg_tpu.pallas_kernels import encode_merged as em
    from limg_tpu.pallas_kernels.encode_fixed import (
        KernelSpec, encode_blocks_pallas,
    )
    from limg_tpu.utils.timing import time_device_fns
    from tools.make_test_image import make_4k

    img_np = make_4k()
    h, w = img_np.shape[:2]
    levels = 3
    alpha = np.full((h, w, 1), 255, np.uint8)
    img4d, _, _ = layout.host_block_view(
        np.concatenate([img_np, alpha], axis=-1))
    img = jax.device_put(img4d)
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    kspec = KernelSpec.from_config(cfg)
    params = jnp.asarray([0, cfg.max_pixel_bit_crush_error,
                          cfg.max_block_bit_crush_error], jnp.int32)

    packed_m = jax.jit(
        lambda x: em.morton_blockify_packed(x, h, w, levels))(img)
    packed_m = jax.block_until_ready(packed_m)
    mask_plain = jnp.ones(packed_m.shape, jnp.int32)

    fit = lambda: em.fit_levels_pallas(
        packed_m, params, kspec, levels, False, hw=(h, w), emit_match=True)
    outs = fit()
    cnt0, f8_sel, eps_sel, avg_sel, owner_row, stats, reasons = outs
    f8_sel = jax.block_until_ready(f8_sel)

    fns = {
        "mono": lambda: encode_blocks_pallas(
            packed_m, mask_plain, cfg, jnp.int32(0))[2],
        "fit3": lambda: fit()[1],
        "ocrush": lambda: em.owner_crush_pallas(
            packed_m, owner_row, f8_sel, eps_sel, params, kspec, levels,
            False, hw=(h, w), emit_q=False)[2],
        "ocrush_l1": lambda: em.owner_crush_pallas(
            packed_m, jnp.zeros_like(owner_row), f8_sel, eps_sel, params,
            kspec, 1, False, hw=(h, w), emit_q=False)[2],
        "ocrush_q": lambda: em.owner_crush_pallas(
            packed_m, owner_row, f8_sel, eps_sel, params, kspec, levels,
            False, hw=(h, w), emit_q=True)[2],
    }
    print("compiling 5 variants ...", flush=True)
    samples, rtt = time_device_fns(fns, rounds=8, inner=4)
    print(f"rtt {rtt * 1e3:.1f} ms")
    for name, vals in samples.items():
        v = np.asarray(vals)
        print(f"{name:10s} median {np.median(v) * 1e3:7.3f} ms  (rounds: "
              + " ".join(f"{x * 1e3:.2f}" for x in v) + ")")


if __name__ == "__main__":
    main()
