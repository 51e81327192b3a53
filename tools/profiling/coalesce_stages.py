"""Sub-stage timings of the fused driver's coalesce pass (4K, 3 levels).

Stages (cumulative on top of the no-coalesce fused encode):
  c_runs      + build_runs at all levels (seg0/is_run0 construction)
  c_fit       + coalesce_segments up to fit_segments
  c_shifts    + find_shifts_segments
  c_full      the full coalesce (== full_coal1 - full_coal0 split)

Run: python tools/profiling/coalesce_stages.py
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
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)

from limg_tpu import EncodeConfig
from limg_tpu.ops import layout
from limg_tpu.regions import encode_image_merged_fused_device
from limg_tpu.utils.timing import time_device_fn
from tools.make_test_image import make_4k


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img = jax.device_put(layout.packed_words(np.concatenate([img_np, alpha], -1)))
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    key = jax.random.PRNGKey(0)
    res = {"device": str(jax.devices()[0])}

    import limg_tpu.regions as R

    # monkeypatched partial drivers: stop after each coalesce sub-stage by
    # swapping coalesce_segments with a cheap stub that still returns lv0
    orig_cs = R.coalesce_segments
    orig_br = R.build_runs

    def run(name, fn):
        t, _ = time_device_fn(fn, iters=10, inner=5)
        res[name + "_ms"] = round(t * 1e3, 2)
        print(name, res[name + "_ms"], flush=True)

    # fixed-grid anchor: contention varies 1-2.2x between sessions, so every
    # probe session reports the same-session fixed-grid time and comparisons
    # across sessions use the ratio to it (CLAUDE.md perf rules)
    import functools
    from limg_tpu.pallas_kernels.encode_fixed import encode_blocks_pallas

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def fixed_step(img, cfg, seed):
        packed, mask, _ = layout.blockify_packed(img)
        return encode_blocks_pallas(packed, mask, cfg, seed)[:3]

    seed0 = jnp.int32(0)  # hoisted: a fresh scalar per call adds an H2D put
    run("anchor_fixed", lambda: fixed_step(img, cfg, seed0))

    full = lambda c: encode_image_merged_fused_device(
        img, cfg, key, 3, emit_planes=False, coalesce=c
    )["decoded_words"]
    run("full_coal0", lambda: full(False))

    # build_runs only: stub coalesce_segments to pass-through
    def cs_stub(packed_blk, mask, seg_id, is_run, lv, cfg_, key_, pol, lam,
                **kw):
        nb = packed_blk.shape[-1]
        return (lv, is_run, seg_id, is_run.sum(),
                dict(dropped_runs_at_capacity=jnp.int32(0),
                     overflow_run_blocks=jnp.int32(0),
                     rejected_runs=jnp.int32(0)))

    R.coalesce_segments = cs_stub
    try:
        run("c_runs", lambda: full(True))
    finally:
        R.coalesce_segments = orig_cs
    encode_image_merged_fused_device.clear_cache()

    # fit only: stub find_shifts_segments to zeros via config crush "none"?
    # simpler: time coalesce_segments internals directly on representative
    # inputs captured from the real pass
    run("c_full", lambda: full(True))

    # planes emission on top (block rows + factors plane since round 3)
    run("full_planes", lambda: encode_image_merged_fused_device(
        img, cfg, key, 3, emit_planes=True, coalesce=True)["decoded_words"])

    # isolate segment fit + shifts on the real compacted geometry
    from limg_tpu.ops.segments import fit_segments, find_shifts_segments

    packed, mask, grid0 = layout.blockify_packed(jnp.asarray(img), 8)
    nb = grid0.num_blocks
    cap = max(256, nb // 4)
    cap -= cap % 256  # lane-tile aligned, like the kernel pad would make it
    # synthetic contiguous segments of len ~4
    seg = np.arange(cap) // 4 * 4
    seg_c = jnp.asarray(seg, jnp.int32)
    px_c = jnp.stack([(packed[:, :cap] >> (8 * c)) & 0xFF for c in range(cfg.channels)])
    mask_c = mask[:, :cap].astype(jnp.int32)

    @jax.jit
    def fit_only(px_c, mask_c, seg_c):
        return fit_segments(px_c, mask_c, seg_c, cap, cfg.channels, contiguous=True)[0]

    run("seg_fit", lambda: fit_only(px_c, mask_c, seg_c))

    @jax.jit
    def fit_shifts(px_c, mask_c, seg_c):
        from limg_tpu.ops.factors import extract_factors, quantize_factors
        d = fit_segments(px_c, mask_c, seg_c, cap, cfg.channels, contiguous=True)
        f8 = quantize_factors(*extract_factors(px_c, d, cfg.channels))
        s, _ = find_shifts_segments(px_c, mask_c, f8, d, seg_c, cap, cfg,
                                    contiguous=True)
        return s

    run("seg_fit_shifts", lambda: fit_shifts(px_c, mask_c, seg_c))

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
