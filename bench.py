"""Benchmark: 4K RGBA fixed-grid encode throughput on one TPU chip.

Mirrors the reference's statistical perf harness (src/main.cpp:268-324):
compile (dry run), N timed dispatches, mean Mpx/s -- on the same synthetic
4K image used for the CPU baselines in BASELINE_MEASURED.md. Uses the fused
Pallas encode kernel (limg_tpu/pallas_kernels/encode_fixed.py) and
sync-by-fetch timing (limg_tpu/utils/timing.py): on the tunneled TPU,
block_until_ready can return early, so only a host fetch is a trustworthy
synchronization point.

Prints ONE JSON line:
  {"metric": ..., "value": Mpx/s, "unit": "Mpx/s", "vs_baseline": ratio}

vs_baseline denominator: the reference fixed-grid encoder measured on this
machine's single CPU core (6.825 Mpx/s, BASELINE_MEASURED.md) scaled by 16
to estimate the north star's "multithreaded AVX CPU" (~109.2 Mpx/s).
"""

import json

import numpy as np

CPU_SINGLE_CORE_MPXS = 6.825       # measured, BASELINE_MEASURED.md
EST_MULTICORE_SCALE = 16.0         # estimated 16-core workstation
BASELINE_MPXS = CPU_SINGLE_CORE_MPXS * EST_MULTICORE_SCALE


def main():
    import os

    # the xplane device-busy details need the pure-python protobuf parser;
    # must be set before protobuf first loads
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    import jax

    if os.environ.get("LIMG_TPU_NO_COMPILE_CACHE"):
        pass  # tunnel outage mode: stale cached executables can hang on load
    elif not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"),
        )
    import functools
    import jax.numpy as jnp
    from limg_tpu import EncodeConfig
    from limg_tpu.ops import layout
    from limg_tpu.pallas_kernels.encode_fixed import encode_blocks_pallas, pack_channels
    from limg_tpu.utils.timing import time_device_fn, time_device_fns
    from tools.make_test_image import make_4k

    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    # RGBA bytes reinterpreted host-side as the free (by, 8, bx, 8) int32
    # word view (same row-major bytes as the image; layout.host_block_view);
    # the timed step still includes the blockify relayout on device -- the
    # 4-D view only skips XLA's (H, W) -> 4-D T(8,128) retile pass, which
    # moves no bytes logically
    img4d, _, _ = layout.host_block_view(
        np.concatenate([img_np, alpha], axis=-1))
    img = jax.device_put(img4d)
    # the RGBA lane (north star: "4K RGBA photos", BASELINE.md) carries a
    # structured alpha plane so the 4th-channel fit/crush does real work
    alpha_g = (255 - (np.arange(h, dtype=np.int32)[:, None] * 96 // h)
               - (np.arange(w, dtype=np.int32)[None, :] * 32 // w)
               ).astype(np.uint8)[..., None]
    img4d_a, _, _ = layout.host_block_view(
        np.concatenate([img_np, alpha_g], axis=-1))
    img_a = jax.device_put(img4d_a)
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    cfg_a = EncodeConfig(error_factor=100, has_alpha=True, crush_mode="ladder")
    seed = jnp.int32(0)

    # the timed step starts from the device-resident image tensor and
    # includes the blockify/pack relayout (H2D upload is excluded: on
    # this tunneled dev setup it measures the network, not the chip)
    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step(img, cfg, seed):
        packed, mask, _ = layout.blockify_packed(img)
        return encode_blocks_pallas(packed, mask, cfg, seed)[:3]

    fixed_fn = lambda: step(img, cfg, seed)
    rgba_fn = lambda: step(img_a, cfg_a, seed)

    # secondary metric: the merged (blocked-path analog) encoder via the
    # fused Morton pipeline, reference baseline 0.662 Mpx/s single-core
    # blocked (BASELINE_MEASURED.md) -> ~10.6 Mpx/s est. 16-core.
    # Fixed and merged are timed INTERLEAVED (time_device_fns) so both see
    # the same shared-pool contention: the pool varies 1-2.2x run to run,
    # which makes merged_vs_fixed_ratio the contention-invariant number to
    # compare across rounds, while absolute ms swing with pool load.
    ok = True
    try:
        from limg_tpu.regions import (
            auto_run_capacity, encode_image_merged_fused_device,
            fused_merged_pre, fused_merged_finish,
        )
        from limg_tpu.utils.timing import device_busy_ms

        key = jax.random.PRNGKey(0)
        nb = layout.grid_for(h, w, 8).num_blocks
        fm = lambda: encode_image_merged_fused_device(
            img, cfg, key, 3, emit_planes=False, coalesce=True
        )["decoded_words"]
        fm_full = lambda: encode_image_merged_fused_device(
            img, cfg, key, 3, emit_planes=False, coalesce=True, cap_frac=1
        )["decoded_words"]

        # the API DEFAULT (cap_frac=0 auto): ONE pre pass (fit/match/crush/
        # run building), a host read of the run count, ONE coalesce pass at
        # the bucketed capacity that holds every run block. This lane pays
        # an extra dispatch round-trip mid-encode (the capacity decision),
        # which pipelined single-graph lanes don't -- the device_busy
        # details below are the contention/dispatch-free comparison.
        def fm_auto():
            state = fused_merged_pre(img, cfg, key, 3, need_q=False,
                                     hw=(h, w), fused_layout="morton")
            cap = auto_run_capacity(
                int(np.asarray(state["n_run_blocks"])), nb)
            return fused_merged_finish(state, cfg, key, 3, False, False,
                                       (h, w), "morton", cap)["decoded_words"]

        # flagship merged encoder on the RGBA 4K (4ch fit/match/crush)
        fm_rgba = lambda: encode_image_merged_fused_device(
            img_a, cfg_a, key, 3, emit_planes=False, coalesce=True
        )["decoded_words"]

        st_probe = fused_merged_pre(img, cfg, key, 3, need_q=False,
                                    hw=(h, w), fused_layout="morton")
        n_run = int(np.asarray(st_probe["n_run_blocks"]))
        auto_cap = auto_run_capacity(n_run, nb)

        samples, rtt = time_device_fns(
            {"fixed": fixed_fn, "rgba": rgba_fn, "merged": fm,
             "merged_full": fm_full, "merged_auto": fm_auto,
             "merged_rgba": fm_rgba},
            rounds=10, inner=4,
        )
        sf = np.asarray(samples["fixed"])
        sa = np.asarray(samples["rgba"])
        sm = np.asarray(samples["merged"])
        smf = np.asarray(samples["merged_full"])
        sau = np.asarray(samples["merged_auto"])
        smr = np.asarray(samples["merged_rgba"])
        per_call = float(np.median(sf))
        det = {
            "rtt_s": rtt,
            "best_s": float(sf.min()),
            "worst_s": float(sf.max()),
            "std_s": float(sf.std(ddof=1)),
        }
        t_m = float(np.median(sm))
        t_a = float(np.median(sa))
        t_mf = float(np.median(smf))
        t_auto = float(np.median(sau))
        t_mr = float(np.median(smr))
        # contention-free cross-round ground truth (xplane device-busy; the
        # wall numbers above swing 1-2.2x with shared-pool load)
        busy = {}
        for name, fn in (("fixed", fixed_fn), ("merged", fm),
                         ("merged_auto", fm_auto), ("rgba", rgba_fn),
                         ("merged_rgba", fm_rgba)):
            b = device_busy_ms(fn, iters=3)
            if b is not None:
                busy[name + "_device_busy_ms"] = round(b, 3)
        merged_det = {
            # 4-channel fixed-grid lane (has_alpha=True: 4ch weighted error,
            # third-residual sweep in fit); same 4K with a gradient alpha
            "rgba_ms_per_image": round(t_a * 1e3, 3),
            "rgba_mpxs": round(h * w * 1e-6 / t_a, 1),
            # the DEFAULT merged path (cap_frac=0 auto-capacity, split
            # pre/finish): one coalesce pass sized from the measured run
            # count -- no retry, no dropped runs (this 4K needs the full
            # bucket: n_run_blocks below)
            "merged_full_ms_per_image": round(t_mf * 1e3, 3),
            "merged_auto_ms_per_image": round(t_auto * 1e3, 3),
            # the auto lane's wall time pays ONE un-pipelined device fetch
            # mid-encode (the capacity read) that single-graph lanes don't;
            # on this tunneled dev setup that is a full ~27 ms network RTT,
            # on production PCIe it is microseconds. The rtt-subtracted
            # wall and the device_busy detail are the hardware-honest
            # numbers (they agree).
            "merged_auto_ms_minus_rtt": round((t_auto - rtt) * 1e3, 3),
            "merged_auto_mpxs": round(h * w * 1e-6 / t_auto, 1),
            "merged_auto_cap": auto_cap,
            "merged_auto_n_run_blocks": n_run,
            "merged_rgba_ms_per_image": round(t_mr * 1e3, 3),
            "merged_rgba_mpxs": round(h * w * 1e-6 / t_mr, 1),
            "merged_ms_per_image": round(t_m * 1e3, 3),
            "merged_mpxs": round(h * w * 1e-6 / t_m, 1),
            "merged_vs_blocked_16core_est": round(
                h * w * 1e-6 / t_m / (0.662 * 16.0), 1
            ),
            # both paths in one round share one contention level. Measured
            # (STATUS.md item 11): pool contention adds ~the same ABSOLUTE
            # delay to both paths, so merged_minus_fixed_ms is the
            # contention-invariant number to compare across rounds (the
            # ratio deflates under load as both terms inflate); r2's
            # equivalents: diff 20.4 ms, clean ratio 4.41
            "merged_vs_fixed_ratio": round(float(np.median(sm / sf)), 3),
            "merged_minus_fixed_ms": round(
                float(np.median(sm - sf)) * 1e3, 3
            ),
            **busy,
        }
    except Exception as e:
        # a broken merged path must not look green: flag the whole run
        ok = False
        per_call, det = time_device_fn(fixed_fn, iters=50, inner=5)
        merged_det = {"merged_error": repr(e)[:200]}

    # the development TPU is a shared tunneled pool with 2-4x run-to-run
    # contention noise; the headline is the median, best-of-batches is in
    # details (the reference harness reports min/max, src/main.cpp:310-323)
    mpx = h * w * 1e-6
    value = mpx / per_call
    print(json.dumps({
        "metric": "4K RGB fixed-grid encode throughput (errorFactor=100, ladder crush, incl. blockify)",
        "value": round(value, 3),
        "unit": "Mpx/s",
        # a failed secondary (merged) measurement zeroes the comparison so
        # the driver artifact cannot look green on the headline alone
        "vs_baseline": round(value / BASELINE_MPXS, 3) if ok else 0.0,
        "ok": ok,
        "details": {
            "median_ms_per_image": round(per_call * 1e3, 3),
            "best_ms_per_image": round(det["best_s"] * 1e3, 3),
            "best_mpxs": round(mpx / det["best_s"], 3),
            "device_fetch_rtt_ms": round(det["rtt_s"] * 1e3, 2),
            "baseline_mpxs_est_16core": BASELINE_MPXS,
            "baseline_mpxs_measured_1core": CPU_SINGLE_CORE_MPXS,
            "device": str(jax.devices()[0]),
            **merged_det,
        },
    }))


if __name__ == "__main__":
    main()
