"""Benchmark: 4K RGBA fixed-grid encode throughput on one TPU chip.

Mirrors the reference's statistical perf harness (src/main.cpp:268-324):
one dry run (compile), N timed runs, mean/min/max Mpx/s -- on the same
synthetic 4K image used for the CPU baselines in BASELINE_MEASURED.md.

Prints ONE JSON line:
  {"metric": ..., "value": Mpx/s, "unit": "Mpx/s", "vs_baseline": ratio}

vs_baseline denominator: the reference fixed-grid encoder measured on this
machine's single CPU core (6.825 Mpx/s, BASELINE_MEASURED.md) scaled by 16
to estimate the north star's "multithreaded AVX CPU" (~109.2 Mpx/s).
"""

import json
import time

import numpy as np

CPU_SINGLE_CORE_MPXS = 6.825       # measured, BASELINE_MEASURED.md
EST_MULTICORE_SCALE = 16.0         # estimated 16-core workstation
BASELINE_MPXS = CPU_SINGLE_CORE_MPXS * EST_MULTICORE_SCALE


def main():
    import jax
    from limg_tpu import EncodeConfig
    from limg_tpu.encoder import encode_perf_step
    from tools.make_test_image import make_4k

    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img = jax.device_put(np.concatenate([img_np, alpha], axis=-1))
    cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
    key = jax.random.PRNGKey(0)

    # Dry run (compile)
    out = encode_perf_step(img, cfg, key)
    jax.block_until_ready(out)

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = encode_perf_step(img, cfg, key)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    mpx = h * w * 1e-6
    mean_s = float(np.mean(times))
    value = mpx / mean_s
    print(json.dumps({
        "metric": "4K RGB fixed-grid encode throughput (errorFactor=100, ladder crush)",
        "value": round(value, 3),
        "unit": "Mpx/s",
        "vs_baseline": round(value / BASELINE_MPXS, 3),
        "details": {
            "mean_ms": round(mean_s * 1e3, 3),
            "min_ms": round(min(times) * 1e3, 3),
            "max_ms": round(max(times) * 1e3, 3),
            "baseline_mpxs_est_16core": BASELINE_MPXS,
            "baseline_mpxs_measured_1core": CPU_SINGLE_CORE_MPXS,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
