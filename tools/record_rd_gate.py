"""Record the CPU dense-jnp RD values the device gate case compares to.

tools/tpu_parity_gate.py's ``rd_fused_device`` case cannot compile the
dense RD graph on the tunneled device (its glue graph freezes the compile
helper), so it gates the fused RD driver against values recorded here on
CPU JAX (the CPU fused-rd path reproduces the dense path exactly; see
tests). Run on CPU and paste the printed pair into expected_rd:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/record_rd_gate.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from limg_tpu import EncodeConfig
    from limg_tpu.ops.error import max_possible_error
    from limg_tpu.regions import encode_image_merged_device

    rng8 = np.random.default_rng(53)
    h, w = 64, 96
    img = rng8.integers(0, 256, (h, w, 4)).astype(np.uint8)
    img[:24, :, :3] = [40, 90, 200]
    img[40:, 48:, :3] = [210, 60, 120]
    img[..., 3] = 255
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder", dithering=False)
    out = encode_image_merged_device(
        jnp.asarray(img), cfg, jax.random.PRNGKey(0), 3, use_pallas=False,
        emit_planes=False, merge_policy="rd", rd_lambda=0.01)
    mse = float(out["total_err"]) / (h * w)
    psnr = 10.0 * np.log10(max_possible_error(3) / max(mse, 1e-12))
    print("expected_rd = (%.3f, %.3f)" % (psnr, float(out["mean_bpp"])))


if __name__ == "__main__":
    main()
