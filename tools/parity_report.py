"""Quality-parity sweep: limg-tpu vs the compiled CPU reference oracle.

Runs both encoders across error factors on the synthetic 4K baseline image
and prints a markdown table of PSNR / avg factor bits. Requires the
reference oracle (tools/build_reference.sh) and the TPU (or CPU JAX).

Usage: python tools/parity_report.py [--small] [--out PARITY_RESULTS.md]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_reference(image_path: str, error_factor: int, fast: bool):
    out = subprocess.run(
        [".refbuild/oracle", image_path, str(error_factor), "1" if fast else "0", "0"],
        capture_output=True, text=True, check=True,
    ).stdout
    psnr = float(re.search(r"ORACLE psnr=([\d.]+)", out).group(1))
    bits = re.search(r"Average Block Bits: *([\d.]+)", out)
    return psnr, float(bits.group(1)) if bits else float("nan")


def main():
    small = "--small" in sys.argv
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from PIL import Image
    from tools.make_test_image import make_4k

    img = make_4k(432, 768) if small else make_4k()
    Image.fromarray(img, "RGB").save("/tmp/parity_img.png")
    img4 = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])

    import jax
    import jax.numpy as jnp
    from limg_tpu import EncodeConfig
    from limg_tpu.ops import layout
    from limg_tpu.ops.error import weighted_error, max_possible_error
    from limg_tpu.pallas_kernels.encode_fixed import (
        encode_blocks_pallas, pack_channels, unpack_plane,
    )

    px, mask, grid = layout.blockify(jnp.asarray(img4))
    packed = jax.device_put(pack_channels(px))
    mask_d = jax.device_put(mask)
    count = np.asarray(mask).sum(0)
    n = img.shape[0] * img.shape[1]

    def ours(cfg):
        # thresholds are traced: every error factor reuses one kernel compile
        shifts, qp, decp = encode_blocks_pallas(packed, mask_d, cfg, jnp.int32(0))
        dec = jnp.stack([unpack_plane(decp, c) for c in range(3)])
        src = jnp.stack([unpack_plane(packed, c) for c in range(3)])
        err = (weighted_error(dec, src) * mask_d.astype(jnp.int32)).astype(jnp.float32).sum()
        psnr = 10.0 * np.log10(max_possible_error(3) / (float(err) / n))
        s = np.minimum(np.asarray(shifts), 8)
        bits = ((8 - s) * count[None]).sum() / n
        return psnr, bits

    rows = []
    for ef in (50, 100, 200, 400):
        ref_psnr, ref_bits = run_reference("/tmp/parity_img.png", ef, fast=True)
        ref_psnr_acc, ref_bits_acc = run_reference("/tmp/parity_img.png", ef, fast=False)
        row = dict(
            ef=ef,
            ref_fast=(ref_psnr, ref_bits),
            ref_acc=(ref_psnr_acc, ref_bits_acc),
            ladder=ours(EncodeConfig(error_factor=ef, crush_mode="ladder")),
            exhaustive=None,
        )
        rows.append(row)
        print(row, flush=True)

    lines = [
        "# PARITY_RESULTS — fixed-grid quality sweep vs CPU reference",
        "",
        f"Image: synthetic {'432x768' if small else '3840x2160'} RGB "
        "(tools/make_test_image.py, seed 42). PSNR in dB, bits = average "
        "factor bits per pixel (header excluded on both sides).",
        "",
        "| errorFactor | ref fast PSNR/bits | ref accurate PSNR/bits | "
        "limg-tpu ladder PSNR/bits | limg-tpu exhaustive PSNR/bits |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        ex = "%.2f / %.3f" % r["exhaustive"] if r["exhaustive"] else "-"
        lines.append(
            "| %d | %.2f / %.3f | %.2f / %.3f | %.2f / %.3f | %s |"
            % (r["ef"], *r["ref_fast"], *r["ref_acc"], *r["ladder"], ex)
        )
    report = "\n".join(lines) + "\n"
    print(report)
    if out_path:
        with open(out_path, "w") as f:
            f.write(report)


if __name__ == "__main__":
    main()
