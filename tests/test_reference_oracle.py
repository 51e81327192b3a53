"""Quality parity against the compiled CPU reference (the oracle).

Skipped unless the reference oracle binary has been built
(tools/build_reference.sh -> .refbuild/oracle). This is the end-to-end
fidelity gate from SURVEY.md section 4: same image, same error factor,
PSNR and factor-bits must land in the reference's band. A full 4K sweep
lives in PARITY_RESULTS.md.
"""

import os
import re
import subprocess

import numpy as np
import pytest

ORACLE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".refbuild", "oracle")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="reference oracle not built"
)


def _run_oracle(path, ef, fast):
    out = subprocess.run(
        [ORACLE, path, str(ef), "1" if fast else "0", "0"],
        capture_output=True, text=True, check=True,
    ).stdout
    psnr = float(re.search(r"ORACLE psnr=([\d.]+)", out).group(1))
    bits = float(re.search(r"Average Block Bits: *([\d.]+)", out).group(1))
    return psnr, bits


def test_fixed_grid_quality_band(tmp_path):
    from PIL import Image
    from tools.make_test_image import make_4k
    from limg_tpu import EncodeConfig, encode_image

    img = make_4k(192, 256)
    p = str(tmp_path / "img.png")
    Image.fromarray(img, "RGB").save(p)
    img4 = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])

    ref_fast = _run_oracle(p, 100, fast=True)
    ref_acc = _run_oracle(p, 100, fast=False)
    ours = encode_image(img4, EncodeConfig(error_factor=100, crush_mode="ladder"))

    # PSNR within 0.6 dB of the reference band, bits within 10% of the
    # accurate search
    lo = min(ref_fast[0], ref_acc[0]) - 0.6
    hi = max(ref_fast[0], ref_acc[0]) + 0.6
    assert lo < ours["psnr"] < hi, (ours["psnr"], ref_fast, ref_acc)
    assert ours["avg_block_bits"] < ref_acc[1] * 1.10, (
        ours["avg_block_bits"], ref_acc[1]
    )
