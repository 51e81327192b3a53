"""Generate the README-style debug-plane example images (reference: the
assets/*.png dumps shown in the upstream README). Writes PNGs into assets/.

Usage: python tools/make_assets.py  (CPU-safe; uses the jnp backend)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from PIL import Image
    from limg_tpu import EncodeConfig
    from limg_tpu.regions import encode_image_merged
    from limg_tpu.cli import _hash_color
    from tools.make_test_image import make_4k

    os.makedirs("assets", exist_ok=True)
    img = make_4k(256, 384)
    img4 = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder")
    out = encode_image_merged(img4, cfg, use_pallas=False)

    Image.fromarray(img, "RGB").save("assets/source.png")
    Image.fromarray(out["decoded"], "RGBA").save("assets/decoded.png")
    for i, n in enumerate("abc"):
        Image.fromarray(out["factors"][..., i], "L").save(f"assets/fac_{n}.png")
    h, w = img.shape[:2]
    patt = np.array([0, 0x22, 0x44, 0x66, 0x88, 0xAA, 0xCC, 0xEE, 0xFF], np.uint8)
    sh = out["shift"].transpose(1, 2, 0)
    bits = np.zeros((h, w, 3), np.uint8)
    for i in range(3):
        bits[..., i] = patt[np.minimum(sh[..., i], 8)]
    Image.fromarray(bits, "RGB").save("assets/bits.png")

    ids = out["region_id"].astype(np.int64)
    uniq, inv = np.unique(ids, return_inverse=True)
    cols = np.array([_hash_color(int(u)) for u in uniq], np.uint64)
    rgba = cols[inv].reshape(h, w)
    blk = np.zeros((h, w, 3), np.uint8)
    blk[..., 0] = rgba & 0xFF
    blk[..., 1] = (rgba >> 8) & 0xFF
    blk[..., 2] = (rgba >> 16) & 0xFF
    Image.fromarray(blk, "RGB").save("assets/regions.png")
    Image.fromarray((out["bpp"] * 8).clip(0, 255).astype(np.uint8), "L").save(
        "assets/bpp.png"
    )
    print("wrote assets/: source, decoded, fac_a/b/c, bits, regions, bpp")
    print("psnr=%.2f bpp=%.3f" % (out["psnr"], out["mean_bpp"]))


if __name__ == "__main__":
    main()
