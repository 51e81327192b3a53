"""Quality-parity sweep: limg-tpu vs the compiled CPU reference oracle.

Two tables:
1. error-factor sweep on the synthetic 4K baseline (fixed grid,
   ladder + exhaustive vs the reference's fast + accurate crush);
2. content-family matrix at errorFactor=100: 3 families x {RGB, RGBA} x
   {fixed, merged} vs the reference oracle (fixed) and reference CLI
   (blocked/merged path).

Requires the reference oracle + CLI (tools/build_reference.sh) and the TPU
(or CPU JAX). Usage:
  python tools/parity_report.py [--small] [--families-only|--sweep-only]
                                [--out PARITY_RESULTS.md]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_oracle(image_path: str, error_factor: int, fast: bool):
    """Reference fixed-grid encode (limg_encode3d_test)."""
    out = subprocess.run(
        [".refbuild/oracle", image_path, str(error_factor), "1" if fast else "0", "1"],
        capture_output=True, text=True, check=True,
    ).stdout
    psnr = float(re.search(r"ORACLE psnr=([\d.]+)", out).group(1))
    bits = re.search(r"Average Block Bits: *([\d.]+)", out)
    return psnr, float(bits.group(1)) if bits else float("nan")


def run_reference_blocked(image_path: str, error_factor: int,
                          accurate: bool = False):
    """Reference blocked/merging CLI (limg_blocked_encode3d_test);
    ``accurate`` adds --accurate-bit-crushing (src/main.cpp:77)."""
    args = [".refbuild/limg", image_path, "--no-output",
            "--error-factor", str(error_factor)]
    if accurate:
        args.append("--accurate-bit-crushing")
    out = subprocess.run(
        args, capture_output=True, text=True, check=True,
    ).stdout
    psnr = float(re.search(r"PSNR: ([\d.]+) dB", out).group(1))
    bpp = float(re.search(r"Compression Average: ~ *([\d.]+) bits", out).group(1))
    return psnr, bpp


def main():
    small = "--small" in sys.argv
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    rd_only = "--rd-only" in sys.argv
    do_sweep = "--families-only" not in sys.argv and not rd_only
    do_families = "--sweep-only" not in sys.argv and not rd_only
    do_rd = (do_families or rd_only) and "--no-rd" not in sys.argv

    from PIL import Image
    from tools.make_test_image import make_4k, make_family

    import jax
    import jax.numpy as jnp
    from limg_tpu import EncodeConfig
    from limg_tpu.ops import layout
    from limg_tpu.ops.error import weighted_error, max_possible_error
    from limg_tpu.pallas_kernels.encode_fixed import (
        encode_blocks_pallas, pack_channels, unpack_plane,
    )
    from limg_tpu.regions import encode_image_merged

    def ours_fixed(img4, cfg):
        ch = cfg.channels
        px, mask, grid = layout.blockify(jnp.asarray(img4))
        packed = jax.device_put(pack_channels(px))
        mask_d = jax.device_put(mask)
        count = np.asarray(mask).sum(0)
        n = img4.shape[0] * img4.shape[1]
        shifts, qp, decp = encode_blocks_pallas(packed, mask_d, cfg, jnp.int32(0))[:3]
        dec = jnp.stack([unpack_plane(decp, c) for c in range(ch)])
        src = jnp.stack([unpack_plane(packed, c) for c in range(ch)])
        err = (weighted_error(dec, src) * mask_d.astype(jnp.int32)).astype(jnp.float32).sum()
        psnr = 10.0 * np.log10(max_possible_error(ch) / (float(err) / n))
        s = np.minimum(np.asarray(shifts), 8)
        bits = ((8 - s) * count[None]).sum() / n
        return psnr, bits

    def ours_merged(img4, cfg):
        out = encode_image_merged(img4, cfg, fetch_planes=False)
        return out["psnr"], out["mean_bpp"]

    lines = []
    if do_sweep:
        img = make_4k(432, 768) if small else make_4k()
        Image.fromarray(img, "RGB").save("/tmp/parity_img.png")
        img4 = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])

        rows = []
        for ef in (50, 100, 200, 400):
            row = dict(
                ef=ef,
                ref_fast=run_oracle("/tmp/parity_img.png", ef, fast=True),
                ref_acc=run_oracle("/tmp/parity_img.png", ef, fast=False),
                ladder=ours_fixed(img4, EncodeConfig(error_factor=ef, crush_mode="ladder")),
                exhaustive=ours_fixed(img4, EncodeConfig(error_factor=ef, crush_mode="exhaustive")),
            )
            rows.append(row)
            print(row, flush=True)

        lines += [
            "# PARITY_RESULTS — quality sweeps vs the compiled CPU reference",
            "",
            f"## Fixed-grid error-factor sweep (synthetic "
            f"{'432x768' if small else '3840x2160'} RGB, seed 42)",
            "",
            "PSNR in dB, bits = average factor bits per pixel (header "
            "excluded on both sides).",
            "",
            "| errorFactor | ref fast PSNR/bits | ref accurate PSNR/bits | "
            "limg-tpu ladder PSNR/bits | limg-tpu exhaustive PSNR/bits |",
            "|---|---|---|---|---|",
        ]
        for r in rows:
            lines.append(
                "| %d | %.2f / %.3f | %.2f / %.3f | %.2f / %.3f | %.2f / %.3f |"
                % (r["ef"], *r["ref_fast"], *r["ref_acc"], *r["ladder"],
                   *r["exhaustive"])
            )
        lines.append("")

    if do_families:
        hh, ww = (216, 384) if small else (1080, 1920)
        lines += [
            "## Content-family matrix at errorFactor=100 "
            f"({hh}x{ww}; families in tools/make_test_image.py)",
            "",
            "Fixed columns compare PSNR dB / avg factor bits; merged columns "
            "compare PSNR dB / estimated total bpp (both sides amortize the "
            "per-region header over merged regions). The `ref accurate` "
            "column is the oracle's exhaustive search (--accurate-bit-"
            "crushing): our exhaustive matches it bit-exactly (sweep table "
            "above), and ladder must track it within 0.3 dB per family -- "
            "divergence from ref *fast* is the reference's early-exit search "
            "under-crushing, not a quality gap.",
            "",
            "RGBA reference-defect repro: save any RGBA image of these "
            "families (the generator above) and run the unmodified compiled "
            "reference, `.refbuild/oracle <rgba.png> 100 1 1` (hasAlpha=1, "
            "fast) or `... 0 1` (accurate) -- its own 4-channel path scores "
            "15-28 dB on content its 3-channel path holds at 36-45 dB, so "
            "the low RGBA rows are a reference-side defect, not ours.",
            "",
            "| family | alpha | ref fixed fast | ref fixed accurate | "
            "limg-tpu fixed ladder | limg-tpu fixed exhaustive | "
            "ref blocked | ref blocked accurate | limg-tpu merged |",
            "|---|---|---|---|---|---|---|---|---|",
        ]
        real_path = "/root/reference/assets/original.png"
        families = ["photo", "smooth", "graphics", "unaligned"]
        if os.path.exists(real_path):
            families.append("real-photo")  # the reference README's own image
        for fam in families:
            if fam == "real-photo":
                base = np.asarray(Image.open(real_path).convert("RGB"))
            else:
                base = make_family(fam, hh, ww)
            fh, fw = base.shape[:2]
            for alpha in (False, True):
                if alpha:
                    y, x = np.mgrid[0:fh, 0:fw].astype(np.float32)
                    a = np.clip(170 + 80 * np.sin(x / 200), 0, 255).astype(np.uint8)
                    img4 = np.dstack([base, a])
                    Image.fromarray(img4, "RGBA").save("/tmp/parity_fam.png")
                else:
                    img4 = np.dstack([base, np.full((fh, fw), 255, np.uint8)])
                    Image.fromarray(base, "RGB").save("/tmp/parity_fam.png")
                cfg = EncodeConfig(error_factor=100, has_alpha=alpha)
                cfg_x = EncodeConfig(error_factor=100, has_alpha=alpha,
                                     crush_mode="exhaustive")
                rf = run_oracle("/tmp/parity_fam.png", 100, fast=True)
                ra = run_oracle("/tmp/parity_fam.png", 100, fast=False)
                of = ours_fixed(img4, cfg)
                ox = ours_fixed(img4, cfg_x)
                rb = run_reference_blocked("/tmp/parity_fam.png", 100)
                rba = run_reference_blocked("/tmp/parity_fam.png", 100,
                                            accurate=True)
                om = ours_merged(img4, cfg)
                line = (
                    "| %s | %s | %.2f / %.3f | %.2f / %.3f | %.2f / %.3f | "
                    "%.2f / %.3f | %.2f / %.3f | %.2f / %.3f | %.2f / %.3f |"
                    % (fam, "RGBA" if alpha else "RGB",
                       *rf, *ra, *of, *ox, *rb, *rba, *om)
                )
                lines.append(line)
                print(line, flush=True)
        lines.append("")

    if do_rd:
        # RD frontier: the merged encoder's rd policy at several lambdas vs
        # the reference blocked encoder (fast + accurate crush) per family.
        # Frontier domination = for each reference point some lambda gives
        # BOTH higher PSNR and lower bpp (or equal on one axis).
        hh, ww = (216, 384) if small else (1080, 1920)
        lines += [
            "## RD frontier at errorFactor=100: merged rd policy vs the "
            "reference blocked encoder",
            "",
            "PSNR dB / total bpp. The rd policy cuts the quadtree with "
            "bits + lambda*err against the REAL LTP1 header cost "
            "(regions.py rd_merge_keep); match = the reference-analog "
            "similarity policy (the default).",
            "",
            "| family | ref blocked fast | ref blocked accurate | "
            "match | rd l=0.003 | rd l=0.01 | rd l=0.03 | rd l=0.1 | "
            "rd l=0.3 |",
            "|---|---|---|---|---|---|---|---|---|",
        ]
        from limg_tpu.bitstream import region_header_bits

        for fam in ["photo", "smooth", "graphics", "unaligned"]:
            base = make_family(fam, hh, ww)
            fh, fw = base.shape[:2]
            img4 = np.dstack([base, np.full((fh, fw), 255, np.uint8)])
            Image.fromarray(base, "RGB").save("/tmp/parity_fam.png")
            cfg = EncodeConfig(error_factor=100)
            rb = run_reference_blocked("/tmp/parity_fam.png", 100)
            rba = run_reference_blocked("/tmp/parity_fam.png", 100,
                                        accurate=True)
            pts = [ours_merged(img4, cfg)]
            for lam in (0.003, 0.01, 0.03, 0.1, 0.3):
                out = encode_image_merged(
                    img4, cfg, fetch_planes=False, merge_policy="rd",
                    rd_lambda=lam,
                    rd_header_bits=region_header_bits(cfg.channels))
                pts.append((out["psnr"], out["mean_bpp"]))
            line = ("| %s | %.2f / %.3f | %.2f / %.3f | " % (fam, *rb, *rba)
                    + " | ".join("%.2f / %.3f" % p for p in pts) + " |")
            lines.append(line)
            print(line, flush=True)
        lines.append("")

    report = "\n".join(lines) + "\n"
    print(report)
    if out_path:
        with open(out_path, "w") as f:
            f.write(report)


if __name__ == "__main__":
    main()
