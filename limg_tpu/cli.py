"""CLI mirroring the reference harness (src/main.cpp:75-160).

Usage:
    python -m limg_tpu.cli <image> [--no-output] [--error-factor N]
                           [--accurate-bit-crushing] [--fixed-grid]
                           [--single-thread] [--count N]
                           [--write-ltp1 FILE]
    python -m limg_tpu.cli <stream.ltp1> --decode-ltp1
    python -m limg_tpu.cli -- [--count N] [--error-factor N] -- <files...>

Single-image mode runs the merged (blocked) encoder, prints timing/PSNR/bpp
stats in the reference's format, and writes the 12 debug TGA planes
(src/main.cpp:350-370) unless --no-output. List mode (`--`) runs the
throughput harness over files; `--count N` with one file gives the
statistical perf evaluation (src/main.cpp:268-324).

Flag mapping vs the reference:
- --error-factor N        same knob (default 100)
- --accurate-bit-crushing crush_mode="exhaustive" (vs default "ladder")
- --fast-coalesce         pin the latency-bounded run buffer (NB/8; may
                          truncate runs) instead of the auto default,
                          which sizes ONE coalesce pass to the measured
                          run count so no run is ever dropped
- --single-thread         accepted for parity; a no-op on TPU (parallelism
                          is the device, not a thread pool)
- --fixed-grid            use the no-merging encoder (limg_encode3d_test
                          analog) instead of the blocked/merged default
- --write-ltp1 FILE       additionally serialize the LTP1 bitstream (real
                          compressed file; beyond the reference, which has
                          no file format at all)
- --decode-ltp1           treat <source> as an LTP1 stream: decode to TGA
- --factors N             reduced-factor fast modes: encode with N of the
                          3 factor axes (1 = A only, 2 = A+B; default 3).
                          Dropped axes use the shift=8 encoding
                          (src/limg_bit_crush.h:118-138); BASELINE config 4
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _hash_color(v: int) -> int:
    """Block-index visualization hash (reference: src/main.cpp:47-55)."""
    state = (v * 6364136223846793005 + (v | 1)) & 0xFFFFFFFFFFFFFFFF
    xorshifted = (((state >> 18) ^ state) >> 27) & 0xFFFFFFFF
    rot = state >> 59
    return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF


def _parse_args(argv):
    opts = dict(
        write_output=True, error_factor=100, accurate=False, fixed_grid=False,
        count=1, files=[], source=None, list_mode=False, use_pallas=None,
        diagnose=False, merge_policy="match", num_factors=3,
        write_ltp1=None, decode_ltp1=None, cap_frac=0,
    )
    if not argv:
        print(__doc__)
        sys.exit(0)
    if argv[0] == "--decode-ltp1":
        # flag-first order: the stream path follows the flag
        if len(argv) < 2:
            print("--decode-ltp1 needs a stream path. Aborting.")
            sys.exit(1)
        opts["decode_ltp1"] = argv[1]
        opts["source"] = argv[1]
        return opts
    opts["source"] = argv[0]
    if argv[0] == "--":
        opts["list_mode"] = True
        opts["write_output"] = False
    i = 1
    while i < len(argv):
        a = argv[i]
        if a == "--no-output":
            opts["write_output"] = False
        elif a == "--accurate-bit-crushing":
            opts["accurate"] = True
        elif a == "--single-thread":
            pass  # parity no-op
        elif a == "--fixed-grid":
            opts["fixed_grid"] = True
        elif a == "--use-pallas":
            opts["use_pallas"] = True
        elif a == "--no-pallas":
            opts["use_pallas"] = False
        elif a == "--diagnose":
            opts["diagnose"] = True
        elif a == "--rd-merge":
            opts["merge_policy"] = "rd"
        elif a == "--fast-coalesce":
            # pin the latency-bounded run buffer (NB/8; may truncate);
            # default is auto capacity (no run ever dropped)
            opts["cap_frac"] = 8
        elif a == "--write-ltp1":
            i += 1
            opts["write_ltp1"] = argv[i]
        elif a == "--decode-ltp1":
            opts["decode_ltp1"] = opts["source"]
        elif a == "--error-factor":
            i += 1
            opts["error_factor"] = int(argv[i])
        elif a == "--factors":
            i += 1
            opts["num_factors"] = int(argv[i])
            if opts["num_factors"] not in (1, 2, 3):
                print("--factors must be 1, 2 or 3. Aborting.")
                sys.exit(1)
        elif a == "--count":
            i += 1
            opts["count"] = int(argv[i])
        elif a == "--":
            opts["files"] = argv[i + 1:]
            i = len(argv)
        else:
            print(f"Invalid Parameter: '{a}'. Aborting.")
            sys.exit(1)
        i += 1
    return opts


def _print_stats(out, channels):
    hist = out["bits_histogram"]
    total_px = hist[0].sum()
    per_axis = [(8 - np.arange(9)) @ hist[i] / total_px for i in range(3)]
    print(
        "\nAverage Block Bits: %5.3f (A: %5.3f | B: %5.3f | C: %5.3f)\n"
        % (sum(per_axis), *per_axis)
    )
    print("".join(" %d bit   " % (8 - i) for i in range(9)))
    for i in range(3):
        print("".join("%7.4f  " % (hist[i][j] * 100.0 / total_px) for j in range(9)))
    print()
    print("Compression Average: ~%7.4f bits per pixel\n" % out["mean_bpp"])


def main(argv=None):
    import jax
    from .config import EncodeConfig
    from .io import load_image, write_tga

    opts = _parse_args(argv if argv is not None else sys.argv[1:])
    crush_mode = "exhaustive" if opts["accurate"] else "ladder"

    if opts["decode_ltp1"]:
        # standalone decode of a serialized LTP1 stream -> TGA
        from .bitstream import deserialize

        with open(opts["decode_ltp1"], "rb") as f:
            dec, info = deserialize(f.read())
        print(f"{info['width']} x {info['height']} pixels, "
              f"{info['levels']} levels, errorFactor {info['error_factor']}, "
              f"real {info['real_bpp']:.3f} bits per pixel.")
        write_tga("limg_decoded.tga", dec)
        print("Wrote limg_decoded.tga.")
        return

    if opts["list_mode"]:
        _run_list_mode(opts, crush_mode)
        return

    from .encoder import encode_image
    from .regions import encode_image_merged

    image, has_alpha = load_image(opts["source"])
    h, w = image.shape[:2]
    print(f"{w} x {h} pixels.")
    cfg = EncodeConfig(
        error_factor=opts["error_factor"], has_alpha=has_alpha,
        crush_mode=crush_mode if opts["error_factor"] else "none",
        num_factors=opts["num_factors"],
    )

    ser_state = None
    before = time.perf_counter()
    if opts["fixed_grid"]:
        out = encode_image(image, cfg)
    elif opts["write_ltp1"] or opts["diagnose"]:
        # one encode serves the stats, the stream, and the diagnostics
        out, ser_state = encode_image_merged(
            image, cfg, use_pallas=opts["use_pallas"],
            merge_policy=opts["merge_policy"], return_state=True,
            cap_frac=opts["cap_frac"],
        )
    else:
        out = encode_image_merged(image, cfg, use_pallas=opts["use_pallas"],
                                  merge_policy=opts["merge_policy"],
                                  cap_frac=opts["cap_frac"])
    elapsed = time.perf_counter() - before

    print("limg_tpu encode completed.")
    print(f"Elapsed Time: {elapsed * 1e3:f} ms (incl. compile on first run)")
    print(f"Throughput: {w * h * 1e-6 / elapsed:f} Mpx/s")
    _print_stats(out, cfg.channels)
    mean = out["mse"]
    from .ops.error import max_possible_error

    mx = max_possible_error(cfg.channels)
    print(
        "\nImage Perceptual RGB(A) PSNR: %4.2f dB (mean: %5.3f => %7.5f%% | sqrt: %5.3f%%)\n"
        % (out["psnr"], mean, mean / mx * 100.0, np.sqrt(mean) / np.sqrt(mx) * 100.0)
    )

    if opts["diagnose"]:
        # culprit breakdown of the encode that ran
        # (reference debug builds, src/limg.cpp:2412-2428)
        from .utils.diagnostics import (
            crush_culprits, crush_culprits_merged, format_culprits,
        )

        if ser_state is not None:
            # region-granular culprits from the merged encode's own state
            culprits = crush_culprits_merged(image, ser_state, cfg)
            merge_stats = out.get("merge_stats")
        else:
            # fixed-grid: per-block culprits of the fixed-grid encode
            import jax.numpy as jnp
            from .ops import layout as _layout
            from .ops.fit import fit_blocks
            from .ops.factors import extract_factors, quantize_factors
            from .ops.crush import find_shifts

            px, mask, _ = _layout.blockify(jnp.asarray(image))
            d = fit_blocks(px, mask, cfg.channels)
            f8 = quantize_factors(*extract_factors(px, d, cfg.channels))
            shifts, _ = find_shifts(px, mask, f8, d, cfg)
            culprits = crush_culprits(px, mask, f8, d, shifts, cfg)
            merge_stats = None
        print(format_culprits(culprits, merge_stats,
                              out.get("coalesce_stats")))

    if opts["write_ltp1"]:
        from .bitstream import serialize, serialize_from_state

        if ser_state is not None:
            # the stream represents exactly the encode reported above
            blob = serialize_from_state(ser_state, cfg)
        else:
            blob = serialize(
                image, cfg, num_levels=1,
                use_pallas=opts["use_pallas"],
                merge_policy=opts["merge_policy"],
            )
        with open(opts["write_ltp1"], "wb") as f:
            f.write(blob)
        print(
            "Wrote %s: %d bytes = %.4f real bits per pixel (the reference "
            "has no bitstream; its number above is an estimate)."
            % (opts["write_ltp1"], len(blob), len(blob) * 8.0 / (w * h))
        )

    if opts["write_output"]:
        write_tga("limg_out.tga", out["decoded"])
        print("Wrote decoded file.")
        if opts["fixed_grid"]:
            write_tga("limg_fac_a.tga", out["factors_a"])
            write_tga("limg_fac_b.tga", out["factors_b"])
            write_tga("limg_fac_c.tga", out["factors_c"])
        else:
            write_tga("limg_fac_a.tga", out["factors"][..., 0])
            write_tga("limg_fac_b.tga", out["factors"][..., 1])
            write_tga("limg_fac_c.tga", out["factors"][..., 2])
        write_tga("limg_bpp.tga", out["bpp"].astype(np.uint8))
        if "endpoint_planes" in out:
            for name, plane in out["endpoint_planes"].items():
                write_tga(f"limg_{name}.tga", plane)
        elif "endpoint_rows" in out:
            # merged path: 6 endpoint-color planes from the owner-region
            # per-block rows (reference writes all 12 debug TGAs,
            # src/main.cpp:353-369; +0x80 bias on B/C as at limg.cpp:1609-17)
            ch = cfg.channels
            by, bx = -(-h // 8), -(-w // 8)
            names = ["col_a_min", "col_a_max", "col_b_min", "col_b_max",
                     "col_c_min", "col_c_max"]
            for j, name in enumerate(names):
                bias = 0 if j < 2 else 0x80
                v = np.clip(
                    out["endpoint_rows"][j * ch:(j + 1) * ch] + bias, 0, 255
                ).astype(np.uint8).reshape(ch, by, bx)
                px_plane = np.repeat(np.repeat(v, 8, axis=1), 8, axis=2)
                rgba = np.full((h, w, 4), 0xFF, np.uint8)
                rgba[..., :ch] = px_plane[:, :h, :w].transpose(1, 2, 0)
                write_tga(f"limg_{name}.tga", rgba)
        # shift plane as bit patterns (reference: src/limg.cpp:1596-1598)
        patt = np.array([0, 0x22, 0x44, 0x66, 0x88, 0xAA, 0xCC, 0xEE, 0xFF], np.uint8)
        sh = out["shift"]
        sh = sh.transpose(1, 2, 0) if sh.ndim == 3 and sh.shape[0] == 3 else sh
        bits_rgba = np.zeros((h, w, 4), np.uint8)
        bits_rgba[..., 0] = patt[np.minimum(sh[..., 0], 8)]
        bits_rgba[..., 1] = patt[np.minimum(sh[..., 1], 8)]
        bits_rgba[..., 2] = patt[np.minimum(sh[..., 2], 8)]
        bits_rgba[..., 3] = 0xFF
        write_tga("limg_bits.tga", bits_rgba)
        if "region_id" in out:
            ids = out["region_id"].astype(np.int64)
            hashed = np.zeros((h, w, 4), np.uint8)
            uniq, inv = np.unique(ids, return_inverse=True)
            cols = np.array([_hash_color(int(u)) | 0xFF000000 for u in uniq], np.uint64)
            rgba = cols[inv].reshape(h, w)
            hashed[..., 0] = rgba & 0xFF
            hashed[..., 1] = (rgba >> 8) & 0xFF
            hashed[..., 2] = (rgba >> 16) & 0xFF
            hashed[..., 3] = 0xFF
            write_tga("limg_block_idx.tga", hashed)


def _run_list_mode(opts, crush_mode):
    import jax
    import jax.numpy as jnp
    from .config import EncodeConfig
    from .encoder import encode_perf_step, encode_perf_step_pallas
    from .io import load_image
    from .utils.timing import time_device_fn

    use_pallas = opts["use_pallas"]
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    perf_step = encode_perf_step_pallas if use_pallas else encode_perf_step

    files = opts["files"]
    if not files:
        print("no files given after --")
        sys.exit(1)
    single_perf = len(files) == 1 and opts["count"] > 1

    total_px = 0
    total_s = 0.0
    for path in files:
        image, has_alpha = load_image(path)
        cfg = EncodeConfig(
            error_factor=opts["error_factor"], has_alpha=has_alpha,
            crush_mode=crush_mode, num_factors=opts["num_factors"],
        )
        img_d = jax.device_put(jnp.asarray(image))
        key = jax.random.PRNGKey(0)
        mpx = image.shape[0] * image.shape[1] * 1e-6
        if single_perf:
            # `count` timed samples as in the reference harness; each sample
            # batches `inner` dispatches so the fetch RTT amortizes away
            inner = 4
            per, det = time_device_fn(
                lambda: perf_step(img_d, cfg, key),
                iters=opts["count"] * inner, inner=inner,
            )
            # full statistical report in the reference's format
            # (src/main.cpp:310-323): mean (min - max | mean-/+sigma)
            mn, mx, sd = det["best_s"], det["worst_s"], det["std_s"]
            print(
                "Mean Elapsed Time: %8.4f ms (%8.4f - %8.4f ms | %8.4f - "
                "%8.4f ms std dev)"
                % (per * 1e3, mn * 1e3, mx * 1e3,
                   (per - sd) * 1e3, (per + sd) * 1e3)
            )
            print(
                "Throughput: %5.3f Mpx/s (%5.3f - %5.3f Mpx/s | %5.3f - "
                "%5.3f Mpx/s std dev)"
                % (mpx / per, mpx / mx, mpx / mn,
                   mpx / (per + sd), mpx / max(per - sd, 1e-9))
            )
        else:
            per, _ = time_device_fn(
                lambda: perf_step(img_d, cfg, key),
                iters=opts["count"] * 2, inner=2,
            )
            total_px += mpx * opts["count"]
            total_s += per * opts["count"]
    if not single_perf:
        print(
            "\rComplete.   \nProcessed %5.3f Mpx in %5.3f sec\nThroughput: %8.5f MPx/s\n"
            % (total_px, total_s, total_px / total_s)
        )


if __name__ == "__main__":
    main()
