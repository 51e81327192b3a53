"""TPU-COMPILED kernel parity gate.

All regular Pallas tests run in interpret mode on the CPU mesh; Mosaic
compilation can in principle drift from the interpreter. This script runs on
the REAL device and asserts the compiled fused kernel is bit-identical to
the jnp path on shifts / endpoints / crushed factors / decode for every
crush mode and region size P in {64, 256, 1024, 4096} (8/16/32/64 px
squares), RGB and RGBA. Dither is off: its PRNGs differ by design
(statistical parity), while everything the project's bit-parity invariant
covers is checked exactly.

Run (serialized TPU access): python tools/tpu_parity_gate.py
Prints one JSON line; exit code 1 on any mismatch. The pytest wrapper is
tests/test_tpu_parity.py (-m tpu; auto-skipped off-device).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_gate(modes=("ladder", "exhaustive", "guess"), sizes=(8, 16, 32, 64)):
    import numpy as np
    import jax
    import jax.numpy as jnp

    if os.environ.get("LIMG_TPU_NO_COMPILE_CACHE"):
        pass  # tunnel outage mode: stale cached executables can hang on load
    elif not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache"),
        )
    from limg_tpu.config import EncodeConfig
    from limg_tpu.encoder import encode_blocks
    from limg_tpu.ops import layout
    from limg_tpu.pallas_kernels.encode_fixed import encode_blocks_pallas, pack_channels
    from tools.make_test_image import make_4k

    img3 = make_4k(232, 328)        # small: exhaustive at P=4096 is costly
    h, w = img3.shape[:2]
    rng = np.random.default_rng(5)
    alpha = np.clip(140 + 40 * rng.standard_normal((h, w, 1)), 0, 255)
    img4 = np.concatenate([img3, alpha.astype(np.uint8)], axis=-1)

    class _Progress(dict):
        # per-case progress + result to stderr: the tunnel's compile helper
        # can freeze mid-run (CLAUDE.md protocol), and a silent 50-minute
        # gate is undebuggable without knowing which case it reached --
        # printing the result too means a killed run still leaves evidence
        def __setitem__(self, key, value):
            print(f"[gate] {key} {value}", file=sys.stderr, flush=True)
            super().__setitem__(key, value)

    results = _Progress()
    failures = []
    for has_alpha in (False, True):
        src = img4 if has_alpha else np.concatenate(
            [img3, np.full((h, w, 1), 255, np.uint8)], axis=-1
        )
        for bsz in sizes:
            px, mask, _ = layout.blockify(jnp.asarray(src), bsz)
            packed = pack_channels(px)
            for mode in modes:
                cfg = EncodeConfig(error_factor=100, has_alpha=has_alpha,
                                   crush_mode=mode, dithering=False)
                key = jax.random.PRNGKey(0)
                res = jax.jit(encode_blocks, static_argnames=("cfg",))(
                    px, mask, cfg, key
                )
                outs = encode_blocks_pallas(
                    packed, mask.astype(jnp.int32), cfg, jnp.int32(0),
                    emit_endpoints=True,
                )
                shifts_k, q_k, dec_k = outs[0], outs[1], outs[2]
                eps_k = outs[4:10]
                name = f"ch{4 if has_alpha else 3}_P{bsz * bsz}_{mode}"
                ch = cfg.channels
                d = res.decomposition
                eps_j = [d.dirA_min, d.dirA_max, d.dirB_offset, d.dirB_mag,
                         d.dirC_offset, d.dirC_mag]
                q_j = (res.factors[0] + (res.factors[1] << 8)
                       + (res.factors[2] << 16))
                dec_j = res.decoded[0].astype(jnp.int32)
                for c in range(1, ch):
                    dec_j = dec_j + (res.decoded[c].astype(jnp.int32) << (8 * c))
                if ch == 3:
                    dec_j = dec_j + jnp.int32(np.uint32(0xFF000000).view(np.int32))
                checks = {
                    "shifts": bool(np.array_equal(np.asarray(res.shifts),
                                                  np.asarray(shifts_k))),
                    "endpoints": all(
                        np.array_equal(np.asarray(a), np.asarray(b))
                        for a, b in zip(eps_j, eps_k)
                    ),
                    "factors": bool(np.array_equal(np.asarray(q_j),
                                                   np.asarray(q_k))),
                    "decode": bool(np.array_equal(np.asarray(dec_j),
                                                  np.asarray(dec_k))),
                }
                results[name] = checks
                if not all(checks.values()):
                    failures.append(name)

    # the K-batched candidate eval kernel (coalesce path): compiled kernel
    # vs the jnp decode-sim, on the real device, for a K x NB candidate
    # sweep -- covers the (tile, candidate) grid layout and its unshuffle
    from limg_tpu.ops.crush import evaluate_shifts
    from limg_tpu.pallas_kernels.encode_fixed import crush_eval_rows_k_pallas

    for has_alpha in (False, True):
        src = img4 if has_alpha else np.concatenate(
            [img3, np.full((h, w, 1), 255, np.uint8)], axis=-1
        )
        ch = 4 if has_alpha else 3
        px, mask, _ = layout.blockify(jnp.asarray(src), 8)
        px_i = px[:ch].astype(jnp.int32)
        mask_i = mask.astype(jnp.int32)
        nb = px.shape[-1]
        cfg = EncodeConfig(error_factor=100, has_alpha=has_alpha,
                           dithering=False)
        res = jax.jit(encode_blocks, static_argnames=("cfg",))(
            px, mask, cfg, jax.random.PRNGKey(0)
        )
        d = res.decomposition
        from limg_tpu.ops.factors import extract_factors, quantize_factors

        f8_u8 = quantize_factors(*extract_factors(px, d, ch))
        f8 = [f.astype(jnp.int32) for f in f8_u8]
        packed = px_i[0] + (px_i[1] << 8)
        for c in range(2, ch):
            packed = packed + (px_i[c] << (8 * c))
        f8_packed = f8[0] + (f8[1] << 8) + (f8[2] << 16)
        eps = [d.dirA_min, d.dirA_max, d.dirB_offset, d.dirB_mag,
               d.dirC_offset, d.dirC_mag]
        k = 5
        cand = jnp.stack([
            jnp.clip(res.shifts + dk, 0, 8) for dk in range(-2, 3)
        ])                                                   # (K, 3, NB)
        pm_k, be_k = crush_eval_rows_k_pallas(
            packed, mask_i, f8_packed, eps, cand, ch
        )
        ok = True
        for kk in range(k):
            pm_j, be_j = evaluate_shifts(px_i, mask_i, jnp.stack(f8), d,
                                         cand[kk], ch)
            ok = ok and np.array_equal(np.asarray(pm_j), np.asarray(pm_k[kk]))
            ok = ok and np.array_equal(np.asarray(be_j), np.asarray(be_k[kk]))
        name = f"ch{ch}_keval_K{k}"
        results[name] = {"pm_be": bool(ok)}
        if not ok:
            failures.append(name)

    # the segment-scan kernel (coalesce reductions): compiled halo-tile
    # kernel vs the jnp doubling-scan chain, on the real device, for every
    # (sum/max/mixed) x (f32/i32) combination the coalesce pass uses
    from limg_tpu.ops.segments import seg_mixed_all_jnp, SEG_CAP
    from limg_tpu.pallas_kernels.seg_scan import seg_mixed_all_pallas

    rng2 = np.random.default_rng(17)
    for n in (2048, 33000):
        seg = np.zeros(n, np.int32)
        i = 0
        while i < n:
            wdt = min(int(rng2.integers(1, SEG_CAP + 1)), n - i)
            seg[i:i + wdt] = i
            i += wdt
        for n_sum, rows, dt in ((4, 4, np.float32), (0, 6, np.float32),
                                (9, 18, np.int32)):
            if dt == np.float32:
                x = (rng2.normal(size=(rows, n)) * 100).astype(np.float32)
                init = np.float32(0.0 if n_sum == rows else -3.4e38)
            else:
                x = rng2.integers(0, 1 << 20, size=(rows, n)).astype(np.int32)
                init = np.int32(0)
            if n > 4096:
                # zero tail: exercises the kernel's empty-window skip (the
                # full-capacity coalesce buffer shape) -- outputs must stay
                # bit-identical to the jnp chain's zeros
                x[:, n // 2:] = 0
            a = np.asarray(seg_mixed_all_jnp(
                jnp.asarray(x), jnp.asarray(seg), n_sum, init
            ))
            b = np.asarray(seg_mixed_all_pallas(
                jnp.asarray(x), jnp.asarray(seg), n_sum, init,
                SEG_CAP.bit_length() - 1,
            ))
            name = f"segscan_n{n}_sum{n_sum}of{rows}_{np.dtype(dt).name}"
            results[name] = {"exact": bool(np.array_equal(a, b))}
            if not np.array_equal(a, b):
                failures.append(name)

    # the fused segment-encode kernel (the whole coalesce re-encode in one
    # launch): compiled kernel vs the jnp composition fit_segments ->
    # extract/quantize factors -> find_shifts_segments -> decode_blocks,
    # on the real device, all crush modes, RGB + RGBA
    from limg_tpu.ops.decode import decode_blocks
    from limg_tpu.ops.error import weighted_error
    from limg_tpu.ops.segments import find_shifts_segments, fit_segments
    from limg_tpu.pallas_kernels.encode_fixed import KernelSpec
    from limg_tpu.pallas_kernels.encode_segments import segment_encode_pallas

    rng3 = np.random.default_rng(23)
    n = 3000
    seg_np = np.zeros(n, np.int32)
    i = 0
    while i < n:
        wdt = min(int(rng3.integers(1, SEG_CAP + 1)), n - i)
        seg_np[i:i + wdt] = i
        i += wdt
    seg = jnp.asarray(seg_np)
    for ch, mode in [(3, "ladder"), (3, "exhaustive"), (3, "guess"),
                     (4, "ladder")]:
        px_np = rng3.integers(0, 256, (ch, 64, n)).astype(np.int32)
        px_np[:, :, : n // 2] = (px_np[:, :, : n // 2] // 32) * 32
        mask_np = np.ones((64, n), bool)
        mask_np[:, rng3.integers(0, n, n // 10)] = False
        mask_np[32:, rng3.integers(0, n, n // 10)] = False
        px = jnp.asarray(px_np)
        mask_b = jnp.asarray(mask_np)
        cfg = EncodeConfig(error_factor=100, has_alpha=(ch == 4),
                           crush_mode=mode, dithering=False)
        d = fit_segments(px, mask_b, seg, n, ch, contiguous=True)
        f8_u8 = quantize_factors(*extract_factors(px, d, ch))
        shifts_j, _ = find_shifts_segments(px, mask_b, f8_u8, d, seg, n, cfg,
                                           contiguous=True)
        q_j = jnp.stack([p.astype(jnp.int32) for p in f8_u8]) >> jnp.minimum(
            shifts_j, 8)[:, None, :]
        dec_j = decode_blocks(q_j, shifts_j, d, ch)
        dist_j = (weighted_error(dec_j, px) * mask_b.astype(jnp.int32)
                  ).astype(jnp.float32).sum(axis=0)
        params = jnp.asarray([0, cfg.max_pixel_bit_crush_error,
                              cfg.max_block_bit_crush_error], jnp.int32)
        (shifts_k, q_k, dec_k, dist_k, *_rest) = segment_encode_pallas(
            pack_channels(px.astype(jnp.uint8)), mask_b.astype(jnp.int32),
            seg, params, KernelSpec.from_config(cfg),
        )
        m = mask_np
        checks = {
            "shifts": bool(np.array_equal(np.asarray(shifts_j),
                                          np.asarray(shifts_k))),
            "factors": all(
                np.array_equal(
                    np.where(m, np.asarray(q_j[c]), 0),
                    np.where(m, np.asarray((q_k >> (8 * c)) & 0xFF), 0))
                for c in range(3)
            ),
            "decode": all(
                np.array_equal(
                    np.where(m, np.asarray(dec_j[c]), 0),
                    np.where(m, np.asarray((dec_k >> (8 * c)) & 0xFF), 0))
                for c in range(ch)
            ),
            "dist": bool(np.array_equal(np.asarray(dist_j),
                                        np.asarray(dist_k[0]))),
        }
        name = f"segenc_ch{ch}_{mode}"
        results[name] = checks
        if not all(checks.values()):
            failures.append(name)

    # the neighbor-match kernel (coalesce run linking): compiled kernel vs
    # ops.match.match_decomps on f32 decomposition rows
    from limg_tpu.ops.match import match_decomps
    from limg_tpu.ops.fit import Decomposition
    from limg_tpu.pallas_kernels.encode_merged import match_pairs_pallas

    rng4 = np.random.default_rng(31)
    nm = 20000
    for ch in (3, 4):
        avg = rng4.uniform(0, 255, (ch, nm)).astype(np.float32)
        ia_min = rng4.integers(-30, 200, (ch, nm)).astype(np.float32)
        rows_a = [avg, ia_min, ia_min + rng4.integers(0, 120, (ch, nm))]
        for lo, hi in ((-40, 60), (-20, 30)):
            off = rng4.integers(lo, -lo, (ch, nm)).astype(np.float32)
            rows_a += [off, off + rng4.integers(0, hi, (ch, nm))]
        rows_b = [r + (rng4.random((ch, nm)) < 0.3) * rng4.integers(
            0, 6, (ch, nm)) for r in rows_a]
        big_a = jnp.asarray(np.concatenate(rows_a, axis=0, dtype=np.float32))
        big_b = jnp.asarray(np.concatenate(rows_b, axis=0, dtype=np.float32))
        da = Decomposition(*(big_a[ch * i:ch * (i + 1)] for i in range(7)))
        db = Decomposition(*(big_b[ch * i:ch * (i + 1)] for i in range(7)))
        m_j, _ = match_decomps(da, db, ch)
        m_k = match_pairs_pallas(big_a, big_b, ch)
        name = f"match_ch{ch}"
        ok = bool(np.array_equal(np.asarray(m_j), np.asarray(m_k)))
        results[name] = {"match": ok}
        if not ok:
            failures.append(name)

    # the merged fit/owner-crush kernels (in-kernel Morton validity mask,
    # in-kernel match/owner select, stats rows): compiled Mosaic vs the
    # Pallas interpreter on identical inputs, including an edge-padded
    # (h, w) so the in-kernel mask arithmetic is exercised on both sides
    from limg_tpu.pallas_kernels.encode_merged import (
        fit_levels_pallas, morton_blockify_packed, owner_crush_pallas,
    )
    from limg_tpu.pallas_kernels.encode_fixed import KernelSpec as KSpec

    rng5 = np.random.default_rng(41)
    for ch, (h, w) in [(3, (64, 128)), (3, (52, 92)), (4, (52, 92))]:
        levels = 3
        img = rng5.integers(0, 256, (h, w, 4)).astype(np.uint8)
        img[:24, :, :3] = [40, 90, 200]            # flat band forces merges
        if ch == 3:
            img[..., 3] = 255
        packed2d = jnp.asarray(img.view(np.int32)[..., 0])
        packed_m = morton_blockify_packed(packed2d, h, w, levels)
        cfg = EncodeConfig(error_factor=100, has_alpha=(ch == 4),
                           crush_mode="ladder", dithering=False)
        ksp = KSpec.from_config(cfg)
        params = jnp.asarray([0, cfg.max_pixel_bit_crush_error,
                              cfg.max_block_bit_crush_error], jnp.int32)
        sides = {}
        for interp in (False, True):
            (cnt0, f8_sel, eps_sel, avg_sel, owner, stats_bits,
             reasons) = fit_levels_pallas(
                packed_m, params, ksp, levels, interp, hw=(h, w),
                emit_match=True)
            crush = owner_crush_pallas(
                packed_m, owner, f8_sel, eps_sel, params, ksp, levels,
                interp, hw=(h, w))
            sides[interp] = [cnt0, f8_sel, *eps_sel, avg_sel, owner,
                             stats_bits, *reasons,
                             *(c for c in crush if c is not None)]
        checks = {
            f"out{i}": bool(np.array_equal(np.asarray(a), np.asarray(b)))
            for i, (a, b) in enumerate(zip(sides[False], sides[True]))
        }
        name = f"merged_fused_ch{ch}_{h}x{w}"
        results[name] = {"exact": all(checks.values())}
        if not all(checks.values()):
            bad = [k for k, v in checks.items() if not v]
            results[name]["bad_outputs"] = bad
            failures.append(name)

    # the plane-form neighbor-match kernel (coalesce run linking): compiled
    # vs interpreter on a (7ch, gy, gx) row plane with tile seams
    from limg_tpu.pallas_kernels.encode_merged import match_neighbors_pallas

    rng7 = np.random.default_rng(47)
    for ch in (3, 4):
        gy, gx = 23, 300                  # crosses both seam kinds, not %8/128
        nmn = gy * gx
        avg = rng7.uniform(0, 255, (ch, nmn)).astype(np.float32)
        ia_min = rng7.integers(-30, 200, (ch, nmn)).astype(np.float32)
        rows_p = [avg, ia_min, ia_min + rng7.integers(0, 120, (ch, nmn))]
        for lo, hi in ((-40, 60), (-20, 30)):
            off = rng7.integers(lo, -lo, (ch, nmn)).astype(np.float32)
            rows_p += [off, off + rng7.integers(0, hi, (ch, nmn))]
        plane = jnp.asarray(
            np.concatenate(rows_p, axis=0, dtype=np.float32)
        ).reshape(7 * ch, gy, gx)
        a = match_neighbors_pallas(plane, ch, interpret=False)
        b = match_neighbors_pallas(plane, ch, interpret=True)
        ok = all(np.array_equal(np.asarray(x), np.asarray(y))
                 for x, y in zip(a, b))
        name = f"match_neighbors_ch{ch}"
        results[name] = {"exact": ok}
        if not ok:
            failures.append(name)

    # the natural-layout merged kernels (row-major tiles, lane+sublane
    # butterflies, one-hot MXU output compaction): compiled Mosaic vs the
    # Pallas interpreter, including edge-padded (h, w) so the in-kernel
    # mask + partial edge tiles are exercised, and the MXU compaction dot's
    # bit-exact pass-through is gated on real hardware
    from limg_tpu.pallas_kernels.encode_natural import (
        fit_levels_natural, owner_crush_natural, rows_to_blocks,
    )
    from limg_tpu.ops import layout as L

    rng6 = np.random.default_rng(43)
    for ch, (h, w) in [(3, (64, 128)), (3, (52, 92)), (4, (52, 92))]:
        levels = 3
        img = rng6.integers(0, 256, (h, w, 4)).astype(np.uint8)
        img[:24, :, :3] = [40, 90, 200]
        if ch == 3:
            img[..., 3] = 255
        v4, _, _ = L.host_block_view(img)
        by, bx = v4.shape[0], v4.shape[2]
        p2 = jnp.asarray(np.asarray(v4).reshape(by * 8, bx * 8))
        cfg = EncodeConfig(error_factor=100, has_alpha=(ch == 4),
                           crush_mode="ladder", dithering=False)
        ksp = KSpec.from_config(cfg)
        params = jnp.asarray([0, cfg.max_pixel_bit_crush_error,
                              cfg.max_block_bit_crush_error], jnp.int32)
        sides = {}
        for interp in (False, True):
            f8_sel, rows = fit_levels_natural(p2, params, ksp, levels,
                                              interp, hw=(h, w))
            rows_in = jnp.concatenate(
                [rows[1 + 7 * ch:2 + 7 * ch], rows[1:1 + 6 * ch]], axis=0)
            q_n, dec_n, orows = owner_crush_natural(
                p2, f8_sel, rows_in, params, ksp, levels, interp,
                hw=(h, w), emit_q=True)
            # compare valid extent only (edge-tile padding is undefined)
            sides[interp] = [
                np.asarray(f8_sel)[:h, :w],
                np.asarray(rows_to_blocks(rows, by, bx)),
                np.asarray(q_n)[:h, :w],
                np.asarray(dec_n)[:h, :w],
                np.asarray(rows_to_blocks(orows, by, bx)),
            ]
        checks = {
            f"out{i}": bool(np.array_equal(a, b))
            for i, (a, b) in enumerate(zip(sides[False], sides[True]))
        }
        name = f"natural_fused_ch{ch}_{h}x{w}"
        results[name] = {"exact": all(checks.values())}
        if not all(checks.values()):
            bad = [k for k, v in checks.items() if not v]
            results[name]["bad_outputs"] = bad
            failures.append(name)

    # the fused RD driver on the real device: per-level kernels are already
    # bit-gated above; this checks the DRIVER composition (RD DP cut, owner
    # select relayouts, unified RD coalesce) against RECORDED values from
    # the CPU dense-jnp RD path on the same image (the CPU fused-rd path
    # reproduces the dense path EXACTLY -- tests; re-record with
    # tools/record_rd_gate.py). The dense path is not compiled on device
    # here: its glue graph reliably freezes the tunnel's compile helper
    # (STATUS r4 item 7 at 1080p; reproduced at 64x96 in round 5).
    from limg_tpu.regions import encode_image_merged_rd_device
    from limg_tpu.ops.error import max_possible_error
    import jax

    rng8 = np.random.default_rng(53)
    h, w = 64, 96
    img = rng8.integers(0, 256, (h, w, 4)).astype(np.uint8)
    img[:24, :, :3] = [40, 90, 200]
    img[40:, 48:, :3] = [210, 60, 120]
    img[..., 3] = 255
    cfg = EncodeConfig(error_factor=100, crush_mode="ladder", dithering=False)
    key = jax.random.PRNGKey(0)
    img_j = jnp.asarray(img)

    def quality(out):
        mse = float(out["total_err"]) / (h * w)
        psnr = 10.0 * np.log10(max_possible_error(3) / max(mse, 1e-12))
        return psnr, float(out["mean_bpp"])

    expected_rd = (42.500, 8.312)    # CPU dense-jnp rd, tools/record_rd_gate.py
    fused_rd = encode_image_merged_rd_device(
        img_j, cfg, key, jnp.float32(0.01), 3, emit_planes=False)
    pf, bf = quality(fused_rd)
    checks = {
        "psnr_close": bool(abs(expected_rd[0] - pf) < 0.5),
        "bpp_close": bool(abs(expected_rd[1] - bf) < 0.3),
    }
    results["rd_fused_device"] = {
        **checks, "expected_cpu_dense": list(expected_rd),
        "fused": [round(pf, 3), round(bf, 4)],
    }
    if not all(checks.values()):
        failures.append("rd_fused_device")
    return results, failures


def main():
    results, failures = run_gate()
    print(json.dumps({
        "gate": "tpu_compiled_kernel_parity",
        "cases": len(results),
        "failures": failures,
        "ok": not failures,
        "results": results,
    }))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
