"""Legacy 1-factor encoder: the TPU equivalent of limg_encode_test.

The reference's oldest path (src/limg.cpp:889-1086) fits a single color axis
A->B per region, stores one u8 factor plane, bit-crushes it with a serial
shift search, and grows variable pixel-level regions with a greedy scan
(src/limg.cpp:508-796). Coverage can be partial: pixels no region accepts
are copied from the source losslessly (src/limg.cpp:1072-1074).

TPU redesign:
- regions are aligned power-of-two squares decided by a parallel quadtree:
  a parent merges when its 2-point refit passes the same per-pixel /
  per-block error acceptance the reference's area checks use
  (limg_encode_get_block_factors_accurate_from_state_ with
  CheckPixelAndBlockError, src/limg_factorization.h:217-380);
- level-0 8x8 blocks that fail their own fit are "uncovered" and fall back
  to the source pixels, mirroring the reference's partial coverage;
- the shift search "largest prefix of passing shifts 1..7"
  (src/limg_bit_crush.h:68-94) becomes a batched cumulative-AND;
- the 1-factor decode keeps the reference's mod-256 (non-clamping) integer
  semantics: dec = (a + (((fac >> s << s) * (b - a) + 128) >> 8)) & 0xFF
  (src/limg_decode.h:6-34 with unsigned wrap-around).

Threshold derivation differs from the 3-factor drivers
(src/limg.cpp:902-926): bit-crush thresholds use 0x5/0x2 bases and the
ColorDependentBlockError multipliers are {4,6} fit / {7,10} crush by alpha.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .config import BLOCK_SIZE
from .ops import layout
from .ops.fit import _signed_unit_mean, _masked_minmax
from .ops.error import psnr as weighted_psnr
from .ops.dither import dither_crush


@dataclasses.dataclass(frozen=True)
class LegacyConfig:
    """limg_encode_test thresholds (src/limg.cpp:902-934)."""

    error_factor: int = 100
    has_alpha: bool = False
    dithering: bool = True
    # pixel-granular boundary growth (the reference's step-of-2 region grow,
    # src/limg.cpp:508-796); False restores block-aligned coverage only
    pixel_grow: bool = True

    @property
    def channels(self) -> int:
        return 4 if self.has_alpha else 3

    @property
    def max_pixel_block_error(self) -> int:
        return 0x12 * self.error_factor * (6 if self.has_alpha else 4)

    @property
    def max_block_pixel_error(self) -> int:
        return 0x1C * (self.error_factor // 3) * (6 if self.has_alpha else 4)

    @property
    def max_pixel_bit_crush_error(self) -> int:
        return 0x5 * (self.error_factor // 2) * (10 if self.has_alpha else 7)

    @property
    def max_block_bit_crush_error(self) -> int:
        return 0x2 * (self.error_factor // 2) * (10 if self.has_alpha else 7)


def _weighted_err_vec_f32(err_vec, px, channels):
    """limg_color_error_from_error_vec_ (src/limg_internal.h:577-634):
    float error vector, weights selected on the *pixel's* red < 0x80."""
    red_lo = px[0] < 128.0
    w = [jnp.where(red_lo, 2.0, 3.0), 4.0, jnp.where(red_lo, 3.0, 2.0), 3.0]
    err = sum(err_vec[c] * err_vec[c] * w[c] for c in range(channels))
    return err


def fit_2pt(px_u8, mask, cfg: LegacyConfig):
    """Batched 2-point (A axis) fit with acceptance checks.

    Reference: limg_encode_get_block_factors_accurate_from_state_<ch, true>
    (src/limg_factorization.h:217-380). Returns (a, b endpoints u8 (ch, NB),
    fac (P, NB) f32, accepted (NB,), block_err (NB,)).
    """
    ch = cfg.channels
    px = px_u8[:ch].astype(jnp.float32)
    m = mask.astype(jnp.float32)
    count = m.sum(axis=0)
    inv_count = 1.0 / jnp.maximum(count, 1.0)

    avg = (px * m).sum(axis=1) * inv_count
    corrected = (px - avg[:, None, :]) * m
    dir_a = _signed_unit_mean(corrected, m, inv_count)

    d_b = dir_a[:, None, :]
    dot = corrected[0] * d_b[0]
    for c in range(1, corrected.shape[0]):
        dot = dot + corrected[c] * d_b[c]
    d2 = (dir_a * dir_a).sum(axis=0)
    inv = jnp.where(d2 > 0, 1.0 / jnp.maximum(d2, 1e-38), 0.0)
    fac = dot * inv * m

    est = avg[:, None, :] + fac[None] * dir_a[:, None, :]
    err_vec = (px - est) * m
    pix_err = _weighted_err_vec_f32(err_vec, px, ch)
    pix_ok = (pix_err <= cfg.max_pixel_block_error) | ~mask
    block_err = pix_err.sum(axis=0)
    accepted = pix_ok.all(axis=0) & (
        block_err * 16.0 < cfg.max_block_pixel_error * count
    )

    mn, mx = _masked_minmax(fac, m)
    a = jnp.clip(jnp.floor(avg + mn * dir_a + 0.5), 0, 255).astype(jnp.int32)
    b = jnp.clip(jnp.floor(avg + mx * dir_a + 0.5), 0, 255).astype(jnp.int32)

    # factors relative to the rounded endpoints (limg_encode_check_area's
    # write-factors pass reprojects onto a..b; src/limg.cpp:10-110)
    nrm = (b - a).astype(jnp.float32)
    n2 = (nrm * nrm).sum(axis=0)
    invn = jnp.where(n2 > 0, 1.0 / jnp.maximum(n2, 1e-38), 0.0)
    v_ab = px - a.astype(jnp.float32)[:, None, :]
    n_b = nrm[:, None, :]
    acc = v_ab[0] * n_b[0]
    for c in range(1, v_ab.shape[0]):
        acc = acc + v_ab[c] * n_b[c]
    fac_ab = acc * invn
    return a, b, fac_ab, accepted, block_err


def decode_1d(q, shift, a, b, channels):
    """Mod-256 1-factor decode. q: (P, NB) crushed factors; shift: (NB,);
    a/b: (ch, NB) int32. Returns (ch, P, NB) int32 in [0, 255]."""
    diff = b - a                                     # (ch, NB), signed
    f_scaled = q << shift[None]                      # (P, NB)
    prod = f_scaled[None] * diff[:, None, :] + 128
    return (a[:, None, :] + (prod >> 8)) & 0xFF


def find_shift_1d(px_u8, mask, f8, a, b, cfg: LegacyConfig):
    """Largest prefix of shifts 1..7 passing the crush checks, batched.

    Reference: limg_encode_find_shift_for_block (src/limg_bit_crush.h:68-94)
    stops at the first failing shift; batched as a cumulative AND.
    """
    from .ops.error import weighted_error

    ch = cfg.channels
    px = px_u8[:ch].astype(jnp.int32)
    mask_i = mask.astype(jnp.int32)
    count = mask_i.sum(axis=0)
    oks = []
    for s in range(1, 8):
        q = f8 >> s
        dec = decode_1d(q, jnp.full(f8.shape[-1:], s, jnp.int32), a, b, ch)
        err = weighted_error(dec, px) * mask_i
        ok = (err.max(axis=0) <= cfg.max_pixel_bit_crush_error) & (
            err.sum(axis=0) * 0x10 < cfg.max_block_bit_crush_error * count
        )
        oks.append(ok)
    prefix = jnp.cumprod(jnp.stack(oks).astype(jnp.int32), axis=0)  # (7, NB)
    return prefix.sum(axis=0)                                        # (NB,)


@functools.partial(jax.jit, static_argnames=("cfg", "num_levels"))
def encode_legacy_device(image, cfg: LegacyConfig, dither_key, num_levels: int = 3):
    h, w = image.shape[:2]
    ch = cfg.channels

    grids, levels = [], []
    for lvl in range(num_levels):
        bsz = BLOCK_SIZE << lvl
        px, mask, grid = layout.blockify(image, bsz)
        a, b, fac, accepted, block_err = fit_2pt(px, mask, cfg)
        f8 = jnp.clip(jnp.rint(fac * 255.0), 0, 255).astype(jnp.int32)
        shift = find_shift_1d(px, mask, f8, a, b, cfg)
        q = dither_crush(
            jax.random.fold_in(dither_key, lvl),
            f8[None], shift[None], enabled=cfg.dithering,
        )[0]
        dec = decode_1d(q, shift, a, b, ch)
        count = mask.astype(jnp.int32).sum(axis=0)
        levels.append(dict(
            grid=grid, a=a, b=b, q=q, shift=shift, accepted=accepted,
            decoded=dec, block_err=block_err, count=count, mask=mask,
        ))
        grids.append(grid)

    # quadtree aliveness: parent alive when all children exist and the
    # parent's own refit was accepted
    from .regions import _child_indices

    alive = [levels[0]["accepted"]]
    for lvl in range(1, num_levels):
        gy, gx = grids[lvl - 1].blocks_y, grids[lvl - 1].blocks_x
        idx, valid = _child_indices(gy, gx)
        kids = alive[lvl - 1][jnp.asarray(idx)].all(axis=0) & jnp.asarray(valid.all(axis=0))
        alive.append(kids & levels[lvl]["accepted"])

    from .regions import _owner_level

    owner_blocks = _owner_level(alive, grids, num_levels)
    owner_px = layout.broadcast_block_plane(owner_blocks, grids[0], BLOCK_SIZE)
    covered0 = layout.broadcast_block_plane(alive[0].astype(jnp.int32), grids[0], BLOCK_SIZE)

    dec_imgs = [
        layout.unblockify(levels[lvl]["decoded"].astype(jnp.uint8), grids[lvl], BLOCK_SIZE << lvl)
        for lvl in range(num_levels)
    ]
    fac_imgs = [
        layout.unblockify(
            (((levels[lvl]["q"] << levels[lvl]["shift"][None]) & 0xFF)
             .astype(jnp.uint8))[None],
            grids[lvl], BLOCK_SIZE << lvl,
        )[..., 0]
        for lvl in range(num_levels)
    ]
    shift_imgs = [
        layout.broadcast_block_plane(levels[lvl]["shift"], grids[lvl], BLOCK_SIZE << lvl)
        for lvl in range(num_levels)
    ]
    a_imgs = [
        layout.broadcast_block_plane(levels[lvl]["a"], grids[lvl], BLOCK_SIZE << lvl)
        for lvl in range(num_levels)
    ]
    b_imgs = [
        layout.broadcast_block_plane(levels[lvl]["b"], grids[lvl], BLOCK_SIZE << lvl)
        for lvl in range(num_levels)
    ]

    def select(stack_list, hw_axes):
        out = stack_list[0]
        for lvl in range(1, num_levels):
            cond = owner_px == lvl
            if hw_axes == "hwc":
                cond = cond[..., None]
            elif hw_axes == "chw":
                cond = cond[None]
            out = jnp.where(cond, stack_list[lvl], out)
        return out

    decoded = select(dec_imgs, "hwc")
    factors = select(fac_imgs, "hw")
    shift_plane = select(shift_imgs, "hw")
    a_plane = select(a_imgs, "chw")
    b_plane = select(b_imgs, "chw")

    # partial coverage: uncovered pixels fall back to the source
    covered = covered0 > 0
    src = image[..., :ch]

    # -- pixel-granular boundary growth -------------------------------------
    # The reference grows legacy regions at PIXEL granularity in steps of 2
    # (limg_encode_attempt_include_pixels / the grow loop at
    # src/limg.cpp:508-796), so region edges are not block-aligned. Batched
    # analog: R rounds of 4-direction "parameter transport" -- every
    # uncovered pixel within 2 px of a covered one borrows that pixel's
    # region line (a, b, shift), reprojects its own color, crushes at the
    # region's shift, and joins the region when the decode passes the same
    # pixel-error acceptance the reference's grow applies. Each round is a
    # handful of full-plane vector ops; 3 rounds = the reference's typical
    # 6 px fringe.
    if cfg.pixel_grow:
        from .ops.error import weighted_error

        src_i = src.astype(jnp.int32).transpose(2, 0, 1)         # (ch, H, W)

        def shift2(x, d):
            """Shift a (..., H, W) plane by 2 px from direction d."""
            if d == 0:
                return jnp.pad(x[..., 2:, :], [(0, 0)] * (x.ndim - 2) + [(0, 2), (0, 0)])
            if d == 1:
                return jnp.pad(x[..., :-2, :], [(0, 0)] * (x.ndim - 2) + [(2, 0), (0, 0)])
            if d == 2:
                return jnp.pad(x[..., :, 2:], [(0, 0)] * (x.ndim - 2) + [(0, 0), (0, 2)])
            return jnp.pad(x[..., :, :-2], [(0, 0)] * (x.ndim - 2) + [(0, 0), (2, 0)])

        # the 3 rounds x 4 directions run as ONE lax.scan step body (the
        # direction picked by lax.switch): a 12x-unrolled body made the
        # whole encode_legacy graph large enough to segfault XLA:CPU's
        # LLVM backend mid-suite, and an unrolled loop is the wrong shape
        # for XLA anyway. Per-step math is identical to the unrolled form,
        # so results are bit-identical.
        dec_hw = decoded.transpose(2, 0, 1)                      # (ch, H, W)

        def step(carry, d):
            covered, grown_px, dec_hw, a_plane, b_plane, shift_plane, factors = carry
            stack = jnp.concatenate([
                covered[None].astype(jnp.int32), shift_plane[None],
                a_plane, b_plane,
            ], axis=0)
            stack_s = lax.switch(
                d, [lambda s, dd=dd: shift2(s, dd) for dd in range(4)], stack
            )
            cov_s = stack_s[0] > 0
            s_s = stack_s[1]
            a_s = stack_s[2:2 + ch]
            b_s = stack_s[2 + ch:2 + 2 * ch]
            cand = cov_s & ~covered
            # reproject this pixel's color onto the borrowed a->b line
            nrm = (b_s - a_s).astype(jnp.float32)
            n2 = (nrm * nrm).sum(axis=0)
            invn = jnp.where(n2 > 0, 1.0 / jnp.maximum(n2, 1e-38), 0.0)
            v = src_i.astype(jnp.float32) - a_s.astype(jnp.float32)
            fac = (v * nrm).sum(axis=0) * invn
            f8 = jnp.clip(jnp.floor(fac * 255.0 + 0.5), 0, 255).astype(jnp.int32)
            q = f8 >> s_s
            dec_d = (a_s + (((q << s_s)[None] * (b_s - a_s) + 128) >> 8)) & 0xFF
            err = weighted_error(dec_d, src_i)
            ok = cand & (err <= cfg.max_pixel_bit_crush_error)
            covered = covered | ok
            grown_px = grown_px + ok.sum()
            okc = ok[None]
            dec_hw = jnp.where(okc, dec_d, dec_hw)
            a_plane = jnp.where(okc, a_s, a_plane)
            b_plane = jnp.where(okc, b_s, b_plane)
            shift_plane = jnp.where(ok, s_s, shift_plane)
            factors = jnp.where(ok, (q << s_s) & 0xFF, factors)
            return (covered, grown_px, dec_hw, a_plane, b_plane,
                    shift_plane, factors), None

        carry0 = (covered, jnp.zeros((), jnp.int32), dec_hw.astype(jnp.int32),
                  a_plane, b_plane, shift_plane, factors.astype(jnp.int32))
        d_seq = jnp.tile(jnp.arange(4, dtype=jnp.int32), 3)
        (covered, grown_px, dec_hw, a_plane, b_plane, shift_plane,
         factors), _ = lax.scan(step, carry0, d_seq)
        factors = factors.astype(jnp.uint8)
        decoded = dec_hw.transpose(1, 2, 0).astype(jnp.uint8)
        stats_grow = grown_px
    else:
        stats_grow = jnp.zeros((), jnp.int32)

    decoded = jnp.where(covered[..., None], decoded, src)
    if ch == 3:
        decoded = jnp.concatenate(
            [decoded, jnp.full((h, w, 1), 0xFF, jnp.uint8)], axis=-1
        )

    stats = dict(
        covered_px=covered.sum(),
        grown_px=stats_grow,
        blocks=[a.sum() for a in alive],
        shift_plane=shift_plane,
        bits=((8 - shift_plane) * covered).sum(),
    )
    return decoded, factors, a_plane, b_plane, shift_plane, covered, stats


def encode_legacy(image, cfg: LegacyConfig | None = None, seed: int = 0,
                  num_levels: int = 3):
    """Host API mirroring limg_encode_test / limg_encode_info
    (src/limg.h:20-27)."""
    cfg = cfg or LegacyConfig()
    image = jnp.asarray(image)
    key = jax.random.PRNGKey(seed)
    decoded, factors, a_plane, b_plane, shift_plane, covered, stats = (
        encode_legacy_device(image, cfg, key, num_levels)
    )
    psnr, mse = weighted_psnr(image, decoded, cfg.channels)
    h, w = image.shape[:2]
    total = h * w
    return dict(
        decoded=np.asarray(decoded),
        factors=np.asarray(factors),
        col_a=np.asarray(a_plane),
        col_b=np.asarray(b_plane),
        shift=np.asarray(shift_plane.astype(jnp.uint8)),
        covered=np.asarray(covered),
        coverage=float(np.asarray(stats["covered_px"])) / total * 100.0,
        total_block_area=int(np.asarray(stats["covered_px"])),
        grown_px=int(np.asarray(stats["grown_px"])),
        avg_bits=float(np.asarray(stats["bits"])) / max(1, int(np.asarray(stats["covered_px"]))),
        psnr=float(psnr),
        mse=float(mse),
    )
