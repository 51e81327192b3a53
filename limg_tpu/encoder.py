"""Fixed-grid encoder: the TPU equivalent of limg_encode3d_test.

Reference driver: src/limg.cpp:1887-2265 -- independent 8x8 tiles, no
merging: per-tile fit -> factor extraction -> bit-crush search -> dither ->
output planes -> integer decode. Here the whole image is one batched tensor
program: every stage operates on all blocks at once, and XLA's async dispatch
replaces the row-band thread pool (src/limg.cpp:2105-2138).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import BLOCK_SIZE, EncodeConfig, static_block_bits
from .ops import layout
from .ops.fit import Decomposition, drop_decomposition_axes, fit_blocks
from .ops.factors import extract_factors, quantize_factors
from .ops.crush import find_shifts
from .ops.dither import dither_crush
from .ops.decode import decode_blocks
from .ops.error import psnr as weighted_psnr


class EncodeResult(NamedTuple):
    """Device-side encode outputs (block layout)."""

    decomposition: Decomposition   # endpoints: (ch, NB) int32
    factors: jnp.ndarray           # (3, P, NB) int32, crushed (already >> s)
    shifts: jnp.ndarray            # (3, NB) int32
    decoded: jnp.ndarray           # (ch, P, NB) int32
    mask: jnp.ndarray              # (P, NB) bool
    accum_bits: jnp.ndarray        # (3,) int32 -- total factor bits per axis
    bits_histogram: jnp.ndarray    # (3, 9) int32 -- pixels at shift s per axis
    bpp_block: jnp.ndarray         # (NB,) int32 -- rounded u8 bpp estimate


def encode_blocks(px_u8: jnp.ndarray, mask: jnp.ndarray, cfg: EncodeConfig,
                  dither_key: jax.Array) -> EncodeResult:
    """Encode pre-blockified pixels: (>=ch, P, NB) u8 + (P, NB) mask."""
    ch = cfg.channels
    d = fit_blocks(px_u8, mask, ch)
    fa, fb, fc = extract_factors(px_u8, d, ch)
    f8_u8 = quantize_factors(fa, fb, fc)
    f8 = jnp.stack([p.astype(jnp.int32) for p in f8_u8])  # (3, P, NB)

    if cfg.num_factors < 3:
        # Reduced-factor fast modes: statically drop axes C (and B) via the
        # shift=8 encoding that decode already understands. The endpoints
        # are zeroed *before* the search so candidate evaluation includes
        # the drop-induced error; the forced max only fixes the stored
        # shift / bits accounting (decode is unchanged: normals are zero).
        d = drop_decomposition_axes(d, cfg.num_factors)
        nb = px_u8.shape[-1]
        forced = jnp.asarray(
            [0] * cfg.num_factors + [8] * (3 - cfg.num_factors), jnp.int32
        )
        base = jnp.broadcast_to(forced[:, None], (3, nb))
    else:
        base = None

    shifts, _ = find_shifts(px_u8, mask, f8_u8, d, cfg)
    if base is not None:
        shifts = jnp.maximum(shifts, base)

    q = dither_crush(dither_key, f8, shifts, enabled=cfg.dithering and cfg.crush_bits)
    decoded = decode_blocks(q, shifts, d, ch)

    count = mask.astype(jnp.int32).sum(axis=0)                    # (NB,)
    s_eff = jnp.minimum(shifts, 8)                                # (3, NB)
    bits_each = (8 - s_eff) * count[None]                         # (3, NB)
    accum_bits = bits_each.sum(axis=1)
    one_hot = (s_eff[:, None, :] == jnp.arange(9)[None, :, None]) # (3, 9, NB)
    bits_histogram = (one_hot * count[None, None, :]).sum(axis=2)

    # Rounded per-pixel bits estimate (src/limg.cpp:1629-1636).
    block_bits = static_block_bits(ch) + bits_each.sum(axis=0)
    bpp_block = jnp.minimum(0xFF, (block_bits + count // 2) // count)

    return EncodeResult(
        decomposition=d,
        factors=q,
        shifts=shifts,
        decoded=decoded,
        mask=mask,
        accum_bits=accum_bits,
        bits_histogram=bits_histogram,
        bpp_block=bpp_block,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_image_device(image: jnp.ndarray, cfg: EncodeConfig, dither_key: jax.Array):
    """(H, W, >=ch) uint8 -> (decoded image u8 RGBA, EncodeResult, grid)."""
    px, mask, grid = layout.blockify(image, BLOCK_SIZE)
    res = encode_blocks(px, mask, cfg, dither_key)
    decoded = _assemble_decoded(res.decoded, image, grid, cfg)
    return decoded, res


def _assemble_decoded(decoded_blocks: jnp.ndarray, image: jnp.ndarray,
                      grid: layout.BlockGrid, cfg: EncodeConfig) -> jnp.ndarray:
    """Block-layout decode -> (H, W, 4) uint8 RGBA (alpha = 0xFF for RGB)."""
    dec = layout.unblockify(decoded_blocks.astype(jnp.uint8), grid, BLOCK_SIZE)
    if cfg.channels == 3:
        alpha = jnp.full((*dec.shape[:2], 1), 0xFF, jnp.uint8)
        dec = jnp.concatenate([dec, alpha], axis=-1)
    return dec


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_image_device_pallas(image: jnp.ndarray, cfg: EncodeConfig,
                                dither_key: jax.Array):
    """Fused-kernel variant of encode_image_device with the same outputs."""
    from .pallas_kernels.encode_fixed import (
        encode_blocks_pallas, pack_channels, unpack_plane,
    )
    from .ops.fit import Decomposition

    ch = cfg.channels
    if image.shape[2] == 4:
        packed, mask, grid = layout.blockify_packed(image, BLOCK_SIZE)
    else:
        px, mask, grid = layout.blockify(image, BLOCK_SIZE)
        packed = pack_channels(px)
    seed = jax.random.randint(dither_key, (), 0, 2**31 - 1, jnp.int32)
    outs = encode_blocks_pallas(packed, mask, cfg, seed, emit_endpoints=True)
    shifts, q_packed, dec_packed = outs[:3]
    q = jnp.stack([unpack_plane(q_packed, c) for c in range(3)])
    decoded_blocks = jnp.stack([unpack_plane(dec_packed, c) for c in range(ch)])
    d = Decomposition(
        avg=outs[10],
        dirA_min=outs[4], dirA_max=outs[5],
        dirB_offset=outs[6], dirB_mag=outs[7],
        dirC_offset=outs[8], dirC_mag=outs[9],
    )
    count = mask.astype(jnp.int32).sum(axis=0)
    s_eff = jnp.minimum(shifts, 8)
    bits_each = (8 - s_eff) * count[None]
    accum_bits = bits_each.sum(axis=1)
    one_hot = s_eff[:, None, :] == jnp.arange(9)[None, :, None]
    bits_histogram = (one_hot * count[None, None, :]).sum(axis=2)
    block_bits = static_block_bits(ch) + bits_each.sum(axis=0)
    bpp_block = jnp.minimum(0xFF, (block_bits + count // 2) // count)
    res = EncodeResult(
        decomposition=d, factors=q, shifts=shifts, decoded=decoded_blocks,
        mask=mask, accum_bits=accum_bits, bits_histogram=bits_histogram,
        bpp_block=bpp_block,
    )
    return _assemble_decoded(decoded_blocks, image, grid, cfg), res


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_perf_step(image: jnp.ndarray, cfg: EncodeConfig, dither_key: jax.Array):
    """Throughput-measurement variant (reference: limg_encode3d_test_perf,
    src/limg.cpp:2140-2327): runs the full pipeline but returns only a tiny
    checksum so plane materialization is dead-code-eliminated exactly like
    the reference's compile-time knobs."""
    px, mask, grid = layout.blockify(image, BLOCK_SIZE)
    res = encode_blocks(px, mask, cfg, dither_key)
    return res.decoded.sum(), res.shifts.sum()


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_perf_step_pallas(image: jnp.ndarray, cfg: EncodeConfig,
                            dither_key: jax.Array):
    """Fused-kernel perf step (what bench.py measures)."""
    from .pallas_kernels.encode_fixed import encode_blocks_pallas, pack_channels

    if image.ndim in (2, 4) or image.shape[2] == 4:
        packed, mask, grid = layout.blockify_packed(image, BLOCK_SIZE)
    else:
        px, mask, grid = layout.blockify(image, BLOCK_SIZE)
        packed = pack_channels(px)
    seed = jax.random.randint(dither_key, (), 0, 2**31 - 1, jnp.int32)
    shifts, q_packed, dec_packed = encode_blocks_pallas(packed, mask, cfg, seed)[:3]
    return dec_packed.sum(), shifts.sum()


def encode_image(image, cfg: EncodeConfig, seed: int = 0,
                 use_pallas: bool | None = None):
    """Host-facing full encode. Returns a dict of planes + stats (NumPy).

    Output surface mirrors limg_encode3d_info (src/limg.h:29-33) plus the
    blocked-path extras (bits-per-pixel plane, src/limg.h:39-44).
    ``use_pallas`` routes the compute through the fused kernel; the default
    (None) picks the kernel automatically on accelerator backends. The two
    backends agree bit-exactly on shifts/endpoints/decode (tested).
    """
    import numpy as np

    image = jnp.asarray(image)
    key = jax.random.PRNGKey(seed)
    if use_pallas is None:
        # all crush modes run in-kernel now; CPU still uses the jnp path
        # (the kernel would run in the slow Pallas interpreter there)
        use_pallas = jax.default_backend() != "cpu"
    if use_pallas:
        decoded, res = _encode_image_device_pallas(image, cfg, key)
    else:
        decoded, res = encode_image_device(image, cfg, key)
    grid = layout.grid_for(image.shape[0], image.shape[1])

    f_shifted = (res.factors << jnp.minimum(res.shifts, 8)[:, None, :]) & 0xFF
    planes = layout.unblockify(f_shifted.astype(jnp.uint8), grid)  # (H, W, 3)
    shift_plane = layout.broadcast_block_plane(res.shifts, grid)   # (3, H, W)
    bpp_plane = layout.broadcast_block_plane(res.bpp_block, grid)  # (H, W)
    psnr, mse = weighted_psnr(image, decoded, cfg.channels)

    # endpoint-color visualization planes (reference writes these as RGBA
    # images with a +0x80 bias on the B/C offsets; src/limg.cpp:1609-1617)
    d = res.decomposition

    def color_plane(vals, bias=0):
        v = jnp.clip(vals + bias, 0, 255).astype(jnp.uint8)        # (ch, NB)
        img_p = layout.broadcast_block_plane(v, grid)              # (ch, H, W)
        rgba = jnp.full((4, *img_p.shape[1:]), 0xFF, jnp.uint8)
        rgba = rgba.at[: v.shape[0]].set(img_p)
        return np.asarray(rgba.transpose(1, 2, 0))

    endpoint_planes = {
        "col_a_min": color_plane(d.dirA_min),
        "col_a_max": color_plane(d.dirA_max),
        "col_b_min": color_plane(d.dirB_offset, 0x80),
        "col_b_max": color_plane(d.dirB_mag, 0x80),
        "col_c_min": color_plane(d.dirC_offset, 0x80),
        "col_c_max": color_plane(d.dirC_mag, 0x80),
    }

    total_px = image.shape[0] * image.shape[1]
    return dict(
        decoded=np.asarray(decoded),
        factors_a=np.asarray(planes[..., 0]),
        factors_b=np.asarray(planes[..., 1]),
        factors_c=np.asarray(planes[..., 2]),
        shift=np.asarray(shift_plane).transpose(1, 2, 0).astype(np.uint8),
        bpp=np.asarray(bpp_plane).astype(np.uint8),
        endpoints={
            "colAMin": np.asarray(res.decomposition.dirA_min),
            "colAMax": np.asarray(res.decomposition.dirA_max),
            "colBMin": np.asarray(res.decomposition.dirB_offset),
            "colBMax": np.asarray(res.decomposition.dirB_mag),
            "colCMin": np.asarray(res.decomposition.dirC_offset),
            "colCMax": np.asarray(res.decomposition.dirC_mag),
        },
        endpoint_planes=endpoint_planes,
        psnr=float(psnr),
        mse=float(mse),
        mean_bpp=float(np.asarray(bpp_plane).mean()),
        avg_block_bits=float(np.asarray(res.accum_bits).sum() / total_px),
        bits_histogram=np.asarray(res.bits_histogram),
    )
