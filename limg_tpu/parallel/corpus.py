"""Streaming corpus encode: native host staging overlapped with device encode.

The reference encodes a corpus as a serial CLI loop -- load, encode, load,
encode (src/main.cpp:171-414). Here the native StagingPool
(runtime/limg_runtime.cpp) decodes and blockifies files on host threads
while the TPU encodes the previous images; the device consumes packed
(64, NB) u32 tensors directly.

Environment note: on this development setup the TPU sits behind a network
tunnel, so end-to-end corpus throughput is bounded by the ~10 MB/image
host->device upload (measured ~1.5 img/s at 1080p), not by the encode
itself (device time is ~1.3 ms/1080p image). On a directly attached TPU
host the PCIe link removes that ceiling.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..config import EncodeConfig, static_block_bits
from ..ops.error import max_possible_error, weighted_error
from ..encoder import encode_blocks
from ..pallas_kernels.encode_fixed import encode_blocks_pallas, unpack_plane


@functools.partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def _encode_packed_stats(packed, mask, cfg: EncodeConfig, key, use_pallas: bool):
    """Packed (64, NB) u32 pixels -> (psnr, exact_bpp) scalars."""
    packed_i = packed.astype(jnp.int32) if packed.dtype != jnp.int32 else packed
    ch = cfg.channels
    src = jnp.stack([unpack_plane(packed_i, c) for c in range(ch)])
    mask_i = mask.astype(jnp.int32)
    count = mask_i.sum(axis=0)
    n = count.sum()

    if use_pallas:
        seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
        shifts, q_packed, dec_packed = encode_blocks_pallas(packed_i, mask_i.astype(bool), cfg, seed)
        dec = jnp.stack([unpack_plane(dec_packed, c) for c in range(ch)])
    else:
        px_u8 = jnp.stack(
            [unpack_plane(packed_i, c).astype(jnp.uint8) for c in range(4)]
        )
        res = encode_blocks(px_u8, mask_i.astype(bool), cfg, key)
        shifts, dec = res.shifts, res.decoded

    err = (weighted_error(dec, src) * mask_i).astype(jnp.float32).sum()
    mse = err / n
    psnr = 10.0 * jnp.log10(max_possible_error(ch) / jnp.maximum(mse, 1e-12))
    bits = ((8 - jnp.minimum(shifts, 8)) * count[None]).sum()
    nb = packed.shape[-1]
    bpp = (bits + static_block_bits(ch) * nb) / n
    return psnr, bpp


def encode_corpus_streaming(paths, height: int, width: int, cfg: EncodeConfig,
                            use_pallas: bool = True, pool_threads: int | None = None,
                            seed: int = 0):
    """Encode same-size TGA/PPM files with host staging overlapping device
    encode. Returns {"psnr": (N,), "bpp": (N,)} plus failure indices."""
    from .. import native

    results_psnr = np.zeros(len(paths), np.float64)
    results_bpp = np.zeros(len(paths), np.float64)
    failed = []

    keys = jax.random.split(jax.random.PRNGKey(seed), max(1, len(paths)))

    if native.available():
        pool = native.StagingPool(pool_threads)
        try:
            slots = [pool.stage(p, height, width) for p in paths]
            pending = []
            for i, (packed, mask, status) in enumerate(slots):
                # spin-wait for this slot only; later slots keep decoding
                while status[0] == 0:
                    pool.await_all()
                if status[0] != 1:
                    failed.append(i)
                    continue
                out = _encode_packed_stats(
                    jnp.asarray(packed.view(np.int32)), jnp.asarray(mask.astype(bool)),
                    cfg, keys[i], use_pallas,
                )
                pending.append((i, out))
            for i, (psnr, bpp) in pending:
                results_psnr[i] = float(psnr)
                results_bpp[i] = float(bpp)
        finally:
            pool.close()
    else:
        from ..io import load_image

        for i, p in enumerate(paths):
            img, _ = load_image(p)
            packed, mask = native.blockify_packed(img)
            psnr, bpp = _encode_packed_stats(
                jnp.asarray(packed.view(np.int32)), jnp.asarray(mask.astype(bool)),
                cfg, keys[i], use_pallas,
            )
            results_psnr[i] = float(psnr)
            results_bpp[i] = float(bpp)

    return {"psnr": results_psnr, "bpp": results_bpp, "failed": failed}
