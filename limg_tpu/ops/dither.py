"""Dithered quantization of factor planes.

Statistical parity with the reference's PCG-LCG / AES-NI dither
(src/limg.cpp:799-887): add uniform noise in [-2^(s-1), 2^(s-1)), clamp to
u8, then >> s. The PRNG is threefry (jax.random) by design -- the reference's
dither is itself just "some fast uniform hash", seeded per worker
(src/limg_internal.h:711); PSNR/bpp gates are the parity measure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dither_crush(key: jax.Array, f8: jnp.ndarray, shifts: jnp.ndarray, enabled: bool = True):
    """Quantize factor planes with optional dithering.

    ``f8``: (3, P, NB) int32 factor planes; ``shifts``: (3, NB) int32.
    Returns (3, P, NB) int32 crushed factors (already >> s). Shift 0 and the
    drop encoding (s == 8, whose factors are unused by decode) get no noise,
    matching `if (shift && shift != 8)` at src/limg.cpp:1951-1958.
    """
    s_eff = jnp.minimum(shifts, 8)[:, None, :]  # (3, 1, NB)
    if not enabled:
        return f8 >> s_eff
    bits = jax.random.bits(key, shape=f8.shape, dtype=jnp.uint32).astype(jnp.int32)
    live = (s_eff > 0) & (s_eff < 8)
    mask = (1 << s_eff) - 1
    offset = 1 << jnp.maximum(s_eff - 1, 0)
    noise = jnp.where(live, (bits & mask) - offset, 0)
    return jnp.clip(f8 + noise, 0, 255) >> s_eff
