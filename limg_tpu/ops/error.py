"""Perceptually weighted error model and PSNR, batched.

Reference semantics: limg_color_error (src/limg_internal.h:376-410) -- squared
error with channel weights selected by the *squared red difference*:
{2,4,3,3} when (a.r - b.r)^2 < 0x4000, else {3,4,2,3}. PSNR per
limg_compare (src/limg.cpp:2455-2491).
"""

from __future__ import annotations

import jax.numpy as jnp

_W_LO = (2, 4, 3, 3)
_W_HI = (3, 4, 2, 3)


def weighted_error(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Weighted squared error. ``a``/``b``: (ch, ...) int32. Returns (...) i32.

    Channel axis is leading (canonical layout). Weights are small so the
    result fits i32 for single pixels (max 255^2 * 12 = 780300).
    """
    ch = a.shape[0]
    d = a - b
    d2 = d * d
    red_lo = d2[0] < 0x4000
    err = jnp.zeros_like(d2[0])
    for i in range(ch):
        w = jnp.where(red_lo, _W_LO[i], _W_HI[i])
        err = err + d2[i] * w
    return err


def max_possible_error(channels: int) -> int:
    """Weighted error of black vs white: 255^2 * sum of high-red weights."""
    return 255 * 255 * sum(_W_HI[:channels])


def psnr(img_a: jnp.ndarray, img_b: jnp.ndarray, channels: int):
    """Weighted PSNR between (H, W, >=ch) uint8 images. Returns (psnr, mse)."""
    a = img_a[..., :channels].astype(jnp.int32).transpose(2, 0, 1)
    b = img_b[..., :channels].astype(jnp.int32).transpose(2, 0, 1)
    # f32 tree reduction: ~1e-7 relative error on the total, far below the
    # 0.01 dB PSNR resolution we report.
    total = weighted_error(a, b).astype(jnp.float32).sum()
    n = img_a.shape[0] * img_a.shape[1]
    mse = total / n
    max_err = max_possible_error(channels)
    return 10.0 * jnp.log10(max_err / mse), mse
