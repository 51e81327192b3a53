"""Integer reconstruction from crushed factor planes, batched.

Reference: limg_decode_block_from_factors_3d_ (src/limg_decode.h:238-324).
Fixed-point semantics reproduced exactly:

- dequantization by bit replication: f_dec = q * ((1 << s) + bias[s]) with
  bias = [0,0,0,0,1,4,21,127] for s = 0..7 (the closed form of the bit-fill
  loop at src/limg_decode.h:284-286),
- per-axis contribution min + ((f_dec * normal + 128) >> 8) with arithmetic
  shift, summed over the three axes, clamped to u8,
- shift > 7 drops the factor: its normal is zeroed; axes B/C also zero their
  offset while axis A keeps dirA_min (src/limg_decode.h:260-280). Deviation
  from the reference: for RGBA we zero all four channels, not just three.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .fit import Decomposition

# (1 << s) + decode_bias[s] for s = 0..7; slot 8 unused (q == 0 after >> 8).
# numpy (not jnp) so importing the package never initializes a backend.
DEQUANT_MULT = np.array([1, 2, 4, 8, 17, 36, 85, 255, 0], dtype=np.int32)
_MULT_TABLE = (1, 2, 4, 8, 17, 36, 85, 255, 0)


def dequant_mult(s_eff: jnp.ndarray) -> jnp.ndarray:
    """DEQUANT_MULT[s_eff] as a 9-way select chain (table gathers lower to
    slow serial loops on TPU)."""
    out = jnp.zeros_like(s_eff)
    for sv, m in enumerate(_MULT_TABLE):
        out = jnp.where(s_eff == sv, jnp.int32(m), out)
    return out


def decode_params(d: Decomposition, shifts: jnp.ndarray, channels: int):
    """Normals/mins with factor-drop rules applied.

    ``shifts``: (3, NB) int32. Returns (normals, mins), each (3, ch, NB) i32.
    """
    normals = jnp.stack([
        d.dirA_max - d.dirA_min,
        d.dirB_mag - d.dirB_offset,
        d.dirC_mag - d.dirC_offset,
    ])[:, :channels]
    mins = jnp.stack([d.dirA_min, d.dirB_offset, d.dirC_offset])[:, :channels]
    dropped = (shifts > 7)[:, None, :]  # (3, 1, NB)
    normals = jnp.where(dropped, 0, normals)
    keep_min = jnp.array([True, False, False]).reshape(3, 1, 1)
    mins = jnp.where(dropped & ~keep_min, 0, mins)
    return normals, mins


def decode_blocks(q: jnp.ndarray, shifts: jnp.ndarray, d: Decomposition, channels: int) -> jnp.ndarray:
    """Reconstruct pixels.

    ``q``: (3, P, NB) int32 crushed factors; ``shifts``: (3, NB) int32.
    Returns (ch, P, NB) int32 in [0, 255].
    """
    normals, mins = decode_params(d, shifts, channels)
    s_eff = jnp.minimum(shifts, 8)
    mult = dequant_mult(s_eff)                      # (3, NB)
    f_dec = q * mult[:, None, :]                    # (3, P, NB)
    # (3, ch, P, NB) contributions; arithmetic >> handles negative products.
    prod = f_dec[:, None] * normals[:, :, None, :] + 128
    contrib = mins[:, :, None, :] + (prod >> 8)
    est = contrib.sum(axis=0)                       # (ch, P, NB)
    return jnp.clip(est, 0, 255)
