"""Encode configuration for limg-tpu.

Mirrors the reference's ``limg_encode_context`` threshold derivation
(reference: src/limg.cpp:2340-2375, src/limg_internal.h:165-193): every error
threshold is derived from one ``error_factor`` scalar with fixed hex
multipliers, then scaled by the compile-time feature flags that are active in
the reference's shipped configuration (``limg_ColorDependentBlockError=true``,
``limg_LuminanceDependentPixelError=false``,
``LIMG_PRECISE_DECOMPOSITION=2`` -- src/limg_internal.h:159-198).
"""

from __future__ import annotations

import dataclasses
from typing import Literal

# Block edge length in pixels (reference: limg_MinBlockSize = 8,
# src/limg_internal.h:157-158).
BLOCK_SIZE = 8
BLOCK_AREA = BLOCK_SIZE * BLOCK_SIZE

# Per-block header bits used by the bits-per-pixel estimate
# (reference: src/limg.cpp:1630 -- channels*(8+1)*2 + channels*8 + 2*16).
def static_block_bits(channels: int) -> int:
    return channels * 9 * 2 + channels * 8 + 2 * 16  # 110 for RGB, 136 for RGBA


CrushMode = Literal["none", "guess", "ladder", "exhaustive"]


@dataclasses.dataclass(frozen=True)
class EncodeConfig:
    """All knobs of one encode.

    ``error_factor`` plays the role of the reference CLI's ``--error-factor``
    (default 100, src/main.cpp:83). ``crush_mode`` generalizes the reference's
    fastBitCrush / guessCrush / coarseFineBitCrush / errorPixelRetainingBitCrush
    search-strategy bools (src/limg.cpp:2346-2351): on TPU the search is a
    batched enumeration, so the modes select how many candidate shift triples
    are evaluated, not a scan order.

    - "none":       no bit crushing (reference: crushBits=false when
                    error_factor == 0, src/limg.cpp:2349)
    - "guess":      only the reference's canned guess triples
                    (src/limg_bit_crush.h:332-392)
    - "ladder":     scalar-approximation ranking + exact verification of the
                    top-K triples per block (fast mode; default)
    - "exhaustive": all 9^3 shift triples, exact (matches the golden model's
                    full-enumeration optimum; reference analog:
                    --accurate-bit-crushing)
    """

    error_factor: int = 100
    has_alpha: bool = False
    dithering: bool = True
    crush_mode: CrushMode = "ladder"
    ladder_k: int = 8   # exact verifications per block in "ladder" mode
    dither_seed: int = 0xCA7F00D1  # reference dither PRNG seed flavor
    # Number of factor axes actually used (3 = A,B,C; 2 = A,B; 1 = A only).
    # Reduced-factor fast modes for flat/graphics content (BASELINE config 4);
    # the dropped axes use the shift=8 "factor dropped" encoding that already
    # exists in the decode semantics (src/limg_bit_crush.h:118-138).
    num_factors: int = 3

    @property
    def channels(self) -> int:
        return 4 if self.has_alpha else 3

    @property
    def crush_bits(self) -> bool:
        return self.crush_mode != "none" and self.error_factor != 0

    # --- threshold derivation (src/limg.cpp:2340-2375) ---------------------
    # Active compile-time flags in the reference build multiply the four
    # pixel/block thresholds by {4,4,7,7} (limg_ColorDependentBlockError).

    @property
    def max_pixel_block_error(self) -> int:
        return 0x12 * self.error_factor * 4

    @property
    def max_block_pixel_error(self) -> int:
        # compared against blockError * 0x10 / rangeSize
        return 0x1C * (self.error_factor // 3) * 4

    @property
    def max_pixel_channel_block_error(self) -> int:
        return 0x40 * (self.error_factor // 2)

    @property
    def max_block_expand_error(self) -> int:
        return 0x20 * self.error_factor

    @property
    def max_pixel_bit_crush_error(self) -> int:
        return 0x6 * (self.error_factor // 2) * 7

    @property
    def max_block_bit_crush_error(self) -> int:
        # compared against blockError * 0x10 / rangeSize
        return 0x4 * (self.error_factor // 2) * 7
