"""Observability: culprit-style diagnostics and profiler hooks.

The reference counts every rejection path into named "culprit" counters
(src/limg_internal.h:180-192) and prints a breakdown in debug builds
(src/limg.cpp:2412-2428). The batched encoder has no early exits to count,
so the equivalent question -- "what stops each block from crushing
further?" -- is answered directly: for the chosen shift triple, try
incrementing each axis and classify which admissibility constraint binds.
Unlike the reference's racy shared counters (SURVEY.md 2.7), these are
deterministic reductions.
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax
import jax.numpy as jnp

from ..config import EncodeConfig


def crush_culprits(px_u8, mask, f8_u8, decomp, shifts, cfg: EncodeConfig):
    """Classify what binds each block at its chosen shifts.

    Returns a dict of counts over blocks:
    - pixel_bound:  incrementing any axis violates maxPixelBitCrushError
                    (the culpritWasPixelBitCrushError analog)
    - block_bound:  incrementing violates only the block-mean error
                    (culpritWasBlockBitCrushError analog)
    - saturated:    all axes already at the drop encoding (s == 8)
    - expandable:   some single-axis increment would still be admissible
                    (the greedy reference search would have taken it; for the
                    ladder mode this measures ranking-model misses)
    """
    from ..ops.crush import evaluate_shifts, _admissible, _err_scale_shift

    ch = cfg.channels
    px = px_u8[:ch].astype(jnp.int32)
    mask_i = mask.astype(jnp.int32)
    count = mask_i.sum(axis=0)
    f8 = jnp.stack([p.astype(jnp.int32) for p in f8_u8])
    # evaluate_shifts pre-scales the block error on regions >= 2048 px; the
    # admissibility test must compensate identically (ops/crush.py)
    es = _err_scale_shift(px.shape[1])

    nb = shifts.shape[-1]
    sat = (shifts >= 8).all(axis=0)
    any_pixel = jnp.zeros((nb,), bool)
    any_block = jnp.zeros((nb,), bool)
    any_ok = jnp.zeros((nb,), bool)
    for axis in range(3):
        bump = shifts.at[axis].add(1) if hasattr(shifts, "at") else shifts
        bump = jnp.minimum(bump, 8)
        valid = shifts[axis] < 8
        pix_max, block_err = evaluate_shifts(px, mask_i, f8, decomp, bump, ch)
        ok = _admissible(pix_max, block_err, count, cfg, es) & valid
        pix_fail = (pix_max > cfg.max_pixel_bit_crush_error) & valid
        # the pixel test passed but admissibility failed => block error binds
        blk_fail = ~ok & ~pix_fail & valid
        any_pixel |= pix_fail
        any_block |= blk_fail
        any_ok |= ok

    return {
        "blocks": int(nb),
        "saturated": int(sat.sum()),
        "pixel_bound": int((any_pixel & ~any_ok & ~sat).sum()),
        "block_bound": int((any_block & ~any_pixel & ~any_ok & ~sat).sum()),
        "expandable": int(any_ok.sum()),
    }


def format_culprits(crush: dict, merge_stats=None) -> str:
    """Reference-style breakdown printout (src/limg.cpp:2412-2428)."""
    lines = ["CULPRIT info:", "-- Bit Crush -----------------------------------------"]
    total = max(1, crush["blocks"])
    for k in ("pixel_bound", "block_bound", "saturated", "expandable"):
        lines.append(
            "%-22s: %8d (%7.3f%%)" % (k, crush[k], crush[k] / total * 100.0)
        )
    if merge_stats:
        lines.append("-- Block Merge ---------------------------------------")
        for lvl, s in enumerate(merge_stats):
            for k, v in s.items():
                lines.append("L%d %-19s: %10g" % (lvl + 1, k, float(v)))
    return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/limg_tpu_trace"):
    """jax.profiler trace context -- the TPU-era IACA/timing analog
    (reference kept IACA markers at src/iacaMarks.h:35-36)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
