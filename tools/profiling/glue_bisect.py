"""Stage bisection of the fused merged path + coalesce pass on the TPU.

Each stage returns early from a jitted copy of the pipeline so XLA
dead-code-eliminates everything after it; stage deltas = stage costs.
Run: python tools/profiling/glue_bisect.py
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)

from limg_tpu import EncodeConfig
from limg_tpu.ops import layout
from limg_tpu.ops.fit import Decomposition
from limg_tpu.ops.match import match_decomps
from limg_tpu.pallas_kernels.encode_fixed import KernelSpec
from limg_tpu.pallas_kernels import encode_merged as em
from limg_tpu.utils.timing import time_device_fn
from tools.make_test_image import make_4k

cfg = EncodeConfig(error_factor=100, has_alpha=False, crush_mode="ladder")
kspec = KernelSpec.from_config(cfg)
CH = 3
LV = 3


@functools.partial(jax.jit, static_argnames=("stage",))
def probe(image, key, stage):
    packed, mask, grid0 = layout.blockify_packed(image, 8)
    nb = grid0.num_blocks
    perm, byp, bxp = em.morton_perm(grid0.blocks_y, grid0.blocks_x, LV)
    nbp = perm.size
    safe = jnp.asarray(np.maximum(perm, 0))
    valid = jnp.asarray(perm >= 0)
    packed_m = jnp.where(valid[None], packed[:, safe], 0)
    mask_m = (mask[:, safe] & valid[None]).astype(jnp.int32)
    if stage == "blockify":
        return packed_m.sum()
    params = jnp.stack([jnp.int32(0), jnp.int32(cfg.max_pixel_bit_crush_error),
                        jnp.int32(cfg.max_block_bit_crush_error)])
    h_im, w_im = image.shape[:2]
    fit = em.fit_levels_pallas(packed_m, params, kspec, LV, False,
                               hw=(h_im, w_im))
    if stage == "fit":
        return fit[0]["f8"].sum()
    decomps, counts = [], []
    for lvl in range(LV):
        s = 4 ** lvl
        eps = fit[lvl]["endpoints"]
        decomps.append(Decomposition(
            avg=fit[lvl]["avg"][:, ::s],
            dirA_min=eps[0][:, ::s], dirA_max=eps[1][:, ::s],
            dirB_offset=eps[2][:, ::s], dirB_mag=eps[3][:, ::s],
            dirC_offset=eps[4][:, ::s], dirC_mag=eps[5][:, ::s]))
        counts.append(fit[lvl]["count"][0, ::s])
    alive = [jnp.ones((nbp,), bool)]
    for lvl in range(1, LV):
        dch, cnt = decomps[lvl - 1], counts[lvl - 1]
        c = [Decomposition(*(f[:, k::4] for f in dch)) for k in range(4)]
        empty = [cnt[k::4] <= 0 for k in range(4)]
        ka = alive[lvl - 1]
        ok = ka[0::4] & ka[1::4] & ka[2::4] & ka[3::4]
        for k in (1, 2, 3):
            m, st = match_decomps(c[0], c[k], CH)
            ok = ok & (m | empty[k] | empty[0])
        alive.append(ok)
    owner = jnp.zeros((nbp,), jnp.int32)
    for lvl in range(1, LV):
        owner = jnp.where(jnp.repeat(alive[lvl], 4 ** lvl), lvl, owner)
    if stage == "owner":
        return owner.sum()
    owner_row = owner[None, :]
    f8_sel = fit[0]["f8"]
    eps_sel = list(fit[0]["endpoints"])
    for lvl in range(1, LV):
        sel = owner_row == lvl
        f8_sel = jnp.where(sel, fit[lvl]["f8"], f8_sel)
        eps_sel = [jnp.where(sel, e, o)
                   for e, o in zip(fit[lvl]["endpoints"], eps_sel)]
    if stage == "select":
        return f8_sel.sum() + sum(e.sum() for e in eps_sel)
    shifts_m, q_m, dec_m, dist_m = em.owner_crush_pallas(
        packed_m, owner_row, f8_sel, tuple(eps_sel), params, kspec,
        LV, False, hw=(h_im, w_im))[:4]
    if stage == "crush":
        return dec_m.sum()
    inv = np.empty(nb, np.int64)
    inv[perm[perm >= 0]] = np.nonzero(perm >= 0)[0]
    inv_j = jnp.asarray(inv)
    dec_blk = dec_m[:, inv_j]
    if stage == "toorig":
        return dec_blk.sum()
    dec_plane = layout.unblockify(dec_blk[None], grid0, 8)[..., 0]
    decoded4 = jnp.stack(
        [((dec_plane >> (8 * c)) & 0xFF).astype(jnp.uint8) for c in range(4)],
        axis=-1)
    if stage == "decoded":
        return decoded4.sum()
    return decoded4.sum()


# ---- coalesce internals -----------------------------------------------------

@functools.partial(jax.jit, static_argnames=("stage",))
def probe_coalesce(image, lv0_in, owned0, key, stage):
    from limg_tpu.ops.segments import (
        fit_segments, find_shifts_segments, gather_decomp, seg_sum)
    from limg_tpu.ops.factors import extract_factors, quantize_factors
    from limg_tpu.ops.dither import dither_crush
    from limg_tpu.ops.decode import decode_blocks
    from limg_tpu.regions import build_runs

    d_lvl = lv0_in
    px, mask, grid = layout.blockify(image, 8)
    nb = px.shape[-1]
    seg_id, run_len = build_runs(d_lvl, owned0, grid, CH)
    if stage == "runs":
        return seg_id.sum()
    is_run = owned0 & (run_len >= 2)
    cap = nb if nb <= 256 else max(256, nb // 4)
    order = jnp.argsort(~is_run, stable=True)
    sel = order[:cap]
    if stage == "argsort":
        return sel.sum()
    sel_is_run = is_run[sel]
    px_c = px[:, :, sel]
    mask_c = mask[:, sel] & sel_is_run[None, :]
    seg_orig = seg_id[sel]
    first_pos = jnp.full((nb,), cap, jnp.int32).at[seg_orig].min(
        jnp.arange(cap, dtype=jnp.int32))
    seg_c = jnp.minimum(first_pos[seg_orig], cap - 1)
    if stage == "compact":
        return px_c.sum() + seg_c.sum()
    d_seg = fit_segments(px_c, mask_c, seg_c, cap, CH)
    if stage == "fitseg":
        return d_seg.dirA_min.sum()
    d_blk = gather_decomp(d_seg, seg_c)
    f8_u8 = quantize_factors(*extract_factors(px_c, d_blk, CH))
    if stage == "factors":
        return f8_u8[0].sum()
    shifts_seg, _ = find_shifts_segments(px_c, mask_c, f8_u8, d_seg, seg_c, cap, cfg)
    if stage == "crushseg":
        return shifts_seg.sum()
    shifts_blk = shifts_seg[:, seg_c]
    f8 = jnp.stack([p.astype(jnp.int32) for p in f8_u8])
    q = dither_crush(key, f8, shifts_blk, enabled=True)
    decoded = decode_blocks(q, shifts_blk, d_blk, CH)
    return decoded[0].sum()


def main():
    img_np = make_4k()
    h, w = img_np.shape[:2]
    alpha = np.full((h, w, 1), 255, np.uint8)
    img = jax.device_put(jnp.asarray(np.concatenate([img_np, alpha], axis=-1)))
    key = jax.random.PRNGKey(0)
    res = {}
    for stage in ("blockify", "fit", "owner", "select", "crush", "toorig",
                  "decoded", "full"):
        t, _ = time_device_fn(lambda s=stage: probe(img, key, s), iters=12, inner=4)
        res[stage + "_ms"] = round(t * 1e3, 2)
    print(json.dumps(res))

    # coalesce: build realistic inputs once
    from limg_tpu.ops.fit import fit_blocks
    px, mask, grid0 = layout.blockify(jnp.asarray(img), 8)
    d0 = fit_blocks(px, mask, CH)
    owned0 = jnp.ones((grid0.num_blocks,), bool)
    res2 = {}
    for stage in ("runs", "argsort", "compact", "fitseg", "factors",
                  "crushseg", "full"):
        t, _ = time_device_fn(
            lambda s=stage: probe_coalesce(img, d0, owned0, key, s),
            iters=9, inner=3)
        res2["coal_" + stage + "_ms"] = round(t * 1e3, 2)
    print(json.dumps(res2))


if __name__ == "__main__":
    main()
