"""Compare pixel-level vs block-level owner select for the merged path."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import functools
import numpy as np
import jax, jax.numpy as jnp
from limg_tpu import EncodeConfig
from limg_tpu.ops import layout
from limg_tpu.regions import encode_levels, merge_levels_alive, _owner_level
from limg_tpu.utils.timing import time_device_fn
from tools.make_test_image import make_4k

img_np = make_4k()
h, w = img_np.shape[:2]
img = jax.device_put(jnp.asarray(np.dstack([img_np, np.full((h, w, 1), 255, np.uint8)])))
cfg = EncodeConfig(error_factor=100, crush_mode="ladder")
key = jax.random.PRNGKey(0)
NUM_LEVELS = 3

def to_base_blocks(x, grid_l, lvl, grid0, bsz=8):
    """(P_L, NB_L) -> (64, NB0): relayout level-L blocks to level-0 blocks."""
    if lvl == 0:
        return x
    k = 1 << lvl
    gy, gx = grid_l.blocks_y, grid_l.blocks_x
    x = x.reshape(k, bsz, k, bsz, gy, gx)
    x = x.transpose(1, 3, 4, 0, 5, 2)          # (y0, x0, By, sy, Bx, sx)
    x = x.reshape(64, gy * k, gx * k)
    x = x[:, :grid0.blocks_y, :grid0.blocks_x]
    return x.reshape(64, grid0.num_blocks)

def common():
    grids, levels = encode_levels(img, cfg, key, NUM_LEVELS, True)
    alive, _ = merge_levels_alive([lv["decomp"] for lv in levels], grids, 3)
    owner = _owner_level(alive, grids, NUM_LEVELS)
    return grids, levels, owner

@jax.jit
def pixel_select():
    grids, levels, owner = common()
    owner_px = layout.broadcast_block_plane(owner, grids[0], 8)
    dec_imgs = [
        layout.unblockify(levels[l]["dec_packed"][None], grids[l], 8 << l)[..., 0]
        for l in range(NUM_LEVELS)
    ]
    out = dec_imgs[0]
    for l in range(1, NUM_LEVELS):
        out = jnp.where(owner_px == l, dec_imgs[l], out)
    return out.sum()

@jax.jit
def block_select():
    grids, levels, owner = common()
    out = levels[0]["dec_packed"]
    for l in range(1, NUM_LEVELS):
        xb = to_base_blocks(levels[l]["dec_packed"], grids[l], l, grids[0])
        out = jnp.where(owner[None, :] == l, xb, out)
    img_out = layout.unblockify(out[None], grids[0], 8)[..., 0]
    return img_out.sum()

# correctness check
a = jax.jit(pixel_select)()
b = jax.jit(block_select)()
print("agree:", bool(a == b))

for name, fn in [("pixel-level select", pixel_select), ("block-level select", block_select)]:
    per, det = time_device_fn(fn, iters=15, inner=3)
    print(f"{name:30s} {per*1e3:8.2f} ms (best {det['best_s']*1e3:.2f})")
