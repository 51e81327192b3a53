"""Measure the merged-path timing breakdown on the real TPU (4K image)."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import functools
import numpy as np
import jax, jax.numpy as jnp
from limg_tpu import EncodeConfig
from limg_tpu.ops import layout
from limg_tpu.regions import encode_image_merged_device, encode_levels, merge_levels_alive
from limg_tpu.pallas_kernels.encode_fixed import encode_blocks_pallas, pack_channels
from limg_tpu.utils.timing import time_device_fn
from tools.make_test_image import make_4k

img_np = make_4k()
h, w = img_np.shape[:2]
img = jnp.asarray(np.dstack([img_np, np.full((h, w, 1), 255, np.uint8)]))
img = jax.device_put(img)
cfg = EncodeConfig(error_factor=100, crush_mode="ladder")
key = jax.random.PRNGKey(0)

def report(name, fn):
    per, det = time_device_fn(fn, iters=15, inner=3)
    print(f"{name:42s} {per*1e3:8.2f} ms  (best {det['best_s']*1e3:.2f}, rtt {det['rtt_s']*1e3:.1f})")
    return per

# full merged, no planes
full = functools.partial(encode_image_merged_device, img, cfg, key, 3, True, False, "match", 0.01)
report("merged 3-level (pallas, no planes)", jax.jit(lambda: full()))

# per-level kernel only
for lvl in range(3):
    bsz = 8 << lvl
    px, mask, grid = layout.blockify(img, bsz)
    packed = jax.device_put(pack_channels(px))
    maskd = jax.device_put(mask)
    report(f"kernel only P={bsz*bsz} (pre-blockified)",
           lambda packed=packed, maskd=maskd: encode_blocks_pallas(packed, maskd, cfg, jnp.int32(0))[:3])

# encode_levels (includes blockify+pack from the image)
@functools.partial(jax.jit, static_argnames=())
def levels_only():
    grids, levels = encode_levels(img, cfg, key, 3, True)
    return [lv["dec_packed"].sum() for lv in levels]
report("encode_levels 3x (blockify+kernel)", levels_only)

# match predicate only
grids, levels = encode_levels(img, cfg, key, 3, True)
decomps = [jax.device_put(jax.tree.map(np.asarray, lv["decomp"])) for lv in levels]
@jax.jit
def match_only():
    alive, _ = merge_levels_alive(decomps, grids, cfg.channels)
    return [a.sum() for a in alive]
report("match predicate (merge_levels_alive)", match_only)

# full merged WITH planes
fullp = functools.partial(encode_image_merged_device, img, cfg, key, 3, True, True, "match", 0.01)
report("merged 3-level (pallas, with planes)", jax.jit(lambda: fullp()))
