"""Gather vs reshape/transpose for the Morton lane relayouts (4K grid).

The fused merged driver needs row-major -> Morton lanes on the way in and
the inverse on the way out (33 MB pixel planes on a 4K). Both are static
permutations; this probe times the two lowerings of each:
  embed_gather    packed[:, safe] with a where-fill        (old driver code)
  embed_transpose morton_embed_rows reshape/transpose      (current driver)
  restore_gather  x[:, inv]
  restore_transpose morton_restore_rows

Run: python tools/profiling/morton_relayout_probe.py
"""

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

from limg_tpu.pallas_kernels.encode_merged import (
    morton_perm, morton_embed_rows, morton_restore_rows,
)
from limg_tpu.utils.timing import time_device_fn


def main():
    by, bx, levels = 270, 480, 3                  # 4K block grid
    nb = by * bx
    perm, byp, bxp = morton_perm(by, bx, levels)
    nbp = perm.size
    safe = jnp.asarray(np.maximum(perm, 0))
    valid = jnp.asarray(perm >= 0)
    inv = np.empty(nb, np.int64)
    inv[perm[perm >= 0]] = np.nonzero(perm >= 0)[0]
    inv_j = jnp.asarray(inv)

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 1 << 30, (64, nb)).astype(np.int32))
    x_m = jax.device_put(rng.integers(0, 1 << 30, (64, nbp)).astype(np.int32))

    fns = {
        "embed_gather": jax.jit(
            lambda a: jnp.where(valid[None, :], a[:, safe], 0)
        ),
        "embed_transpose": jax.jit(
            lambda a: morton_embed_rows(a, by, bx, levels)
        ),
        "restore_gather": jax.jit(lambda a: a[:, inv_j]),
        "restore_transpose": jax.jit(
            lambda a: morton_restore_rows(a, by, bx, levels)
        ),
    }
    # correctness cross-check on device before timing
    assert np.array_equal(np.asarray(fns["embed_gather"](x)),
                          np.asarray(fns["embed_transpose"](x)))
    assert np.array_equal(np.asarray(fns["restore_gather"](x_m)),
                          np.asarray(fns["restore_transpose"](x_m)))

    res = {}
    for name, fn in fns.items():
        arg = x if name.startswith("embed") else x_m
        t, _ = time_device_fn(lambda f=fn, a=arg: f(a), iters=30, inner=10)
        res[f"{name}_ms"] = round(t * 1e3, 3)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
