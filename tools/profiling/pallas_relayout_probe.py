"""Probe: can a Pallas kernel beat XLA's Morton blockify relayout chain?

ANSWER (measured 2026-08-18, TPU v5e, 4K i32 plane): NO — keep the XLA
two-pass chain (ops.layout.blockify_packed + morton_embed_rows, ~1.6 ms
per direction). Every Pallas formulation of the (H, W) -> (64, NB)
pixel-to-block-lane relayout fails or loses:

1. In-kernel reshape/transpose ((8, 1024) -> (8, 128, 8) -> transpose),
   and the fused 7-D Morton variant: Mosaic rejects both with
   `infer-vector-layout: unsupported shape cast` (lane-dim splits below
   128 lanes are not supported shape casts).
2. Lane gather (`take_along_axis` with a constant 1024-lane permutation):
   `Not implemented: Multiple source vregs along gather dimension` —
   tpu.dynamic_gather only permutes within one 128-lane vreg, and the
   blockify permutation inherently crosses vregs (in lane b*8+px ->
   out lane px*128+b).
3. MXU one-hot matmul (two u16-half f32 dots against a (1024, 1024)
   selection matrix; bit-exact): compiles (needs
   vmem_limit_bytes=64M — the f32 one-hot double-buffers at 4 MB) but
   runs at 5.81 ms vs XLA's 1.58 ms for the same relayout: an (8, 1024)
   LHS uses 8/128 MXU rows, so the systolic array runs at ~6%
   utilization. bf16/u8-plane splits would still lose at 4 dots.

The deeper fix — if the relayout budget (~4.3 ms/4K across input +
decode-output chains, xplane 2026-08-18) ever matters again — is to make
the fused kernels consume/produce the natural (H, W) row-major layout and
express per-block reductions as sublane reductions + lane rolls inside the
kernel, eliminating the materialized (64, NB) planes entirely. That is a
rewrite of fit_levels/owner_crush internals, not a relayout kernel.

This file retains the MXU variant (the only compiling one) so the
measurement can be reproduced:
run `python tools/profiling/pallas_relayout_probe.py` on the TPU.
"""

import os
import sys
import json

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)


def main():
    from limg_tpu.utils.timing import time_device_fn

    H, WP = 2160, 4096
    S = np.zeros((1024, 1024), np.float32)
    for b in range(128):
        for px in range(8):
            S[b * 8 + px, px * 128 + b] = 1.0

    def k_mxu(in_ref, sel_ref, out_ref):
        x = in_ref[...]
        s = sel_ref[...]
        lo = (x & 0xFFFF).astype(jnp.float32)
        hi = ((x >> 16) & 0xFFFF).astype(jnp.float32)
        plo = jax.lax.dot(lo, s, precision=jax.lax.Precision.HIGHEST)
        phi = jax.lax.dot(hi, s, precision=jax.lax.Precision.HIGHEST)
        out_ref[...] = (plo.astype(jnp.int32)
                        | (phi.astype(jnp.int32) << 16)).reshape(64, 128)

    gy, gx = H // 8, WP // 1024
    f = pl.pallas_call(
        k_mxu,
        out_shape=jax.ShapeDtypeStruct((64, gy * gx * 128), jnp.int32),
        grid=(gy, gx),
        in_specs=[pl.BlockSpec((8, 1024), lambda i, j: (i, j)),
                  pl.BlockSpec((1024, 1024), lambda i, j: (0, 0))],
        out_specs=pl.BlockSpec((64, 128), lambda i, j: (0, i * gx + j)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )
    x = (jnp.arange(H * WP, dtype=jnp.int32).reshape(H, WP)
         * jnp.int32(-1640531527))
    sel = jnp.asarray(S)
    got = np.asarray(jax.jit(f)(x, sel)).reshape(64, gy, gx * 128)
    ref = (np.asarray(x).reshape(gy, 8, WP // 8, 8)
           .transpose(1, 3, 0, 2).reshape(64, gy, WP // 8))
    res = {"mxu_bit_exact": bool(np.array_equal(got, ref))}
    t, _ = time_device_fn(lambda: f(x, sel), iters=20, inner=10)
    res["mxu_ms"] = round(t * 1e3, 3)

    def xla_blockify(img):
        t4 = img.reshape(gy, 8, WP // 8, 8)
        return t4.transpose(1, 3, 0, 2).reshape(64, gy * (WP // 8))

    fx = jax.jit(xla_blockify)
    t, _ = time_device_fn(lambda: fx(x), iters=20, inner=10)
    res["xla_ms"] = round(t * 1e3, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
