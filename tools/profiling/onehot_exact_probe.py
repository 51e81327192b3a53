"""Probe: is a one-hot selection dot BIT-EXACT on the compiled MXU?

The natural-layout kernels compact replicated (8, T_W) per-block rows to
(8, T_W//8) via dot(stack, one_hot) -- Mosaic rejects in-kernel cross-lane
gathers, so the MXU is the only compaction path. The parity gates require
compiled == interpret bit-equality, so the selection dot must pass every
f32 (and f32-converted int) through EXACTLY. Precision.HIGHEST splits f32
into 3 bf16 parts (8+8+8 mantissa bits >= f32's 24), and x*1 summed over
non-overlapping parts should reconstruct x exactly; this probe checks that
claim on the real device with full-mantissa values, plus the int32-in-f32
range boundary (2^24).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

T_W = 1024


def _kernel(x_ref, o_ref):
    x = x_ref[...]
    tw = x.shape[-1]
    sel = (lax.broadcasted_iota(jnp.int32, (tw, tw // 8), 0)
           == 8 * lax.broadcasted_iota(jnp.int32, (tw, tw // 8), 1)
           ).astype(jnp.float32)
    o_ref[...] = jax.lax.dot_general(
        x, sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)


@jax.jit
def compact(x):
    r = x.shape[0]
    return pl.pallas_call(
        _kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((r, T_W), lambda i: (0, i))],
        out_specs=pl.BlockSpec((r, T_W // 8), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((r, T_W // 8), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(x)


def main():
    rng = np.random.default_rng(0)
    cases = {
        # full-mantissa f32 across magnitudes (err sums, averages, normals)
        "uniform_mantissa": (rng.random((16, T_W), np.float32) * 2 - 1)
        * np.exp2(rng.integers(-30, 30, (16, T_W))).astype(np.float32),
        # int32 values through f32: in and beyond the 24-bit exact range
        "ints_24bit": rng.integers(-(2**24), 2**24, (8, T_W)).astype(np.float32),
        "ints_30bit_inexact_convert": rng.integers(
            -(2**30), 2**30, (8, T_W)).astype(np.float32),
        "negzero_denorm": np.array(
            [[-0.0, np.float32(1e-42), np.float32(-1e-40), 3.4e38]
             * (T_W // 4)] * 8, np.float32),
    }
    ok = True
    for name, x in cases.items():
        xj = jnp.asarray(x)
        got = np.asarray(compact(xj))
        want = x[:, ::8]
        exact = np.array_equal(got.view(np.int32), want.view(np.int32))
        bits = (np.abs(got.view(np.int32) - want.view(np.int32))).max()
        print(f"{name}: bit-exact={exact} (max int32-repr delta {bits})")
        ok &= bool(exact)
    print("PROBE RESULT:", "EXACT" if ok else "NOT EXACT")


if __name__ == "__main__":
    main()
