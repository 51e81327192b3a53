"""Probe P8: in-kernel natural (H, W) <-> block-major (64, by, bx) conversion.

The natural-layout merged pipeline needs the pixel plane in block-major
(pixel, block) order only for the coalesce pass's compact gather/scatter
(regions.coalesce_segments), and block-major planes back to natural for the
final decode image. If the kernels can convert layouts INSIDE VMEM at MXU
cost, the Morton/blockify relayouts (~3 ms of HBM round-trips per 4K)
disappear from the merged path entirely.

Construction (per (64, T_W) natural tile, T_W = 1024 px = 128 blocks):
  nat[8r+s, 8c+t] == bm[8s+t, r, c]
  forward:  for each sub-column t, one one-hot dot compacts lanes 8c+t -> c
            ((8, 8, 1024) @ (1024, 128)); the 8 results stack [t, r, s, c]
            and a LEADING-axis transpose (vreg relabel, no data movement)
            orders p = 8s+t.
  reverse:  per t, (8, 8, 128) @ (128, 1024) expands c -> lanes 8c+t; the
            8 results write disjoint lanes so a sum recombines them.
Exact int32 transport: f32 is exact only to 2^24, packed RGBA words use all
32 bits -> split into u16 halves, convert each, recombine.

Run on the real TPU: python tools/profiling/blockmajor_probe.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_W = 1024
T_H = 64


def _onehot_compact(tw):
    # E[j, c] = (j == 8c + t) for t folded in by caller shift
    j = lax.broadcasted_iota(jnp.int32, (tw, tw // 8), 0)
    c = lax.broadcasted_iota(jnp.int32, (tw, tw // 8), 1)
    return j, c


def _nat_to_bm_f32(nat, tw, prec):
    """(64, tw) f32 natural tile -> (64, 8, tw//8) block-major [p, r, c]."""
    x = nat.reshape(8, 8, tw)                        # [r, s, lane]
    j, c = _onehot_compact(tw)
    outs = []
    for t in range(8):
        e = (j == 8 * c + t).astype(jnp.float32)     # (tw, tw//8)
        y = lax.dot_general(x, e, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
        outs.append(y)                               # (8, 8, tw//8) [r, s, c]
    stk = jnp.stack(outs)                            # [t, r, s, c]
    return stk.transpose(2, 0, 1, 3).reshape(64, 8, tw // 8)


def _bm_to_nat_f32(bm, tw, prec):
    """(64, 8, tw//8) block-major [p=8s+t, r, c] -> (64, tw) natural."""
    x = bm.reshape(8, 8, 8, tw // 8)                 # [s, t, r, c]
    j, c = _onehot_compact(tw)
    acc = None
    for t in range(8):
        e = (j == 8 * c + t).astype(jnp.float32).T   # (tw//8, tw)
        y = lax.dot_general(x[:, t], e, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
        acc = y if acc is None else acc + y          # (8, 8, tw) [s, r, lane]
    return acc.transpose(1, 0, 2).reshape(64, tw)


def _i32_via_halves(fun, x, tw):
    lo = (x & 0xFFFF).astype(jnp.float32)
    hi = ((x >> 16) & 0xFFFF).astype(jnp.float32)
    p = lax.Precision.HIGHEST
    return (fun(lo, tw, p).astype(jnp.int32)
            | (fun(hi, tw, p).astype(jnp.int32) << 16))


def _i32_via_bytes(fun, x, tw):
    # 8-bit chunks are exact in bf16 (8 significand bits), so DEFAULT
    # precision MXU passes stay exact at 2x the dot count of halves
    p = lax.Precision.DEFAULT
    out = None
    for k in range(4):
        b = fun(((x >> (8 * k)) & 0xFF).astype(jnp.float32), tw, p)
        b = b.astype(jnp.int32) << (8 * k)
        out = b if out is None else out | b
    return out


def _fwd_kernel(nat_ref, bm_ref):
    bm_ref[...] = _i32_via_halves(_nat_to_bm_f32, nat_ref[...], T_W)


def _rev_kernel(bm_ref, nat_ref):
    nat_ref[...] = _i32_via_halves(_bm_to_nat_f32, bm_ref[...], T_W)


def _fwd_kernel_b(nat_ref, bm_ref):
    bm_ref[...] = _i32_via_bytes(_nat_to_bm_f32, nat_ref[...], T_W)


def _rev_kernel_b(bm_ref, nat_ref):
    nat_ref[...] = _i32_via_bytes(_bm_to_nat_f32, bm_ref[...], T_W)


@functools.partial(jax.jit, static_argnames=("hp", "wp", "variant"))
def nat_to_bm(nat, hp, wp, variant="dot"):
    gy, gx = hp // T_H, wp // T_W
    kern = _fwd_kernel if variant == "dot" else _fwd_kernel_b
    return pl.pallas_call(
        kern,
        grid=(gy, gx),
        in_specs=[pl.BlockSpec((T_H, T_W), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((64, 8, T_W // 8), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((64, hp // 8, wp // 8), jnp.int32),
        interpret=jax.default_backend() == "cpu",
    )(nat)


@functools.partial(jax.jit, static_argnames=("hp", "wp", "variant"))
def bm_to_nat(bm, hp, wp, variant="dot"):
    gy, gx = hp // T_H, wp // T_W
    return pl.pallas_call(
        _rev_kernel if variant == "dot" else _rev_kernel_b,
        grid=(gy, gx),
        in_specs=[pl.BlockSpec((64, 8, T_W // 8), lambda i, j: (0, i, j))],
        out_specs=pl.BlockSpec((T_H, T_W), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        interpret=jax.default_backend() == "cpu",
    )(bm)


def main():
    sys.path.insert(0, "/root/repo")
    from limg_tpu.utils.timing import time_device_fns

    hp, wp = 2176, 4096          # 4K padded to tile multiples
    rng = np.random.default_rng(7)
    nat_np = rng.integers(-2**31, 2**31, (hp, wp), np.int64).astype(np.int32)
    by, bx = hp // 8, wp // 8
    # numpy reference block-major
    bm_ref = (nat_np.reshape(by, 8, bx, 8).transpose(1, 3, 0, 2)
              .reshape(64, by, bx))
    nat = jnp.asarray(nat_np)

    bm_dev = jnp.asarray(bm_ref)
    fns = {}
    for variant in ("bytes", "dot"):
        try:
            print(f"compiling nat->bm ({variant}) ...", flush=True)
            bm = np.asarray(nat_to_bm(nat, hp, wp, variant=variant))
            ok_f = np.array_equal(bm, bm_ref)
            print(f"fwd[{variant}] exact:", ok_f, flush=True)
            print(f"compiling bm->nat ({variant}) ...", flush=True)
            back = np.asarray(bm_to_nat(bm_dev, hp, wp, variant=variant))
            ok_r = np.array_equal(back, nat_np)
            print(f"rev[{variant}] exact:", ok_r, flush=True)
            if ok_f and ok_r:
                fns[f"nat_to_bm_{variant}"] = (
                    lambda v=variant: nat_to_bm(nat, hp, wp, variant=v))
                fns[f"bm_to_nat_{variant}"] = (
                    lambda v=variant: bm_to_nat(bm_dev, hp, wp, variant=v))
        except Exception as e:  # noqa: BLE001
            print(f"{variant} FAILED:", type(e).__name__, str(e)[:200],
                  flush=True)
    if not fns:
        return
    samples, rtt = time_device_fns(fns, rounds=6, inner=4)
    print(f"rtt {rtt * 1e3:.1f} ms")
    for name, vals in samples.items():
        print(f"{name}: median {np.median(vals) * 1e3:.3f} ms  (rounds: "
              + " ".join(f"{v * 1e3:.2f}" for v in vals))


if __name__ == "__main__":
    main()
