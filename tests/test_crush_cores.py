"""Batched-candidate crush core parity.

The segment crush search evaluates candidate shift triples through either a
per-candidate lax.scan (``eval_fn``) or a batched evaluator (``eval_batch``,
used on the TPU kernel path -- one launch + K-wide segment reductions).
Selection semantics must be IDENTICAL: same admissibility, same
(total shift, block error, later-candidate) tie-breaking. The reference
analog is the serial scan order of src/limg_bit_crush.h:395-500.

The batched Pallas kernel itself (crush_eval_rows_k_pallas) is checked
against the unbatched kernel in interpret mode here; the compiled-Mosaic
equality runs on the real device in tools/tpu_parity_gate.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from limg_tpu.config import EncodeConfig
from limg_tpu.ops import crush as C


@pytest.mark.parametrize("mode", ["ladder", "exhaustive", "guess"])
def test_batched_core_matches_scan_core(mode):
    rng = np.random.default_rng(7)
    n = 37
    cfg = EncodeConfig(error_factor=12, crush_mode=mode)
    base = jnp.asarray(rng.integers(0, 2000, (n,)), jnp.int32)
    pxm = jnp.asarray(rng.integers(0, 300, (n,)), jnp.int32)

    def eval_fn(s):
        t = jnp.minimum(s, 8).sum(axis=0)
        return pxm + t * 13, base + t * t * 57

    def eval_batch(cands):
        outs = [eval_fn(cands[i]) for i in range(cands.shape[0])]
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]))

    count = jnp.full((n,), 64, jnp.int32)
    core = {"ladder": C.ladder_core, "exhaustive": C.exhaustive_core,
            "guess": C.guess_core}[mode]
    s1, e1 = core(eval_fn, count, cfg, 0, n, None)
    s2, e2 = core(eval_fn, count, cfg, 0, n, None, eval_batch=eval_batch)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(np.asarray(e1), np.asarray(e2))


def test_batched_kernel_matches_unbatched_interpret():
    from limg_tpu.pallas_kernels.encode_fixed import (
        crush_eval_rows_pallas, crush_eval_rows_k_pallas)

    rng = np.random.default_rng(3)
    p, nb, k, ch = 64, 50, 7, 3
    packed = jnp.asarray(rng.integers(0, 2**24, (p, nb)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (p, nb)), jnp.int32)
    f8 = jnp.asarray(rng.integers(0, 2**24, (p, nb)), jnp.int32)
    eps = [jnp.asarray(rng.integers(-50, 256, (ch, nb)), jnp.int32)
           for _ in range(6)]
    shifts_k = jnp.asarray(rng.integers(0, 9, (k, 3, nb)), jnp.int32)
    pmk, bek = crush_eval_rows_k_pallas(packed, mask, f8, eps, shifts_k, ch,
                                        interpret=True)
    for i in range(k):
        pm, be = crush_eval_rows_pallas(packed, mask, f8, eps, shifts_k[i],
                                        ch, interpret=True)
        assert np.array_equal(np.asarray(pm), np.asarray(pmk[i]))
        assert np.array_equal(np.asarray(be), np.asarray(bek[i]))
