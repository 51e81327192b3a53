"""Compiled-kernel parity gate on the REAL TPU.

The rest of the suite exercises the Pallas kernels in interpret mode on the
virtual CPU mesh; Mosaic compilation could drift from the interpreter. This
test (marker ``tpu``) runs only when a TPU backend is active, e.g.:

    LIMG_TPU_TESTS_ON_TPU=1 python -m pytest tests/test_tpu_parity.py -m tpu

(serialize TPU access: never run alongside another TPU process). It asserts
the compiled kernel == jnp bit-equality on shifts/endpoints/factors/decode
for all crush modes and P in {64, 256, 1024, 4096}; see
tools/tpu_parity_gate.py for the standalone script the docs cite.
"""

import pytest


def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


@pytest.mark.tpu
@pytest.mark.skipif(not _on_tpu(), reason="needs the real TPU backend")
def test_compiled_kernel_bit_parity():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.tpu_parity_gate import run_gate

    results, failures = run_gate()
    assert results, "gate produced no cases"
    assert not failures, f"compiled-kernel parity failures: {failures}"
