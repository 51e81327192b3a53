"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use XLA's host
platform device-count override. In this environment a sitecustomize hook
pre-imports JAX bound to the axon TPU backend before conftest runs, so
setting env vars here is too late -- if we detect that, we re-exec pytest
once with the hook disabled and the CPU mesh configured.
"""

import os
import sys

import numpy as np
import pytest

_REEXEC_FLAG = "_LIMG_TPU_TESTS_REEXEC"


def _jax_is_cpu_mesh() -> bool:
    if (os.environ.get("JAX_PLATFORMS") != "cpu"
            or os.environ.get("PALLAS_AXON_POOL_IPS")):
        # don't probe jax.default_backend() here: initializing the backend
        # with the axon hook active dials the TPU tunnel, which HANGS every
        # process (even CPU-targeted ones) when the tunnel is down --
        # re-exec'ing on env evidence alone stays safe either way
        return False
    import jax

    try:
        return jax.default_backend() == "cpu" and jax.device_count() >= 8
    except Exception:
        return False


def pytest_configure(config):
    if (
        os.environ.get(_REEXEC_FLAG)
        or os.environ.get("LIMG_TPU_TESTS_ON_TPU")  # escape hatch
        or _jax_is_cpu_mesh()
    ):
        return
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable the TPU sitecustomize hook
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    # Persistent compile cache: OPT-IN ONLY (set LIMG_TPU_TESTS_CPU_CACHE=1
    # and run one module at a time). XLA:CPU's executable serialize AND
    # deserialize segfault on the largest merged/legacy graphs once the
    # process already holds many compiled executables -- reproduced
    # deterministically mid-suite at the same test with the native runtime
    # fully disabled (pure jax stack: compilation_cache.get_executable_and
    # _time -> zstandard/deserialize), while the identical read succeeds in
    # a fresh process. A full `pytest tests/` run must never touch the
    # cache or it dies at ~test 45.
    if env.get("LIMG_TPU_TESTS_CPU_CACHE"):
        env.setdefault(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache_cpu"),
        )
        env.setdefault(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1000000000"
        )
    env[_REEXEC_FLAG] = "1"
    # XLA:CPU's LLVM backend segfaulted compiling the largest graphs late
    # in the suite (state-dependent: the same compile succeeds in a fresh
    # process). Max out the stack rlimit for the re-exec'd run so deep
    # native recursion has headroom.
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        resource.setrlimit(resource.RLIMIT_STACK, (hard, hard))
    except Exception:
        pass
    # release pytest's fd capture so the re-exec'd run owns the terminal
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    args = list(config.invocation_params.args)
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *args], env)


# modules dominated by interpret-mode Pallas kernels or randomized sweeps;
# the fast tier (-m "not slow") keeps the pure-jnp/golden/native suites
_SLOW_MODULES = {
    "test_pallas_kernel",
    "test_merged_fused",
    "test_natural",
    "test_property",
    "test_reference_oracle",
    "test_regions",
    "test_segment_kernel",
    "test_sharding",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def make_test_image(rng, h=40, w=56, kind="gradient+noise"):
    """Small structured test image: smooth gradients + edges + noise."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 40 + 150 * x / w + 8 * rng.standard_normal((h, w))
    g = 30 + 180 * y / h + 8 * rng.standard_normal((h, w))
    b = 128 + 90 * np.sin(x / 7.0) * np.cos(y / 5.0) + 8 * rng.standard_normal((h, w))
    img = np.stack([r, g, b, np.full((h, w), 255.0)], axis=-1)
    # hard edge region
    img[h // 3 : h // 2, w // 4 : w // 2, :3] = [220, 40, 180]
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="session")
def test_image(rng):
    return make_test_image(rng)
