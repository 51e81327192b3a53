"""Trustworthy device timing under tunneled/async backends.

On some JAX backends (notably the tunneled axon TPU used here),
``jax.block_until_ready`` can return before device execution finishes, which
silently produces fantasy benchmark numbers. The only reliable
synchronization point is a host fetch of device data. ``time_device_fn``
times N back-to-back dispatches and synchronizes by fetching a scalar
derived from the last output; the pure fetch round-trip (measured on an
already-computed buffer) is subtracted and amortized over the batch.
"""

from __future__ import annotations

import time

import numpy as np
import jax


def _sync_scalar(out):
    """Fetch one scalar from an arbitrary pytree of device arrays.

    Indexes a single element rather than reshape(-1)[:1]: the reshape
    dispatches a full relayout of the output (measured multiple ms on a
    (H, W) plane), which would be charged to the timed batch."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def time_device_fn(fn, *args, iters: int = 20, inner: int = 5):
    """Returns (seconds_per_call, details dict)."""
    out = fn(*args)           # warmup / compile
    _sync_scalar(out)

    # pure fetch RTT on the already-computed buffer
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync_scalar(out)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    batches = max(1, iters // inner)
    batch_times = []
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync_scalar(out)
        batch_times.append(time.perf_counter() - t0)
    batch = float(np.median(batch_times))
    per_call = max(batch - rtt, 1e-9) / inner
    # per-call samples (one per batch) for the reference-style mean/min/max/
    # stddev report (src/main.cpp:310-323); stddev needs >= 2 samples
    samples = np.maximum(np.asarray(batch_times) - rtt, 1e-9) / inner
    best = float(samples.min())
    return per_call, {
        "batch_s": batch,
        "rtt_s": rtt,
        "best_s": best,
        "worst_s": float(samples.max()),
        "std_s": float(samples.std(ddof=1)) if samples.size > 1 else 0.0,
        "batches": [round(b, 5) for b in batch_times],
    }


def time_device_fns(fns: dict, rounds: int = 10, inner: int = 5):
    """Interleaved timing of several paths under SHARED contention.

    The shared dev TPU pool's load varies 1-2.2x on a ~minute timescale, so
    timing path A for a while and then path B charges the two paths
    different contention levels and produces fantasy ratios (we measured the
    same two paths at 0.95x and 1.43x of each other on the same day that
    way). This round-robins small batches of every fn, so each round's
    samples share one contention level and per-round RATIOS are trustworthy
    even when absolute times are not.

    Returns (samples, rtt_s): ``samples[name]`` is a list of
    seconds-per-call, one entry per round, in round order.
    """
    outs = {}
    for name, fn in fns.items():
        outs[name] = fn()                 # warmup / compile
        _sync_scalar(outs[name])

    first = next(iter(outs))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync_scalar(outs[first])
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    samples = {name: [] for name in fns}
    for _ in range(rounds):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(inner):
                out = fn()
            _sync_scalar(out)
            samples[name].append(
                max(time.perf_counter() - t0 - rtt, 1e-9) / inner
            )
    return samples, rtt


def device_busy_ms(fn, iters: int = 3):
    """Contention-free device-busy time of ``fn`` per call, via an xplane
    trace (ms), or None when tracing/parsing is unavailable.

    The shared TPU pool adds 1-2.2x wall-clock contention noise that
    rtt-subtraction cannot remove (it delays whole dispatch batches); the
    xplane XLA-op duration total is ground truth for cross-round
    comparisons (CLAUDE.md timing rules). Uses the pure-python protobuf
    parser (PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION must be ``python``
    before protobuf first loads; set by callers like bench.py).
    """
    import glob
    import os
    import shutil
    import tempfile

    trace_dir = tempfile.mkdtemp(prefix="limg_xplane_")
    try:
        _sync_scalar(fn())                    # warm (compile outside trace;
        #                                       fn may return a pytree)
        with jax.profiler.trace(trace_dir):
            for _ in range(iters):
                _sync_scalar(fn())
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

        total = 0
        for path in glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                              recursive=True):
            xs = xplane_pb2.XSpace()
            with open(path, "rb") as f:
                xs.ParseFromString(f.read())
            for plane in xs.planes:
                if "TPU" not in plane.name and "/device" not in plane.name:
                    continue
                for line in plane.lines:
                    if line.name != "XLA Ops":
                        continue
                    for ev in line.events:
                        total += ev.duration_ps
        if total == 0:
            return None
        return total / 1e9 / iters
    except Exception:
        return None
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
