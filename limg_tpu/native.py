"""ctypes bindings for the native host runtime (runtime/limg_runtime.cpp).

The shared library is built automatically on first use when a compiler and
the source tree are present (the same g++ invocation as
tools/build_runtime.sh); `pip install -e .` also builds it via setup.py.
Every entry point has a pure-Python/NumPy fallback so the package works
without the shared library; ``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _find_or_build_lib() -> str | None:
    """Locate liblimg_runtime.so, compiling it on demand from a source tree.

    Search order: packaged next to this module (wheel installs), then the
    repo's build/ dir; if absent or older than runtime/limg_runtime.cpp and
    the source + g++ exist, (re)build into build/. Returns a path or None.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(pkg_dir)
    packaged = os.path.join(pkg_dir, "liblimg_runtime.so")
    built = os.path.join(repo, "build", "liblimg_runtime.so")
    src = os.path.join(repo, "runtime", "limg_runtime.cpp")
    if os.path.exists(src):
        stale = (not os.path.exists(built)
                 or os.path.getmtime(built) < os.path.getmtime(src))
        if stale:
            try:
                os.makedirs(os.path.dirname(built), exist_ok=True)
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                     "-march=native", src, "-o", built, "-lpthread"],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                pass  # fall through to whatever exists
        if os.path.exists(built):
            return built
    for path in (packaged, built):
        if os.path.exists(path):
            return path
    return None


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("LIMG_TPU_DISABLE_NATIVE"):
        # escape hatch: force every entry point onto its NumPy fallback
        # (A/B debugging of suspected native-side memory issues)
        return None
    path = _find_or_build_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.limg_rt_blockify_u32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.limg_rt_unblockify_u32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.limg_rt_write_tga_rgba.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.limg_rt_write_tga_rgba.restype = ctypes.c_int
    lib.limg_rt_write_tga_gray.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.limg_rt_write_tga_gray.restype = ctypes.c_int
    lib.limg_rt_read_tga.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.limg_rt_read_tga.restype = ctypes.c_int
    lib.limg_rt_pool_new.argtypes = [ctypes.c_int]
    lib.limg_rt_pool_new.restype = ctypes.c_void_p
    lib.limg_rt_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.limg_rt_pool_stage_file.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.limg_rt_pool_await.argtypes = [ctypes.c_void_p]
    lib.limg_rt_max_threads.restype = ctypes.c_int64
    if hasattr(lib, "limg_rt_rans_encode"):
        lib.limg_rt_rans_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.limg_rt_rans_encode.restype = ctypes.c_int64
        lib.limg_rt_rans_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.limg_rt_rans_decode.restype = ctypes.c_int
    if hasattr(lib, "limg_rt_factor_extract"):
        lib.limg_rt_factor_extract.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.limg_rt_factor_pack_axis.argtypes = [ctypes.c_void_p] * 5 + [
            ctypes.c_int64] + [ctypes.c_void_p] * 5
        lib.limg_rt_factor_pack_axis.restype = ctypes.c_int64
        lib.limg_rt_factor_unpack_axis_syms.argtypes = [
            ctypes.c_void_p] * 5 + [ctypes.c_int64, ctypes.c_void_p]
        lib.limg_rt_factor_unpack_axis_raw.argtypes = [
            ctypes.c_void_p] * 4 + [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p]
        lib.limg_rt_decode_blocks.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.limg_rt_pack_headers.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_void_p,
        ]
        lib.limg_rt_unpack_headers.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
    _LIB = lib
    return lib


def available() -> bool:
    return _lib() is not None


def blockify_packed(image_rgba: np.ndarray):
    """(H, W, 4) uint8 -> ((64, NB) uint32 packed, (64, NB) uint8 mask).

    Native when the shared lib is built; NumPy otherwise. Layout matches
    limg_tpu.ops.layout.blockify + pallas_kernels.pack_channels.
    """
    h, w = image_rgba.shape[:2]
    by, bx = -(-h // 8), -(-w // 8)
    nb = by * bx
    img32 = np.ascontiguousarray(image_rgba).view(np.uint32).reshape(h, w)
    lib = _lib()
    packed = np.empty((64, nb), np.uint32)
    mask = np.empty((64, nb), np.uint8)
    if lib is not None:
        lib.limg_rt_blockify_u32(
            img32.ctypes.data, h, w, packed.ctypes.data, mask.ctypes.data
        )
        return packed, mask
    # NumPy fallback
    pad = np.zeros((by * 8, bx * 8), np.uint32)
    pad[:h, :w] = img32
    m = np.zeros((by * 8, bx * 8), np.uint8)
    m[:h, :w] = 1
    t = pad.reshape(by, 8, bx, 8).transpose(1, 3, 0, 2).reshape(64, nb)
    tm = m.reshape(by, 8, bx, 8).transpose(1, 3, 0, 2).reshape(64, nb)
    return t, tm


def unblockify_packed(packed: np.ndarray, h: int, w: int) -> np.ndarray:
    """(64, NB) uint32 -> (H, W, 4) uint8."""
    lib = _lib()
    out = np.empty((h, w), np.uint32)
    if lib is not None:
        packed = np.ascontiguousarray(packed, np.uint32)
        lib.limg_rt_unblockify_u32(packed.ctypes.data, h, w, out.ctypes.data)
    else:
        by, bx = -(-h // 8), -(-w // 8)
        t = packed.reshape(8, 8, by, bx).transpose(2, 0, 3, 1).reshape(by * 8, bx * 8)
        out = t[:h, :w].copy()
    return out.view(np.uint8).reshape(h, w, 4)


def write_tga(path: str, data: np.ndarray) -> None:
    lib = _lib()
    if lib is None:
        from .io import write_tga as py_write

        py_write(path, data)
        return
    data = np.ascontiguousarray(data)
    h, w = data.shape[:2]
    if data.ndim == 2:
        rc = lib.limg_rt_write_tga_gray(path.encode(), data.ctypes.data, h, w)
    else:
        rgba = data.view(np.uint32).reshape(h, w)
        rc = lib.limg_rt_write_tga_rgba(path.encode(), rgba.ctypes.data, h, w)
    if rc != 0:
        raise IOError(f"tga write failed: {rc}")


def read_tga(path: str) -> np.ndarray:
    lib = _lib()
    if lib is None:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGBA"))
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    rc = lib.limg_rt_read_tga(path.encode(), None, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"tga probe failed: {rc}")
    out = np.empty((h.value, w.value), np.uint32)
    rc = lib.limg_rt_read_tga(path.encode(), out.ctypes.data, None, None)
    if rc != 0:
        raise IOError(f"tga read failed: {rc}")
    return out.view(np.uint8).reshape(h.value, w.value, 4)


class StagingPool:
    """Native worker pool that decodes + blockifies a corpus of same-size
    images into preallocated slots, overlapping host IO with device encode.
    The TPU-era replacement for the reference's compute thread pool
    (src/limg_threading.h:9-17)."""

    def __init__(self, threads: int | None = None):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native runtime not built; run tools/build_runtime.sh")
        self._lib = lib
        n = threads or max(1, lib.limg_rt_max_threads())
        self._pool = lib.limg_rt_pool_new(int(n))
        self._keepalive = []

    def stage(self, path: str, h: int, w: int):
        """Queue a file; returns (packed, mask, status) arrays filled async.
        status[0] becomes 1 on success, <0 on error."""
        by, bx = -(-h // 8), -(-w // 8)
        nb = by * bx
        packed = np.empty((64, nb), np.uint32)
        mask = np.empty((64, nb), np.uint8)
        status = np.zeros(1, np.int32)
        self._keepalive.append((packed, mask, status))
        self._lib.limg_rt_pool_stage_file(
            self._pool, path.encode(), packed.ctypes.data, mask.ctypes.data,
            h, w, status.ctypes.data,
        )
        return packed, mask, status

    def await_all(self):
        self._lib.limg_rt_pool_await(self._pool)

    def close(self):
        if self._pool:
            self._lib.limg_rt_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# rANS entropy codec (LTP1 v3 factor planes). Native fast path; the NumPy
# fallback implements the identical 32-bit-state / byte-renorm / 12-bit-probs
# coder so streams are interchangeable between the two.
# ---------------------------------------------------------------------------

RANS_PROB_BITS = 12
RANS_PROB_SCALE = 1 << RANS_PROB_BITS
_RANS_LOW = 1 << 23


def rans_quantize_freqs(counts: np.ndarray) -> np.ndarray:
    """Histogram (256,) -> quantized freqs summing to RANS_PROB_SCALE,
    every occurring symbol >= 1."""
    counts = np.asarray(counts, np.int64)
    total = counts.sum()
    if total == 0:
        f = np.zeros(256, np.uint32)
        f[0] = RANS_PROB_SCALE
        return f
    f = np.maximum((counts * RANS_PROB_SCALE) // total, (counts > 0).astype(np.int64))
    # fix drift on the largest symbol (guaranteed to stay >= 1)
    drift = int(f.sum()) - RANS_PROB_SCALE
    order = np.argsort(-f)
    i = 0
    while drift != 0:
        j = order[i % 256]
        if drift > 0 and f[j] > 1:
            take = min(drift, int(f[j]) - 1)
            f[j] -= take
            drift -= take
        elif drift < 0 and f[j] > 0:
            f[j] += -drift
            drift = 0
        i += 1
    return f.astype(np.uint32)


def rans_encode(syms: np.ndarray, freqs: np.ndarray) -> bytes:
    syms = np.ascontiguousarray(syms, np.uint8)
    freqs = np.ascontiguousarray(freqs, np.uint32)
    n = syms.size
    lib = _lib()
    if lib is not None and hasattr(lib, "limg_rt_rans_encode"):
        out = np.empty(2 * n + 64, np.uint8)
        written = lib.limg_rt_rans_encode(
            syms.ctypes.data, n, freqs.ctypes.data, out.ctypes.data, out.size
        )
        if written < 0:
            raise ValueError(f"rans encode failed: {written}")
        return out[:written].tobytes()
    # Python fallback (slow; fine for small images / tests)
    starts = np.zeros(257, np.uint32)
    starts[1:] = np.cumsum(freqs)
    if starts[256] != RANS_PROB_SCALE:
        raise ValueError("bad freqs")
    rev = bytearray()
    state = _RANS_LOW
    fl = freqs.tolist()
    stl = starts.tolist()
    for s in syms[::-1].tolist():
        f = fl[s]
        x_max = ((_RANS_LOW >> RANS_PROB_BITS) << 8) * f
        while state >= x_max:
            rev.append(state & 0xFF)
            state >>= 8
        state = ((state // f) << RANS_PROB_BITS) + (state % f) + stl[s]
    for _ in range(4):
        rev.append(state & 0xFF)
        state >>= 8
    return bytes(rev[::-1])


def rans_decode(data: bytes, freqs: np.ndarray, n: int) -> np.ndarray:
    freqs = np.ascontiguousarray(freqs, np.uint32)
    buf = np.frombuffer(data, np.uint8)
    lib = _lib()
    if lib is not None and hasattr(lib, "limg_rt_rans_decode"):
        out = np.empty(n, np.uint8)
        rc = lib.limg_rt_rans_decode(
            buf.ctypes.data, buf.size, freqs.ctypes.data, out.ctypes.data, n
        )
        if rc != 0:
            raise ValueError(f"rans decode failed: {rc}")
        return out
    starts = np.zeros(257, np.uint32)
    starts[1:] = np.cumsum(freqs)
    slot_sym = np.repeat(np.arange(256, dtype=np.uint8), freqs)
    out = np.empty(n, np.uint8)
    pos = 0
    state = int.from_bytes(data[:4], "big")
    pos = 4
    fl = freqs.tolist()
    stl = starts.tolist()
    sl = slot_sym.tolist()
    for i in range(n):
        slot = state & (RANS_PROB_SCALE - 1)
        s = sl[slot]
        out[i] = s
        state = fl[s] * (state >> RANS_PROB_BITS) + slot - stl[s]
        while state < _RANS_LOW:
            if pos >= len(data):
                raise ValueError("rans stream truncated")
            state = (state << 8) | data[pos]
            pos += 1
    if state != _RANS_LOW:
        raise ValueError("rans stream corrupt")
    return out


# ---------------------------------------------------------------------------
# LTP1 factor-section kernels (bitstream.py hot path). All-or-nothing: the
# caller checks factor_kernels_available() once and keeps its NumPy
# formulation as the fallback, so the two paths stay byte-interchangeable.
# ---------------------------------------------------------------------------


def factor_kernels_available() -> bool:
    if os.environ.get("LIMG_TPU_DISABLE_NATIVE_FACTOR"):
        # escape hatch: force the NumPy formulation (A/B debugging, fallback
        # benchmarking); streams are byte-identical either way
        return False
    lib = _lib()
    return lib is not None and hasattr(lib, "limg_rt_factor_extract")


def factor_extract(q_words: np.ndarray) -> np.ndarray:
    """(64, NB) int32 packed factor words -> (3, NB, 64) uint8 axis planes."""
    q_words = np.ascontiguousarray(q_words, np.int32)
    nb = q_words.shape[1]
    out = np.empty((3, nb, 64), np.uint8)
    _lib().limg_rt_factor_extract(q_words.ctypes.data, nb, out.ctypes.data)
    return out


def factor_pack_axis(qk, maskb, ck, segk, wb, n_pix: int):
    """One axis's stream build in a single native pass.

    Returns (vals, syms, hist, raw_blob, group_bytes): the gathered masked
    pixel values (stream order), the per-segment delta symbols
    (bitstream._delta_seg semantics), the symbol histogram, and the
    width-grouped raw packing with its per-width byte counts."""
    qk = np.ascontiguousarray(qk, np.uint8)
    maskb = np.ascontiguousarray(maskb, np.uint8)
    ck = np.ascontiguousarray(ck, np.int32)
    segk = np.ascontiguousarray(segk, np.int32)
    wb = np.ascontiguousarray(wb, np.uint8)
    vals = np.empty(n_pix, np.uint8)
    syms = np.empty(n_pix, np.uint8)
    hist = np.zeros(256, np.uint32)
    raw = np.empty(n_pix + 16, np.uint8)     # <= 8 bits per value + slack
    group_bytes = np.zeros(9, np.int64)
    n = _lib().limg_rt_factor_pack_axis(
        qk.ctypes.data, maskb.ctypes.data, ck.ctypes.data, segk.ctypes.data,
        wb.ctypes.data, ck.size, vals.ctypes.data, syms.ctypes.data,
        hist.ctypes.data, raw.ctypes.data, group_bytes.ctypes.data,
    )
    if n != n_pix:
        raise RuntimeError(f"factor_pack_axis: {n} != expected {n_pix}")
    return vals, syms, hist, raw[: int(group_bytes.sum())], group_bytes


def factor_unpack_axis_syms(syms, maskb, ck, segk, wb, qk_out: np.ndarray):
    """Undelta + scatter rANS-decoded symbols into the (NB, 64) qk plane."""
    syms = np.ascontiguousarray(syms, np.uint8)
    maskb = np.ascontiguousarray(maskb, np.uint8)
    ck = np.ascontiguousarray(ck, np.int32)
    segk = np.ascontiguousarray(segk, np.int32)
    wb = np.ascontiguousarray(wb, np.uint8)
    _lib().limg_rt_factor_unpack_axis_syms(
        syms.ctypes.data, maskb.ctypes.data, ck.ctypes.data, segk.ctypes.data,
        wb.ctypes.data, ck.size, qk_out.ctypes.data,
    )


def factor_unpack_axis_raw(raw, group_bytes, maskb, ck, wb, qk_out: np.ndarray):
    """Unpack width-grouped raw factor bytes into the (NB, 64) qk plane."""
    raw = np.ascontiguousarray(raw, np.uint8)
    group_bytes = np.ascontiguousarray(group_bytes, np.int64)
    maskb = np.ascontiguousarray(maskb, np.uint8)
    ck = np.ascontiguousarray(ck, np.int32)
    wb = np.ascontiguousarray(wb, np.uint8)
    _lib().limg_rt_factor_unpack_axis_raw(
        raw.ctypes.data, group_bytes.ctypes.data, maskb.ctypes.data,
        ck.ctypes.data, wb.ctypes.data, ck.size, qk_out.ctypes.data,
    )


def pack_headers(s_hdr, ep_hdr, ch: int) -> np.ndarray:
    """(3, nseg) shifts + (nseg, 6ch) endpoints -> (nseg, rec) header bytes
    (u16 shift word + 12-bit biased endpoint fields, LSB-first)."""
    s_hdr = np.ascontiguousarray(s_hdr, np.int32)
    ep_hdr = np.ascontiguousarray(ep_hdr, np.int32)
    nseg = s_hdr.shape[1]
    rec = 2 + 6 * ch * 12 // 8
    out = np.empty((nseg, rec), np.uint8)
    _lib().limg_rt_pack_headers(
        s_hdr.ctypes.data, ep_hdr.ctypes.data, nseg, ch, out.ctypes.data)
    return out


def unpack_headers(recs: np.ndarray, ch: int):
    """Inverse of pack_headers: (nseg, rec) bytes -> ((3, nseg) i32 shifts,
    (nseg, 6ch) i32 endpoints)."""
    recs = np.ascontiguousarray(recs, np.uint8)
    nseg = recs.shape[0]
    s_hdr = np.empty((3, nseg), np.int32)
    ep_hdr = np.empty((nseg, 6 * ch), np.int32)
    _lib().limg_rt_unpack_headers(
        recs.ctypes.data, nseg, ch, s_hdr.ctypes.data, ep_hdr.ctypes.data)
    return s_hdr, ep_hdr


def decode_blocks_native(q3, shifts, eps, ch: int) -> np.ndarray:
    """(3, NB, 64) u8 factors + per-block headers -> (64, NB) u32 RGBA words
    (limg_rt_unblockify_u32 layout)."""
    q3 = np.ascontiguousarray(q3, np.uint8)
    shifts = np.ascontiguousarray(shifts, np.int32)
    eps = np.ascontiguousarray(eps, np.int32)
    nb = q3.shape[1]
    out = np.empty((64, nb), np.uint32)
    _lib().limg_rt_decode_blocks(
        q3.ctypes.data, shifts.ctypes.data, eps.ctypes.data, nb, ch,
        out.ctypes.data,
    )
    return out
