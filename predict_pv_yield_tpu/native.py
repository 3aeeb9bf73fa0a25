"""ctypes bindings for the native C++ kernels (``native/farneback.cpp``).

The shared library is built on first use (``g++`` is assumed present, as in
this image) and cached beside the sources; set ``PREDICT_PV_YIELD_TPU_NO_NATIVE``
to skip native entirely (pure-JAX fallbacks cover every capability).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfarneback.so")
_lib: Optional[ctypes.CDLL] = None
#: Serialises first-use build+load across threads (the prefetching loader's
#: worker threads can all hit the blosc decode path at once). Cross-process
#: safety comes from the Makefile: the link writes a PID-unique temp file
#: and atomically renames it onto the target, so a concurrent dlopen never
#: sees a partial library.
_load_lock = threading.Lock()


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    subprocess.run(
        ["make", "-s", "libfarneback.so"],
        cwd=os.path.abspath(_NATIVE_DIR),
        check=True,
        capture_output=True,
    )


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("PREDICT_PV_YIELD_TPU_NO_NATIVE"):
        raise NativeUnavailable("native kernels disabled via environment")
    with _load_lock:
        if _lib is not None:  # built by the thread that held the lock first
            return _lib
        return _load_library_locked()


def _load_library_locked() -> ctypes.CDLL:
    global _lib
    # Always invoke make: it is a no-op when the library is fresh, and it
    # rebuilds stale binaries when sources gained new symbols (a library
    # from before lz4.cpp existed would otherwise AttributeError below).
    try:
        _build()
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        if not os.path.exists(_LIB_PATH):
            raise NativeUnavailable(f"could not build native library: {exc}") from exc
        log.warning("native rebuild failed (%s); using the existing library", exc)
    lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
    for symbol in ("farneback_flow", "farneback_flow_sequence", "remap_image",
                   "lz4_decompress_block", "lz4_compress_block",
                   "blosc_shuffle", "blosc_unshuffle"):
        if not hasattr(lib, symbol):
            raise NativeUnavailable(
                f"stale native library: missing symbol {symbol} (run "
                f"`make -C native clean` and retry)"
            )

    float_ptr = ctypes.POINTER(ctypes.c_float)
    lib.farneback_flow.argtypes = [
        float_ptr, float_ptr, ctypes.c_int, ctypes.c_int, float_ptr,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int,
    ]
    lib.farneback_flow_sequence.argtypes = [
        float_ptr, ctypes.c_int, ctypes.c_int, ctypes.c_int, float_ptr,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int,
    ]
    lib.remap_image.argtypes = [
        float_ptr, float_ptr, ctypes.c_int, ctypes.c_int, float_ptr,
    ]
    byte_ptr = ctypes.POINTER(ctypes.c_uint8)
    lib.lz4_decompress_block.argtypes = [
        byte_ptr, ctypes.c_long, byte_ptr, ctypes.c_long,
    ]
    lib.lz4_decompress_block.restype = ctypes.c_long
    lib.lz4_compress_block.argtypes = [
        byte_ptr, ctypes.c_long, byte_ptr, ctypes.c_long,
    ]
    lib.lz4_compress_block.restype = ctypes.c_long
    lib.blosc_shuffle.argtypes = [
        byte_ptr, byte_ptr, ctypes.c_long, ctypes.c_long,
    ]
    lib.blosc_unshuffle.argtypes = [
        byte_ptr, byte_ptr, ctypes.c_long, ctypes.c_long,
    ]
    _lib = lib
    return lib


def _as_float_ptr(array: np.ndarray):
    return array.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def farneback_flow_native(
    im1: np.ndarray,
    im2: np.ndarray,
    levels: int = 2,
    winsize: int = 40,
    iterations: int = 3,
    poly_n: int = 5,
    poly_sigma: float = 0.7,
    gaussian: bool = True,
) -> np.ndarray:
    """Host C++ Farnebäck flow → (H, W, 2) float32 (dx, dy)."""
    lib = load_library()
    im1 = np.ascontiguousarray(im1, dtype=np.float32)
    im2 = np.ascontiguousarray(im2, dtype=np.float32)
    height, width = im1.shape
    flow = np.empty((height, width, 2), dtype=np.float32)
    lib.farneback_flow(
        _as_float_ptr(im1), _as_float_ptr(im2), height, width,
        _as_float_ptr(flow), levels, winsize, iterations, poly_n,
        ctypes.c_float(poly_sigma), int(gaussian),
    )
    return flow


def flow_sequence_native(frames: np.ndarray, **kwargs) -> np.ndarray:
    """(T, H, W) → (T-1, H, W, 2) via the C++ kernel."""
    lib = load_library()
    frames = np.ascontiguousarray(frames, dtype=np.float32)
    t, height, width = frames.shape
    flows = np.empty((t - 1, height, width, 2), dtype=np.float32)
    lib.farneback_flow_sequence(
        _as_float_ptr(frames), t, height, width, _as_float_ptr(flows),
        kwargs.get("levels", 2), kwargs.get("winsize", 40),
        kwargs.get("iterations", 3), kwargs.get("poly_n", 5),
        ctypes.c_float(kwargs.get("poly_sigma", 0.7)),
        int(kwargs.get("gaussian", True)),
    )
    return flows


def remap_image_native(image: np.ndarray, flow: np.ndarray) -> np.ndarray:
    lib = load_library()
    image = np.ascontiguousarray(image, dtype=np.float32)
    flow = np.ascontiguousarray(flow, dtype=np.float32)
    height, width = image.shape
    out = np.empty((height, width), dtype=np.float32)
    lib.remap_image(_as_float_ptr(image), _as_float_ptr(flow), height, width, _as_float_ptr(out))
    return out


def _as_byte_ptr(array: np.ndarray):
    return array.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _lz4_decompress_py(src: bytes, out_size: int) -> bytes:
    """Pure-Python LZ4 block decode — the documented fallback when native
    kernels are unavailable/disabled. Slow but format-complete."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]; i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                extra = src[i]; i += 1
                lit += extra
                if extra != 255:
                    break
        out += src[i:i + lit]
        i += lit
        if i >= n:
            break  # final sequence carries literals only
        offset = src[i] | (src[i + 1] << 8); i += 2
        if offset == 0 or offset > len(out):
            raise ValueError("malformed LZ4 block: bad match offset")
        mlen = token & 0xF
        if mlen == 15:
            while True:
                extra = src[i]; i += 1
                mlen += extra
                if extra != 255:
                    break
        mlen += 4
        start = len(out) - offset
        for _ in range(mlen):  # byte-serial: overlapping copies are legal
            out.append(out[start])
            start += 1
    if len(out) != out_size:
        raise ValueError(
            f"malformed LZ4 block: wrote {len(out)}, expected {out_size}"
        )
    return bytes(out)


def _lz4_compress_py(payload: bytes) -> bytes:
    """All-literals LZ4 stream (valid, never smaller than the input) — the
    blosc caller falls back to a memcpy frame when compression doesn't pay,
    so correctness is preserved without a Python matcher."""
    out = bytearray()
    lit = len(payload)
    out.append((15 if lit >= 15 else lit) << 4)
    if lit >= 15:
        rest = lit - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += payload
    return bytes(out)


def lz4_decompress(data: bytes, decompressed_size: int) -> bytes:
    """Decompress one raw LZ4 block (native/lz4.cpp; Python fallback)."""
    try:
        lib = load_library()
    except NativeUnavailable:
        return _lz4_decompress_py(data, decompressed_size)
    src = np.frombuffer(data, dtype=np.uint8)
    dst = np.empty(decompressed_size, dtype=np.uint8)
    written = lib.lz4_decompress_block(
        _as_byte_ptr(src), len(src), _as_byte_ptr(dst), decompressed_size
    )
    if written != decompressed_size:
        raise ValueError(
            f"malformed LZ4 block: wrote {written}, expected {decompressed_size}"
        )
    return dst.tobytes()


def lz4_compress(data: bytes) -> bytes:
    """Compress one raw LZ4 block (greedy matcher, format-conformant;
    all-literals Python fallback)."""
    try:
        lib = load_library()
    except NativeUnavailable:
        return _lz4_compress_py(data)
    src = np.frombuffer(data, dtype=np.uint8)
    cap = len(src) + len(src) // 255 + 32
    dst = np.empty(cap, dtype=np.uint8)
    written = lib.lz4_compress_block(_as_byte_ptr(src), len(src), _as_byte_ptr(dst), cap)
    if written < 0:
        raise ValueError("LZ4 compression overflow")
    return dst[:written].tobytes()


def byte_unshuffle(data: bytes, typesize: int) -> bytes:
    """Inverse of blosc's byte shuffle over complete elements; the tail
    (len % typesize bytes) is copied through unchanged, as c-blosc does."""
    try:
        lib = load_library()
    except NativeUnavailable:  # numpy transpose is the same permutation
        n = len(data) - len(data) % typesize
        src = np.frombuffer(data, dtype=np.uint8)
        body = src[:n].reshape(typesize, n // typesize).T.reshape(-1)
        return body.tobytes() + src[n:].tobytes()
    n_shuffled = len(data) - len(data) % typesize
    src = np.frombuffer(data, dtype=np.uint8)
    dst = np.empty(len(data), dtype=np.uint8)
    lib.blosc_unshuffle(_as_byte_ptr(src), _as_byte_ptr(dst), n_shuffled, typesize)
    dst[n_shuffled:] = src[n_shuffled:]
    return dst.tobytes()


def byte_shuffle(data: bytes, typesize: int) -> bytes:
    try:
        lib = load_library()
    except NativeUnavailable:
        n = len(data) - len(data) % typesize
        src = np.frombuffer(data, dtype=np.uint8)
        body = src[:n].reshape(n // typesize, typesize).T.reshape(-1)
        return body.tobytes() + src[n:].tobytes()
    n_shuffled = len(data) - len(data) % typesize
    src = np.frombuffer(data, dtype=np.uint8)
    dst = np.empty(len(data), dtype=np.uint8)
    lib.blosc_shuffle(_as_byte_ptr(src), _as_byte_ptr(dst), n_shuffled, typesize)
    dst[n_shuffled:] = src[n_shuffled:]
    return dst.tobytes()
