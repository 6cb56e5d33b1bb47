"""Native host runtime: C++ frame ring + batch assembler with ctypes bindings.

Compiled lazily on first use (g++ -O3 -shared) and cached next to the source;
falls back to a pure-Python ring (functionally identical, GIL-bound) when no
compiler is available. See framering.cpp for the concurrency model.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import time

import numpy as np

from tti.core.logging import get_logger

log = get_logger("native")

_SRC = os.path.join(os.path.dirname(__file__), "framering.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_framering.so")
_lib = None
_lib_lock = threading.Lock()


def _load_library() -> ctypes.CDLL | None:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
                     "-o", _LIB_PATH],
                    check=True, capture_output=True, timeout=120,
                )
                log.info("compiled %s", _LIB_PATH)
            except (subprocess.SubprocessError, FileNotFoundError) as e:
                # mtimes are not preserved by git checkout, so a shipped .so
                # can look stale on a box without a compiler — load it anyway
                # rather than silently degrading to the Python ring.
                if os.path.exists(_LIB_PATH):
                    log.warning("native rebuild failed (%s); using existing %s",
                                e, _LIB_PATH)
                else:
                    log.warning("native build failed (%s); using python fallback", e)
                    return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tti_ring_create.restype = ctypes.c_void_p
        lib.tti_ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.tti_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.tti_ring_push.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64
        ]
        lib.tti_ring_head.restype = ctypes.c_uint64
        lib.tti_ring_head.argtypes = [ctypes.c_void_p]
        lib.tti_ring_snapshot.restype = ctypes.c_int64
        lib.tti_ring_snapshot.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.tti_ring_gather_batch.restype = ctypes.c_uint64
        lib.tti_ring_gather_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.tti_ring_dropped.restype = ctypes.c_uint64
        lib.tti_ring_dropped.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def gather_batch(rings: "list[FrameRing]", out: np.ndarray) -> int:
    """Copy the freshest frame from each ring into the contiguous batch ``out``
    (S, *frame_shape) with ONE native call (no per-stream Python overhead).
    Returns a bitmask of rings that had a frame. Falls back to per-ring
    snapshots when any ring is non-native."""
    lib = _load_library()
    if lib is None or not all(r.native for r in rings):
        mask = 0
        for i, ring in enumerate(rings):
            snap = ring.snapshot(1)
            if snap.shape[0]:
                out[i] = snap[0]
                mask |= 1 << i
        return mask
    handles = (ctypes.c_void_p * len(rings))(*[r._handle for r in rings])
    return int(lib.tti_ring_gather_batch(
        handles, len(rings), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    ))


class FrameRing:
    """Latest-N frame ring over the C++ seqlock implementation (or a locked
    Python deque fallback). Frames are fixed-shape uint8 arrays."""

    def __init__(self, capacity: int, frame_shape: tuple[int, ...], native: bool | None = None):
        self.capacity = capacity
        self.frame_shape = tuple(frame_shape)
        self.frame_bytes = int(np.prod(frame_shape))
        self._lib = _load_library() if native in (None, True) else None
        if native is True and self._lib is None:
            raise RuntimeError("native frame ring requested but unavailable")
        if self._lib is not None:
            self._handle = self._lib.tti_ring_create(capacity, self.frame_bytes)
            if not self._handle:
                raise MemoryError("tti_ring_create failed")
        else:
            from collections import deque

            self._deque: "deque[np.ndarray]" = __import__("collections").deque(maxlen=capacity)
            self._pushed = 0
            self._lock = threading.Lock()

    @property
    def native(self) -> bool:
        return self._lib is not None

    def push(self, frame: np.ndarray, timestamp_ns: int | None = None) -> None:
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        if frame.nbytes != self.frame_bytes:
            raise ValueError(f"frame bytes {frame.nbytes} != ring frame {self.frame_bytes}")
        ts = time.monotonic_ns() if timestamp_ns is None else timestamp_ns
        if self._lib is not None:
            ptr = frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            self._lib.tti_ring_push(self._handle, ptr, ts)
        else:
            with self._lock:
                self._deque.append(frame.copy())
                self._pushed += 1

    def head(self) -> int:
        if self._lib is not None:
            return int(self._lib.tti_ring_head(self._handle))
        with self._lock:
            return self._pushed

    def dropped(self) -> int:
        """Frames overwritten before being part of any snapshot window."""
        if self._lib is not None:
            return int(self._lib.tti_ring_dropped(self._handle))
        with self._lock:
            return max(0, self._pushed - self.capacity)

    def snapshot(self, count: int) -> np.ndarray:
        """Newest `count` frames, oldest-first, as one contiguous
        (n, *frame_shape) uint8 batch (n <= count)."""
        out = np.empty((count, *self.frame_shape), np.uint8)
        if self._lib is not None:
            ids = (ctypes.c_uint64 * count)()
            n = self._lib.tti_ring_snapshot(
                self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                count, ids,
            )
            return out[:n]
        with self._lock:
            frames = list(self._deque)[-count:]
        for i, f in enumerate(frames):
            out[i] = f.reshape(self.frame_shape)
        return out[: len(frames)]

    def __del__(self):
        lib = getattr(self, "_lib", None)
        if lib is not None and getattr(self, "_handle", None):
            lib.tti_ring_destroy(self._handle)
            self._handle = None
