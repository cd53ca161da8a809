"""ctypes wrapper for the native parallel .npy loader + a prefetching
batch iterator.

The native library (``native/featloader.cc``) loads a whole batch's
feature files on a C++ thread pool; here we overlap the NEXT mega-batch's
file IO with the current device step (the reference's DataLoader worker
processes, torch-free).  Falls back to serial numpy when the library
can't be built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from queue import Queue

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfeatloader.so")

_DTYPES = {0: np.float32, 1: np.float64, 2: np.int32, 3: np.int64,
           4: np.int16, 5: np.uint8}


class _FLItem(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.c_void_p),
        ("nbytes", ctypes.c_int64),
        ("dtype", ctypes.c_int32),
        ("ndim", ctypes.c_int32),
        ("shape", ctypes.c_int64 * 8),
        ("ok", ctypes.c_int32),
        ("fortran", ctypes.c_int32),
    ]


def _build_library() -> str | None:
    if os.path.exists(_LIB_PATH):
        return _LIB_PATH
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH if os.path.exists(_LIB_PATH) else None
    except Exception:
        return None


_lib = None
_lib_failed = False


def _get_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    path = _build_library()
    if path is None:
        _lib_failed = True
        return None
    lib = ctypes.CDLL(path)
    lib.fl_create.restype = ctypes.c_void_p
    lib.fl_create.argtypes = [ctypes.c_int]
    lib.fl_destroy.argtypes = [ctypes.c_void_p]
    lib.fl_submit.restype = ctypes.c_long
    lib.fl_submit.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_char_p), ctypes.c_int]
    lib.fl_wait.restype = ctypes.c_int
    lib.fl_wait.argtypes = [ctypes.c_void_p, ctypes.c_long,
                            ctypes.POINTER(_FLItem), ctypes.c_int]
    lib.fl_release.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.fl_gather.restype = ctypes.c_int
    lib.fl_gather.argtypes = [ctypes.c_void_p, ctypes.c_long,
                              ctypes.POINTER(ctypes.c_void_p), ctypes.c_int]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


class NativeNpyLoader:
    """Parallel multi-file npy loader; ``load(paths) -> [np.ndarray]``."""

    def __init__(self, n_threads: int = 8):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native featloader unavailable")
        self._lib = lib
        self._handle = lib.fl_create(n_threads)

    def submit(self, paths: list[str]) -> int:
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        return self._lib.fl_submit(self._handle, arr, len(paths))

    def collect(self, job: int, n: int) -> list[np.ndarray]:
        items = (_FLItem * n)()
        got = self._lib.fl_wait(self._handle, job, items, n)
        if got < 0:
            raise RuntimeError("unknown native loader job")
        out, dests = [], (ctypes.c_void_p * got)()
        for i in range(got):
            it = items[i]
            if not it.ok:
                self._lib.fl_release(self._handle, job)
                raise IOError("native loader failed to read a file")
            a = np.empty(tuple(it.shape[: it.ndim]),
                         dtype=_DTYPES[it.dtype],
                         order="F" if it.fortran else "C")
            out.append(a)
            dests[i] = a.ctypes.data_as(ctypes.c_void_p)
        # parallel memcpy into the numpy buffers on the C++ pool
        self._lib.fl_gather(self._handle, job, dests, got)
        self._lib.fl_release(self._handle, job)
        return out

    def load(self, paths: list[str]) -> list[np.ndarray]:
        return self.collect(self.submit(paths), len(paths))

    def close(self):
        if self._handle:
            self._lib.fl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def prefetch_iterator(make_iterator, depth: int = 2):
    """Run a batch iterator on a background thread with a bounded queue —
    overlaps host-side file IO/collation with device steps (the
    reference's DataLoader(num_workers) role)."""
    q: Queue = Queue(maxsize=depth)
    _END = object()

    def producer():
        try:
            for item in make_iterator():
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
