"""ctypes binding + on-demand build of the native scene loader.

The runtime role of the reference's torch DataLoader C++ worker pool
(maskrcnn_benchmark/data/build.py NUM_WORKERS; data3d/data.py:14-41):
scene packs are read and decoded on a C++ thread pool *ahead* of the
device step, overlapping host IO with device compute. The .so builds on
first use with g++ (cached beside the source); when no compiler is
available the loader transparently falls back to the pure-python reader
(same iteration semantics, no prefetch).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

from detection_3d_tpu.data.scene_pack import read_scene_pack, _CODES

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "scene_loader.cpp")
_LIB_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _build_library() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        if _BUILD_FAILED:
            return None
        src = os.path.abspath(_SRC)
        out = os.path.join(os.path.dirname(src), "build")
        os.makedirs(out, exist_ok=True)
        so = os.path.join(out, "libsceneloader.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", src, "-o", so],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(so)
            _configure_symbols(lib)
        except (OSError, subprocess.SubprocessError, AttributeError):
            # stale/incompatible binary, missing symbol, or no compiler:
            # fall back to the pure-python reader rather than propagating
            _BUILD_FAILED = True
            return None
        _LIB = lib
        return lib


def _configure_symbols(lib: ctypes.CDLL) -> None:
    lib.sl_open.restype = ctypes.c_void_p
    lib.sl_open.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                            ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.sl_set_order.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.c_int]
    lib.sl_next.restype = ctypes.c_void_p
    lib.sl_next.argtypes = [ctypes.c_void_p]
    lib.sl_scene_ok.argtypes = [ctypes.c_void_p]
    lib.sl_scene_error.restype = ctypes.c_char_p
    lib.sl_scene_error.argtypes = [ctypes.c_void_p]
    lib.sl_scene_n_arrays.argtypes = [ctypes.c_void_p]
    lib.sl_scene_name.restype = ctypes.c_char_p
    lib.sl_scene_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sl_scene_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sl_scene_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sl_scene_dims.restype = ctypes.POINTER(ctypes.c_uint64)
    lib.sl_scene_dims.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sl_scene_data.restype = ctypes.c_void_p
    lib.sl_scene_data.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sl_scene_byte_len.restype = ctypes.c_uint64
    lib.sl_scene_byte_len.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sl_release.argtypes = [ctypes.c_void_p]
    lib.sl_close.argtypes = [ctypes.c_void_p]


def native_available() -> bool:
    return _build_library() is not None


class NativeSceneLoader:
    """Epoch iterator over scene packs with C++ thread-pool prefetch.

    Usage::
        loader = NativeSceneLoader(paths, n_prefetch=4, n_threads=2)
        for epoch in range(E):
            for scene in loader.epoch(order):   # dict[str, np.ndarray]
                ...
    """

    def __init__(self, paths: Sequence[str], n_prefetch: int = 4,
                 n_threads: int = 2):
        self.paths = [os.fspath(p) for p in paths]
        self._lib = _build_library()
        self._h = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._h = self._lib.sl_open(arr, len(self.paths),
                                        n_prefetch, n_threads)

    def __len__(self):
        return len(self.paths)

    @property
    def is_native(self) -> bool:
        return self._h is not None

    def epoch(self, order: Optional[Sequence[int]] = None):
        idx = list(order) if order is not None else range(len(self.paths))
        idx = [int(i) for i in idx]
        if self._h is None:        # pure-python fallback
            for i in idx:
                yield read_scene_pack(self.paths[i])
            return
        lib = self._lib
        c_idx = (ctypes.c_int * len(idx))(*idx)
        lib.sl_set_order(self._h, c_idx, len(idx))
        for _ in idx:
            sc = lib.sl_next(self._h)
            if not sc:
                raise RuntimeError("loader exhausted early")
            try:
                if not lib.sl_scene_ok(sc):
                    raise IOError(lib.sl_scene_error(sc).decode())
                out: Dict[str, np.ndarray] = {}
                for i in range(lib.sl_scene_n_arrays(sc)):
                    name = lib.sl_scene_name(sc, i).decode()
                    dtype = _CODES[lib.sl_scene_dtype(sc, i)]
                    ndim = lib.sl_scene_ndim(sc, i)
                    dims_p = lib.sl_scene_dims(sc, i)
                    shape = tuple(dims_p[j] for j in range(ndim))
                    nbytes = lib.sl_scene_byte_len(sc, i)
                    buf = (ctypes.c_char * nbytes).from_address(
                        lib.sl_scene_data(sc, i))
                    out[name] = np.frombuffer(
                        buf, dtype=dtype).reshape(shape).copy()
                yield out
            finally:
                lib.sl_release(sc)

    def close(self):
        if self._h is not None:
            self._lib.sl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
