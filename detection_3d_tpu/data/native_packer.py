"""ctypes wrapper for the native pyramid packer (C++ Metadata build).

`pack_pyramid_native(cfg, scene)` is a drop-in for
data/pyramid_packing.pack_pyramid, running the whole host-side build —
input-layer dedup, every downsample table, conv/deconv/submanifold/BEV
rulebook and windowed relayout — in `native/pyramid_packer.cpp`
(byte-identical output, tests/test_native_packer.py). The C library is
compiled on demand with g++ like the scene loader; any build/load
failure falls back to the numpy implementation transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "pyramid_packer.cpp")
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False
_LOCK = threading.Lock()


def _build_library() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _FAILED:
            return None
        src = os.path.abspath(_SRC)
        out = os.path.join(os.path.dirname(src), "build")
        os.makedirs(out, exist_ok=True)
        so = os.path.join(out, "libpyramidpacker.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", src, "-o", so],
                    check=True, capture_output=True, timeout=180)
            lib = ctypes.CDLL(so)
            lib.pp_create.restype = ctypes.c_void_p
            lib.pp_create.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
            lib.pp_set_out.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_void_p]
            lib.pp_run.restype = ctypes.c_int
            lib.pp_run.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int64]
            lib.pp_run_table.restype = ctypes.c_int
            lib.pp_run_table.argtypes = lib.pp_run.argtypes
            lib.pp_last_error.restype = ctypes.c_char_p
            lib.pp_last_error.argtypes = [ctypes.c_void_p]
            lib.pp_destroy.argtypes = [ctypes.c_void_p]
        except (OSError, subprocess.SubprocessError, AttributeError):
            _FAILED = True
            return None
        _LIB = lib
        return lib


def native_pack_available() -> bool:
    return _build_library() is not None


def _run_native(cfg, scene: Dict, lib, n_threads: int,
                table_only: bool) -> Dict[str, np.ndarray]:
    from detection_3d_tpu.engine.trainer import pad_scene
    from detection_3d_tpu.ops.pallas.gather_conv_kernel import (
        BLOCK, WINDOW, _ALIGN,
    )

    if cfg.in_channels != 9:
        raise ValueError("pack supports the 9-channel layout only")
    s3d = cfg.sparse3d
    X, Y, Z = s3d.voxel_full_scale
    n_scales = s3d.num_scales
    caps = cfg.caps.scale_caps(n_scales)
    if max(X, Y, Z) >= 1 << 16 or caps[0] >= 1 << 32:
        raise ValueError("grid too large for u16 table packing")

    batch = pad_scene(cfg, scene)
    m = int(batch["points_valid"].sum())
    pts = np.ascontiguousarray(batch["points"][:m], np.float32)
    feats = np.ascontiguousarray(batch["feats"][:m, :9], np.float32)
    scale = float(s3d.voxel_scale)
    res0 = feats[:, :3] - pts / scale
    origin = (np.median(res0, axis=0).astype(np.float32)
              if m else np.zeros(3, np.float32))

    out: Dict[str, np.ndarray] = {
        "vox": np.empty((caps[0], 3), np.uint16),
        "res_q": np.empty((caps[0], 3), np.uint8),
        "rgb_q": np.empty((caps[0], 3), np.uint8),
        "nrm_q": np.empty((caps[0], 3), np.int8),
        "num": np.empty((), np.int32),
        "true_num": np.empty((), np.int32),
    }
    if not table_only:
        from detection_3d_tpu.data.pyramid_packing import (
            pyramid_pack_spec,
        )
        for name, (shape, dt) in pyramid_pack_spec(cfg).items():
            out[name] = np.empty(shape, dt)

    caps_a = np.ascontiguousarray(np.asarray(caps, np.int64))
    kern = np.ascontiguousarray(
        np.asarray(s3d.kernels[:n_scales - 1], np.int32).reshape(-1))
    strd = np.ascontiguousarray(
        np.asarray(s3d.strides[:n_scales - 1], np.int32).reshape(-1))
    bev = np.ascontiguousarray(np.asarray(
        [n_scales - 1 - i for i in cfg.rpn.rpn_scales_from_top],
        np.int32))

    h = lib.pp_create(
        X, Y, Z, n_scales,
        caps_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        kern.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        strd.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        bev.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(bev),
        BLOCK, WINDOW, _ALIGN, n_threads)
    try:
        for name, arr in out.items():
            lib.pp_set_out(h, name.encode(),
                           arr.ctypes.data_as(ctypes.c_void_p))
        runner = lib.pp_run_table if table_only else lib.pp_run
        rc = runner(
            h, pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m)
        if rc != 0:
            raise RuntimeError(
                f"pp_run rc={rc}: "
                f"{lib.pp_last_error(h).decode('utf-8', 'replace')}")
    finally:
        lib.pp_destroy(h)

    out["num"] = np.int32(out["num"])
    out["true_num"] = np.int32(out["true_num"])
    out["origin"] = origin
    out["gt_boxes"] = batch["gt_boxes"]
    out["gt_labels"] = batch["gt_labels"]
    out["gt_valid"] = batch["gt_valid"]
    return out


def pack_pyramid_native(cfg, scene: Dict,
                        n_threads: int = 8) -> Dict[str, np.ndarray]:
    """C++ pack_pyramid; numpy fallback if the library is unavailable."""
    lib = _build_library()
    if lib is None:
        from detection_3d_tpu.data.pyramid_packing import pack_pyramid
        return pack_pyramid(cfg, scene)
    return _run_native(cfg, scene, lib, n_threads, table_only=False)


def pack_table_native(cfg, scene: Dict,
                      n_threads: int = 1) -> Dict[str, np.ndarray]:
    """C++ pack_table (input layer ONLY — sort/dedup-average/quantize).

    Same outputs as data/packing.pack_table, ~7x cheaper than the numpy
    version on this host (the table-mode serving path's entire
    per-building host cost). Falls back to numpy transparently.
    """
    lib = _build_library()
    if lib is None:
        from detection_3d_tpu.data.packing import pack_table
        return pack_table(cfg, scene)
    return _run_native(cfg, scene, lib, n_threads, table_only=True)
