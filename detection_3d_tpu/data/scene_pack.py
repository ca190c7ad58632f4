"""Scene-pack binary format: writer + pure-python reader.

The on-disk unit the native C++ loader (native/scene_loader.cpp,
data/native_loader.py) prefetches. Replaces the reference's
pickle/.pth per-scene files (data3d/suncg_dataset.py:61-75) with a flat
seek-free layout a C thread can stream without the GIL.

Layout: magic ``SPK1`` | u32 n_arrays | per array:
  u32 name_len | name | u32 dtype_code | u32 ndim | u64 dims[ndim] |
  u64 byte_len | raw data (C-order).
"""

from __future__ import annotations

import struct
from typing import Dict

import numpy as np

MAGIC = b"SPK1"

_DTYPES = {
    np.dtype(np.float32): 0,
    np.dtype(np.float64): 1,
    np.dtype(np.int32): 2,
    np.dtype(np.int64): 3,
    np.dtype(np.uint8): 4,
    np.dtype(np.bool_): 5,
}
_CODES = {v: k for k, v in _DTYPES.items()}


def write_scene_pack(path: str, arrays: Dict[str, np.ndarray]) -> None:
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(arrays)))
        for name, arr in arrays.items():
            arr = np.ascontiguousarray(arr)
            if arr.dtype not in _DTYPES:
                raise ValueError(f"unsupported dtype {arr.dtype} for {name}")
            nb = name.encode()
            f.write(struct.pack("<I", len(nb)))
            f.write(nb)
            f.write(struct.pack("<I", _DTYPES[arr.dtype]))
            f.write(struct.pack("<I", arr.ndim))
            for d in arr.shape:
                f.write(struct.pack("<Q", d))
            raw = arr.tobytes()
            f.write(struct.pack("<Q", len(raw)))
            f.write(raw)


def read_scene_pack(path: str) -> Dict[str, np.ndarray]:
    """Pure-python reader (fallback + golden oracle for the C++ one)."""
    out = {}
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"not a scene pack: {path}")
        (n,) = struct.unpack("<I", f.read(4))
        for _ in range(n):
            (nl,) = struct.unpack("<I", f.read(4))
            name = f.read(nl).decode()
            (code,) = struct.unpack("<I", f.read(4))
            (ndim,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{ndim}Q", f.read(8 * ndim)) if ndim \
                else ()
            (blen,) = struct.unpack("<Q", f.read(8))
            data = f.read(blen)
            out[name] = np.frombuffer(
                data, dtype=_CODES[code]).reshape(dims).copy()
    return out
