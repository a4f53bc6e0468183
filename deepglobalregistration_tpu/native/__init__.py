"""ctypes bindings for the native host engine (native/dgr_host.cpp).

Auto-builds the shared library with g++ on first import (cached next to the
source); every entry point has a numpy fallback so the framework runs without
a toolchain. ``AVAILABLE`` reports whether the native path is active.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "dgr_host.cpp"
_LIB = _SRC.parent / "libdgr_host.so"

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain missing / sandboxed
        log.info("native build unavailable (%s); using numpy fallbacks", e)
        return False


def _stale() -> bool:
    """Rebuild whenever the C++ source is newer than the library: the binary
    is never committed (gitignored — it's -march=native and unauditable), so a
    stale build must not silently shadow edited source."""
    try:
        return _LIB.stat().st_mtime < _SRC.stat().st_mtime
    except OSError:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if _SRC.exists() and (not _LIB.exists() or _stale()):
        _build()
    if _LIB.exists():
        lib = ctypes.CDLL(str(_LIB))
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.dgr_unique_rows.restype = ctypes.c_int64
        lib.dgr_unique_rows.argtypes = [i32p, ctypes.c_int64, ctypes.c_int, i32p, i32p]
        lib.dgr_voxelize.restype = ctypes.c_int64
        lib.dgr_voxelize.argtypes = [f32p, ctypes.c_int64, ctypes.c_double, f32p, i32p]
        lib.dgr_kernel_map.restype = None
        lib.dgr_kernel_map.argtypes = [i32p, ctypes.c_int64, i32p, ctypes.c_int64,
                                       ctypes.c_int, i32p, ctypes.c_int64,
                                       ctypes.c_int32, ctypes.c_int32, i32p]
        lib.dgr_radius_pairs.restype = ctypes.c_int64
        lib.dgr_radius_pairs.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64,
                                         f32p, f32p, ctypes.c_double, i32p,
                                         ctypes.c_int64]
        _lib = lib
    return _lib


def _i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def unique_rows(coords: np.ndarray):
    """Host dedup keeping the smallest-index representative.
    Returns (unique_coords, src_idx)."""
    lib = _load()
    coords = _i32(coords)
    n, d = coords.shape
    if lib is None:
        _, sel = np.unique(coords, axis=0, return_index=True)
        sel = np.sort(sel)
        return coords[sel], sel.astype(np.int32)
    out = np.empty_like(coords)
    src = np.empty(n, np.int32)
    m = lib.dgr_unique_rows(_ptr(coords, ctypes.c_int32), n, d,
                            _ptr(out, ctypes.c_int32), _ptr(src, ctypes.c_int32))
    return out[:m], src[:m]


def voxelize(xyz: np.ndarray, voxel_size: float):
    """Host quantization; returns (xyz_sel, coords)."""
    lib = _load()
    xyz = _f32(xyz)
    n = len(xyz)
    if lib is None:
        coords = np.floor(xyz / voxel_size).astype(np.int32)
        uc, sel = unique_rows(coords)
        return xyz[sel], coords[sel]
    out_xyz = np.empty_like(xyz)
    out_coords = np.empty((n, 3), np.int32)
    m = lib.dgr_voxelize(_ptr(xyz, ctypes.c_float), n, voxel_size,
                         _ptr(out_xyz, ctypes.c_float), _ptr(out_coords, ctypes.c_int32))
    return out_xyz[:m], out_coords[:m]


def kernel_map(in_coords: np.ndarray, out_coords: np.ndarray, offsets: np.ndarray,
               unit: int, transpose: bool = False) -> np.ndarray:
    """Host kernel-map build; returns [K, n_out] int32 (-1 = empty site)."""
    lib = _load()
    in_coords, out_coords = _i32(in_coords), _i32(out_coords)
    offsets = _i32(offsets)
    k, d = offsets.shape
    n_out = len(out_coords)
    sign = -1 if transpose else 1
    if lib is None:
        table = {tuple(c): i for i, c in reversed(list(enumerate(in_coords)))}
        kmap = np.full((k, n_out), -1, np.int32)
        for ki in range(k):
            q = out_coords + sign * offsets[ki] * unit
            for j in range(n_out):
                kmap[ki, j] = table.get(tuple(q[j]), -1)
        return kmap
    kmap = np.empty((k, n_out), np.int32)
    lib.dgr_kernel_map(_ptr(in_coords, ctypes.c_int32), len(in_coords),
                       _ptr(out_coords, ctypes.c_int32), n_out, d,
                       _ptr(offsets, ctypes.c_int32), k, unit, sign,
                       _ptr(kmap, ctypes.c_int32))
    return kmap


def radius_pairs(src: np.ndarray, tgt: np.ndarray, trans: np.ndarray,
                 radius: float, max_pairs: int | None = None) -> np.ndarray:
    """All (i, j) pairs with |T(src[i]) - tgt[j]| <= radius. [M, 2] int32."""
    lib = _load()
    src, tgt = _f32(src), _f32(tgt)
    if lib is None:
        from ..utils.pointcloud import get_matching_indices

        return get_matching_indices(src, tgt, trans, radius).astype(np.int32)
    if max_pairs is None:
        max_pairs = max(len(src) * 32, 1 << 20)
    rot = _f32(trans[:3, :3])
    t = _f32(trans[:3, 3])
    pairs = np.empty((max_pairs, 2), np.int32)
    m = lib.dgr_radius_pairs(_ptr(src, ctypes.c_float), len(src),
                             _ptr(tgt, ctypes.c_float), len(tgt),
                             _ptr(rot, ctypes.c_float), _ptr(t, ctypes.c_float),
                             radius, _ptr(pairs, ctypes.c_int32), max_pairs)
    return pairs[:m]


AVAILABLE = _load() is not None
