"""ctypes bindings for the native C++ data plane (native/).

Fast paths with pure-Python fallbacks, so the framework works with or
without the compiled library:
  * PLY vertex reading   (falls back to fpv4d.io.ply)
  * voxel downsampling   (falls back to a numpy hash-grid)
  * KD-tree NN queries   (falls back to scipy.spatial.cKDTree)

The library auto-builds on first use when g++ is available
(`make -C native`), or explicitly via ``python -m fpv4d.io.native``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfpv4d_native.so")

_lib = None
_lib_tried = False


def build(verbose: bool = False) -> bool:
    """Compile the native library. Returns success."""
    try:
        res = subprocess.run(["make", "-C", _NATIVE_DIR],
                             capture_output=True, text=True)
        if verbose or res.returncode != 0:
            print(res.stdout + res.stderr, file=sys.stderr)
        return res.returncode == 0 and os.path.exists(_LIB_PATH)
    except FileNotFoundError:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        if not build():
            return None
    lib = _bind(_LIB_PATH)
    if lib is None:
        # a stale .so from an older checkout can miss newer symbols
        # (ctypes raises AttributeError at bind time) — rebuild once
        # and retry before giving up on the native path entirely
        if build():
            lib = _bind(_LIB_PATH)
    _lib = lib
    return _lib


def _bind(path: str) -> Optional[ctypes.CDLL]:
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    try:
        _resolve_symbols(lib)
    except AttributeError:
        return None
    return lib


def _resolve_symbols(lib: ctypes.CDLL) -> None:
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_long_p = ctypes.POINTER(ctypes.c_long)
    lib.fpv4d_ply_vertex_count.restype = ctypes.c_long
    lib.fpv4d_ply_vertex_count.argtypes = [ctypes.c_char_p]
    lib.fpv4d_ply_read_vertices.restype = ctypes.c_long
    lib.fpv4d_ply_read_vertices.argtypes = [ctypes.c_char_p, c_float_p,
                                            ctypes.c_long]
    lib.fpv4d_voxel_downsample.restype = ctypes.c_long
    lib.fpv4d_voxel_downsample.argtypes = [c_float_p, ctypes.c_long,
                                           ctypes.c_float, c_float_p]
    lib.fpv4d_kdtree_build.restype = ctypes.c_void_p
    lib.fpv4d_kdtree_build.argtypes = [c_float_p, ctypes.c_long]
    lib.fpv4d_kdtree_free.argtypes = [ctypes.c_void_p]
    lib.fpv4d_kdtree_query.argtypes = [ctypes.c_void_p, c_float_p,
                                       ctypes.c_long, c_float_p, c_long_p]
    c_int_p = ctypes.POINTER(ctypes.c_int)
    c_double_p = ctypes.POINTER(ctypes.c_double)
    lib.fpv4d_cand_grid_plan.restype = ctypes.c_long
    lib.fpv4d_cand_grid_plan.argtypes = [
        c_float_p, ctypes.c_long, ctypes.c_double, ctypes.c_long,
        c_float_p, c_long_p, c_double_p]
    lib.fpv4d_cand_grid_fill.restype = ctypes.c_long
    lib.fpv4d_cand_grid_fill.argtypes = [
        c_float_p, ctypes.c_long, c_float_p, c_long_p, ctypes.c_double,
        ctypes.c_long, c_float_p, c_int_p]


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_ply_vertices(path: str) -> np.ndarray:
    """[N,3] float32 vertices; native fast path, Python fallback."""
    lib = _load()
    if lib is not None:
        n = lib.fpv4d_ply_vertex_count(path.encode())
        # belt-and-suspenders vs a stale .so without header validation:
        # never allocate more vertices than the file's bytes can back
        # (no PLY encoding packs a vertex in under 2 bytes)
        if n > 0 and n * 2 > os.path.getsize(path):
            n = -1
        if n >= 0:
            out = np.empty((n, 3), dtype=np.float32)
            got = lib.fpv4d_ply_read_vertices(path.encode(), _fptr(out), n)
            if got == n:
                return out
    from fpv4d.io.ply import read_ply
    v, _ = read_ply(path)
    return v


def voxel_downsample(pts: np.ndarray, voxel: float) -> np.ndarray:
    """Average points per voxel cell. [N,3] -> [M,3]."""
    pts = np.ascontiguousarray(pts, dtype=np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty_like(pts)
        m = lib.fpv4d_voxel_downsample(_fptr(pts), len(pts),
                                       ctypes.c_float(voxel), _fptr(out))
        if m >= 0:
            return out[:m].copy()
    # numpy fallback: same hash-grid semantics
    cells = np.floor(pts / voxel).astype(np.int64)
    _, inverse, counts = np.unique(cells, axis=0, return_inverse=True,
                                   return_counts=True)
    sums = np.zeros((len(counts), 3), dtype=np.float64)
    np.add.at(sums, inverse, pts)
    # order of np.unique differs from insertion order; acceptable for
    # the fallback (downsampled clouds are order-insensitive consumers)
    return (sums / counts[:, None]).astype(np.float32)


def build_cand_tables(pts: np.ndarray, h: float, slots_per_cell: int,
                      max_cells: int):
    """Native voxel candidate-table builder (fpv4d.ops.nn.VoxelGrid
    semantics): [N,3] points -> (cand_pts [C,K,3] f32, cand_idx [C,K]
    i32, origin [3] f32, dims (3 ints), h). Returns None when the
    native library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, dtype=np.float32)
    origin = np.empty(3, np.float32)
    dims = np.empty(3, np.int64)
    h_out = np.empty(1, np.float64)
    num_cells = lib.fpv4d_cand_grid_plan(
        _fptr(pts), len(pts), ctypes.c_double(h), max_cells,
        _fptr(origin), dims.ctypes.data_as(
            ctypes.POINTER(ctypes.c_long)),
        h_out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if num_cells <= 0:
        return None
    K = slots_per_cell
    cand_pts = np.empty((num_cells, K, 3), np.float32)
    cand_idx = np.empty((num_cells, K), np.int32)
    rc = lib.fpv4d_cand_grid_fill(
        _fptr(pts), len(pts), _fptr(origin),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ctypes.c_double(float(h_out[0])), K, _fptr(cand_pts),
        cand_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if rc != 0:
        return None
    return (cand_pts, cand_idx, origin,
            (int(dims[0]), int(dims[1]), int(dims[2])),
            float(h_out[0]))


class KdTree:
    """Nearest-neighbor queries against a fixed cloud."""

    def __init__(self, pts: np.ndarray):
        self._pts = np.ascontiguousarray(pts, dtype=np.float32)
        lib = _load()
        self._lib = lib
        self._handle = None
        self._fallback = None
        if lib is not None:
            self._handle = lib.fpv4d_kdtree_build(_fptr(self._pts),
                                                  len(self._pts))
        if self._handle is None:
            from scipy.spatial import cKDTree
            self._fallback = cKDTree(self._pts)

    def query(self, q: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """[Q,3] -> (dist_sq [Q] f32, idx [Q] i64)."""
        q = np.ascontiguousarray(q, dtype=np.float32)
        if self._handle is not None:
            d = np.empty(len(q), dtype=np.float32)
            i = np.empty(len(q), dtype=np.int64)
            self._lib.fpv4d_kdtree_query(
                ctypes.c_void_p(self._handle), _fptr(q), len(q),
                _fptr(d), i.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_long)))
            return d, i
        dist, idx = self._fallback.query(q)
        return (dist ** 2).astype(np.float32), idx.astype(np.int64)

    def __del__(self):
        try:
            if getattr(self, "_handle", None) is not None and self._lib:
                self._lib.fpv4d_kdtree_free(ctypes.c_void_p(self._handle))
                self._handle = None
        except Exception:       # interpreter teardown: ctypes may be gone
            pass


if __name__ == "__main__":
    ok = build(verbose=True)
    print("native build:", "ok" if ok else "FAILED")
