"""ctypes bindings for the native host runtime (native/legmov_native.cpp).

Auto-builds ``liblegmov_native.so`` with the repo Makefile on first use;
every entry point has a NumPy fallback so the package works without a
compiler.  The native paths matter at 10M+ points: grid bucketing and
layout conversion are memory-bound loops that OpenMP parallelizes across
host cores, feeding the TPU without becoming the pipeline bottleneck.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_HERE, "native")
_SO = os.path.join(_NATIVE_DIR, "liblegmov_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "legmov_native.cpp")
    stale = (
        os.path.exists(_SO)
        and os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_SO)
    )
    if stale:
        try:
            os.remove(_SO)
        except OSError:
            pass
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.bucket_grid.restype = ctypes.c_int
    lib.bucket_grid.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_float, i64p, f32p, i32p,
        ctypes.c_int64, ctypes.c_float,
    ]
    lib.bucket_max_count.restype = ctypes.c_int64
    lib.bucket_max_count.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_float, i64p, i32p,
    ]
    lib.csr_grid.restype = ctypes.c_int
    lib.csr_grid.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_float, i64p, f32p, f32p, f32p,
        i32p, i32p,
    ]
    lib.aos_to_soa.restype = None
    lib.aos_to_soa.argtypes = [f32p, ctypes.c_int64, f32p, f32p, f32p]
    lib.soa_to_aos.restype = None
    lib.soa_to_aos.argtypes = [f32p, f32p, f32p, ctypes.c_int64, f32p]
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.moon_craters.restype = None
    lib.moon_craters.argtypes = [
        f64p, f64p, f64p, ctypes.c_int64, f64p, ctypes.c_int64,
    ]
    lib.perlin2d.restype = None
    lib.perlin2d.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_int64, f64p, ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def bucket_grid(
    pts: np.ndarray, origin: np.ndarray, cell: float, dims, sentinel: float
):
    """``(table [n_cells, cap, 3], counts [n_cells])`` — native two-pass
    scatter when available, NumPy otherwise.  Point order inside a cell is
    nondeterministic in the native path (atomic slots), which is fine: cell
    membership, not order, is what the grid consumer reduces over."""
    lib = _load()
    pts = np.ascontiguousarray(pts, np.float32)
    origin = np.ascontiguousarray(origin, np.float32)
    dims_a = np.asarray(dims, np.int64)
    n_cells = int(dims_a.prod())
    counts = np.zeros(n_cells, np.int32)
    if lib is None:
        idx = np.floor((pts - origin) / cell).astype(np.int64)
        if idx.size and ((idx < 0).any() or (idx >= dims_a).any()):
            # match the native path's behavior — a silent scatter into a
            # wrong cell (negative indices wrap in NumPy) must not differ
            # between backends
            raise ValueError("bucket_grid: point outside grid dims")
        flat = (idx[:, 0] * dims_a[1] + idx[:, 1]) * dims_a[2] + idx[:, 2]
        order = np.argsort(flat, kind="stable")
        fs = flat[order]
        counts = np.bincount(fs, minlength=n_cells).astype(np.int32)
        cap = max(int(counts.max()) if counts.size else 1, 1)
        table = np.full((n_cells, cap, 3), sentinel, np.float32)
        starts = np.zeros(n_cells + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        pos = np.arange(pts.shape[0]) - starts[fs]
        table[fs, pos] = pts[order]
        return table, counts
    cap = max(
        int(lib.bucket_max_count(pts, pts.shape[0], origin,
                                 np.float32(cell), dims_a, counts)),
        1,
    )
    table = np.empty((n_cells, cap, 3), np.float32)
    rc = lib.bucket_grid(
        pts, pts.shape[0], origin, np.float32(cell), dims_a,
        table.reshape(-1), counts, cap, np.float32(sentinel),
    )
    if rc != 0:
        raise ValueError("bucket_grid: point outside grid dims")
    return table, counts


def csr_grid(pts: np.ndarray, origin: np.ndarray, cell: float, dims):
    """``(xs, ys, zs [F] f32 cell-sorted, starts [n_cells+1] int32)`` —
    native OpenMP counting sort when available, NumPy argsort otherwise.
    Point order within a cell is nondeterministic in the native path."""
    lib = _load()
    pts = np.ascontiguousarray(pts, np.float32)
    origin = np.ascontiguousarray(origin, np.float32)
    dims_a = np.asarray(dims, np.int64)
    n_cells = int(dims_a.prod())
    n = pts.shape[0]
    if lib is None:
        idx = np.floor((pts - origin) / cell).astype(np.int64)
        if idx.size and ((idx < 0).any() or (idx >= dims_a).any()):
            raise ValueError("csr_grid: point outside grid dims")
        flat = (idx[:, 0] * dims_a[1] + idx[:, 1]) * dims_a[2] + idx[:, 2]
        order = np.argsort(flat, kind="stable")
        srt = pts[order]
        counts = np.bincount(flat[order], minlength=n_cells)
        starts = np.zeros(n_cells + 1, np.int32)
        np.cumsum(counts, out=starts[1:], dtype=np.int32)
        return (
            np.ascontiguousarray(srt[:, 0]),
            np.ascontiguousarray(srt[:, 1]),
            np.ascontiguousarray(srt[:, 2]),
            starts,
        )
    xs = np.empty(n, np.float32)
    ys = np.empty(n, np.float32)
    zs = np.empty(n, np.float32)
    starts = np.zeros(n_cells + 1, np.int32)
    scratch = np.zeros(n_cells, np.int32)
    rc = lib.csr_grid(
        pts, n, origin, np.float32(cell), dims_a, xs, ys, zs, starts,
        scratch,
    )
    if rc != 0:
        raise ValueError("csr_grid: point outside grid dims")
    return xs, ys, zs, starts


def aos_to_soa(aos: np.ndarray):
    lib = _load()
    aos = np.ascontiguousarray(aos, np.float32)
    n = aos.shape[0]
    if lib is None:
        return aos[:, 0].copy(), aos[:, 1].copy(), aos[:, 2].copy()
    x = np.empty(n, np.float32)
    y = np.empty(n, np.float32)
    z = np.empty(n, np.float32)
    lib.aos_to_soa(aos.reshape(-1), n, x, y, z)
    return x, y, z


def soa_to_aos(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    lib = _load()
    n = x.shape[0]
    if lib is None:
        return np.stack(
            [np.asarray(x, np.float32), np.asarray(y, np.float32),
             np.asarray(z, np.float32)], axis=-1,
        )
    out = np.empty((n, 3), np.float32)
    lib.soa_to_aos(
        np.ascontiguousarray(x, np.float32),
        np.ascontiguousarray(y, np.float32),
        np.ascontiguousarray(z, np.float32), n, out.reshape(-1),
    )
    return out


def moon_craters(z: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                 craters: np.ndarray) -> bool:
    """In-place sequential sphere-clip deformations (terrain data-loader
    hot path).  ``craters`` is ``[K, 5]`` float64 rows of
    ``(cx, cy, cz, radius, down)``.  Returns False when the native
    library is unavailable (caller falls back to the NumPy loop)."""
    lib = _load()
    if lib is None:
        return False
    cr = np.ascontiguousarray(craters, np.float64)
    lib.moon_craters(z, xs, ys, z.shape[0], cr, cr.shape[0])
    return True


def perlin2d(shape, grad: np.ndarray):
    """Perlin noise on a pixel grid from a precomputed gradient lattice
    (``[r0 + 1, r1 + 1, 2]`` float64).  Returns None when the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(shape, np.float64)
    g = np.ascontiguousarray(grad, np.float64)
    lib.perlin2d(out, shape[0], shape[1], g, g.shape[0] - 1,
                 g.shape[1] - 1)
    return out
