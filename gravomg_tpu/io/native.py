"""ctypes bindings to the native host runtime (csrc/gravomg_host.cpp).

Builds on demand with the in-tree Makefile if the shared object is
missing; every function has a pure-Python fallback elsewhere in the
package, so the native library is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgravomg_host.so")
_CSRC = os.path.normpath(os.path.join(_DIR, "..", "..", "csrc"))

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64, i32p, f64p = (ctypes.c_int64,
                       np.ctypeslib.ndpointer(np.int32, flags="C"),
                       np.ctypeslib.ndpointer(np.float64, flags="C"))
    lib.gmg_disc_sample.restype = ctypes.c_int64
    lib.gmg_disc_sample.argtypes = [i64, ctypes.c_int32, i32p, f64p,
                                    ctypes.c_double, i32p]
    lib.gmg_assign_parents.restype = None
    lib.gmg_assign_parents.argtypes = [i64, ctypes.c_int32, i32p, f64p,
                                       i32p, i64, i32p, f64p]
    lib.gmg_average_edge_length.restype = ctypes.c_double
    lib.gmg_average_edge_length.argtypes = [i64, ctypes.c_int32, i32p, f64p]
    lib.gmg_ell_spmv.restype = None
    lib.gmg_ell_spmv.argtypes = [i64, ctypes.c_int32, i32p, f64p, f64p,
                                 f64p, f64p]
    lib.gmg_read_obj.restype = ctypes.c_int64
    lib.gmg_read_obj.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                 ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int64),
                                 ctypes.POINTER(ctypes.c_int64)]
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    lib.gmg_build_hierarchy.restype = ctypes.c_int32
    lib.gmg_build_hierarchy.argtypes = [
        i64, ctypes.c_int32, i32p, f64p, f64p, ctypes.c_double, i64,
        ctypes.c_int32, ctypes.c_int32, i64p,
        ctypes.POINTER(ctypes.c_double)]
    lib.gmg_coarsen_level.restype = ctypes.c_int32
    lib.gmg_coarsen_level.argtypes = [
        i64, ctypes.c_int32, i32p, f64p, f64p, ctypes.c_double,
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int64),
        i32p, i32p, i32p, f64p, f64p, i32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def disc_sample(neighbors: np.ndarray, distances: np.ndarray,
                radius: float) -> np.ndarray:
    lib = _load()
    assert lib is not None
    v, k = neighbors.shape
    out = np.empty(v, np.int32)
    n = lib.gmg_disc_sample(v, k, np.ascontiguousarray(neighbors, np.int32),
                            np.ascontiguousarray(distances, np.float64),
                            float(radius), out)
    return out[:n].copy()


def assign_parents(neighbors: np.ndarray, points: np.ndarray,
                   samples: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    v, k = neighbors.shape
    parent = np.empty(v, np.int32)
    dist = np.empty(v, np.float64)
    lib.gmg_assign_parents(v, k, np.ascontiguousarray(neighbors, np.int32),
                           np.ascontiguousarray(points, np.float64),
                           np.ascontiguousarray(samples, np.int32),
                           len(samples), parent, dist)
    return parent, dist


def average_edge_length(neighbors: np.ndarray,
                        distances: np.ndarray) -> float:
    lib = _load()
    assert lib is not None
    v, k = neighbors.shape
    d = np.where(neighbors != np.int32(2**31 - 1), distances, 0.0)
    return float(lib.gmg_average_edge_length(
        v, k, np.ascontiguousarray(neighbors, np.int32),
        np.ascontiguousarray(d, np.float64)))


def ell_spmv(neighbors: np.ndarray, offdiag: np.ndarray, diag: np.ndarray,
             x: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    v, k = neighbors.shape
    y = np.empty(v, np.float64)
    lib.gmg_ell_spmv(v, k, np.ascontiguousarray(neighbors, np.int32),
                     np.ascontiguousarray(offdiag, np.float64),
                     np.ascontiguousarray(diag, np.float64),
                     np.ascontiguousarray(x, np.float64), y)
    return y


def build_hierarchy(neighbors: np.ndarray, distances: np.ndarray,
                    points: np.ndarray, reduction_ratio: float = 2.0,
                    threshold: int = 1000, max_levels: int = 16,
                    scheme: int = 0) -> Tuple[np.ndarray, float]:
    """Full sequential reference-semantics hierarchy build (C4->C12 per
    level).  The measured CPU baseline for the BASELINE "hierarchy
    construction" metric.  Returns (level_sizes, U weight checksum)."""
    lib = _load()
    assert lib is not None
    v, k = neighbors.shape
    sizes = np.zeros(max_levels, np.int64)
    checksum = ctypes.c_double()
    # Padding distances must be finite for the mean-edge reduction.
    d = np.where(neighbors != np.int32(2**31 - 1), distances, 0.0)
    n = lib.gmg_build_hierarchy(
        v, k, np.ascontiguousarray(neighbors, np.int32),
        np.ascontiguousarray(d, np.float64),
        np.ascontiguousarray(points, np.float64),
        float(reduction_ratio), int(threshold), int(max_levels),
        int(scheme), sizes, ctypes.byref(checksum))
    return sizes[:n].copy(), float(checksum.value)


def coarsen_level(neighbors: np.ndarray, distances: np.ndarray,
                  points: np.ndarray, reduction_ratio: float = 2.0,
                  scheme: int = 0, kc_cap: int = 96) -> dict:
    """One sequential reference-semantics coarsening step with the
    full discrete hierarchy exported (samples, parents, U, coarse
    points + adjacency).  The golden oracle for at-scale compat checks
    (the NumPy oracle in tests/oracle.py is exact but too slow past
    ~10k vertices).  Returns a dict of NumPy arrays."""
    lib = _load()
    assert lib is not None
    v, k = neighbors.shape
    d = np.where(neighbors != np.int32(2**31 - 1), distances, 0.0)
    n_s = ctypes.c_int64()
    samples = np.empty(v, np.int32)
    parents = np.empty(v, np.int32)
    u_cols = np.empty(v * 3, np.int32)
    u_w = np.empty(v * 3, np.float64)
    cpoints = np.empty(v * 3, np.float64)
    cnbr = np.empty(v * kc_cap, np.int32)
    nc = lib.gmg_coarsen_level(
        v, k, np.ascontiguousarray(neighbors, np.int32),
        np.ascontiguousarray(d, np.float64),
        np.ascontiguousarray(points, np.float64),
        float(reduction_ratio), int(scheme), int(kc_cap),
        ctypes.byref(n_s), samples, parents, u_cols, u_w, cpoints, cnbr)
    if nc < 0:
        raise ValueError(f"kc_cap={kc_cap} too small for coarse graph")
    return {
        "samples": samples[:n_s.value].copy(),
        "parents": parents,
        "u_cols": u_cols.reshape(v, 3),
        "u_weights": u_w.reshape(v, 3),
        "coarse_points": cpoints[:nc * 3].reshape(nc, 3).copy(),
        "coarse_nbr": cnbr.reshape(v, kc_cap)[:nc].copy(),
    }


def read_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.gmg_read_obj(path.encode(), None, None,
                          ctypes.byref(nv), ctypes.byref(nf))
    if rc != 0:
        raise FileNotFoundError(path)
    verts = np.empty((nv.value, 3), np.float64)
    faces = np.empty((nf.value, 3), np.int32)
    lib.gmg_read_obj(path.encode(),
                     verts.ctypes.data_as(ctypes.c_void_p),
                     faces.ctypes.data_as(ctypes.c_void_p),
                     ctypes.byref(nv), ctypes.byref(nf))
    return verts, faces
