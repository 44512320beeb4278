"""ctypes loader for the native host-side point ops (csrc/libpointops.so).

The device path never calls this — KNN/gather run on-chip. The native
library accelerates host data prep (the role of the reference's
nanoflann/Cython KNN and C++ grid subsampling). If the .so has not been
built (`make -C csrc`), callers fall back to numpy implementations.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "csrc",
        "libpointops.so",
    )
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.pointops_knn.argtypes = [
        f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int, i32p
    ]
    lib.pointops_knn_batch.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, i32p,
    ]
    try:  # stale .so built before the distance-pick ops is still usable
        lib.pointops_knn_distance_pick.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
            f32p, i32p,
        ]
        lib.pointops_knn_distance_pick_batch.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, f32p, i32p,
        ]
    except AttributeError:
        pass
    lib.pointops_grid_subsample.restype = ctypes.c_int
    lib.pointops_grid_subsample.argtypes = [
        f32p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_float, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def knn(support: np.ndarray, query: np.ndarray, k: int) -> np.ndarray:
    """Host KD-tree KNN: (Ns, 3), (Nq, 3) -> (Nq, k) int32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libpointops.so not built (make -C csrc)")
    support = np.ascontiguousarray(support, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    out = np.empty((query.shape[0], k), np.int32)
    lib.pointops_knn(support, support.shape[0], query, query.shape[0], k, out)
    return out


def knn_batch(support: np.ndarray, query: np.ndarray, k: int) -> np.ndarray:
    """(B, Ns, 3), (B, Nq, 3) -> (B, Nq, k) int32 — drop-in for the
    reference's nearest_neighbors.knn_batch (knn.pyx:71)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libpointops.so not built (make -C csrc)")
    support = np.ascontiguousarray(support, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    b, ns, _ = support.shape
    nq = query.shape[1]
    out = np.empty((b, nq, k), np.int32)
    lib.pointops_knn_batch(support, query, b, ns, nq, k, out)
    return out


def knn_batch_distance_pick(pts: np.ndarray, nqueries: int, k: int,
                            seed: int = 0):
    """Coverage-greedy query picking + KNN — surface parity with the
    reference's nearest_neighbors.knn_batch_distance_pick (knn.pyx:111,
    knn_.cxx:138-270): (B, N, 3) -> ((B, nq, 3) picked queries,
    (B, nq, k) neighbor indices). Deterministic given ``seed``."""
    lib = _load()
    if lib is None or not hasattr(lib, "pointops_knn_distance_pick_batch"):
        raise RuntimeError(
            "libpointops.so not built or too old (make -C csrc)"
        )
    pts = np.ascontiguousarray(pts, np.float32)
    b, n, _ = pts.shape
    queries = np.empty((b, nqueries, 3), np.float32)
    idx = np.empty((b, nqueries, k), np.int32)
    lib.pointops_knn_distance_pick_batch(
        pts, b, n, nqueries, k, ctypes.c_uint64(seed), queries, idx
    )
    return queries, idx


def grid_subsample(points, features=None, labels=None, grid_size=0.1):
    """Native grid subsampling; same return arity as
    ops.subsample.grid_subsample."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libpointops.so not built (make -C csrc)")
    points = np.ascontiguousarray(points, np.float32)
    n = points.shape[0]
    feats = (
        np.ascontiguousarray(features, np.float32)
        if features is not None
        else None
    )
    fdim = 0 if feats is None else feats.shape[1]
    labs = (
        np.ascontiguousarray(labels, np.int32).reshape(-1)
        if labels is not None
        else None
    )
    n_classes = int(labs.max()) + 1 if labs is not None and labs.size else 0

    def ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None

    m = lib.pointops_grid_subsample(
        points, n, ptr(feats), fdim, ptr(labs), n_classes,
        ctypes.c_float(grid_size), 1, None, None, None,
    )
    out_points = np.empty((m, 3), np.float32)
    out_feats = np.empty((m, fdim), np.float32) if feats is not None else None
    out_labs = np.empty((m,), np.int32) if labs is not None else None
    lib.pointops_grid_subsample(
        points, n, ptr(feats), fdim, ptr(labs), n_classes,
        ctypes.c_float(grid_size), 0,
        out_points.ctypes.data_as(ctypes.c_void_p),
        ptr(out_feats), ptr(out_labs),
    )
    out = [out_points]
    if feats is not None:
        out.append(out_feats)
    if labs is not None:
        out.append(out_labs)
    return out[0] if len(out) == 1 else tuple(out)
