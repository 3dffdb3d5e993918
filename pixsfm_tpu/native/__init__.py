"""ctypes bindings for the native graph core (graph_core.cpp).

Loads ``libgraph_core.so`` if present (build with ``native/build.sh``); callers
fall back to the numpy implementations otherwise.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["lib", "available", "compute_track_labels_native",
           "compute_score_labels_native", "compute_root_labels_native",
           "ffd_bin_packing_native"]

_LIB_PATH = Path(__file__).parent / "libgraph_core.so"
lib: Optional[ctypes.CDLL] = None

if _LIB_PATH.exists():
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        _i64p = ctypes.POINTER(ctypes.c_int64)
        _f64p = ctypes.POINTER(ctypes.c_double)
        _u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.psf_compute_track_labels.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _i64p, _i64p, _f64p, _i64p, _i64p]
        lib.psf_compute_score_labels.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _i64p, _i64p, _f64p, _i64p, _f64p]
        lib.psf_compute_root_labels.argtypes = [
            ctypes.c_int64, _i64p, _f64p, _u8p]
        lib.psf_ffd_bin_packing.argtypes = [
            ctypes.c_int64, _i64p, ctypes.c_int64, _i64p]
        lib.psf_ffd_bin_packing.restype = ctypes.c_int64
    except OSError:
        lib = None


def available() -> bool:
    return lib is not None


def _p64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _pf64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def compute_track_labels_native(src, dst, sim, node_image_ids) -> np.ndarray:
    n_nodes = len(node_image_ids)
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    sim = np.ascontiguousarray(sim, np.float64)
    ids = np.ascontiguousarray(node_image_ids, np.int64)
    out = np.empty(n_nodes, np.int64)
    lib.psf_compute_track_labels(n_nodes, len(src), _p64(src), _p64(dst),
                                 _pf64(sim), _p64(ids), _p64(out))
    return out


def compute_score_labels_native(n_nodes, src, dst, sim,
                                track_labels) -> np.ndarray:
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    sim = np.ascontiguousarray(sim, np.float64)
    tl = np.ascontiguousarray(track_labels, np.int64)
    out = np.zeros(n_nodes, np.float64)
    lib.psf_compute_score_labels(n_nodes, len(src), _p64(src), _p64(dst),
                                 _pf64(sim), _p64(tl), _pf64(out))
    return out


def compute_root_labels_native(track_labels, scores) -> np.ndarray:
    tl = np.ascontiguousarray(track_labels, np.int64)
    sc = np.ascontiguousarray(scores, np.float64)
    out = np.zeros(len(tl), np.uint8)
    lib.psf_compute_root_labels(
        len(tl), _p64(tl), _pf64(sc),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(bool)


def ffd_bin_packing_native(track_counts, max_per_problem):
    tc = np.ascontiguousarray(track_counts, np.int64)
    out = np.empty(len(tc), np.int64)
    n_bins = lib.psf_ffd_bin_packing(len(tc), _p64(tc),
                                     int(max_per_problem), _p64(out))
    return out, int(n_bins)
