"""ctypes bindings to the native host runtime (csrc/host_ops.cpp).

The order-dependent detection scans run on the host (SURVEY.md section 7
hard part #4); these C++ implementations replace per-sample Python loops for
multi-million-sample CC series.  Pure-NumPy fallbacks (the oracles in
`ops.reference`) are used automatically when the shared library has not been
built (`make -C csrc`).
"""

from __future__ import annotations

import ctypes as C
import os
import warnings

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lib",
    "libhost_ops.so",
)

_lib = None
if os.path.isfile(_LIB_PATH):
    try:
        _lib = C.CDLL(_LIB_PATH)
        _lib.select_cc_indexes.argtypes = [
            C.POINTER(C.c_float), C.POINTER(C.c_float),
            C.c_int64, C.c_int64, C.POINTER(C.c_int32),
        ]
        _lib.dedup_detections.argtypes = [
            C.POINTER(C.c_int64), C.POINTER(C.c_float),
            C.c_int64, C.c_int64, C.POINTER(C.c_int32),
        ]
        _lib.flag_multiples.argtypes = [
            C.POINTER(C.c_double), C.POINTER(C.c_int64),
            C.POINTER(C.c_float), C.c_int64,
            C.POINTER(C.c_float), C.POINTER(C.c_float), C.c_int64,
            C.c_double, C.c_float, C.c_float, C.POINTER(C.c_int32),
        ]
        _lib.find_similar_moveouts.argtypes = [
            C.POINTER(C.c_float), C.POINTER(C.c_float), C.POINTER(C.c_float),
            C.POINTER(C.c_float), C.POINTER(C.c_float), C.c_float,
            C.c_int64, C.c_int64, C.c_int64, C.c_int64, C.c_int64,
            C.c_int32, C.POINTER(C.c_int32),
        ]
    except OSError as e:  # pragma: no cover
        warnings.warn(f"failed to load libhost_ops.so: {e}")
        _lib = None


def available() -> bool:
    return _lib is not None


def _fptr(x):
    return x.ctypes.data_as(C.POINTER(C.c_float))


def select_cc_indexes(cc, threshold, search_win: int) -> np.ndarray:
    """Boolean trigger mask; see `ops.reference.select_cc_indexes`."""
    cc = np.ascontiguousarray(cc, np.float32)
    n = len(cc)
    if np.ndim(threshold) == 0:
        threshold = np.full(n, float(threshold), np.float32)
    threshold = np.ascontiguousarray(threshold, np.float32)
    if _lib is None:
        from . import reference

        return reference.select_cc_indexes(cc, threshold, search_win)
    sel = np.zeros(n, np.int32)
    _lib.select_cc_indexes(
        _fptr(cc), _fptr(threshold), int(search_win), n,
        sel.ctypes.data_as(C.POINTER(C.c_int32)),
    )
    return sel.astype(bool)


def dedup_detection_indexes(cc_idx, cc, search_win: int) -> np.ndarray:
    """Kept candidate indexes; see `ops.reference.dedup_detection_indexes`."""
    cc_idx = np.ascontiguousarray(cc_idx, np.int64)
    cc = np.ascontiguousarray(cc, np.float32)
    if _lib is None:
        from . import reference

        return reference.dedup_detection_indexes(cc_idx, cc, search_win)
    keep = np.zeros(len(cc_idx), np.int32)
    _lib.dedup_detections(
        cc_idx.ctypes.data_as(C.POINTER(C.c_int64)), _fptr(cc),
        len(cc_idx), int(search_win),
        keep.ctypes.data_as(C.POINTER(C.c_int32)),
    )
    return cc_idx[keep.astype(bool)]


def flag_multiples(
    times, tid_idx, metric, dist=None, ccm=None,
    dt_criterion=3.0, dist_criterion=5.0, cc_criterion=0.33,
) -> np.ndarray:
    """Unique-event mask over a time-sorted catalog (see
    `data.groups.TemplateGroup.remove_multiples`)."""
    times = np.ascontiguousarray(times, np.float64)
    tid_idx = np.ascontiguousarray(tid_idx, np.int64)
    metric = np.ascontiguousarray(metric, np.float32)
    n = len(times)
    n_tid = 0
    dist_p = ccm_p = None
    if dist is not None:
        dist = np.ascontiguousarray(dist, np.float32)
        n_tid = dist.shape[0]
        dist_p = _fptr(dist)
    if ccm is not None:
        ccm = np.ascontiguousarray(ccm, np.float32)
        n_tid = ccm.shape[0]
        ccm_p = _fptr(ccm)
    if _lib is None:
        raise RuntimeError(
            "libhost_ops.so not built; run `make -C csrc` or use "
            "TemplateGroup.remove_multiples"
        )
    out = np.zeros(n, np.int32)
    _lib.flag_multiples(
        times.ctypes.data_as(C.POINTER(C.c_double)),
        tid_idx.ctypes.data_as(C.POINTER(C.c_int64)),
        _fptr(metric), n, dist_p, ccm_p, n_tid,
        float(dt_criterion), float(dist_criterion), float(cc_criterion),
        out.ctypes.data_as(C.POINTER(C.c_int32)),
    )
    return out.astype(bool)


def find_similar_sources(
    moveouts, source_longitude, source_latitude, cell_longitude,
    cell_latitude, threshold, num_stations_for_diff=None, method="closest",
) -> np.ndarray:
    """Redundant-source mask; see `ops.reference.find_similar_sources`."""
    mv = np.ascontiguousarray(moveouts, np.float32)
    n_src, n_sta = mv.shape
    k = n_sta if num_stations_for_diff is None else int(num_stations_for_diff)
    if _lib is None:
        from . import reference

        return reference.find_similar_sources(
            mv, source_longitude, source_latitude, cell_longitude,
            cell_latitude, threshold, num_stations_for_diff=k, method=method,
        )
    lon = np.ascontiguousarray(source_longitude, np.float32)
    lat = np.ascontiguousarray(source_latitude, np.float32)
    cl = np.ascontiguousarray(cell_longitude, np.float32)
    ca = np.ascontiguousarray(cell_latitude, np.float32)
    out = np.zeros(n_src, np.int32)
    _lib.find_similar_moveouts(
        _fptr(mv), _fptr(lon), _fptr(lat), _fptr(cl), _fptr(ca),
        float(threshold), n_src, n_sta, len(cl) - 1, len(ca) - 1, k,
        1 if method == "closest" else 0,
        out.ctypes.data_as(C.POINTER(C.c_int32)),
    )
    return out.astype(bool)
