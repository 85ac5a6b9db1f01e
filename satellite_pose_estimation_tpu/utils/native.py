"""ctypes bindings for the native geometry reference library.

The C++ library (native/src/geometry_ref.cc) provides host reference
implementations of the weighted-Huber LM PnP (Ceres equivalent) and exact
LSAP, used to cross-validate the device JAX kernels bit-for-bit at f64.
Build with native/build.sh; loading is lazy and optional.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libgeometry_ref.so",
)
_lib = None


def _load():
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            raise FileNotFoundError(
                f"{_LIB_PATH} not built; run native/build.sh"
            )
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.gn_pnp_refine.restype = ctypes.c_double
        _lib.gn_pnp_refine.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib.lsap.restype = ctypes.c_double
        _lib.lsap.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
    return _lib


def available() -> bool:
    return os.path.exists(_LIB_PATH)


def gn_pnp_refine(
    world: np.ndarray,
    obs_norm: np.ndarray,
    rvec0: np.ndarray,
    tvec0: np.ndarray,
    weights: Optional[np.ndarray] = None,
    mask: Optional[np.ndarray] = None,
    huber_delta: float = 0.0,
    iters: int = 20,
) -> Tuple[np.ndarray, np.ndarray, float]:
    lib = _load()
    n = world.shape[0]
    world = np.ascontiguousarray(world, np.float64)
    obs = np.ascontiguousarray(obs_norm, np.float64)
    w = np.ascontiguousarray(
        weights if weights is not None else np.ones((n, 2)), np.float64
    )
    m = np.ascontiguousarray(
        mask if mask is not None else np.ones(n), np.uint8
    )
    rt = np.concatenate(
        [np.asarray(rvec0, np.float64).ravel(),
         np.asarray(tvec0, np.float64).ravel()]
    ).copy()
    c = lib.gn_pnp_refine(
        world.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        obs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n,
        float(huber_delta),
        int(iters),
        rt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return rt[:3], rt[3:], float(c)


def lsap(cost: np.ndarray) -> Tuple[np.ndarray, float]:
    """cost (rows, cols) with rows <= cols; returns (col4row, total)."""
    lib = _load()
    cost = np.ascontiguousarray(cost, np.float64)
    rows, cols = cost.shape
    out = np.zeros(rows, np.int32)
    total = lib.lsap(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows,
        cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, float(total)
