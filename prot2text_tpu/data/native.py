"""ctypes bindings for the C++ featurization kernels (native/libfeaturize.so).

Build with `make -C native` (g++ -O3 -fopenmp).  Falls back to the numpy
implementations in pdb_graph.py when the library is absent — import errors
here are expected and handled by callers.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "native", "libfeaturize.so")
        lib = ctypes.CDLL(path)
        lib.shrake_rupley.restype = None
        lib.shrake_rupley.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # coords (n, 3)
            ctypes.POINTER(ctypes.c_double),  # radii (n,)
            ctypes.c_int,                     # n_atoms
            ctypes.c_int,                     # n_points
            ctypes.POINTER(ctypes.c_double),  # out areas (n,)
        ]
        _LIB = lib
    return _LIB


def sasa(coords: np.ndarray, radii: np.ndarray, n_points: int) -> np.ndarray:
    lib = _lib()
    coords = np.ascontiguousarray(coords, np.float64)
    radii = np.ascontiguousarray(radii, np.float64)
    out = np.zeros(len(radii), np.float64)
    lib.shrake_rupley(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        radii.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(radii), n_points,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
