"""ctypes bindings for the C++ featurization kernels (native/libfeaturize.so).

Build with `make -C native` (g++ -O3 -fopenmp) — or let the first use
AUTO-BUILD it (one `make` subprocess when the .so is absent and a compiler
exists).  Falls back to the numpy implementations in pdb_graph.py when the
library can't be built — OSError here is expected and handled by callers.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess

import numpy as np

_LIB = None


def _ensure_built(native_dir: str, path: str):
    if os.path.exists(path):
        return
    if shutil.which("make") is None or shutil.which(
            os.environ.get("CXX", "g++")) is None:
        raise OSError("libfeaturize.so not built and no toolchain found")
    # every failure mode must surface as OSError — that is the module's
    # fallback contract (callers catch OSError and use the numpy path); a
    # leaked TimeoutExpired/SubprocessError would crash the data pipeline.
    # An flock serializes first-use races between forkserver loader workers
    # (two parallel makes would clobber each other's .o files).
    import fcntl

    with open(os.path.join(native_dir, ".build.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if os.path.exists(path):      # another worker built it meanwhile
            return
        try:
            r = subprocess.run(["make", "-C", native_dir],
                               capture_output=True, text=True, timeout=120)
        except subprocess.SubprocessError as e:
            raise OSError(f"native build did not complete: {e!r}") from e
        if r.returncode != 0 or not os.path.exists(path):
            raise OSError(f"native build failed: {r.stderr[-500:]}")


def _lib():
    global _LIB
    if _LIB is None:
        native_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "native")
        path = os.path.join(native_dir, "libfeaturize.so")
        _ensure_built(native_dir, path)
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
