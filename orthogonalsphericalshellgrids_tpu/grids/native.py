"""ctypes bindings for the native (C++/OpenMP) grid-generation kernels.

The reference notes host-side grid generation "might become slow for sub-kilometer
resolution grids" (src/tripolar_grid.jl:68-71); native/tripolar_gen.cpp parallelizes
the two per-point hot loops. This module compiles the shared library on first use
(plain ``c++ -O3 -fopenmp``; no external build deps) and exposes numpy-compatible
wrappers. Everything degrades gracefully: if no compiler is available the callers use
the pure-numpy path (grids/tripolar.py) — parity between the two is pinned by
tests/test_native.py."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "murray_coords", "metric_arcs"]

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_HERE, "native", "tripolar_gen.cpp")
_LIB_PATH = os.path.join(_HERE, "native", "libtripolar_gen.so")

_lock = threading.Lock()
_lib = None
_tried = False

_D = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                for cc in ("c++", "g++"):
                    try:
                        subprocess.run(
                            [cc, "-O3", "-fopenmp", "-shared", "-fPIC", _SRC,
                             "-o", _LIB_PATH],
                            check=True, capture_output=True, timeout=120,
                        )
                        break
                    except (FileNotFoundError, subprocess.CalledProcessError):
                        continue
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:
            return None

        lib.murray_coords.argtypes = [
            _D, _D, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, _D, _D,
        ]
        lib.metric_arcs.argtypes = (
            [_D] * 8
            + [ctypes.c_int64] * 5
            + [ctypes.c_double]
            + [_D] * 12
        )
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def murray_coords(lam1d, phi1d, nx, focal_distance, first_pole_longitude):
    """Native Murray mapping; returns (lam2, phi2) of shape (ny, nx)."""
    lib = _load()
    assert lib is not None
    lam1d = np.ascontiguousarray(lam1d, np.float64)
    phi1d = np.ascontiguousarray(phi1d, np.float64)
    ny = len(phi1d)
    lam2 = np.empty((ny, nx))
    phi2 = np.empty((ny, nx))
    lib.murray_coords(lam1d, phi1d, nx, ny,
                      float(focal_distance), float(first_pole_longitude), lam2, phi2)
    return lam2, phi2


def metric_arcs(coords, nx, ny, hx, hy, radius):
    """Native metric computation from halo-inclusive coordinate arrays.

    ``coords``: dict with lam_ff/phi_ff/lam_fc/phi_fc/lam_cf/phi_cf/lam_cc/phi_cc,
    each (ny+2hy, nx+2hx). Returns dict of 12 interior (ny, nx) metric arrays."""
    lib = _load()
    assert lib is not None
    args = [np.ascontiguousarray(coords[k], np.float64) for k in
            ("lam_ff", "phi_ff", "lam_fc", "phi_fc", "lam_cf", "phi_cf", "lam_cc", "phi_cc")]
    nxh = args[0].shape[1]
    names = ["dx_cc", "dx_fc", "dx_cf", "dx_ff",
             "dy_cc", "dy_fc", "dy_cf", "dy_ff",
             "az_cc", "az_fc", "az_cf", "az_ff"]
    outs = [np.empty((ny, nx)) for _ in names]
    lib.metric_arcs(*args, nx, ny, nxh, hx, hy, float(radius), *outs)
    return dict(zip(names, outs))
