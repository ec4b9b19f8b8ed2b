"""Native (C++/OpenMP) grid-generation kernels: parity with the numpy reference path."""

import numpy as np
import pytest

from orthogonalsphericalshellgrids_tpu.grids import native
from orthogonalsphericalshellgrids_tpu.grids.tripolar import (
    _murray_mapping, _tand, build_tripolar_arrays,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_murray_parity():
    nx, ny = 60, 30
    dlam = 360.0 / nx
    lam1 = -180.0 + dlam * np.arange(nx)
    phi1 = np.linspace(-80.0, 90.0, ny)
    a = _tand((90.0 - 55.0) / 2.0)

    lam_np, phi_np = _murray_mapping(lam1, phi1, nx, a, 70.0)
    lam_c, phi_c = native.murray_coords(lam1, phi1, nx, a, 70.0)

    # identical math incl. the signed-zero branch on the +-180 meridian; allow only
    # libm ulp-level differences
    np.testing.assert_allclose(lam_c, lam_np, rtol=0, atol=1e-9)
    np.testing.assert_allclose(phi_c, phi_np, rtol=0, atol=1e-11)


def test_metric_parity():
    raw = build_tripolar_arrays((48, 24, 1), halo=(4, 4, 4))
    m = raw["meta"]
    nx, ny, hx, hy = m["Nx"], m["Ny"], m["Hx"], m["Hy"]
    coords = {k: raw[k] for k in
              ("lam_ff", "phi_ff", "lam_fc", "phi_fc", "lam_cf", "phi_cf", "lam_cc", "phi_cc")}
    out = native.metric_arcs(coords, nx, ny, hx, hy, m["radius"])

    J, I = slice(hy, hy + ny), slice(hx, hx + nx)
    for name, arr in out.items():
        ref = raw[name][J, I]
        if name in ("dy_cf", "dy_ff", "az_cf"):
            # row 1 of the numpy build was overwritten by the lat-lon south
            # continuation (the native kernel returns the raw pre-continuation values)
            np.testing.assert_allclose(arr[1:], ref[1:], rtol=1e-12, err_msg=name)
        else:
            np.testing.assert_allclose(arr[1:], ref[1:], rtol=1e-12, err_msg=name)


def test_native_speedup_smoke():
    """The native path must at least run a large mapping quickly (smoke, not a perf
    assertion — CI hosts vary)."""
    nx, ny = 1440, 680
    dlam = 360.0 / nx
    lam1 = -180.0 + dlam * np.arange(nx)
    phi1 = np.linspace(-80.0, 90.0, ny)
    a = _tand(17.5)
    lam, phi = native.murray_coords(lam1, phi1, nx, a, 70.0)
    assert lam.shape == (ny, nx) and np.all(np.isfinite(phi))
