"""Grid-construction tests.

Ports of the reference's unit/property tests (SURVEY.md §4):
- construction properties for Float32/Float64 (test/runtests.jl:8-41)
- README correctness anchor for the 60x30x1 grid (README.md:55-59)
- orthogonality of the Murray mapping vs the conformal cubed-sphere panel oracle
  (test/test_tripolar_grid.jl:36-76; panel built by grids/cubed_sphere.py)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from orthogonalsphericalshellgrids_tpu import TripolarGrid, build_tripolar_arrays, with_halo
from orthogonalsphericalshellgrids_tpu.grids.cubed_sphere import (
    conformal_cubed_sphere_coordinates, conformal_panel_nodes, nonorthogonality_angle,
)
from orthogonalsphericalshellgrids_tpu.grids.geometry import lat_lon_to_cartesian


def interior(raw, name):
    m = raw["meta"]
    return raw[name][m["Hy"] : m["Hy"] + m["Ny"], m["Hx"] : m["Hx"] + m["Nx"]]


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_construction_properties(dtype):
    # Mirror of test/runtests.jl:8-41 (4x5x1 grid, non-default pole parameters).
    grid = TripolarGrid.make(
        (4, 5, 1),
        z=(0, 1),
        first_pole_longitude=75,
        north_poles_latitude=35,
        southernmost_latitude=-80,
        dtype=dtype,
    )
    assert grid.dtype == dtype
    assert grid.Nx == 4 and grid.Ny == 5 and grid.Nz == 1

    # conformal-mapping round-trip (test/runtests.jl:16-25)
    assert grid.conformal_mapping["first_pole_longitude"] == 75
    assert grid.conformal_mapping["north_poles_latitude"] == 35
    assert grid.conformal_mapping["southernmost_latitude"] == -80

    lam = np.asarray(grid.interior(grid.lam_cc))
    phi = np.asarray(grid.interior(grid.phi_cc))
    assert lam.min() >= 0
    assert lam.max() <= 360
    assert phi.max() <= 90

    # the grid "undulates": min latitude within Δφ/10 of southernmost (:36-39)
    min_dphi = np.min(phi[1, :] - phi[0, :])
    assert np.min(phi + min_dphi / 10) >= grid.southernmost_latitude


def test_even_Nx_required():
    # src/tripolar_grid.jl:81-83
    with pytest.raises(ValueError):
        build_tripolar_arrays((5, 4, 1))


def test_readme_60x30_anchor():
    """Pin the quantitative anchor from the reference README (README.md:55-59):
    min/max Δλ = 0.279019/6.32049 deg, min/max Δφ = 0.429975/5.86207 deg, which are the
    Δxᶠᶠ and Δyᶠᶠ/Δyᶠᶜ haversine metrics expressed as great-circle degrees."""
    raw = build_tripolar_arrays((60, 30, 1))
    R = raw["meta"]["radius"]

    dx_ff = np.degrees(interior(raw, "dx_ff") / R)
    assert np.isclose(dx_ff.min(), 0.279019, rtol=1e-4)
    assert np.isclose(dx_ff.max(), 6.32049, rtol=1e-4)

    # Row 1 of Δyᶠᶠ is the lat-lon continuation (see continue_south! discussion in
    # grids/tripolar.py); the tripolar rows are 2..Ny.
    dy_ff = np.degrees(interior(raw, "dy_ff")[1:, :] / R)
    assert np.isclose(dy_ff.min(), 0.429975, rtol=1e-4)
    dy_fc = np.degrees(interior(raw, "dy_fc") / R)
    assert np.isclose(dy_fc.max(), 5.86207, rtol=1e-4)


def test_metric_positivity_and_halo_consistency():
    raw = build_tripolar_arrays((24, 16, 1), halo=(3, 3, 3))
    m = raw["meta"]
    Nx, Hx = m["Nx"], m["Hx"]
    # dx_fc/dy_fc (and hence az_fc) touch zero at the pole columns on the fold, where
    # adjacent coordinate nodes coincide — a real property of the reference metrics too.
    for name in ["dx_cc", "dy_cc", "az_cc", "az_ff", "dx_ff", "dy_ff"]:
        assert np.all(interior(raw, name) > 0), name
    for name in ["az_fc", "az_cf", "dx_fc", "dy_fc", "dx_cf", "dy_cf"]:
        assert np.all(interior(raw, name) >= 0), name
        full = raw[name]
        # periodic x-halo consistency on every row (including folded north halo rows)
        np.testing.assert_allclose(full[:, :Hx], full[:, Nx : Nx + Hx], err_msg=name)
        np.testing.assert_allclose(full[:, Hx + Nx :], full[:, Hx : 2 * Hx], err_msg=name)


def test_pole_locations():
    """North singularities (the Murray-mapping foci) land at i=1 and i=Nλ/2+1 on the
    last center row after the circshift (src/tripolar_grid.jl:119-130 and docstring:
    'The north singularities are located at i = 1, j = Nφ and i = Nλ÷2+1, j = Nφ'),
    at latitude north_poles_latitude and longitudes first_pole_longitude (+180).
    The geographic north pole itself is a *regular* center point of the grid."""
    raw = build_tripolar_arrays((40, 20, 1), first_pole_longitude=70, north_poles_latitude=55)
    phi_fc = interior(raw, "phi_fc")
    lam_fc = interior(raw, "lam_fc")
    # 0-based columns 0 and Nx/2 of the last center row are the two singularities
    assert np.isclose(phi_fc[-1, 0], 55.0, atol=1e-12)
    assert np.isclose(phi_fc[-1, 20], 55.0, atol=1e-12)
    assert np.isclose(lam_fc[-1, 20], 70.0, atol=1e-12)     # first pole
    assert np.isclose(lam_fc[-1, 0], 250.0, atol=1e-12)    # second pole = first + 180
    # the geographic north pole is an ordinary grid point: φ = 90 somewhere on row Nφ
    assert np.isclose(phi_fc[-1, :].max(), 90.0, atol=1e-12)


def test_area_metric_consistency():
    """Az_cc (spherical quadrilateral of the FF corners) must agree with the Δx·Δy
    product away from the singularities, where cells are nearly planar rectangles.
    (Near the poles the quads become strongly curved/butterfly-shaped and the
    reference's abs-based triangle-excess formula inflates them — a property shared by
    construction here.)"""
    raw = build_tripolar_arrays((60, 30, 1))
    az = interior(raw, "az_cc")
    dx = interior(raw, "dx_cc")
    dy = interior(raw, "dy_cc")
    phi = interior(raw, "phi_cc")
    lam = interior(raw, "lam_cc")
    ratio = az / (dx * dy)
    # away from the two singularities (λ=70±, λ=250± at φ≈55) and the strongly-curved
    # far north
    safe = (phi < 40.0) & (phi > -75.0)
    r = np.where(safe, ratio, 1.0)
    assert np.all(np.abs(r - 1.0) < 0.02), (r.min(), r.max())


def test_conformal_cubed_sphere_map():
    """Analytic invariants of the Rancic (1996) conformal map backing the oracle:
    face centre -> pole, corners -> cube corners, edge midpoints -> edge-arc
    midpoints, unit norm everywhere, and near-perfect conformality away from the
    corners (the discrete angle defect of a conformal map vanishes with h)."""
    X, Y, Z = conformal_cubed_sphere_coordinates(
        np.array([0.0, 1.0, -1.0, 1.0, 0.0]), np.array([0.0, 1.0, -1.0, 0.0, -1.0])
    )
    s3, s2 = 1 / np.sqrt(3.0), 1 / np.sqrt(2.0)
    np.testing.assert_allclose([X[0], Y[0], Z[0]], [0, 0, 1], atol=1e-12)
    np.testing.assert_allclose([X[1], Y[1], Z[1]], [s3, s3, s3], atol=1e-12)
    np.testing.assert_allclose([X[2], Y[2], Z[2]], [-s3, -s3, s3], atol=1e-12)
    # edge midpoints are exact up to the 30-term series truncation (~1e-4)
    np.testing.assert_allclose([X[3], Y[3], Z[3]], [s2, 0, s2], atol=5e-4)
    np.testing.assert_allclose([X[4], Y[4], Z[4]], [0, -s2, s2], atol=5e-4)
    Xp, Yp, Zp = conformal_panel_nodes(32)
    np.testing.assert_allclose(Xp**2 + Yp**2 + Zp**2, 1.0, atol=1e-12)
    ang = nonorthogonality_angle(Xp, Yp, Zp)
    assert np.max(np.abs(ang[8:-8, 8:-8])) < 1.0  # interior: conformal


def test_orthogonality():
    """Port of test/test_tripolar_grid.jl:36-76, including the comparison oracle: a
    1-degree conformal cubed-sphere panel (grids/cubed_sphere.py, Rancic 1996 map).
    The tripolar mesh's non-orthogonality angle — singularities masked as in the
    reference — must lie strictly inside the panel's corner-excluded range
    (test/test_tripolar_grid.jl:74-75)."""
    first_pole_longitude = 75.0
    north_poles_latitude = 35.0
    raw = build_tripolar_arrays(
        (360, 180, 1),
        first_pole_longitude=first_pole_longitude,
        north_poles_latitude=north_poles_latitude,
    )
    m = raw["meta"]
    lam = interior(raw, "lam_ff")
    phi = interior(raw, "phi_ff")
    x, y, z = lat_lon_to_cartesian(phi, lam, 1.0, xp=np)

    # angle between the i+1 and j+1 edge vectors at each FF node (reference kernel
    # compute_nonorthogonality_angle!, test/test_tripolar_grid.jl:8-34)
    def edge(a):
        return a[:-1, 1:] - a[:-1, :-1], a[1:, :-1] - a[:-1, :-1]

    (v1x, v2x), (v1y, v2y), (v1z, v2z) = edge(x), edge(y), edge(z)
    dot = v1x * v2x + v1y * v2y + v1z * v2z
    n1 = np.sqrt(v1x**2 + v1y**2 + v1z**2)
    n2 = np.sqrt(v2x**2 + v2y**2 + v2z**2)
    cos = np.clip(dot / (n1 * n2), -1, 1)
    angle = np.degrees(np.arccos(cos)) - 90.0

    lam_c = lam[:-1, :-1]
    phi_c = phi[:-1, :-1]
    second_pole = (first_pole_longitude + 180.0) % 360.0
    near_sing = (
        ((np.abs(lam_c - first_pole_longitude) < 5) & (np.abs(phi_c - north_poles_latitude) < 5))
        | ((np.abs(lam_c - second_pole) < 5) & (np.abs(phi_c - north_poles_latitude) < 5))
        | (phi_c < -78)
    )
    masked = np.where(near_sing, 0.0, angle)

    # Oracle: 90x90 conformal cubed-sphere panel, corners excluded exactly as the
    # reference's KernelParameters(5:Nx-5, 5:Ny-5) (test/test_tripolar_grid.jl:48).
    Xp, Yp, Zp = conformal_panel_nodes(90)
    angle_cs = nonorthogonality_angle(Xp, Yp, Zp)[4:85, 4:85]

    # test/test_tripolar_grid.jl:74-75 — strictly inside the oracle's range.
    # (Measured: tripolar (-1.61, +0.92) vs panel (-1.66, +2.21).)
    assert np.max(masked) < np.max(angle_cs), (np.max(masked), np.max(angle_cs))
    assert np.min(masked) > np.min(angle_cs), (np.min(masked), np.min(angle_cs))
    assert np.median(np.abs(masked)) < 0.5


def test_with_halo_reconstruction():
    """with_halo regenerates from conformal-mapping params (src/with_halo.jl:5-23):
    interiors must match bit-for-bit, halo widths change."""
    g1 = TripolarGrid.make((16, 12, 1), halo=(2, 2, 2), dtype=jnp.float64)
    g2 = with_halo(g1, (5, 5, 5))
    assert g2.halo == (5, 5, 5)
    assert g1.size == g2.size
    np.testing.assert_array_equal(np.asarray(g1.interior(g1.lam_cc)), np.asarray(g2.interior(g2.lam_cc)))
    np.testing.assert_array_equal(np.asarray(g1.interior(g1.az_ff)), np.asarray(g2.interior(g2.az_ff)))
    # deeper interior metrics identical too (row 1 differs only if halo changes the
    # south continuation, which it does not for j >= 2)
    np.testing.assert_array_equal(
        np.asarray(g1.interior(g1.dy_cf))[1:], np.asarray(g2.interior(g2.dy_cf))[1:]
    )


def test_newton_phi_spacing():
    """Opt-in Newton latitude placement (BASELINE north star: "jitted Newton solve").
    A constant law reproduces the reference's uniform placement exactly; an
    equatorial-refinement law (the production ORCA-style use) halves the equatorial
    spacing relative to the poles with exact endpoints; the resulting mesh is still
    a cofocal family, so its non-orthogonality stays inside the cubed-sphere oracle."""
    from orthogonalsphericalshellgrids_tpu.grids.tripolar import newton_phi_nodes

    # constant law == uniform placement (and the default path has no law at all)
    ph = newton_phi_nodes(-80.0, 31, lambda p: 1.0 + 0.0 * p)
    np.testing.assert_allclose(ph, np.linspace(-80.0, 90.0, 31), atol=1e-10)
    assert TripolarGrid.make((8, 6, 1)).phi_spacing is None

    law = lambda p: 1.0 - 0.5 * jnp.exp(-((p / 15.0) ** 2))
    ph = newton_phi_nodes(-80.0, 61, law)
    assert ph[0] == -80.0 and ph[-1] == 90.0
    d = np.diff(ph)
    assert np.all(d > 0)
    ratio = d[np.abs(ph[:-1]).argmin()] / d[-1]
    np.testing.assert_allclose(ratio, 0.5, rtol=1e-3)

    # a non-positive law cannot reach the pole monotonically
    with pytest.raises(ValueError):
        newton_phi_nodes(-80.0, 31, lambda p: 0.0 * p)

    # the refined grid's rows still ride the same cofocal family: non-orthogonality
    # stays strictly inside the conformal cubed-sphere panel's (as in
    # test_orthogonality, which pins the uniform grid)
    raw = build_tripolar_arrays((360, 180, 1), first_pole_longitude=75.0,
                                north_poles_latitude=35.0, phi_spacing=law)
    m = raw["meta"]
    lam = raw["lam_ff"][m["Hy"]:-m["Hy"], m["Hx"]:-m["Hx"]]
    phi = raw["phi_ff"][m["Hy"]:-m["Hy"], m["Hx"]:-m["Hx"]]
    x, y, z = lat_lon_to_cartesian(phi, lam, 1.0, xp=np)
    ang = nonorthogonality_angle(x, y, z)
    lam_c, phi_c = lam[:-1, :-1], phi[:-1, :-1]
    # the reference's 5-deg singularity mask is resolution-matched to its uniform
    # 1-deg grid; the refined mesh is ~8% coarser at the pole latitude (rows moved
    # to the equator), so the masked radius scales with the local spacing (5 -> 5.5)
    sing = (((np.abs(lam_c - 75.0) < 5.5) & (np.abs(35.0 - phi_c) < 5.5))
            | ((np.abs(lam_c - 255.0) < 5.5) & (np.abs(35.0 - phi_c) < 5.5))
            | (phi_c < -78))
    masked = np.where(sing, 0.0, ang)
    Xp, Yp, Zp = conformal_panel_nodes(90)
    cs = nonorthogonality_angle(Xp, Yp, Zp)[4:85, 4:85]
    assert np.max(masked) < np.max(cs) and np.min(masked) > np.min(cs)
