"""Quantitative dynamics pin: shallow-water gravity-wave speed.

A small free-surface bump on a deep (H = 4000 m) all-ocean tripolar grid radiates a
ring wave whose front travels at c = sqrt(g H) (non-dispersive shallow-water limit).
This checks the split-explicit barotropic solver's wave dynamics END TO END — metric
terms, pressure gradient, divergence, substep averaging — against an analytic speed,
complementing the conservation/symmetry pins (tests/test_model.py).

The bump sits in the southern lat-lon region of the grid (far from the fold), and the
front position is measured along a meridian as the outermost radius where the surface
elevation exceeds a fraction of the running maximum.
"""

import numpy as np

import jax
import jax.numpy as jnp

import orthogonalsphericalshellgrids_tpu as osg
from orthogonalsphericalshellgrids_tpu.models import (
    SplitExplicitFreeSurface, initial_state, make_model, step)

G = 9.80665
H = 4000.0


def test_gravity_wave_speed():
    # 2-degree grid; z = (-H, 0) gives wave speed c = sqrt(gH) ~ 198 m/s
    grid = osg.TripolarGrid.make((180, 90, 1), dtype=jnp.float64, z=(-H, 0.0))

    def bottom(lam, phi):
        # mask the two NH pole singularities (degenerate dx -> barotropic CFL blows
        # up there unmasked — the reference's examples always mask them too,
        # examples/bickley_jet.jl:26-29); the wave region stays all ocean
        land = (((np.abs(lam - 70.0) < 12) | (np.abs(lam - 250.0) < 12)) & (phi > 45))
        return np.where(land, 1.0, -H - 1.0)

    model = make_model(grid, free_surface=SplitExplicitFreeSurface(substeps=30),
                       bottom_height=bottom)

    lam0, phi0 = 90.0, -40.0   # bump center, deep in the lat-lon region

    def eta0(lam, phi):
        # great-circle distance from the bump center (meters)
        dist = _hav(lam, phi, lam0, phi0, grid.radius)
        return 0.1 * np.exp(-((dist / 2.5e5) ** 2))

    state = initial_state(model, eta=eta0)

    dt = 600.0
    n_steps = 12
    sj = jax.jit(lambda s: step(model, s, dt))
    for _ in range(n_steps):
        state = sj(state)
    T = dt * n_steps
    c_expected = np.sqrt(G * H)

    # radial profile of eta along the meridian through the bump, going north
    eta = np.asarray(model.grid_ext.interior(state.eta))
    lam_cc = np.asarray(grid.interior(grid.lam_cc))
    phi_cc = np.asarray(grid.interior(grid.phi_cc))
    i0 = int(np.argmin(np.abs(lam_cc[0] - lam0)))
    lam_line = lam_cc[:, i0]
    phi_line = phi_cc[:, i0]
    eta_line = eta[:, i0]
    r_line = _hav(lam_line, phi_line, lam0, phi0, grid.radius)

    north = phi_line > phi0
    r, e = r_line[north], eta_line[north]
    order = np.argsort(r)
    r, e = r[order], e[order]
    # wavefront = radius of the ring's elevation maximum (measured: 1.3% error on
    # this configuration; the bound allows half-cell quantization, ~200 km)
    r_peak = r[np.argmax(e)]

    c_measured = r_peak / T
    assert np.isfinite(eta).all()
    assert abs(c_measured - c_expected) < 0.12 * c_expected, (
        f"measured {c_measured:.1f} m/s, expected ~{c_expected:.1f} m/s")


def _hav(lam1, phi1, lam2, phi2, radius):
    p1, p2 = np.deg2rad(phi1), np.deg2rad(phi2)
    dl = np.deg2rad(np.abs(lam1 - lam2))
    dl = np.minimum(dl, 2 * np.pi - dl)
    a = np.sin((p2 - p1) / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * radius * np.arcsin(np.sqrt(np.clip(a, 0, 1)))


def test_internal_gravity_wave_speed_two_layer():
    """Quantitative LAYERED dynamics pin: two-layer internal gravity-wave speed.

    A 50 m interface bump between two 500 m layers (buoyancy jump Δb) radiates an
    internal ring wave. For this z-LEVEL discretization the two-level internal-mode
    eigenvalue is c² = Δb·h/4 — derived analytically from the model's own linearized
    semi-discrete system (flux-form tracer advection + Centered vertical flux +
    layer-center hydrostatic cumsum pressure; docs/parity.md row L5). That is 1/√2
    of the immiscible two-LAYER (isopycnal) formula √(Δb·h1h2/H): a two-level z-grid
    resolves the mode-1 vertical structure with one interior interface, and the
    centered interface flux w(b₀+b₁)/2 halves the restoring projection. The same
    discrete speed applies to any z-level model of this form (Oceananigans included);
    the continuous limit is recovered with vertical resolution.

    The front speed is measured DIFFERENTIALLY (ring-peak radius at two times) so
    the constant peak-shape lag and the initial-adjustment transient cancel. The
    test also asserts the measured speed rejects the isopycnal formula — pinning
    the factor, not just the order of magnitude.

    Setup: small planet (R_E/64) so a 2° grid gives ~3 km cells and the slow
    internal wave crosses many cells; everything poleward of 30°N / 60°S is land so
    the tripolar fold's (tiny, on this planet) cells stay masked.
    """
    from orthogonalsphericalshellgrids_tpu.models import (
        layered_initial_state, layered_step, make_layered_model)

    H2, hl, B0 = 1000.0, 500.0, 0.05
    R = 6371000.0 / 64.0
    grid = osg.TripolarGrid.make((180, 90, 2), dtype=jnp.float64, z=(-H2, 0.0),
                                 radius=R)

    def bottom(lam, phi):
        return np.where((phi > 30.0) | (phi < -60.0), 1.0, -H2 - 1.0)

    model = make_layered_model(grid, free_surface=SplitExplicitFreeSurface(substeps=30),
                               bottom_height=bottom, buoyancy=True)

    lam0, phi0 = 90.0, -40.0

    def bi(lam, phi, z):
        dist = _hav(lam, phi, lam0, phi0, R)
        xi = 50.0 * np.exp(-((dist / 8e3) ** 2))  # raised-interface bump
        return np.where(z > -hl, B0 * (1.0 - xi / hl), 0.0)

    state = layered_initial_state(model, b=bi)
    dt = 120.0
    sj = jax.jit(lambda s: layered_step(model, s, dt))

    lam_cc = np.asarray(grid.interior(grid.lam_cc))
    phi_cc = np.asarray(grid.interior(grid.phi_cc))
    i0 = int(np.argmin(np.abs(lam_cc[0] - lam0)))
    wet = np.asarray(model.mask_c3[0])[grid.interior2d][:, i0] > 0
    r_line = _hav(lam_cc[:, i0], phi_cc[:, i0], lam0, phi0, R)
    sel = (phi_cc[:, i0] > phi0) & wet & (r_line > 10e3) & (r_line < 100e3)

    def ring_peak(s):
        b0_layer = np.asarray(s.b)[0][grid.interior2d][:, i0]
        return r_line[sel][np.argmax((B0 - b0_layer)[sel])]

    for _ in range(60):
        state = sj(state)
    r1, T1 = ring_peak(state), 60 * dt
    for _ in range(60):
        state = sj(state)
    r2, T2 = ring_peak(state), 120 * dt

    assert np.isfinite(np.asarray(state.b)).all()
    c_meas = (r2 - r1) / (T2 - T1)
    c_disc = np.sqrt(B0 * hl / 4.0)                 # discrete two-level eigenvalue
    c_isopycnal = np.sqrt(B0 * hl * hl / H2)        # immiscible two-layer formula
    assert abs(c_meas - c_disc) < 0.15 * c_disc, (c_meas, c_disc)
    # the measurement is sharp enough to tell the two formulas apart (they differ
    # by a factor sqrt(2)): pin that we match the z-level eigenvalue, not the other
    assert abs(c_meas - c_disc) < abs(c_meas - c_isopycnal), (c_meas, c_disc,
                                                              c_isopycnal)
