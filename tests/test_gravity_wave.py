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
