"""Pins for the tracer-advection scheme family beyond WENO-5.

The reference's scheme slot is Oceananigans's advection menu (SURVEY.md O7:
``WENO(order=N)``, ``UpwindBiased``, ``Centered(order=N)``); tests mirror the WENO-5
pins in tests/test_parity.py: order of accuracy on exact cell averages, linear
exactness, upwind mirror symmetry, the ``tracer_faces`` dispatch, and the halo-radius
admissibility check at model build (the reference widens halos per scheme the same
way).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from orthogonalsphericalshellgrids_tpu.ops.advection import (
    SCHEME_RADIUS, TRACER_SCHEMES, centered4_faces_from_centers, tracer_faces,
    upwind3_faces_from_centers, weno5_upwind_faces_from_centers,
    weno7_upwind_faces_from_centers)


def _cell_averages_of_sin(n):
    """Exact cell averages of sin on [0, 2pi) and the face coordinates."""
    h = 2 * np.pi / n
    x_face = np.arange(n) * h
    cbar = (np.cos(x_face) - np.cos(x_face + h)) / h
    return jnp.asarray(cbar)[None, :], x_face


def _order(recon_fn, ns=(32, 64, 128)):
    """Observed convergence order of a faces-from-cell-averages reconstruction."""
    errs = []
    for n in ns:
        c, x_face = _cell_averages_of_sin(n)
        f = np.asarray(recon_fn(c))[0]
        errs.append(np.max(np.abs(f - np.sin(x_face))))
    return [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)], errs


@pytest.mark.parametrize("sign", [1.0, -1.0])
def test_weno7_order(sign):
    """WENO-7 reconstruction converges at 7th order on smooth cell averages, for
    both upwind directions (the negative branch exercises the mirror stencil)."""
    vel = jnp.full((1, 1), sign)
    orders, errs = _order(
        lambda c: weno7_upwind_faces_from_centers(c, vel, axis=-1))
    assert all(o > 6.5 for o in orders), (errs, orders)


@pytest.mark.parametrize("sign", [1.0, -1.0])
def test_upwind3_order(sign):
    orders, errs = _order(
        lambda c: upwind3_faces_from_centers(c, jnp.full((1, 1), sign), axis=-1))
    assert all(o > 2.7 for o in orders), (errs, orders)


def test_centered4_order():
    orders, errs = _order(lambda c: centered4_faces_from_centers(c, axis=-1))
    assert all(o > 3.7 for o in orders), (errs, orders)


@pytest.mark.parametrize("recon,radius", [
    (lambda c: weno7_upwind_faces_from_centers(c, jnp.ones((1, 1)), axis=-1), 4),
    (lambda c: upwind3_faces_from_centers(c, jnp.ones((1, 1)), axis=-1), 2),
    (lambda c: centered4_faces_from_centers(c, axis=-1), 2),
])
def test_linear_exact(recon, radius):
    """Linear data reconstructs the exact face value away from the wrap edges."""
    n = 32
    c = jnp.asarray(0.5 + 0.25 * np.arange(n))[None, :]
    f = np.asarray(recon(c))[0]
    exact = 0.5 + 0.25 * (np.arange(n) - 0.5)
    s = slice(radius + 1, -(radius + 1))
    np.testing.assert_allclose(f[s], exact[s], rtol=1e-12)


def test_upwind_mirror_symmetry():
    """Reversing the data and flipping the velocity mirrors the reconstruction:
    face k of (c, vel>0) equals face n-k of (c reversed, vel<0) — pins that the
    negative-flow stencils are the exact mirror images, per scheme."""
    rng = np.random.default_rng(7)
    n = 48
    c = jnp.asarray(rng.standard_normal(n))[None, :]
    c_rev = c[:, ::-1]
    for fn in (weno5_upwind_faces_from_centers, weno7_upwind_faces_from_centers,
               upwind3_faces_from_centers):
        pos = np.asarray(fn(c, jnp.ones((1, 1)), axis=-1))[0]
        neg = np.asarray(fn(c_rev, -jnp.ones((1, 1)), axis=-1))[0]
        # face k (between centers k-1 and k) maps to face n-k of the reversed data;
        # the shifts are periodic rolls, so equality holds at every face
        k = np.arange(n)
        np.testing.assert_allclose(pos, neg[(n - k) % n], rtol=1e-12, atol=1e-12)


def test_tracer_faces_dispatch():
    """Every TRACER_SCHEMES name routes to its reconstruction; unknown names raise."""
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.standard_normal((1, 32)))
    vel = jnp.asarray(rng.standard_normal((1, 32)))
    expect = {
        "weno5": weno5_upwind_faces_from_centers(c, vel, axis=-1),
        "weno7": weno7_upwind_faces_from_centers(c, vel, axis=-1),
        "upwind3": upwind3_faces_from_centers(c, vel, axis=-1),
        "centered4": centered4_faces_from_centers(c, axis=-1),
    }
    for name, want in expect.items():
        np.testing.assert_array_equal(
            np.asarray(tracer_faces(c, vel, axis=-1, scheme=name)), np.asarray(want))
    assert set(expect) | {"centered"} == set(TRACER_SCHEMES)
    with pytest.raises(ValueError, match="unknown tracer_advection"):
        tracer_faces(c, vel, axis=-1, scheme="weno9")


# ----------------------------------------------------------------------------------
# Model-build admissibility (halo radius per scheme; biharmonic halo)
# ----------------------------------------------------------------------------------

def _grid_and_fs(halo):
    import orthogonalsphericalshellgrids_tpu as osg
    from orthogonalsphericalshellgrids_tpu.models import SplitExplicitFreeSurface

    grid = osg.TripolarGrid.make((8, 10, 1), halo=(halo, halo, halo),
                                 first_pole_longitude=45.0,
                                 north_poles_latitude=35.0)
    return grid, SplitExplicitFreeSurface(substeps=4)


def _all_ocean(lam, phi):
    return np.full_like(np.asarray(lam), -2.0)


def test_make_model_rejects_scheme_on_narrow_halo():
    """weno7 (radius 4) must be rejected on a halo-3 grid; weno5 (radius 3) builds."""
    from orthogonalsphericalshellgrids_tpu.models import make_model

    grid, fs = _grid_and_fs(3)
    make_model(grid, free_surface=fs, bottom_height=_all_ocean,
               tracer_advection="weno5")
    with pytest.raises(ValueError, match="halo"):
        make_model(grid, free_surface=fs, bottom_height=_all_ocean,
                   tracer_advection="weno7")
    assert SCHEME_RADIUS["weno7"] == 4


def test_make_model_rejects_biharmonic_on_narrow_halo():
    """Biharmonic closures need 2 halo cells; a halo-1 centered-advection build must
    reject nu4_h/kappa4_h instead of silently reading stale halo rows."""
    from orthogonalsphericalshellgrids_tpu.models import make_model

    grid, fs = _grid_and_fs(1)
    make_model(grid, free_surface=fs, bottom_height=_all_ocean,
               tracer_advection="centered")  # radius 1: builds
    for kw in ({"nu4_h": 1.0e3}, {"kappa4_h": 1.0e3}):
        with pytest.raises(ValueError, match="biharmonic"):
            make_model(grid, free_surface=fs, bottom_height=_all_ocean,
                       tracer_advection="centered", **kw)


@pytest.mark.parametrize("scheme", ["weno7", "upwind3", "centered4"])
def test_new_schemes_step_stably(scheme):
    """A few Bickley-jet steps under each new scheme stay finite and in tracer range
    (regression net for the full model path, not just the reconstruction)."""
    import jax

    from examples.bickley_jet import build
    from orthogonalsphericalshellgrids_tpu.models import make_model, initial_state
    from orthogonalsphericalshellgrids_tpu.models.hydrostatic import multi_step
    from functools import partial

    model, state = build(nx=48, ny=24, substeps=8)
    import dataclasses

    model = dataclasses.replace(model, tracer_advection=scheme)
    out = jax.jit(partial(multi_step, n_steps=5))(model, state, 300.0)
    c = np.asarray(out.c[model.grid.interior2d])
    assert np.isfinite(np.asarray(out.u)).all()
    assert c.min() > -1.5 and c.max() < 1.5
