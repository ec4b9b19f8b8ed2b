"""Pallas-kernel parity tests (interpret mode on CPU): the time-tiled barotropic
kernel must reproduce the XLA scan implementation on the valid interior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import orthogonalsphericalshellgrids_tpu as osg
from orthogonalsphericalshellgrids_tpu.models import (
    SplitExplicitFreeSurface, initial_state, make_model,
)
from orthogonalsphericalshellgrids_tpu.models import hydrostatic as H
from orthogonalsphericalshellgrids_tpu.ops.location import CC, CF, FC
from orthogonalsphericalshellgrids_tpu.ops.pallas_baro import barotropic_substeps_pallas


@pytest.mark.parametrize("shape,substeps", [((48, 40), 12), ((64, 96), 6)])
def test_barotropic_pallas_matches_xla(shape, substeps):
    nx, ny = shape
    grid = osg.TripolarGrid.make((nx, ny, 1), dtype=jnp.float32,
                                 first_pole_longitude=45.0, north_poles_latitude=35.0)

    def bottom(lam, phi):
        return np.where(phi < -78, 1.0, 0.0)

    model = make_model(grid, free_surface=SplitExplicitFreeSurface(substeps=substeps),
                       bottom_height=bottom, use_pallas=False)
    state = initial_state(
        model,
        u=lambda lam, phi: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        v=lambda lam, phi: 0.1 * np.sin(np.deg2rad(lam) * 3),
        eta=lambda lam, phi: 0.01 * np.cos(np.deg2rad(lam) * 2) * np.cos(np.deg2rad(phi) * 3),
    )

    ge = model.grid_ext
    eta = H._fill(ge, state.eta, CC, 1)
    U = H._fill(ge, state.U, FC, -1)
    V = H._fill(ge, state.V, CF, -1)
    GU = H._fill(ge, H.embed_ext(model.grid, ge, model.ib.h_u * jnp.ones_like(state.u) * 1e-6), FC, -1)
    GV = H._fill(ge, H.embed_ext(model.grid, ge, model.ib.h_v * jnp.ones_like(state.v) * -2e-6), CF, -1)
    dt = 120.0

    ref = H.barotropic_substeps(model, eta, U, V, GU, GV, dt)

    dtau = model.fractional_dt * dt
    out = barotropic_substeps_pallas(
        model.baro_pack, eta, U, V, GU, GV, dtau, model.weights,
        ge.Nx, ge.Hx, interpret=True,
    )

    for name, a, b in zip(["eta", "U", "V"], ref, out):
        ai = np.asarray(ge.interior(a))
        bi = np.asarray(ge.interior(b))
        np.testing.assert_allclose(ai, bi, rtol=2e-6, atol=1e-10, err_msg=name)


@pytest.mark.parametrize("upwind", [True, False])
def test_tendencies_pallas_matches_xla(upwind):
    """The fused tendency kernel must match the XLA tendencies + AB2 + forcing path on
    the interior (interpret mode)."""
    grid = osg.TripolarGrid.make((64, 48, 1), dtype=jnp.float32,
                                 first_pole_longitude=45.0, north_poles_latitude=35.0)

    def bottom(lam, phi):
        return np.where((phi < -78) | ((np.abs(lam - 45) < 8) & (np.abs(phi - 35) < 8)), 1.0, 0.0)

    madv = "weno_vector_invariant" if upwind else "vector_invariant"
    model = make_model(grid, free_surface=SplitExplicitFreeSurface(substeps=8),
                       bottom_height=bottom, use_pallas=False, momentum_advection=madv)
    state = initial_state(
        model,
        u=lambda lam, phi: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        v=lambda lam, phi: 0.2 * np.sin(np.deg2rad(lam) * 2),
        c=lambda lam, phi: np.sin(np.deg2rad(phi) * 6),
    )
    g = model.grid
    from orthogonalsphericalshellgrids_tpu.ops import zipper
    SB = zipper.fill_halos_batch(
        jnp.stack([state.u, state.v, state.c]), [FC, CF, CC], [-1, -1, 1],
        g.Nx, g.Ny, g.Hx, g.Hy, xp=jnp)
    u, v, c = SB[0], SB[1], SB[2]

    Gu, Gv, Gc = H.tendencies(model, u, v, c)
    w1, w2, dt = 1.6, 0.6, 90.0
    Gu_s = w1 * Gu - w2 * state.Gu
    Gv_s = w1 * Gv - w2 * state.Gv
    Gc_s = w1 * Gc - w2 * state.Gc
    ref = dict(
        Gu=Gu, Gv=Gv, Gc=Gc,
        GUb=model.ib.h_u * Gu_s, GVb=model.ib.h_v * Gv_s,
        c_new=(state.c + dt * Gc_s) * model.ib.mask_c,
    )

    from orthogonalsphericalshellgrids_tpu.ops.pallas_tend import tendencies_pallas
    dpack = jnp.concatenate([SB, jnp.stack([state.Gu, state.Gv, state.Gc])], axis=0)
    out = tendencies_pallas(model.tend_pack, dpack, w1, w2, dt,
                            coriolis=False, upwind_q=upwind, tracer_weno=True,
                            interpret=True)
    for name, o in zip(["Gu", "Gv", "Gc", "GUb", "GVb", "c_new"], out):
        a = np.asarray(g.interior(ref[name]))
        b = np.asarray(g.interior(o))
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5, err_msg=name)
