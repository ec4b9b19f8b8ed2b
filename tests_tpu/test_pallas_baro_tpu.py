"""Compiled (interpret=False) Mosaic parity for the time-tiled barotropic
subcycle kernel (ops/pallas_baro.py) — every TPU step routes through it
(models/hydrostatic.py:barotropic_substeps). The CPU suite pins it only in
interpret mode; this lane runs the real lowering, including the 58 MB-class
SINGLE-WINDOW variant the auto chooser selects at production geometry
(round-4 verdict item 1).

Reference context: the widened-halo substep loop pinned by
/root/reference/test/runtests.jl:58-71 (SURVEY.md O6).
"""

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
from orthogonalsphericalshellgrids_tpu.ops.pallas_baro import (
    _geometry, barotropic_substeps_pallas)


def _setup(shape=(64, 96), substeps=8):
    nx, ny = shape
    grid = osg.TripolarGrid.make((nx, ny, 1), dtype=jnp.float32,
                                 first_pole_longitude=45.0,
                                 north_poles_latitude=35.0)

    def bottom(lam, phi):
        return np.where(phi < -78, 1.0, 0.0)

    model = make_model(grid, free_surface=SplitExplicitFreeSurface(substeps=substeps),
                       bottom_height=bottom, use_pallas=False)
    state = initial_state(
        model,
        u=lambda lam, phi: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        v=lambda lam, phi: 0.1 * np.sin(np.deg2rad(lam) * 3),
        eta=lambda lam, phi: 0.01 * np.cos(np.deg2rad(lam) * 2)
            * np.cos(np.deg2rad(phi) * 3),
    )
    ge = model.grid_ext
    eta = H._fill(ge, state.eta, CC, 1)
    U = H._fill(ge, state.U, FC, -1)
    V = H._fill(ge, state.V, CF, -1)
    GU = H._fill(ge, H.embed_ext(model.grid, ge,
                                 model.ib.h_u * jnp.ones_like(state.u) * 1e-6),
                 FC, -1)
    GV = H._fill(ge, H.embed_ext(model.grid, ge,
                                 model.ib.h_v * jnp.ones_like(state.v) * -2e-6),
                 CF, -1)
    return model, ge, (eta, U, V, GU, GV)


@pytest.mark.parametrize("block_rows,label", [(None, "single-window"),
                                              (16, "multi-window")])
def test_barotropic_compiled_matches_interpret(block_rows, label):
    """Compiled Mosaic kernel vs the interpret-mode run of the SAME kernel.
    block_rows=None lets auto_block_rows pick — at this geometry that is the
    single-window kernel (zero overlap redundancy, the production default);
    block_rows=16 forces the multi-program dynamic-slice path."""
    model, ge, (eta, U, V, GU, GV) = _setup()
    dtau = model.fractional_dt * 120.0
    if block_rows is None:
        # the geometry the model resolved at build (auto_block_rows) really is
        # the single-window kernel here — zero overlap redundancy
        Ye = int(eta.shape[0])
        _, _, n_prog, _ = _geometry(Ye, int(model.weights.shape[0]),
                                    model.block_rows)
        assert n_prog == 1, (label, model.block_rows, n_prog)
        block_rows = model.block_rows

    arrays = (model.baro_pack, eta, U, V, GU, GV)
    # Nx/Hx (and block geometry) are STATIC kernel parameters — close over
    # them; only the array operands go through jit.
    want = barotropic_substeps_pallas(*arrays, dtau, model.weights,
                                      ge.Nx, ge.Hx, block_rows=block_rows,
                                      interpret=True)
    got = jax.jit(lambda *a: barotropic_substeps_pallas(
        *a, dtau, model.weights, ge.Nx, ge.Hx,
        block_rows=block_rows))(*arrays)
    for name, a, b in zip(["eta", "U", "V"], want, got):
        ai = np.asarray(ge.interior(a))
        bi = np.asarray(ge.interior(b))
        np.testing.assert_allclose(ai, bi, rtol=2e-6,
                                   atol=2e-6 * max(np.abs(ai).max(), 1e-30),
                                   err_msg=f"{label}:{name}")


def test_layered_step_kernels_on_vs_off_compiled():
    """One compiled layered step, Pallas kernels on vs off, on the REAL chip —
    the step-level pin of round-4 verdict item 1 (catches pack-layout and
    lowering mistakes the random-field kernel tests cannot)."""
    from orthogonalsphericalshellgrids_tpu.models import (
        layered_initial_state, layered_step, make_layered_model,
    )

    grid = osg.TripolarGrid.make((64, 48, 3), dtype=jnp.float32,
                                 first_pole_longitude=45.0,
                                 north_poles_latitude=35.0)

    def bottom(lam, phi):
        land = (((np.abs(lam - 45.0) < 10) & (np.abs(35.0 - phi) < 10))
                | ((np.abs(lam - 225.0) < 10) & (np.abs(35.0 - phi) < 10))
                | (phi < -78))
        return np.where(land, 1.0, -1000.0)

    cfg = dict(
        free_surface=SplitExplicitFreeSurface(substeps=8),
        bottom_height=bottom, tracers=("T", "S"), buoyancy="linear_eos",
        coriolis=True, bottom_drag=("quadratic", 2.5e-3),
        nu_h=5e3, kappa_h=1e2, nu_v=1e-3, kappa_v=1e-5,
    )
    mk = make_layered_model(grid, use_pallas=True, **cfg)
    mx = make_layered_model(grid, use_pallas=False, **cfg)
    state = layered_initial_state(
        mk,
        u=lambda lam, phi, z: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        c={"T": lambda lam, phi, z: 4.0 + 16.0 * np.cos(np.deg2rad(phi)) ** 2
               * np.exp(z / 500.0),
           "S": lambda lam, phi, z: 34.0 + 1.5 * np.cos(np.deg2rad(phi)) ** 2
               * np.exp(z / 800.0)},
        eta=lambda lam, phi: 0.01 * np.cos(np.deg2rad(lam) * 2),
    )
    sj = jax.jit(lambda m, s: layered_step(m, s, 60.0))
    sk = sj(mk, state)
    sx = sj(mx, state)
    g = mk.grid
    I3 = (slice(None),) + g.interior2d
    for name in ("u", "v", "c"):
        a = np.asarray(getattr(sk, name)[I3])
        w = np.asarray(getattr(sx, name)[I3])
        np.testing.assert_allclose(a, w, rtol=1e-4,
                                   atol=1e-5 * max(np.abs(w).max(), 1e-30),
                                   err_msg=name)
