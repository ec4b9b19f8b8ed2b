"""Compiled (interpret=False) Mosaic parity for the aliased Pallas halo fill.

The CPU suite pins fill_halos_pallas only in interpret mode; this lane runs the
REAL Mosaic lowering (alignment hints, input_output_aliases) on the chip, since
the fill is the default serial layered-TPU path (models/layered.py) — a lowering
regression there would otherwise ship untested (round-3 advisor finding).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orthogonalsphericalshellgrids_tpu.ops import zipper
from orthogonalsphericalshellgrids_tpu.ops.location import CC, CF, FC
from orthogonalsphericalshellgrids_tpu.ops.pallas_fill import (
    fill_halos_pallas, restore_strips_pallas)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape),
                       jnp.float32)


@pytest.mark.parametrize("geom", [(52, 30, 5, 5), (260, 21, 4, 4)])
@pytest.mark.parametrize("loc,sign", [(CC, 1), (FC, -1), (CF, -1)])
def test_fill_compiled_matches_xla(geom, loc, sign):
    Nx, Ny, Hx, Hy = geom
    A = _rand((3, Ny + 2 * Hy, Nx + 2 * Hx), seed=Nx)
    want = np.array(zipper.fill_halos(A, loc, sign, Nx, Ny, Hx, Hy, xp=jnp))
    got = np.array(jax.jit(lambda a: fill_halos_pallas(
        a, loc, sign, Nx, Ny, Hx, Hy))(A))
    assert np.array_equal(want, got)


def test_save_restore_compiled_round_trip():
    Nx, Ny, Hx, Hy = 52, 30, 5, 5
    A = _rand((2, Ny + 2 * Hy, Nx + 2 * Hx), seed=7)

    @jax.jit
    def rt(a):
        filled, saved = fill_halos_pallas(a, FC, -1, Nx, Ny, Hx, Hy, save=True)
        return restore_strips_pallas(filled, saved, FC, Nx, Ny, Hx, Hy)

    assert np.array_equal(np.array(rt(A)), np.array(A))


def test_layered_step_runs_compiled():
    """One compiled layered step through the default (pallas-fill) serial path."""
    import orthogonalsphericalshellgrids_tpu as osg
    from orthogonalsphericalshellgrids_tpu.models import SplitExplicitFreeSurface
    from orthogonalsphericalshellgrids_tpu.models.layered import (
        layered_initial_state, layered_step, make_layered_model)

    grid = osg.TripolarGrid.make((48, 40, 3), dtype=jnp.float32,
                                 first_pole_longitude=45.0,
                                 north_poles_latitude=35.0)
    model = make_layered_model(
        grid, free_surface=SplitExplicitFreeSurface(substeps=8))
    assert model.baro.use_pallas  # TPU default routes through the aliased fill
    state = layered_initial_state(
        model, eta=lambda lam, phi: 0.01 * np.cos(np.deg2rad(lam) * 2))
    s = jax.jit(lambda m, s: layered_step(m, s, 60.0))(model, state)
    assert bool(jnp.all(jnp.isfinite(s.u)))
    assert bool(jnp.all(jnp.isfinite(s.eta)))


def test_single_layer_step_runs_compiled():
    """One compiled single-layer step through the default (pallas-fill) path."""
    import orthogonalsphericalshellgrids_tpu as osg
    from orthogonalsphericalshellgrids_tpu.models import (
        SplitExplicitFreeSurface, initial_state, make_model, step)

    grid = osg.TripolarGrid.make((48, 40, 1), dtype=jnp.float32,
                                 first_pole_longitude=45.0,
                                 north_poles_latitude=35.0)
    model = make_model(grid, free_surface=SplitExplicitFreeSurface(substeps=8))
    assert model.use_pallas
    state = initial_state(
        model, eta=lambda lam, phi: 0.01 * np.cos(np.deg2rad(lam) * 2))
    s = jax.jit(lambda m, s: step(m, s, 60.0))(model, state)
    assert bool(jnp.all(jnp.isfinite(s.u)))
    assert bool(jnp.all(jnp.isfinite(s.eta)))


def test_tracer_adv_kernel_compiled():
    """Compiled Mosaic lowering of the tracer-advection kernel vs the XLA
    slice (same association) — the default layered TPU path routes through it."""
    from orthogonalsphericalshellgrids_tpu.ops.advection import (
        weno5_upwind_faces_from_centers)
    from orthogonalsphericalshellgrids_tpu.ops.operators import dxc, dyc
    from orthogonalsphericalshellgrids_tpu.ops.pallas_adv import tracer_adv_pallas

    rng = np.random.default_rng(0)
    P, nz, Yb, Xb = 4, 2, 120, 140
    c = jnp.asarray(rng.standard_normal((P, Yb, Xb)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), jnp.float32)
    au = jnp.asarray(1.0 + rng.random((nz, Yb, Xb)), jnp.float32)
    av = jnp.asarray(1.0 + rng.random((nz, Yb, Xb)), jnp.float32)
    iv = jnp.asarray(rng.random((nz, Yb, Xb)), jnp.float32)

    c4 = c.reshape(P // nz, nz, Yb, Xb)
    cx = weno5_upwind_faces_from_centers(c4, u, axis=-1)
    cy = weno5_upwind_faces_from_centers(c4, v, axis=-2)
    want = np.asarray((-(dxc(u * au * cx) + dyc(v * av * cy)) * iv)
                      .reshape(c.shape))
    got = np.asarray(jax.jit(lambda *a: tracer_adv_pallas(*a, block_rows=48))(
        c, u, v, au, av, iv))
    I = (slice(None), slice(4, Yb - 4), slice(4, Xb - 4))
    np.testing.assert_allclose(want[I], got[I], rtol=2e-6,
                               atol=2e-6 * np.abs(want[I]).max())


def test_momentum_kernel_compiled():
    """Compiled Mosaic lowering of the momentum kernel (adv + fused lap/drag)."""
    from orthogonalsphericalshellgrids_tpu.ops.pallas_mom import momentum_pallas

    rng = np.random.default_rng(3)
    nz, Yb, Xb = 2, 120, 140
    u = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), jnp.float32)
    M = jnp.asarray(1.0 + rng.random((8, Yb, Xb)), jnp.float32)
    lay = jnp.asarray(rng.random((nz, 8, Yb, Xb)), jnp.float32)

    wu, wv = momentum_pallas(u, v, M, lay, has_lap=True, has_drag=True,
                             interpret=True, block_rows=48)
    gu, gv = jax.jit(lambda *a: momentum_pallas(
        *a, has_lap=True, has_drag=True, block_rows=48))(u, v, M, lay)
    I = (slice(None), slice(5, Yb - 5), slice(5, Xb - 5))
    for want, got in ((wu, gu), (wv, gv)):
        w = np.asarray(want)[I]
        np.testing.assert_allclose(w, np.asarray(got)[I], rtol=2e-6,
                                   atol=2e-6 * np.abs(w).max())
