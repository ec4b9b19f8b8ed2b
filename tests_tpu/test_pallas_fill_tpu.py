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


# The compiled adv/mom window-kernel lanes live in tests_tpu/test_pallas_adv_tpu.py
# and tests_tpu/test_pallas_mom_tpu.py; the compiled barotropic lane (incl. the
# single-window production variant and the layered kernels-on-vs-off step pin)
# in tests_tpu/test_pallas_baro_tpu.py.
