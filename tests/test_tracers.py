"""Multi-tracer support (the reference's ``tracers=(:T, :S, ...)`` model kwarg,
``examples/bickley_jet.jl:51-55`` uses a single ``:c``; Oceananigans accepts any
tuple). ``State.c`` becomes an (n_tracers, Ye, Xe) plane stack; every tracer plane
must evolve exactly as it would alone (tracer planes are passive and independent),
including through the batched fills, the overlap-split tendency path, and the
distributed step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import orthogonalsphericalshellgrids_tpu as osg
from orthogonalsphericalshellgrids_tpu.models import (
    SplitExplicitFreeSurface, initial_state, make_model, step,
)
from orthogonalsphericalshellgrids_tpu.models.diagnostics import tracer_content


def _setup(tracers=("c",), ny=32, substeps=6):
    grid = osg.TripolarGrid.make((32, ny, 1), dtype=jnp.float64,
                                 first_pole_longitude=45.0, north_poles_latitude=35.0)

    def bottom(lam, phi):
        land = (
            ((np.abs(lam - 45.0) < 12) & (np.abs(35.0 - phi) < 12))
            | ((np.abs(lam - 225.0) < 12) & (np.abs(35.0 - phi) < 12))
            | (phi < -78)
        )
        return np.where(land, 1.0, 0.0)

    return make_model(grid, free_surface=SplitExplicitFreeSurface(substeps=substeps),
                      bottom_height=bottom, tracers=tracers)


def ui(lam, phi):
    return 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2


def vi(lam, phi):
    return 0.05 * np.sin(np.deg2rad(lam) * 3) * np.cos(np.deg2rad(phi) * 2)


def c1(lam, phi):
    return np.sin(2 * np.pi * np.deg2rad(phi) * 8 / 167.0)


def c2(lam, phi):
    return np.cos(np.deg2rad(lam) * 2) * np.exp(-((np.deg2rad(phi) * 3) ** 2))


def _run(model, state, n_steps=4, dt=120.0, **kw):
    sj = jax.jit(lambda m, s: step(m, s, dt, **kw))
    for _ in range(n_steps):
        state = sj(model, state)
    return state


@pytest.mark.parametrize("fill_mode", ["per", "batch"])
def test_multi_tracer_matches_single(fill_mode):
    """Each plane of a two-tracer run must match the corresponding single-tracer run
    (tracers are passive: the flow is identical, the planes independent). The flow is
    bitwise; tracer planes are allclose-at-round-off — XLA picks different FMA
    contractions for (n, Y, X) stacks than for single (Y, X) planes."""
    m2 = _setup(tracers=("T", "S"))
    s2 = _run(m2, initial_state(m2, u=ui, v=vi, c={"T": c1, "S": c2}),
              fill_mode=fill_mode)

    for k, ci in enumerate([c1, c2]):
        m1 = _setup()
        s1 = _run(m1, initial_state(m1, u=ui, v=vi, c=ci), fill_mode=fill_mode)
        np.testing.assert_allclose(np.asarray(s2.c[k]), np.asarray(s1.c),
                                   rtol=1e-12, atol=1e-18,
                                   err_msg=f"tracer plane {k}")
        np.testing.assert_array_equal(np.asarray(s2.u), np.asarray(s1.u))
        np.testing.assert_array_equal(np.asarray(s2.eta), np.asarray(s1.eta))


def test_initializer_forms_and_validation():
    m = _setup(tracers=("T", "S"))
    # sequence form, with one None (starts at zero)
    s = initial_state(m, u=ui, c=[c1, None])
    assert s.c.shape[0] == 2
    assert np.all(np.asarray(s.c[1]) == 0.0)
    # dict form with a missing name starts that tracer at zero
    s = initial_state(m, u=ui, c={"S": c2})
    assert np.all(np.asarray(s.c[0]) == 0.0)
    assert np.any(np.asarray(s.c[1]) != 0.0)
    with pytest.raises(ValueError, match="unknown tracer"):
        initial_state(m, c={"X": c1})
    with pytest.raises(ValueError, match="initializers"):
        initial_state(m, c=[c1])
    with pytest.raises(ValueError, match="unique"):
        _setup(tracers=("T", "T"))
    with pytest.raises(ValueError, match="non-empty"):
        _setup(tracers=())


def test_per_tracer_content_conserved():
    """tracer_content returns the per-tracer vector; flux-form advection conserves
    each plane's content across the fold independently."""
    m = _setup(tracers=("T", "S"))
    s0 = initial_state(m, u=ui, v=vi, c=[c1, c2])
    q0 = np.asarray(tracer_content(m, s0))
    assert q0.shape == (2,)
    s = _run(m, s0, n_steps=6)
    q1 = np.asarray(tracer_content(m, s))
    # drift measured against the content NORM Σ|c|·Az·H — the signed content of an
    # oscillatory tracer is a near-zero residual of cancelling O(norm) terms, so the
    # round-off floor scales with the norm, not the signed sum
    g = m.grid
    vol = np.asarray(g.interior(g.az_cc * m.ib.h_c))
    norm = np.abs(np.asarray(g.interior(s0.c))).reshape(2, -1) @ vol.ravel()
    assert np.all(np.abs(q1 - q0) <= 1e-12 * norm), (q0, q1, norm)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_multi_tracer_sharded_bitwise():
    """Two-tracer distributed step (batched ppermute fills + overlap-split tendencies
    with the (2+n)-plane stack) must match serial bitwise."""
    from orthogonalsphericalshellgrids_tpu.parallel import (
        distribute, gather_state, make_mesh, sharded_step_fn,
    )

    model = _setup(tracers=("T", "S"))
    state = initial_state(model, u=ui, v=vi, c=[c1, c2])

    mesh = make_mesh(4)
    dist_model, dist_state = distribute(model, state, mesh)
    fn = sharded_step_fn(mesh, dist_model)
    sj = jax.jit(step)

    s_serial, s_dist = state, dist_state
    for _ in range(4):
        s_serial = sj(model, s_serial, 120.0)
        s_dist = fn(s_dist, 120.0)

    gathered = gather_state(s_dist, model, 4)
    g, ge = model.grid, model.grid_ext
    for name, grid_of in [("u", g), ("v", g), ("eta", ge)]:
        a = np.asarray(grid_of.interior(getattr(s_serial, name)))
        b = np.asarray(grid_of.interior(getattr(gathered, name)))
        np.testing.assert_array_equal(a, b, err_msg=name)
    # the tracer stack fuses differently serial (4-plane WENO) vs sharded (strip
    # recompute) — equal to 1 ULP, not bitwise
    np.testing.assert_allclose(np.asarray(g.interior(s_serial.c)),
                               np.asarray(g.interior(gathered.c)),
                               rtol=3e-16, atol=1e-24, err_msg="c")
