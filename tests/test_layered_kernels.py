"""End-to-end parity of the layered Pallas kernel path (interpret mode on CPU).

The layered TPU default routes momentum and tracer advection through the
VMEM-resident window kernels (models/layered.py:layered_tendencies,
ops/pallas_adv.py, ops/pallas_mom.py). The per-kernel unit tests
(tests/test_pallas_adv.py, tests/test_pallas_mom.py) pin each kernel against
re-derived expressions on random fields; these tests pin the PRODUCT path —
``make_layered_model(use_pallas=True)``'s pack construction
(``adv_pack``/``mom_lay``) plus the kernels, against the XLA formulation —
end-to-end at the tendency and full-step level (round-4 advisor finding: a
pack-layout mistake would otherwise surface only on the real chip).

Reference context: these kernels implement the hot tendency loops of
``/root/reference/examples/bickley_jet.jl:48-49`` (SURVEY.md §3.4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import orthogonalsphericalshellgrids_tpu as osg
from orthogonalsphericalshellgrids_tpu.models import (
    SplitExplicitFreeSurface, layered_initial_state, layered_step,
    make_layered_model,
)
from orthogonalsphericalshellgrids_tpu.models.layered import layered_tendencies
from orthogonalsphericalshellgrids_tpu.models.hydrostatic import _fill
from orthogonalsphericalshellgrids_tpu.models.layered import _fill3
from orthogonalsphericalshellgrids_tpu.ops.location import CC, CF, FC

LAM_P, PHI_P = 45.0, 25.0


def bottom(lam, phi):
    land = (
        ((np.abs(lam - LAM_P) < 10) & (np.abs(PHI_P - phi) < 10))
        | ((np.abs(lam - (LAM_P + 180.0)) < 10) & (np.abs(PHI_P - phi) < 10))
        | (phi < -78)
    )
    return np.where(land, 1.0, -1000.0)


def _models(nz=3, **kw):
    """(kernel-path model, XLA-path model) with the FULL closure set active so
    every fused-factor pack (Laplacians, quadratic drag, kappa_h planes) is
    exercised; identical physics, only use_pallas differs."""
    grid = osg.TripolarGrid.make((48, 32, nz), dtype=jnp.float64,
                                 z=(-1000.0, 0.0),
                                 first_pole_longitude=LAM_P,
                                 north_poles_latitude=PHI_P)
    cfg = dict(
        free_surface=SplitExplicitFreeSurface(substeps=6),
        bottom_height=bottom,
        tracers=("T", "S"),
        buoyancy="linear_eos",
        coriolis=True,
        wind_stress=lambda lam, phi: (1e-4 * np.cos(np.deg2rad(phi)),
                                      np.zeros_like(lam)),
        bottom_drag=("quadratic", 2.5e-3),
        nu_h=5e3,
        kappa_h=1e2,
        nu_v=1e-3,
        kappa_v=1e-5,
    )
    cfg.update(kw)
    mk = make_layered_model(grid, use_pallas=True, **cfg)
    mx = make_layered_model(grid, use_pallas=False, **cfg)
    assert mk.baro.use_pallas and not mx.baro.use_pallas
    state = layered_initial_state(
        mk,
        u=lambda lam, phi, z: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        v=lambda lam, phi, z: 0.05 * np.sin(np.deg2rad(lam) * 3),
        c={"T": lambda lam, phi, z: 4.0 + 16.0 * np.cos(np.deg2rad(phi)) ** 2
                * np.exp(z / 500.0),
           "S": lambda lam, phi, z: 34.0 + 1.5 * np.cos(np.deg2rad(phi)) ** 2
                * np.exp(z / 800.0)},
        eta=lambda lam, phi: 0.01 * np.cos(np.deg2rad(lam) * 2),
    )
    return mk, mx, state


def test_layered_tendencies_kernel_path_matches_xla():
    """layered_tendencies with the kernels forced on (interpret mode) must match
    the XLA formulation at the documented contraction band — this is the test
    that catches adv_pack/mom_lay pack-construction mistakes end-to-end."""
    mk, mx, state = _models()
    g = mk.grid
    u = _fill3(mk, state.u, FC, -1)
    v = _fill3(mk, state.v, CF, 1 * -1)
    c = _fill3(mk, state.c, CC, 1)
    b = state.b

    Gk = layered_tendencies(mk, u, v, c, b, t=0.0)
    Gx = layered_tendencies(mx, u, v, c, b, t=0.0)
    I3 = (slice(None),) + g.interior2d
    for name, a, w in zip(("Gu", "Gv", "Gc", "Gb"), Gk, Gx):
        a = np.asarray(a[I3])
        w = np.asarray(w[I3])
        np.testing.assert_allclose(a, w, rtol=1e-12,
                                   atol=1e-12 * max(np.abs(w).max(), 1.0),
                                   err_msg=name)


def test_layered_step_kernel_on_vs_off_band():
    """Three full layered steps, kernels on vs off, pinned at a tight band —
    the step-level guard the round-4 verdict asked for (prefactoring mistakes
    in the packs that random-field unit tests can't see)."""
    mk, mx, state = _models()
    sk = sx = state
    jk = jax.jit(lambda m, s: layered_step(m, s, 60.0))
    for _ in range(3):
        sk = jk(mk, sk)
        sx = jk(mx, sx)
    g = mk.grid
    I3 = (slice(None),) + g.interior2d
    for name in ("u", "v", "c"):
        a = np.asarray(getattr(sk, name)[I3])
        w = np.asarray(getattr(sx, name)[I3])
        np.testing.assert_allclose(a, w, rtol=1e-11,
                                   atol=1e-11 * max(np.abs(w).max(), 1.0),
                                   err_msg=name)
    ge = mk.baro.grid_ext
    np.testing.assert_allclose(np.asarray(ge.interior(sk.eta)),
                               np.asarray(ge.interior(sx.eta)),
                               rtol=1e-11, atol=1e-13)


def test_layered_step_kernel_band_tracer_b():
    """Kernels on vs off with the PROGNOSTIC-buoyancy mode (tracer_b): b rides
    as appended tracer planes through the vert and corrector kernels."""
    grid = osg.TripolarGrid.make((48, 32, 3), dtype=jnp.float64,
                                 z=(-1000.0, 0.0),
                                 first_pole_longitude=LAM_P,
                                 north_poles_latitude=PHI_P)
    cfg = dict(free_surface=SplitExplicitFreeSurface(substeps=6),
               bottom_height=bottom, buoyancy=True, coriolis=True,
               nu_h=5e3, kappa_h=1e2, nu_v=1e-3, kappa_v=1e-5,
               bottom_drag=("quadratic", 2.5e-3))
    mk = make_layered_model(grid, use_pallas=True, **cfg)
    mx = make_layered_model(grid, use_pallas=False, **cfg)
    state = layered_initial_state(
        mk,
        u=lambda lam, phi, z: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        c=lambda lam, phi, z: np.sin(np.deg2rad(phi) * 4),
        b=lambda lam, phi, z: 1e-5 * z + 1e-4 * np.sin(np.deg2rad(lam)),
    )
    sk = sx = state
    jk = jax.jit(lambda m, s: layered_step(m, s, 60.0))
    for _ in range(2):
        sk = jk(mk, sk)
        sx = jk(mx, sx)
    g = mk.grid
    I3 = (slice(None),) + g.interior2d
    for name in ("u", "v", "c", "b"):
        a = np.asarray(getattr(sk, name)[I3])
        w = np.asarray(getattr(sx, name)[I3])
        np.testing.assert_allclose(a, w, rtol=1e-11,
                                   atol=1e-11 * max(np.abs(w).max(), 1.0),
                                   err_msg=name)


def test_layered_step_corr_kernel_band():
    """The opt-in fused predictor/corrector pass (ops/pallas_corr.py — a
    measured NEGATIVE result kept in-tree, see layered.USE_CORR_KERNEL) must
    still be numerically correct end-to-end."""
    from orthogonalsphericalshellgrids_tpu.models import layered as L

    mk, _, state = _models()
    jk = jax.jit(lambda m, s: layered_step(m, s, 60.0))
    old = L.USE_CORR_KERNEL
    try:
        L.USE_CORR_KERNEL = False
        s_off = jk(mk, state)
        L.USE_CORR_KERNEL = True
        s_on = jax.jit(lambda m, s: layered_step(m, s, 60.0))(mk, state)
    finally:
        L.USE_CORR_KERNEL = old
    g = mk.grid
    I3 = (slice(None),) + g.interior2d
    for name in ("u", "v", "c"):
        a = np.asarray(getattr(s_on, name)[I3])
        w = np.asarray(getattr(s_off, name)[I3])
        np.testing.assert_allclose(a, w, rtol=1e-12,
                                   atol=1e-12 * max(np.abs(w).max(), 1.0),
                                   err_msg=name)


@pytest.mark.parametrize("mesh_shape", ["1d", "2d"])
def test_sharded_layered_kernel_path_matches_serial(mesh_shape):
    """layered_step with the Pallas kernels FORCED ON under shard_map (1-D and
    2-D meshes, interpret mode): the kernels then run inside the overlap split on
    _model_rows/_model_cols strip views — a combination that previously had zero
    coverage on any backend (round-4 advisor finding). Must reproduce the serial
    kernel-path step."""
    mk, _, state = _models()
    if mesh_shape == "1d":
        from orthogonalsphericalshellgrids_tpu.parallel import (
            distribute_layered, gather_layered_state, make_mesh,
            sharded_layered_step_fn,
        )

        n = 4
        mesh = make_mesh(n)
        dist_model, dist_state = distribute_layered(mk, state, mesh)
        fn = sharded_layered_step_fn(mesh, dist_model)
        gather = lambda ds: gather_layered_state(ds, mk, n)
    else:
        from orthogonalsphericalshellgrids_tpu.parallel import (
            distribute_layered2d, gather_layered_state2d, make_mesh2d,
            sharded_layered_step_fn2d,
        )

        mesh = make_mesh2d(2, 4)
        dist_model, dist_state = distribute_layered2d(mk, state, mesh)
        fn = sharded_layered_step_fn2d(mesh, dist_model, mk.grid.Nx)
        gather = lambda ds: gather_layered_state2d(ds, mk, mesh)
    assert dist_model.baro.use_pallas  # the path under test

    ss, ds = state, dist_state
    sj = jax.jit(lambda m, s: layered_step(m, s, 60.0))
    for _ in range(2):
        ss = sj(mk, ss)
        ds = fn(ds, 60.0)
    got = gather(ds)
    g = mk.grid
    I3 = (slice(None),) + g.interior2d
    for name in ("u", "v", "c"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)[I3]), np.asarray(getattr(ss, name)[I3]),
            rtol=0, atol=1e-13, err_msg=name)
    ge = mk.baro.grid_ext
    np.testing.assert_allclose(np.asarray(ge.interior(got.eta)),
                               np.asarray(ge.interior(ss.eta)), rtol=0, atol=1e-13)


def test_layered_tendencies_acc_fold_parity():
    """The opt-in acc/mask fold (models/layered.py:ACC_FOLD — measured
    NEGATIVE result on v5e, benchmarks/ab_acc_fold.py) must stay numerically
    equivalent to the default path: vert contributions accumulated inside the
    mom/adv kernel windows + the in-window closing mask multiply vs the XLA
    adds/mask. Same float order by construction => tight band."""
    from orthogonalsphericalshellgrids_tpu.models import layered as L

    mk, _, state = _models()
    u = _fill3(mk, state.u, FC, -1)
    v = _fill3(mk, state.v, CF, -1)
    c = _fill3(mk, state.c, CC, 1)
    b = state.b

    old = L.ACC_FOLD
    try:
        L.ACC_FOLD = False
        G0 = layered_tendencies(mk, u, v, c, b, t=0.0)
        L.ACC_FOLD = True
        G1 = layered_tendencies(mk, u, v, c, b, t=0.0)
    finally:
        L.ACC_FOLD = old
    I3 = (slice(None),) + mk.grid.interior2d
    for name, a, w in zip(("Gu", "Gv", "Gc", "Gb"), G1, G0):
        a = np.asarray(a[I3])
        w = np.asarray(w[I3])
        np.testing.assert_allclose(a, w, rtol=1e-12,
                                   atol=1e-12 * max(np.abs(w).max(), 1.0),
                                   err_msg=name)
