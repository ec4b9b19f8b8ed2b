"""Numerical-parity gate (docs/parity.md; BASELINE.md correctness clause).

The Julia/Oceananigans stack is not executable in this environment (no Julia, no
installs), so the gate is pinned by the strongest machine-checkable substitutes:

- scheme property pins: WENO-5 order of accuracy / linear exactness / ε
  insensitivity, SM05 averaging-weight values;
- a committed trajectory oracle (tests/data/bickley_oracle_180x90.npz — the
  reference-resolution Bickley jet, fixed dt, f64): a re-run must reproduce the
  stored prognostics and invariant curves, making any dynamics change a deliberate
  artifact diff;
- a convergence study: the full dynamics must converge toward the continuum
  solution at ~2nd order (the C-grid metric/interpolation order) on nested grids.

Regenerate artifacts with ``python benchmarks/gen_parity_oracle.py``.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

DATA = os.path.join(os.path.dirname(__file__), "data")


def bickley(nx, ny, substeps=30):
    from examples.bickley_jet import build

    return build(nx=nx, ny=ny, dtype=jnp.float64, substeps=substeps)


def run_n(model, state, dt, n):
    from functools import partial

    from orthogonalsphericalshellgrids_tpu.models.hydrostatic import multi_step

    return jax.jit(partial(multi_step, n_steps=n))(model, state, dt)


# ----------------------------------------------------------------------------------
# Scheme pins
# ----------------------------------------------------------------------------------

def test_sm05_weights():
    """SM05 power-law averaging (p=2, q=4, r=0.18927 — the Oceananigans defaults):
    pin dtau, truncated length, and end values for the reference's substeps=30 and
    the test suite's substeps=12."""
    from orthogonalsphericalshellgrids_tpu.models.split_explicit import averaging_weights

    dtau, w = averaging_weights(30)
    assert dtau == pytest.approx(2.0 / 30.0)
    assert len(w) == 21                       # truncated at the last positive weight
    assert w.sum() == pytest.approx(1.0, abs=1e-12)
    np.testing.assert_allclose(w[:4], 0.0, atol=0)  # SM05 ramps from zero
    assert w[4] == pytest.approx(0.0027197915, rel=1e-6)
    assert w[-1] == pytest.approx(0.0295101616, rel=1e-6)

    dtau12, w12 = averaging_weights(12)
    assert dtau12 == pytest.approx(1.0 / 6.0)
    assert len(w12) == 8
    assert w12[-2] == pytest.approx(0.2555154172, rel=1e-6)


def test_weno5_order():
    """WENO-5 reconstruction converges at 5th order on smooth periodic data.

    The reconstruction maps CELL AVERAGES to the face point value (feeding point
    values instead caps it at the O(h²) point-vs-average mismatch), so feed the
    exact averages of sin over each cell."""
    from orthogonalsphericalshellgrids_tpu.ops.advection import weno5_faces_from_centers

    errs = []
    for n in (32, 64, 128):
        h = 2 * np.pi / n
        x_face = np.arange(n) * h
        cbar = (np.cos(x_face) - np.cos(x_face + h)) / h   # avg of sin over cell j
        c = jnp.asarray(cbar)[None, :]                     # (1, n): axis=-1 path
        left, _ = weno5_faces_from_centers(c, axis=-1)
        exact = np.sin(x_face)
        errs.append(np.max(np.abs(np.asarray(left)[0] - exact)))
    o1 = np.log2(errs[0] / errs[1])
    o2 = np.log2(errs[1] / errs[2])
    assert o1 > 4.5 and o2 > 4.5, (errs, o1, o2)


def test_weno5_linear_exact():
    """Linear data reconstructs exactly (optimal weights recovered, candidate
    stencils agree) — away from the wrap-around edge cells."""
    from orthogonalsphericalshellgrids_tpu.ops.advection import weno5_faces_from_centers

    n = 32
    c = jnp.asarray(0.5 + 0.25 * np.arange(n))[None, :]
    left, right = weno5_faces_from_centers(c, axis=-1)
    exact = 0.5 + 0.25 * (np.arange(n) - 0.5)
    np.testing.assert_allclose(np.asarray(left)[0, 4:-4], exact[4:-4], rtol=1e-13)
    np.testing.assert_allclose(np.asarray(right)[0, 4:-4], exact[4:-4], rtol=1e-13)


def test_weno5_no_overshoot():
    """ENO property: reconstructing a step stays within the data range."""
    from orthogonalsphericalshellgrids_tpu.ops.advection import weno5_faces_from_centers

    c = jnp.asarray(np.where(np.arange(64) < 32, 1.0, 0.0))[None, :]
    left, right = weno5_faces_from_centers(c, axis=-1)
    for r in (left, right):
        a = np.asarray(r)[0, 8:-8]
        assert a.min() > -1e-10 and a.max() < 1.0 + 1e-10


def test_weno5_eps_insensitive():
    """The ε regularizer choice (1e-8 here; implementations vary 1e-6…1e-40) is
    immaterial for the resolved dynamics: the Bickley-jet solution moves by < 1e-6
    relative when ε spans 8 orders of magnitude (docs/parity.md deviation #11)."""
    from orthogonalsphericalshellgrids_tpu.ops import advection

    results = {}
    eps0 = advection._EPS
    try:
        for eps in (1e-6, 1e-14):
            advection._EPS = eps
            model, state = bickley(96, 49, substeps=12)
            out = run_n(model, state, 240.0, 15)
            results[eps] = np.asarray(out.c[model.grid.interior2d])
    finally:
        advection._EPS = eps0
    scale = np.abs(results[1e-6]).max()
    diff = np.abs(results[1e-6] - results[1e-14]).max()
    assert diff < 1e-6 * scale, (diff, scale)


# ----------------------------------------------------------------------------------
# Trajectory oracle
# ----------------------------------------------------------------------------------

def test_oracle_regression():
    """Re-run the first 20 steps of the committed reference-resolution trajectory
    and assert prognostics + invariant curves match the artifact (f64, CPU)."""
    path = os.path.join(DATA, "bickley_oracle_180x90.npz")
    with np.load(path) as data:
        nx, ny, dt, n_steps, every = data["meta"]
        u20, v20, c20, eta20 = (data["u.020"], data["v.020"], data["c.020"],
                                data["eta.020"])
        ke_ref = data["ke"][:20]
        ens_ref = data["ens"][:20]
        cvar_ref = data["cvar"][:20]

    model, state = bickley(int(nx), int(ny))
    g = model.grid

    from benchmarks.gen_parity_oracle import diagnostics

    s = state
    ke, ens, cvar = [], [], []
    for _ in range(20):
        s = run_n(model, s, float(dt), 1)
        k_, e_, cv_ = diagnostics(model, s)
        ke.append(k_); ens.append(e_); cvar.append(cv_)

    # identical code + backend => tight tolerance; loosened only far enough to
    # survive XLA fusion-order churn across versions
    np.testing.assert_allclose(np.asarray(s.u)[g.interior2d], u20, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s.v)[g.interior2d], v20, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s.c)[g.interior2d], c20, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(model.grid_ext.interior(s.eta)), eta20,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ke, ke_ref, rtol=1e-10)
    np.testing.assert_allclose(ens, ens_ref, rtol=1e-10)
    np.testing.assert_allclose(cvar, cvar_ref, rtol=1e-10)


# ----------------------------------------------------------------------------------
# Convergence of the full dynamics
# ----------------------------------------------------------------------------------

def test_convergence():
    """CI-sized version of benchmarks/gen_parity_oracle.py's study: nested grids
    (coincident φ rows, x pair-averaged samples), resolution-scaled dt. The
    composite scheme is formally 2nd order (metric terms/interpolations); assert
    the observed order stays above a regression threshold."""
    from benchmarks.gen_parity_oracle import band_mask, sample_to_coarse

    T = 2 * 3600.0
    runs = {}
    models = {}
    for (nx, ny), dt in zip([(64, 33), (128, 65), (256, 129)], [240.0, 120.0, 60.0]):
        model, state = bickley(nx, ny, substeps=12)
        out = run_n(model, state, dt, int(round(T / dt)))
        runs[(nx, ny)] = np.asarray(out.c)[model.grid.interior2d]
        models[(nx, ny)] = model

    errs = []
    for fine, coarse in [((128, 65), (64, 33)), ((256, 129), (128, 65))]:
        fc = sample_to_coarse(runs[fine])
        cc = runs[coarse]
        band = band_mask(models[coarse])
        errs.append(np.sqrt(np.mean((fc[band] - cc[band]) ** 2)))
    order = np.log2(errs[0] / errs[1])
    assert errs[1] < errs[0], errs
    assert order > 1.5, (errs, order)


def test_layered_oracle_regression():
    """Re-run the first 15 steps of the committed layered (baroclinic-front)
    trajectory and assert prognostics + KE curve match the artifact (f64, CPU) —
    the layered analog of test_oracle_regression."""
    from functools import partial

    from examples.baroclinic_front import build as build_front
    from orthogonalsphericalshellgrids_tpu.models.layered import layered_multi_step

    path = os.path.join(DATA, "front_oracle_120x60x4.npz")
    with np.load(path) as data:
        nx, ny, nz, dt, n_steps, every = data["meta"]
        u15, v15, b15 = data["u.015"], data["v.015"], data["b.015"]
        ke_ref = data["ke"][:15]

    model, state = build_front(nx=int(nx), ny=int(ny), nz=int(nz), dtype=jnp.float64)
    g = model.grid
    az = g.az_cc * model.baro.ib.mask_c
    fn = jax.jit(partial(layered_multi_step, n_steps=1))

    s = state
    ke = []
    for _ in range(15):
        s = fn(model, s, float(dt))
        ke.append(float(jnp.sum(
            (0.5 * jnp.sum((s.u**2 + s.v**2) * model.dz3, axis=0) * az)[g.interior2d])))

    I3 = (slice(None),) + g.interior2d
    np.testing.assert_allclose(np.asarray(s.u)[I3], u15, rtol=1e-9, atol=1e-14)
    np.testing.assert_allclose(np.asarray(s.v)[I3], v15, rtol=1e-9, atol=1e-14)
    np.testing.assert_allclose(np.asarray(s.b)[I3], b15, rtol=1e-9, atol=1e-14)
    np.testing.assert_allclose(ke, ke_ref, rtol=1e-10)
