"""Forcing and closure tests: surface wind stress, bottom drag, horizontal Laplacian
viscosity/diffusivity — the standard ScalarDiffusivity/forcing equipment of the model
engine the reference exercises (no reference workload pins these; the pins here are
quantitative physics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import orthogonalsphericalshellgrids_tpu as osg
from orthogonalsphericalshellgrids_tpu.models import (
    SplitExplicitFreeSurface,
    initial_state,
    layered_initial_state,
    layered_multi_step,
    make_layered_model,
    make_model,
    step,
)

LAM_P, PHI_P = 45.0, 25.0
DEPTH = 1000.0


def bottom(lam, phi):
    land = (
        ((np.abs(lam - LAM_P) < 10) & (np.abs(PHI_P - phi) < 10))
        | ((np.abs(lam - (LAM_P + 180.0)) < 10) & (np.abs(PHI_P - phi) < 10))
        | (phi < -78)
    )
    return np.where(land, 1.0, -DEPTH)


def make_grid(nz=1):
    return osg.TripolarGrid.make((48, 32, nz), dtype=jnp.float64, z=(-DEPTH, 0.0),
                                 first_pole_longitude=LAM_P, north_poles_latitude=PHI_P)


def run(model, state, n, dt=60.0):
    sj = jax.jit(step)
    for _ in range(n):
        state = sj(model, state, dt)
    return state


def interior_mean_u(model, state):
    g = model.grid
    mask = np.asarray(model.ib.mask_u if hasattr(model, "ib") else model.mask_u3)
    u = np.asarray(state.u)
    if u.ndim == 3:
        mask = np.asarray(model.mask_u3)
    w = mask * 0 + mask
    return float((u * w).sum() / max(w.sum(), 1))


def test_wind_stress_spinup():
    """Constant zonal kinematic stress from rest: after time t the depth-averaged
    zonal flow is u ≈ τ·t/H (momentum input balance, before pressure gradients
    matter)."""
    tau = 1e-4  # m²/s² kinematic (≈ 0.1 N/m² over ρ0 = 1000)
    model = make_model(make_grid(), free_surface=SplitExplicitFreeSurface(substeps=8),
                       bottom_height=bottom,
                       wind_stress=lambda lam, phi: (np.full_like(lam, tau),
                                                     np.zeros_like(lam)))
    state = initial_state(model)
    n, dt = 20, 60.0
    out = run(model, state, n, dt)
    g = model.grid
    mask = np.asarray(g.interior(model.ib.mask_u))
    u = np.asarray(g.interior(out.u))
    expected = tau * n * dt / DEPTH
    got = (u * mask).sum() / mask.sum()
    np.testing.assert_allclose(got, expected, rtol=0.05)


def test_linear_bottom_drag_decays_flow():
    """With linear drag r the momentum input is removed at rate r·u/H: comparing runs
    with and without drag from the same initial jet, the dragged run must be slower —
    by ≈ exp(-r t / H) for the short, nearly-linear window tested."""
    def ui(lam, phi):
        return 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2

    r = 0.05  # strong linear drag [m/s]
    kw = dict(free_surface=SplitExplicitFreeSurface(substeps=8), bottom_height=bottom)
    m0 = make_model(make_grid(), **kw)
    m1 = make_model(make_grid(), bottom_drag=("linear", r), **kw)
    s0 = run(m0, initial_state(m0, u=ui), 10)
    s1 = run(m1, initial_state(m1, u=ui), 10)
    g = m0.grid
    a0 = float(np.abs(np.asarray(g.interior(s0.u))).max())
    a1 = float(np.abs(np.asarray(g.interior(s1.u))).max())
    expected_ratio = np.exp(-r * 10 * 60.0 / DEPTH)
    np.testing.assert_allclose(a1 / a0, expected_ratio, rtol=0.02)


def test_quadratic_drag_decays_flow():
    def ui(lam, phi):
        return 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2

    kw = dict(free_surface=SplitExplicitFreeSurface(substeps=8), bottom_height=bottom)
    m0 = make_model(make_grid(), **kw)
    m1 = make_model(make_grid(), bottom_drag=("quadratic", 2.5e-1), **kw)
    s0 = run(m0, initial_state(m0, u=ui), 10)
    s1 = run(m1, initial_state(m1, u=ui), 10)
    g = m0.grid
    a0 = float(np.abs(np.asarray(g.interior(s0.u))).max())
    a1 = float(np.abs(np.asarray(g.interior(s1.u))).max())
    assert a1 < 0.99 * a0


def test_horizontal_diffusion_smooths_and_conserves():
    """κ_h smooths tracer extrema and, because the diffusive fluxes are masked face
    fluxes, the seam-aware tracer content stays conserved to round-off."""
    from orthogonalsphericalshellgrids_tpu.models.diagnostics import tracer_content

    def ci(lam, phi):
        return np.sign(np.sin(np.deg2rad(lam) * 11) * np.sin(np.deg2rad(phi) * 13))

    kw = dict(free_surface=SplitExplicitFreeSurface(substeps=8), bottom_height=bottom)
    m0 = make_model(make_grid(), **kw)
    m1 = make_model(make_grid(), kappa_h=5e3, **kw)
    s0 = run(m0, initial_state(m0, c=ci), 10)
    st1 = initial_state(m1, c=ci)
    c_before = float(tracer_content(m1, st1))
    # the checkerboard's SIGNED content cancels to ~0, so normalize the drift by the
    # gross content Σ|c|·Az·H (the scale round-off actually accumulates against)
    gross = float(tracer_content(m1, type(st1)(**{**st1.__dict__, "c": jnp.abs(st1.c)})))
    s1 = run(m1, initial_state(m1, c=ci), 10)
    c_after = float(tracer_content(m1, s1))
    g = m0.grid

    def var(s):
        c = np.asarray(g.interior(s.c))
        m = np.asarray(g.interior(m0.ib.mask_c))
        mu = (c * m).sum() / m.sum()
        return ((c - mu) ** 2 * m).sum() / m.sum()

    assert var(s1) < var(s0)
    assert abs(c_after - c_before) <= 1e-11 * gross


def test_viscosity_damps_kinetic_energy():
    """KE decays at the Laplacian rate ~exp(-2·ν·k²·t). For the sin(16φ)cos(7λ)
    field on this grid the gravest resolved wavelengths are O(1000 km), so over
    t = 600 s a ν large enough to produce a >1% drop needs to be O(10⁶ m²/s)
    (diffusive number ν·Δt/Δx² stays ≪ 1 at this resolution, so the explicit step
    is still stable). The previous ν=5e3 run decayed KE by only ~5e-5 — physically
    correct but below the old 1% assertion; calibrate ν to the assertion instead."""
    def ui(lam, phi):
        return np.sin(np.deg2rad(phi) * 16) * np.cos(np.deg2rad(lam) * 7)

    nu = 2e6
    kw = dict(free_surface=SplitExplicitFreeSurface(substeps=8), bottom_height=bottom)
    m0 = make_model(make_grid(), **kw)
    m1 = make_model(make_grid(), nu_h=nu, **kw)
    s0 = run(m0, initial_state(m0, u=ui), 10)
    s1 = run(m1, initial_state(m1, u=ui), 10)
    g = m0.grid

    def ke(s):
        return float((np.asarray(g.interior(s.u)) ** 2).sum())

    # Viscous run loses energy relative to the inviscid twin — by more than 1%
    # (the analytic decay at this ν and spectrum is a few %), but not implausibly
    # much (>50% would mean the operator is unstable or mis-scaled).
    assert ke(s1) < 0.99 * ke(s0)
    assert ke(s1) > 0.50 * ke(s0)
    assert np.isfinite(np.asarray(s1.u)).all()


def test_layered_wind_acts_on_surface_layer():
    """After one step, the stress-forced surface layer must lead the subsurface by a
    wide margin (the barotropic corrector spreads only the depth MEAN)."""
    tau = 1e-4
    model = make_layered_model(
        make_grid(nz=4), free_surface=SplitExplicitFreeSurface(substeps=8),
        bottom_height=bottom,
        wind_stress=lambda lam, phi: (np.full_like(lam, tau), np.zeros_like(lam)))
    state = layered_initial_state(model)
    out = jax.jit(layered_multi_step, static_argnums=(3,))(model, state, 60.0, 1)
    g = model.grid
    I = g.interior2d
    mask = np.asarray(model.mask_u3)
    u = np.asarray(out.u)
    mean0 = (u[0] * mask[0])[I].sum() / mask[0][I].sum()
    mean1 = (u[1] * mask[1])[I].sum() / mask[1][I].sum()
    assert mean0 > 0
    assert mean0 > 4.0 * abs(mean1), (mean0, mean1)


def test_layered_bottom_drag_acts_on_bottom_layer():
    model = make_layered_model(
        make_grid(nz=4), free_surface=SplitExplicitFreeSurface(substeps=8),
        bottom_height=bottom, bottom_drag=("linear", 0.05))
    state = layered_initial_state(
        model, u=lambda lam, phi, z: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2)
    out = jax.jit(layered_multi_step, static_argnums=(3,))(model, state, 60.0, 10)
    g = model.grid
    I = g.interior2d
    mask = np.asarray(model.mask_u3)
    u = np.asarray(out.u)
    top = np.abs(u[0] * mask[0])[I].sum() / mask[0][I].sum()
    bot = np.abs(u[-1] * mask[-1])[I].sum() / mask[-1][I].sum()
    assert bot < 0.98 * top, (top, bot)


# --------------------------------------------------------------------------------------
# User forcing functions (Oceananigans ``Forcing``: time- and field-dependent terms)
# --------------------------------------------------------------------------------------

def test_tracer_relaxation_forcing():
    """Relaxation forcing F_c = -(c - c*)/tau with no flow: advection vanishes, so
    every wet cell must follow the quasi-AB2 recurrence of the scalar ODE exactly."""
    from orthogonalsphericalshellgrids_tpu.models.hydrostatic import _CHI

    tau, c_star, dt, n = 3600.0, 1.0, 120.0, 6
    model = make_model(
        make_grid(), free_surface=SplitExplicitFreeSurface(substeps=6),
        bottom_height=bottom,
        forcing={"c": lambda lam, phi, t, f: -(f.c - c_star) / tau})
    state = initial_state(model)   # at rest, c = 0

    s = run(model, state, n, dt=dt)

    # scalar quasi-AB2 replica (forward Euler first step)
    cs, g_prev = 0.0, 0.0
    for k in range(n):
        g_now = -(cs - c_star) / tau
        w1, w2 = (1.0, 0.0) if k == 0 else (1.5 + _CHI, 0.5 + _CHI)
        cs = cs + dt * (w1 * g_now - w2 * g_prev)
        g_prev = g_now
    wet = np.asarray(model.ib.mask_c) > 0
    got = np.asarray(s.c)[wet & np.isfinite(np.asarray(s.c))]
    np.testing.assert_allclose(got, cs, rtol=1e-12)


def test_time_dependent_forcing_sees_model_time():
    """A u-forcing A·cos(ω t): the tendency evaluated through the step must use the
    state's time (pinned by differencing two starting times)."""
    from orthogonalsphericalshellgrids_tpu.models.hydrostatic import tendencies, _fill
    from orthogonalsphericalshellgrids_tpu.ops.location import CC, CF, FC

    A, om = 1e-5, 2 * np.pi / 7200.0
    model = make_model(
        make_grid(), free_surface=SplitExplicitFreeSurface(substeps=6),
        bottom_height=bottom,
        forcing={"u": lambda lam, phi, t, f: A * jnp.cos(om * t) * jnp.ones_like(lam)})
    state = initial_state(model)
    g = model.grid
    u = _fill(g, state.u, FC, -1)
    v = _fill(g, state.v, CF, -1)
    c = _fill(g, state.c, CC, 1)

    Gu0, _, _ = jax.jit(tendencies)(model, u, v, c, 0.0)
    Gu1, _, _ = jax.jit(tendencies)(model, u, v, c, 1800.0)
    diff = np.asarray(Gu0 - Gu1)
    expect = A * (1.0 - np.cos(om * 1800.0)) * np.asarray(model.ib.mask_u)
    np.testing.assert_allclose(diff, expect, rtol=0, atol=1e-18)


def test_forcing_validation():
    with pytest.raises(ValueError, match="forcing targets"):
        make_model(make_grid(), free_surface=SplitExplicitFreeSurface(substeps=6),
                   bottom_height=bottom, forcing={"w": lambda *a: 0.0})
    with pytest.raises(ValueError, match="forcing targets"):
        make_layered_model(make_grid(3), free_surface=SplitExplicitFreeSurface(substeps=6),
                           bottom_height=bottom,
                           forcing={"b": lambda *a: 0.0})  # b not prognostic here


def test_layered_forcing_z_dependence():
    """Layered forcing receives the layer-center depths: a T relaxation toward a
    z-profile must pull each layer toward its own target."""
    tau = 1800.0
    prof = lambda z: 10.0 + 5e-3 * z

    model = make_layered_model(
        make_grid(4), free_surface=SplitExplicitFreeSurface(substeps=6),
        bottom_height=bottom, tracers=("T", "S"), buoyancy="linear_eos",
        forcing={"T": lambda lam, phi, z, t, f: -(0.0 - prof(z)) / tau
                 * jnp.ones_like(lam)})
    state = layered_initial_state(model)   # T = S = 0 everywhere

    s = jax.jit(layered_multi_step, static_argnums=(3,))(model, state, 60.0, 3)
    nz = model.nz
    zc = np.asarray(model.zc)
    wet = np.asarray(model.mask_c3) > 0
    T = np.asarray(s.c[:nz])
    S = np.asarray(s.c[nz:])
    assert np.all(np.abs(S[wet]) == 0.0)        # untargeted tracer untouched
    for k in range(nz):
        vals = T[k][wet[k]]
        assert vals.size and np.allclose(vals, vals[0], rtol=1e-10)
        # each layer moved toward ITS profile value: ratio across layers matches prof
    r = np.array([T[k][wet[k]][0] for k in range(nz)])
    np.testing.assert_allclose(r / r[0], prof(zc) / prof(zc[0]), rtol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_forcing_sharded_matches_serial():
    """Time- and field-dependent forcing through the overlap-split sharded step must
    match serial bitwise (the strip recompute sees row-sliced λ/φ and fields)."""
    from orthogonalsphericalshellgrids_tpu.parallel import (
        distribute, gather_state, make_mesh, sharded_step_fn,
    )

    grid = osg.TripolarGrid.make((32, 48, 1), dtype=jnp.float64,
                                 first_pole_longitude=45.0, north_poles_latitude=35.0)

    def bot2(lam, phi):
        land = (((np.abs(lam - 45.0) < 12) & (np.abs(35.0 - phi) < 12))
                | ((np.abs(lam - 225.0) < 12) & (np.abs(35.0 - phi) < 12))
                | (phi < -78))
        return np.where(land, 1.0, 0.0)

    model = make_model(
        grid, free_surface=SplitExplicitFreeSurface(substeps=6), bottom_height=bot2,
        forcing={
            "u": lambda lam, phi, t, f: 1e-6 * jnp.cos(2e-4 * t)
            * jnp.sin(jnp.deg2rad(phi)),
            "c": lambda lam, phi, t, f: -(f.c - 0.5) / 7200.0,
        })
    state = initial_state(model, u=lambda lam, phi: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
                          c=lambda lam, phi: np.sin(np.deg2rad(phi) * 4))

    mesh = make_mesh(4)
    dist_model, dist_state = distribute(model, state, mesh)
    fn = sharded_step_fn(mesh, dist_model)
    sj = jax.jit(step)

    ss, ds = state, dist_state
    for _ in range(4):
        ss = sj(model, ss, 120.0)
        ds = fn(ds, 120.0)

    got = gather_state(ds, model, 4)
    g = model.grid
    for name in ("u", "v", "c"):
        np.testing.assert_array_equal(
            np.asarray(g.interior(getattr(got, name))),
            np.asarray(g.interior(getattr(ss, name))), err_msg=name)


def test_buoyancy_forcing_field_dependence():
    """Forcing on target "b" reads the prognostic buoyancy through fields.b
    (relaxation toward a profile must damp the anomaly)."""
    tau = 1800.0
    prof = lambda z: 1e-4 * (z + DEPTH) / DEPTH

    model = make_layered_model(
        make_grid(3), free_surface=SplitExplicitFreeSurface(substeps=6),
        bottom_height=bottom, buoyancy=True,
        forcing={"b": lambda lam, phi, z, t, f: -(f.b - prof(z)) / tau})
    state = layered_initial_state(model, b=lambda l, p, z: prof(z) + 1e-5)
    s = jax.jit(layered_multi_step, static_argnums=(3,))(model, state, 60.0, 5)
    zc = np.asarray(model.zc)
    g = model.grid
    I3 = (slice(None),) + g.interior2d
    wet = np.asarray(model.mask_c3)[I3] > 0  # interior wet cells (halos are stale)
    anom = (np.asarray(s.b) - prof(zc)[:, None, None])[I3]
    a0 = 1e-5
    assert 0 < np.abs(anom[wet]).max() < a0  # damped toward the profile, not past it


def test_buoyancy_truthy_coercion():
    """Any truthy non-string buoyancy (1, np.True_) selects the prognostic tracer —
    a silent 'none' here would mean silently wrong physics."""
    m = make_layered_model(make_grid(2), free_surface=SplitExplicitFreeSurface(substeps=6),
                           bottom_height=bottom, buoyancy=np.True_)
    assert m.buoyancy == "tracer_b"
    m = make_layered_model(make_grid(2), free_surface=SplitExplicitFreeSurface(substeps=6),
                           bottom_height=bottom, buoyancy=1)
    assert m.buoyancy == "tracer_b"


# --------------------------------------------------------------------------------------
# Biharmonic (∇⁴) closures — HorizontalScalarBiharmonicDiffusivity analog
# --------------------------------------------------------------------------------------

def test_biharmonic_viscosity_is_scale_selective():
    """The defining property of ∇⁴ dissipation: damping rate ν₄k⁴, so with the same
    ν₄ a mode at ~3.5x the wavenumber loses its energy ~150x faster. Pin (a) the
    high-k field loses >1% KE vs its inviscid twin, (b) the low-k field's fractional
    loss is at least 20x smaller, (c) stability (no blow-up, no >50% loss)."""

    def hi(lam, phi):
        return np.sin(np.deg2rad(phi) * 16) * np.cos(np.deg2rad(lam) * 7)

    def lo(lam, phi):
        return np.sin(np.deg2rad(phi) * 4) * np.cos(np.deg2rad(lam) * 2)

    # ν₄ sizing: the smallest WET cell here is ~220 km, so the explicit ∇⁴ limit
    # ν₄·Δt/Δx⁴ ≲ 1/32 caps ν₄ at ~1.2e18 m⁴/s; 5e17 is safely inside and damps
    # the high-k mode by ~4.6% over 10 minutes (measured; scales linearly in ν₄).
    nu4 = 5.0e17
    kw = dict(free_surface=SplitExplicitFreeSurface(substeps=8), bottom_height=bottom)

    def frac_loss(ufn):
        m0 = make_model(make_grid(), **kw)
        m1 = make_model(make_grid(), nu4_h=nu4, **kw)
        s0 = run(m0, initial_state(m0, u=ufn), 10)
        s1 = run(m1, initial_state(m1, u=ufn), 10)
        gr = m0.grid
        ke0 = float((np.asarray(gr.interior(s0.u)) ** 2).sum())
        ke1 = float((np.asarray(gr.interior(s1.u)) ** 2).sum())
        assert np.isfinite(np.asarray(s1.u)).all()
        assert ke1 > 0.5 * ke0  # not mis-scaled/unstable
        return (ke0 - ke1) / ke0

    f_hi = frac_loss(hi)
    f_lo = frac_loss(lo)
    assert f_hi > 0.02, f_hi
    assert f_hi > 20.0 * abs(f_lo), (f_hi, f_lo)


def test_biharmonic_diffusivity_smooths_and_conserves():
    """κ₄ reduces tracer variance while the masked flux form conserves the seam-aware
    content to round-off (same contract as the Laplacian closure)."""
    from orthogonalsphericalshellgrids_tpu.models.diagnostics import tracer_content

    def ci(lam, phi):
        return np.sign(np.sin(np.deg2rad(lam) * 11) * np.sin(np.deg2rad(phi) * 13))

    kw = dict(free_surface=SplitExplicitFreeSurface(substeps=8), bottom_height=bottom)
    m0 = make_model(make_grid(), **kw)
    m1 = make_model(make_grid(), kappa4_h=5.0e17, **kw)
    s0 = run(m0, initial_state(m0, c=ci), 10)
    st1 = initial_state(m1, c=ci)
    c_before = float(tracer_content(m1, st1))
    gross = float(tracer_content(m1, type(st1)(**{**st1.__dict__, "c": jnp.abs(st1.c)})))
    s1 = run(m1, st1, 10)
    c_after = float(tracer_content(m1, s1))
    g = m0.grid

    def var(s):
        c = np.asarray(g.interior(s.c))
        m = np.asarray(g.interior(m0.ib.mask_c))
        mu = (c * m).sum() / m.sum()
        return ((c - mu) ** 2 * m).sum() / m.sum()

    assert var(s1) < var(s0)
    assert abs(c_after - c_before) <= 1e-11 * gross


def test_layered_biharmonic_runs_and_conserves():
    """Layered (Nz=3) biharmonic closures: per-layer masked application, tracer
    content conserved, KE damped vs the inviscid twin."""
    from orthogonalsphericalshellgrids_tpu.models.diagnostics import layered_tracer_content

    def ui3(lam, phi, z):
        return np.sin(np.deg2rad(phi) * 16) * np.cos(np.deg2rad(lam) * 7)

    def ci3(lam, phi, z):
        return np.sign(np.sin(np.deg2rad(lam) * 11))

    kw = dict(free_surface=SplitExplicitFreeSurface(substeps=8), bottom_height=bottom)
    m0 = make_layered_model(make_grid(nz=3), **kw)
    m1 = make_layered_model(make_grid(nz=3), nu4_h=5.0e17, kappa4_h=5.0e17, **kw)
    s0 = layered_initial_state(m0, u=ui3, c=ci3)
    s1 = layered_initial_state(m1, u=ui3, c=ci3)
    q0 = float(layered_tracer_content(m1, s1))
    # the ±1 checkerboard's SIGNED content cancels to ~0 — normalize the drift by
    # the gross content Σ|c|·Az·dz (same convention as the single-layer test)
    gross = float(layered_tracer_content(
        m1, type(s1)(**{**s1.__dict__, "c": jnp.abs(s1.c)})))
    o0 = jax.jit(layered_multi_step, static_argnums=(3,))(m0, s0, 60.0, 10)
    o1 = jax.jit(layered_multi_step, static_argnums=(3,))(m1, s1, 60.0, 10)
    q1 = float(layered_tracer_content(m1, o1))
    assert np.isfinite(np.asarray(o1.u)).all()
    assert abs(q1 - q0) <= 1e-11 * gross
    ke0 = float(jnp.sum(o0.u ** 2))
    ke1 = float(jnp.sum(o1.u ** 2))
    assert ke1 < 0.99 * ke0
    assert ke1 > 0.5 * ke0
