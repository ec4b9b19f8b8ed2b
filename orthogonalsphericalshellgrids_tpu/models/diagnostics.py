"""Diagnostics: vertical vorticity, kinetic energy, CFL numbers.

The reference's diagnostic surface is ``VerticalVorticityField`` (SURVEY.md O9,
examples/bickley_jet.jl:57) plus the progress-callback max-velocity readouts. All
diagnostics here are pure jitted functions of (model, state)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.location import CC, CF, FC
from ..ops.operators import ixc, iyc
from .hydrostatic import HydrostaticModel, State, _fill, vorticity

__all__ = ["vertical_vorticity", "kinetic_energy", "max_speeds", "advective_cfl",
           "tracer_content", "surface_volume", "layered_tracer_content", "seam_row_weights"]


@jax.jit
def vertical_vorticity(model: HydrostaticModel, state: State):
    """ζ at FF from the prognostic velocities (halo-filled internally) — the
    reference's VerticalVorticityField."""
    g = model.grid
    u = _fill(g, state.u, FC, -1)
    v = _fill(g, state.v, CF, -1)
    return vorticity(model, u, v)


@jax.jit
def kinetic_energy(model: HydrostaticModel, state: State):
    """KE per unit mass at cell centers: (ℑx(u²) + ℑy(v²)) / 2."""
    g = model.grid
    u = _fill(g, state.u, FC, -1)
    v = _fill(g, state.v, CF, -1)
    return 0.5 * (ixc(u * u) + iyc(v * v)) * model.ib.mask_c


def seam_row_weights(Ny, dtype=None):
    """Row weights for global integrals on a tripolar grid: the last interior row
    (the fold seam, center row Ny) appears TWICE in index space — columns i and
    Nx−i+1 of row Ny are the same physical cells (the reference's duplicated-row
    convention, ``src/zipper_boundary_condition.jl:95-104``) — so it is counted at
    weight 1/2. With this weighting, flux-form tracer content is conserved exactly
    even while flow crosses the seam (a straight full sum shows transient drift
    whenever an asymmetric feature occupies the seam row)."""
    w = jnp.ones((Ny, 1), dtype=dtype)
    return w.at[-1, 0].set(0.5)


@jax.jit
def tracer_content(model: HydrostaticModel, state: State):
    """Global tracer content Σ c·Az·H with the seam row half-weighted — conserved to
    round-off by the flux-form advection across the zipper fold (pinned in
    tests/test_model.py). With multiple tracers (3-D ``state.c``) returns the
    per-tracer content vector, ordered as ``model.tracer_names``."""
    g = model.grid
    w = seam_row_weights(g.Ny, model.dtype)
    return jnp.sum(g.interior(state.c * g.az_cc * model.ib.h_c) * w, axis=(-2, -1))


@jax.jit
def surface_volume(model: HydrostaticModel, state: State):
    """Global free-surface volume anomaly Σ η·Az (seam row half-weighted) — conserved
    by the barotropic divergence update."""
    ge = model.grid_ext
    w = seam_row_weights(ge.Ny, model.dtype)
    return jnp.sum(ge.interior(state.eta * ge.az_cc) * w)


@partial(jax.jit, static_argnames=("field",))
def layered_tracer_content(model, state, field="c"):
    """Σ c·Az·dz over all layers (seam row half-weighted): the layered model's
    conserved tracer functional (zero-flux surface/floor, telescoping interior —
    pinned in tests/test_layered.py). With multiple tracers (``field="c"`` and a
    tracer-major (n·Nz, Yb, Xb) stack) returns the per-tracer content vector in
    ``model.tracer_names`` order."""
    from .layered import _as_tracer4

    g = model.grid
    w = seam_row_weights(g.Ny, model.dtype)
    c = getattr(state, field)
    vol = model.mask_c3 * model.dz3 * g.az_cc  # dz3: per-layer (stretched-aware)
    if field == "c":
        c4 = _as_tracer4(model, c)
        out = jnp.sum((c4 * vol)[..., g.interior2d[0], g.interior2d[1]] * w,
                      axis=(-3, -2, -1))
        return out[0] if len(model.tracer_names) == 1 else out
    return jnp.sum((c * vol)[(slice(None),) + g.interior2d] * w)


@jax.jit
def max_speeds(model: HydrostaticModel, state: State):
    """(max|u|, max|v|) over the interior — the progress-callback readout."""
    g = model.grid
    return (
        jnp.max(jnp.abs(g.interior(state.u))),
        jnp.max(jnp.abs(g.interior(state.v))),
    )


@jax.jit
def advective_cfl(model: HydrostaticModel, state: State, dt):
    """max over cells of (|u|/Δx + |v|/Δy)·Δt."""
    g = model.grid
    speed = jnp.abs(state.u) * model.inv_dx_fc + jnp.abs(state.v) * model.inv_dy_cf
    return jnp.max(g.interior(speed)) * dt
