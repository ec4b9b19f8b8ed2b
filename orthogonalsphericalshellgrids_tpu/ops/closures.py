"""Horizontal Laplacian closures on the curvilinear C-grid.

The reference's workloads rely on WENO's implicit dissipation only, but the model
engine they exercise (Oceananigans ``HydrostaticFreeSurfaceModel``) accepts explicit
``ScalarDiffusivity`` closures as standard equipment — any production configuration a
reference user migrates will need them. These are the metric-aware five-point
Laplacians for each staggered location:

    lap(q) = [ δx( (Δy/Δx)|_e · δx q ) + δy( (Δx/Δy)|_e · δy q ) ] / Az|_L

with the edge metric ratios evaluated at the staggered location of each first
derivative and free-slip masking (cross fluxes vanish at solid faces). All operators
act on halo-inclusive ``(..., y, x)`` arrays and consume two halo cells of validity.
"""

from __future__ import annotations

import jax.numpy as jnp

from .operators import dxc, dxf, dyc, dyf, shift_m

_Y = -2


def _ratio(num, den):
    """num/den with degenerate (zero-metric pole) cells mapped to 0."""
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)


__all__ = ["laplacian_u", "laplacian_v", "laplacian_c",
           "biharmonic_u", "biharmonic_v", "biharmonic_c"]


def laplacian_u(grid, u, mask_u, mask_c):
    """∇²u at FC points: x-gradient lives at CC (masked by the cell), y-gradient at FF
    (masked by the two vertically adjacent u faces — free slip). Masks may carry a
    leading layer axis; the 2-D grid metrics broadcast against it."""
    gx = dxc(u) * _ratio(grid.dy_cc, grid.dx_cc) * mask_c
    m_ff = mask_u * shift_m(mask_u, _Y)
    gy = dyf(u) * _ratio(grid.dx_ff, grid.dy_ff) * m_ff
    return (dxf(gx) + dyc(gy)) * _ratio(1.0, grid.az_fc) * mask_u


def laplacian_v(grid, v, mask_v, mask_c):
    """∇²v at CF points: x-gradient at FF (free-slip mask from adjacent v faces),
    y-gradient at CC."""
    m_ff = mask_v * shift_m(mask_v, -1)
    gx = dxf(v) * _ratio(grid.dy_ff, grid.dx_ff) * m_ff
    gy = dyc(v) * _ratio(grid.dx_cc, grid.dy_cc) * mask_c
    return (dxc(gx) + dyf(gy)) * _ratio(1.0, grid.az_cf) * mask_v


def laplacian_c(grid, c, mask_c, mask_u, mask_v):
    """∇²c at CC points: gradients at the u/v faces, masked so no diffusive flux
    crosses a solid face."""
    gx = dxf(c) * _ratio(grid.dy_fc, grid.dx_fc) * mask_u
    gy = dyf(c) * _ratio(grid.dx_cf, grid.dy_cf) * mask_v
    return (dxc(gx) + dyc(gy)) * _ratio(1.0, grid.az_cc) * mask_c


# Biharmonic (∇⁴ = ∇²∘∇²) hyperdissipation — the ecosystem's
# ``HorizontalScalarBiharmonicDiffusivity``, the standard explicit closure at
# eddy-permitting ocean resolution (scale-selective: damps 2Δx noise at rate ν₄k⁴
# while leaving resolved scales nearly untouched). The tendency contribution is
# NEGATIVE: G -= ν₄·∇⁴q. Each ∇² consumes one halo cell, so the composition needs
# two — within every supported halo (WENO-5 already requires three). Because the
# inner Laplacian is masked exactly like the outer one, the dissipated quantity's
# masked content obeys the same flux-form conservation as the Laplacian closures.

def biharmonic_u(grid, u, mask_u, mask_c):
    """∇⁴u at FC points (∇² applied twice with identical free-slip masking)."""
    return laplacian_u(grid, laplacian_u(grid, u, mask_u, mask_c), mask_u, mask_c)


def biharmonic_v(grid, v, mask_v, mask_c):
    """∇⁴v at CF points."""
    return laplacian_v(grid, laplacian_v(grid, v, mask_v, mask_c), mask_v, mask_c)


def biharmonic_c(grid, c, mask_c, mask_u, mask_v):
    """∇⁴c at CC points."""
    return laplacian_c(grid, laplacian_c(grid, c, mask_c, mask_u, mask_v),
                       mask_c, mask_u, mask_v)
