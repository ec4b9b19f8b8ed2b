"""Vector rotation between the tripolar (native) frame and the geographic frame.

Port of the reference's user-level recipe ``examples/convert_to_latlong_frame.jl:12-55``
(SURVEY.md O17): assuming local orthogonality of the tripolar mesh, the local rotation
angle follows from how latitude changes along the native grid directions:

    ũ =  deg2rad(φᶜᶠ[j+1] − φᶜᶠ[j]) / Δyᶜᶜ      (northward tilt of the native y axis)
    ṽ = −deg2rad(φᶠᶜ[i+1] − φᶠᶜ[i]) / Δxᶜᶜ      (northward tilt of the native x axis)
    (d₁, d₂) = (ũ, ṽ) / |(ũ, ṽ)|

    geographic (u, v) = (uₒ d₁ − vₒ d₂,  uₒ d₂ + vₒ d₁)     [native -> latlon]
    native     (u, v) = (uₒ d₁ + vₒ d₂,  uₒ d₂ − vₒ d₁)     [latlon -> native]

All quantities are evaluated at cell centers; inputs are expected at centers too (the
reference recipe likewise operates on center-interpolated velocities).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..grids.tripolar import TripolarGrid
from ..ops.operators import shift_p

__all__ = ["rotation_angle", "to_latlon_frame", "to_native_frame"]


def rotation_angle(grid: TripolarGrid):
    """(d1, d2) rotation components at cell centers (cos/sin of the local grid tilt)."""
    dphi_y = jnp.deg2rad(shift_p(grid.phi_cf, -2) - grid.phi_cf)
    u_t = dphi_y * _safe_inv(grid.dy_cc)
    dphi_x = jnp.deg2rad(shift_p(grid.phi_fc, -1) - grid.phi_fc)
    v_t = -dphi_x * _safe_inv(grid.dx_cc)
    mag = jnp.sqrt(u_t**2 + v_t**2)
    inv = _safe_inv(mag)
    return u_t * inv, v_t * inv


def _safe_inv(m):
    return jnp.where(m != 0, 1.0 / jnp.where(m != 0, m, 1.0), 0.0)


def to_latlon_frame(grid: TripolarGrid, u_native, v_native):
    """Rotate center-located native-frame vector components into the geographic frame
    (the reference's ``convert_to_latlong_frame``)."""
    d1, d2 = rotation_angle(grid)
    return u_native * d1 - v_native * d2, u_native * d2 + v_native * d1


def to_native_frame(grid: TripolarGrid, u_geo, v_geo):
    """Rotate center-located geographic vector components into the native frame.

    Deliberate deviation: the reference's ``convert_to_native_frame``
    (examples/convert_to_latlong_frame.jl:36-55) returns
    (u d₁ + v d₂, u d₂ − v d₁), which composed with its own forward map gives
    diag(1, −1) — the v-component comes back sign-flipped. Here the true inverse
    (the transpose of the forward rotation) is used, so
    to_native_frame ∘ to_latlon_frame == identity."""
    d1, d2 = rotation_angle(grid)
    return u_geo * d1 + v_geo * d2, -u_geo * d2 + v_geo * d1
