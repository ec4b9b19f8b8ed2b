"""BASELINE config #3: tracer advection across the zipper north-fold.

A tracer blob advected northward through the fold seam must (a) conserve total content
exactly, and (b) re-emerge in the mirrored columns moving 'south' in index space —
physically it just crossed the line between the two north poles. Velocities are frozen
(advection-only Euler steps on the tracer tendency), isolating the fold BC."""

import numpy as np

import jax
import jax.numpy as jnp

import orthogonalsphericalshellgrids_tpu as osg
from orthogonalsphericalshellgrids_tpu.models import (
    SplitExplicitFreeSurface, initial_state, make_model,
)
from orthogonalsphericalshellgrids_tpu.models import hydrostatic as H
from orthogonalsphericalshellgrids_tpu.ops import zipper
from orthogonalsphericalshellgrids_tpu.ops.location import CC, CF, FC


def test_blob_crosses_fold():
    nx, ny = 64, 48
    grid = osg.TripolarGrid.make((nx, ny, 1), dtype=jnp.float64,
                                 first_pole_longitude=45.0, north_poles_latitude=55.0)
    model = make_model(grid, free_surface=SplitExplicitFreeSurface(substeps=8))

    # Gaussian blob in index space, centered a few rows south of the fold at columns
    # i0 ~ Nx/4 (quarter domain: safely between the poles at i0=0 and Nx/2).
    j_blob, i_blob, sig = ny - 20, nx // 4, 3.0
    blob = np.zeros((ny, nx))
    jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    blob = np.exp(-((jj - j_blob) ** 2 + (ii - i_blob) ** 2) / (2 * sig**2))
    blob = np.where(blob > 1e-10, blob, 0.0)  # compact support: clean phase-1 check

    c0 = jnp.zeros(grid.shape2d, jnp.float64).at[grid.interior2d].set(jnp.asarray(blob))
    # Frozen flow that is fold-CONSISTENT (antisymmetric under the fold map
    # i -> Nx-1-i): northward on the blob's half, southward on the mirrored half, so
    # the flow passes THROUGH the seam. (A uniformly-northward v is a legitimate but
    # convergent flow at the seam — mass would pile up there instead of crossing.)
    v_int = np.where(ii < nx // 2, 0.5, -0.5)
    v0 = jnp.zeros(grid.shape2d, jnp.float64).at[grid.interior2d].set(jnp.asarray(v_int))
    u0 = jnp.zeros(grid.shape2d, jnp.float64)

    def fillb(S):
        return zipper.fill_halos_batch(S, [FC, CF, CC], [-1, -1, 1],
                                       grid.Nx, grid.Ny, grid.Hx, grid.Hy, xp=jnp)

    @jax.jit
    def advect(c, dt):
        S = fillb(jnp.stack([u0, v0, c]))
        _, _, Gc = H.tendencies(model, S[0], S[1], S[2])
        return c + dt * Gc

    vol = np.asarray(grid.interior(grid.az_cc * model.ib.h_c))
    total0 = float((np.asarray(grid.interior(c0)) * vol).sum())

    # CFL-safe dt from the smallest dy near the fold
    dy_min = float(np.asarray(grid.interior(grid.dy_cf)).min())
    dt = 0.2 * dy_min / 0.5

    # Phase 1: before the blob reaches the seam row, flux-form conservation is exact.
    c = c0
    for _ in range(30):
        c = advect(c, dt)
    mid = float((np.asarray(grid.interior(c)) * vol).sum())
    assert abs(mid - total0) / total0 < 1e-8

    # Phase 2: full crossing. While an *asymmetric* feature occupies the duplicated
    # seam row, the straight sum over all rows double-counts it (transient apparent
    # drift up to ~13% at mid-crossing), and the reference's redundant-half overwrite
    # (c[i,Ny] <- c[i',Ny] for i > Nx/2, src/zipper_boundary_condition.jl:102) leaves
    # only a tiny residual once the blob has fully crossed.
    for _ in range(2970):
        c = advect(c, dt)

    ci = np.asarray(grid.interior(c))
    assert np.all(np.isfinite(ci))
    total1 = float((ci * vol).sum())
    assert abs(total1 - total0) / total0 < 1e-6

    # the blob must have crossed to the exact mirror position: start (j_blob, i_blob),
    # end (j_blob, Nx-1-i_blob), now moving south in index space
    jm, im = np.unravel_index(np.argmax(ci), ci.shape)
    assert im == nx - 1 - i_blob, (jm, im)
    assert abs(jm - j_blob) <= 2, (jm, im)
    assert abs(ci.max() - 1.0) < 0.05  # shape preserved through the fold
