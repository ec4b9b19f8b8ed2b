"""VMEM-resident momentum kernel parity (interpret mode on CPU).

ops/pallas_mom.momentum_pallas must reproduce the vector-invariant horizontal
momentum slice of models/layered.layered_tendencies (zeta/q + upwind WENO-5
vorticity reconstruction + KE gradient), plus the optional fused Laplacian
closure and quadratic bottom drag, on every full-validity cell. Tolerances are
the contraction band (docs/parity.md row L10 class).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orthogonalsphericalshellgrids_tpu.ops.advection import (
    weno5_upwind_centers_from_faces)
from orthogonalsphericalshellgrids_tpu.ops.operators import (
    dxc, dxf, dyc, dyf, ixc, ixf, iyc, iyf, shift_m)
from orthogonalsphericalshellgrids_tpu.ops.pallas_mom import momentum_pallas


def _fields(nz, Yb, Xb, dtype, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), dtype)
    v = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), dtype)
    mets = {n: jnp.asarray(1.0 + rng.random((Yb, Xb)), dtype)
            for n in ("dy_cf", "dx_fc", "inv_az_ff", "dx_cf", "inv_dx_fc",
                      "dy_fc", "inv_dy_cf")}
    mets["f_ff"] = jnp.asarray(0.1 * rng.standard_normal((Yb, Xb)), dtype)
    return u, v, mets


def _xla_adv(u, v, M):
    zeta = (dxf(M["dy_cf"] * v) - dyf(M["dx_fc"] * u)) * M["inv_az_ff"]
    q = zeta + M["f_ff"]
    v_hat = ixf(iyc(M["dx_cf"] * v)) * M["inv_dx_fc"]
    q_at_u = weno5_upwind_centers_from_faces(q, v_hat, axis=-2)
    ke = 0.5 * (ixc(u * u) + iyc(v * v))
    Gu = q_at_u * v_hat - dxf(ke) * M["inv_dx_fc"]
    u_hat = iyf(ixc(M["dy_fc"] * u)) * M["inv_dy_cf"]
    q_at_v = weno5_upwind_centers_from_faces(q, u_hat, axis=-1)
    Gv = -q_at_v * u_hat - dyf(ke) * M["inv_dy_cf"]
    return Gu, Gv


def _pack(M):
    return jnp.stack([M["dy_cf"], M["dx_fc"], M["inv_az_ff"], M["f_ff"],
                      M["dx_cf"], M["inv_dx_fc"], M["dy_fc"], M["inv_dy_cf"]])


@pytest.mark.parametrize("dtype,rtol", [(jnp.float32, 2e-6),
                                        (jnp.float64, 1e-12)])
def test_momentum_adv_matches_xla(dtype, rtol):
    nz, Yb, Xb = 2, 96, 140
    u, v, M = _fields(nz, Yb, Xb, dtype)
    wu, wv = (np.asarray(a) for a in _xla_adv(u, v, M))
    gu, gv = momentum_pallas(u, v, _pack(M), interpret=True, block_rows=32)
    I = (slice(None), slice(5, Yb - 5), slice(5, Xb - 5))
    for want, got, nm in ((wu, np.asarray(gu), "Gu"), (wv, np.asarray(gv), "Gv")):
        np.testing.assert_allclose(want[I], got[I], rtol=rtol,
                                   atol=rtol * np.abs(want[I]).max(),
                                   err_msg=nm)


def test_momentum_fused_lap_drag():
    from orthogonalsphericalshellgrids_tpu.models.hydrostatic import _inv
    from orthogonalsphericalshellgrids_tpu.ops.closures import (
        laplacian_u, laplacian_v)

    dtype = jnp.float64
    nz, Yb, Xb = 2, 64, 76
    u, v, M = _fields(nz, Yb, Xb, dtype, seed=5)
    rng = np.random.default_rng(6)
    mask_u = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.15, dtype)
    mask_v = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.15, dtype)
    mask_c = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.15, dtype)
    bot_u = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.5, dtype)
    bot_v = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.5, dtype)
    mets2 = {n: jnp.asarray(1.0 + rng.random((Yb, Xb)), dtype)
             for n in ("dy_cc", "dx_cc", "dx_ff", "dy_ff", "az_fc", "az_cf")}
    nu, cd_dz = 11.0, 3e-3

    class G:  # grid stand-in for ops.closures
        pass

    g = G()
    for n, a in mets2.items():
        setattr(g, n, a)
    wu, wv = _xla_adv(u, v, M)
    wu = wu + nu * laplacian_u(g, u, mask_u, mask_c)
    wv = wv + nu * laplacian_v(g, v, mask_v, mask_c)
    sp_u = jnp.sqrt(u * u + ixf(iyc(v)) ** 2)
    sp_v = jnp.sqrt(v * v + iyf(ixc(u)) ** 2)
    wu = np.asarray(wu - cd_dz * sp_u * u * bot_u)
    wv = np.asarray(wv - cd_dz * sp_v * v * bot_v)

    def ratio(a, b):
        return a / b

    m_ff_u = mask_u * shift_m(mask_u, -2)
    m_ff_v = mask_v * shift_m(mask_v, -1)
    lay = jnp.stack([
        jnp.broadcast_to(nu * ratio(g.dy_cc, g.dx_cc), mask_c.shape) * mask_c,
        jnp.broadcast_to(nu * ratio(g.dx_ff, g.dy_ff), mask_c.shape) * m_ff_u,
        jnp.broadcast_to(_inv(g.az_fc), mask_u.shape) * mask_u,
        jnp.broadcast_to(nu * ratio(g.dy_ff, g.dx_ff), mask_c.shape) * m_ff_v,
        jnp.broadcast_to(nu * ratio(g.dx_cc, g.dy_cc), mask_c.shape) * mask_c,
        jnp.broadcast_to(_inv(g.az_cf), mask_v.shape) * mask_v,
        cd_dz * bot_u,
        cd_dz * bot_v,
    ], axis=1)  # (nz, 8, Yb, Xb)

    gu, gv = momentum_pallas(u, v, _pack(M), lay, has_lap=True, has_drag=True,
                             interpret=True, block_rows=32)
    I = (slice(None), slice(5, Yb - 5), slice(5, Xb - 5))
    np.testing.assert_allclose(wu[I], np.asarray(gu)[I], rtol=1e-12,
                               atol=1e-12 * np.abs(wu[I]).max(), err_msg="Gu")
    np.testing.assert_allclose(wv[I], np.asarray(gv)[I], rtol=1e-12,
                               atol=1e-12 * np.abs(wv[I]).max(), err_msg="Gv")


def test_momentum_block_invariance():
    u, v, M = _fields(1, 120, 60, jnp.float32, seed=9)
    a = momentum_pallas(u, v, _pack(M), interpret=True, block_rows=24)
    b = momentum_pallas(u, v, _pack(M), interpret=True, block_rows=104)
    I = (slice(None), slice(5, 115), slice(5, 55))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x)[I], np.asarray(y)[I],
                                   rtol=2e-6,
                                   atol=2e-6 * np.abs(np.asarray(x)[I]).max())


def test_single_layer_tendencies_kernel_path():
    """models/hydrostatic.tendencies through the Pallas kernels (momentum with
    fused mask/lap/drag + tracer with fused kappa_h) vs the XLA path, at
    contraction-band tolerance on the interior."""
    import dataclasses

    import orthogonalsphericalshellgrids_tpu as osg
    from orthogonalsphericalshellgrids_tpu.models import (
        SplitExplicitFreeSurface, initial_state, make_model)
    from orthogonalsphericalshellgrids_tpu.models import hydrostatic as H

    grid = osg.TripolarGrid.make((48, 40, 1), dtype=jnp.float64,
                                 first_pole_longitude=45.0,
                                 north_poles_latitude=35.0)

    def bottom(lam, phi):
        return np.where(phi < -78, 1.0, 0.0)

    model = make_model(grid, free_surface=SplitExplicitFreeSurface(substeps=8),
                       bottom_height=bottom, use_pallas=False, coriolis=True,
                       nu_h=50.0, kappa_h=20.0,
                       bottom_drag=("quadratic", 2.5e-3), tracers=("T", "S"))
    state = initial_state(
        model,
        u=lambda lam, phi: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        v=lambda lam, phi: 0.1 * np.sin(np.deg2rad(lam) * 3),
        c={"T": lambda lam, phi: np.sin(np.deg2rad(lam)),
           "S": lambda lam, phi: 35.0 + np.cos(np.deg2rad(phi))},
    )
    u = H._fill(grid, state.u, H.FC, -1)
    v = H._fill(grid, state.v, H.CF, -1)
    c = H._fill(grid, state.c, H.CC, 1)

    want = H.tendencies(model, u, v, c)
    got = H.tendencies(dataclasses.replace(model, use_pallas=True,
                                           tend_kernels=True), u, v, c)
    I2 = grid.interior2d
    for w, g_, nm in zip(want, got, ("Gu", "Gv", "Gc")):
        wi = np.asarray(w)[..., I2[0], I2[1]]
        gi = np.asarray(g_)[..., I2[0], I2[1]]
        np.testing.assert_allclose(wi, gi, rtol=1e-12,
                                   atol=1e-12 * np.abs(wi).max(), err_msg=nm)
