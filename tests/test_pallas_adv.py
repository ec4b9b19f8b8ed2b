"""VMEM-resident tracer-advection kernel parity (interpret mode on CPU).

ops/pallas_adv.tracer_adv_pallas must reproduce the XLA tracer x+y slice of
models/layered.layered_tendencies (same `_weno5_left`, same op order, shifts as
rolls) on every cell with full stencil validity. The kernel consumes the
PREFACTORED static planes A_u = dzu*dy_fc, A_v = dzv*dx_cf — the product is
associated once at model build instead of per step, so the pin against the
literal model expression `u * dzu * dy_fc * cx` allows 1-ulp association
rounding; the pin against the same-association XLA form is bitwise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orthogonalsphericalshellgrids_tpu.ops.advection import (
    weno5_upwind_faces_from_centers)
from orthogonalsphericalshellgrids_tpu.ops.operators import dxc, dyc
from orthogonalsphericalshellgrids_tpu.ops.pallas_adv import tracer_adv_pallas


def _mk(P, nz, Yb, Xb, dtype, seed=0):
    rng = np.random.default_rng(seed)
    c = jnp.asarray(rng.standard_normal((P, Yb, Xb)), dtype)
    u = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), dtype)
    v = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), dtype)
    au = jnp.asarray(1.0 + rng.random((nz, Yb, Xb)), dtype)
    av = jnp.asarray(1.0 + rng.random((nz, Yb, Xb)), dtype)
    iv = jnp.asarray(rng.random((nz, Yb, Xb)), dtype)
    return c, u, v, au, av, iv


def _xla_ref(c, u, v, au, av, iv, nz):
    # same association as the kernel (prefactored au/av), XLA rolls
    P = c.shape[0]
    c4 = c.reshape(P // nz, nz, *c.shape[1:])
    cx = weno5_upwind_faces_from_centers(c4, u, axis=-1)
    cy = weno5_upwind_faces_from_centers(c4, v, axis=-2)
    fx = u * au * cx
    fy = v * av * cy
    return (-(dxc(fx) + dyc(fy)) * iv).reshape(c.shape)


@pytest.mark.parametrize("dtype,rtol", [(jnp.float32, 2e-6),
                                        (jnp.float64, 1e-13)])
@pytest.mark.parametrize("P,nz,Yb,Xb", [(4, 2, 40, 52), (3, 3, 96, 140)])
def test_tracer_adv_matches_xla(P, nz, Yb, Xb, dtype, rtol):
    # identical op order and association; residual band is FMA-contraction
    # noise between the two compiled programs (same class as the barotropic
    # kernel pin in test_pallas.py and docs/parity.md row L10)
    c, u, v, au, av, iv = _mk(P, nz, Yb, Xb, dtype)
    want = np.asarray(_xla_ref(c, u, v, au, av, iv, nz))
    got = np.asarray(jax.jit(lambda *a: tracer_adv_pallas(
        *a, interpret=True, block_rows=32))(c, u, v, au, av, iv))
    I = (slice(None), slice(4, Yb - 4), slice(4, Xb - 4))
    # atol floor scaled to the field magnitude: near-zero tendency cells make a
    # pure-relative bound meaningless under contraction noise
    np.testing.assert_allclose(want[I], got[I], rtol=rtol,
                               atol=rtol * np.abs(want[I]).max())


def test_tracer_adv_matches_model_slice():
    """Against the literal layered-model expression (u * dzu * dy_fc * cx):
    association-only difference, pinned at a tight relative band."""
    dtype = jnp.float64
    P, nz, Yb, Xb = 4, 2, 48, 64
    c, u, v, _, _, iv = _mk(P, nz, Yb, Xb, dtype, seed=3)
    rng = np.random.default_rng(4)
    dzu = jnp.asarray(1.0 + rng.random((nz, Yb, Xb)), dtype)
    dzv = jnp.asarray(1.0 + rng.random((nz, Yb, Xb)), dtype)
    dy_fc = jnp.asarray(1.0 + rng.random((Yb, Xb)), dtype)
    dx_cf = jnp.asarray(1.0 + rng.random((Yb, Xb)), dtype)

    c4 = c.reshape(P // nz, nz, Yb, Xb)
    cx = weno5_upwind_faces_from_centers(c4, u, axis=-1)
    cy = weno5_upwind_faces_from_centers(c4, v, axis=-2)
    fx = u * dzu * dy_fc * cx
    fy = v * dzv * dx_cf * cy
    want = np.asarray((-(dxc(fx) + dyc(fy)) * iv).reshape(c.shape))

    got = np.asarray(tracer_adv_pallas(c, u, v, dzu * dy_fc, dzv * dx_cf, iv,
                                       interpret=True, block_rows=32))
    I = (slice(None), slice(4, Yb - 4), slice(4, Xb - 4))
    np.testing.assert_allclose(want[I], got[I], rtol=1e-12,
                               atol=1e-12 * np.abs(want[I]).max())


def test_tracer_adv_row_block_invariance():
    """Block decomposition must not change values (window overlap discards)."""
    c, u, v, au, av, iv = _mk(2, 2, 120, 60, jnp.float32, seed=7)
    a = np.asarray(tracer_adv_pallas(c, u, v, au, av, iv, interpret=True,
                                     block_rows=24))
    b = np.asarray(tracer_adv_pallas(c, u, v, au, av, iv, interpret=True,
                                     block_rows=104))
    I = (slice(None), slice(4, 116), slice(4, 56))
    # different window widths compile to different programs -> contraction band
    np.testing.assert_allclose(a[I], b[I], rtol=2e-6,
                               atol=2e-6 * np.abs(a[I]).max())


def test_tracer_adv_fused_diffusion():
    """Fused kappa_h Laplacian (k_u/k_v/k_c planes) vs the XLA closure path."""
    from orthogonalsphericalshellgrids_tpu.models.hydrostatic import _inv

    dtype = jnp.float64
    P, nz, Yb, Xb = 4, 2, 48, 64
    c, u, v, au, av, iv = _mk(P, nz, Yb, Xb, dtype, seed=11)
    rng = np.random.default_rng(12)
    mu = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dtype)
    mv = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dtype)
    mc = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dtype)
    ru = jnp.asarray(1.0 + rng.random((Yb, Xb)), dtype)
    rv = jnp.asarray(1.0 + rng.random((Yb, Xb)), dtype)
    az = jnp.asarray(1.0 + rng.random((Yb, Xb)), dtype)
    kappa = 37.5

    # XLA reference: advection + kappa * laplacian with the same factoring
    adv = _xla_ref(c, u, v, au, av, iv, nz)
    c4 = c.reshape(P // nz, nz, Yb, Xb)
    from orthogonalsphericalshellgrids_tpu.ops.operators import (dxf, dyf)
    gx = dxf(c4) * (kappa * ru * mu)
    gy = dyf(c4) * (kappa * rv * mv)
    lap = (dxc(gx) + dyc(gy)) * (_inv(az) * mc)
    want = np.asarray(adv + lap.reshape(c.shape))

    got = np.asarray(tracer_adv_pallas(
        c, u, v, au, av, iv,
        kappa * ru * mu, kappa * rv * mv, _inv(az) * mc,
        interpret=True, block_rows=32))
    I = (slice(None), slice(4, Yb - 4), slice(4, Xb - 4))
    np.testing.assert_allclose(want[I], got[I], rtol=1e-12,
                               atol=1e-12 * np.abs(want[I]).max())
