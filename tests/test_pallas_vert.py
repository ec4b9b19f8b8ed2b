"""Parity of the z-resident vertical column kernel (ops/pallas_vert.py,
interpret mode) against the XLA formulation in models/layered.py — the layer-
coupled vertical terms the kernel replaces on the layered TPU path: interface
velocity w, advective w-transport of u/v, Centered vertical tracer flux,
explicit vertical Laplacians, and the EOS -> hydrostatic pressure gradient.

Bands, not bitwise: the kernel's sequential in-VMEM layer sums reassociate
XLA's cumsum, and the 1/dzc prefactoring reassociates the divisions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orthogonalsphericalshellgrids_tpu.models.layered import (
    _hydrostatic_pressure, _vertical_laplacian, _vertical_tracer_div, _w_advect)
from orthogonalsphericalshellgrids_tpu.ops.operators import dxc, dxf, dyc, dyf, ixf, iyf
from orthogonalsphericalshellgrids_tpu.ops.pallas_vert import (
    pack_vert_statics, vertical_pallas)


def _mk(nz, n_tr, Yb, Xb, dtype, seed=0):
    rng = np.random.default_rng(seed)

    def r(shape, lo=0.0, hi=1.0):
        return jnp.asarray(lo + (hi - lo) * rng.random(shape), dtype)

    mc = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dtype)
    mu = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dtype)
    mv = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dtype)
    # kernel contract: u/v are MASKED prognostics (zero on land)
    u = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), dtype) * mu
    v = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), dtype) * mv
    c = jnp.asarray(rng.standard_normal((n_tr * nz, Yb, Xb)), dtype)
    dy_fc = r((Yb, Xb), 0.5, 1.5)
    dx_cf = r((Yb, Xb), 0.5, 1.5)
    dz = tuple(50.0 * 1.5 ** k for k in range(nz))
    dzc = tuple(0.5 * (dz[k] + dz[k + 1]) for k in range(nz - 1))
    dz3 = jnp.asarray(dz, dtype).reshape(-1, 1, 1)
    au = dz3 * mu * dy_fc   # what the XLA formulation carries (dzu * dy_fc)
    av = dz3 * mv * dx_cf
    iaz = r((Yb, Xb), 0.5, 1.5)
    idx = r((Yb, Xb), 0.5, 1.5)
    idy = r((Yb, Xb), 0.5, 1.5)
    return u, v, c, au, av, mc, mu, mv, iaz, idx, idy, dy_fc, dx_cf, dz, dzc


def _w_full(u, v, au, av, iaz):
    hdiv = (dxc(au * u) + dyc(av * v)) * iaz
    below = jax.lax.cumsum(hdiv, axis=0, reverse=True)
    return jnp.concatenate([-below, jnp.zeros_like(hdiv[:1])], axis=0)


def _xla_ref(u, v, c, au, av, mc, mu, mv, iaz, idx, idy, dz, dzc, *,
             mode, nu_v, kappa_v, eos):
    nz = u.shape[0]
    n_tr = c.shape[0] // nz
    dz3 = jnp.asarray(dz, u.dtype).reshape(-1, 1, 1)
    dzc3 = jnp.asarray(dzc, u.dtype).reshape(-1, 1, 1)
    w = _w_full(u, v, au, av, iaz)
    dgu = -_w_advect(ixf(w), u, dzc3)
    dgv = -_w_advect(iyf(w), v, dzc3)
    if nu_v > 0.0:
        dgu = dgu + nu_v * _vertical_laplacian(u, dz3, dzc3, mu)
        dgv = dgv + nu_v * _vertical_laplacian(v, dz3, dzc3, mv)
    if mode != "none":
        g_b, alpha, beta, T0, S0 = eos
        c4 = c.reshape(n_tr, nz, *c.shape[-2:])
        if mode == "linear_eos":
            b = g_b * (alpha * (c4[0] - T0) - beta * (c4[1] - S0)) * mc
        else:
            b = c4[-1]
        p = _hydrostatic_pressure(b, dz3)
        dgu = dgu - dxf(p) * idx
        dgv = dgv - dyf(p) * idy
    c4 = c.reshape(n_tr, nz, *c.shape[-2:])
    G = _vertical_tracer_div(w, c4, dz3)
    if kappa_v > 0.0:
        G = G + kappa_v * _vertical_laplacian(c4, dz3, dzc3, mc)
    dgc = (G * mc).reshape(c.shape)
    return dgu, dgv, dgc


@pytest.mark.parametrize("dtype,rtol", [(jnp.float32, 3e-6),
                                        (jnp.float64, 1e-12)])
@pytest.mark.parametrize("block_rows", [None, 24])
def test_vertical_matches_xla_full_config(dtype, rtol, block_rows):
    """Full benchmark configuration: linear EOS (T/S), explicit nu_v/kappa_v."""
    nz, n_tr, Yb, Xb = 4, 2, 72, 96
    u, v, c, au, av, mc, mu, mv, iaz, idx, idy, dy_fc, dx_cf, dz, dzc = _mk(
        nz, n_tr, Yb, Xb, dtype)
    eos = (9.81, 1.67e-4, 7.8e-4, 10.0, 35.0)
    kw = dict(mode="linear_eos", nu_v=1e-3, kappa_v=1e-5, eos=eos)
    want = _xla_ref(u, v, c, au, av, mc, mu, mv, iaz, idx, idy, dz, dzc, **kw)
    spack = pack_vert_statics(mc, mu, mv)
    gpack = jnp.stack([iaz, idx, idy, dy_fc, dx_cf])
    got = vertical_pallas(u, v, c, spack, gpack, dz=dz, dzc=dzc,
                          mode="linear_eos", g_b=eos[0], alpha=eos[1],
                          beta=eos[2], T0=eos[3], S0=eos[4], it_T=0, it_S=1,
                          nu_v=1e-3, kappa_v=1e-5, block_rows=block_rows,
                          interpret=True)
    I = (slice(None), slice(1, Yb - 1), slice(1, Xb - 1))
    for name, a, b in zip(("dGu", "dGv", "dGc"), got, want):
        a = np.asarray(a)[I]
        b = np.asarray(b)[I]
        np.testing.assert_allclose(a, b, rtol=rtol,
                                   atol=rtol * max(np.abs(b).max(), 1e-30),
                                   err_msg=name)


def test_vertical_matches_xla_tracer_b():
    """Prognostic-buoyancy mode: b rides as the LAST tracer block and sources
    the pressure directly; no u/v masks (S=1), no explicit mixing."""
    dtype = jnp.float64
    nz, n_tr, Yb, Xb = 3, 2, 40, 64  # tracer block 0 = c, block 1 = b
    u, v, c, au, av, mc, mu, mv, iaz, idx, idy, dy_fc, dx_cf, dz, dzc = _mk(
        nz, n_tr, Yb, Xb, dtype, seed=7)
    eos = (9.81, 0.0, 0.0, 0.0, 0.0)
    want = _xla_ref(u, v, c, au, av, mc, mu, mv, iaz, idx, idy, dz, dzc,
                    mode="tracer_b", nu_v=0.0, kappa_v=0.0, eos=eos)
    spack = pack_vert_statics(mc)
    gpack = jnp.stack([iaz, idx, idy, dy_fc, dx_cf])
    got = vertical_pallas(u, v, c, spack, gpack, dz=dz, dzc=dzc,
                          mode="tracer_b", it_B=1, interpret=True)
    I = (slice(None), slice(1, Yb - 1), slice(1, Xb - 1))
    for name, a, b in zip(("dGu", "dGv", "dGc"), got, want):
        a = np.asarray(a)[I]
        b = np.asarray(b)[I]
        np.testing.assert_allclose(a, b, rtol=1e-12,
                                   atol=1e-12 * max(np.abs(b).max(), 1e-30),
                                   err_msg=name)


def test_vertical_no_buoyancy_single_tracer():
    """mode='none', one tracer, no mixing — the minimal configuration."""
    dtype = jnp.float64
    nz, n_tr, Yb, Xb = 5, 1, 48, 64
    u, v, c, au, av, mc, mu, mv, iaz, idx, idy, dy_fc, dx_cf, dz, dzc = _mk(
        nz, n_tr, Yb, Xb, dtype, seed=3)
    want = _xla_ref(u, v, c, au, av, mc, mu, mv, iaz, idx, idy, dz, dzc,
                    mode="none", nu_v=0.0, kappa_v=0.0, eos=None)
    spack = pack_vert_statics(mc)
    gpack = jnp.stack([iaz, idx, idy, dy_fc, dx_cf])
    got = vertical_pallas(u, v, c, spack, gpack, dz=dz, dzc=dzc,
                          interpret=True, block_rows=16)
    I = (slice(None), slice(1, Yb - 1), slice(1, Xb - 1))
    for name, a, b in zip(("dGu", "dGv", "dGc"), got, want):
        a = np.asarray(a)[I]
        b = np.asarray(b)[I]
        np.testing.assert_allclose(a, b, rtol=1e-12,
                                   atol=1e-12 * max(np.abs(b).max(), 1e-30),
                                   err_msg=name)
