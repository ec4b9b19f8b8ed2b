"""Parity of the fused AB2 predictor/corrector/tracer-update kernel
(ops/pallas_corr.py, interpret mode) against the XLA formulation in
models/layered.py:layered_step."""

import numpy as np
import pytest

import jax.numpy as jnp

from orthogonalsphericalshellgrids_tpu.ops.pallas_corr import corrector_pallas


@pytest.mark.parametrize("dtype,rtol", [(jnp.float32, 2e-6),
                                        (jnp.float64, 1e-13)])
@pytest.mark.parametrize("block_rows", [None, 16])
def test_corrector_matches_xla(dtype, rtol, block_rows):
    nz, n_tr, Yb, Xb = 4, 3, 52, 72
    rng = np.random.default_rng(0)

    def r(shape):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    mu = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dtype)
    mv = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dtype)
    mc = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dtype)
    dz = tuple(40.0 * 1.3 ** k for k in range(nz))
    dz3 = jnp.asarray(dz, dtype).reshape(-1, 1, 1)
    dzu = dz3 * mu
    dzv = dz3 * mv
    u0, gu, guo = r((nz, Yb, Xb)) * mu, r((nz, Yb, Xb)), r((nz, Yb, Xb))
    v0, gv, gvo = r((nz, Yb, Xb)) * mv, r((nz, Yb, Xb)), r((nz, Yb, Xb))
    P = n_tr * nz
    c0, gc, gco = r((P, Yb, Xb)), r((P, Yb, Xb)), r((P, Yb, Xb))
    ihu = jnp.asarray(rng.random((Yb, Xb)), dtype) * (mu.max(0) > 0)
    ihv = jnp.asarray(rng.random((Yb, Xb)), dtype) * (mv.max(0) > 0)
    Ua, Va = r((Yb, Xb)), r((Yb, Xb))
    w1, w2, dt = 1.6, 0.6, 37.5

    # XLA formulation (models/layered.py:layered_step corrector block)
    gus = w1 * gu - w2 * guo
    gvs = w1 * gv - w2 * gvo
    u_star = (u0 + dt * gus) * mu
    v_star = (v0 + dt * gvs) * mv
    ubar = jnp.sum(u_star * dzu, axis=0) * ihu
    vbar = jnp.sum(v_star * dzv, axis=0) * ihv
    want_u = (u_star + (Ua * ihu - ubar)[None]) * mu
    want_v = (v_star + (Va * ihv - vbar)[None]) * mv
    mc_t = jnp.tile(mc, (n_tr, 1, 1))
    want_c = (c0 + dt * (w1 * gc - w2 * gco)) * mc_t

    got_u, got_v, got_c = corrector_pallas(
        u0, gu, guo, v0, gv, gvo, c0, gc, gco, dzu, dzv, mc,
        ihu, ihv, Ua, Va, w1, w2, dt, block_rows=block_rows, interpret=True)
    for name, a, b in zip(("u", "v", "c"), (got_u, got_v, got_c),
                          (want_u, want_v, want_c)):
        a = np.asarray(a)
        b = np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=rtol,
                                   atol=rtol * max(np.abs(b).max(), 1e-30),
                                   err_msg=name)
