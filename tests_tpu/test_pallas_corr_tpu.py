"""Compiled (interpret=False) Mosaic parity for the fused predictor/corrector
kernel (ops/pallas_corr.py) — the default layered TPU glue path."""

import numpy as np

import jax
import jax.numpy as jnp

from orthogonalsphericalshellgrids_tpu.ops.pallas_corr import corrector_pallas


def test_corrector_compiled_matches_interpret():
    nz, n_tr, Yb, Xb = 3, 2, 120, 140
    rng = np.random.default_rng(5)
    dt_ = jnp.float32

    def r(shape):
        return jnp.asarray(rng.standard_normal(shape), dt_)

    mu = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dt_)
    mv = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dt_)
    mc = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dt_)
    dz3 = jnp.asarray([40.0, 52.0, 67.6], dt_).reshape(-1, 1, 1)
    dzu, dzv = dz3 * mu, dz3 * mv
    P = n_tr * nz
    args = (r((nz, Yb, Xb)) * mu, r((nz, Yb, Xb)), r((nz, Yb, Xb)),
            r((nz, Yb, Xb)) * mv, r((nz, Yb, Xb)), r((nz, Yb, Xb)),
            r((P, Yb, Xb)), r((P, Yb, Xb)), r((P, Yb, Xb)),
            dzu, dzv, mc,
            jnp.asarray(rng.random((Yb, Xb)), dt_),
            jnp.asarray(rng.random((Yb, Xb)), dt_),
            r((Yb, Xb)), r((Yb, Xb)))
    kw = dict(w1=1.6, w2=0.6, dt=37.5, block_rows=48)
    want = corrector_pallas(*args, interpret=True, **kw)
    got = jax.jit(lambda *a: corrector_pallas(*a, **kw))(*args)
    for name, a, b in zip(("u", "v", "c"), got, want):
        a = np.asarray(a)
        b = np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=2e-6,
                                   atol=2e-6 * max(np.abs(b).max(), 1e-30),
                                   err_msg=name)
