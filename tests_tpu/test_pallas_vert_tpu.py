"""Compiled (interpret=False) Mosaic parity for the z-resident vertical column
kernel (ops/pallas_vert.py) — the DEFAULT layered TPU path for every
layer-coupled vertical term (models/layered.py:layered_tendencies). Interpret
mode does not exercise the cross-program double-buffered DMA pipeline; this
lane runs the real lowering on the chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orthogonalsphericalshellgrids_tpu.ops.pallas_vert import (
    pack_vert_statics, vertical_pallas)


def _mk(nz, n_tr, Yb, Xb, seed=0):
    rng = np.random.default_rng(seed)
    dt = jnp.float32

    def r(shape, lo=0.0, hi=1.0):
        return jnp.asarray(lo + (hi - lo) * rng.random(shape), dt)

    mc = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dt)
    mu = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dt)
    mv = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, dt)
    # kernel contract: u/v are MASKED prognostics (zero on land)
    u = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), dt) * mu
    v = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), dt) * mv
    c = jnp.asarray(rng.standard_normal((n_tr * nz, Yb, Xb)), dt)
    gpack = jnp.stack([r((Yb, Xb), 0.5, 1.5) for _ in range(5)])
    dz = tuple(50.0 * 1.5 ** k for k in range(nz))
    dzc = tuple(0.5 * (dz[k] + dz[k + 1]) for k in range(nz - 1))
    return u, v, c, mc, mu, mv, gpack, dz, dzc


@pytest.mark.parametrize("block_rows", [None, 24])
def test_vertical_compiled_matches_interpret(block_rows):
    """Compiled Mosaic kernel (cross-program pipelined DMA) vs interpret mode,
    full benchmark configuration (linear EOS + explicit nu_v/kappa_v), both
    single-window (block_rows=None at this size) and multi-window geometry."""
    nz, n_tr, Yb, Xb = 4, 2, 120, 140
    u, v, c, mc, mu, mv, gpack, dz, dzc = _mk(nz, n_tr, Yb, Xb)
    spack = pack_vert_statics(mc, mu, mv)
    kw = dict(dz=dz, dzc=dzc, mode="linear_eos", g_b=9.81, alpha=1.67e-4,
              beta=7.8e-4, T0=10.0, S0=35.0, it_T=0, it_S=1,
              nu_v=1e-3, kappa_v=1e-5, block_rows=block_rows)
    want = vertical_pallas(u, v, c, spack, gpack, interpret=True, **kw)
    got = jax.jit(lambda *a: vertical_pallas(*a, **kw))(u, v, c, spack, gpack)
    I = (slice(None), slice(1, Yb - 1), slice(1, Xb - 1))
    for name, a, b in zip(("dGu", "dGv", "dGc"), got, want):
        a = np.asarray(a)[I]
        b = np.asarray(b)[I]
        np.testing.assert_allclose(a, b, rtol=2e-6,
                                   atol=2e-6 * max(np.abs(b).max(), 1e-30),
                                   err_msg=name)
