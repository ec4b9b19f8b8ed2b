"""Compiled (interpret=False) Mosaic parity for the vector-invariant momentum
window kernel (ops/pallas_mom.py) — the DEFAULT layered TPU momentum path
(models/layered.py). Interpret mode does not exercise the Mosaic lowering;
this lane runs the real thing on the chip (round-4 verdict item 1).

Reference context: the kernel implements the hot momentum loop of
/root/reference/examples/bickley_jet.jl:49 (SURVEY.md §3.4).
"""

import numpy as np

import jax
import jax.numpy as jnp

from orthogonalsphericalshellgrids_tpu.ops.pallas_mom import momentum_pallas


def _fields(nz, Yb, Xb, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), jnp.float32)
    M = jnp.asarray(1.0 + rng.random((8, Yb, Xb)), jnp.float32)
    return u, v, M


def test_momentum_compiled_multiwindow_fused():
    """Multi-window pipeline with fused Laplacian + quadratic drag vs the
    interpret-mode run of the SAME kernel (pins the Mosaic lowering; the math
    itself is pinned against the XLA formulation in tests/test_pallas_mom.py)."""
    nz, Yb, Xb = 2, 120, 140
    u, v, M = _fields(nz, Yb, Xb, seed=3)
    rng = np.random.default_rng(3)
    lay = jnp.asarray(rng.random((nz, 8, Yb, Xb)), jnp.float32)

    wu, wv = momentum_pallas(u, v, M, lay, has_lap=True, has_drag=True,
                             interpret=True, block_rows=48)
    gu, gv = jax.jit(lambda *a: momentum_pallas(
        *a, has_lap=True, has_drag=True, block_rows=48))(u, v, M, lay)
    I = (slice(None), slice(5, Yb - 5), slice(5, Xb - 5))
    for want, got in ((wu, gu), (wv, gv)):
        w = np.asarray(want)[I]
        np.testing.assert_allclose(w, np.asarray(got)[I], rtol=2e-6,
                                   atol=2e-6 * np.abs(w).max())


def test_momentum_compiled_single_window_plain():
    """Single-window (circular-roll) case, advective terms only — the strip-view
    geometry the overlap split hands the kernel on sharded runs."""
    nz, Yb, Xb = 3, 40, 140
    u, v, M = _fields(nz, Yb, Xb, seed=9)
    wu, wv = momentum_pallas(u, v, M, interpret=True)
    gu, gv = jax.jit(momentum_pallas)(u, v, M)
    I = (slice(None), slice(5, Yb - 5), slice(5, Xb - 5))
    for want, got in ((wu, gu), (wv, gv)):
        w = np.asarray(want)[I]
        np.testing.assert_allclose(w, np.asarray(got)[I], rtol=2e-6,
                                   atol=2e-6 * np.abs(w).max())


def test_momentum_compiled_acc_mask_fold():
    """Compiled lane for the opt-in acc/mask-out operands (OSG_ACC_FOLD=1 —
    measured negative result, benchmarks/ab_acc_fold.py; lowering still pinned
    so the opt-in stays usable): dG accumulation + closing mask multiply
    in-window vs the same additions/multiplies around the plain kernel."""
    nz, Yb, Xb = 2, 120, 140
    u, v, M = _fields(nz, Yb, Xb, seed=5)
    rng = np.random.default_rng(5)
    lay = jnp.asarray(rng.random((nz, 8, Yb, Xb)), jnp.float32)
    au = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), jnp.float32)
    av = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), jnp.float32)
    mu = jnp.asarray((rng.random((nz, Yb, Xb)) > 0.3).astype(np.float32))
    mv = jnp.asarray((rng.random((nz, Yb, Xb)) > 0.3).astype(np.float32))

    pu, pv = momentum_pallas(u, v, M, lay, has_lap=True, has_drag=True,
                             interpret=True, block_rows=48)
    want_u, want_v = (pu + au) * mu, (pv + av) * mv
    gu, gv = jax.jit(lambda *a: momentum_pallas(
        a[0], a[1], a[2], a[3], has_lap=True, has_drag=True,
        acc=(a[4], a[5]), mask_out=(a[6], a[7]), block_rows=48))(
        u, v, M, lay, au, av, mu, mv)
    I = (slice(None), slice(5, Yb - 5), slice(5, Xb - 5))
    for want, got in ((want_u, gu), (want_v, gv)):
        w = np.asarray(want)[I]
        np.testing.assert_allclose(w, np.asarray(got)[I], rtol=2e-6,
                                   atol=2e-6 * np.abs(w).max())
