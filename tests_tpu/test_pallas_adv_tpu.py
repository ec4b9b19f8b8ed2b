"""Compiled (interpret=False) Mosaic parity for the tracer-advection window
kernel (ops/pallas_adv.py) — the DEFAULT layered TPU tendency path
(models/layered.py). The CPU suite pins it only in interpret mode, which does
not exercise the Mosaic lowering (alignment, double-buffered async copies);
this lane runs the real thing on the chip (round-4 verdict item 1).

Reference context: the kernel implements the hot tracer loop of
/root/reference/examples/bickley_jet.jl:48 (SURVEY.md §3.4).
"""

import numpy as np

import jax
import jax.numpy as jnp

from orthogonalsphericalshellgrids_tpu.ops.advection import (
    weno5_upwind_faces_from_centers)
from orthogonalsphericalshellgrids_tpu.ops.operators import dxc, dxf, dyc, dyf
from orthogonalsphericalshellgrids_tpu.ops.pallas_adv import (
    pack_adv_statics, tracer_adv_pallas)


def _mk(P, nz, Yb, Xb, seed=0):
    rng = np.random.default_rng(seed)
    c = jnp.asarray(rng.standard_normal((P, Yb, Xb)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), jnp.float32)
    au = jnp.asarray(1.0 + rng.random((nz, Yb, Xb)), jnp.float32)
    av = jnp.asarray(1.0 + rng.random((nz, Yb, Xb)), jnp.float32)
    iv = jnp.asarray(rng.random((nz, Yb, Xb)), jnp.float32)
    return c, u, v, au, av, iv


def _xla_adv(c, u, v, au, av, iv):
    nz = u.shape[0]
    c4 = c.reshape(c.shape[0] // nz, nz, *c.shape[-2:])
    cx = weno5_upwind_faces_from_centers(c4, u, axis=-1)
    cy = weno5_upwind_faces_from_centers(c4, v, axis=-2)
    return np.asarray((-(dxc(u * au * cx) + dyc(v * av * cy)) * iv)
                      .reshape(c.shape))


def test_tracer_adv_compiled_multiwindow():
    """Multi-window double-buffered pipeline (block_rows < Yb) on the chip."""
    P, nz, Yb, Xb = 4, 2, 120, 140
    c, u, v, au, av, iv = _mk(P, nz, Yb, Xb)
    want = _xla_adv(c, u, v, au, av, iv)
    got = np.asarray(jax.jit(lambda *a: tracer_adv_pallas(*a, block_rows=48))(
        c, u, v, au, av, iv))
    I = (slice(None), slice(4, Yb - 4), slice(4, Xb - 4))
    np.testing.assert_allclose(want[I], got[I], rtol=2e-6,
                               atol=2e-6 * np.abs(want[I]).max())


def test_tracer_adv_compiled_packed_fused_kappa():
    """Single-window case with the model-build statics pack AND the fused
    kappa_h Laplacian planes — the exact configuration the layered benchmark
    ships (pack_adv_statics layout, S = 6)."""
    P, nz, Yb, Xb = 4, 2, 56, 140
    c, u, v, au, av, iv = _mk(P, nz, Yb, Xb, seed=5)
    rng = np.random.default_rng(11)
    ku = jnp.asarray(rng.random((nz, Yb, Xb)), jnp.float32)
    kv = jnp.asarray(rng.random((nz, Yb, Xb)), jnp.float32)
    kc = jnp.asarray(rng.random((nz, Yb, Xb)), jnp.float32)

    want = _xla_adv(c, u, v, au, av, iv)
    c4 = c.reshape(P // nz, nz, Yb, Xb)
    gx = dxf(c4) * ku
    gy = dyf(c4) * kv
    want = want + np.asarray(
        ((dxc(gx) + dyc(gy)) * kc).reshape(c.shape))

    pack = pack_adv_statics(au, av, iv, ku, kv, kc)
    got = np.asarray(jax.jit(
        lambda c_, u_, v_, p_: tracer_adv_pallas(
            c_, u_, v_, statics_packed=p_))(c, u, v, pack))
    I = (slice(None), slice(4, Yb - 4), slice(4, Xb - 4))
    np.testing.assert_allclose(want[I], got[I], rtol=2e-6,
                               atol=2e-6 * np.abs(want[I]).max())


def test_tracer_adv_compiled_layered_mode():
    """Compiled LAYERED mode (v3): global dy_fc/dx_cf flux planes cached per
    row block + static dz, per-layer slab [IV, K_u, K_v, K_c] — the layered
    benchmark's exact configuration. u/v pre-masked (the mode's contract)."""
    from orthogonalsphericalshellgrids_tpu.ops.pallas_adv import (
        pack_adv_statics_layered)

    P, nz, Yb, Xb = 4, 2, 120, 140
    rng = np.random.default_rng(9)
    mu = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, jnp.float32)
    mv = jnp.asarray(rng.random((nz, Yb, Xb)) > 0.2, jnp.float32)
    u = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), jnp.float32) * mu
    v = jnp.asarray(rng.standard_normal((nz, Yb, Xb)), jnp.float32) * mv
    c = jnp.asarray(rng.standard_normal((P, Yb, Xb)), jnp.float32)
    dy = jnp.asarray(0.5 + rng.random((Yb, Xb)), jnp.float32)
    dx = jnp.asarray(0.5 + rng.random((Yb, Xb)), jnp.float32)
    iv = jnp.asarray(rng.random((nz, Yb, Xb)), jnp.float32)
    ku = jnp.asarray(rng.random((nz, Yb, Xb)), jnp.float32)
    kv = jnp.asarray(rng.random((nz, Yb, Xb)), jnp.float32)
    kc = jnp.asarray(rng.random((nz, Yb, Xb)), jnp.float32)
    dz = (40.0, 55.0)
    dz3 = jnp.asarray(dz, jnp.float32).reshape(-1, 1, 1)

    # oracle: the COLUMN-mode formulation with Au = dz*dy (u masked)
    want = _xla_adv(c, u, v, dz3 * dy, dz3 * dx, iv)
    c4 = c.reshape(P // nz, nz, Yb, Xb)
    gx = dxf(c4) * ku
    gy = dyf(c4) * kv
    want = want + np.asarray(((dxc(gx) + dyc(gy)) * kc).reshape(c.shape))

    pack = pack_adv_statics_layered(iv, ku, kv, kc)
    gp = jnp.stack([dy, dx])
    got = np.asarray(jax.jit(
        lambda c_, u_, v_, p_, g_: tracer_adv_pallas(
            c_, u_, v_, statics_packed=p_, g_pack=g_, dz=dz,
            block_rows=48))(c, u, v, pack, gp))
    I = (slice(None), slice(4, Yb - 4), slice(4, Xb - 4))
    np.testing.assert_allclose(want[I], got[I], rtol=2e-6,
                               atol=2e-6 * np.abs(want[I]).max())
