"""Pallas TPU kernel: fused AB2 predictor + split-explicit corrector + tracer
update for the layered step — the post-barotropic "glue" slice.

The XLA chain materializes several full (Nz, Y, X) intermediates through HBM
(`models/layered.py:layered_step`): the AB2-extrapolated tendencies, the
predictor ``u_star``/``v_star``, and the masked updates. Everything here is
POINTWISE in the horizontal (the only cross-element coupling is the per-column
depth sum of the corrector), so the kernel is a plain row-blocked pipeline with
ZERO window overlap — each operand row-block is streamed exactly once:

    u_star = (u0 + dt (w1 Gu − w2 Gu_old)) · mask_u
    ubar   = Σ_k u_star_k dzu_k · inv_h_u
    u_new  = (u_star + (U_a · inv_h_u − ubar)) · mask_u        [corrector]
    c_new  = (c0 + dt (w1 Gc − w2 Gc_old)) · mask_c            [tracers + b]

mask_u is recovered exactly as ``dzu_k != 0`` (dzu is the only mask carrier
the kernel streams). AB2 weights and dt ride as scalar-prefetch operands
(w1/w2 are traced — they switch on iteration 0). The vertical-implicit
configurations bypass this kernel (the Thomas solve stays XLA).

Parity pinned in tests/test_pallas_corr.py (contraction band — FMA formation
differs between the fused XLA chain and the kernel) and compiled on the chip
in tests_tpu/test_pallas_corr_tpu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["corrector_pallas", "DEFAULT_BLOCK_ROWS_CORR"]

DEFAULT_BLOCK_ROWS_CORR = 64


def _kernel(scal_ref, u0, gu, guo, v0, gv, gvo, c0, gc, gco,
            dzu_ref, dzv_ref, mc_ref, g2_ref,
            un_out, vn_out, cn_out, *, nz, P):
    w1 = scal_ref[0]
    w2 = scal_ref[1]
    dt = scal_ref[2]

    IHU, IHV, UA, VA = 0, 1, 2, 3
    ihu = g2_ref[IHU]
    ihv = g2_ref[IHV]
    Ubar = g2_ref[UA] * ihu
    Vbar = g2_ref[VA] * ihv

    ub = None
    vb = None
    ustars = []
    vstars = []
    for k in range(nz):
        # EXACT 0/1 masks recovered from the thickness carrier (dzu = dz*mask):
        # a reciprocal multiply would give 1±ulp and contaminate wet cells
        mu = jnp.where(dzu_ref[k] != 0.0, 1.0, 0.0).astype(dzu_ref.dtype)
        mv = jnp.where(dzv_ref[k] != 0.0, 1.0, 0.0).astype(dzv_ref.dtype)
        us = (u0[k] + dt * (w1 * gu[k] - w2 * guo[k])) * mu
        vs = (v0[k] + dt * (w1 * gv[k] - w2 * gvo[k])) * mv
        ustars.append((us, mu))
        vstars.append((vs, mv))
        ub = us * dzu_ref[k] if ub is None else ub + us * dzu_ref[k]
        vb = vs * dzv_ref[k] if vb is None else vb + vs * dzv_ref[k]
    du = Ubar - ub * ihu
    dv = Vbar - vb * ihv
    for k in range(nz):
        us, mu = ustars[k]
        vs, mv = vstars[k]
        un_out[k] = (us + du) * mu
        vn_out[k] = (vs + dv) * mv

    n_tr = P // nz
    for t in range(n_tr):
        for k in range(nz):
            i = t * nz + k
            cn_out[i] = (c0[i] + dt * (w1 * gc[i] - w2 * gco[i])) * mc_ref[k]


def corrector_pallas(u0, gu, gu_old, v0, gv, gv_old, c0, gc, gc_old,
                     dzu, dzv, mask_c, inv_h_u, inv_h_v, Ua, Va,
                     w1, w2, dt, *, block_rows=None, interpret=False):
    """Fused AB2 predictor + corrector + tracer update; returns
    (u_new, v_new, c_new). ``c0/gc/gc_old``: (P, Yb, Xb) tracer-major stacks
    (the prognostic b, when present, rides as extra tracer planes).
    ``Ua``/``Va``: the barotropic averages CROPPED to the base layout.
    The u/v masks are recovered exactly from the thickness carriers
    (mask = dzu != 0), so no extra mask planes are streamed."""
    nz, Yb, Xb = u0.shape
    P = c0.shape[0]
    assert P % nz == 0, (P, nz)
    Yb8 = -8 * (-Yb // 8)
    Xb_pad = -128 * (-Xb // 128)
    n_in = 6 * nz + 3 * P + 3 * nz + 4
    n_out = 2 * nz + P
    if block_rows is None:
        # largest multiple of 8 whose double-buffered block set fits the
        # device VMEM budget (automatic pipelining double-buffers every
        # blocked operand AND output)
        from .pallas_baro import _device_vmem_budget

        budget = _device_vmem_budget()
        per_row = 2 * (n_in + n_out) * Xb_pad * jnp.dtype(u0.dtype).itemsize
        B = max(8, min(DEFAULT_BLOCK_ROWS_CORR, 8 * (budget // per_row // 8)))
    else:
        B = block_rows
    B = min(B, Yb8)
    n_prog = -(-Yb // B)
    Yb_pad = n_prog * B

    def pad(a):
        if a.ndim == 2:
            a = a[None]
        if a.shape[-2:] == (Yb_pad, Xb_pad):
            return a
        return jnp.pad(a, ((0, 0), (0, Yb_pad - a.shape[-2]),
                           (0, Xb_pad - a.shape[-1])))

    g2 = jnp.concatenate([pad(inv_h_u), pad(inv_h_v), pad(Ua), pad(Va)])
    operands = [pad(u0), pad(gu), pad(gu_old), pad(v0), pad(gv), pad(gv_old),
                pad(c0), pad(gc), pad(gc_old), pad(dzu), pad(dzv),
                pad(mask_c), g2]
    scal = jnp.stack([jnp.asarray(w1, u0.dtype), jnp.asarray(w2, u0.dtype),
                      jnp.asarray(dt, u0.dtype)])

    kern = functools.partial(_kernel, nz=nz, P=P)

    def bs(K):
        return pl.BlockSpec((K, B, Xb_pad), lambda p, *_: (0, p, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_prog,),
        in_specs=[bs(nz)] * 6 + [bs(P)] * 3 + [bs(nz)] * 3 + [bs(4)],
        out_specs=[bs(nz), bs(nz), bs(P)],
    )
    out_shape = [jax.ShapeDtypeStruct((nz, Yb_pad, Xb_pad), u0.dtype)] * 2 + \
        [jax.ShapeDtypeStruct((P, Yb_pad, Xb_pad), u0.dtype)]
    kwargs = {}
    if not interpret:
        foot = 2 * (n_in + n_out) * B * Xb_pad * jnp.dtype(u0.dtype).itemsize
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(foot + 32 * 2**20))
    un, vn, cn = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(scal, *operands)
    if (Yb_pad, Xb_pad) != (Yb, Xb):
        un = un[:, :Yb, :Xb]
        vn = vn[:, :Yb, :Xb]
        cn = cn[:, :Yb, :Xb]
    return un, vn, cn
