"""Pallas TPU kernel: fused tendency evaluation (vorticity + WENO + fluxes + AB2).

One kernel computes, per row-tile held in VMEM:
- ζ at FF and the upwinded WENO-5 (Z-weights) vorticity reconstructions,
- the vector-invariant momentum tendencies Gu, Gv (+ KE gradient),
- the flux-form WENO-5 tracer tendency Gc,
- the quasi-AB2 extrapolations and the depth-integrated barotropic forcing planes
  (h_u·Gu*, h_v·Gv*) plus the tracer update c + dt·Gc*.

This replaces ~30 XLA kernel launches per step with one launch; numerics match
models/hydrostatic.tendencies up to float reassociation (pinned by
tests/test_pallas.py). Inputs u/v/c must be halo-filled (ops/zipper.fill_halos_batch);
stencil reach is 3 cells, within the default halo of 4+.

Scheme notes (same as ops/advection.py): WENO-5 with Borges et al. (2008) Z-weights and
uniform-mesh optimal coefficients — the reference's WENO default on curvilinear
horizontal grids (SURVEY.md O7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tendencies_pallas", "TEND_STATIC_PLANES"]

_EPS = 1e-8

# static-plane order (built in models/hydrostatic.make_model)
TEND_STATIC_PLANES = [
    "dy_cf", "dx_fc", "inv_az_ff", "dx_cf", "inv_dx_fc", "dy_fc", "inv_dy_cf",
    "f_u",   # h_u * dy_fc   (tracer x-flux factor)
    "f_v",   # h_v * dx_cf   (tracer y-flux factor)
    "inv_vol_c", "mask_u", "mask_v", "h_u", "h_v", "f_ff",
]

DEFAULT_BLOCK_ROWS = 32
_OV = 8  # stencil reach 3+1, rounded to the sublane multiple


def _weno_z(m3, m2, m1, p0, p1):
    """WENO-5 (Z) reconstruction at the interface from the left; mirrors
    ops/advection._weno5_left."""
    q0 = (2.0 * m3 - 7.0 * m2 + 11.0 * m1) / 6.0
    q1 = (-m2 + 5.0 * m1 + 2.0 * p0) / 6.0
    q2 = (2.0 * m1 + 5.0 * p0 - p1) / 6.0
    b0 = (13.0 / 12.0) * (m3 - 2.0 * m2 + m1) ** 2 + 0.25 * (m3 - 4.0 * m2 + 3.0 * m1) ** 2
    b1 = (13.0 / 12.0) * (m2 - 2.0 * m1 + p0) ** 2 + 0.25 * (m2 - p0) ** 2
    b2 = (13.0 / 12.0) * (m1 - 2.0 * p0 + p1) ** 2 + 0.25 * (3.0 * m1 - 4.0 * p0 + p1) ** 2
    tau = jnp.abs(b0 - b2)
    a0 = 0.1 * (1.0 + (tau / (b0 + _EPS)) ** 2)
    a1 = 0.6 * (1.0 + (tau / (b1 + _EPS)) ** 2)
    a2 = 0.3 * (1.0 + (tau / (b2 + _EPS)) ** 2)
    return (a0 * q0 + a1 * q1 + a2 * q2) / (a0 + a1 + a2)


def _kernel(scal_ref, spack_ref, dpack_ref, gu_out, gv_out, gc_out, gub_out, gvb_out,
            cnew_out, sbuf, dbuf, tmp, sem_s, sem_d,
            *, W, B, Ye, Xe, coriolis, upwind_q, tracer_weno):
    p = pl.program_id(0)
    start = jnp.clip(p * B - (W - B) // 2, 0, Ye - W)
    start = pl.multiple_of(start, 8)
    off = pl.multiple_of(p * B - start, 8)

    dma_s = pltpu.make_async_copy(spack_ref.at[:, pl.ds(start, W), :], sbuf, sem_s)
    dma_d = pltpu.make_async_copy(dpack_ref.at[:, pl.ds(start, W), :], dbuf, sem_d)
    dma_s.start()
    dma_d.start()
    dma_s.wait()
    dma_d.wait()

    (DY_CF, DX_FC, INV_AZ_FF, DX_CF, INV_DX_FC, DY_FC, INV_DY_CF,
     F_U, F_V, INV_VOL, MASK_U, MASK_V, H_U, H_V, F_FF) = range(15)
    Uu, Vv, Cc, GUP, GVP, GCP = range(6)

    w1 = scal_ref[0]
    w2 = scal_ref[1]
    dt = scal_ref[2]

    def pm_y(a):  # a[j-1]
        return pltpu.roll(a, 1, 0)

    def pp_y(a):  # a[j+1]
        return pltpu.roll(a, W - 1, 0)

    def pm_x(a):  # a[i-1]
        return pltpu.roll(a, 1, 1)

    def pp_x(a):  # a[i+1]
        return pltpu.roll(a, Xe - 1, 1)

    u = dbuf[Uu]
    v = dbuf[Vv]
    c = dbuf[Cc]

    # ζ at FF = (δxᶠ(Δyᶜᶠ v) − δyᶠ(Δxᶠᶜ u)) / Azᶠᶠ
    a1 = sbuf[DY_CF] * v
    a2 = sbuf[DX_FC] * u
    zeta = (a1 - pm_x(a1) - (a2 - pm_y(a2))) * sbuf[INV_AZ_FF]
    q = zeta + sbuf[F_FF] if coriolis else zeta

    def weno_center_from_faces(f, vel, axis_pm, axis_pp):
        # Upwind value at center j (between faces j and j+1), stencil selected on the
        # INPUTS by the sign of ``vel`` (bitwise-equal to computing the left
        # (f[j-2..j+2]) and right (f[j+3..j-1]) biased reconstructions and selecting,
        # at half the flops — mirrors ops/advection.weno5_upwind_centers_from_faces).
        m1 = f
        m2 = axis_pm(f)
        m3 = axis_pm(m2)
        pz = axis_pp(f)
        p1 = axis_pp(pz)
        p2 = axis_pp(p1)
        pos = vel > 0.0

        def sel(a, b):
            return jnp.where(pos, a, b)

        return _weno_z(sel(m3, p2), sel(m2, p1), sel(m1, pz), sel(pz, m1),
                       sel(p1, m2))

    # --- u-equation (FC)
    t = sbuf[DX_CF] * v
    v_hat = 0.5 * (t + pp_y(t))
    v_hat = 0.5 * (v_hat + pm_x(v_hat)) * sbuf[INV_DX_FC]
    if upwind_q:
        q_at_u = weno_center_from_faces(q, v_hat, pm_y, pp_y)
    else:
        q_at_u = 0.5 * (q + pp_y(q))
    u2 = u * u
    v2 = v * v
    ke = 0.5 * (0.5 * (u2 + pp_x(u2)) + 0.5 * (v2 + pp_y(v2)))
    gu = (q_at_u * v_hat - (ke - pm_x(ke)) * sbuf[INV_DX_FC]) * sbuf[MASK_U]

    # --- v-equation (CF)
    t = sbuf[DY_FC] * u
    u_hat = 0.5 * (t + pp_x(t))
    u_hat = 0.5 * (u_hat + pm_y(u_hat)) * sbuf[INV_DY_CF]
    if upwind_q:
        q_at_v = weno_center_from_faces(q, u_hat, pm_x, pp_x)
    else:
        q_at_v = 0.5 * (q + pp_x(q))
    gv = (-q_at_v * u_hat - (ke - pm_y(ke)) * sbuf[INV_DY_CF]) * sbuf[MASK_V]

    # --- tracer (CC), flux form
    def face_recon(cc, vel, axis_pm, axis_pp):
        # upwind face value, input-selected (see weno_center_from_faces)
        m1 = axis_pm(cc)
        m2 = axis_pm(m1)
        m3 = axis_pm(m2)
        p1 = axis_pp(cc)
        p2 = axis_pp(p1)
        pos = vel > 0.0

        def sel(a, b):
            return jnp.where(pos, a, b)

        return _weno_z(sel(m3, p2), sel(m2, p1), sel(m1, cc), sel(cc, m1),
                       sel(p1, m2))

    if tracer_weno:
        cx = face_recon(c, u, pm_x, pp_x)
        cy = face_recon(c, v, pm_y, pp_y)
    else:
        cx = 0.5 * (c + pm_x(c))
        cy = 0.5 * (c + pm_y(c))
    fx = u * sbuf[F_U] * cx
    fy = v * sbuf[F_V] * cy
    gc = -(pp_x(fx) - fx + pp_y(fy) - fy) * sbuf[INV_VOL]

    # --- AB2 extrapolation, forcing planes, tracer update
    gu_s = w1 * gu - w2 * dbuf[GUP]
    gv_s = w1 * gv - w2 * dbuf[GVP]
    gc_s = w1 * gc - w2 * dbuf[GCP]

    def emit(val, out_ref):
        # dynamic_slice on values is unsupported by this Mosaic version; bounce the
        # window through a scratch ref and take the aligned dynamic row-slice there
        tmp[...] = val
        out_ref[...] = tmp[pl.ds(off, B), :]

    emit(gu, gu_out)
    emit(gv, gv_out)
    emit(gc, gc_out)
    emit(sbuf[H_U] * gu_s, gub_out)
    emit(sbuf[H_V] * gv_s, gvb_out)
    # mask_c == (inv_vol_c > 0); matches the XLA path's (c + dt*Gc_s) * mask_c
    emit(jnp.where(sbuf[INV_VOL] > 0.0, c + dt * gc_s, 0.0), cnew_out)


def tendencies_pallas(spack, dpack, w1, w2, dt, *,
                      coriolis, upwind_q, tracer_weno,
                      block_rows=DEFAULT_BLOCK_ROWS, interpret=False):
    """Fused tendencies. ``spack``: (15, Yb?, Xb?) static planes (TEND_STATIC_PLANES
    order; may be pre-padded). ``dpack``: (6, Yb, Xb) = [u, v, c, Gu_prev, Gv_prev,
    Gc_prev] with u/v/c halo-filled. Returns (Gu, Gv, Gc, GUb, GVb, c_new), where
    GUb/GVb are the depth-integrated AB2 forcing planes and c_new = c + dt*Gc*."""
    _, Ye, Xe = dpack.shape
    B = block_rows
    W = B + 2 * _OV
    if Ye < W:
        B = -8 * (-Ye // 8)
        W = B
    n_prog = -(-Ye // B)
    Ye_pad = n_prog * B
    Xe_pad = -128 * (-Xe // 128)

    if spack.shape[1] < Ye_pad or spack.shape[2] != Xe_pad:
        spack = jnp.pad(spack, ((0, 0), (0, max(0, Ye_pad - spack.shape[1])),
                                (0, Xe_pad - spack.shape[2])))
    spack = spack[:, :Ye_pad, :]
    if (Ye_pad, Xe_pad) != (Ye, Xe):
        dpack = jnp.pad(dpack, ((0, 0), (0, Ye_pad - Ye), (0, Xe_pad - Xe)))

    kern = functools.partial(
        _kernel, W=W, B=B, Ye=Ye_pad, Xe=Xe_pad,
        coriolis=coriolis, upwind_q=upwind_q, tracer_weno=tracer_weno,
    )
    dtype = dpack.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # (w1, w2, dt)
        grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[
            pl.BlockSpec((B, Xe_pad), lambda p, *_: (p, 0), memory_space=pltpu.VMEM)
            for _ in range(6)
        ],
        scratch_shapes=[
            pltpu.VMEM((15, W, Xe_pad), dtype),
            pltpu.VMEM((6, W, Xe_pad), dtype),
            pltpu.VMEM((W, Xe_pad), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Ye_pad, Xe_pad), dtype)] * 6,
        interpret=interpret,
    )(jnp.asarray([w1, w2, dt], dtype), spack, dpack)
    if (Ye_pad, Xe_pad) != (Ye, Xe):
        outs = [o[:Ye, :Xe] for o in outs]
    return tuple(outs)
