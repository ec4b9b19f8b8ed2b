"""Pallas TPU kernel: vector-invariant horizontal momentum tendencies, VMEM-resident.

The layered momentum slice is the largest tendency component after the round-4
tracer kernel landed (isolated differential measurements, docs/performance.md:
momentum ~4.6 ms, horizontal Laplacians ~3.5 ms of the u/v share, quadratic drag
~1.0 ms at 1/4 deg x 10 on v5e) and is memory-bound like the rest of the layered
path. This kernel computes, per layer, in one window pass
(models/layered.py:562-575 / models/hydrostatic.py:553-576 math):

    zeta   = (dxf(dy_cf*v) - dyf(dx_fc*u)) * inv_az_ff
    q      = zeta + f_ff
    v_hat  = ixf(iyc(dx_cf*v)) * inv_dx_fc
    q_at_u = shift_p_y(weno5_upwind(q, shift_m_y(v_hat), axis=y))
    ke     = 0.5*(ixc(u^2) + iyc(v^2))
    Gu     = q_at_u*v_hat - dxf(ke)*inv_dx_fc
    u_hat  = iyf(ixc(dy_fc*u)) * inv_dy_cf
    q_at_v = shift_p_x(weno5_upwind(q, shift_m_x(u_hat), axis=x))
    Gv     = -q_at_v*u_hat - dyf(ke)*inv_dy_cf

plus, when the factor planes are supplied, the free-slip Laplacian closures
(ops/closures.laplacian_u/v with nu_h, metric ratios and masks prefactored) and
the quadratic bottom drag (coefficient/dz * bottom-indicator prefactored). The
pressure-gradient, vertical-advection and wind terms stay in XLA — they couple
layers (cumulative sums over z) and are cheap.

Same window machinery as ops/pallas_adv.py: grid = (Nz, row blocks), all shifts
as pltpu.roll (y reach <= 5 < 8 overlap rows), 8-aligned window starts, outputs
staged through VMEM scratch for the dynamic-offset row slice. Validity contract:
cells within 5 rows/columns of the array edge are garbage (the models only
consume interior tendencies). Parity pinned in tests/test_pallas_mom.py
(contraction-band tolerances, as for the barotropic and tracer kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .advection import _weno5_left

__all__ = ["momentum_pallas", "DEFAULT_BLOCK_ROWS_MOM"]

DEFAULT_BLOCK_ROWS_MOM = 128
_OV = 8


def _geometry(Yb, block_rows):
    Yb8 = -8 * (-Yb // 8)
    B = block_rows
    W = B + 2 * _OV
    if W >= Yb8:
        return Yb8, Yb8, 1, Yb8  # single full-height window (circular rolls)
    n_prog = -(-Yb // B)
    return B, W, n_prog, n_prog * B


def _kernel(*args, n_static, n_lay, B, W, Yb_pad, Xb, has_mask, has_lap,
            has_drag):
    # args: [u_ref, v_ref, static_ref, lay_ref?] + [gu_out, gv_out] + scratch
    n_in = 3 + (1 if n_lay else 0)
    refs = args[:n_in]
    gu_out, gv_out = args[n_in : n_in + 2]
    (ubuf, vbuf, sbuf) = args[n_in + 2 : n_in + 5]
    rest = args[n_in + 5 :]
    if n_lay:
        lbuf, g1buf, g2buf, sems = rest
    else:
        g1buf, g2buf, sems = rest
        lbuf = None
    u_ref, v_ref, static_ref = refs[0], refs[1], refs[2]

    k = pl.program_id(0)
    j = pl.program_id(1)
    start = jnp.clip(j * B - _OV, 0, Yb_pad - W)
    start = pl.multiple_of(start, 8)
    off = pl.multiple_of(j * B - start, 8)

    copies = [
        pltpu.make_async_copy(u_ref.at[k, pl.ds(start, W), :], ubuf, sems.at[0]),
        pltpu.make_async_copy(v_ref.at[k, pl.ds(start, W), :], vbuf, sems.at[1]),
        pltpu.make_async_copy(static_ref.at[:, pl.ds(start, W), :], sbuf,
                              sems.at[2]),
    ]
    if n_lay:
        # lay planes ship flattened as (Nz*L, Yb, Xb): one per-plane DMA each —
        # a single 4-D copy (dynamic leading index + full middle axis) is not a
        # supported DMA shape
        for i in range(n_lay):
            copies.append(pltpu.make_async_copy(
                refs[3].at[k * n_lay + i, pl.ds(start, W), :], lbuf.at[i],
                sems.at[3 + i]))
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    def rmx(a, n=1):
        return pltpu.roll(a, n, 1)

    def rpx(a, n=1):
        return pltpu.roll(a, Xb - n, 1)

    def rmy(a, n=1):
        return pltpu.roll(a, n, 0)

    def rpy(a, n=1):
        return pltpu.roll(a, W - n, 0)

    DY_CF, DX_FC, INV_AZ_FF, F_FF, DX_CF, INV_DX_FC, DY_FC, INV_DY_CF = range(8)
    u = ubuf[...]
    v = vbuf[...]

    # vorticity q at FF
    dyv = sbuf[DY_CF] * v
    dxu = sbuf[DX_FC] * u
    zeta = ((dyv - rmx(dyv)) - (dxu - rmy(dxu))) * sbuf[INV_AZ_FF]
    q = zeta + sbuf[F_FF]

    # cross velocities at the staggered points
    dxv = sbuf[DX_CF] * v
    iy = 0.5 * (dxv + rpy(dxv))          # iyc
    v_hat = 0.5 * (rmx(iy) + iy) * sbuf[INV_DX_FC]   # ixf
    dyu = sbuf[DY_FC] * u
    ix = 0.5 * (dyu + rpx(dyu))          # ixc
    u_hat = 0.5 * (rmy(ix) + ix) * sbuf[INV_DY_CF]   # iyf

    # upwind WENO-5 reconstruction of q (face field) at centers along an axis,
    # input-selected, matching weno5_upwind_centers_from_faces: face-level
    # upwinding driven by shift_m(vel), result shifted down by one.
    def q_at_centers(rm, rp, vel):
        velm = rm(vel)
        pos = velm > 0.0

        def sel(a, b):
            return jnp.where(pos, a, b)

        m1 = rm(q)
        m2 = rm(q, 2)
        m3 = rm(q, 3)
        p1 = rp(q)
        p2 = rp(q, 2)
        f = _weno5_left(sel(m3, p2), sel(m2, p1), sel(m1, q), sel(q, m1),
                        sel(p1, m2))
        return rp(f)

    q_at_u = q_at_centers(rmy, rpy, v_hat)
    q_at_v = q_at_centers(rmx, rpx, u_hat)

    uu = u * u
    vv = v * v
    ke = 0.5 * (0.5 * (uu + rpx(uu)) + 0.5 * (vv + rpy(vv)))
    Gu = q_at_u * v_hat - (ke - rmx(ke)) * sbuf[INV_DX_FC]
    Gv = -q_at_v * u_hat - (ke - rmy(ke)) * sbuf[INV_DY_CF]

    li = 0
    if has_mask:
        # single-layer convention: the advective part is masked BEFORE the
        # closures are added (models/hydrostatic.py:568,576)
        Gu = Gu * lbuf[li]
        Gv = Gv * lbuf[li + 1]
        li += 2
    if has_lap:
        # free-slip Laplacians with prefactored planes (nu_h * ratio * mask):
        # lap_u: x-grad at CC (LU_C), y-grad at FF (LU_F), scale LU_S
        LU_C, LU_F, LU_S, LV_F, LV_C, LV_S = li, li + 1, li + 2, li + 3, li + 4, li + 5
        li += 6
        gxu = (rpx(u) - u) * lbuf[LU_C]
        gyu = (u - rmy(u)) * lbuf[LU_F]
        Gu = Gu + ((gxu - rmx(gxu)) + (rpy(gyu) - gyu)) * lbuf[LU_S]
        gxv = (v - rmx(v)) * lbuf[LV_F]
        gyv = (rpy(v) - v) * lbuf[LV_C]
        Gv = Gv + ((rpx(gxv) - gxv) + (gyv - rmy(gyv))) * lbuf[LV_S]
    if has_drag:
        DR_U, DR_V = li, li + 1
        # speed at the staggered points via the flux-unweighted interpolations
        # (models/layered.py:606-607: sp_u = sqrt(u^2 + ixf(iyc(v))^2) etc.)
        vci = 0.5 * (v + rpy(v))
        sp_u = jnp.sqrt(uu + (0.5 * (vci + rmx(vci))) ** 2)
        uci = 0.5 * (u + rpx(u))
        sp_v = jnp.sqrt(vv + (0.5 * (uci + rmy(uci))) ** 2)
        Gu = Gu - lbuf[DR_U] * sp_u * u
        Gv = Gv - lbuf[DR_V] * sp_v * v

    g1buf[...] = Gu
    g2buf[...] = Gv
    gu_out[0] = g1buf[pl.ds(off, B), :]
    gv_out[0] = g2buf[pl.ds(off, B), :]


def momentum_pallas(u, v, static_pack, lay_pack=None, has_mask=False,
                    has_lap=False, has_drag=False, block_rows=None,
                    interpret=False):
    """Vector-invariant horizontal momentum tendencies (+ optional fused
    Laplacian closure and quadratic bottom drag), one Pallas pass.

    ``u``/``v``: (Nz, Yb, Xb) halo-filled velocities.
    ``static_pack``: (8, Yb, Xb) stacked 2-D metric planes
    [dy_cf, dx_fc, inv_az_ff, f_ff, dx_cf, inv_dx_fc, dy_fc, inv_dy_cf].
    ``lay_pack``: (Nz, L, Yb, Xb) (or flattened (Nz*L, Yb, Xb)) per-layer
    prefactored planes, in order: with ``has_mask`` the first 2 are
    [mask_u, mask_v] applied to the ADVECTIVE result before the closures
    (the single-layer masking convention); with ``has_lap`` the next 6 are
    [LU_C, LU_F, LU_S, LV_F, LV_C, LV_S]
    (nu_h*(dy_cc/dx_cc)*mask_c, nu_h*(dx_ff/dy_ff)*m_ff_u, inv(az_fc)*mask_u,
    nu_h*(dy_ff/dx_ff)*m_ff_v, nu_h*(dx_cc/dy_cc)*mask_c, inv(az_cf)*mask_v);
    with ``has_drag`` the last 2 are [Cd/dz*bot_u, Cd/dz*bot_v].
    Returns (Gu, Gv); cells within 5 rows/columns of the edge are garbage."""
    nz, Yb, Xb = u.shape
    n_lay = ((2 if has_mask else 0) + (6 if has_lap else 0)
             + (2 if has_drag else 0))
    assert (lay_pack is None) == (n_lay == 0)
    B0 = DEFAULT_BLOCK_ROWS_MOM if block_rows is None else block_rows
    B, W, n_prog, Yb_pad = _geometry(Yb, B0)
    Xb_pad = -128 * (-Xb // 128)

    def pad(a):
        if a.shape[-2:] == (Yb_pad, Xb_pad):
            return a
        widths = [(0, 0)] * (a.ndim - 2) + [(0, Yb_pad - a.shape[-2]),
                                            (0, Xb_pad - a.shape[-1])]
        return jnp.pad(a, widths)

    operands = [pad(u), pad(v), pad(static_pack)]
    if n_lay:
        if lay_pack.ndim == 4:  # (Nz, L, Yb, Xb) -> flattened kernel layout
            lay_pack = lay_pack.reshape((nz * n_lay,) + lay_pack.shape[-2:])
        operands.append(pad(lay_pack))

    kern = functools.partial(_kernel, n_static=8, n_lay=n_lay, B=B, W=W,
                             Yb_pad=Yb_pad, Xb=Xb_pad, has_mask=has_mask,
                             has_lap=has_lap, has_drag=has_drag)
    n_in = len(operands)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nz, n_prog),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=[pl.BlockSpec((1, B, Xb_pad), lambda k, j: (k, j, 0),
                                memory_space=pltpu.VMEM) for _ in range(2)],
        scratch_shapes=[
            pltpu.VMEM((W, Xb_pad), u.dtype),          # u window
            pltpu.VMEM((W, Xb_pad), u.dtype),          # v window
            pltpu.VMEM((8, W, Xb_pad), u.dtype),       # static planes
        ] + ([pltpu.VMEM((n_lay, W, Xb_pad), u.dtype)] if n_lay else [])
        + [
            pltpu.VMEM((W, Xb_pad), u.dtype),          # Gu stage
            pltpu.VMEM((W, Xb_pad), u.dtype),          # Gv stage
            pltpu.SemaphoreType.DMA((3 + n_lay,)),
        ],
    )
    kwargs = {}
    if not interpret:
        foot = ((12 + n_lay) * W + 2 * B) * Xb_pad * jnp.dtype(u.dtype).itemsize
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(foot + 32 * 2**20))
    Gu, Gv = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nz, Yb_pad, Xb_pad), u.dtype)] * 2,
        interpret=interpret,
        **kwargs,
    )(*operands)
    if (Yb_pad, Xb_pad) != (Yb, Xb):
        Gu = Gu[:, :Yb, :Xb]
        Gv = Gv[:, :Yb, :Xb]
    return Gu, Gv
