"""Pallas TPU kernel: vector-invariant horizontal momentum tendencies,
VMEM-resident, double-buffered.

Computes, per layer, in one window pass (models/layered.py momentum slice /
models/hydrostatic.py:tendencies):

    zeta   = (dxf(dy_cf*v) - dyf(dx_fc*u)) * inv_az_ff
    q      = zeta + f_ff
    v_hat  = ixf(iyc(dx_cf*v)) * inv_dx_fc
    q_at_u = shift_p_y(weno5_upwind(q, shift_m_y(v_hat), axis=y))
    ke     = 0.5*(ixc(u^2) + iyc(v^2))
    Gu     = q_at_u*v_hat - dxf(ke)*inv_dx_fc
    u_hat  = iyf(ixc(dy_fc*u)) * inv_dy_cf
    q_at_v = shift_p_x(weno5_upwind(q, shift_m_x(u_hat), axis=x))
    Gv     = -q_at_v*u_hat - dyf(ke)*inv_dy_cf

plus optionally (prefactored per-layer planes): the advective-mask multiply
(single-layer convention), the free-slip nu_h Laplacians, and the quadratic
bottom drag. The pressure-gradient, vertical-advection and wind terms stay in
XLA — they couple layers and are cheap.

Round-4 v2 pipeline (same redesign as ops/pallas_adv.py): grid = (Nz,), row
blocks as a STATIC in-kernel loop with two buffer slots so block j+1's windows
fetch while block j computes and finished blocks drain by async output copies.
The micro-probe behind this: synchronous per-program window DMA serializes
against compute (they ADD), costing the v1 design ~40% of its runtime.

All shifts are `pltpu.roll` (y reach <= 5 < 8 overlap rows; window starts are
Python ints, provably aligned). Validity: cells within 5 rows/columns of the
edge are garbage — the usual halo contract. Parity pinned in
tests/test_pallas_mom.py (contraction-band tolerances).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .advection import _weno5_left

__all__ = ["momentum_pallas", "DEFAULT_BLOCK_ROWS_MOM"]

DEFAULT_BLOCK_ROWS_MOM = 104
_OV = 8


def _geometry(Yb, block_rows):
    Yb8 = -8 * (-Yb // 8)
    B = block_rows
    W = B + 2 * _OV
    if W >= Yb8:
        return Yb8, Yb8, 1, Yb8  # single full-height window (circular rolls)
    n_prog = -(-Yb // B)
    return B, W, n_prog, n_prog * B


def _kernel(u_ref, v_ref, static_ref, *rest,
            n_lay, B, W, n_prog, Yb_pad, Xb, has_mask, has_lap, has_drag):
    if n_lay:
        lay_ref, gu_out, gv_out, ubuf, vbuf, sbuf, lbuf, gubuf, gvbuf, \
            in_sems, out_sems = rest
    else:
        gu_out, gv_out, ubuf, vbuf, sbuf, gubuf, gvbuf, in_sems, out_sems = rest
        lay_ref = lbuf = None
    k = pl.program_id(0)

    def _start(j):
        return min(max(j * B - _OV, 0), Yb_pad - W)

    def in_dmas(j, slot):
        rows = pl.ds(_start(j), W)
        dmas = [pltpu.make_async_copy(u_ref.at[k, rows, :], ubuf.at[slot],
                                      in_sems.at[slot, 0]),
                pltpu.make_async_copy(v_ref.at[k, rows, :], vbuf.at[slot],
                                      in_sems.at[slot, 1]),
                pltpu.make_async_copy(static_ref.at[:, rows, :], sbuf.at[slot],
                                      in_sems.at[slot, 2])]
        if n_lay:
            dmas.append(pltpu.make_async_copy(
                lay_ref.at[pl.ds(k * n_lay, n_lay), rows, :], lbuf.at[slot],
                in_sems.at[slot, 3]))
        return dmas

    def out_dmas(j, slot):
        off = j * B - _start(j)
        return [pltpu.make_async_copy(
                    gubuf.at[slot, pl.ds(off, B), :],
                    gu_out.at[k, pl.ds(j * B, B), :], out_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    gvbuf.at[slot, pl.ds(off, B), :],
                    gv_out.at[k, pl.ds(j * B, B), :], out_sems.at[slot, 1])]

    def rmx(a, n=1):
        return pltpu.roll(a, n, 1)

    def rpx(a, n=1):
        return pltpu.roll(a, Xb - n, 1)

    def rmy(a, n=1):
        return pltpu.roll(a, n, 0)

    def rpy(a, n=1):
        return pltpu.roll(a, W - n, 0)

    DY_CF, DX_FC, INV_AZ_FF, F_FF, DX_CF, INV_DX_FC, DY_FC, INV_DY_CF = range(8)

    for d in in_dmas(0, 0):
        d.start()

    for j in range(n_prog):  # static unroll: double-buffered row pipeline
        slot = j % 2
        if j + 1 < n_prog:
            for d in in_dmas(j + 1, (j + 1) % 2):
                d.start()
        for d in in_dmas(j, slot):
            d.wait()

        u = ubuf[slot]
        v = vbuf[slot]
        sb = sbuf[slot]

        dyv = sb[DY_CF] * v
        dxu = sb[DX_FC] * u
        zeta = ((dyv - rmx(dyv)) - (dxu - rmy(dxu))) * sb[INV_AZ_FF]
        q = zeta + sb[F_FF]

        dxv = sb[DX_CF] * v
        iy = 0.5 * (dxv + rpy(dxv))                     # iyc
        v_hat = 0.5 * (rmx(iy) + iy) * sb[INV_DX_FC]    # ixf
        dyu = sb[DY_FC] * u
        ix = 0.5 * (dyu + rpx(dyu))                     # ixc
        u_hat = 0.5 * (rmy(ix) + ix) * sb[INV_DY_CF]    # iyf

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
            f = _weno5_left(sel(m3, p2), sel(m2, p1), sel(m1, q),
                            sel(q, m1), sel(p1, m2))
            return rp(f)

        q_at_u = q_at_centers(rmy, rpy, v_hat)
        q_at_v = q_at_centers(rmx, rpx, u_hat)

        uu = u * u
        vv = v * v
        ke = 0.5 * (0.5 * (uu + rpx(uu)) + 0.5 * (vv + rpy(vv)))
        Gu = q_at_u * v_hat - (ke - rmx(ke)) * sb[INV_DX_FC]
        Gv = -q_at_v * u_hat - (ke - rmy(ke)) * sb[INV_DY_CF]

        li = 0
        if has_mask:
            # single-layer convention: the advective part is masked BEFORE the
            # closures are added (models/hydrostatic.py tendencies)
            Gu = Gu * lbuf[slot, li]
            Gv = Gv * lbuf[slot, li + 1]
            li += 2
        if has_lap:
            LU_C, LU_F, LU_S = li, li + 1, li + 2
            LV_F, LV_C, LV_S = li + 3, li + 4, li + 5
            li += 6
            gxu = (rpx(u) - u) * lbuf[slot, LU_C]
            gyu = (u - rmy(u)) * lbuf[slot, LU_F]
            Gu = Gu + ((gxu - rmx(gxu)) + (rpy(gyu) - gyu)) * lbuf[slot, LU_S]
            gxv = (v - rmx(v)) * lbuf[slot, LV_F]
            gyv = (rpy(v) - v) * lbuf[slot, LV_C]
            Gv = Gv + ((rpx(gxv) - gxv) + (gyv - rmy(gyv))) * lbuf[slot, LV_S]
        if has_drag:
            DR_U, DR_V = li, li + 1
            vci = 0.5 * (v + rpy(v))
            sp_u = jnp.sqrt(uu + (0.5 * (vci + rmx(vci))) ** 2)
            uci = 0.5 * (u + rpx(u))
            sp_v = jnp.sqrt(vv + (0.5 * (uci + rmy(uci))) ** 2)
            Gu = Gu - lbuf[slot, DR_U] * sp_u * u
            Gv = Gv - lbuf[slot, DR_V] * sp_v * v

        if j >= 2:
            for d in out_dmas(j - 2, slot):
                d.wait()
        gubuf[slot] = Gu
        gvbuf[slot] = Gv
        for d in out_dmas(j, slot):
            d.start()

    for j in range(max(n_prog - 2, 0), n_prog):
        for d in out_dmas(j, j % 2):
            d.wait()


def momentum_pallas(u, v, static_pack, lay_pack=None, has_mask=False,
                    has_lap=False, has_drag=False, block_rows=None,
                    interpret=False):
    """Vector-invariant horizontal momentum tendencies (+ optional fused
    mask / Laplacian closure / quadratic bottom drag), one double-buffered
    Pallas pass.

    ``u``/``v``: (Nz, Yb, Xb) halo-filled velocities.
    ``static_pack``: (8, Yb, Xb) stacked 2-D metric planes
    [dy_cf, dx_fc, inv_az_ff, f_ff, dx_cf, inv_dx_fc, dy_fc, inv_dy_cf].
    ``lay_pack``: per-layer prefactored planes, flattened (Nz*L, Yb, Xb)
    (plane k*L+i = layer k's i-th factor; a (Nz, L, Yb, Xb) input is
    reshaped), in order: with ``has_mask`` [mask_u, mask_v] applied to the
    ADVECTIVE result before the closures; with ``has_lap`` the 6 Laplacian
    factors [LU_C, LU_F, LU_S, LV_F, LV_C, LV_S]; with ``has_drag``
    [Cd/dz*bot_u, Cd/dz*bot_v].
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

    kern = functools.partial(_kernel, n_lay=n_lay, B=B, W=W, n_prog=n_prog,
                             Yb_pad=Yb_pad, Xb=Xb_pad, has_mask=has_mask,
                             has_lap=has_lap, has_drag=has_drag)
    n_in = len(operands)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nz,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, W, Xb_pad), u.dtype),          # u windows
            pltpu.VMEM((2, W, Xb_pad), u.dtype),          # v windows
            pltpu.VMEM((2, 8, W, Xb_pad), u.dtype),       # static planes
        ] + ([pltpu.VMEM((2, n_lay, W, Xb_pad), u.dtype)] if n_lay else [])
        + [
            pltpu.VMEM((2, W, Xb_pad), u.dtype),          # Gu stage
            pltpu.VMEM((2, W, Xb_pad), u.dtype),          # Gv stage
            pltpu.SemaphoreType.DMA((2, 4 if n_lay else 3)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kwargs = {}
    if not interpret:
        foot = 2 * (12 + 2 + n_lay) * W * Xb_pad * jnp.dtype(u.dtype).itemsize
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
