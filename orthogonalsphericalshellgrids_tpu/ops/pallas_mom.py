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

Round-5 v3 pipeline: grid = (n_prog, Nz) — row blocks OUTER, layers INNER —
with cross-program double buffering of the per-layer operands (u, v, lay
slab; TPU grid programs run sequentially and scratch persists across them,
the ops/pallas_vert.py pattern). The 8 STATIC metric planes are 2-D (shared
by every layer), so they are fetched ONCE per row block (at layer 0) and
reused from scratch for all Nz layer programs — in the round-4 v2 layout
(grid = (Nz,), row blocks inner) they were re-streamed once per layer, ~40%
of the kernel's input traffic at the 1/4-degree x 10 benchmark (isolated
kernel measured 2.9 ms, DMA-bound). Round-4 v2's own lesson (synchronous
per-program window DMA serializes against compute) is kept: per-layer
operands prefetch one program ahead.

All shifts are `pltpu.roll` (y reach <= 5 < 8 overlap rows). Validity: cells
within 5 rows/columns of the edge are garbage — the usual halo contract.
Parity pinned in tests/test_pallas_mom.py (contraction-band tolerances) and
compiled in tests_tpu/test_pallas_mom_tpu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .advection import _weno5_left

__all__ = ["momentum_pallas", "DEFAULT_BLOCK_ROWS_MOM"]

# v3 sweep on v5e at 1/4-degree x 10 (probe 619 GB/s): 232 > 152 > 64 > 104
# (2504/2736/2867/2926 us isolated) — bigger blocks amortize the per-block
# statics fetch. B=344 (66 MB window at W=360) was MEASURED in round 5 with
# the limit raised: the Mosaic compile fails outright (tpu_compile_helper
# exit 1), so 232 is the hardware-admissible maximum, not a budget choice.
DEFAULT_BLOCK_ROWS_MOM = 232
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
            nz, n_lay, B, W, n_prog, Yb_pad, Xb, has_mask, has_lap, has_drag,
            has_acc, has_mask_out):
    rest = list(rest)
    lay_ref = rest.pop(0) if n_lay else None
    if has_acc:
        au_ref, av_ref = rest.pop(0), rest.pop(0)
    else:
        au_ref = av_ref = None
    if has_mask_out:
        mu_ref, mv_ref = rest.pop(0), rest.pop(0)
    else:
        mu_ref = mv_ref = None
    gu_out, gv_out, ubuf, vbuf, sbuf = rest[:5]
    del rest[:5]
    lbuf = rest.pop(0) if n_lay else None
    abuf = rest.pop(0) if has_acc else None
    mbuf = rest.pop(0) if has_mask_out else None
    obuf, in_sems, s_sem, out_sem = rest
    j = pl.program_id(0)  # row block (outer)
    k = pl.program_id(1)  # layer (inner)
    p = j * nz + k
    slot = jax.lax.rem(p, jnp.int32(2))

    def _rows(jj):
        start = jnp.clip(jj * B - _OV, 0, Yb_pad - W)
        return pl.ds(pl.multiple_of(start, 8), W)

    def in_dmas(jj, kk, sl):
        rows = _rows(jj)
        dmas = [pltpu.make_async_copy(u_ref.at[kk, rows, :], ubuf.at[sl],
                                      in_sems.at[sl, 0]),
                pltpu.make_async_copy(v_ref.at[kk, rows, :], vbuf.at[sl],
                                      in_sems.at[sl, 1])]
        if n_lay:
            dmas.append(pltpu.make_async_copy(
                lay_ref.at[pl.ds(kk * n_lay, n_lay), rows, :], lbuf.at[sl],
                in_sems.at[sl, 2]))
        base = 3 if n_lay else 2
        if has_acc:
            # z-resident column kernel's (dGu, dGv) accumulated in-window
            # (layered.py) — the read rides this compute-bound sweep instead
            # of a separate full-stack XLA add pass
            dmas.append(pltpu.make_async_copy(
                au_ref.at[kk, rows, :], abuf.at[sl, 0], in_sems.at[sl, base]))
            dmas.append(pltpu.make_async_copy(
                av_ref.at[kk, rows, :], abuf.at[sl, 1],
                in_sems.at[sl, base + 1]))
            base += 2
        if has_mask_out:
            # final (mask_u, mask_v) multiply folded in-window (layered.py) —
            # replaces the read(G)+read(mask)+write(G) XLA masking pass
            dmas.append(pltpu.make_async_copy(
                mu_ref.at[kk, rows, :], mbuf.at[sl, 0], in_sems.at[sl, base]))
            dmas.append(pltpu.make_async_copy(
                mv_ref.at[kk, rows, :], mbuf.at[sl, 1],
                in_sems.at[sl, base + 1]))
        return dmas

    def out_dmas(jj, kk):
        start = jnp.clip(jj * B - _OV, 0, Yb_pad - W)
        start = pl.multiple_of(start, 8)
        off = pl.multiple_of(jj * B - start, 8)
        rows_out = pl.ds(jj * B, B)
        return [pltpu.make_async_copy(obuf.at[0, pl.ds(off, B), :],
                                      gu_out.at[kk, rows_out, :],
                                      out_sem.at[0]),
                pltpu.make_async_copy(obuf.at[1, pl.ds(off, B), :],
                                      gv_out.at[kk, rows_out, :],
                                      out_sem.at[1])]

    # cold start: program (0, 0) fetches its own per-layer windows
    @pl.when(p == 0)
    def _():
        for d in in_dmas(0, 0, 0):
            d.start()

    # the 2-D static metric planes are shared by every layer: fetch once per
    # row block (at k == 0, synchronous — ~one window of 8 planes per block)
    # and reuse from scratch for all Nz layer programs
    @pl.when(k == 0)
    def _():
        dma = pltpu.make_async_copy(static_ref.at[:, _rows(j), :], sbuf, s_sem)
        dma.start()
        dma.wait()

    for d in in_dmas(j, k, slot):
        d.wait()

    # prefetch the next program's per-layer windows while this one computes
    @pl.when(p + 1 < n_prog * nz)
    def _():
        nxt = jax.lax.rem(p + 1, jnp.int32(2))
        last = k + 1 == nz
        jn = jax.lax.select(last, j + 1, j)
        kn = jax.lax.select(last, jnp.int32(0), k + 1)
        for d in in_dmas(jn, kn, nxt):
            d.start()

    # single-slot output staging: drain the previous program's output copy
    # before the compute below overwrites obuf
    @pl.when(p > 0)
    def _():
        kp = jax.lax.select(k == 0, jnp.int32(nz - 1), k - 1)
        jp = jax.lax.select(k == 0, j - 1, j)
        for d in out_dmas(jp, kp):
            d.wait()

    def rmx(a, n=1):
        return pltpu.roll(a, n, 1)

    def rpx(a, n=1):
        return pltpu.roll(a, Xb - n, 1)

    def rmy(a, n=1):
        return pltpu.roll(a, n, 0)

    def rpy(a, n=1):
        return pltpu.roll(a, W - n, 0)

    DY_CF, DX_FC, INV_AZ_FF, F_FF, DX_CF, INV_DX_FC, DY_FC, INV_DY_CF = range(8)

    u = ubuf[slot]
    v = vbuf[slot]
    sb = sbuf

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
    if has_acc:
        # same float order as the XLA assembly (Gu_kernel_total + dGu)
        Gu = Gu + abuf[slot, 0]
        Gv = Gv + abuf[slot, 1]
    if has_mask_out:
        # the tendency's final mask multiply (wind riding after this in XLA
        # must then be pre-masked — distributive up to the sign of land zeros)
        Gu = Gu * mbuf[slot, 0]
        Gv = Gv * mbuf[slot, 1]

    obuf[0] = Gu
    obuf[1] = Gv
    for d in out_dmas(j, k):
        d.start()

    @pl.when(p + 1 == n_prog * nz)
    def _():
        for d in out_dmas(j, k):
            d.wait()


def momentum_pallas(u, v, static_pack, lay_pack=None, has_mask=False,
                    has_lap=False, has_drag=False, acc=None, mask_out=None,
                    block_rows=None, interpret=False):
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
    ``acc``: optional ((Nz, Yb, Xb), (Nz, Yb, Xb)) additive contributions
    (the z-resident column kernel's dGu/dGv, models/layered.py) accumulated
    INTO the output windows — same float order as the XLA assembly
    ``Gu + dGu``, with the read riding this kernel's compute-bound sweep
    instead of a separate full-stack XLA add pass.
    ``mask_out``: optional ((Nz, Yb, Xb), (Nz, Yb, Xb)) final (mask_u, mask_v)
    multiply applied after ``acc`` — replaces the layered tendency's closing
    ``G * mask`` XLA pass; any term the caller adds AFTER this kernel (wind)
    must then be pre-masked (equal up to the sign of land zeros).
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

    has_acc = acc is not None
    has_mask_out = mask_out is not None
    operands = [pad(u), pad(v), pad(static_pack)]
    if n_lay:
        if lay_pack.ndim == 4:  # (Nz, L, Yb, Xb) -> flattened kernel layout
            lay_pack = lay_pack.reshape((nz * n_lay,) + lay_pack.shape[-2:])
        operands.append(pad(lay_pack))
    if has_acc:
        au, av = acc
        assert au.shape == u.shape and av.shape == u.shape
        operands += [pad(au), pad(av)]
    if has_mask_out:
        mu, mv = mask_out
        assert mu.shape == u.shape and mv.shape == u.shape
        operands += [pad(mu), pad(mv)]

    kern = functools.partial(_kernel, nz=nz, n_lay=n_lay, B=B, W=W,
                             n_prog=n_prog, Yb_pad=Yb_pad, Xb=Xb_pad,
                             has_mask=has_mask, has_lap=has_lap,
                             has_drag=has_drag, has_acc=has_acc,
                             has_mask_out=has_mask_out)
    n_in = len(operands)
    n_extra = (2 if has_acc else 0) + (2 if has_mask_out else 0)
    n_sem = (3 if n_lay else 2) + n_extra
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_prog, nz),  # row blocks OUTER, layers INNER (statics reuse)
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, W, Xb_pad), u.dtype),          # u windows
            pltpu.VMEM((2, W, Xb_pad), u.dtype),          # v windows
            pltpu.VMEM((8, W, Xb_pad), u.dtype),          # static planes (1 slot/row block)
        ] + ([pltpu.VMEM((2, n_lay, W, Xb_pad), u.dtype)] if n_lay else [])
        + ([pltpu.VMEM((2, 2, W, Xb_pad), u.dtype)] if has_acc else [])
        + ([pltpu.VMEM((2, 2, W, Xb_pad), u.dtype)] if has_mask_out else [])
        + [
            pltpu.VMEM((2, W, Xb_pad), u.dtype),          # [Gu | Gv] stage
            pltpu.SemaphoreType.DMA((2, n_sem)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kwargs = {}
    if not interpret:
        foot = (2 * (2 + n_lay + n_extra) + 8 + 2) \
            * W * Xb_pad * jnp.dtype(u.dtype).itemsize
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
