"""Pallas TPU kernel: horizontal flux-form tracer advection, VMEM-resident,
double-buffered.

The layered tendency path is memory-bound (docs/performance.md): the XLA-fused
tracer slice materializes its `jnp.roll` stencil shifts through fusion
boundaries, and `benchmarks/weno_sol.py` measures the in-VMEM WENO-5
reconstruction at its analytic op-mix bound. This kernel computes, per tracer
plane,

    cx = weno5_upwind_faces_from_centers(c, u, axis=-1)
    cy = weno5_upwind_faces_from_centers(c, v, axis=-2)
    G  = -(dxc(u*A_u*cx) + dyc(v*A_v*cy)) * IV        [models/layered.py tracer slice]
    (+ optionally the kappa_h five-point Laplacian with prefactored planes)

with A_u = dzu*dy_fc, A_v = dzv*dx_cf, IV = mask*inv(az*dz) prefactored per
layer and STACKED layer-major at model build (``pack_adv_statics``), so the hot
path DMAs ready factors.

Round-4 pipeline redesign (v2): a micro-probe showed the v1 design — grid over
(planes, row-blocks) with synchronous per-program window DMA — serializes DMA
against compute (9-window DMA alone costs ~1.9 ms/pass at the 1/4-degree x 10
geometry; with compute they ADD). v2 makes the grid (Nz,) and runs the row
blocks as an in-kernel ``fori_loop`` with TWO buffer slots: block j+1's windows
are fetched while block j computes, and finished blocks are written back by
async copies that only block when their slot is reused. All tracers of a layer
share one pass (u/v/static windows loaded once per layer, not once per tracer).

Shifts are `pltpu.roll` in both axes (y reach 4 < 8 overlap rows; window starts
8-aligned by construction). Validity: cells within the stencil radius of the
array edge are garbage — the usual halo contract. Parity pinned in
tests/test_pallas_adv.py (contraction-band tolerances).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .advection import _weno5_left

__all__ = ["tracer_adv_pallas", "pack_adv_statics", "DEFAULT_BLOCK_ROWS_ADV"]

DEFAULT_BLOCK_ROWS_ADV = 104
_OV = 8


def _geometry(Yb, block_rows):
    Yb8 = -8 * (-Yb // 8)
    B = block_rows
    W = B + 2 * _OV
    if W >= Yb8:
        # single full-height window: rolls wrap at the (padded) array edge —
        # exactly the XLA path's circular jnp.roll semantics
        return Yb8, Yb8, 1, Yb8
    n_prog = -(-Yb // B)
    return B, W, n_prog, n_prog * B


def pack_adv_statics(a_u, a_v, inv_vol, k_u=None, k_v=None, k_c=None):
    """Stack the per-layer static factor planes layer-major:
    (Nz*S, Yb, Xb) with plane k*S+i = layer k's i-th factor, S = 3 or 6.
    Call once at model build — the kernel DMAs one contiguous slab per layer."""
    parts = [a_u, a_v, inv_vol] + ([k_u, k_v, k_c] if k_u is not None else [])
    nz = a_u.shape[0]
    return jnp.concatenate(
        [jnp.stack([p[k] for p in parts]) for k in range(nz)])


def _kernel(c_ref, u_ref, v_ref, s_ref, out_ref,
            cbuf, ubuf, vbuf, sbuf, gbuf, in_sems, out_sems, *,
            nz, n_tr, S, B, W, n_prog, Yb_pad, Xb, has_diff):
    k = pl.program_id(0)

    # row-block geometry is STATIC (n_prog known at trace time): starts/offsets
    # are Python ints, so every slice below is provably aligned
    def _start(j):
        return min(max(j * B - _OV, 0), Yb_pad - W)

    def in_dmas(j, slot):
        rows = pl.ds(_start(j), W)
        dmas = [pltpu.make_async_copy(u_ref.at[k, rows, :], ubuf.at[slot],
                                      in_sems.at[slot, 0]),
                pltpu.make_async_copy(v_ref.at[k, rows, :], vbuf.at[slot],
                                      in_sems.at[slot, 1]),
                pltpu.make_async_copy(s_ref.at[pl.ds(k * S, S), rows, :],
                                      sbuf.at[slot], in_sems.at[slot, 2])]
        for t in range(n_tr):
            dmas.append(pltpu.make_async_copy(
                c_ref.at[t * nz + k, rows, :], cbuf.at[slot, t],
                in_sems.at[slot, 3 + t]))
        return dmas

    def out_dma(j, slot, t):
        off = j * B - _start(j)
        return pltpu.make_async_copy(
            gbuf.at[slot, t, pl.ds(off, B), :],
            out_ref.at[t * nz + k, pl.ds(j * B, B), :],
            out_sems.at[slot, t])

    def rollm_x(a, n=1):
        return pltpu.roll(a, n, 1)

    def rollp_x(a, n=1):
        return pltpu.roll(a, Xb - n, 1)

    def rollm_y(a, n=1):
        return pltpu.roll(a, n, 0)

    def rollp_y(a, n=1):
        return pltpu.roll(a, W - n, 0)

    def weno_faces(c, pos, rm, rp):
        def sel(a, b):
            return jnp.where(pos, a, b)

        m1 = rm(c)
        m2 = rm(c, 2)
        m3 = rm(c, 3)
        p1 = rp(c)
        p2 = rp(c, 2)
        return _weno5_left(sel(m3, p2), sel(m2, p1), sel(m1, c), sel(c, m1),
                           sel(p1, m2))

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
        pos_x = u > 0.0
        pos_y = v > 0.0
        AU, AV, IV = 0, 1, 2
        for t in range(n_tr):
            c = cbuf[slot, t]
            cx = weno_faces(c, pos_x, rollm_x, rollp_x)
            fx = u * sbuf[slot, AU] * cx
            gx = rollp_x(fx) - fx
            cy = weno_faces(c, pos_y, rollm_y, rollp_y)
            fy = v * sbuf[slot, AV] * cy
            gy = rollp_y(fy) - fy
            G = -(gx + gy) * sbuf[slot, IV]
            if has_diff:
                KU, KV, KC = 3, 4, 5
                gxd = (c - rollm_x(c)) * sbuf[slot, KU]
                gyd = (c - rollm_y(c)) * sbuf[slot, KV]
                G = G + ((rollp_x(gxd) - gxd) + (rollp_y(gyd) - gyd)) \
                    * sbuf[slot, KC]

            # the slot's previous output copy must have drained before reuse
            if j >= 2:
                out_dma(j - 2, slot, t).wait()
            gbuf[slot, t] = G
            out_dma(j, slot, t).start()

    # drain the tail output copies
    for j in range(max(n_prog - 2, 0), n_prog):
        for t in range(n_tr):
            out_dma(j, j % 2, t).wait()


def tracer_adv_pallas(c, u, v, a_u=None, a_v=None, inv_vol=None, k_u=None,
                      k_v=None, k_c=None, statics_packed=None, block_rows=None,
                      interpret=False):
    """Horizontal tracer-advection (+ optional fused kappa_h diffusion)
    tendency, one double-buffered Pallas pass.

    ``c``: (P, Yb, Xb) tracer planes (P = n_tracers * Nz, tracer-major:
    plane t*Nz + k is tracer t at layer k); ``u``/``v``: (Nz, Yb, Xb).
    Static factors: either the separate per-layer planes ``a_u``/``a_v``/
    ``inv_vol`` (+ ``k_u``/``k_v``/``k_c`` for the fused Laplacian) or a
    pre-stacked ``statics_packed`` from :func:`pack_adv_statics` (preferred —
    zero stacking cost on the hot path). All halo-filled. Returns the
    (P, Yb, Xb) tendency; only cells with full-stencil validity (>= 4 rows /
    columns from the array edge) are meaningful."""
    P, Yb, Xb = c.shape
    nz = u.shape[0]
    assert P % nz == 0, (P, nz)
    n_tr = P // nz
    has_diff = (k_u is not None) or (
        statics_packed is not None and statics_packed.shape[0] == 6 * nz)
    S = 6 if has_diff else 3
    B0 = DEFAULT_BLOCK_ROWS_ADV if block_rows is None else block_rows
    B, W, n_prog, Yb_pad = _geometry(Yb, B0)
    Xb_pad = -128 * (-Xb // 128)

    def pad(a):
        if a.shape[-2:] == (Yb_pad, Xb_pad):
            return a
        return jnp.pad(a, ((0, 0), (0, Yb_pad - a.shape[-2]),
                           (0, Xb_pad - a.shape[-1])))

    if statics_packed is None:
        statics_packed = pack_adv_statics(a_u, a_v, inv_vol, k_u, k_v, k_c)
    operands = [pad(c), pad(u), pad(v), pad(statics_packed)]

    kern = functools.partial(_kernel, nz=nz, n_tr=n_tr, S=S, B=B, W=W,
                             n_prog=n_prog, Yb_pad=Yb_pad, Xb=Xb_pad,
                             has_diff=has_diff)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nz,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, n_tr, W, Xb_pad), c.dtype),   # c windows
            pltpu.VMEM((2, W, Xb_pad), c.dtype),         # u
            pltpu.VMEM((2, W, Xb_pad), c.dtype),         # v
            pltpu.VMEM((2, S, W, Xb_pad), c.dtype),      # statics slab
            pltpu.VMEM((2, n_tr, W, Xb_pad), c.dtype),   # G staging
            pltpu.SemaphoreType.DMA((2, 3 + n_tr)),
            pltpu.SemaphoreType.DMA((2, n_tr)),
        ],
    )
    kwargs = {}
    if not interpret:
        foot = 2 * (2 * n_tr + 2 + S) * W * Xb_pad * jnp.dtype(c.dtype).itemsize
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(foot + 32 * 2**20))
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, Yb_pad, Xb_pad), c.dtype),
        interpret=interpret,
        **kwargs,
    )(*operands)
    if (Yb_pad, Xb_pad) != (Yb, Xb):
        out = out[:, :Yb, :Xb]
    return out
