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

with per-layer factors prefactored at model build (``pack_adv_statics``).

Round-5 v3 pipeline (supersedes the round-4 v2 grid = (Nz,) in-kernel row
loop): grid = (n_prog, Nz) — row blocks OUTER, layers INNER — with
cross-program double buffering of the per-layer operand windows (TPU grid
programs run sequentially; scratch persists across them, the
ops/pallas_vert.py pattern). Two flux-metric modes:

- ``layered`` (the Nz>1 model): u/v are MASKED prognostics, so
  A_u = dzu*dy_fc collapses to the GLOBAL dy_fc plane times the static layer
  thickness (A_u*u == dz_k*dy_fc*u exactly — see ops/pallas_vert.py's
  pack_vert_statics note), and likewise A_v. The two global planes are
  fetched ONCE per row block (at layer 0) and reused for all Nz layer
  programs; the per-layer slab shrinks to [IV (, K_u, K_v, K_c)] — at the
  1/4-degree x 10 benchmark that cuts the per-window input planes 10 -> 8.
- ``column`` (the single-layer model): A_u = h_u*dy_fc carries the continuous
  column depth (not expressible as global x scalar), so the per-layer slab
  keeps [A_u, A_v, IV (, K_u, K_v, K_c)] as in v2.

Shifts are `pltpu.roll` in both axes (y reach 4 < 8 overlap rows). Validity:
cells within the stencil radius of the array edge are garbage — the usual
halo contract. Parity pinned in tests/test_pallas_adv.py (contraction-band
tolerances) and compiled in tests_tpu/test_pallas_adv_tpu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .advection import _weno5_left

__all__ = ["tracer_adv_pallas", "pack_adv_statics", "pack_adv_statics_layered",
           "DEFAULT_BLOCK_ROWS_ADV"]

# Layered-mode block choice, round 5, decided END-TO-END: the corrected
# isolated sweep (TRUE layered mode with g_pack + dz — the earlier sweep had
# silently fallen back to column mode and read the stride-4 pack at stride 3,
# see benchmarks/sweep_window_kernels.py) ranks 104 > 80 > 48 >> 128/160
# (2386/2492/2762/3035/3204 us at probe 623), but an interleaved A/B of the
# FULL layered step puts 48 ahead of 104 (11.47 vs 11.65 ms/step, probes
# 651-712): in-step, the smaller window coexists better with the XLA
# slices' buffers than the isolated scan predicts. The in-step measurement
# is the one that ships. Single-layer column mode keeps the round-4 104.
DEFAULT_BLOCK_ROWS_ADV = 104
DEFAULT_BLOCK_ROWS_ADV_LAYERED = 48
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
    """COLUMN-mode static pack (the single-layer model): (Nz*S, Yb, Xb) with
    plane k*S+i = layer k's i-th factor, S = 3 or 6, order
    [A_u, A_v, IV (, K_u, K_v, K_c)]. Call once at model build."""
    parts = [a_u, a_v, inv_vol] + ([k_u, k_v, k_c] if k_u is not None else [])
    nz = a_u.shape[0]
    return jnp.concatenate(
        [jnp.stack([p[k] for p in parts]) for k in range(nz)])


def pack_adv_statics_layered(inv_vol, k_u=None, k_v=None, k_c=None):
    """LAYERED-mode static pack: (Nz*S, Yb, Xb), S = 1 or 4, order
    [IV (, K_u, K_v, K_c)] — the flux factors ride as the global dy_fc/dx_cf
    planes + static dz (u/v are masked prognostics; module docstring)."""
    parts = [inv_vol] + ([k_u, k_v, k_c] if k_u is not None else [])
    nz = inv_vol.shape[0]
    return jnp.concatenate(
        [jnp.stack([p[k] for p in parts]) for k in range(nz)])


def _kernel(*args, nz, n_tr, S, B, W, n_prog, Yb_pad, Xb, has_diff, layered,
            has_acc):
    args = list(args)
    if layered:
        dz_ref, c_ref, u_ref, v_ref, s_ref, g_ref = args[:6]
        del args[:6]
    else:
        c_ref, u_ref, v_ref, s_ref = args[:4]
        del args[:4]
        g_ref = dz_ref = None
    acc_ref = args.pop(0) if has_acc else None
    out_ref, cbuf, ubuf, vbuf, sbuf = args[:5]
    del args[:5]
    gbuf = args.pop(0) if layered else None
    abuf = args.pop(0) if has_acc else None
    obuf, in_sems, g_sem, out_sems = args
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
                                      in_sems.at[sl, 1]),
                pltpu.make_async_copy(s_ref.at[pl.ds(kk * S, S), rows, :],
                                      sbuf.at[sl], in_sems.at[sl, 2])]
        for t in range(n_tr):
            dmas.append(pltpu.make_async_copy(
                c_ref.at[t * nz + kk, rows, :], cbuf.at[sl, t],
                in_sems.at[sl, 3 + t]))
        if has_acc:
            # vert-kernel contributions accumulated in-window (layered.py):
            # the add rides the compute-bound sweep instead of a separate
            # XLA read(G_adv)+read(dG_vert)+write(G) full-stack pass
            for t in range(n_tr):
                dmas.append(pltpu.make_async_copy(
                    acc_ref.at[t * nz + kk, rows, :], abuf.at[sl, t],
                    in_sems.at[sl, 3 + n_tr + t]))
        return dmas

    def out_dmas(jj, kk):
        start = jnp.clip(jj * B - _OV, 0, Yb_pad - W)
        start = pl.multiple_of(start, 8)
        off = pl.multiple_of(jj * B - start, 8)
        rows_out = pl.ds(jj * B, B)
        return [pltpu.make_async_copy(
                    obuf.at[t, pl.ds(off, B), :],
                    out_ref.at[t * nz + kk, rows_out, :], out_sems.at[t])
                for t in range(n_tr)]

    @pl.when(p == 0)
    def _():
        for d in in_dmas(0, 0, 0):
            d.start()

    if layered:
        # global flux-metric planes (dy_fc, dx_cf): once per row block
        @pl.when(k == 0)
        def _():
            dma = pltpu.make_async_copy(g_ref.at[:, _rows(j), :], gbuf, g_sem)
            dma.start()
            dma.wait()

    for d in in_dmas(j, k, slot):
        d.wait()

    @pl.when(p + 1 < n_prog * nz)
    def _():
        nxt = jax.lax.rem(p + 1, jnp.int32(2))
        last = k + 1 == nz
        jn = jax.lax.select(last, j + 1, j)
        kn = jax.lax.select(last, jnp.int32(0), k + 1)
        for d in in_dmas(jn, kn, nxt):
            d.start()

    @pl.when(p > 0)
    def _():
        kp = jax.lax.select(k == 0, jnp.int32(nz - 1), k - 1)
        jp = jax.lax.select(k == 0, j - 1, j)
        for d in out_dmas(jp, kp):
            d.wait()

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

    u = ubuf[slot]
    v = vbuf[slot]
    pos_x = u > 0.0
    pos_y = v > 0.0
    if layered:
        IV = 0
        KU, KV, KC = 1, 2, 3
        # A_u*u == dz_k*dy_fc*u for masked u (module docstring); dz_k rides
        # as a scalar-prefetch operand indexed by the layer program id
        dzk = dz_ref[k]
        fu = (dzk * gbuf[0]) * u
        fv = (dzk * gbuf[1]) * v
    else:
        AU, AV, IV = 0, 1, 2
        KU, KV, KC = 3, 4, 5
        fu = u * sbuf[slot, AU]
        fv = v * sbuf[slot, AV]
    for t in range(n_tr):
        c = cbuf[slot, t]
        cx = weno_faces(c, pos_x, rollm_x, rollp_x)
        fx = fu * cx
        gx = rollp_x(fx) - fx
        cy = weno_faces(c, pos_y, rollm_y, rollp_y)
        fy = fv * cy
        gy = rollp_y(fy) - fy
        G = -(gx + gy) * sbuf[slot, IV]
        if has_diff:
            gxd = (c - rollm_x(c)) * sbuf[slot, KU]
            gyd = (c - rollm_y(c)) * sbuf[slot, KV]
            G = G + ((rollp_x(gxd) - gxd) + (rollp_y(gyd) - gyd)) \
                * sbuf[slot, KC]
        if has_acc:
            # same add order as the XLA assembly (G_adv_total + dG_vert)
            G = G + abuf[slot, t]
        obuf[t] = G

    for d in out_dmas(j, k):
        d.start()

    @pl.when(p + 1 == n_prog * nz)
    def _():
        for d in out_dmas(j, k):
            d.wait()


def tracer_adv_pallas(c, u, v, a_u=None, a_v=None, inv_vol=None, k_u=None,
                      k_v=None, k_c=None, statics_packed=None, g_pack=None,
                      dz=None, acc=None, block_rows=None, interpret=False):
    """Horizontal tracer-advection (+ optional fused kappa_h diffusion)
    tendency, one double-buffered Pallas pass.

    ``c``: (P, Yb, Xb) tracer planes (P = n_tracers * Nz, tracer-major:
    plane t*Nz + k is tracer t at layer k); ``u``/``v``: (Nz, Yb, Xb).

    Two static-factor modes (module docstring):
    - COLUMN (single-layer): separate per-layer planes ``a_u``/``a_v``/
      ``inv_vol`` (+ ``k_u``/``k_v``/``k_c``) or a ``statics_packed`` from
      :func:`pack_adv_statics`.
    - LAYERED: ``statics_packed`` from :func:`pack_adv_statics_layered`
      (S = 1 or 4) PLUS ``g_pack`` = (2, Yb, Xb) stacked [dy_fc, dx_cf] and
      the static per-layer thickness tuple ``dz``; requires MASKED u/v.

    All halo-filled. Returns the (P, Yb, Xb) tendency; only cells with
    full-stencil validity (>= 4 rows/columns from the array edge) are
    meaningful.

    ``acc``: optional (P, Yb, Xb) additive contribution (the z-resident
    column kernel's dGc, models/layered.py) accumulated INTO the output
    windows — same float order as the XLA assembly ``G_adv + dGc``, but the
    read rides this kernel's compute-bound sweep instead of a separate
    full-stack XLA add pass."""
    P, Yb, Xb = c.shape
    nz = u.shape[0]
    assert P % nz == 0, (P, nz)
    n_tr = P // nz
    layered = g_pack is not None
    if layered:
        assert statics_packed is not None and dz is not None
        S = statics_packed.shape[0] // nz
        assert S in (1, 4), statics_packed.shape
        has_diff = S == 4
    else:
        has_diff = (k_u is not None) or (
            statics_packed is not None and statics_packed.shape[0] == 6 * nz)
        S = 6 if has_diff else 3
        if statics_packed is None:
            statics_packed = pack_adv_statics(a_u, a_v, inv_vol, k_u, k_v, k_c)
    if block_rows is None:
        B0 = DEFAULT_BLOCK_ROWS_ADV_LAYERED if layered else DEFAULT_BLOCK_ROWS_ADV
    else:
        B0 = block_rows
    B, W, n_prog, Yb_pad = _geometry(Yb, B0)
    Xb_pad = -128 * (-Xb // 128)

    def pad(a):
        if a.shape[-2:] == (Yb_pad, Xb_pad):
            return a
        return jnp.pad(a, ((0, 0), (0, Yb_pad - a.shape[-2]),
                           (0, Xb_pad - a.shape[-1])))

    has_acc = acc is not None
    operands = [pad(c), pad(u), pad(v), pad(statics_packed)]
    if layered:
        operands.append(pad(g_pack))
    if has_acc:
        assert acc.shape == (P, Yb, Xb), (acc.shape, c.shape)
        operands.append(pad(acc))

    kern = functools.partial(_kernel, nz=nz, n_tr=n_tr, S=S, B=B, W=W,
                             n_prog=n_prog, Yb_pad=Yb_pad, Xb=Xb_pad,
                             has_diff=has_diff, layered=layered,
                             has_acc=has_acc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if layered else 0,
        grid=(n_prog, nz),  # row blocks OUTER, layers INNER
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(operands),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, n_tr, W, Xb_pad), c.dtype),   # c windows
            pltpu.VMEM((2, W, Xb_pad), c.dtype),         # u
            pltpu.VMEM((2, W, Xb_pad), c.dtype),         # v
            pltpu.VMEM((2, S, W, Xb_pad), c.dtype),      # per-layer statics
        ] + ([pltpu.VMEM((2, W, Xb_pad), c.dtype)] if layered else [])
        + ([pltpu.VMEM((2, n_tr, W, Xb_pad), c.dtype)] if has_acc else [])
        + [
            pltpu.VMEM((n_tr, W, Xb_pad), c.dtype),      # G staging
            pltpu.SemaphoreType.DMA((2, 3 + (2 if has_acc else 1) * n_tr)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((n_tr,)),
        ],
    )
    kwargs = {}
    if not interpret:
        n_planes = (2 * (n_tr + 2 + S) + n_tr + (2 if layered else 0)
                    + (2 * n_tr if has_acc else 0))
        foot = n_planes * W * Xb_pad * jnp.dtype(c.dtype).itemsize
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(foot + 32 * 2**20))
    if layered:
        operands = [jnp.asarray(dz, c.dtype)] + operands
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
