"""Pallas TPU kernel: z-resident column pass — every layer-coupled vertical
term of the layered tendency evaluation in ONE VMEM-resident window sweep.

The round-4 roofline (docs/performance.md, layered section) left the layered
engine ~2x above its HBM-traffic floor; the named lever was the vertical slice,
which in XLA materializes full (Nz, Y, X) intermediates through HBM: the
interface velocity w (reverse layer cumsum of the flux divergence), the
advective w-transport of u/v, the Centered vertical tracer flux, the explicit
vertical Laplacians, and the EOS -> hydrostatic-pressure cumsum (~4-4.5 ms
isolated at 1/4-degree x 10). This kernel computes, per (row-window) and with
ALL Nz layers resident (models/layered.py cites each formula):

    hdiv_k = (dxc(Au_k u_k) + dyc(Av_k v_k)) * inv_az          [vertical_velocity]
    w_j    = -sum_{k>=j} hdiv_k           (interfaces j = 1..Nz-1; w_Nz = 0)
    dGu_k  = -w-advect(ixf(w), u)_k  [+ nu_v lapz(u)_k]        [_w_advect, _vertical_laplacian]
    dGv_k  = -w-advect(iyf(w), v)_k  [+ nu_v lapz(v)_k]
    p_k    = -(cumsum_k(b dz) - dz_k b_k / 2);  b from the linear EOS (T/S),
             the prognostic buoyancy tracer, or absent                [_hydrostatic_pressure]
    dGu_k -= dxf(p_k) * inv_dx;  dGv_k -= dyf(p_k) * inv_dy
    dGc_tk = (-dz_k^-1 (F_k - F_{k+1}) [+ kappa_v lapz(c_t)_k]) * mask_c_k,
             F_j = w_j (c_{t,j-1} + c_{t,j}) / 2               [_vertical_tracer_div]

returning ADDITIVE contributions (dGu, dGv, dGc) for the horizontal tendencies
— w, the pressure stack, and every interface flux live only in VMEM. The
horizontal reach is radius 1 (ixf/iyf/dxf/dyf/dxc/dyc), far inside the 8-row
window overlap; cells within 1 row/column of the array edge are garbage (the
usual halo contract). Layer geometry (dz, dzc) and the EOS constants are
STATIC Python floats baked into the kernel.

Pipeline: grid = (n_prog,) over row blocks with CROSS-PROGRAM double buffering
— TPU grid programs run sequentially on one core and scratch persists across
them, so program j waits on the input windows program j-1 prefetched, starts
program j+1's fetch, computes, and drains its output copy during program j+1's
compute. Parity pinned in tests/test_pallas_vert.py (contraction-band: the
in-kernel sequential layer sums reassociate XLA's cumsum) and on the real chip
in tests_tpu/test_pallas_vert_tpu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["vertical_pallas", "pack_vert_statics", "auto_block_rows_vert",
           "DEFAULT_BLOCK_ROWS_VERT"]

DEFAULT_BLOCK_ROWS_VERT = None  # auto (see auto_block_rows_vert)
_OV = 8  # window overlap (sublane multiple; stencil radius is only 1)


def pack_vert_statics(mask_c, mask_u=None, mask_v=None):
    """Layer-major static pack (Nz*S, Yb, Xb), S = 1 (3 with the u/v masks the
    explicit nu_v Laplacian needs): plane k*S+i = layer k's i-th factor, in
    order [mask_c (, mask_u, mask_v)]. Call once at model build.

    The horizontal flux factors Au = dzu*dy_fc / Av = dzv*dx_cf do NOT ride as
    per-layer planes: u/v are masked prognostics (zero on land, including the
    fold/wrap halos — the model masks every velocity update and the halo fill
    only copies/sign-flips), so Au*u == dz_k * dy_fc * u exactly and the kernel
    uses the two GLOBAL metric planes + the static dz_k instead — 20 fewer
    DMA planes per window at the benchmark shape."""
    parts = [mask_c] + ([mask_u, mask_v] if mask_u is not None else [])
    nz = mask_c.shape[0]
    return jnp.concatenate([jnp.stack([p[k] for p in parts]) for k in range(nz)])


def _geometry(Yb, block_rows):
    Yb8 = -8 * (-Yb // 8)
    B = block_rows
    W = B + 2 * _OV
    if W >= Yb8:
        return Yb8, Yb8, 1, Yb8  # single full-height window (circular rolls)
    n_prog = -(-Yb // B)
    return B, W, n_prog, n_prog * B


def auto_block_rows_vert(Yb, Xb, nz, P, S, itemsize=4, block_rows=None,
                         vmem_budget_bytes=None):
    """Block size minimizing total processed rows (n_prog * W) under the VMEM
    budget — same objective as ops/pallas_baro.auto_block_rows. Footprint: two
    input-window slots of (2nz + P + nz*S + 3) planes plus ONE output staging
    slot of (2nz + P) planes, all at W rows."""
    if block_rows is not None:
        return block_rows
    if vmem_budget_bytes is None:
        from .pallas_baro import _device_vmem_budget

        # round-5 sweep (v5e, 1/4-degree x 10, probe 615 GB/s): B=40 (a 65 MB
        # window) compiles, runs, and beats the 60 MB-budget pick B=32 by ~8%
        # (2016 vs 2191 us isolated) — give this chooser 9/8 of the device
        # budget so it admits that window on v5-class parts
        vmem_budget_bytes = _device_vmem_budget() * 9 // 8
    Xb_pad = -128 * (-Xb // 128)
    Yb8 = -8 * (-Yb // 8)
    n_in = 2 * nz + P + nz * S + 5
    n_out = 2 * nz + P
    best = None
    for B in range(8, Yb8 + 8, 8):
        Bk, W, n_prog, _ = _geometry(Yb, B)
        footprint = (2 * n_in + n_out) * W * Xb_pad * itemsize
        if footprint > vmem_budget_bytes:
            if Bk != B:
                break  # single-window case too big: larger B won't shrink it
            continue
        cand = (n_prog * W, footprint, Bk)
        if best is None or cand < best:
            best = cand
        if Bk != B:
            break
    return 8 if best is None else best[2]


def _kernel(u_ref, v_ref, c_ref, s_ref, g_ref, out_ref,
            ubuf, vbuf, cbuf, sbuf, gbuf, obuf, in_sems, out_sem, *,
            nz, P, S, B, W, n_prog, Yb_pad, Xb, dz, dzc, mode, bconst,
            nu_v, kappa_v):
    j = pl.program_id(0)
    slot = jax.lax.rem(j, jnp.int32(2))

    def in_dmas(jj, sl):
        start = jnp.clip(jj * B - _OV, 0, Yb_pad - W)
        start = pl.multiple_of(start, 8)
        rows = pl.ds(start, W)
        return [
            pltpu.make_async_copy(u_ref.at[:, rows, :], ubuf.at[sl],
                                  in_sems.at[sl, 0]),
            pltpu.make_async_copy(v_ref.at[:, rows, :], vbuf.at[sl],
                                  in_sems.at[sl, 1]),
            pltpu.make_async_copy(c_ref.at[:, rows, :], cbuf.at[sl],
                                  in_sems.at[sl, 2]),
            pltpu.make_async_copy(s_ref.at[:, rows, :], sbuf.at[sl],
                                  in_sems.at[sl, 3]),
            pltpu.make_async_copy(g_ref.at[:, rows, :], gbuf.at[sl],
                                  in_sems.at[sl, 4]),
        ]

    def out_dma(jj):
        start = jnp.clip(jj * B - _OV, 0, Yb_pad - W)
        start = pl.multiple_of(start, 8)
        off = pl.multiple_of(jj * B - start, 8)
        # obuf planes: [dgu (nz) | dgv (nz) | dgc (P)] stacked
        return pltpu.make_async_copy(
            obuf.at[:, pl.ds(off, B), :],
            out_ref.at[:, pl.ds(jj * B, B), :],
            out_sem)

    # cold start: program 0 fetches its own windows
    @pl.when(j == 0)
    def _():
        for d in in_dmas(0, 0):
            d.start()

    for d in in_dmas(j, slot):
        d.wait()

    # prefetch the next window while this one computes
    @pl.when(j + 1 < n_prog)
    def _():
        nxt = jax.lax.rem(j + 1, jnp.int32(2))
        for d in in_dmas(j + 1, nxt):
            d.start()

    # single-slot output staging: drain the previous program's output copy
    # before the compute below overwrites obuf (it had a full compute phase
    # to complete in, so this wait is ~free)
    @pl.when(j > 0)
    def _():
        out_dma(j - 1).wait()

    def rollm_x(a):
        return pltpu.roll(a, 1, 1)

    def rollp_x(a):
        return pltpu.roll(a, Xb - 1, 1)

    def rollm_y(a):
        return pltpu.roll(a, 1, 0)

    def rollp_y(a):
        return pltpu.roll(a, W - 1, 0)

    u = [ubuf[slot, k] for k in range(nz)]
    v = [vbuf[slot, k] for k in range(nz)]

    def MC(k):
        return sbuf[slot, k * S + 0]

    IAZ = gbuf[slot, 0]
    IDX = gbuf[slot, 1]
    IDY = gbuf[slot, 2]
    DYFC = gbuf[slot, 3]
    DXCF = gbuf[slot, 4]

    # --- interface velocities w_j (j = 1..nz-1), accumulated from the floor.
    # u/v are masked prognostics (see pack_vert_statics), so the flux factors
    # collapse to the global metric planes times the static layer thickness.
    w = [None] * nz  # w[j] = velocity at the TOP interface of layer j
    acc = None
    for k in range(nz - 1, 0, -1):
        fu = DYFC * u[k]
        fv = DXCF * v[k]
        hdiv = dz[k] * ((rollp_x(fu) - fu) + (rollp_y(fv) - fv)) * IAZ
        acc = hdiv if acc is None else acc + hdiv
        w[k] = -acc

    # --- vertical momentum advection (+ optional explicit nu_v Laplacian)
    rdzc = [1.0 / d for d in dzc]  # interface j spans dzc[j-1]
    du = [None] * nz
    dv = [None] * nz
    for jf in range(1, nz):
        du[jf] = (u[jf - 1] - u[jf]) * rdzc[jf - 1]
        dv[jf] = (v[jf - 1] - v[jf]) * rdzc[jf - 1]
    cu = [0.5 * (w[jf] + rollm_x(w[jf])) * du[jf] for jf in range(1, nz)]
    cv = [0.5 * (w[jf] + rollm_y(w[jf])) * dv[jf] for jf in range(1, nz)]
    cu = [None] + cu + [None]  # index by interface, None at surface/floor
    cv = [None] + cv + [None]

    def _edge_sum(lo, hi):
        if lo is None and hi is None:
            return None
        if lo is None:
            return hi
        if hi is None:
            return lo
        return lo + hi

    dgu = [None] * nz
    dgv = [None] * nz
    for k in range(nz):
        su = _edge_sum(cu[k], cu[k + 1])
        sv = _edge_sum(cv[k], cv[k + 1])
        dgu[k] = -0.5 * su if su is not None else jnp.zeros_like(u[k])
        dgv[k] = -0.5 * sv if sv is not None else jnp.zeros_like(v[k])

    if nu_v > 0.0:
        # flux-form explicit vertical viscosity with solid-interface masking
        Fu = [du[jf] * (sbuf[slot, (jf - 1) * S + 1] * sbuf[slot, jf * S + 1])
              for jf in range(1, nz)]
        Fv = [dv[jf] * (sbuf[slot, (jf - 1) * S + 2] * sbuf[slot, jf * S + 2])
              for jf in range(1, nz)]
        Fu = [None] + Fu + [None]
        Fv = [None] + Fv + [None]
        for k in range(nz):
            t = _edge_sum(Fu[k], None if Fu[k + 1] is None else -Fu[k + 1])
            if t is not None:
                dgu[k] = dgu[k] + (nu_v / dz[k]) * t
            t = _edge_sum(Fv[k], None if Fv[k + 1] is None else -Fv[k + 1])
            if t is not None:
                dgv[k] = dgv[k] + (nu_v / dz[k]) * t

    # --- hydrostatic pressure gradient from the EOS / buoyancy tracer
    if mode != "none":
        g_b, alpha, beta, T0, S0, it_T, it_S, it_B = bconst
        csum = None
        for k in range(nz):
            if mode == "linear_eos":
                b = None
                if it_T >= 0:
                    b = alpha * (cbuf[slot, it_T * nz + k] - T0)
                if it_S >= 0:
                    t = beta * (cbuf[slot, it_S * nz + k] - S0)
                    b = -t if b is None else b - t
                b = g_b * b * MC(k)
            else:  # prognostic buoyancy tracer rides as plane block it_B
                b = cbuf[slot, it_B * nz + k]
            bdz = dz[k] * b
            csum = bdz if csum is None else csum + bdz
            p = 0.5 * bdz - csum  # = -(csum - dz/2 * b)
            dgu[k] = dgu[k] - (p - rollm_x(p)) * IDX
            dgv[k] = dgv[k] - (p - rollm_y(p)) * IDY

    for k in range(nz):
        obuf[k] = dgu[k]
        obuf[nz + k] = dgv[k]

    # --- tracers: Centered vertical flux divergence (+ optional kappa_v)
    n_tr = P // nz
    for t in range(n_tr):
        c = [cbuf[slot, t * nz + k] for k in range(nz)]
        F = [w[jf] * (0.5 * (c[jf - 1] + c[jf])) for jf in range(1, nz)]
        F = [None] + F + [None]
        if kappa_v > 0.0:
            D = [(c[jf - 1] - c[jf]) * rdzc[jf - 1]
                 * (sbuf[slot, (jf - 1) * S + 0] * sbuf[slot, jf * S + 0])
                 for jf in range(1, nz)]
            D = [None] + D + [None]
        for k in range(nz):
            s = _edge_sum(F[k], None if F[k + 1] is None else -F[k + 1])
            G = (-1.0 / dz[k]) * s if s is not None else jnp.zeros_like(c[k])
            if kappa_v > 0.0:
                s = _edge_sum(D[k], None if D[k + 1] is None else -D[k + 1])
                if s is not None:
                    G = G + (kappa_v / dz[k]) * s
            obuf[2 * nz + t * nz + k] = G * MC(k)

    out_dma(j).start()

    # obuf is single-slot: program j+1 drains this copy before overwriting the
    # staging (the wait at its top); the LAST program drains its own here.
    @pl.when(j + 1 == n_prog)
    def _():
        out_dma(j).wait()


def vertical_pallas(u, v, c, s_pack, g_pack, *, dz, dzc, mode="none",
                    g_b=0.0, alpha=0.0, beta=0.0, T0=0.0, S0=0.0,
                    it_T=-1, it_S=-1, it_B=-1, nu_v=0.0, kappa_v=0.0,
                    block_rows=None, interpret=False):
    """All layer-coupled vertical tendency terms in one window sweep.

    ``u``/``v``: (Nz, Yb, Xb) halo-filled MASKED velocities (zero on land —
    the model guarantees this; see pack_vert_statics); ``c``: (P, Yb, Xb)
    tracer-major plane stack (the prognostic buoyancy, when present, rides as
    tracer block ``it_B``). ``s_pack`` from :func:`pack_vert_statics`;
    ``g_pack``: (5, Yb, Xb) stacked [inv_az_cc, inv_dx_fc, inv_dy_cf,
    dy_fc, dx_cf].
    ``dz``/``dzc``: static per-layer thickness / interface-spacing tuples.
    ``mode``: "none" | "tracer_b" | "linear_eos". Returns (dGu, dGv, dGc) —
    ADDITIVE contributions; cells within 1 row/column of the edge are garbage.
    """
    nz, Yb, Xb = u.shape
    P = c.shape[0]
    assert P % nz == 0, (P, nz)
    S = s_pack.shape[0] // nz
    assert S in (1, 3) and s_pack.shape[0] == S * nz, s_pack.shape
    assert g_pack.shape[0] == 5, g_pack.shape
    if nu_v > 0.0:
        assert S == 3, "explicit nu_v needs the mask_u/mask_v planes (S=3)"
    B0 = auto_block_rows_vert(Yb, Xb, nz, P, S,
                              jnp.dtype(u.dtype).itemsize, block_rows)
    B, W, n_prog, Yb_pad = _geometry(Yb, B0)
    Xb_pad = -128 * (-Xb // 128)

    def pad(a):
        if a.shape[-2:] == (Yb_pad, Xb_pad):
            return a
        return jnp.pad(a, ((0, 0), (0, Yb_pad - a.shape[-2]),
                           (0, Xb_pad - a.shape[-1])))

    operands = [pad(u), pad(v), pad(c), pad(s_pack), pad(g_pack)]
    bconst = (float(g_b), float(alpha), float(beta), float(T0), float(S0),
              int(it_T), int(it_S), int(it_B))

    kern = functools.partial(
        _kernel, nz=nz, P=P, S=S, B=B, W=W, n_prog=n_prog, Yb_pad=Yb_pad,
        Xb=Xb_pad, dz=tuple(float(x) for x in dz),
        dzc=tuple(float(x) for x in dzc), mode=mode, bconst=bconst,
        nu_v=float(nu_v), kappa_v=float(kappa_v))

    n_out = 2 * nz + P
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, nz, W, Xb_pad), u.dtype),        # u windows
            pltpu.VMEM((2, nz, W, Xb_pad), u.dtype),        # v windows
            pltpu.VMEM((2, P, W, Xb_pad), u.dtype),         # tracer windows
            pltpu.VMEM((2, S * nz, W, Xb_pad), u.dtype),    # per-layer statics
            pltpu.VMEM((2, 5, W, Xb_pad), u.dtype),         # global statics
            pltpu.VMEM((n_out, W, Xb_pad), u.dtype),        # output staging
            pltpu.SemaphoreType.DMA((2, 5)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kwargs = {}
    if not interpret:
        foot = (2 * (2 * nz + P + S * nz + 5) + n_out) * W * Xb_pad \
            * jnp.dtype(u.dtype).itemsize
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(foot + 32 * 2**20))
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, Yb_pad, Xb_pad), u.dtype),
        interpret=interpret,
        **kwargs,
    )(*operands)
    if (Yb_pad, Xb_pad) != (Yb, Xb):
        out = out[:, :Yb, :Xb]
    return out[:nz], out[nz : 2 * nz], out[2 * nz :]
