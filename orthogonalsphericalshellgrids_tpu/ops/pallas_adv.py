"""Pallas TPU kernel: horizontal flux-form tracer advection, VMEM-resident.

The layered tendency path is memory-bound (docs/performance.md): the XLA-fused
tracer slice materializes its `jnp.roll` stencil shifts through fusion boundaries,
paying full-array HBM round-trips per intermediate, and `benchmarks/weno_sol.py`
measures the in-VMEM WENO-5 reconstruction rate at ~2x the XLA-fused rate. The
round-2 negative result (a fully fused 21-plane tendency mega-kernel, measured
slower) pinned the realizable shape: NARROW kernels with few planes resident.
This is that kernel for the tracer x+y slice:

    cx = weno5_upwind_faces_from_centers(c, u, axis=-1)
    cy = weno5_upwind_faces_from_centers(c, v, axis=-2)
    G  = -(dxc(u*A_u*cx) + dyc(v*A_v*cy)) * IV        [models/layered.py:627-632]

per tracer plane, with A_u = dzu*dy_fc, A_v = dzv*dx_cf, IV = mask*inv(az*dz)
precomputed per layer (step-invariant; models/layered.make_layered_model). Six
input planes -> one output plane, ~7 resident windows.

Window geometry (the pallas_baro pattern): grid = (n_planes, n_row_blocks); each
program DMAs a (B + 16)-row window of the six inputs into VMEM (8 alignment rows
each side cover the radius-4 y stencil), computes with `pltpu.roll` in x and
STATIC row slices in y, and writes the B-row output block. Row padding to
n_prog*B rows keeps the clipped window starts sublane-aligned (provable via
`pl.multiple_of`). Values match the XLA path: identical op order (the kernel
calls the same `_weno5_left`), only the shift implementation differs — parity is
pinned in tests/test_pallas_adv.py (bitwise in interpret mode; the compiled
kernel may differ from the XLA fusion by FMA-contraction rounding, same band as
the barotropic kernel's pin).

Validity: output rows/columns within the stencil radius of the array edge read
x-wrap/zero padding and are NOT meaningful — exactly the usual halo contract
(the models only consume interior tendency cells; halo cells of G are recomputed
from refilled fields next step). Reference workload context:
`/root/reference/examples/bickley_jet.jl:48` (WENO-5 flux-form tracer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .advection import _weno5_left

__all__ = ["tracer_adv_pallas", "DEFAULT_BLOCK_ROWS_ADV"]

DEFAULT_BLOCK_ROWS_ADV = 224
_OV = 8  # alignment rows each side (covers the radius-4 stencil, sublane multiple)


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


def _kernel(c_ref, u_ref, v_ref, au_ref, av_ref, iv_ref, *rest,
            nz, B, W, Yb_pad, Xb, has_diff):
    if has_diff:
        (ku_ref, kv_ref, kc_ref, out_ref,
         cbuf, ubuf, vbuf, aubuf, avbuf, ivbuf, kubuf, kvbuf, kcbuf, gbuf,
         sems) = rest
    else:
        out_ref, cbuf, ubuf, vbuf, aubuf, avbuf, ivbuf, gbuf, sems = rest
    p = pl.program_id(0)   # tracer plane index
    j = pl.program_id(1)   # row block
    k = p % nz             # layer index for u/v/metric planes
    start = jnp.clip(j * B - _OV, 0, Yb_pad - W)
    start = pl.multiple_of(start, 8)
    off = pl.multiple_of(j * B - start, 8)

    copies = [
        pltpu.make_async_copy(c_ref.at[p, pl.ds(start, W), :], cbuf, sems.at[0]),
        pltpu.make_async_copy(u_ref.at[k, pl.ds(start, W), :], ubuf, sems.at[1]),
        pltpu.make_async_copy(v_ref.at[k, pl.ds(start, W), :], vbuf, sems.at[2]),
        pltpu.make_async_copy(au_ref.at[k, pl.ds(start, W), :], aubuf, sems.at[3]),
        pltpu.make_async_copy(av_ref.at[k, pl.ds(start, W), :], avbuf, sems.at[4]),
        pltpu.make_async_copy(iv_ref.at[k, pl.ds(start, W), :], ivbuf, sems.at[5]),
    ]
    if has_diff:
        copies += [
            pltpu.make_async_copy(ku_ref.at[k, pl.ds(start, W), :], kubuf,
                                  sems.at[6]),
            pltpu.make_async_copy(kv_ref.at[k, pl.ds(start, W), :], kvbuf,
                                  sems.at[7]),
            pltpu.make_async_copy(kc_ref.at[k, pl.ds(start, W), :], kcbuf,
                                  sems.at[8]),
        ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    # Shifts are circular rolls — identical to the XLA path's jnp.roll semantics
    # in x (halo-filled wrap) and edge-garbage-in-the-discarded-overlap in y
    # (total y reach 4 < _OV = 8, so output rows never see the wrap rows).
    def rollm_x(a, n=1):   # a[i-n]
        return pltpu.roll(a, n, 1)

    def rollp_x(a, n=1):   # a[i+n]
        return pltpu.roll(a, Xb - n, 1)

    def rollm_y(a, n=1):   # a[j-n]
        return pltpu.roll(a, n, 0)

    def rollp_y(a, n=1):   # a[j+n]
        return pltpu.roll(a, W - n, 0)

    c = cbuf[...]
    u = ubuf[...]
    v = vbuf[...]

    # --- x faces: upwind WENO-5 on input-selected taps (advection.py:112-131)
    pos = u > 0.0

    def sel(a, b):
        return jnp.where(pos, a, b)

    cm1 = rollm_x(c)
    cm2 = rollm_x(c, 2)
    cm3 = rollm_x(c, 3)
    cp1 = rollp_x(c)
    cp2 = rollp_x(c, 2)
    cx = _weno5_left(sel(cm3, cp2), sel(cm2, cp1), sel(cm1, c), sel(c, cm1),
                     sel(cp1, cm2))
    fx = u * aubuf[...] * cx
    gx = rollp_x(fx) - fx                      # dxc

    # --- y faces: same reconstruction along the sublane axis
    pos_y = v > 0.0

    def sely(a, b):
        return jnp.where(pos_y, a, b)

    ym1 = rollm_y(c)
    ym2 = rollm_y(c, 2)
    ym3 = rollm_y(c, 3)
    yp1 = rollp_y(c)
    yp2 = rollp_y(c, 2)
    cy = _weno5_left(sely(ym3, yp2), sely(ym2, yp1), sely(ym1, c), sely(c, ym1),
                     sely(yp1, ym2))
    fy = v * avbuf[...] * cy
    gy = rollp_y(fy) - fy                      # dyc

    G = -(gx + gy) * ivbuf[...]

    if has_diff:
        # fused kappa_h Laplacian (ops/closures.laplacian_c with kappa and the
        # face masks/metric ratios prefactored into ku/kv, inv-area*mask into
        # kc): the window is already resident, the stencil reach (2) is far
        # inside the overlap
        gxd = (c - rollm_x(c)) * kubuf[...]          # dxf(c) at u faces
        gyd = (c - rollm_y(c)) * kvbuf[...]          # dyf(c) at v faces
        G = G + ((rollp_x(gxd) - gxd) + (rollp_y(gyd) - gyd)) * kcbuf[...]

    # dynamic_slice of a VALUE does not lower in Mosaic; stage through a VMEM
    # ref and slice the ref (pl.ds with the 8-aligned offset hint)
    gbuf[...] = G
    out_ref[0] = gbuf[pl.ds(off, B), :]


def tracer_adv_pallas(c, u, v, a_u, a_v, inv_vol, k_u=None, k_v=None, k_c=None,
                      block_rows=None, interpret=False):
    """Horizontal tracer-advection (+ optional fused kappa_h diffusion)
    tendency, one Pallas pass.

    ``c``: (P, Yb, Xb) tracer planes (P = n_tracers * Nz); ``u``/``v``/
    ``a_u``/``a_v``/``inv_vol``: (Nz, Yb, Xb) per-layer velocity and static
    factor planes — plane p uses layer p % Nz. Pass ``k_u``/``k_v``/``k_c``
    (kappa*metric-ratio*face-mask at u/v faces; inv-area*mask at centers) to
    also add the five-point Laplacian closure of ops/closures.laplacian_c in
    the same window. All halo-filled. Returns the (P, Yb, Xb) tendency; only
    cells with full-stencil validity (everything at least 4 rows / 4 columns
    from the array edge — satisfied by every interior cell at halo >= 5) are
    meaningful."""
    P, Yb, Xb = c.shape
    nz = u.shape[0]
    has_diff = k_u is not None
    B0 = DEFAULT_BLOCK_ROWS_ADV if block_rows is None else block_rows
    B, W, n_prog, Yb_pad = _geometry(Yb, B0)
    Xb_pad = -128 * (-Xb // 128)

    def pad(a):
        if a.shape[-2:] == (Yb_pad, Xb_pad):
            return a
        return jnp.pad(a, ((0, 0), (0, Yb_pad - a.shape[-2]),
                           (0, Xb_pad - a.shape[-1])))

    operands = [pad(a) for a in (c, u, v, a_u, a_v, inv_vol)]
    if has_diff:
        operands += [pad(a) for a in (k_u, k_v, k_c)]
    n_in = len(operands)

    kern = functools.partial(_kernel, nz=nz, B=B, W=W, Yb_pad=Yb_pad,
                             Xb=Xb_pad, has_diff=has_diff)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(P, n_prog),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=pl.BlockSpec((1, B, Xb_pad), lambda p, j: (p, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W, Xb_pad), c.dtype)
                        for _ in range(n_in + 1)]
        + [pltpu.SemaphoreType.DMA((n_in,))],
    )
    kwargs = {}
    if not interpret:
        # working-set headroom: Mosaic's own temporaries for the WENO chain
        # measured ~24 MB beyond the declared buffers at B=224 (the 9-operand
        # fused-diffusion variant hit 38.64M total); 32 MB clears it with margin
        foot = (n_in * W + B) * Xb_pad * jnp.dtype(c.dtype).itemsize
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
