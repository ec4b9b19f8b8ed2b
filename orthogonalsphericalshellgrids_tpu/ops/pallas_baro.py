"""Pallas TPU kernel: the entire split-explicit barotropic substep loop, time-tiled.

The barotropic loop is the hot loop of the model (SURVEY.md §3.4: the 30x substep
subcycle) and is memory-bound as XLA kernels: every substep re-streams (η, U, V) plus
metrics through HBM (~20 array traversals x ~21 substeps per baroclinic step).

This kernel exploits the same property the reference's widened-halo trick pins
(test/runtests.jl:58-71): with halos of width M+1 the M substeps need NO exchange —
validity just shrinks one row per substep. That makes the loop *temporally tileable*:
load a row-tile (with M+1 rows of overlap) into VMEM once, run ALL substeps in VMEM,
write the averaged results back once. HBM traffic drops from ~M full sweeps to ~1
(times a (B+2M+2)/B read-amplification for the overlap), and ~10 kernels/substep
collapse into a single launch — which matters doubly on backends with high per-kernel
dispatch overhead.

Numerics are identical to models/hydrostatic.barotropic_substeps (same op order,
forward-backward update, SM05-weight accumulation, per-substep periodic x-wrap);
equivalence on the valid interior is pinned by tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["barotropic_substeps_pallas"]


def _kernel(dtau_ref, w_ref, pack_ref, eta_out, U_out, V_out, buf, acc, sem,
            *, n_sub, W, B, Ye, Xe, Nx, Hx):
    p = pl.program_id(0)
    start = jnp.clip(p * B - (W - B) // 2, 0, Ye - W)  # Ye here is the padded row count
    # B, W and Ye are all multiples of 8, so start/off are too — hint Mosaic so the
    # dynamic sublane slices below are provably aligned.
    start = pl.multiple_of(start, 8)
    off = pl.multiple_of(p * B - start, 8)

    # One DMA: the (14, W, Xe) window of the packed operand stack.
    dma = pltpu.make_async_copy(pack_ref.at[:, pl.ds(start, W), :], buf, sem)
    dma.start()
    dma.wait()

    DY_FC, DX_CF, INV_AZ, INV_DX, INV_DY, GHU, GHV, MASK_U, MASK_V = range(9)
    ETA, U, V, GU, GV = 9, 10, 11, 12, 13

    dtau = dtau_ref[0]

    def rollm(a):  # out[j] = a[j-1]
        return pltpu.roll(a, 1, 0)

    def rollp_y(a):  # out[j] = a[j+1]  (pltpu.roll requires non-negative shifts)
        return pltpu.roll(a, W - 1, 0)

    def rollp_x(a):  # out[i] = a[i+1]
        return pltpu.roll(a, Xe - 1, 1)

    def wrap_cols(idx):
        # periodic x-wrap of buffer plane idx (static column slices)
        buf[idx, :, 0:Hx] = buf[idx, :, Nx : Nx + Hx]
        buf[idx, :, Hx + Nx : Hx + Nx + Hx] = buf[idx, :, Hx : 2 * Hx]

    def substep(m, _):
        eta = buf[ETA]
        Uv = buf[U]
        Vv = buf[V]
        # div = dxc(dy_fc*U) + dyc(dx_cf*V), then eta forward step
        fx = buf[DY_FC] * Uv
        fy = buf[DX_CF] * Vv
        div = (rollp_x(fx) - fx + rollp_y(fy) - fy) * buf[INV_AZ]
        buf[ETA] = eta - dtau * div
        wrap_cols(ETA)
        eta = buf[ETA]
        # backward velocity step with the fresh eta
        detadx = eta - pltpu.roll(eta, 1, 1)
        buf[U] = (Uv - dtau * (buf[GHU] * detadx * buf[INV_DX] - buf[GU])) * buf[MASK_U]
        wrap_cols(U)
        detady = eta - rollm(eta)
        buf[V] = (Vv - dtau * (buf[GHV] * detady * buf[INV_DY] - buf[GV])) * buf[MASK_V]
        wrap_cols(V)
        # weighted accumulation over this program's output rows
        w = w_ref[m]
        acc[0] += w * buf[ETA, pl.ds(off, B), :]
        acc[1] += w * buf[U, pl.ds(off, B), :]
        acc[2] += w * buf[V, pl.ds(off, B), :]
        return 0

    acc[...] = jnp.zeros(acc.shape, acc.dtype)
    jax.lax.fori_loop(0, n_sub, substep, 0)

    eta_out[...] = acc[0]
    U_out[...] = acc[1]
    V_out[...] = acc[2]


def barotropic_substeps_pallas(pack_static, eta, U, V, GU, GV, dtau, weights,
                               Nx, Hx, block_rows=96, interpret=False):
    """Run the full barotropic loop in one Pallas kernel.

    ``pack_static``: (9, Ye, Xe) stacked metric operands
    [dy_fc, dx_cf, inv_az_cc, inv_dx_fc, inv_dy_cf, g*h_u, g*h_v, mask_u, mask_v]
    (precomputed once at model build). ``eta/U/V/GU/GV``: (Ye, Xe), halos pre-filled.
    Returns the SM05-weighted averages (eta_a, U_a, V_a).
    """
    Ye, Xe = eta.shape
    n_sub = int(weights.shape[0])
    OV = -8 * (-(n_sub + 1) // 8)  # overlap rounded up to a sublane multiple (8)
    B = block_rows
    assert B % 8 == 0
    W = B + 2 * OV
    if Ye < W:
        # tiny grids: single window covering everything
        B = -8 * (-Ye // 8)
        W = B
    n_prog = pl.cdiv(Ye, B)
    # Pad rows to a multiple of B: with partial last blocks, the dynamic accumulator
    # slice (off, B) could run past the window and silently clamp, shifting rows.
    # Pad lanes to a multiple of 128: the HBM window DMA must slice whole lane tiles.
    # Padded columns only ever hold transient garbage in the x-halo, which the
    # per-substep wrap refreshes before any accumulation.
    Ye_pad = n_prog * B
    Xe_pad = -128 * (-Xe // 128)

    pack = jnp.concatenate(
        [pack_static, jnp.stack([eta, U, V, GU, GV])], axis=0
    )
    if Ye_pad != Ye or Xe_pad != Xe:
        pack = jnp.pad(pack, ((0, 0), (0, Ye_pad - Ye), (0, Xe_pad - Xe)))

    kern = functools.partial(
        _kernel, n_sub=n_sub, W=W, B=B, Ye=Ye_pad, Xe=Xe_pad, Nx=Nx, Hx=Hx
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # dtau (1,), weights (M,)
        grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((B, Xe_pad), lambda p, *_: (p, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        scratch_shapes=[
            pltpu.VMEM((14, W, Xe_pad), eta.dtype),
            pltpu.VMEM((3, B, Xe_pad), eta.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    out_shape = [jax.ShapeDtypeStruct((Ye_pad, Xe_pad), eta.dtype)] * 3
    eta_a, U_a, V_a = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray([dtau], eta.dtype), weights, pack)
    if Ye_pad != Ye or Xe_pad != Xe:
        eta_a, U_a, V_a = (a[:Ye, :Xe] for a in (eta_a, U_a, V_a))
    return eta_a, U_a, V_a
