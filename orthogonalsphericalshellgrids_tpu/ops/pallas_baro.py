"""Pallas TPU kernel: the entire split-explicit barotropic substep loop, time-tiled.

The barotropic loop is the hot loop of the model (SURVEY.md §3.4: the 30x substep
subcycle). As XLA kernels it is dispatch- and bandwidth-bound: every substep re-streams
(η, U, V) plus metrics through HBM across ~10 kernel launches.

This kernel exploits the property the reference's widened-halo trick pins
(test/runtests.jl:58-71): with halos of width M+1 the M substeps need NO exchange —
validity shrinks one row per substep. That makes the loop *temporally tileable*: load a
row-tile (with M+1 rows of overlap, rounded to the sublane multiple) into VMEM once,
run ALL substeps in VMEM, write the averaged results back once.

Layout/geometry rules (Mosaic): window row starts are kept multiples of 8 (sublane) and
the lane dimension is padded to a multiple of 128; the static metric planes are
pre-padded once at model build (``pad_pack``) so the hot path only stacks/pads the five
dynamic planes.

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

__all__ = ["barotropic_substeps_pallas", "pad_pack", "auto_block_rows",
           "DEFAULT_BLOCK_ROWS"]

DEFAULT_BLOCK_ROWS = 152  # v5e sweep at 1/4 deg: 152 > 128 > 96 (see docs/performance.md)

# Scoped-VMEM budget for the auto block chooser. The compiler's default scoped
# limit is 16 MB, but that is a FLAG, not the v5e hardware ceiling:
# barotropic_substeps_pallas auto-raises the limit to its footprint + 4 MB of
# XLA-co-location headroom, and a 58.2 MB single-window kernel (B=728 at the
# 1/4-degree geometry) compiles and RUNS on v5e inside both the single-layer and
# the layered step graphs (round-4 measurements: 691 us/step single-layer —
# ~5% faster than the best multi-window B=152 at 725 us, because a single window
# has ZERO overlap redundancy). 60 MB admits that single window; rounds 2-3's
# 14 MB budget (calibrated to the 16 MB default limit) forced multi-window
# blocks and cost ~8-13% in redundant substep rows.
_VMEM_BUDGET_BYTES = 60 * 2**20
# Older TPU generations (v2/v3: 16 MB VMEM/core; v4: 32 MB) cannot hold the
# 60 MB window — derive the budget from the local device kind (advisor
# finding, round 4) so auto_block_rows never selects a kernel that fails to
# compile at runtime on those parts.
_VMEM_BY_GENERATION = {"v2": 12 * 2**20, "v3": 12 * 2**20, "v4": 28 * 2**20}


def _device_vmem_budget():
    """VMEM budget for the local accelerator: 60 MB on v5-class-or-newer TPUs
    (where the round-4 single-window measurements were taken), derated on
    v2/v3/v4, and the 60 MB default anywhere the device kind is unreadable
    (CPU interpret mode never compiles a Mosaic window, so the budget only
    sizes the geometry there)."""
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return _VMEM_BUDGET_BYTES
    import re

    m = re.search(r"\bv(\d+)", kind)
    if m:
        return _VMEM_BY_GENERATION.get(f"v{m.group(1)}", _VMEM_BUDGET_BYTES)
    return _VMEM_BUDGET_BYTES


def auto_block_rows(Ye, Xe, n_sub, itemsize=4, block_rows=None,
                    vmem_budget_bytes=None):
    """Block size B (multiple of 8) minimizing TOTAL PROCESSED ROWS
    ``n_prog * W`` (W = B + 2*overlap) subject to the kernel VMEM footprint —
    two 5-plane W-row scratch windows plus three B-row output blocks — fitting
    the budget.

    Total processed rows is the actual kernel work (each program runs all
    substeps over its whole W-row window), so max-B-under-budget is the wrong
    objective: at Ye=724, n_sub=21 it picked B=144 (6 programs x 192-row windows
    = 1152 rows) over B=152 (5 x 200 = 1000 rows), a measured ~8% step
    regression (round-3 verdict). Ties in row count break toward the smaller
    VMEM footprint."""
    if block_rows is not None:
        return block_rows
    budget = _device_vmem_budget() if vmem_budget_bytes is None else vmem_budget_bytes
    Xe_pad = -128 * (-Xe // 128)
    Ye_pad8 = -8 * (-Ye // 8)
    best = None  # (total_rows, footprint, B)
    for B in range(8, Ye_pad8 + 8, 8):
        Bk, W, n_prog, _ = _geometry(Ye, n_sub, B)
        footprint = (10 * W + 3 * Bk) * Xe_pad * itemsize
        if footprint > budget:
            continue
        cand = (n_prog * W, footprint, Bk)
        if best is None or cand < best:
            best = cand
        if Bk != B:  # single-window case: larger B is identical, stop
            break
    if best is None:  # nothing fits; fall back to the smallest block
        return 8
    return best[2]


def _geometry(Ye, n_sub, block_rows):
    """(B, W, n_prog, Ye_pad): window geometry shared by pad_pack and the kernel."""
    OV = -8 * (-(n_sub + 1) // 8)  # overlap rounded up to the sublane multiple
    B = block_rows
    W = B + 2 * OV
    if Ye < W:
        B = -8 * (-Ye // 8)
        W = B
    n_prog = -(-Ye // B)
    return B, W, n_prog, n_prog * B


def pad_pack(pack, block_rows: int = DEFAULT_BLOCK_ROWS):
    """Pad a (K, Ye, Xe) operand stack to the kernel's row/lane alignment.

    Row padding covers Ye_pad = ceil(Ye / B) * B (independent of the substep count,
    which only affects the window overlap); lane padding is to a multiple of 128."""
    K, Ye, Xe = pack.shape
    if Ye >= block_rows:
        Ye_pad = -(-Ye // block_rows) * block_rows
    else:
        Ye_pad = -8 * (-Ye // 8)
    Xe_pad = -128 * (-Xe // 128)
    if (Ye_pad, Xe_pad) != (Ye, Xe):
        pack = jnp.pad(pack, ((0, 0), (0, max(0, Ye_pad - Ye)), (0, Xe_pad - Xe)))
    return pack


def _kernel(dtau_ref, w_ref, spack_ref, dpack_ref, eta_out, U_out, V_out,
            sbuf, dbuf, *scratch,
            n_sub, W, B, Ye, Xe, Nx, Hx, wrap=True, acc_window=True):
    # Default (acc_window=False): the SM05 averages accumulate DIRECTLY into the
    # three VMEM output blocks — no accumulator scratch, saving 3*B rows of VMEM
    # (the difference between fitting and OOMing the 16 MB scoped window at 1/4°).
    if acc_window:
        acc, sem_s, sem_d = scratch
    else:
        sem_s, sem_d = scratch
        acc = None
    p = pl.program_id(0)
    start = jnp.clip(p * B - (W - B) // 2, 0, Ye - W)  # Ye = padded row count
    # B, W, Ye are multiples of 8, so start/off are too — hint Mosaic so the dynamic
    # sublane slices below are provably aligned.
    start = pl.multiple_of(start, 8)
    off = pl.multiple_of(p * B - start, 8)

    # Two DMAs: the static metric window and the dynamic state window.
    dma_s = pltpu.make_async_copy(spack_ref.at[:, pl.ds(start, W), :], sbuf, sem_s)
    dma_d = pltpu.make_async_copy(dpack_ref.at[:, pl.ds(start, W), :], dbuf, sem_d)
    dma_s.start()
    dma_d.start()
    dma_s.wait()
    dma_d.wait()

    DY_FC, DX_CF, C_AZ, C_U, C_V = range(5)
    ETA, U, V, GU, GV = range(5)

    dtau = dtau_ref[0]

    # Hoist loop constants IN PLACE (extra temporaries would blow the VMEM budget):
    # the eta/pressure factors and forcing increments absorb dtau once.
    sbuf[C_AZ] = dtau * sbuf[C_AZ]
    sbuf[C_U] = dtau * sbuf[C_U]
    sbuf[C_V] = dtau * sbuf[C_V]
    dbuf[GU] = dtau * dbuf[GU]
    dbuf[GV] = dtau * dbuf[GV]

    def rollm_y(a):  # out[j] = a[j-1]
        return pltpu.roll(a, 1, 0)

    def rollm_x(a):  # out[i] = a[i-1]
        return pltpu.roll(a, 1, 1)

    def rollp_y(a):  # out[j] = a[j+1]  (pltpu.roll requires non-negative shifts)
        return pltpu.roll(a, W - 1, 0)

    def rollp_x(a):  # out[i] = a[i+1]
        return pltpu.roll(a, Xe - 1, 1)

    def wrap_cols(idx):
        # periodic x-wrap of dynamic plane idx (static column slices); disabled for
        # 2-D decompositions where x-validity shrinks into the widened halo instead
        if not wrap:
            return
        dbuf[idx, :, 0:Hx] = dbuf[idx, :, Nx : Nx + Hx]
        dbuf[idx, :, Hx + Nx : Hx + Nx + Hx] = dbuf[idx, :, Hx : 2 * Hx]

    def substep(m, _):
        eta = dbuf[ETA]
        Uv = dbuf[U]
        Vv = dbuf[V]
        fx = sbuf[DY_FC] * Uv
        fy = sbuf[DX_CF] * Vv
        div = (rollp_x(fx) - fx + rollp_y(fy) - fy) * sbuf[C_AZ]
        dbuf[ETA] = eta - div
        wrap_cols(ETA)
        eta = dbuf[ETA]
        # No mask factor: c_u/c_v carry h_u/h_v which are exactly 0 on land, and the
        # caller contract has U/V/GU/GV masked on entry — so land stays 0 without it
        # (bitwise-equal to the XLA path's explicit mask multiply).
        dbuf[U] = Uv - sbuf[C_U] * (eta - rollm_x(eta)) + dbuf[GU]
        wrap_cols(U)
        dbuf[V] = Vv - sbuf[C_V] * (eta - rollm_y(eta)) + dbuf[GV]
        wrap_cols(V)
        # Negative result (kept as an option so it isn't retried): accumulating over
        # the FULL window with static indexing (acc_window=True, one dynamic slice at
        # the end) measures within noise of the per-substep dynamic-slice accumulate
        # below on v5e, while needing 3*(W-B) more accumulator rows of VMEM.
        w = w_ref[m]
        if acc_window:
            acc[0] += w * dbuf[ETA]
            acc[1] += w * dbuf[U]
            acc[2] += w * dbuf[V]
        else:
            eta_out[...] += w * dbuf[ETA, pl.ds(off, B), :]
            U_out[...] += w * dbuf[U, pl.ds(off, B), :]
            V_out[...] += w * dbuf[V, pl.ds(off, B), :]
        return 0

    if acc_window:
        acc[...] = jnp.zeros(acc.shape, acc.dtype)
    else:
        eta_out[...] = jnp.zeros(eta_out.shape, eta_out.dtype)
        U_out[...] = jnp.zeros(U_out.shape, U_out.dtype)
        V_out[...] = jnp.zeros(V_out.shape, V_out.dtype)
    jax.lax.fori_loop(0, n_sub, substep, 0)

    if acc_window:
        eta_out[...] = acc[0, pl.ds(off, B), :]
        U_out[...] = acc[1, pl.ds(off, B), :]
        V_out[...] = acc[2, pl.ds(off, B), :]


def barotropic_substeps_pallas(pack_static, eta, U, V, GU, GV, dtau, weights,
                               Nx, Hx, block_rows=None, interpret=False,
                               dpack=None, wrap_x_each_substep=True,
                               vmem_limit_mb=None, crop=True, acc_window=False):
    """Run the full barotropic loop in one Pallas kernel.

    ``pack_static``: (5, *, *) stacked metric operands
    [dy_fc, dx_cf, inv_az_cc, g*h_u*inv_dx, g*h_v*inv_dy] —
    may be pre-padded with ``pad_pack`` (models/hydrostatic.make_model does this).
    ``eta/U/V/GU/GV``: (Ye, Xe), halos pre-filled; U/V/GU/GV masked (0 on land — the
    h_u/h_v factors inside the static planes keep them 0 without a mask plane).
    Returns the SM05-weighted averages.

    Numerical note: the forward-backward update here algebraically matches the XLA
    reference path but folds dtau into precomputed per-plane factors (c_u = dtau*gH/dx
    etc.), so results can differ from it by one rounding at f32.
    """
    Ye, Xe = eta.shape
    n_sub = int(weights.shape[0])
    block_rows = auto_block_rows(Ye, Xe, n_sub, jnp.dtype(eta.dtype).itemsize,
                                 block_rows)
    B, W, n_prog, Ye_pad = _geometry(Ye, n_sub, block_rows)
    Xe_pad = -128 * (-Xe // 128)

    spack = pad_pack(pack_static, block_rows)
    assert spack.shape[1] >= Ye_pad and spack.shape[2] == Xe_pad, (
        spack.shape, Ye_pad, Xe_pad)
    spack = spack[:, :Ye_pad, :]

    if dpack is None:  # caller may supply the already-stacked [eta,U,V,GU,GV]
        dpack = jnp.stack([eta, U, V, GU, GV])
    if dpack.shape[1:] != (Ye_pad, Xe_pad):  # pre-padded dpack passes through
        dpack = jnp.pad(dpack, ((0, 0), (0, Ye_pad - dpack.shape[1]),
                                (0, Xe_pad - dpack.shape[2])))

    kern = functools.partial(
        _kernel, n_sub=n_sub, W=W, B=B, Ye=Ye_pad, Xe=Xe_pad, Nx=Nx, Hx=Hx,
        wrap=wrap_x_each_substep, acc_window=acc_window,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # dtau (1,), weights (M,)
        grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[
            pl.BlockSpec((B, Xe_pad), lambda p, *_: (p, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        scratch_shapes=[
            pltpu.VMEM((5, W, Xe_pad), eta.dtype),
            pltpu.VMEM((5, W, Xe_pad), eta.dtype),
        ] + ([pltpu.VMEM((3, W, Xe_pad), eta.dtype)] if acc_window else []) + [
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    kwargs = {}
    if vmem_limit_mb is None and not interpret:
        # Auto-raise the scoped-VMEM limit above the compiler's 16 MB default:
        # XLA may co-locate operand/output prefetch copies with the kernel's
        # scoped stack, and whether it does depends on the SURROUNDING graph —
        # the same B=152 geometry (14.39 MB scoped) compiled clean in the
        # single-layer step but hit "17.06M > 16.00M" inside the layered step.
        # The 16 MB default is a flag, not the hardware ceiling: a 20 MB limit
        # compiles and RUNS on v5e (measured, round 4). Give the kernel its
        # footprint plus 4 MB of co-location headroom.
        footprint = (10 * W + 3 * B) * Xe_pad * jnp.dtype(eta.dtype).itemsize
        vmem_limit_mb = max(16.0, footprint / 2**20 + 4.0)
    if vmem_limit_mb is not None and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb * 2**20))
    out_shape = [jax.ShapeDtypeStruct((Ye_pad, Xe_pad), eta.dtype)] * 3
    eta_a, U_a, V_a = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(jnp.asarray([dtau], eta.dtype), weights, spack, dpack)
    if crop and (Ye_pad, Xe_pad) != (Ye, Xe):
        eta_a, U_a, V_a = (a[:Ye, :Xe] for a in (eta_a, U_a, V_a))
    return eta_a, U_a, V_a
