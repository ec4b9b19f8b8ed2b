"""Aliased Pallas halo fill: write ONLY the halo strips, in place.

Motivation (docs/performance.md, layered engine): the layered step is memory-bound,
and its halo fills are the cleanest traffic target. The XLA strip-write fill
(``ops/zipper.fill_halos``: 4 sequential ``.at[].set`` dynamic-update-slices per
fill) measures ~87-130 us/plane at 1/4 degree x 10 layers — ~2.6-3.8 full-array
HBM copies — because XLA materializes the array between the chained updates. The
strips themselves are ~2% of the array.

This module rewrites the fill as (at most) two input-output-aliased
``pallas_call``s that visit ONLY the blocks containing halo strips; every other
block of the (donated) array is untouched in HBM:

1. **row pass** — grid over (plane, visited row-blocks): read-modify-write of the
   8-row blocks covering the south halo rows and the fold strip (row Ny + north
   halo), with the full-width strip VALUES precomputed by XLA from thin slices
   (``ops/zipper.fold_strip`` — the same code the XLA fill uses, so values are
   bitwise-equal by construction).
2. **column pass** — grid over (plane, visited lane-blocks): read-modify-write of
   the 128-lane blocks containing the periodic west/east halo columns, patching
   only the middle rows (the strip rows were already written full-width, and the
   row pass wrote their wrap columns from the strip's own interior — the same
   self-consistency argument as ``fold_north``).

Mosaic constraints that shaped this design (measured on v5e, jax 0.9):
- HBM<->HBM ``make_async_copy`` requires the lane dimension to be 128-aligned, so
  a "pure DMA scatter" of strips into an unpadded (.., 1448)-wide array is not
  lowerable; block-granular read-modify-write with aliasing is.
- Block shapes must have (sublane, lane) dims divisible by (8, 128) or equal to
  the array dims — hence 8-row blocks (full width) and 128-lane blocks (full
  height), never an (Ny, Hx)-shaped block.

The ``save``/``restore`` pair exists for callers that need BOTH the filled array
and (later) the pre-fill array without keeping the input buffer alive: ``save=True``
returns the pre-fill contents of exactly the regions the fill writes (~2% of the
array), and ``restore_strips_pallas`` writes them back into the (donated, by then
dead) filled array — reconstructing the original bitwise at strip cost. This is
what lets the layered predictor step use ``state.u`` after the fill without XLA
inserting a full-array defensive copy ahead of the aliased kernel.

Reference context: this implements the same fill semantics as
``src/zipper_boundary_condition.jl:70-138`` + periodic wrap (SURVEY.md stack 3.3);
parity with the XLA fill is pinned bitwise in tests/test_pallas_fill.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import zipper

__all__ = ["fill_halos_pallas", "restore_strips_pallas", "extract_strips"]

_LANE = 128


def _sublane(dtype):
    return {4: 8, 2: 16, 1: 32}.get(jnp.dtype(dtype).itemsize, 8)


# --------------------------------------------------------------------------------------
# row pass
# --------------------------------------------------------------------------------------

def _row_kernel(vis_ref, a_blk, south_ref, fold_ref, out_blk, *,
                By, Hy, y0, Ps, Pf, pad_lo, has_south):
    # All dynamic sublane slice starts below are multiples of By by construction
    # (row0 is a block multiple; pad_lo absorbs y0 % By; clip bounds are By
    # multiples) — the pl.multiple_of hints let Mosaic prove it.
    j = pl.program_id(1)
    row0 = vis_ref[j] * By
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, By, 1), 1)
    out = a_blk[...]
    if has_south:
        s0 = pl.multiple_of(jnp.clip(row0, 0, Ps - By), By)
        sc = south_ref[0:1, pl.ds(s0, By), :]
        out = jnp.where(rows < Hy, sc, out)
    f0 = pl.multiple_of(jnp.clip(row0 - y0 + pad_lo, 0, Pf - By), By)
    fc = fold_ref[0:1, pl.ds(f0, By), :]
    out = jnp.where(rows >= y0, fc, out)
    out_blk[...] = out


def _row_pass(A3, south_full, fold_full, y0, interpret):
    """Write ``south_full`` into rows [0, Hy) and ``fold_full`` into rows [y0, Yb)
    of the (donated) (K, Yb, Xb) array, touching only the 8-row blocks involved."""
    K, Yb, Xb = A3.shape
    has_south = south_full is not None
    Hy = south_full.shape[1] if has_south else 0
    rf = fold_full.shape[1]
    if rf == 0 and not has_south:
        return A3
    By = min(_sublane(A3.dtype), Yb)
    nrb = math.ceil(Yb / By)
    vis = set()
    if has_south:
        vis |= set(range(0, math.ceil(Hy / By)))
    if rf > 0:
        vis |= set(range(y0 // By, nrb))
    vis = sorted(vis)

    # Pad the strip buffers so the kernel's dynamic row slices stay in range AND
    # start at By multiples: fold_p leads with pad_lo = By + (y0 % By) rows so the
    # slice start row0 - y0 + pad_lo is a By multiple for every block.
    Ps = -By * (-max(Hy, 1) // By) + By
    if has_south:
        south_p = jnp.pad(south_full, ((0, 0), (0, Ps - Hy), (0, 0)))
    else:
        south_p = jnp.zeros((K, Ps, Xb), A3.dtype)
    pad_lo = By + (y0 % By)
    Pf = -By * (-(pad_lo + rf + By) // By) + By
    fold_p = jnp.pad(fold_full, ((0, 0), (pad_lo, Pf - pad_lo - rf), (0, 0)))

    kern = functools.partial(_row_kernel, By=By, Hy=Hy, y0=y0, Ps=Ps, Pf=Pf,
                             pad_lo=pad_lo, has_south=has_south)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K, len(vis)),
        in_specs=[
            pl.BlockSpec((1, By, Xb), lambda k, j, v: (k, v[j], 0)),
            pl.BlockSpec((1, Ps, Xb), lambda k, j, v: (k, 0, 0)),
            pl.BlockSpec((1, Pf, Xb), lambda k, j, v: (k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, By, Xb), lambda k, j, v: (k, v[j], 0)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(A3.shape, A3.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.asarray(vis, jnp.int32), A3, south_p, fold_p)


# --------------------------------------------------------------------------------------
# column pass
# --------------------------------------------------------------------------------------

def _col_kernel(vis_ref, a_blk, patch_blk, out_blk, *, BW, Hx, east_lo, ylo, y0,
                start_al):
    # The patch buffer carries ONLY the consumed row range: patch row p maps to
    # array row start_al + p (start_al = ylo aligned down to the sublane multiple,
    # so the static subregion slice below starts sublane-aligned).
    j = pl.program_id(1)
    lanes = vis_ref[j] * BW + jax.lax.broadcasted_iota(jnp.int32, (1, BW), 1)
    halo_lane = (lanes < Hx) | (lanes >= east_lo)
    out_blk[...] = a_blk[...]
    Yb = a_blk.shape[1]
    end = min(start_al + patch_blk.shape[2], Yb)
    h = end - start_al
    rows = start_al + jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    mid = (rows >= ylo) & (rows < y0)
    out_blk[0, start_al:end, :] = jnp.where(
        mid & halo_lane, patch_blk[0, 0, :h, :], a_blk[0, start_al:end, :])


def _col_pass(A3, west, east, ylo, y0, Nx, Hx, interpret):
    """Write ``west`` into [ylo, y0) x [0, Hx) and ``east`` into
    [ylo, y0) x [Xb-Hx, Xb), touching only the 128-lane blocks involved."""
    K, Yb, Xb = A3.shape
    if Hx == 0 or y0 <= ylo:
        return A3
    BW = min(_LANE, Xb)
    ncb = math.ceil(Xb / BW)
    east_lo = Xb - Hx
    vis = sorted(set(range(0, math.ceil(Hx / BW))) | set(range(east_lo // BW, ncb)))

    # per visited lane-block patch holding the halo-column values at block lanes,
    # covering only the consumed rows (padded to the sublane multiple) — a
    # full-height patch would re-pay ~n_vis*BW/Xb of a whole-array HBM pass
    By = _sublane(A3.dtype)
    start_al = (ylo // By) * By
    off = ylo - start_al
    Ph = -By * (-(off + (y0 - ylo)) // By)
    patches = []
    for cb in vis:
        lo, hi = cb * BW, min((cb + 1) * BW, Xb)
        patch = jnp.zeros((K, Ph, BW), A3.dtype)
        if lo < Hx:  # west halo lanes in this block
            b = min(hi, Hx)
            patch = patch.at[:, off:off + (y0 - ylo), lo - lo:b - lo].set(
                west[..., lo:b])
        if hi > east_lo:  # east halo lanes in this block
            a = max(lo, east_lo)
            patch = patch.at[:, off:off + (y0 - ylo), a - lo:hi - lo].set(
                east[..., a - east_lo:hi - east_lo])
        patches.append(patch)
    P = jnp.stack(patches)  # (n_vis, K, Ph, BW)

    kern = functools.partial(_col_kernel, BW=BW, Hx=Hx, east_lo=east_lo,
                             ylo=ylo, y0=y0, start_al=start_al)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K, len(vis)),
        in_specs=[
            pl.BlockSpec((1, Yb, BW), lambda k, j, v: (k, 0, v[j])),
            pl.BlockSpec((1, 1, Ph, BW), lambda k, j, v: (j, k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Yb, BW), lambda k, j, v: (k, 0, v[j])),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(A3.shape, A3.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.asarray(vis, jnp.int32), A3, P)


# --------------------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------------------

def _geometry(A, loc, south, Nx, Ny, Hx, Hy):
    from .location import CENTER, validate_location

    _, ly = validate_location(loc)
    if Hy == 0:
        # match zipper.fill_halos: no fold, no south fill — wrap_x of ALL rows
        # (the fold strip below is empty: y0 = Yb)
        return A.shape[-2], 0, False
    y0 = Hy + Ny - 1 if ly == CENTER else Hy + Ny
    has_south = south == "zero_gradient"
    ylo = Hy if has_south else 0
    return y0, ylo, has_south


def _flat(A):
    Yb, Xb = A.shape[-2:]
    K = math.prod(A.shape[:-2]) if A.ndim > 2 else 1
    return A.reshape((K, Yb, Xb))


def fill_halos_pallas(A, loc, sign, Nx, Ny, Hx, Hy, south="zero_gradient",
                      interpret=False, save=False):
    """Fused halo fill (south fill, north zipper fold, periodic x-wrap) as aliased
    strip writes; bitwise-equal to ``zipper.fill_halos(..., xp=jnp)``.

    ``A``: halo-inclusive ``(..., Ny+2Hy, Nx+2Hx)`` array; leading dims broadcast
    (one plane of the grid per (leading..) index). The input buffer is DONATED to
    the kernel — pass ``save=True`` to also get the pre-fill contents of the
    written regions (see ``restore_strips_pallas``).
    """
    if south not in ("zero_gradient", "none"):
        raise ValueError(f"Unknown south fill mode {south!r}")
    shape = A.shape
    A3 = _flat(A)
    K, Yb, Xb = A3.shape
    y0, ylo, has_south = _geometry(A3, loc, south, Nx, Ny, Hx, Hy)

    # The XLA fill applies the south fill BEFORE the fold; the fold's top window
    # (rows [Ny-1, Ny+Hy]) reaches into the south halo when Ny <= Hy, so those rows
    # must read their post-south value (row Hy) for bitwise parity. Degenerate-
    # geometry path only — production grids have Ny >> Hy.
    if has_south and Ny <= Hy:
        rows = jnp.arange(Yb)[:, None]
        A_fold = jnp.where(rows < Hy, A3[:, Hy:Hy + 1, :], A3)
    else:
        A_fold = A3
    if Hy == 0:  # no fold (zipper.fill_halos skips it too); empty strip
        fold_full = A3[:, Yb:, :]
    else:
        fold_full, y0_f = zipper.fold_strip(A_fold, loc, sign, Nx, Ny, Hx, Hy, xp=jnp)
        assert y0_f == y0
    if has_south:
        rowHy = A3[:, Hy, Hx:Hx + Nx]
        row_w = jnp.concatenate([rowHy[..., Nx - Hx:], rowHy, rowHy[..., :Hx]],
                                axis=-1)
        south_full = jnp.broadcast_to(row_w[:, None, :], (K, Hy, Xb))
    else:
        south_full = None
    west = A3[:, ylo:y0, Nx:Nx + Hx]
    east = A3[:, ylo:y0, Hx:2 * Hx]

    saved = None
    if save:
        saved = (A3[:, :Hy, :] if has_south else None,
                 A3[:, y0:, :],
                 A3[:, ylo:y0, :Hx],
                 A3[:, ylo:y0, Xb - Hx:])

    out = _row_pass(A3, south_full, fold_full, y0, interpret)
    out = _col_pass(out, west, east, ylo, y0, Nx, Hx, interpret)
    out = out.reshape(shape)
    return (out, saved) if save else out


def restore_strips_pallas(A, saved, loc, Nx, Ny, Hx, Hy, south="zero_gradient",
                          interpret=False):
    """Write ``saved`` strips (from ``fill_halos_pallas(..., save=True)``) back into
    (donated) ``A``, reconstructing the pre-fill array bitwise at strip cost."""
    shape = A.shape
    A3 = _flat(A)
    y0, ylo, has_south = _geometry(A3, loc, south, Nx, Ny, Hx, Hy)
    south_s, fold_s, west_s, east_s = saved
    if (south_s is not None) != has_south:
        raise ValueError(
            f"restore_strips_pallas south={south!r} does not match the mode the "
            f"strips were saved with (saved south strip "
            f"{'present' if south_s is not None else 'absent'}) — pass the same "
            f"`south` as the fill_halos_pallas(..., save=True) call")
    out = _row_pass(A3, south_s, fold_s, y0, interpret)
    out = _col_pass(out, west_s, east_s, ylo, y0, Nx, Hx, interpret)
    return out.reshape(shape)


def extract_strips(A, loc, Nx, Ny, Hx, Hy, south="zero_gradient"):
    """The regions ``fill_halos_pallas`` writes, as thin slices (for tests)."""
    A3 = _flat(A)
    Yb, Xb = A3.shape[-2:]
    y0, ylo, has_south = _geometry(A3, loc, south, Nx, Ny, Hx, Hy)
    return (A3[:, :Hy, :] if has_south else None, A3[:, y0:, :],
            A3[:, ylo:y0, :Hx], A3[:, ylo:y0, Xb - Hx:])
