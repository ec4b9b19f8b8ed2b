"""Zipper north-fold boundary condition and fused halo filling.

TPU-native reimplementation of the reference's ``ZipperBoundaryCondition``
(``src/zipper_boundary_condition.jl``). The tripolar grid is periodic in x and *folded*
onto itself at the north edge: the north halo of column i is read from the mirrored
column i' on the other half of the fold, with a sign flip for vector components.

Instead of a boundary-condition object hierarchy with per-point kernels, the fold here
is pure, fused data movement — ``flip`` + ``roll`` + ``where`` on static slices — that
XLA folds into surrounding computation (SURVEY.md stack 3.3: "the hot communication
loop"). The exact index/sign conventions replicate the four reference fold kernels:

- center-x map   i' = Nx - i + 1 (1-based)            ``fold_north_center_*!`` (:110,:125)
- face-x map     i' = Nx - i + 2, wrapped periodically with sign -> |sign| at the wrap
                 point                                 ``fold_north_face_*!`` (:73-75,:90-92)
- center-y rows  halo row Ny+j <- row Ny-j (row Ny duplicated), PLUS in-place overwrite
                 of the redundant half of row Ny itself: f[i,Ny] = sign*f[i',Ny] for
                 i > Nx÷2                              (:95-104,:127-137)
- face-y rows    halo row Ny+j <- row Ny-j+1 (no duplicated row)   (:78-84,:113-119)

All functions are array-library agnostic (``xp=numpy`` for float64 host-side grid
construction, ``xp=jax.numpy`` inside jit). Arrays are halo-inclusive with layout
``(..., y, x)`` — x last so it lands on the TPU lane dimension — of shape
``(..., Ny + 2*Hy, Nx + 2*Hx)``. 0-based index p maps to the reference's 1-based,
offset-array index m via p = m + H - 1.
"""

from __future__ import annotations

import numpy as np

from .location import CENTER, FACE, validate_location

__all__ = ["fold_north", "wrap_x", "fill_south", "fill_halos"]


def _mirror_x_interior(I, lx, sign, Nx, xp):
    """Mirror the interior-x block ``I`` (..., y, Nx) across the fold.

    Returns (mirrored_block, sign_row) where sign_row is a length-Nx array of ±1
    implementing the reference's per-column sign (including the |sign| exception at the
    x-periodic wrap point for face-x fields, ``src/zipper_boundary_condition.jl:74,:91``).
    """
    if lx == CENTER:
        # i' = Nx - i + 1 (1-based)  ->  i0' = Nx - 1 - i0 : a pure flip.
        M = xp.flip(I, axis=-1)
        sign_row = xp.full((Nx,), sign, dtype=I.dtype)
    else:
        # i' = Nx - i + 2 (1-based) with periodic wrap  ->  i0' = (Nx - i0) % Nx :
        # flip then roll by +1. The wrap point (i0 == 0, the reference's i' > Nx case)
        # takes |sign|.
        M = xp.roll(xp.flip(I, axis=-1), 1, axis=-1)
        i0 = xp.arange(Nx)
        sign_row = xp.where(i0 == 0, abs(sign), sign).astype(I.dtype)
    return M, sign_row


def fold_north(A, loc, sign, Nx, Ny, Hx, Hy, xp=np):
    """Apply the zipper fold to the north halo rows (and the redundant half of the last
    interior row for center-y fields) of halo-inclusive array ``A``.

    ``A``: shape (..., Ny + 2*Hy, Nx + 2*Hx). Returns a new array; the x-halo columns of
    the rewritten rows are re-wrapped periodically so the result is self-consistent
    (matching the reference's fill order where the east/west periodic fill runs after
    the north fold — pinned by ``test/test_zipper_boundary_conditions.jl:39-45``).
    """
    lx, ly = validate_location(loc)
    I = A[..., :, Hx : Hx + Nx]  # interior-x block, all y rows
    M, sign_row = _mirror_x_interior(I, lx, sign, Nx, xp)

    if ly == CENTER:
        # Halo row Ny+j (1-based) <- mirrored row Ny-j, j = 1..Hy.
        # 0-based: target rows [Hy+Ny, Hy+Ny+Hy) <- flip of mirrored rows
        # [Hy+Ny-1-Hy, Hy+Ny-1).
        src = M[..., Hy + Ny - 1 - Hy : Hy + Ny - 1, :]
        halo = xp.flip(src, axis=-2) * sign_row
        # Redundant-half overwrite of row Ny (0-based Hy+Ny-1): for i > Nx÷2 (1-based),
        # i.e. i0 >= Nx//2, take the mirrored, signed value. Reads are from the
        # pre-update array (the reference kernel's reads at i' <= Nx/2+1 are never
        # overwritten, so functional semantics coincide with its in-place semantics).
        i0 = xp.arange(Nx)
        old_row = I[..., Hy + Ny - 1, :]
        mir_row = M[..., Hy + Ny - 1, :]
        new_row = xp.where(i0 >= Nx // 2, sign_row * mir_row, old_row)
        last_interior = new_row[..., None, :]
    else:
        # Face-y: halo row Ny+j <- mirrored row Ny-j+1 (no duplicated row).
        src = M[..., Hy + Ny - Hy : Hy + Ny, :]
        halo = xp.flip(src, axis=-2) * sign_row
        last_interior = I[..., Hy + Ny - 1 : Hy + Ny, :]

    def embed_x(block):
        # Re-apply the periodic x-wrap to a (..., r, Nx) interior-x block so the
        # rewritten rows carry consistent x halos.
        return xp.concatenate(
            [block[..., Nx - Hx :], block, block[..., :Hx]], axis=-1
        )

    unchanged = A[..., : Hy + Ny - 1, :]
    return xp.concatenate(
        [unchanged, embed_x(last_interior), embed_x(halo)], axis=-2
    )


def wrap_x(A, Nx, Hx, xp=np):
    """Periodic x-wrap of all rows: west halo <- last Hx interior columns, east halo <-
    first Hx interior columns (x is hardcoded Periodic on the tripolar grid,
    ``src/tripolar_grid.jl:88``)."""
    return xp.concatenate(
        [A[..., Nx : Nx + Hx], A[..., Hx : Hx + Nx], A[..., Hx : 2 * Hx]], axis=-1
    )


def fill_south(A, Ny, Hy, mode, xp=np):
    """Fill the south halo rows.

    The reference leaves the south 'continued' / open (``src/tripolar_grid.jl:149``:
    ``south = nothing``) — the physical south boundary sits on land below the
    southernmost latitude. Supported modes:

    - ``"zero_gradient"``: copy the first interior row into the halo (no-flux-like).
    - ``"none"``: leave the south halo untouched (grid construction path, where the
      south halo is overwritten by the latitude-longitude continuation afterwards).
    """
    if mode == "none" or Hy == 0:
        return A
    if mode != "zero_gradient":
        raise ValueError(f"Unknown south fill mode {mode!r}")
    first = A[..., Hy : Hy + 1, :]
    south = xp.concatenate([first] * Hy, axis=-2)
    return xp.concatenate([south, A[..., Hy:, :]], axis=-2)


def fill_halos(A, loc, sign, Nx, Ny, Hx, Hy, south="zero_gradient", fold=True, xp=np):
    """Fused halo fill: south fill, north zipper fold, then periodic x-wrap.

    This is the single-device equivalent of the reference's
    ``fill_halo_regions!(field)`` on a tripolar grid (SURVEY.md stack 3.3): west/east =
    periodic wrap, north = zipper fold with location-dependent index map and sign,
    south = open. Pure function of ``A``; all shapes static, so XLA fuses the whole
    thing into neighboring compute.
    """
    A = fill_south(A, Ny, Hy, south, xp=xp)
    if fold and Hy > 0:
        A = fold_north(A, loc, sign, Nx, Ny, Hx, Hy, xp=xp)
    return wrap_x(A, Nx, Hx, xp=xp)
