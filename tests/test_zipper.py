"""Zipper boundary-condition behavioral pins.

Verbatim ports of the reference's fold semantics tests
(test/test_zipper_boundary_conditions.jl:5-73 — SURVEY.md §4 item 3): constant fields,
the u-field's hardcoded x-periodic wrap points, mirror/antisymmetry of linear-in-x
fields, and fold symmetry of an immersed bottom height.
"""

import numpy as np
import pytest

from orthogonalsphericalshellgrids_tpu import CC, CF, FC, FF, default_zipper_sign, sign_for_field_name
from orthogonalsphericalshellgrids_tpu.ops import zipper

Nx, Ny, Hx, Hy = 10, 10, 4, 4


def make_field(interior_fn):
    """Halo-inclusive (Ny+2Hy, Nx+2Hx) float array with interior set by interior_fn(i0, j0)."""
    A = np.zeros((Ny + 2 * Hy, Nx + 2 * Hx))
    jj, ii = np.meshgrid(np.arange(Ny), np.arange(Nx), indexing="ij")
    A[Hy : Hy + Ny, Hx : Hx + Nx] = interior_fn(ii, jj)
    return A


def fill(A, loc, sign):
    return zipper.fill_halos(A, loc, sign, Nx, Ny, Hx, Hy, south="zero_gradient", xp=np)


def test_default_signs():
    # test/test_zipper_boundary_conditions.jl:14-23 and src/tripolar_grid_extensions.jl:49-53
    assert default_zipper_sign(CC) == 1
    assert default_zipper_sign(FC) == -1
    assert default_zipper_sign(CF) == -1
    assert default_zipper_sign(FF) == 1
    assert sign_for_field_name("u") == -1
    assert sign_for_field_name("v") == -1
    assert sign_for_field_name("c") == 1


def test_constant_fields():
    """set!(c,1); set!(u,1); set!(v,1); fill; check north halos
    (test/test_zipper_boundary_conditions.jl:25-45)."""
    c = fill(make_field(lambda i, j: np.ones_like(i, float)), CC, 1)
    u = fill(make_field(lambda i, j: np.ones_like(i, float)), FC, -1)
    v = fill(make_field(lambda i, j: np.ones_like(i, float)), CF, -1)

    north = slice(Hy + Ny, Hy + Ny + Hy)
    assert np.all(c[north, :] == 1)
    assert np.all(v[north, :] == -1)

    # u is special: periodicity is hardcoded in x. Interior columns 2..Nx-1 (1-based)
    # are -1; columns 1 and Nx+1 keep +1 (:39-45).
    assert np.all(u[north, Hx + 1 : Hx + Nx - 1] == -1)
    assert np.all(u[north, Hx] == 1)          # 1-based i = 1
    assert np.all(u[north, Hx + Nx] == 1)     # 1-based i = Nx + 1 (east halo)


def test_linear_in_x_fold_symmetry():
    """Linear-in-x fields: tracer row Ny becomes mirror symmetric, u antisymmetric
    between the two sides (test/test_zipper_boundary_conditions.jl:56-72)."""
    # x(i) for centers: i+0.5 (any monotone function of i works for the symmetry check)
    c = fill(make_field(lambda i, j: (i + 0.5).astype(float)), CC, 1)
    u = fill(make_field(lambda i, j: i.astype(float) + 0.0), FC, -1)

    rowNy = Hy + Ny - 1
    c_int = c[rowNy, Hx : Hx + Nx]
    # interior(c, :, 10) == interior(c, 10:-1:1, 10)
    np.testing.assert_array_equal(c_int, c_int[::-1])

    # left_side = interior(u, 2:5, 10); right_side = interior(u, 7:10, 10)
    # left == -reverse(right)
    u_int = u[rowNy, Hx : Hx + Nx]
    left = u_int[1:5]
    right = u_int[6:10]
    np.testing.assert_array_equal(left, -right[::-1])


def test_bottom_height_fold_symmetry():
    """Immersed bottom height (CC, sign +1 — not a vector): after filling, row Ny must
    satisfy h[:, Ny] == h[Nx:-1:1, Ny] (test/test_zipper_boundary_conditions.jl:47-54)."""
    rng = np.random.default_rng(42)
    h = make_field(lambda i, j: rng.random(i.shape))
    h = fill(h, CC, 1)
    rowNy = Hy + Ny - 1
    h_int = h[rowNy, Hx : Hx + Nx]
    np.testing.assert_array_equal(h_int, h_int[::-1])


def test_face_face_fold():
    """FF fold: halo row Ny+j <- row Ny-j+1 with the face-x index map and sign +1."""
    z = fill(make_field(lambda i, j: (i * 100 + j).astype(float)), FF, 1)
    # z[i, Ny+1] (1-based) == z[i', Ny] with i' = (Nx - i + 2 - 1) % Nx + 1
    for i1 in range(1, Nx + 1):  # 1-based interior columns
        ip = Nx - i1 + 2
        s = 1
        if ip > Nx:
            ip -= Nx
        got = z[Hy + Ny, Hx + i1 - 1]
        want = s * z[Hy + Ny - 1, Hx + ip - 1]
        assert got == want, (i1, got, want)


def test_center_face_fold_rows():
    """CF fold: halo row Ny+j <- row Ny-j+1 (no duplicated row), center-x map, sign -1."""
    v = fill(make_field(lambda i, j: (i * 100 + j).astype(float)), CF, -1)
    for j in range(1, Hy + 1):
        for i1 in range(1, Nx + 1):
            ip = Nx - i1 + 1
            got = v[Hy + Ny + j - 1, Hx + i1 - 1]
            want = -v[Hy + Ny - j, Hx + ip - 1]
            assert got == want, (i1, j)


def test_center_center_fold_rows_and_redundant_half():
    """CC fold: halo row Ny+j <- row Ny-j (row Ny duplicated); the redundant half of row
    Ny itself is overwritten for i > Nx÷2 (src/zipper_boundary_condition.jl:95-104)."""
    orig = make_field(lambda i, j: (i * 100 + j).astype(float))
    c = fill(orig.copy(), CC, 1)
    for j in range(1, Hy + 1):
        for i1 in range(1, Nx + 1):
            ip = Nx - i1 + 1
            got = c[Hy + Ny + j - 1, Hx + i1 - 1]
            want = c[Hy + Ny - j - 1, Hx + ip - 1]
            assert got == want, (i1, j)
    # redundant half: i > Nx/2 mirrored from the (unchanged) left half
    for i1 in range(1, Nx + 1):
        ip = Nx - i1 + 1
        if i1 > Nx // 2:
            assert c[Hy + Ny - 1, Hx + i1 - 1] == orig[Hy + Ny - 1, Hx + ip - 1]
        else:
            assert c[Hy + Ny - 1, Hx + i1 - 1] == orig[Hy + Ny - 1, Hx + i1 - 1]


def test_idempotent_and_jax_matches_numpy():
    """fill_halos twice == once (fold of a folded field is stable), and the jnp path
    matches the numpy path bitwise.

    Exception pinned from the reference: for face-x fields with sign -1 (u), the
    redundant-half overwrite at the self-mapped pole column i = Nx/2+1 (1-based, where
    i' == i in fold_north_face_center!, src/zipper_boundary_condition.jl:102) flips the
    sign of that single point on *every* fill — physically the u-point at the
    singularity, which is always land-masked/zero in practice."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for loc, sign in [(CC, 1), (FC, -1), (CF, -1), (FF, 1)]:
        A = make_field(lambda i, j: rng.random(i.shape))
        once = fill(A.copy(), loc, sign)
        twice = fill(once.copy(), loc, sign)
        if loc == FC and sign == -1:
            pole = Hx + Nx // 2
            rowNy = Hy + Ny - 1
            assert twice[rowNy, pole] == -once[rowNy, pole]
            # everywhere else: stable
            stable = np.ones_like(once, bool)
            stable[rowNy, pole] = False
            np.testing.assert_array_equal(once[stable], twice[stable])
        else:
            np.testing.assert_array_equal(once, twice)
        jax_out = np.asarray(
            zipper.fill_halos(jnp.asarray(A), loc, sign, Nx, Ny, Hx, Hy, xp=jnp)
        )
        np.testing.assert_array_equal(once, jax_out)


def test_zipper_boundary_condition_export():
    """The reference exports exactly TripolarGrid + ZipperBoundaryCondition
    (src/OrthogonalSphericalShellGrids.jl:4); the default sign is +1
    (src/zipper_boundary_condition.jl:52). ZBC.apply must equal fold_north with the
    same sign."""
    import orthogonalsphericalshellgrids_tpu as osg

    bc = osg.ZipperBoundaryCondition()
    assert bc.sign == 1

    grid = osg.TripolarGrid.make((Nx, Ny, 1), halo=(Hx, Hy, 1))
    A = make_field(lambda i, j: 1.0 + 2.0 * i + 3.0 * j)
    got = osg.ZipperBoundaryCondition(sign=-1).apply(A, FC, grid, xp=np)
    want = zipper.fold_north(A, FC, -1, Nx, Ny, Hx, Hy, xp=np)
    np.testing.assert_array_equal(got, want)
    # overriding the location default: +1 on an FC field is honored as-is
    got_pos = osg.ZipperBoundaryCondition(sign=+1).apply(A, FC, grid, xp=np)
    assert not np.array_equal(got_pos, got)
