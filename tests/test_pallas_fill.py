"""Aliased Pallas halo-fill parity (interpret mode on CPU).

The strip-write fill (ops/pallas_fill.py) must be BITWISE equal to the XLA fill
(ops/zipper.fill_halos) — it shares the fold-strip computation with it by
construction (zipper.fold_strip) and only changes how the strips are written.
The save/restore pair must reconstruct the pre-fill array bitwise, since
models/layered.layered_step relies on it to rebuild the unfilled prognostics for
the predictor without keeping the original buffers alive.

Geometry edge cases pinned here: lane-block straddles (east halo crossing a
128-lane block boundary, Xb < 128 single-block), Hy >= Ny (the fold's top window
reaching into the freshly south-filled rows — the XLA fill's ordering), and both
row parities of the fold (center-y duplicated row + redundant-half rewrite vs
face-y no-duplicate).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orthogonalsphericalshellgrids_tpu.ops import zipper
from orthogonalsphericalshellgrids_tpu.ops.location import CC, CF, FC, FF
from orthogonalsphericalshellgrids_tpu.ops.pallas_fill import (
    extract_strips, fill_halos_pallas, restore_strips_pallas)

GEOMETRIES = [
    (12, 9, 4, 4),      # tiny, Xb < 128 (single lane block)
    (52, 30, 5, 5),     # odd Nx parity for the fold
    (260, 21, 4, 4),    # multiple lane blocks, east halo inside the last
    (250, 16, 22, 22),  # extended halos, Hy > Ny, east halo straddling blocks
]


def _rand(shape, dtype, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), dtype)


@pytest.mark.parametrize("geom", GEOMETRIES)
@pytest.mark.parametrize("loc,sign", [(CC, 1), (FC, -1), (CF, -1), (FF, 1)])
def test_fill_matches_xla_bitwise(geom, loc, sign):
    Nx, Ny, Hx, Hy = geom
    A = _rand((Ny + 2 * Hy, Nx + 2 * Hx), jnp.float64)
    want = zipper.fill_halos(A, loc, sign, Nx, Ny, Hx, Hy, xp=jnp)
    got = jax.jit(lambda a: fill_halos_pallas(
        a, loc, sign, Nx, Ny, Hx, Hy, interpret=True))(A)
    assert np.array_equal(np.array(want), np.array(got))


@pytest.mark.parametrize("lead", [(), (3,), (2, 2)])
def test_leading_dims_broadcast(lead):
    Nx, Ny, Hx, Hy = 52, 30, 5, 5
    A = _rand(lead + (Ny + 2 * Hy, Nx + 2 * Hx), jnp.float32, seed=1)
    want = zipper.fill_halos(A, FC, -1, Nx, Ny, Hx, Hy, xp=jnp)
    got = jax.jit(lambda a: fill_halos_pallas(
        a, FC, -1, Nx, Ny, Hx, Hy, interpret=True))(A)
    assert got.shape == A.shape
    assert np.array_equal(np.array(want), np.array(got))


@pytest.mark.parametrize("geom", GEOMETRIES)
@pytest.mark.parametrize("loc", [CC, CF])
def test_save_restore_round_trip(geom, loc):
    Nx, Ny, Hx, Hy = geom
    A = _rand((3, Ny + 2 * Hy, Nx + 2 * Hx), jnp.float64, seed=2)
    filled, saved = jax.jit(lambda a: fill_halos_pallas(
        a, loc, 1, Nx, Ny, Hx, Hy, interpret=True, save=True))(A)
    back = jax.jit(lambda f, s: restore_strips_pallas(
        f, s, loc, Nx, Ny, Hx, Hy, interpret=True))(filled, saved)
    assert np.array_equal(np.array(back), np.array(A))


def test_saved_strips_are_prefill_regions():
    Nx, Ny, Hx, Hy = 52, 30, 5, 5
    A = _rand((2, Ny + 2 * Hy, Nx + 2 * Hx), jnp.float32, seed=3)
    _, saved = fill_halos_pallas(A, CC, 1, Nx, Ny, Hx, Hy, interpret=True,
                                 save=True)
    want = extract_strips(A, CC, Nx, Ny, Hx, Hy)
    for s, w in zip(saved, want):
        assert np.array_equal(np.array(s), np.array(w))


def test_south_none_mode():
    Nx, Ny, Hx, Hy = 52, 30, 5, 5
    A = _rand((Ny + 2 * Hy, Nx + 2 * Hx), jnp.float64, seed=4)
    want = zipper.fill_halos(A, CC, 1, Nx, Ny, Hx, Hy, south="none", xp=jnp)
    got = jax.jit(lambda a: fill_halos_pallas(
        a, CC, 1, Nx, Ny, Hx, Hy, south="none", interpret=True))(A)
    assert np.array_equal(np.array(want), np.array(got))


def test_layered_step_pallas_fill_bitwise():
    """Full layered step: fill_mode='pallas' (aliased fills + strip-restored
    predictor) is bitwise-equal to fill_mode='per' across steps, including the
    AB2 tendency history and the halo contents of the stored state."""
    from test_layered import layered_bickley
    from orthogonalsphericalshellgrids_tpu.models.layered import layered_step

    model, state = layered_bickley(3)

    @partial(jax.jit, static_argnums=1)
    def run(s, mode):
        for _ in range(3):
            s = layered_step(model, s, 60.0, fill_mode=mode)
        return s

    a = run(state, "per")
    b = run(state, "pallas")
    for f in ("u", "v", "eta", "U", "V", "c", "b", "Gu", "Gv", "Gc", "Gb"):
        assert np.array_equal(np.array(getattr(a, f)), np.array(getattr(b, f))), f


def test_hy_zero_matches_xla():
    """Hy==0: zipper.fill_halos skips the fold and south fill (wrap_x only, all
    rows); the Pallas fill must match — round-4 advisor fix."""
    Nx, Ny, Hx, Hy = 52, 30, 5, 0
    for loc, sign in [(CC, 1), (FC, -1), (CF, -1)]:
        A = _rand((Ny, Nx + 2 * Hx), jnp.float32, seed=3)
        want = zipper.fill_halos(A, loc, sign, Nx, Ny, Hx, Hy, xp=jnp)
        got = fill_halos_pallas(A, loc, sign, Nx, Ny, Hx, Hy, interpret=True)
        assert np.array_equal(np.array(want), np.array(got))


def test_wide_x_halo_multi_lane_block():
    """Hx > 128 (west halo spanning >1 lane block): previously only lane-block 0
    was visited, silently leaving lanes >= 128 unfilled — round-4 advisor fix."""
    Nx, Ny, Hx, Hy = 300, 24, 130, 4
    A = _rand((Ny + 2 * Hy, Nx + 2 * Hx), jnp.float32, seed=4)
    want = zipper.fill_halos(A, CC, 1, Nx, Ny, Hx, Hy, xp=jnp)
    got = fill_halos_pallas(A, CC, 1, Nx, Ny, Hx, Hy, interpret=True)
    assert np.array_equal(np.array(want), np.array(got))


def test_restore_south_mode_mismatch_raises():
    Nx, Ny, Hx, Hy = 52, 30, 5, 5
    A = _rand((Ny + 2 * Hy, Nx + 2 * Hx), jnp.float32, seed=5)
    filled, saved = fill_halos_pallas(A, CC, 1, Nx, Ny, Hx, Hy,
                                      south="none", save=True, interpret=True)
    with pytest.raises(ValueError, match="south"):
        restore_strips_pallas(filled, saved, CC, Nx, Ny, Hx, Hy,
                              south="zero_gradient", interpret=True)
    back = restore_strips_pallas(filled, saved, CC, Nx, Ny, Hx, Hy,
                                 south="none", interpret=True)
    assert np.array_equal(np.array(back), np.array(A))


def test_layered_fill_mode_validation():
    """Unknown fill_mode (or a serial-only mode with spmd) must raise up front
    instead of silently falling through to the batched path — round-4 advisor fix."""
    import orthogonalsphericalshellgrids_tpu as osg
    from orthogonalsphericalshellgrids_tpu.models import SplitExplicitFreeSurface
    from orthogonalsphericalshellgrids_tpu.models.layered import (
        layered_initial_state, layered_step, make_layered_model)
    from orthogonalsphericalshellgrids_tpu.ops.spmd import Spmd

    grid = osg.TripolarGrid.make((24, 20, 2), dtype=jnp.float32,
                                 first_pole_longitude=45.0,
                                 north_poles_latitude=35.0)
    model = make_layered_model(grid,
                               free_surface=SplitExplicitFreeSurface(substeps=8),
                               use_pallas=False)
    state = layered_initial_state(model)
    with pytest.raises(ValueError, match="fill_mode"):
        layered_step(model, state, 60.0, fill_mode="palas")
    with pytest.raises(ValueError, match="serial-only"):
        layered_step(model, state, 60.0, fill_mode="pallas",
                     spmd=Spmd(n_shards=2))


def test_single_layer_step_pallas_fill_bitwise():
    """The single-layer step through fill_mode='pallas' (aliased strip-write
    fills, round-4 default for serial TPU runs) must be bitwise-equal to the
    XLA per-field fill path."""
    import orthogonalsphericalshellgrids_tpu as osg
    from orthogonalsphericalshellgrids_tpu.models import (
        SplitExplicitFreeSurface, initial_state, make_model, step)

    grid = osg.TripolarGrid.make((48, 40, 1), dtype=jnp.float64,
                                 first_pole_longitude=45.0,
                                 north_poles_latitude=35.0)

    def bottom(lam, phi):
        return np.where(phi < -78, 1.0, 0.0)

    model = make_model(grid, free_surface=SplitExplicitFreeSurface(substeps=8),
                       bottom_height=bottom, use_pallas=False, coriolis=True,
                       tracers=("T", "S"))
    state = initial_state(
        model,
        u=lambda lam, phi: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        eta=lambda lam, phi: 0.01 * np.cos(np.deg2rad(lam) * 2),
        c={"T": lambda lam, phi: np.sin(np.deg2rad(lam)),
           "S": lambda lam, phi: 35.0 + np.cos(np.deg2rad(phi))},
    )
    sa = sb = state
    for _ in range(3):
        sa = step(model, sa, 90.0, fill_mode="pallas")
        sb = step(model, sb, 90.0, fill_mode="per")
    for name in ("u", "v", "eta", "U", "V", "c", "Gu", "Gv", "Gc"):
        a, b = np.asarray(getattr(sa, name)), np.asarray(getattr(sb, name))
        assert np.array_equal(a, b), name
    # validation mirrors the layered engine's
    with pytest.raises(ValueError, match="fill_mode"):
        step(model, state, 90.0, fill_mode="palas")
