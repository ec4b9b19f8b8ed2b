"""Distributed-layer tests on a virtual 8-device CPU mesh (SURVEY.md §4 test plan):
sharded-vs-serial equivalence of the full step, halo-exchange correctness, and the
rank-dependent boundary logic (fold only on the top shard)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import orthogonalsphericalshellgrids_tpu as osg
from orthogonalsphericalshellgrids_tpu.models import (
    SplitExplicitFreeSurface, initial_state, make_model, step,
)
from orthogonalsphericalshellgrids_tpu.parallel import (
    distribute, gather_state, make_mesh, sharded_step_fn,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def small_model(ny=48, substeps=6):
    grid = osg.TripolarGrid.make((32, ny, 1), dtype=jnp.float64,
                                 first_pole_longitude=45.0, north_poles_latitude=35.0)

    def bottom(lam, phi):
        land = (
            ((np.abs(lam - 45.0) < 12) & (np.abs(35.0 - phi) < 12))
            | ((np.abs(lam - 225.0) < 12) & (np.abs(35.0 - phi) < 12))
            | (phi < -78)
        )
        return np.where(land, 1.0, 0.0)

    model = make_model(grid, free_surface=SplitExplicitFreeSurface(substeps=substeps),
                       bottom_height=bottom)

    def ui(lam, phi):
        return 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2

    def vi(lam, phi):
        return 0.05 * np.sin(np.deg2rad(lam) * 3) * np.cos(np.deg2rad(phi) * 2)

    def ci(lam, phi):
        return np.sin(2 * np.pi * np.deg2rad(phi) * 8 / 167.0)

    return model, initial_state(model, u=ui, v=vi, c=ci)


@pytest.mark.parametrize("n", [2, 8])
def test_sharded_matches_serial(n):
    """The full sharded step (ppermute exchange + top-shard fold + comm-free barotropic
    loop) must reproduce the serial step bit-for-bit in float64 on every interior
    point, for several steps."""
    model, state = small_model()
    mesh = make_mesh(n)
    dist_model, dist_state = distribute(model, state, mesh)
    fn = sharded_step_fn(mesh, dist_model)
    sj = jax.jit(step)

    s_serial = state
    s_dist = dist_state
    for _ in range(5):
        s_serial = sj(model, s_serial, 120.0)
        s_dist = fn(s_dist, 120.0)

    gathered = gather_state(s_dist, model, n)
    g, ge = model.grid, model.grid_ext
    for name, grid_of in [("u", g), ("v", g), ("c", g), ("eta", ge), ("U", ge), ("V", ge)]:
        a = np.asarray(grid_of.interior(getattr(s_serial, name)))
        b = np.asarray(grid_of.interior(getattr(gathered, name)))
        np.testing.assert_allclose(a, b, rtol=0, atol=0, err_msg=name)


def test_distribute_requires_divisibility():
    model, state = small_model(ny=48)
    mesh = make_mesh(5)
    with pytest.raises(ValueError):
        distribute(model, state, mesh)


def test_halo_exchange_roundtrip():
    """fill_halos_spmd on a y-linear field: north/south halos must hold the neighbor's
    interior rows; shard 0 south is zero-gradient; top shard north is folded."""
    from functools import partial

    from orthogonalsphericalshellgrids_tpu.ops.location import CC
    from orthogonalsphericalshellgrids_tpu.ops.spmd import Spmd, fill_halos_spmd
    from jax.sharding import PartitionSpec as P

    n, ny, Nx, Hx, Hy = 4, 6, 8, 2, 2
    mesh = make_mesh(n)
    spmd = Spmd("y", n)

    # global j index as field value (interior j = 0..n*ny-1)
    blocks = []
    for k in range(n):
        A = np.zeros((ny + 2 * Hy, Nx + 2 * Hx))
        A[Hy : Hy + ny, Hx : Hx + Nx] = (
            np.arange(k * ny, (k + 1) * ny)[:, None] + np.zeros((1, Nx))
        )
        blocks.append(A)
    stacked = np.concatenate(blocks, axis=0)

    fn = jax.jit(
        jax.shard_map(
            partial(fill_halos_spmd, loc=CC, sign=1, Nx=Nx, ny=ny, Hx=Hx, Hy=Hy, spmd=spmd),
            mesh=mesh, in_specs=P("y", None), out_specs=P("y", None),
        )
    )
    out = np.asarray(fn(jnp.asarray(stacked)))

    rows = ny + 2 * Hy
    for k in range(n):
        blk = out[k * rows : (k + 1) * rows]
        if k > 0:  # south halo = previous shard's top interior rows
            np.testing.assert_array_equal(blk[:Hy, Hx], np.arange(k * ny - Hy, k * ny))
        else:  # zero-gradient
            np.testing.assert_array_equal(blk[:Hy, Hx], [0, 0])
        if k < n - 1:  # north halo = next shard's bottom interior rows
            np.testing.assert_array_equal(
                blk[Hy + ny :, Hx], np.arange((k + 1) * ny, (k + 1) * ny + Hy)
            )
        else:  # folded: halo row Ny+j <- row Ny-j (global rows), center-y duplication
            Nglob = n * ny
            np.testing.assert_array_equal(
                blk[Hy + ny :, Hx], [Nglob - 2, Nglob - 3]
            )


def test_sharded_layered_matches_serial():
    """The y-sharded LAYERED step (3-D (Nz, y, x) leaves, replicated layer axis) must
    reproduce the serial layered step on every interior point, buoyancy included."""
    from orthogonalsphericalshellgrids_tpu.models import (
        layered_initial_state, layered_step, make_layered_model,
    )
    from orthogonalsphericalshellgrids_tpu.parallel import (
        distribute_layered, gather_layered_state, sharded_layered_step_fn,
    )

    grid = osg.TripolarGrid.make((32, 48, 3), dtype=jnp.float64, z=(-1000.0, 0.0),
                                 first_pole_longitude=45.0, north_poles_latitude=35.0)

    def bottom(lam, phi):
        land = (
            ((np.abs(lam - 45.0) < 12) & (np.abs(35.0 - phi) < 12))
            | ((np.abs(lam - 225.0) < 12) & (np.abs(35.0 - phi) < 12))
            | (phi < -78)
        )
        return np.where(land, 1.0, -1000.0)

    model = make_layered_model(grid, free_surface=SplitExplicitFreeSurface(substeps=6),
                               bottom_height=bottom, buoyancy=True)
    state = layered_initial_state(
        model,
        u=lambda lam, phi, z: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        v=lambda lam, phi, z: 0.05 * np.sin(np.deg2rad(lam) * 3),
        c=lambda lam, phi, z: np.sin(2 * np.pi * np.deg2rad(phi) * 8 / 167.0),
        b=lambda lam, phi, z: 1e-5 * z + 1e-4 * np.sin(np.deg2rad(lam)),
    )

    n = 4
    mesh = make_mesh(n)
    dist_model, dist_state = distribute_layered(model, state, mesh)
    fn = sharded_layered_step_fn(mesh, dist_model)

    ss, ds = state, dist_state
    sj = jax.jit(layered_step)
    for _ in range(3):
        ss = sj(model, ss, 60.0)
        ds = fn(ds, 60.0)

    got = gather_layered_state(ds, model, n)
    g = model.grid
    I3 = (slice(None),) + g.interior2d
    for name in ("u", "v", "c", "b"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)[I3]), np.asarray(getattr(ss, name)[I3]),
            rtol=0, atol=1e-13, err_msg=name)
    ge = model.baro.grid_ext
    np.testing.assert_allclose(np.asarray(ge.interior(got.eta)),
                               np.asarray(ge.interior(ss.eta)), rtol=0, atol=1e-13)


@pytest.mark.parametrize("forcing", [False, True])
def test_overlap_split_bitwise(forcing):
    """The interior/boundary-split tendency path (comm/compute overlap: the bulk
    stencil pass has no data dependence on the ppermute exchange) must be
    bitwise-equal to the unsplit sharded step — with and without forcing/closure
    terms (which route through the same split)."""
    grid = osg.TripolarGrid.make((32, 48, 1), dtype=jnp.float64,
                                 first_pole_longitude=45.0, north_poles_latitude=35.0)

    def bottom(lam, phi):
        land = (
            ((np.abs(lam - 45.0) < 12) & (np.abs(35.0 - phi) < 12))
            | ((np.abs(lam - 225.0) < 12) & (np.abs(35.0 - phi) < 12))
            | (phi < -78)
        )
        return np.where(land, 1.0, 0.0)

    kw = dict(free_surface=SplitExplicitFreeSurface(substeps=6), bottom_height=bottom)
    if forcing:
        kw.update(nu_h=5e3, kappa_h=1e3, bottom_drag=("linear", 1e-3),
                  wind_stress=lambda lam, phi: (np.full_like(lam, 1e-4),
                                                np.zeros_like(lam)))
    model = make_model(grid, **kw)
    state = initial_state(
        model,
        u=lambda lam, phi: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        v=lambda lam, phi: 0.05 * np.sin(np.deg2rad(lam) * 3),
        c=lambda lam, phi: np.sin(2 * np.pi * np.deg2rad(phi) * 8 / 167.0),
    )
    n = 8
    mesh = make_mesh(n)
    dist_model, dist_state = distribute(model, state, mesh)
    fn_split = sharded_step_fn(mesh, dist_model, overlap=True)
    fn_unsplit = sharded_step_fn(mesh, dist_model, overlap=False)

    sa = sb = dist_state
    for _ in range(4):
        sa = fn_split(sa, 120.0)
        sb = fn_unsplit(sb, 120.0)

    # Interior PROGNOSTICS must be BITWISE equal (halo rows are scratch in both
    # paths — refilled from interiors before every read). The stored AB2 tendencies
    # are allowed a ~1-ulp drift: the split graph fuses differently, so LLVM's
    # FMA-contraction decisions can differ on identical input values.
    ga = gather_state(sa, model, n)
    gb = gather_state(sb, model, n)
    g, ge = model.grid, model.grid_ext
    for name, grid_of in [("u", g), ("v", g), ("c", g), ("eta", ge), ("U", ge),
                          ("V", ge)]:
        np.testing.assert_array_equal(
            np.asarray(grid_of.interior(getattr(ga, name))),
            np.asarray(grid_of.interior(getattr(gb, name))), err_msg=name)
    for name in ("Gu", "Gv", "Gc"):
        np.testing.assert_allclose(
            np.asarray(g.interior(getattr(ga, name))),
            np.asarray(g.interior(getattr(gb, name))),
            rtol=1e-11, atol=0, err_msg=name)


def test_per_shard_output_and_stitch(tmp_path):
    """ShardedOutputWriter writes each shard's interior from its addressable device
    shard (no host gather of the global array — SURVEY O11's distributed half,
    reference examples/distributed_bickley_jet.jl:83-87); FieldTimeSeries stitches
    the rank files back to the global interior, matching the gathered state."""
    from orthogonalsphericalshellgrids_tpu.utils.output import (
        FieldTimeSeries, ShardedOutputWriter)

    model, state = small_model()
    n = 4
    mesh = make_mesh(n)
    dist_model, dist_state = distribute(model, state, mesh)
    fn = sharded_step_fn(mesh, dist_model)

    base = str(tmp_path / "dist_run.npz")
    writer = ShardedOutputWriter(base, {}, dist_model)

    s = dist_state
    times = []
    for i in range(3):
        s = fn(s, 120.0)
        t = 120.0 * (i + 1)
        times.append(t)
        writer.write(t, {"c": s.c, "eta": s.eta})  # base- and extended-halo leaves

    # one archive per rank exists; none at the base name (nothing was gathered)
    import os
    assert not os.path.exists(base)
    for k in range(n):
        assert os.path.exists(writer.rank_filename(k)), k

    # per-rank shape: local interior
    part = FieldTimeSeries(writer.rank_filename(1), "c")
    assert part[0].shape == (model.grid.Ny // n, model.grid.Nx)

    # stitched global interiors match the gathered state exactly
    gathered = gather_state(s, model, n)
    for name, grid_of in [("c", model.grid), ("eta", model.grid_ext)]:
        fts = FieldTimeSeries(base, name)
        np.testing.assert_allclose(fts.times, times)
        np.testing.assert_array_equal(
            fts[-1], np.asarray(grid_of.interior(getattr(gathered, name))),
            err_msg=name)


def test_sharded_checkpoint_round_trip(tmp_path):
    """Orbax checkpoint of a *sharded* state: save and restore keep the
    NamedSharding (no host gather round-trip) and the values, so a distributed run
    resumes in place."""
    import jax

    from orthogonalsphericalshellgrids_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint)

    model, state = small_model()
    n = 4
    mesh = make_mesh(n)
    dist_model, dist_state = distribute(model, state, mesh)
    fn = sharded_step_fn(mesh, dist_model)
    s = fn(dist_state, 120.0)

    path = str(tmp_path / "ckpt_sharded")
    save_checkpoint(path, s)
    restored = load_checkpoint(path, like=jax.tree_util.tree_map(jnp.zeros_like, s))

    for name in ("u", "v", "c", "eta"):
        orig = getattr(s, name)
        back = getattr(restored, name)
        assert back.sharding.is_equivalent_to(orig.sharding, orig.ndim), name
        np.testing.assert_array_equal(np.asarray(back), np.asarray(orig), err_msg=name)

    # the restored state steps identically to the original
    np.testing.assert_array_equal(
        np.asarray(fn(restored, 120.0).u), np.asarray(fn(s, 120.0).u))


def test_sharded_layered_multi_tracer_eos():
    """Layered multi-tracer + linear-EOS run: the sharded step over the (n·Nz)-plane
    tracer stack must match serial on every interior point."""
    from orthogonalsphericalshellgrids_tpu.models import (
        layered_initial_state, layered_step, make_layered_model,
    )
    from orthogonalsphericalshellgrids_tpu.parallel import (
        distribute_layered, gather_layered_state, sharded_layered_step_fn,
    )

    grid = osg.TripolarGrid.make((32, 48, 3), dtype=jnp.float64, z=(-1000.0, 0.0),
                                 first_pole_longitude=45.0, north_poles_latitude=35.0)

    def bottom(lam, phi):
        land = (
            ((np.abs(lam - 45.0) < 12) & (np.abs(35.0 - phi) < 12))
            | ((np.abs(lam - 225.0) < 12) & (np.abs(35.0 - phi) < 12))
            | (phi < -78)
        )
        return np.where(land, 1.0, -1000.0)

    model = make_layered_model(grid, free_surface=SplitExplicitFreeSurface(substeps=6),
                               bottom_height=bottom, tracers=("T", "S"),
                               buoyancy="linear_eos")
    state = layered_initial_state(
        model,
        u=lambda lam, phi, z: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        c={"T": lambda lam, phi, z: 10.0 + 5e-3 * z + np.sin(np.deg2rad(lam)),
           "S": lambda lam, phi, z: 35.0 + 0.1 * np.cos(np.deg2rad(phi) * 2)},
    )
    assert state.c.shape[0] == 2 * model.nz

    n = 4
    mesh = make_mesh(n)
    dist_model, dist_state = distribute_layered(model, state, mesh)
    fn = sharded_layered_step_fn(mesh, dist_model)

    ss, ds = state, dist_state
    sj = jax.jit(layered_step)
    for _ in range(3):
        ss = sj(model, ss, 60.0)
        ds = fn(ds, 60.0)

    got = gather_layered_state(ds, model, n)
    g = model.grid
    I3 = (slice(None),) + g.interior2d
    for name in ("u", "v", "c"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)[I3]), np.asarray(getattr(ss, name)[I3]),
            rtol=0, atol=1e-13, err_msg=name)


def test_layered_overlap_split_bitwise():
    """The LAYERED interior/boundary-split path (the whole (3-4)*Nz-plane stack
    exchanged while the bulk per-layer stencils run) must be bitwise-equal to the
    unsplit sharded layered step — buoyancy, vertical mixing and wind/drag included
    (they all route through the same split)."""
    from orthogonalsphericalshellgrids_tpu.models import (
        layered_initial_state, make_layered_model,
    )
    from orthogonalsphericalshellgrids_tpu.parallel import (
        distribute_layered, gather_layered_state, sharded_layered_step_fn,
    )

    grid = osg.TripolarGrid.make((32, 48, 3), dtype=jnp.float64, z=(-900.0, 0.0),
                                 first_pole_longitude=45.0, north_poles_latitude=35.0)

    def bottom(lam, phi):
        land = (
            ((np.abs(lam - 45.0) < 12) & (np.abs(35.0 - phi) < 12))
            | ((np.abs(lam - 225.0) < 12) & (np.abs(35.0 - phi) < 12))
            | (phi < -78)
        )
        return np.where(land, 1.0, -900.0)

    model = make_layered_model(
        grid, free_surface=SplitExplicitFreeSurface(substeps=6),
        bottom_height=bottom, buoyancy=True, coriolis=True, nu_h=1e3, kappa_v=1e-4,
        bottom_drag=("quadratic", 2.5e-3),
        wind_stress=lambda lam, phi: (np.full_like(lam, 1e-4), np.zeros_like(lam)))
    state = layered_initial_state(
        model,
        u=lambda lam, phi, z: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        v=lambda lam, phi, z: 0.05 * np.sin(np.deg2rad(lam) * 3),
        c=lambda lam, phi, z: np.sin(2 * np.pi * np.deg2rad(phi) * 8 / 167.0),
        b=lambda lam, phi, z: 1e-5 * z + 1e-4 * np.sin(np.deg2rad(lam)),
    )
    n = 4
    mesh = make_mesh(n)
    dist_model, dist_state = distribute_layered(model, state, mesh)
    fn_split = sharded_layered_step_fn(mesh, dist_model, overlap=True)
    fn_unsplit = sharded_layered_step_fn(mesh, dist_model, overlap=False)

    sa = sb = dist_state
    for _ in range(3):
        sa = fn_split(sa, 60.0)
        sb = fn_unsplit(sb, 60.0)

    ga = gather_layered_state(sa, model, n)
    gb = gather_layered_state(sb, model, n)
    g = model.grid
    ge = model.baro.grid_ext
    I3 = (slice(None),) + g.interior2d
    for name in ("u", "v", "c", "b"):
        np.testing.assert_array_equal(np.asarray(getattr(ga, name))[I3],
                                      np.asarray(getattr(gb, name))[I3], err_msg=name)
    for name in ("eta", "U", "V"):
        np.testing.assert_array_equal(np.asarray(ge.interior(getattr(ga, name))),
                                      np.asarray(ge.interior(getattr(gb, name))),
                                      err_msg=name)
    for name in ("Gu", "Gv", "Gc", "Gb"):
        np.testing.assert_allclose(np.asarray(getattr(ga, name))[I3],
                                   np.asarray(getattr(gb, name))[I3],
                                   rtol=1e-11, atol=1e-24, err_msg=name)
