"""Utility-layer tests: frame rotation round trip, checkpoint round trip,
diagnostics, output writer round trip."""

import numpy as np

import jax.numpy as jnp

import orthogonalsphericalshellgrids_tpu as osg
from orthogonalsphericalshellgrids_tpu.models import (
    SplitExplicitFreeSurface, initial_state, make_model,
)
from orthogonalsphericalshellgrids_tpu.models.diagnostics import (
    advective_cfl, kinetic_energy, max_speeds, vertical_vorticity,
)
from orthogonalsphericalshellgrids_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from orthogonalsphericalshellgrids_tpu.utils.rotation import to_latlon_frame, to_native_frame


def make(ny=24, nx=32):
    grid = osg.TripolarGrid.make((nx, ny, 1), dtype=jnp.float64)
    model = make_model(grid, free_surface=SplitExplicitFreeSurface(substeps=8))
    state = initial_state(
        model,
        u=lambda lam, phi: 1.0 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        v=lambda lam, phi: 0.1 * np.cos(np.deg2rad(lam)),
        c=lambda lam, phi: np.sin(np.deg2rad(phi)),
    )
    return model, state


def test_rotation_round_trip():
    """native -> latlon -> native must be the identity wherever the rotation is
    defined (|d| = 1), mirroring the reference's convert_to_latlong_frame /
    convert_to_native_frame pair (examples/convert_to_latlong_frame.jl)."""
    model, _ = make()
    g = model.grid
    u = jnp.ones(g.shape2d)
    v = 0.3 * jnp.ones(g.shape2d)
    ull, vll = to_latlon_frame(g, u, v)
    ub, vb = to_native_frame(g, ull, vll)
    from orthogonalsphericalshellgrids_tpu.utils.rotation import rotation_angle

    d1, d2 = rotation_angle(g)
    defined = np.asarray(g.interior(d1**2 + d2**2)) > 0.99
    np.testing.assert_allclose(
        np.asarray(g.interior(ub))[defined], 1.0, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(g.interior(vb))[defined], 0.3, atol=1e-10
    )
    # away from the poles the grid is nearly lat-lon: rotation ~ identity at the equator
    phi = np.asarray(g.interior(g.phi_cc))
    near_eq = np.abs(phi) < 10
    np.testing.assert_allclose(np.asarray(g.interior(d1))[near_eq], 1.0, atol=0.05)


def test_checkpoint_npz_round_trip(tmp_path):
    model, state = make()
    import jax

    s1 = jax.jit(lambda m, s: s)(model, state)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, s1)
    s2 = load_checkpoint(path, s1)
    for leaf1, leaf2 in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(leaf1), np.asarray(leaf2))


def test_checkpoint_orbax_round_trip(tmp_path):
    try:
        import orbax.checkpoint  # noqa
    except Exception:
        import pytest

        pytest.skip("orbax not available")
    model, state = make()
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint(path, state)
    s2 = load_checkpoint(path, state)
    import jax

    for leaf1, leaf2 in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(leaf1), np.asarray(leaf2))


def test_diagnostics():
    model, state = make()
    z = vertical_vorticity(model, state)
    ke = kinetic_energy(model, state)
    umax, vmax = max_speeds(model, state)
    cfl = advective_cfl(model, state, 60.0)
    assert bool(jnp.all(jnp.isfinite(z)))
    assert float(ke.min()) >= 0
    assert 0.9 < float(umax) <= 1.2
    assert float(cfl) > 0


def test_output_writer_round_trip(tmp_path):
    from orthogonalsphericalshellgrids_tpu.utils.output import FieldTimeSeries, OutputWriter
    from orthogonalsphericalshellgrids_tpu.utils.simulation import (
        IterationInterval, Simulation)

    model, state = make()
    path = str(tmp_path / "run.npz")
    writer = OutputWriter(path, {
        "c": lambda sim: sim.state.c,
        "eta": lambda sim: sim.state.eta,   # extended-grid field: interior crop differs
    })
    sim = Simulation(model, state, dt=60.0, stop_iteration=4)
    sim.add_callback(writer, IterationInterval(2))
    sim.run()

    fts = FieldTimeSeries(path, "c")
    assert len(fts) == 2
    assert fts[0].shape == (model.grid.Ny, model.grid.Nx)
    assert np.all(np.isfinite(fts.data))
    np.testing.assert_allclose(fts.times, [120.0, 240.0])
    eta = FieldTimeSeries(path, "eta")
    assert eta[0].shape == (model.grid_ext.Ny, model.grid_ext.Nx)


def test_output_writer_async(tmp_path):
    from orthogonalsphericalshellgrids_tpu.utils.output import FieldTimeSeries, OutputWriter
    from orthogonalsphericalshellgrids_tpu.utils.simulation import (
        IterationInterval, Simulation)

    model, state = make()
    path = str(tmp_path / "run_async.npz")
    writer = OutputWriter(path, {"c": lambda sim: sim.state.c}, async_write=True)
    sim = Simulation(model, state, dt=60.0, stop_iteration=4)
    sim.add_callback(writer, IterationInterval(1))
    sim.run()  # run() drains the writer thread

    fts = FieldTimeSeries(path, "c")
    assert len(fts) == 4 and np.all(np.isfinite(fts.data))


def test_profiling_helpers(tmp_path):
    import jax
    from orthogonalsphericalshellgrids_tpu.models import step
    from orthogonalsphericalshellgrids_tpu.utils.profiling import time_steps, trace

    model, state = make()
    sj = jax.jit(step)
    ms, s = time_steps(sj, model, state, 60.0, n=3, warmup=1)
    assert ms > 0 and np.isfinite(np.asarray(s.u)).all()

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jax.block_until_ready(sj(model, state, 60.0))
    import os
    found = [f for root, _, fs in os.walk(logdir) for f in fs]
    assert found, "profiler trace produced no files"


def test_nan_checker_aborts():
    """The NaNChecker callback (installed by default, Oceananigans semantics) aborts
    the run when a prognostic goes non-finite."""
    import dataclasses as dc

    import pytest

    from orthogonalsphericalshellgrids_tpu.utils.simulation import (
        IterationInterval, NaNChecker, Simulation,
    )

    model, state = make()
    sim = Simulation(model, state, dt=30.0, stop_iteration=3)
    assert any(isinstance(fn, NaNChecker) for _, fn in sim.callbacks)  # default

    bad = dc.replace(state, u=state.u.at[10, 10].set(jnp.nan))
    sim = Simulation(model, bad, dt=30.0, stop_iteration=3)
    sim.add_callback(NaNChecker(), IterationInterval(1))
    with pytest.raises(RuntimeError, match="non-finite"):
        sim.run()


def test_checkpointer_pickup(tmp_path):
    """Periodic Checkpointer + run(pickup=True): resuming from the newest checkpoint
    must reproduce the straight-through trajectory bitwise."""
    from orthogonalsphericalshellgrids_tpu.utils.simulation import (
        Checkpointer, IterationInterval, Simulation,
    )

    prefix = str(tmp_path / "ck")
    model, state = make()

    simA = Simulation(model, state, dt=30.0, stop_iteration=6)
    simA.add_callback(Checkpointer(prefix), IterationInterval(3))
    simA.run()
    assert Checkpointer.latest(prefix).endswith("_iteration6.npz")

    simB = Simulation(model, state, dt=30.0, stop_iteration=9)
    simB.add_callback(Checkpointer(prefix), IterationInterval(3))
    endB = simB.run(pickup=True)
    assert int(endB.iteration) == 9

    simC = Simulation(model, state, dt=30.0, stop_iteration=9)
    endC = simC.run()
    np.testing.assert_array_equal(np.asarray(endB.u), np.asarray(endC.u))
    np.testing.assert_array_equal(np.asarray(endB.c), np.asarray(endC.c))

    import pytest

    with pytest.raises(ValueError, match="pickup=True"):
        Simulation(model, state, dt=30.0, stop_iteration=1).run(pickup=True)


def test_checkpointer_latest_edge_cases(tmp_path):
    """latest() must key on the FINAL _iteration<N> token (a directory named
    _iteration7 must not shadow the file numbers) and must ignore glob metachars."""
    from orthogonalsphericalshellgrids_tpu.utils.simulation import Checkpointer

    d = tmp_path / "run_iteration7"
    d.mkdir()
    prefix = str(d / "ck")
    for it in (2, 10):
        open(f"{prefix}_iteration{it}.npz", "wb").write(b"x")
    assert Checkpointer.latest(prefix).endswith("_iteration10.npz")


def test_pickup_realigns_time_schedules(tmp_path):
    """A resumed run must produce the same TimeInterval event times as the
    uninterrupted run (no immediate off-schedule firing after pickup)."""
    from orthogonalsphericalshellgrids_tpu.utils.simulation import (
        Checkpointer, IterationInterval, Simulation, TimeInterval,
    )

    model, state = make()
    prefix = str(tmp_path / "ck")

    def run_collect(sim, pickup=None):
        fired = []
        sim.add_callback(lambda s: fired.append(round(s.time)), TimeInterval(300.0))
        sim.run(pickup=pickup)
        return fired

    # straight-through: 12 steps of 60 s -> events at 300, 600, 720(=end crossing)?
    simC = Simulation(model, state, dt=60.0, stop_iteration=12)
    ref = run_collect(simC)

    simA = Simulation(model, state, dt=60.0, stop_iteration=6)
    simA.add_callback(Checkpointer(prefix), IterationInterval(6))
    firedA = run_collect(simA)
    simB = Simulation(model, state, dt=60.0, stop_iteration=12)
    simB.add_callback(Checkpointer(prefix), IterationInterval(6))
    firedB = run_collect(simB, pickup=True)
    assert firedA + firedB == ref, (firedA, firedB, ref)


def test_netcdf_writer_round_trip(tmp_path):
    """NetCDFWriter produces a valid NetCDF3 file: times, per-snapshot fields, and
    cell-center coordinate variables all read back correctly."""
    from orthogonalsphericalshellgrids_tpu.utils.output import (
        NetCDFWriter, read_netcdf_series,
    )
    from orthogonalsphericalshellgrids_tpu.utils.simulation import (
        IterationInterval, Simulation,
    )

    model, state = make()
    path = str(tmp_path / "out.nc")
    w = NetCDFWriter(path, {
        "c": lambda s: s.state.c,
        "eta": lambda s: s.state.eta,   # extended-grid shape -> different dims
    })
    sim = Simulation(model, state, dt=30.0, stop_iteration=4)
    sim.add_callback(w, IterationInterval(2))
    sim.run()

    times, c = read_netcdf_series(path, "c")
    assert len(times) == 2 and np.all(np.diff(times) > 0)
    g = model.grid
    assert c.shape == (2, g.Ny, g.Nx)
    np.testing.assert_allclose(c[-1], np.asarray(g.interior(sim.state.c)))
    _, eta = read_netcdf_series(path, "eta")
    assert eta.shape[1:] == (g.Ny, g.Nx) or eta.shape[1:] == (model.grid_ext.Ny,
                                                              model.grid_ext.Nx)
    _, lam = read_netcdf_series(path, "lam_cc")
    # scalar-less coordinate variable: not time-dependent, full interior
    assert np.asarray(lam).shape[-2:] == (g.Ny, g.Nx)
    assert np.isfinite(c).all()
