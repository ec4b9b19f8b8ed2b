"""Example-script smoke tests.

The example scripts are user-facing surface the unit suite doesn't otherwise cover —
a shard_map/Pallas tracing regression once lived only in the distributed example
path. These run the scripts' entry points at tiny sizes on the CPU backend."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_convert_to_latlong_frame_example():
    sys.path.insert(0, REPO)
    from examples.convert_to_latlong_frame import main
    main()  # asserts nothing itself; must run cleanly (prints round-trip errors)


def test_distributed_example_1d_and_2d():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    for extra in (["--ndev", "2"],
                  ["--decomp", "2d", "--ndev-x", "2", "--ndev", "1"]):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "examples", "distributed_bickley_jet.py"),
             "--platform", "cpu", "--nx", "64", "--ny", "48", "--steps", "2",
             "--dt", "60"] + extra,
            cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "steps on" in out.stdout, out.stdout


def test_visualize_example(tmp_path):
    sys.path.insert(0, REPO)
    from examples.visualize_tripolar_grid import main
    out = str(tmp_path / "nodes.png")
    main(out)
    assert os.path.getsize(out) > 10_000


def test_baroclinic_front_example(tmp_path):
    """Layered example: a short run must complete with finite output and develop the
    thermal-wind frontal jet (nonzero surface flow along the front)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "baroclinic_front.py"),
         "--platform", "cpu", "--nx", "48", "--ny", "32", "--nz", "4",
         "--days", "0.05", "--dt", "120",
         "--out", str(tmp_path / "front.npz")],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    from orthogonalsphericalshellgrids_tpu.utils import FieldTimeSeries
    us = FieldTimeSeries(str(tmp_path / "front.npz"), "u_surface")
    last = np.asarray(us[len(us) - 1])
    assert np.isfinite(last).all()
    assert np.abs(last).max() > 0.0


def test_ts_gyre_example(tmp_path):
    """Multi-tracer / linear-EOS / stretched-z / wind-forced example: a short run
    must complete, produce finite bounded tracers, and spin up flow from rest."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "wind_driven_ts_gyre.py"),
         "--platform", "cpu", "--nx", "48", "--ny", "32", "--nz", "3",
         "--days", "0.1", "--dt", "300",
         "--out", str(tmp_path / "gyre.npz")],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    from orthogonalsphericalshellgrids_tpu.utils import FieldTimeSeries
    T = np.asarray(FieldTimeSeries(str(tmp_path / "gyre.npz"), "T_surface")[0])
    u = np.asarray(FieldTimeSeries(str(tmp_path / "gyre.npz"), "u_surface")[0])
    assert np.isfinite(T).all() and np.isfinite(u).all()
    assert T.max() <= 20.0 + 1e-3 and T.min() >= 0.0  # advection stays in range
    assert np.abs(u).max() > 0.0                       # wind spun up flow
