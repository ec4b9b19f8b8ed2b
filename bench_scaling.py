"""Weak-scaling harness: y-sharded Bickley jet over an N-device mesh.

BASELINE.md's scaling metric is weak-scaling efficiency (>= 80% at N >= 2 hosts). Real
multi-chip hardware is not reachable from this environment (single tunneled chip), so
this harness runs on whatever devices exist — including virtual CPU devices:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench_scaling.py --platform cpu

NOTE: virtual CPU devices share the host's physical cores, so virtual-mesh efficiency
numbers measure correctness of the sharded path, not scaling (a 2-core host cannot
weak-scale 8 virtual devices); the efficiency target applies to real multi-chip runs.

Weak scaling: the per-device problem size is fixed (ny_per_device rows); efficiency at
N devices = T(1) / T(N) for N-times-larger problems. On real pods the halo exchange
rides ICI and the fold stays device-local (1-D y decomposition), so the communicated
bytes per device are constant in N — the design target for >= 80% efficiency.

Prints one JSON line per mesh size plus a summary efficiency line.
"""

from __future__ import annotations

import argparse
import json
import time
from orthogonalsphericalshellgrids_tpu.utils.profiling import device_sync  # fetch-sync: block_until_ready may not wait on this backend


def run(ndev, nx, ny_per_dev, steps, dt, substeps):
    import jax

    from examples.bickley_jet import build
    from orthogonalsphericalshellgrids_tpu.parallel import (
        distribute, make_mesh, sharded_step_fn,
    )

    ny = ny_per_dev * ndev
    model, state = build(nx, ny, substeps=substeps,
                         first_pole_longitude=45.0, north_poles_latitude=35.0)
    mesh = make_mesh(ndev)
    dist_model, dist_state = distribute(model, state, mesh)
    fn = sharded_step_fn(mesh, dist_model)

    s = fn(dist_state, dt)
    device_sync(s)
    t0 = time.perf_counter()
    for _ in range(steps):
        s = fn(s, dt)
    device_sync(s)
    el = time.perf_counter() - t0
    return nx * ny * steps / el


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=256)
    p.add_argument("--ny-per-dev", type=int, default=64)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--dt", type=float, default=120.0)
    p.add_argument("--substeps", type=int, default=12)
    p.add_argument("--platform", default=None)
    p.add_argument("--sizes", default=None, help="comma-separated mesh sizes")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    ndevs = len(jax.devices())
    sizes = ([int(x) for x in args.sizes.split(",")] if args.sizes
             else [n for n in (1, 2, 4, 8) if n <= ndevs])

    results = {}
    for n in sizes:
        pts = run(n, args.nx, args.ny_per_dev, args.steps, args.dt, args.substeps)
        results[n] = pts
        print(json.dumps({"metric": "weak-scaling grid-points/s", "devices": n,
                          "value": round(pts, 1), "unit": "points/s"}))

    if 1 in results and len(results) > 1:
        base = results[1]
        for n in sizes[1:]:
            eff = results[n] / (base * n)
            print(json.dumps({"metric": "weak-scaling efficiency",
                              "devices": n, "value": round(eff, 3), "unit": "ratio"}))


if __name__ == "__main__":
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    main()
