"""Measure the vs_baseline denominator for bench.py: the same Bickley-jet physics run
through this repo's XLA:CPU backend on this host.

The reference publishes no numbers and Julia is not in this image, so the reference
stack cannot be timed directly; its own execution vehicle is the CPU (CI and examples
are CPU-only, ``test/dependencies_for_runtests.jl:12``), so a one-host CPU run of
identical physics is the honest measured stand-in. Prints one JSON line; paste the
result into bench.py's MEASURED_CPU_HOST_POINTS_PER_S with the date.

Run from the repo root: ``python benchmarks/cpu_reference_proxy.py``.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from functools import partial

from examples.bickley_jet import build
from orthogonalsphericalshellgrids_tpu.models.hydrostatic import multi_step


def main(nx=1440, ny=680, substeps=30, blocks=2, layered=0, nz=10):
    # Default grid = bench.py's 1/4-degree grid so numerator and denominator use the
    # IDENTICAL workload (a small-grid CPU number would flatter the ratio: 360x180
    # is partly cache-resident and measures ~1.3x faster per point on this host).
    # ``layered=1``: bench_layered.py's workload instead (T/S gyre, Nz layers).
    if layered:
        from examples.wind_driven_ts_gyre import build as build_gyre
        from orthogonalsphericalshellgrids_tpu.models.layered import (
            layered_multi_step as stepper)

        model, state = build_gyre(nx=nx, ny=ny, nz=nz, substeps=substeps)
        block, dt = 5, 40.0
    else:
        model, state = build(nx=nx, ny=ny, substeps=substeps)
        stepper, block, dt = multi_step, 10, 60.0
        nz = 1
    sj = jax.jit(partial(stepper, n_steps=block), donate_argnums=(1,))
    s = sj(model, state, dt)  # warmup/compile
    jax.block_until_ready(s)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(blocks):
            s = sj(model, s, dt)
        jax.block_until_ready(s)
        best = min(best, time.perf_counter() - t0)
    pts = nx * ny * nz * blocks * block / best
    print(json.dumps({"cpu_points_per_s": round(pts, 1), "nx": nx, "ny": ny, "nz": nz,
                      "layered": bool(layered),
                      "elapsed_s": round(best, 3), "threads": os.cpu_count()}))


if __name__ == "__main__":
    kw = {}
    for arg in sys.argv[1:]:
        k, v = arg.lstrip("-").split("=")
        kw[k] = int(v)
    main(**kw)
