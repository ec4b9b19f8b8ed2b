"""Layered-engine benchmark: wind-driven T/S gyre at benchmark scale — 1/4-degree
(1440x680) tripolar grid, Nz=10 stretched layers, T/S + linear EOS, Coriolis, wind
stress + quadratic bottom drag, horizontal/vertical mixing, split-explicit
substeps=30. This is the realistic shape of BASELINE.md config #5 ("1/4° ocean with
split-explicit free surface") — the layered half of the product that bench.py's
single-layer headline does not cover.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Points = Nx*Ny*Nz (9.79M per step). vs_baseline follows bench.py's protocol: the
denominator is the SAME workload measured through this repo's XLA:CPU backend on
this host (benchmarks/cpu_reference_proxy.py --layered) — the reference stack's own
execution vehicle is the CPU. Timing is steady-state scanned blocks, best-of-3
windows (the axon tunnel throttles in multi-minute windows; see bench.py).
"""

from __future__ import annotations

import json
import sys
import time

# Measured CPU-host throughput of the IDENTICAL layered workload (best of 3; see
# module docstring). Re-measure: `python benchmarks/cpu_reference_proxy.py layered=1`.
# NOTE it is HIGHER per point than the single-layer CPU proxy (5.38e6): per-point
# work drops with depth because the barotropic subcycle amortizes over Nz layers.
MEASURED_CPU_HOST_POINTS_PER_S = 7.46e6  # 2026-08-20, 2-vCPU host, 1440x680x10


def main(nx=1440, ny=680, nz=10, substeps=30, warmup=3, steps=12):
    import jax

    sys.path.insert(0, ".")
    from functools import partial

    from examples.wind_driven_ts_gyre import build
    from orthogonalsphericalshellgrids_tpu.models.layered import layered_multi_step

    model, state = build(nx=nx, ny=ny, nz=nz, substeps=substeps)
    block = 10  # steps per jitted call (the TimeStepWizard cadence)
    sj = jax.jit(partial(layered_multi_step, n_steps=block), donate_argnums=(1,))

    from orthogonalsphericalshellgrids_tpu.utils.profiling import device_sync

    dt = 40.0
    s = state
    for _ in range(warmup):
        s = sj(model, s, dt)
    device_sync(s)

    # windows sync by scalar fetch: block_until_ready has been observed not to wait
    # on this backend (see utils/profiling.device_sync), which would inflate the metric
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            s = sj(model, s, dt)
        device_sync(s)
        best = min(best, time.perf_counter() - t0)
    elapsed = best
    n_steps = steps * block

    import jax.numpy as jnp

    assert bool(jnp.all(jnp.isfinite(s.u))), "benchmark produced non-finite fields"

    points_per_s = nx * ny * nz * n_steps / elapsed
    print(json.dumps({
        "metric": (f"grid-points/s/chip (T/S gyre, 1/4deg x {nz} layers, linear EOS, "
                   f"WENO-5 + split-explicit substeps={substeps})"),
        "value": round(points_per_s, 1),
        "unit": "grid-points/s/chip",
        "vs_baseline": round(points_per_s / MEASURED_CPU_HOST_POINTS_PER_S, 3),
    }))


if __name__ == "__main__":
    kw = {}
    for arg in sys.argv[1:]:
        k, v = arg.lstrip("-").split("=")
        kw[k] = int(v)
    main(**kw)
