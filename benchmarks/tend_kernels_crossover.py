"""tend_kernels crossover measurement (round-4 verdict item 7).

``make_model(tend_kernels=True)`` routes the single-layer horizontal tendency
slices through the VMEM-resident Pallas window kernels. Round 4 measured a LOSS
for the plain benchmark config (738 vs 653 us/step: no closures, the XLA path
already at its op-mix speed of light) and hypothesized closure-heavy configs
may win (the kernels fuse the nu_h/kappa_h Laplacians and quadratic drag into
already-resident windows, which is where the LAYERED engine's win comes from).
This script measures BOTH regimes on the real chip at the 1/4-degree benchmark
geometry with the full closure set on, differential scan timing:

    python benchmarks/tend_kernels_crossover.py

and prints step time with kernels off/on for (a) the plain config and (b) the
closure config (nu_h=5e3, kappa_h=1e2, quadratic drag, Coriolis).
"""

import pathlib
import sys

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from orthogonalsphericalshellgrids_tpu.utils.profiling import scan_time_diff  # noqa: E402

print("device:", jax.devices()[0].device_kind, flush=True)


def measure(label, closures, nx=1440, ny=680, substeps=30):
    import dataclasses

    from examples.bickley_jet import build
    from orthogonalsphericalshellgrids_tpu.models.hydrostatic import step

    kw = dict(nu_h=5e3, kappa_h=1e2, bottom_drag=("quadratic", 2.5e-3),
              coriolis=True) if closures else {}
    model, state = build(nx=nx, ny=ny, substeps=substeps, **kw)
    dt = 60.0
    for flag in (False, True):
        m = dataclasses.replace(model, tend_kernels=flag)
        el = scan_time_diff(lambda s: step(m, s, dt), state,
                            lengths=(10, 30), n_outer=3)
        print(f"{label:28s} tend_kernels={flag!s:5s} {el * 1e6:9.1f} us/step",
              flush=True)


if __name__ == "__main__":
    measure("plain (no closures)", closures=False)
    measure("closures (nu_h/kappa_h/drag)", closures=True)
