"""Interleaved A/B of the acc-fold (models/layered.py:ACC_FOLD): accumulate
the z-resident column kernel's (dGu, dGv, dGc) inside the mom/adv window
kernels vs the separate full-stack XLA add passes.

Both variants are traced in ONE process (the flag is read at trace time) and
their timing windows interleave round-by-round, so the axon tunnel's state
drift hits both equally — the same protocol that decided the corr-kernel
negative result. Run on the real chip:

    python benchmarks/ab_acc_fold.py
"""
import pathlib
import sys
import time
from functools import partial

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from examples.wind_driven_ts_gyre import build  # noqa: E402
from orthogonalsphericalshellgrids_tpu.models import layered  # noqa: E402
from orthogonalsphericalshellgrids_tpu.utils.profiling import (  # noqa: E402
    device_sync, stream_probe_gbps)

model, state = build(nx=1440, ny=680, nz=10, substeps=30)
dt = 40.0
block = 10


def make(fold):
    layered.ACC_FOLD = fold

    @jax.jit
    def step(mdl, s):
        return layered.layered_multi_step(mdl, s, dt, n_steps=block)

    # trace/compile NOW, while the flag holds this value
    s = step(model, state)
    device_sync(s)
    return step


step_on = make(True)
step_off = make(False)

SHORT, LONG = 4, 12
res = {True: [float("inf"), float("inf")], False: [float("inf"), float("inf")]}
for rnd in range(3):
    for fold, step in ((True, step_on), (False, step_off)):
        s = state
        t0 = time.perf_counter()
        for _ in range(SHORT):
            s = step(model, s)
        device_sync(s)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(LONG):
            s = step(model, s)
        device_sync(s)
        t_long = time.perf_counter() - t0
        res[fold][0] = min(res[fold][0], t_short)
        res[fold][1] = min(res[fold][1], t_long)
    print(f"round {rnd}: probe {stream_probe_gbps():.0f} GB/s", flush=True)

for fold in (True, False):
    t_short, t_long = res[fold]
    per_step = (t_long - t_short) / ((LONG - SHORT) * block)
    pts = 1440 * 680 * 10 / per_step
    print(f"acc_fold={fold}: {per_step * 1e3:.2f} ms/step "
          f"({pts / 1e9:.3f} G pts/s)", flush=True)
