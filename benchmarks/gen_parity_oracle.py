"""Generate the numerical-parity artifacts (tests/data/) and the convergence report.

Why this exists: BASELINE.md's correctness gate asks for prognostic fields allclose
to the Julia/Oceananigans reference. Julia is not installable in this environment
(no package installs), so the gate is closed with the strongest machine-checkable
substitutes:

1. a CONVERGENCE STUDY — the Bickley jet integrated at 3 resolutions with
   resolution-scaled dt; interior fields box-coarsened to the next-coarser grid and
   compared in an unmasked latitude band. A scheme that diverged from the intended
   discretization (wrong WENO coefficients, broken metric terms, mis-staggered
   gradients) would not converge at order ~2 toward the continuum solution;

2. a TRAJECTORY ORACLE — the reference-resolution (180x90, halo 5, substeps 30)
   Bickley jet at fixed dt = 120 s for 60 steps in float64 on the CPU backend,
   with u/v/eta/c snapshots and the full KE/enstrophy/tracer-variance curves stored
   in tests/data/bickley_oracle_180x90.npz. tests/test_parity.py re-runs the first
   segment and asserts against the stored trajectory, so any future change to the
   dynamics is a visible, deliberate diff of this artifact.

Run on the CPU backend for reproducibility:
    python benchmarks/gen_parity_oracle.py [--skip-convergence]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def build(nx, ny, substeps=30):
    from examples.bickley_jet import build as b

    return b(nx=nx, ny=ny, dtype=jnp.float64, substeps=substeps)


def run_steps(model, state, dt, n):
    from functools import partial

    from orthogonalsphericalshellgrids_tpu.models.hydrostatic import multi_step

    fn = jax.jit(partial(multi_step, n_steps=n))
    return fn(model, state, dt)


def diagnostics(model, state):
    from orthogonalsphericalshellgrids_tpu.models.hydrostatic import vorticity
    from orthogonalsphericalshellgrids_tpu.ops import zipper
    from orthogonalsphericalshellgrids_tpu.ops.location import CC, CF, FC

    g = model.grid
    u = zipper.fill_halos(state.u, FC, -1, g.Nx, g.Ny, g.Hx, g.Hy, xp=jnp)
    v = zipper.fill_halos(state.v, CF, -1, g.Nx, g.Ny, g.Hx, g.Hy, xp=jnp)
    zeta = vorticity(model, u, v)
    az = g.az_cc * model.ib.mask_c
    I = g.interior2d
    ke = float(jnp.sum((0.5 * (u**2 + v**2) * az)[I]))
    ens = float(jnp.sum((zeta**2 * g.az_ff)[I]))
    cvar = float(jnp.sum((state.c**2 * az)[I]))
    return ke, ens, cvar


def band_mask(model):
    """Wet CC cells with phi in (-60, 10): jet region, away from the pole masks and
    Antarctica, where cells refine cleanly across resolutions."""
    g = model.grid
    phi = np.asarray(g.phi_cc)[g.interior2d]
    wet = np.asarray(model.ib.mask_c)[g.interior2d] > 0
    return wet & (phi > -60.0) & (phi < 10.0)


def sample_to_coarse(a_fine):
    """Fine CC field sampled at the coarse grid's CC points.

    Nesting contract (why these resolutions): φ centers are
    ``linspace(south, 90, Nφ)``, so with ``Nφ_f = 2·Nφ_c − 1`` fine row 2k sits
    EXACTLY at coarse row k; λ centers are ``(i+0.5)·Δλ``, so the coarse center lies
    exactly midway between fine centers 2i and 2i+1 — their mean is a 2nd-order
    sample there. Sampling error is O(h²), so the comparison resolves convergence
    orders up to 2 (plain 2×2 box-coarsening misaligns by O(h) in φ and caps the
    measured order at 1 — measured: c order 1.02 with boxes, ~2 with this)."""
    return 0.5 * (a_fine[0::2, 0::2] + a_fine[0::2, 1::2])


def convergence_study(T=6 * 3600.0):
    print("# Convergence study (Bickley jet, f64, CPU backend)")
    resolutions = [(96, 49), (192, 97), (384, 193)]
    dts = [160.0, 80.0, 40.0]
    fields = {}
    models = {}
    for (nx, ny), dt in zip(resolutions, dts):
        n = int(round(T / dt))
        model, state = build(nx, ny)
        out = run_steps(model, state, dt, n)
        g = model.grid
        fields[(nx, ny)] = {
            "c": np.asarray(out.c)[g.interior2d],
            "eta": np.asarray(model.grid_ext.interior(out.eta)),
        }
        models[(nx, ny)] = model
        print(f"  ran {nx}x{ny}, dt={dt}, steps={n}")

    report = {}
    for name in ("c", "eta"):
        errs = []
        for (fine, coarse) in [((192, 97), (96, 49)), ((384, 193), (192, 97))]:
            fc = sample_to_coarse(fields[fine][name])
            cc = fields[coarse][name]
            band = band_mask(models[coarse])
            e = np.sqrt(np.mean((fc[band] - cc[band]) ** 2))
            errs.append(e)
        order = np.log2(errs[0] / errs[1])
        report[name] = (errs, order)
        print(f"  {name}: L2 errors {errs[0]:.3e} -> {errs[1]:.3e}, order {order:.2f}")
    return report


def gen_oracle(nx=180, ny=90, dt=120.0, n_steps=60, every=20):
    model, state = build(nx, ny)
    g = model.grid

    snaps = {}
    curves = {"ke": [], "ens": [], "cvar": []}
    s = state

    def snap(k, s):
        snaps[f"u.{k:03d}"] = np.asarray(s.u)[g.interior2d]
        snaps[f"v.{k:03d}"] = np.asarray(s.v)[g.interior2d]
        snaps[f"c.{k:03d}"] = np.asarray(s.c)[g.interior2d]
        snaps[f"eta.{k:03d}"] = np.asarray(model.grid_ext.interior(s.eta))

    snap(0, s)
    for k in range(n_steps):
        s = run_steps(model, s, dt, 1)
        ke, ens, cvar = diagnostics(model, s)
        curves["ke"].append(ke)
        curves["ens"].append(ens)
        curves["cvar"].append(cvar)
        if (k + 1) % every == 0:
            snap(k + 1, s)

    os.makedirs(DATA_DIR, exist_ok=True)
    path = os.path.join(DATA_DIR, f"bickley_oracle_{nx}x{ny}.npz")
    np.savez_compressed(
        path,
        meta=np.asarray([nx, ny, dt, n_steps, every]),
        ke=np.asarray(curves["ke"]),
        ens=np.asarray(curves["ens"]),
        cvar=np.asarray(curves["cvar"]),
        **snaps,
    )
    print(f"# Oracle written: {path} ({os.path.getsize(path)/1e6:.2f} MB)")


def gen_layered_oracle(nx=120, ny=60, nz=4, dt=120.0, n_steps=30, every=15):
    """Frozen f64 CPU trajectory of the baroclinic-front workload (buoyancy-driven
    layered dynamics with Coriolis + vertical mixing) — the layered analog of the
    Bickley oracle: any change to the layered dynamics becomes a deliberate diff of
    this artifact (tests/test_parity.py::test_layered_oracle_regression)."""
    from functools import partial

    from examples.baroclinic_front import build as build_front
    from orthogonalsphericalshellgrids_tpu.models.layered import layered_multi_step

    model, state = build_front(nx=nx, ny=ny, nz=nz, dtype=jnp.float64)
    g = model.grid
    fn = jax.jit(partial(layered_multi_step, n_steps=1))
    I3 = (slice(None),) + g.interior2d

    snaps = {}
    ke = []

    def snap(k, s):
        for name in ("u", "v", "b"):
            snaps[f"{name}.{k:03d}"] = np.asarray(getattr(s, name))[I3]

    snap(0, state)
    s = state
    az = g.az_cc * model.baro.ib.mask_c
    for k in range(n_steps):
        s = fn(model, s, dt)
        ke.append(float(jnp.sum(
            (0.5 * jnp.sum((s.u**2 + s.v**2) * model.dz3, axis=0) * az)[g.interior2d])))
        if (k + 1) % every == 0:
            snap(k + 1, s)

    os.makedirs(DATA_DIR, exist_ok=True)
    path = os.path.join(DATA_DIR, f"front_oracle_{nx}x{ny}x{nz}.npz")
    np.savez_compressed(path, meta=np.asarray([nx, ny, nz, dt, n_steps, every]),
                        ke=np.asarray(ke), **snaps)
    print(f"# Layered oracle written: {path} ({os.path.getsize(path)/1e6:.2f} MB)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--skip-convergence", action="store_true")
    p.add_argument("--skip-oracle", action="store_true")
    args = p.parse_args()
    if not args.skip_convergence:
        convergence_study()
    if not args.skip_oracle:
        gen_oracle()
        gen_layered_oracle()
