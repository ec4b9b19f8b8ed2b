"""Comm/compute-overlap evidence: HLO dependency analysis of the sharded step.

The interior/boundary split (models/hydrostatic.tendencies_overlapped) claims the
bulk tendency compute has NO data dependence on the prognostic (u, v, c) halo
exchange, so a latency-hiding scheduler can run the ppermute concurrently with the
interior stencils. The CPU backend compiles collectives synchronously (no async
start/done pair to read a schedule from), so this script proves the claim at the
level that matters for ANY scheduler: the compiled HLO dependency graph.

For both variants (overlap=False/True) it:
  1. compiles the shard_map'ed step on the 8-virtual-device CPU mesh,
  2. locates the u/v/c exchange ppermutes (the (3, Hy, X) pair),
  3. computes their transitive dependents,
  4. reports how much of the module — and specifically which tendency-sized
     fusions — sit downstream of the exchange.

Expected: unsplit -> the full-height tendency fusions depend on the exchange
(nothing can overlap); split -> only the thin 3*Hy-row strip fusions depend on it,
the full-height bulk fusion does not (it can overlap with the exchange).

Output: a markdown summary on stdout (docs/performance.md cites the committed run).
"""

import os
import re
import sys
from collections import deque

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import orthogonalsphericalshellgrids_tpu as osg
from orthogonalsphericalshellgrids_tpu.models import (
    SplitExplicitFreeSurface, initial_state, make_model)
from orthogonalsphericalshellgrids_tpu.parallel import (
    distribute, make_mesh, sharded_step_fn)

_INSTR = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s*=\s*(\S+)\s+([\w\-]+)\((.*)$")
_OPERAND = re.compile(r"%([\w.\-]+)")


def parse_entry(hlo_text):
    """(name -> (shape, op, operand names)) for the ENTRY computation only."""
    lines = hlo_text.splitlines()
    in_entry = False
    table = {}
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and ln.startswith("}"):
            break
        if not in_entry:
            continue
        m = _INSTR.match(ln)
        if not m:
            continue
        name, shape, op, rest = m.groups()
        # operands are the %refs before any attribute list; attributes like
        # calls=%fusion.N computations would inflate the graph — keep them anyway
        # (transitive closure over called computations is conservative & fine here)
        ops = [o for o in _OPERAND.findall(rest)]
        table[name] = (shape, op, ops)
    return table


def dependents(table, roots):
    """All ENTRY instructions transitively consuming any of ``roots``."""
    users = {k: set() for k in table}
    for name, (_, _, ops) in table.items():
        for o in ops:
            if o in users:
                users[o].add(name)
    seen = set(roots)
    q = deque(roots)
    while q:
        cur = q.popleft()
        for u in users.get(cur, ()):
            if u not in seen:
                seen.add(u)
                q.append(u)
    return seen - set(roots)


def rows_of(shape):
    m = re.match(r"\w+\[([\d,]*)\]", shape)
    if not m or not m.group(1):
        return 0
    dims = [int(d) for d in m.group(1).split(",")]
    return dims[-2] if len(dims) >= 2 else 0


def analyze(overlap):
    g = osg.TripolarGrid.make((64, 64, 1), dtype=jnp.float64,
                              first_pole_longitude=45.0, north_poles_latitude=25.0)

    def bottom(lam, phi):
        land = (((np.abs(lam - 45.0) < 10) & (np.abs(25.0 - phi) < 10))
                | ((np.abs(lam - 225.0) < 10) & (np.abs(25.0 - phi) < 10))
                | (phi < -78))
        return np.where(land, 1.0, -1000.0)

    model = make_model(g, free_surface=SplitExplicitFreeSurface(substeps=8),
                       bottom_height=bottom)
    state = initial_state(model, u=lambda lam, phi: 1 / np.cosh(np.deg2rad(phi) * 8) ** 2)
    mesh = make_mesh(8)
    dm, ds = distribute(model, state, mesh)
    fn = sharded_step_fn(mesh, dm, overlap=overlap)
    hlo = fn.lower(ds, 60.0).compile().as_text()
    return _analyze_hlo(hlo, dm.grid, dm.grid_ext, overlap)


def _analyze_hlo(hlo, gl, gle, overlap):
    """Classify the compiled ENTRY by row counts DERIVED from the local grid
    metadata (no magic geometry): the baroclinic exchange payload carries Hy halo
    rows, the extended-stack pairs Hy_ext; bulk fusions are full local height."""
    table = parse_entry(hlo)
    base_rows = gl.Hy
    assert gle.Hy != base_rows, (
        "base and extended halos coincide; row-count classification is ambiguous")
    uvc_perms = [n for n, (shape, op, _) in table.items()
                 if op == "collective-permute" and rows_of(shape) == base_rows]
    assert uvc_perms, "u/v/c exchange ppermutes not found"
    downstream = dependents(table, uvc_perms)

    # full-height fusions = candidate bulk tendency work; boundary-strip fusions
    # have 3*Hy rows and may legitimately depend on the exchange
    ny_rows = gl.Ny + 2 * gl.Hy
    full_fusions = [n for n, (shape, op, _) in table.items()
                    if op == "fusion" and rows_of(shape) == ny_rows]
    full_dep = [n for n in full_fusions if n in downstream]

    return {
        "overlap": overlap,
        "n_instructions": len(table),
        "uvc_ppermutes": sorted(uvc_perms),
        "n_downstream": len(downstream),
        "n_full_fusions": len(full_fusions),
        "n_full_fusions_dep_on_exchange": len(full_dep),
        "full_fusions_dep": sorted(full_dep),
    }


def analyze_layered(overlap):
    """Same dependency analysis for the LAYERED 1-D sharded step (the whole
    (3-4)*Nz-plane stack exchanged in one ppermute pair)."""
    from orthogonalsphericalshellgrids_tpu.models import (
        layered_initial_state, make_layered_model)
    from orthogonalsphericalshellgrids_tpu.parallel import (
        distribute_layered, sharded_layered_step_fn)

    g = osg.TripolarGrid.make((64, 64, 3), dtype=jnp.float64, z=(-1000.0, 0.0),
                              first_pole_longitude=45.0, north_poles_latitude=25.0)

    def bottom(lam, phi):
        land = (((np.abs(lam - 45.0) < 10) & (np.abs(25.0 - phi) < 10))
                | ((np.abs(lam - 225.0) < 10) & (np.abs(25.0 - phi) < 10))
                | (phi < -78))
        return np.where(land, 1.0, -1000.0)

    model = make_layered_model(g, free_surface=SplitExplicitFreeSurface(substeps=8),
                               bottom_height=bottom, buoyancy=True)
    state = layered_initial_state(
        model, u=lambda lam, phi, z: 1 / np.cosh(np.deg2rad(phi) * 8) ** 2,
        b=lambda lam, phi, z: 1e-5 * z)
    mesh = make_mesh(8)
    dm, ds = distribute_layered(model, state, mesh)
    fn = sharded_layered_step_fn(mesh, dm, overlap=overlap)
    hlo = fn.lower(ds, 60.0).compile().as_text()
    return _analyze_hlo(hlo, dm.grid, dm.baro.grid_ext, overlap)


def main():
    for label, fn in [("single-layer", analyze), ("layered", analyze_layered)]:
        rows = [fn(False), fn(True)]
        print(f"\n### {label}")
        print("| variant | ENTRY instrs | instrs downstream of u/v/c exchange | "
              "full-height fusions | ...of which depend on exchange |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(f"| overlap={r['overlap']} | {r['n_instructions']} | "
                  f"{r['n_downstream']} | {r['n_full_fusions']} | "
                  f"{r['n_full_fusions_dep_on_exchange']} |")
        for r in rows:
            print(f"overlap={r['overlap']}: exchange ops {r['uvc_ppermutes']}; "
                  f"full-height fusions depending on them: {r['full_fusions_dep']}")


if __name__ == "__main__":
    main()
