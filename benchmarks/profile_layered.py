"""Component-level timing of the LAYERED (Nz>1) step on the real TPU.

Workload: the wind_driven_ts_gyre configuration at benchmark scale — 1/4-degree
(1440x680) tripolar grid, Nz=10 stretched layers, T/S tracers + linear EOS, Coriolis,
wind stress + quadratic bottom drag, horizontal/vertical mixing, split-explicit
substeps=30 (BASELINE.md config #5's realistic shape).

Each component is scanned N times inside ONE jit so the axon tunnel's ~1.3 ms
per-dispatch latency amortizes away; reported time is per iteration.
"""
import sys, time
import jax, jax.numpy as jnp
from functools import partial

sys.path.insert(0, ".")
from examples.wind_driven_ts_gyre import build
from orthogonalsphericalshellgrids_tpu.models.layered import (
    layered_step, layered_tendencies, vertical_velocity, _fill_batch,
    _as_tracer4, _as_tracer_stack)
from orthogonalsphericalshellgrids_tpu.models.hydrostatic import (
    barotropic_substeps, embed_ext)
from orthogonalsphericalshellgrids_tpu.ops import zipper
from orthogonalsphericalshellgrids_tpu.ops.advection import tracer_faces
from orthogonalsphericalshellgrids_tpu.ops.location import CC, CF, FC

NX, NY, NZ = (int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 else (1440, 680, 10)
model, state = build(nx=NX, ny=NY, nz=NZ, substeps=30)
m = model.baro
g, ge = m.grid, m.grid_ext
dt = 40.0
N = 10


def scan_time(name, body, init, n_outer=3, warmup=2):
    # model passed as an argument (NOT closure-captured): captured arrays embed as
    # HLO constants and the remote-compile tunnel rejects >~100 MB request bodies.
    # Differential timing between two scan lengths (see
    # utils/profiling.scan_time_diff): cancels the tunnel's variable constant
    # sync tax (1-64 ms/window measured) that absolute windows absorb.
    import time

    from orthogonalsphericalshellgrids_tpu.utils.profiling import device_sync

    runs = []
    for L in (N, 3 * N):
        def make(L):
            @jax.jit
            def run(mdl, x):
                def f(c, _):
                    return body(mdl, c), None
                out, _ = jax.lax.scan(f, x, None, length=L)
                return out
            return run
        runs.append(make(L))

    out = init
    for _ in range(warmup):
        out = runs[1](model, runs[0](model, out))
    device_sync(out)
    best = [float("inf"), float("inf")]
    for _ in range(n_outer):
        for i, run in enumerate(runs):
            t0 = time.perf_counter()
            out = run(model, out)
            device_sync(out)  # scalar-fetch barrier; block_until_ready may not wait
            best[i] = min(best[i], time.perf_counter() - t0)
    el = (best[1] - best[0]) / (2 * N)
    print(f"{name:44s} {el*1e6:9.1f} us/iter", flush=True)
    return el


nz = model.nz
ncp = state.c.shape[0]

# ---- full step
t_all = scan_time("full layered step", lambda mdl, s: layered_step(mdl, s, dt), state)

# ---- halo fill variants for the (3-4)*Nz baroclinic planes
def fill_cat(mdl, c):
    u, v, cc = c
    planes = jnp.concatenate([u, v, cc], axis=0)
    locs = [FC] * nz + [CF] * nz + [CC] * ncp
    signs = [-1] * nz + [-1] * nz + [1] * ncp
    S = _fill_batch(g, planes, locs, signs, None)
    return (S[:nz], S[nz:2 * nz], S[2 * nz:])
t_fc = scan_time(f"fill: concat batch ({2*nz+ncp} planes)", fill_cat,
                 (state.u, state.v, state.c))

def fill_grp(mdl, c):
    u, v, cc = c
    kw = dict(Nx=g.Nx, Ny=g.Ny, Hx=g.Hx, Hy=g.Hy, south="zero_gradient", xp=jnp)
    return (zipper.fill_halos(u, FC, -1, **kw),
            zipper.fill_halos(v, CF, -1, **kw),
            zipper.fill_halos(cc, CC, 1, **kw))
t_fg = scan_time("fill: per-group broadcast (no concat)", fill_grp,
                 (state.u, state.v, state.c))

# ---- tendencies (and sub-pieces)
filled = jax.jit(fill_grp)(model, (state.u, state.v, state.c))
u0, v0, c0 = filled
b0 = state.b

def tend(mdl, c):
    Gu, Gv, Gc, Gb = layered_tendencies(mdl, c[0], c[1], c[2], b0)
    return (Gu, Gv, Gc)
t_t = scan_time("layered tendencies (all terms)", tend, (u0, v0, c0))

def tracer_only(mdl, c):
    cq = _as_tracer4(mdl, c[2])
    cx = tracer_faces(cq, c[0], axis=-1, scheme=mdl.baro.tracer_advection)
    cy = tracer_faces(cq, c[1], axis=-2, scheme=mdl.baro.tracer_advection)
    return (c[0], c[1], _as_tracer_stack(mdl, cx * cy))
t_tr = scan_time(f"  tracer WENO x+y ({ncp} planes)", tracer_only, (u0, v0, c0))

def wdiag(mdl, c):
    w = vertical_velocity(mdl, c[0], c[1])
    return (c[0] + w[:-1] * 0.0, c[1], c[2])
t_w = scan_time("  vertical velocity (continuity)", wdiag, (u0, v0, c0))

# ---- barotropic subcycle (same engine as single-layer)
eta_f = state.eta; U_f = state.U; V_f = state.V
GU = embed_ext(g, ge, jnp.sum(state.u * model.dzu, axis=0))
GV = embed_ext(g, ge, jnp.sum(state.v * model.dzv, axis=0))
def baro(mdl, c):
    e, U, V = c
    mb = mdl.baro
    return barotropic_substeps(mb, e, U, V, GU, GV, dt,
                               wrap_x_each_substep=ge.Hx < int(mb.weights.shape[0]) + 1)
t_b = scan_time("barotropic pallas (30 sub)", baro, (eta_f, U_f, V_f))

pts = NX * NY * NZ
print(f"\nstep {t_all*1e6:.1f} us -> {pts/t_all/1e9:.3f}G points/s/chip "
      f"(points = Nx*Ny*Nz = {pts/1e6:.1f}M)")
print(f"components: fill_cat {t_fc*1e6:.0f} | fill_grp {t_fg*1e6:.0f} | "
      f"tend {t_t*1e6:.0f} (tracer {t_tr*1e6:.0f}, w {t_w*1e6:.0f}) | baro {t_b*1e6:.0f}")
