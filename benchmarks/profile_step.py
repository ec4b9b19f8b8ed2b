"""Component-level timing of one Bickley-jet step on the real TPU (1/4-degree grid).
Each component is scanned N times inside ONE jit call so the axon tunnel's ~1.3 ms
per-dispatch latency amortizes away; reported time is per iteration."""
import sys, time
import jax, jax.numpy as jnp
from functools import partial

sys.path.insert(0, ".")
from examples.bickley_jet import build
from orthogonalsphericalshellgrids_tpu.models.hydrostatic import (
    multi_step, tendencies, barotropic_substeps, _fill_batch, embed_ext)
from orthogonalsphericalshellgrids_tpu.ops.location import CC, CF, FC
from orthogonalsphericalshellgrids_tpu.utils.profiling import device_sync  # fetch-sync: block_until_ready may not wait on this backend

model, state = build(nx=1440, ny=680, substeps=30)
g, ge = model.grid, model.grid_ext
dt = 60.0
N = 20


def scan_time(name, body, init, n_outer=3, warmup=2):
    # differential timing (utils/profiling.scan_time_diff): cancels the tunnel's
    # variable constant sync tax — see device_sync
    from orthogonalsphericalshellgrids_tpu.utils.profiling import scan_time_diff

    el = scan_time_diff(body, init, lengths=(N, 3 * N), n_outer=n_outer,
                        warmup=warmup)
    print(f"{name:38s} {el*1e6:9.1f} us/iter", flush=True)
    return el

# full step
t_all = scan_time("full step", lambda s: __import__("orthogonalsphericalshellgrids_tpu.models.hydrostatic", fromlist=["step"]).step(model, s, dt), state)

# halo fill of baroclinic prognostics (keep carry = the 3 fields)
def fill3(c):
    S = _fill_batch(g, jnp.stack([c[0], c[1], c[2]]), [FC, CF, CC], [-1, -1, 1], None)
    return (S[0], S[1], S[2])
t_fill = scan_time("fill_batch baroclinic (3)", fill3, (state.u, state.v, state.c))

# tendencies
def tend(c):
    Gu, Gv, Gc = tendencies(model, c[0], c[1], c[2])
    return (Gu, Gv, Gc)
t_tend = scan_time("tendencies (WENO)", tend, (state.u, state.v, state.c))

# extended fill (5 fields)
def fill5(c):
    S = _fill_batch(ge, jnp.stack(list(c)), [CC, FC, CF, FC, CF], [1, -1, -1, -1, -1], None)
    return tuple(S[i] for i in range(5))
ext0 = (state.eta, state.U, state.V, embed_ext(g, ge, state.Gu), embed_ext(g, ge, state.Gv))
t_fe = scan_time("fill_batch ext (5)", fill5, ext0)

# barotropic substeps pallas (carry = (eta,U,V); G fixed)
SEfix = jax.jit(lambda: _fill_batch(ge, jnp.stack(list(ext0)), [CC, FC, CF, FC, CF], [1, -1, -1, -1, -1], None))()
def baro(c):
    dpack = jnp.stack([c[0], c[1], c[2], SEfix[3], SEfix[4]])
    return barotropic_substeps(model, c[0], c[1], c[2], SEfix[3], SEfix[4], dt, dpack=dpack)
t_baro = scan_time("barotropic pallas (30 sub)", baro, (SEfix[0], SEfix[1], SEfix[2]))

# barotropic substeps XLA-scan variant
import dataclasses
model_x = dataclasses.replace(model, use_pallas=False)
def baro_x(c):
    return barotropic_substeps(model_x, c[0], c[1], c[2], SEfix[3], SEfix[4], dt)
t_barox = scan_time("barotropic XLA unrolled (30 sub)", baro_x, (SEfix[0], SEfix[1], SEfix[2]))

print(f"\nstep {t_all*1e6:.1f} us; sum(fill3+tend+fill5+baro) {(t_fill+t_tend+t_fe+t_baro)*1e6:.1f} us")
print(f"points/s full step: {1440*680/t_all/1e6:.0f}M")
