"""Fused Pallas tendency kernel (input-select upwind) vs XLA, block sweep; plus
barotropic block fine-tune and full step with tend_pallas on/off."""
import sys, time
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from examples.bickley_jet import build
from orthogonalsphericalshellgrids_tpu.models.hydrostatic import (
    _fill_batch, embed_ext, tendencies, step)
from orthogonalsphericalshellgrids_tpu.ops.pallas_baro import (
    barotropic_substeps_pallas, pad_pack)
from orthogonalsphericalshellgrids_tpu.ops.pallas_tend import tendencies_pallas
from orthogonalsphericalshellgrids_tpu.ops.location import CC, CF, FC

model, state = build(nx=1440, ny=680, substeps=30)
g, ge = model.grid, model.grid_ext
dt = 60.0
N = 20

def scan_time(name, body, init, n_outer=10, warmup=2):
    @jax.jit
    def run(x):
        def f(c, _):
            return body(c), None
        out, _ = jax.lax.scan(f, x, None, length=N)
        return out
    for _ in range(warmup):
        out = run(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = run(init)
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / (n_outer * N)
    print(f"{name:42s} {el*1e6:9.1f} us/iter", flush=True)
    return el

SB = jax.jit(lambda: _fill_batch(g, jnp.stack([state.u, state.v, state.c]),
                                 [FC, CF, CC], [-1, -1, 1], None))()
w1 = jnp.asarray(1.6, model.dtype); w2 = jnp.asarray(0.6, model.dtype)

for br in (32, 48, 64, 96):
    def tp(cs, _br=br):
        dpack_t = jnp.concatenate([jnp.stack([cs[0], cs[1], cs[2]]),
                                   jnp.stack([state.Gu, state.Gv, state.Gc])], axis=0)
        out = tendencies_pallas(model.tend_pack, dpack_t, w1, w2,
                                jnp.asarray(dt, model.dtype),
                                coriolis=model.coriolis, upwind_q=True,
                                tracer_weno=True, block_rows=_br)
        return (out[0], out[1], out[2])
    try:
        scan_time(f"tend pallas block={br}", tp, (SB[0], SB[1], SB[2]))
    except Exception as e:
        print(f"tend block={br} FAILED: {type(e).__name__}: {str(e)[:100]}", flush=True)

def tx(cs):
    return tendencies(model, cs[0], cs[1], cs[2])
scan_time("tendencies XLA", tx, (SB[0], SB[1], SB[2]))

# baro fine-tune around 128
ext0 = (state.eta, state.U, state.V, embed_ext(g, ge, state.Gu), embed_ext(g, ge, state.Gv))
SEfix = jax.jit(lambda: _fill_batch(ge, jnp.stack(list(ext0)), [CC, FC, CF, FC, CF], [1, -1, -1, -1, -1], None))()
dtau = model.fractional_dt * dt
Ye, Xe = ge.Ny + 2 * ge.Hy, ge.Nx + 2 * ge.Hx
unpadded = model.baro_pack[:, :Ye, :Xe]
for br in (120, 128, 136, 152):
    pk = pad_pack(unpadded, br)
    def baro(c, _pk=pk, _br=br):
        dpack = jnp.stack([c[0], c[1], c[2], SEfix[3], SEfix[4]])
        return barotropic_substeps_pallas(
            _pk, c[0], c[1], c[2], SEfix[3], SEfix[4], dtau, model.weights,
            ge.Nx, ge.Hx, block_rows=_br, dpack=dpack)
    try:
        scan_time(f"baro pallas block={br}", baro, (SEfix[0], SEfix[1], SEfix[2]))
    except Exception as e:
        print(f"baro block={br} FAILED: {type(e).__name__}: {str(e)[:100]}", flush=True)

scan_time("full step (tend XLA)", lambda s: step(model, s, dt), state)
scan_time("full step (tend pallas)", lambda s: step(model, s, dt, tend_pallas=True), state)
