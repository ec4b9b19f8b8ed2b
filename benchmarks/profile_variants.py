"""Variant timing after optimizations: barotropic block sweep + new fused-upwind WENO."""
import sys, time
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
print("device:", jax.devices()[0].device_kind, flush=True)

from examples.bickley_jet import build
from orthogonalsphericalshellgrids_tpu.models.hydrostatic import (
    _fill_batch, embed_ext, tendencies, step)
from orthogonalsphericalshellgrids_tpu.ops.pallas_baro import (
    barotropic_substeps_pallas, pad_pack)
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
    print(f"{name:42s} {el*1e6:9.1f} us/iter", flush=True)
    return el

ext0 = (state.eta, state.U, state.V, embed_ext(g, ge, state.Gu), embed_ext(g, ge, state.Gv))
SEfix = jax.jit(lambda: _fill_batch(ge, jnp.stack(list(ext0)), [CC, FC, CF, FC, CF], [1, -1, -1, -1, -1], None))()
dtau = model.fractional_dt * dt
Ye, Xe = ge.Ny + 2 * ge.Hy, ge.Nx + 2 * ge.Hx
raw = model.baro_pack[:, :, :]  # padded (5, Ye_pad, Xe_pad); unpad rows to Ye for repad
unpadded = raw[:, :Ye, :Xe]

for br in (96, 112, 128, 144, 160):
    pk = pad_pack(unpadded, br)
    def baro(c, _pk=pk, _br=br):
        dpack = jnp.stack([c[0], c[1], c[2], SEfix[3], SEfix[4]])
        return barotropic_substeps_pallas(
            _pk, c[0], c[1], c[2], SEfix[3], SEfix[4], dtau, model.weights,
            ge.Nx, ge.Hx, block_rows=_br, dpack=dpack)
    try:
        scan_time(f"baro pallas block_rows={br}", baro, (SEfix[0], SEfix[1], SEfix[2]))
    except Exception as e:
        print(f"block_rows={br} FAILED: {type(e).__name__}: {str(e)[:100]}", flush=True)

SB = jax.jit(lambda: _fill_batch(g, jnp.stack([state.u, state.v, state.c]),
                                 [FC, CF, CC], [-1, -1, 1], None))()
def tx(c):
    return tendencies(model, c[0], c[1], c[2])
scan_time("tendencies XLA (fused upwind)", tx, (SB[0], SB[1], SB[2]))

def full(s):
    return step(model, s, dt)
scan_time("full step", full, state)
