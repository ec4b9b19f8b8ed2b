"""Fill-path and unroll experiments on the TPU."""
import sys, time
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from examples.bickley_jet import build
from orthogonalsphericalshellgrids_tpu.models.hydrostatic import (
    _fill, _fill_batch, step)
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

# batch fill vs per-field fill of the 3 baroclinic fields
def fill3_batch(c):
    S = _fill_batch(g, jnp.stack([c[0], c[1], c[2]]), [FC, CF, CC], [-1, -1, 1], None)
    return (S[0], S[1], S[2])
scan_time("fill3 batch", fill3_batch, (state.u, state.v, state.c))

def fill3_per(c):
    return (_fill(g, c[0], FC, -1), _fill(g, c[1], CF, -1), _fill(g, c[2], CC, 1))
scan_time("fill3 per-field", fill3_per, (state.u, state.v, state.c))

def stack_only(c):
    S = jnp.stack([c[0], c[1], c[2]])
    return (S[0] * 1.0, S[1] * 1.0, S[2] * 1.0)
scan_time("stack+unstack only", stack_only, (state.u, state.v, state.c))

# full step: batch vs per-field fills
scan_time("full step fill=batch", lambda s: step(model, s, dt), state)
scan_time("full step fill=per", lambda s: step(model, s, dt, fill_mode="per"), state)
