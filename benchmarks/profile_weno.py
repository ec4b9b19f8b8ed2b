"""Division-reduced WENO-Z weights vs current, on TPU; numerics cross-check on CPU."""
import sys, time
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from examples.bickley_jet import build
from orthogonalsphericalshellgrids_tpu.models.hydrostatic import _fill_batch, tendencies
from orthogonalsphericalshellgrids_tpu.ops import advection as adv
from orthogonalsphericalshellgrids_tpu.ops.location import CC, CF, FC
from orthogonalsphericalshellgrids_tpu.utils.profiling import device_sync  # fetch-sync: block_until_ready may not wait on this backend

_EPS = 1e-8

def _weno5_left_2div(m3, m2, m1, p0, p1):
    q0 = (2.0 * m3 - 7.0 * m2 + 11.0 * m1) / 6.0
    q1 = (-m2 + 5.0 * m1 + 2.0 * p0) / 6.0
    q2 = (2.0 * m1 + 5.0 * p0 - p1) / 6.0
    b0 = (13.0 / 12.0) * (m3 - 2.0 * m2 + m1) ** 2 + 0.25 * (m3 - 4.0 * m2 + 3.0 * m1) ** 2
    b1 = (13.0 / 12.0) * (m2 - 2.0 * m1 + p0) ** 2 + 0.25 * (m2 - p0) ** 2
    b2 = (13.0 / 12.0) * (m1 - 2.0 * p0 + p1) ** 2 + 0.25 * (3.0 * m1 - 4.0 * p0 + p1) ** 2
    tau = jnp.abs(b0 - b2)
    mx = jnp.maximum(b0, jnp.maximum(b1, b2)) + _EPS
    inv = 1.0 / mx
    B0 = (b0 + _EPS) * inv
    B1 = (b1 + _EPS) * inv
    B2 = (b2 + _EPS) * inv
    t2 = (tau * inv) ** 2
    B0s, B1s, B2s = B0 * B0, B1 * B1, B2 * B2
    a0 = 0.1 * (B0s + t2) * (B1s * B2s)
    a1 = 0.6 * (B1s + t2) * (B0s * B2s)
    a2 = 0.3 * (B2s + t2) * (B0s * B1s)
    return (a0 * q0 + a1 * q1 + a2 * q2) / (a0 + a1 + a2)

model, state = build(nx=1440, ny=680, substeps=30)
g = model.grid
N = 20

def scan_time(name, body, init, n_outer=3, warmup=2):
    # differential timing (utils/profiling.scan_time_diff): cancels the tunnel's
    # variable constant sync tax — see device_sync
    from orthogonalsphericalshellgrids_tpu.utils.profiling import scan_time_diff

    el = scan_time_diff(body, init, lengths=(N, 3 * N), n_outer=n_outer,
                        warmup=warmup)
    print(f"{name:42s} {el*1e6:9.1f} us/iter", flush=True)
    return el

SB = jax.jit(lambda: _fill_batch(g, jnp.stack([state.u, state.v, state.c]),
                                 [FC, CF, CC], [-1, -1, 1], None))()

def tx(cs):
    return tendencies(model, cs[0], cs[1], cs[2])
scan_time("tendencies (4-div weights)", tx, (SB[0], SB[1], SB[2]))

orig = adv._weno5_left
adv._weno5_left = _weno5_left_2div
scan_time("tendencies (2-div weights)", tx, (SB[0], SB[1], SB[2]))

# numerics: compare outputs
Gu1, Gv1, Gc1 = jax.jit(tx)((SB[0], SB[1], SB[2]))
adv._weno5_left = orig
Gu0, Gv0, Gc0 = jax.jit(tx)((SB[0], SB[1], SB[2]))
import numpy as np
for n, a, b in (("Gu", Gu0, Gu1), ("Gv", Gv0, Gv1), ("Gc", Gc0, Gc1)):
    a, b = np.asarray(a), np.asarray(b)
    s = np.abs(a).max() + 1e-30
    print(f"{n}: max rel diff {np.abs(a-b).max()/s:.2e}, any nan: {np.isnan(b).any()}")
