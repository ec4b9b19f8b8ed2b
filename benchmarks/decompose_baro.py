"""Decompose the barotropic path: XLA glue (stack/pad/crop) vs the Pallas kernel
itself (DMA + compute) vs pure in-VMEM substep math.

The production wrapper re-stacks and re-pads the five dynamic planes every call and
crops the three outputs; if the kernel is DMA/glue-bound rather than compute-bound,
those copies are the lever, not the arithmetic.

Run on the real TPU:  python benchmarks/decompose_baro.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from examples.bickley_jet import build
from benchmarks.roofline import baro_substep_sol
from orthogonalsphericalshellgrids_tpu.models.hydrostatic import embed_ext
from orthogonalsphericalshellgrids_tpu.ops import pallas_baro
from orthogonalsphericalshellgrids_tpu.utils.profiling import device_sync  # fetch-sync: block_until_ready may not wait on this backend

N_SCAN = 20


def scan_time(body, init, n_outer=3, warmup=2):
    # differential timing (utils/profiling.scan_time_diff): cancels the tunnel's
    # variable constant sync tax — see device_sync
    from orthogonalsphericalshellgrids_tpu.utils.profiling import scan_time_diff

    return scan_time_diff(body, init, lengths=(N_SCAN, 3 * N_SCAN),
                          n_outer=n_outer, warmup=warmup)


def main():
    model, state = build(nx=1440, ny=680, substeps=30)
    g, ge = model.grid, model.grid_ext
    dt = 60.0
    dtau = model.fractional_dt * dt
    GU0 = embed_ext(g, ge, model.ib.h_u * state.u)
    GV0 = embed_ext(g, ge, model.ib.h_v * state.v)
    Ye, Xe = state.eta.shape
    n_sub = int(model.weights.shape[0])
    B, W, n_prog, Ye_pad = pallas_baro._geometry(Ye, n_sub, pallas_baro.DEFAULT_BLOCK_ROWS)
    Xe_pad = -128 * (-Xe // 128)

    # 1) full wrapper (stack + pad + kernel + crop), state chained through the scan
    def full(c):
        return pallas_baro.barotropic_substeps_pallas(
            model.baro_pack, c[0], c[1], c[2], GU0, GV0, dtau, model.weights,
            ge.Nx, ge.Hx, wrap_x_each_substep=False)

    t_full = scan_time(full, (state.eta, state.U, state.V))
    print(f"full wrapper        : {t_full*1e6:8.1f} us", flush=True)

    # 2) kernel only: pre-stacked, pre-padded dpack, uncropped padded outputs;
    #    chaining writes the padded outputs straight back into the carry
    dpack0 = jnp.pad(jnp.stack([state.eta, state.U, state.V, GU0, GV0]),
                     ((0, 0), (0, Ye_pad - Ye), (0, Xe_pad - Xe)))

    def kern_raw(dp):
        eta_a, U_a, V_a = pallas_baro.barotropic_substeps_pallas(
            model.baro_pack, dp[0, :Ye, :Xe], dp[1, :Ye, :Xe], dp[2, :Ye, :Xe],
            None, None, dtau, model.weights, ge.Nx, ge.Hx,
            dpack=dp, wrap_x_each_substep=False, crop=False)
        return dp.at[0].set(eta_a)

    t_kern = scan_time(kern_raw, dpack0)
    print(f"geometry: B={B} W={W} progs={n_prog} rows={n_prog*W} n_sub={n_sub}")
    print(f"kernel (minimal glue): {t_kern*1e6:8.1f} us", flush=True)
    hbm = (10 * n_prog * W + 2 * 3 * B * n_prog) * Xe_pad * 4
    print(f"kernel HBM traffic  : {hbm/2**20:.1f} MB "
          f"-> implied DMA BW {hbm/t_kern/1e9:.0f} GB/s if DMA-bound", flush=True)

    # 3) pure in-VMEM substep math at the production substep count
    sol = baro_substep_sol(n_iter=n_sub * 8)  # long enough to amortize dispatch
    proc = n_prog * W * Xe_pad * n_sub
    t_sol_equiv = proc / sol
    print(f"in-VMEM math equiv  : {t_sol_equiv*1e6:8.1f} us "
          f"(SoL {sol/1e9:.0f} G pt-sub/s)", flush=True)

    # 4) block-size sweep with a raised VMEM budget
    ref = None
    for Bs in (152, 184, 216, 248, 312):
        Bc, Ws, n_p, _ = pallas_baro._geometry(Ye, n_sub, Bs)
        vm = (10 * Ws + 3 * Bc) * Xe_pad * 4

        def baro(c, Bs=Bs):
            return pallas_baro.barotropic_substeps_pallas(
                model.baro_pack, c[0], c[1], c[2], GU0, GV0, dtau, model.weights,
                ge.Nx, ge.Hx, block_rows=Bs, wrap_x_each_substep=False,
                vmem_limit_mb=128 if Bs > 152 else None)

        try:
            t = scan_time(baro, (state.eta, state.U, state.V), n_outer=3, warmup=1)
            out = jax.jit(baro)((state.eta, state.U, state.V))
            if ref is None:
                ref, ok = out, "ref"
            else:
                ok = "ok" if all(
                    bool(jnp.allclose(a, b, atol=1e-6)) for a, b in zip(out, ref)
                ) else "MISMATCH"
            print(f"B={Bs:4d} W={Ws:4d} progs={n_p} rows={n_p*Ws:5d} "
                  f"vmem~{vm/2**20:5.1f}MB  {t*1e6:7.1f} us  {ok}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:90]
            print(f"B={Bs:4d} W={Ws:4d} vmem~{vm/2**20:5.1f}MB  FAIL: {msg}", flush=True)


if __name__ == "__main__":
    main()
