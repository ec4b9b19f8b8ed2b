"""Empirical roofline for the 1/4-degree Bickley-jet step on the real TPU.

BASELINE.md asks for "stencil kernels at speed-of-light per chip"; this script makes
that claim checkable, against ACHIEVABLE ceilings measured on the same chip in the
same window (the axon tunnel throttles in multi-minute windows — identical code has
measured 840 us and 2030 us per step hours apart — so ceilings and components must be
measured together and the whole set repeated, best window kept).

Ceilings measured:
  - HBM stream bandwidth: saxpy over 256 MB (2 x 4 B per element)
  - VPU FMA rate: 8 independent 16-FMA Horner chains per element (ILP-exposed)
  - WENO rate: the actual _weno5_left reconstruction, XLA-fused over a large array
    (the op mix of the hot path: mul/add chains + 4 divisions + abs)
  - barotropic substep-math SoL: a Pallas kernel running the EXACT per-substep math
    (4 rolls + ~22 flops/pt) on a VMEM-resident block with zero window redundancy and
    amortized DMA — the true in-VMEM bound for this algorithm (pure FMA overstates it:
    lane/sublane rolls occupy VPU issue slots without counting as flops)

Components measured (scan-amortized):
  - full step, XLA tendencies, Pallas barotropic subcycle, batched halo fill

Flops: XLA cost analysis for the XLA paths; analytic count for the Pallas kernel
(custom calls report none): per substep and window point: div 7, eta 1, U/V 4+4,
accumulate 6*B/W, x-wrap ~0 => ~22 + 6*B/W flops; the window redundancy factor
W_total/Ye_pad multiplies the work.

Output: the table committed to docs/performance.md.
"""

import sys
import time
from functools import partial

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from examples.bickley_jet import build
from orthogonalsphericalshellgrids_tpu.models.hydrostatic import (
    _fill_batch, barotropic_substeps, embed_ext, multi_step, step, tendencies)
from orthogonalsphericalshellgrids_tpu.ops.advection import weno5_faces_from_centers
from orthogonalsphericalshellgrids_tpu.ops.location import CC, CF, FC
from orthogonalsphericalshellgrids_tpu.ops.pallas_baro import _geometry, DEFAULT_BLOCK_ROWS

N_SCAN = 20


def scan_time(body, init, n_outer=3, warmup=2):
    # differential timing (utils/profiling.scan_time_diff): cancels the tunnel's
    # variable constant sync tax — see device_sync
    from orthogonalsphericalshellgrids_tpu.utils.profiling import scan_time_diff

    return scan_time_diff(body, init, lengths=(N_SCAN, 3 * N_SCAN),
                          n_outer=n_outer, warmup=warmup)


def cost_of(fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _baro_sol_kernel(dtau_ref, spack_ref, dpack_ref, out_ref, sbuf, dbuf, acc,
                     sem_s, sem_d, *, n_iter, W, Xe):
    """The exact per-substep math of ops/pallas_baro._kernel (4 rolls + ~22 flops/pt)
    run ``n_iter`` times on ONE VMEM-resident block: no window redundancy (B == W),
    DMA amortized over all iterations. Measures the in-VMEM speed of light of the
    substep algorithm itself."""
    dma_s = pltpu.make_async_copy(spack_ref, sbuf, sem_s)
    dma_d = pltpu.make_async_copy(dpack_ref, dbuf, sem_d)
    dma_s.start()
    dma_d.start()
    dma_s.wait()
    dma_d.wait()

    DY_FC, DX_CF, C_AZ, C_U, C_V = range(5)
    ETA, U, V, GU, GV = range(5)
    dtau = dtau_ref[0]

    def rollm_y(a):
        return pltpu.roll(a, 1, 0)

    def rollm_x(a):
        return pltpu.roll(a, 1, 1)

    def rollp_y(a):
        return pltpu.roll(a, W - 1, 0)

    def rollp_x(a):
        return pltpu.roll(a, Xe - 1, 1)

    def substep(m, _):
        eta = dbuf[ETA]
        Uv = dbuf[U]
        Vv = dbuf[V]
        fx = sbuf[DY_FC] * Uv
        fy = sbuf[DX_CF] * Vv
        div = (rollp_x(fx) - fx + rollp_y(fy) - fy) * sbuf[C_AZ]
        dbuf[ETA] = eta - div
        eta = dbuf[ETA]
        dbuf[U] = Uv - sbuf[C_U] * (eta - rollm_x(eta)) + dbuf[GU]
        dbuf[V] = Vv - sbuf[C_V] * (eta - rollm_y(eta)) + dbuf[GV]
        acc[0] += dtau * dbuf[ETA]
        acc[1] += dtau * dbuf[U]
        acc[2] += dtau * dbuf[V]
        return 0

    acc[...] = jnp.zeros(acc.shape, acc.dtype)
    jax.lax.fori_loop(0, n_iter, substep, 0)
    out_ref[...] = acc[0]


def baro_substep_sol(n_iter=256, W=160, Xe=1536, dtype=jnp.float32):
    """Points x substeps / second of the pure substep math, in VMEM (the ceiling the
    real kernel should be judged against)."""
    # stable dynamics so values stay finite over n_iter iterations: tiny coupling
    rng = np.random.default_rng(0)
    spack = jnp.asarray(1e-6 * rng.standard_normal((5, W, Xe)), dtype)
    dpack = jnp.asarray(rng.standard_normal((5, W, Xe)), dtype)

    kern = functools.partial(_baro_sol_kernel, n_iter=n_iter, W=W, Xe=Xe)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec((W, Xe), lambda p, *_: (0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((5, W, Xe), dtype),
            pltpu.VMEM((5, W, Xe), dtype),
            pltpu.VMEM((3, W, Xe), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    run = jax.jit(lambda s, d: pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((W, Xe), dtype)],
    )(jnp.asarray([1e-7], dtype), s, d)[0])

    # Chain the output back into the input: repeated identical dispatches measure
    # only the dispatch floor on the remote-tunnel backend.
    from orthogonalsphericalshellgrids_tpu.utils.profiling import device_sync

    out = run(spack, dpack)
    device_sync(out)
    best = float("inf")
    for _ in range(5):
        dpack = dpack.at[0].set(out)
        t0 = time.perf_counter()
        out = run(spack, dpack)
        device_sync(out)  # scalar-fetch barrier; block_until_ready may not wait
        best = min(best, time.perf_counter() - t0)
    return W * Xe * n_iter / best  # point-substeps / s


def measure_all():
    model, state = build(nx=1440, ny=680, substeps=30)
    g, ge = model.grid, model.grid_ext
    dt = 60.0

    out = {}

    # --- ceilings -----------------------------------------------------------------
    n = 64 * 1024 * 1024
    xs = jnp.arange(n, dtype=jnp.float32)
    t = scan_time(lambda c: c * 1.000001 + 0.5, xs)
    out["bw_gbps"] = 2 * 4 * n / t / 1e9

    nf = 8 * 1024 * 1024
    xf = jnp.full((nf,), 0.999, jnp.float32)

    def fma_body(c):
        accs = [c * (0.9 + 0.01 * k) + 0.1 * k for k in range(8)]
        for i in range(15):
            accs = [a * c + (0.01 * (i + k)) for k, a in enumerate(accs)]
        o = accs[0]
        for a in accs[1:]:
            o = o + a
        return o * 1e-3

    t = scan_time(fma_body, xf)
    out["fma_tf"] = 2 * 8 * 16 * nf / t / 1e12

    # WENO ceiling: the real reconstruction op mix, fused by XLA over one array
    nw = 4 * 1024 * 1024
    xw = jnp.asarray(np.sin(np.arange(nw, dtype=np.float64) * 0.37), jnp.float32)

    def weno_body(c):
        l, r = weno5_faces_from_centers(c[None, :], axis=-1)
        return (l + r)[0] * 0.5

    t = scan_time(weno_body, xw)
    # 2 reconstructions x ~65 flops (XLA count) per element
    wflops = cost_of(weno_body, xw)
    out["weno_tf"] = wflops / t / 1e12
    out["weno_flops_per_pt"] = wflops / nw

    out["baro_sol"] = baro_substep_sol()  # point-substeps / s, in-VMEM, zero redundancy

    # --- components ---------------------------------------------------------------
    def fill3(c):
        S = _fill_batch(g, jnp.stack([c[0], c[1], c[2]]), [FC, CF, CC], [-1, -1, 1], None)
        return (S[0], S[1], S[2])

    def tend(c):
        return tendencies(model, c[0], c[1], c[2])

    GU0 = embed_ext(g, ge, model.ib.h_u * state.u)
    GV0 = embed_ext(g, ge, model.ib.h_v * state.v)

    def baro(c):
        return barotropic_substeps(model, c[0], c[1], c[2], GU0, GV0, dt,
                                   wrap_x_each_substep=False)

    out["t_step"] = scan_time(lambda s: step(model, s, dt), state)
    out["t_tend"] = scan_time(tend, (state.u, state.v, state.c))
    out["t_baro"] = scan_time(baro, (state.eta, state.U, state.V))
    out["t_fill"] = scan_time(fill3, (state.u, state.v, state.c))

    out["f_tend"] = cost_of(tend, (state.u, state.v, state.c))

    # analytic barotropic kernel work: window geometry x flops/pt/substep
    Ye, Xe = state.eta.shape
    n_sub = int(model.weights.shape[0])
    B, W, n_prog, Ye_pad = _geometry(Ye, n_sub, DEFAULT_BLOCK_ROWS)
    Xe_pad = -128 * (-Xe // 128)
    pts = n_prog * W * Xe_pad
    out["f_baro"] = (22.0 + 6.0 * B / W) * n_sub * pts
    out["baro_geom"] = (B, W, n_prog, Ye_pad, Xe_pad, n_sub)
    out["npts"] = g.Nx * g.Ny
    return out


def main():
    best = None
    for rep in range(3):
        r = measure_all()
        print(f"window {rep}: step {r['t_step']*1e6:.0f} us, "
              f"bw {r['bw_gbps']:.0f} GB/s, fma {r['fma_tf']:.2f} TF, "
              f"weno {r['weno_tf']:.2f} TF", flush=True)
        if best is None or r["t_step"] < best["t_step"]:
            best = r
    r = best
    print("\n# Best window")
    print(f"HBM stream bandwidth : {r['bw_gbps']:8.1f} GB/s")
    print(f"VPU FMA (ILP) rate   : {r['fma_tf']:8.2f} TFLOP/s")
    print(f"WENO op-mix rate     : {r['weno_tf']:8.2f} TFLOP/s "
          f"({r['weno_flops_per_pt']:.0f} XLA-flops/pt)")
    print(f"\nfull step            : {r['t_step']*1e6:8.1f} us "
          f"-> {r['npts']/r['t_step']/1e9:.3f} G pts/s/chip")
    ft, tt = r["f_tend"], r["t_tend"]
    print(f"tendencies (XLA)     : {tt*1e6:8.1f} us, {ft/1e9:.3f} GFLOP "
          f"-> {ft/tt/1e12:.2f} TF = {100*ft/tt/1e12/r['weno_tf']:.0f}% of WENO ceiling")
    fb, tb = r["f_baro"], r["t_baro"]
    baro_pct_fma = 100 * fb / tb / 1e12 / r["fma_tf"]
    print(f"barotropic (Pallas)  : {tb*1e6:8.1f} us, {fb/1e9:.3f} GFLOP analytic "
          f"-> {fb/tb/1e12:.2f} TF = {baro_pct_fma:.0f}% of FMA ceiling")
    # Issue-rate bound: the substep mix is ~22 flops in ~26 VPU slots per
    # point-substep (4 rolls occupy a slot each but count no flops), vs the FMA
    # ceiling's 2 flops/slot -> the kernel's op-mix SoL is 22/26/2 = 42% of the FMA
    # ceiling with no mul/add fusion (~50% with partial FMA fusion).
    print(f"baro issue-rate bound: 42-50% of FMA ceiling "
          f"-> kernel at {100*baro_pct_fma/50:.0f}-{100*baro_pct_fma/42:.0f}% "
          f"of its op-mix SoL")
    B, W, n_progs, Ye_pad, Xe_pad, n_sub = r["baro_geom"]
    proc = n_progs * W * Xe_pad * n_sub          # point-substeps actually processed
    useful = r["npts"] * n_sub                   # interior point-substeps
    sol = r["baro_sol"]
    print(f"baro substep-math SoL: {sol/1e9:8.2f} G point-substeps/s (in-VMEM; "
          f"only meaningful when >> dispatch floor)")
    print(f"baro processed rate  : {proc/tb/1e9:8.2f} G point-substeps/s "
          f"(window redundancy {proc/useful:.2f}x)")
    print(f"halo fill batch(3)   : {r['t_fill']*1e6:8.1f} us")
    print(f"baro geometry B/W/progs/Ye_pad/Xe_pad/n_sub: {r['baro_geom']}")


if __name__ == "__main__":
    main()
