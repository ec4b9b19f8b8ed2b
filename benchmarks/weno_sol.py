"""Non-circular speed-of-light bound for the WENO-5 tendency path.

VERDICT r2 ("what's weak" #1): the roofline's WENO ceiling was measured by running
the same `_weno5_left` reconstruction XLA-fused — if that fusion is inefficient,
numerator and denominator are inefficient together and "73% of bound" is
unfalsifiable.  This script replaces it with two independent bounds:

1. **Analytic issue-slot count** (same accounting as the barotropic kernel,
   docs/performance.md): walk one upwind WENO-5 reconstruction op by op, count
   flops and VPU issue slots under explicit assumptions (mul+add fuses to 1 FMA
   slot; a divide costs ~7 slots on the VPU — the same constant used for the
   barotropic analytic count; abs/select/roll occupy 1 slot each, 0 flops).
   Speed-of-light = measured pure-FMA ceiling x flops/(2*slots).

2. **Pallas probe kernel**: the EXACT `_weno5_left` math (plus the 4 stencil
   rolls) run n_iter times on one VMEM-resident block, output chained back into
   the input so work cannot be elided and DMA amortizes away.  This is the
   achieved in-VMEM rate of the algorithm — an arbiter between the analytic
   bound and the XLA-fused rate: if Pallas ~= XLA-fused, the old "ceiling" was
   honest after all; if Pallas >> XLA-fused, the XLA path has real headroom.

Run on the real TPU: `python benchmarks/weno_sol.py`.
Results are committed to docs/performance.md (roofline section).

TIMING GOTCHA (this backend): `jax.block_until_ready` does NOT reliably
synchronize on the axon remote backend — identical dispatches return in ~60 us
regardless of work (a 10 GB-traffic scan "measured" 180 TB/s).  Forcing a scalar
FETCH (`float(out.ravel()[0])`) does synchronize — but the fetch itself costs a
VARIABLE constant (1-3 ms on 2026-08-19, 55-64 ms on 2026-08-20), so every probe
below times DIFFERENTIALLY between two iteration counts: rate = extra work /
(t_long - t_short), which cancels the tax (see utils/profiling.scan_time_diff).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from orthogonalsphericalshellgrids_tpu.ops.advection import _weno5_left


def sync(a):
    """Force completion: a scalar fetch is the only reliable sync on this backend
    (see module docstring); returns the array unchanged."""
    float(jnp.ravel(a)[0])
    return a


def diff_rate(make_run, x, lengths, work_per_unit, rounds=4):
    """Differential rate: ``make_run(L)`` builds a jitted fn doing L units of
    work; rate = work_per_unit*(L2-L1) / (min t(L2) - min t(L1)). The output is
    chained back into the input so work cannot be elided across calls, and the
    constant per-call sync/dispatch tax cancels in the subtraction."""
    r1, r2 = make_run(lengths[0]), make_run(lengths[1])
    out = sync(r2(r1(x)))
    best = [float("inf"), float("inf")]
    for _ in range(rounds):
        for i, r in enumerate((r1, r2)):
            t0 = time.perf_counter()
            out = sync(r(out))
            best[i] = min(best[i], time.perf_counter() - t0)
    return work_per_unit * (lengths[1] - lengths[0]) / (best[1] - best[0])

# ---------------------------------------------------------------------------------
# 1. Analytic flop / issue-slot accounting for ONE upwind WENO-5 reconstruction
# ---------------------------------------------------------------------------------
# Assumptions (stated so the count is checkable):
#   - every elementwise add/sub/mul = 1 flop, 1 slot; a fusable mul+add pair = 2
#     flops, 1 FMA slot (we fuse greedily wherever the expression allows it);
#   - divide = 1 flop, DIV_SLOTS issue slots (reciprocal + Newton chain; same
#     constant as the barotropic analytic count in benchmarks/roofline.py);
#   - abs = 1 slot, 0 flops; lane-roll (stencil shift) = 1 slot, 0 flops;
#   - multiplies by literal constants count like any multiply (the TPU VPU has no
#     free scalar operand); x**2 = 1 multiply.
DIV_SLOTS = 7

# (name, flops, slots) per point, derived from ops/advection.py::_weno5_left read
# top to bottom with greedy FMA pairing:
ANALYTIC = [
    # q0 = (2 m3 - 7 m2 + 11 m1) * (1/6): mul, fma, fma, mul
    ("q0", 6, 4),
    # q1 = (-m2 + 5 m1 + 2 p0) * (1/6): fma(5*m1 - m2), fma(2*p0 + t), mul
    ("q1", 5, 3),
    # q2 = (2 m1 + 5 p0 - p1) * (1/6): fma, fma(5*p0+t) ... - p1 folds into fma? no:
    # mul(2*m1), fma(5*p0 + t), sub(p1), mul(1/6) -> 4 slots
    ("q2", 5, 4),
    # b0 = 13/12*(m3-2m2+m1)^2 + 1/4*(m3-4m2+3m1)^2:
    #   t1 = fma(-2*m2 + m3) ; add(+m1)            -> 2 slots, 3 flops
    #   t2 = fma(-4*m2 + m3) ; fma(3*m1 + t)       -> 2 slots, 4 flops
    #   sq1 = mul ; sq2 = mul                      -> 2 slots, 2 flops
    #   b0 = mul(13/12*sq1) ; fma(1/4*sq2 + t)     -> 2 slots, 3 flops
    ("b0", 12, 8),
    # b1 = 13/12*(m2-2m1+p0)^2 + 1/4*(m2-p0)^2: t1 fma+add (2), d sub (1),
    #   2 squares (2), mul+fma (2)
    ("b1", 9, 7),
    ("b2", 12, 8),                       # same shape as b0
    ("tau = |b0 - b2|", 1, 2),           # sub + abs
    # a_k = w_k * (1 + (tau/(b_k+eps))^2), k=0,1,2:
    #   add(eps) 1; div DIV_SLOTS; square 1; fma(w_k*r2 + w_k) 1
    ("a0", 4, 3 + DIV_SLOTS),
    ("a1", 4, 3 + DIV_SLOTS),
    ("a2", 4, 3 + DIV_SLOTS),
    ("s = a0+a1+a2", 2, 2),
    ("num = a0 q0 + a1 q1 + a2 q2", 5, 3),   # mul, fma, fma
    ("num / s", 1, DIV_SLOTS),
    # stencil taps: 4 lane-rolls (m1..m3, p1; p0 is the array itself) + the upwind
    # input-select (vel>=0 ? biased-left-taps : biased-right-taps) costs 5 selects
    # on the 5 taps + 1 compare (weno5_upwind_faces_from_centers)
    ("4 stencil rolls", 0, 4),
    ("upwind input select (cmp + 5 sel)", 0, 6),
]


def analytic_table():
    rows = [(n, f, s) for (n, f, s) in ANALYTIC]
    F = sum(f for _, f, _ in rows)
    S = sum(s for _, _, s in rows)
    return rows, F, S


# ---------------------------------------------------------------------------------
# 2. Pallas probe: exact reconstruction math, VMEM-resident, DMA amortized
# ---------------------------------------------------------------------------------
def _weno_sol_kernel(x_ref, out_ref, buf, sem, *, n_iter, W, Xe, upwind):
    dma = pltpu.make_async_copy(x_ref, buf, sem)
    dma.start()
    dma.wait()

    def rollm(a, k):     # a[i-k]
        return pltpu.roll(a, k, 1)

    def rollp(a, k):     # a[i+k]
        return pltpu.roll(a, Xe - k, 1)

    def it(m, _):
        c = buf[...]
        m1, m2, m3, p1 = rollm(c, 1), rollm(c, 2), rollm(c, 3), rollp(c, 1)
        if upwind:
            # input-selected upwind taps, as weno5_upwind_faces_from_centers does;
            # alternate the "velocity" sign by iteration parity via the sign of the
            # running mean proxy (cheap, data-dependent, not hoistable)
            pos = c >= 0.0
            p2 = rollp(c, 2)
            a = jnp.where(pos, m3, p2)
            b = jnp.where(pos, m2, p1)
            d = jnp.where(pos, m1, c)
            e = jnp.where(pos, c, m1)
            f = jnp.where(pos, p1, m2)
            r = _weno5_left(a, b, d, e, f)
        else:
            r = _weno5_left(m3, m2, m1, c, p1)
        # keep the iterate bounded and sign-mixing so `pos` stays data-dependent
        buf[...] = r - 0.5 * jnp.sign(r) * jnp.abs(r) * 1e-3
        return 0

    jax.lax.fori_loop(0, n_iter, it, 0)
    out_ref[...] = buf[...]


def weno_probe(n_iter=2048, W=96, Xe=1536, upwind=True, dtype=jnp.float32):
    """Reconstruction-points/s of the pure WENO-5 math on a VMEM-resident block
    (differential between n_iter and 3*n_iter kernels — see diff_rate)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((W, Xe)), dtype)

    def make_run(L):
        kern = functools.partial(_weno_sol_kernel, n_iter=L, W=W, Xe=Xe,
                                 upwind=upwind)
        return jax.jit(lambda xi: pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((W, Xe), lambda p: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W, Xe), dtype),
            scratch_shapes=[pltpu.VMEM((W, Xe), dtype),
                            pltpu.SemaphoreType.DMA(())],
        )(xi))

    return diff_rate(make_run, x, (n_iter, 3 * n_iter), W * Xe)


# ---------------------------------------------------------------------------------
# 3. Same-window XLA-fused rate (the old circular "ceiling") + pure-FMA ceiling
# ---------------------------------------------------------------------------------
def xla_fused_rate(n_scan=80, W=1024, Xe=1536, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((W, Xe)), dtype)

    def body(c):
        m1 = jnp.roll(c, 1, 1)
        m2 = jnp.roll(c, 2, 1)
        m3 = jnp.roll(c, 3, 1)
        p1 = jnp.roll(c, -1, 1)
        r = _weno5_left(m3, m2, m1, c, p1)
        return r - 0.5 * jnp.sign(r) * jnp.abs(r) * 1e-3

    def make_run(L):
        @jax.jit
        def run(c):
            out, _ = jax.lax.scan(lambda s, _: (body(s), None), c, None, length=L)
            return out
        return run

    return diff_rate(make_run, x, (n_scan, 3 * n_scan), W * Xe)


def fma_ceiling(nf=8 * 1024 * 1024, n_scan=20):
    xf = jnp.full((nf,), 0.999, jnp.float32)

    def fma_body(c):
        accs = [c * (0.9 + 0.01 * k) + 0.1 * k for k in range(8)]
        for i in range(15):
            accs = [a * c + (0.01 * (i + k)) for k, a in enumerate(accs)]
        o = accs[0]
        for a in accs[1:]:
            o = o + a
        return o * 1e-3

    def make_run(L):
        @jax.jit
        def run(c):
            out, _ = jax.lax.scan(lambda s, _: (fma_body(s), None), c, None,
                                  length=L)
            return out
        return run

    flops_per_elem = 2 * (8 + 8 * 15) + 7 + 1
    return diff_rate(make_run, xf, (n_scan, 3 * n_scan), nf * flops_per_elem)


if __name__ == "__main__":
    rows, F, S = analytic_table()
    print("analytic per-point count (one upwind WENO-5 reconstruction):")
    for n, f, s in rows:
        print(f"  {n:38s} flops={f:3d} slots={s:3d}")
    print(f"  TOTAL flops={F} slots={S}  (flops/slot={F/S:.2f}; "
          f"op-mix SoL = {F/(2*S):.1%} of pure-FMA)")

    # All three measurements in the SAME window (the tunnel throttles in
    # multi-minute windows; ratios are window-invariant).
    fma = fma_ceiling()
    print(f"pure-FMA ceiling:        {fma/1e12:.3f} TFLOP/s "
          f"-> analytic recon bound = {fma/(2*S)/1e9:.2f} G pts/s")
    pal = weno_probe(upwind=True)
    print(f"Pallas VMEM probe:       {pal/1e9:.2f} G recon-pts/s "
          f"({pal/(fma/(2*S)):.0%} of analytic bound)")
    xla = xla_fused_rate()
    print(f"XLA-fused (old ceiling): {xla/1e9:.2f} G recon-pts/s "
          f"({xla/pal:.0%} of the Pallas probe)")
