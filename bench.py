"""Headline benchmark: Bickley jet on the 1/4-degree (1440x680) tripolar grid,
single chip — BASELINE.md's primary metric (grid-points/s/chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline: the reference publishes NO numbers (BASELINE.md: "published: none") and
Julia is not in this image, so the reference stack itself cannot be timed here. The
denominator is MEASURED instead of guessed: the same Bickley-jet physics (WENO
vector-invariant + 30-substep split-explicit free surface) run through this repo's
XLA:CPU backend on this host — the reference's own execution vehicle (its CI and
examples are CPU; `test/dependencies_for_runtests.jl:12`). Measured by
benchmarks/cpu_reference_proxy.py: 5.38e6 grid-points/s at the SAME 1440x680 grid on
the 2-vCPU host (best of 3, 2026-08-19). vs_baseline is therefore "one TPU chip vs
one CPU host on the identical workload", not a published-number comparison.

Timing protocol: steady-state steps only (construction excluded — the remote TPU
tunnel stalls intermittently; see .claude/skills/verify/SKILL.md), with warmup,
DIFFERENTIAL between two window sizes so the tunnel's variable constant
sync/dispatch tax cancels (see the comment at the timing loop), with an HBM
stream micro-probe per round so throttled rounds are identifiable in the
recorded JSON.
"""

from __future__ import annotations

import json
import sys
import time

# Measured CPU-host throughput of the IDENTICAL 1440x680 workload (see module
# docstring); re-measure with `python benchmarks/cpu_reference_proxy.py`. Best of 3
# full-size runs on the 2-vCPU host (the 360x180 size measures ~1.4x faster per
# point — partly cache-resident — and would flatter the ratio).
MEASURED_CPU_HOST_POINTS_PER_S = 5.38e6


def main(nx=1440, ny=680, substeps=30, warmup=3, steps=30):
    import jax

    sys.path.insert(0, ".")
    from examples.bickley_jet import build
    from orthogonalsphericalshellgrids_tpu.models import step

    from orthogonalsphericalshellgrids_tpu.models.hydrostatic import multi_step
    from functools import partial

    model, state = build(nx=nx, ny=ny, substeps=substeps)
    block = 10  # steps per jitted call (the TimeStepWizard cadence)
    sj = jax.jit(partial(multi_step, n_steps=block), donate_argnums=(1,))

    from orthogonalsphericalshellgrids_tpu.utils.profiling import device_sync

    dt = 60.0
    s = state
    for _ in range(warmup):
        s = sj(model, s, dt)
    device_sync(s)

    # DIFFERENTIAL best-of-3 timing: per-step time = (t_long - t_short) / extra
    # steps between a short (steps//3 block-calls) and a long (steps block-calls)
    # window, mins taken separately. Window boundaries sync by SCALAR FETCH
    # (device_sync): block_until_ready has been observed not to wait on this
    # backend. The fetch itself costs a VARIABLE, sometimes large constant
    # (measured 1-3 ms on 2026-08-19, 55-64 ms on 2026-08-20) — an absolute
    # window silently absorbs it into the metric (~18% at the 1/4-degree window
    # size on the slow day), the differential cancels it. Blocks stay pipelined
    # within a window; taking each min over 3 rounds rejects the tunnel's
    # intermittent multi-hundred-ms hiccups (positive-only noise).
    # Each round also runs an HBM stream micro-probe (differential too): a probe
    # far below the chip's ~600 GB/s measured stream rate marks the round as
    # tunnel/chip-throttled, so a low headline is distinguishable from a real
    # regression after the fact (round-3 verdict item).
    from orthogonalsphericalshellgrids_tpu.utils.profiling import stream_probe_gbps

    short = max(steps // 3, 1)

    def window(k, s):
        t0 = time.perf_counter()
        for _ in range(k):
            s = sj(model, s, dt)
        device_sync(s)
        return time.perf_counter() - t0, s

    t_short, t_long, probes = [], [], []
    for i in range(3):
        a, s = window(short, s)
        b, s = window(steps, s)
        t_short.append(a)
        t_long.append(b)
        p = stream_probe_gbps()
        probes.append(round(p, 1))
        print(f"round {i}: short {a * 1e3:.1f} ms, long {b * 1e3:.1f} ms, "
              f"stream probe {p:.0f} GB/s", file=sys.stderr, flush=True)
    elapsed = min(t_long) - min(t_short)
    n_steps = (steps - short) * block
    # Under extreme tunnel jitter the differential can come out ~zero or negative
    # (mins taken from different rounds); clamp and flag instead of printing an
    # inf/negative headline (advisor finding, round 4).
    if elapsed <= 1e-3:
        print(f"bench: INVALID differential window (elapsed {elapsed * 1e3:.2f} ms "
              f"<= 1 ms); tunnel jitter swamped the measurement — rerun",
              file=sys.stderr, flush=True)
        elapsed = max(elapsed, 1e-3)
    sync_ms = (min(t_short) - short / (steps - short) * elapsed) * 1e3

    import jax.numpy as jnp

    assert bool(jnp.all(jnp.isfinite(s.u))), "benchmark produced non-finite fields"

    points_per_s = nx * ny * n_steps / elapsed
    headline = {
        "metric": "grid-points/s/chip (Bickley jet, 1/4deg tripolar, WENO-5 + split-explicit substeps=30)",
        "value": round(points_per_s, 1),
        "unit": "grid-points/s/chip",
        "vs_baseline": round(points_per_s / MEASURED_CPU_HOST_POINTS_PER_S, 3),
        "stream_probe_gbps": probes,
        "window_sync_overhead_ms": round(sync_ms, 1),
    }

    # Layered-engine metric (BASELINE config #5's shape: 1/4 deg x 10 layers T/S
    # gyre) so the driver records BOTH engines every round. Goes to stderr as its
    # own JSON line — stdout carries exactly ONE JSON line (the driver contract).
    try:
        import bench_layered

        layered = bench_layered.run()
        print(json.dumps(layered), file=sys.stderr, flush=True)
    except Exception as e:
        print(f"layered-bench: FAILED: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)

    print(json.dumps(headline), flush=True)

    # Real-hardware shard_map smoke (non-fatal for the headline line above): all
    # shard_map/ppermute correctness tests run on virtual CPU devices, so without
    # this the TPU-compiled collective path (Mosaic kernel under shard_map +
    # ppermute/all_gather lowering) would never execute on the chip. A 1-device
    # mesh exercises exactly that compile path.
    try:
        import __graft_entry__ as ge

        ge.dryrun_multichip(1)  # Pallas kernel under shard_map on the real chip
        # real collective HLOs on the chip: a 1-device mesh still lowers
        # ppermute/all_gather (self-permute) through the TPU collective path
        import numpy as _np
        from jax.sharding import Mesh, PartitionSpec as P

        mesh = Mesh(_np.asarray(jax.devices()[:1]), ("y",))
        x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)

        def coll(a):
            b = jax.lax.ppermute(a, "y", [(0, 0)])
            g = jax.lax.all_gather(b, "y", axis=0, tiled=True)
            return g + jax.lax.psum(a, "y")

        out = jax.jit(jax.shard_map(coll, mesh=mesh, in_specs=P("y"),
                                    out_specs=P("y")))(x)
        assert bool(jnp.all(out == 2 * x)), "collective smoke mismatch"
        print("tpu-shardmap-smoke: ok", file=sys.stderr, flush=True)
    except Exception as e:  # loud, but never corrupts the JSON metric line
        print(f"tpu-shardmap-smoke: FAILED: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    kw = {}
    for arg in sys.argv[1:]:
        k, v = arg.lstrip("-").split("=")
        kw[k] = int(v)
    main(**kw)
