"""Profiling/tracing helpers (SURVEY.md §5: the reference has none beyond wall-clock;
here: jax.profiler traces + per-step timing)."""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "time_steps", "device_sync", "stream_probe_gbps",
           "scan_time_diff"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/osg_trace"):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_sync(tree):
    """Synchronize with the device by FETCHING one scalar from the pytree.

    On the remote-tunnel (axon) backend `jax.block_until_ready` has been observed to
    return without waiting for execution (2026-08-20: a 2.5 s-of-real-work dispatch
    "completed" in 60 µs, 30 chained dispatches in 11 ms wall while the device took
    77 s; the same code blocked correctly earlier the same day). A scalar fetch
    round-trips through the data path and is a reliable barrier under both
    behaviors. Its cost is VARIABLE day to day (measured ~1-3 ms on 2026-08-19,
    55-64 ms on 2026-08-20): timing loops must either size windows far above the
    worst-case cost or — better — time DIFFERENTIALLY between two window sizes so
    the constant tax cancels (see bench.py / stream_probe_gbps).
    Returns ``tree`` unchanged.
    """
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype") and getattr(x, "size", 0) > 0]
    if leaves:
        float(jnp.ravel(leaves[0])[0])
    jax.block_until_ready(tree)
    return tree


def stream_probe_gbps(n=64 * 2**20, lengths=(4, 44), repeats=3, _cache={}):
    """HBM stream micro-ceiling: saxpy over ``n`` f32 elements (2 x 4 B/element),
    measured DIFFERENTIALLY — rate = extra bytes / (t_long - t_short) between two
    scan lengths — so the constant per-window sync/dispatch tax of the remote
    tunnel cancels. The tax is large and VARIABLE (measured 1-3 ms on 2026-08-19
    vs 55-64 ms on 2026-08-20 for the same scalar fetch), so a single absolute
    window under-reads the rate by 2-5x on a slow-tunnel day; the differential
    probe measured 540-645 GB/s on the SAME day absolute windows said 45 GB/s.

    Run this ADJACENT to a benchmark timing window to make tunnel/chip throttling
    identifiable after the fact (round-3 verdict: without it, a regressed
    headline and a throttled tunnel are indistinguishable). Returns GB/s; the
    v5e spec rate is 819 GB/s — a reading ABOVE spec means the differential
    window was too jittery (treat as 'not throttled', not as a rate), a reading
    far below (<200) marks a throttled window. The default lengths put ~20 GB
    through the long window so ±3 ms of tunnel jitter stays within ~10%. The
    jitted probes are cached per (n, length)."""
    import time

    import jax.numpy as jnp

    def runner(length):
        key = (n, length)
        if key not in _cache:
            @jax.jit
            def run(x):
                def f(c, _):
                    return c * 1.000001 + 0.5, None

                out, _ = jax.lax.scan(f, x, None, length=length)
                return out

            _cache[key] = run
        return _cache[key]

    short, long_ = (runner(k) for k in lengths)
    out = jnp.arange(n, dtype=jnp.float32)
    out = device_sync(long_(short(out)))  # warmup (compile on first use)
    best_s = best_l = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = short(out)
        device_sync(out)
        best_s = min(best_s, time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = long_(out)
        device_sync(out)
        best_l = min(best_l, time.perf_counter() - t0)
    dt = max(best_l - best_s, 1e-9)
    return 2 * 4 * n * (lengths[1] - lengths[0]) / dt / 1e9


def scan_time_diff(body, init, lengths=(8, 28), n_outer=3, warmup=2):
    """Per-iteration wall time of ``body`` inside ``lax.scan``, measured
    DIFFERENTIALLY between two scan lengths: (min t_long − min t_short) /
    (n_long − n_short), mins over ``n_outer`` rounds.

    The differential cancels the remote tunnel's constant per-window
    sync/dispatch tax, which is large and varies day to day (1-3 ms vs 55-64 ms
    measured — see ``device_sync``); an absolute window silently absorbs it and
    over-reads component times by up to ~2x at typical window sizes. ``body``
    must be carry-shape-preserving (the usual scan-benchmark pattern)."""
    import time

    runs = []
    for L in lengths:
        def make(L):
            @jax.jit
            def run(x):
                def f(c, _):
                    return body(c), None

                out, _ = jax.lax.scan(f, x, None, length=L)
                return out

            return run

        runs.append(make(L))

    out = init
    for _ in range(warmup):
        out = runs[1](runs[0](out))
    device_sync(out)
    best = [float("inf"), float("inf")]
    for _ in range(n_outer):
        for i, run in enumerate(runs):
            t0 = time.perf_counter()
            out = run(out)
            device_sync(out)
            best[i] = min(best[i], time.perf_counter() - t0)
    return (best[1] - best[0]) / (lengths[1] - lengths[0])


def time_steps(step_fn, model, state, dt, n=50, warmup=3):
    """Steady-state per-step wall time in ms (construction/compile excluded)."""
    s = state
    for _ in range(warmup):
        s = step_fn(model, s, dt)
    device_sync(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = step_fn(model, s, dt)
    device_sync(s)
    return (time.perf_counter() - t0) / n * 1e3, s
