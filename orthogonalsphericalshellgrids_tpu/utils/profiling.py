"""Profiling/tracing helpers (SURVEY.md §5: the reference has none beyond wall-clock;
here: jax.profiler traces + per-step timing)."""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "time_steps", "device_sync"]


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
    behaviors; its ~1–3 ms cost is amortized by sizing timed windows ≥30 ms.
    Returns ``tree`` unchanged.
    """
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype") and getattr(x, "size", 0) > 0]
    if leaves:
        float(jnp.ravel(leaves[0])[0])
    jax.block_until_ready(tree)
    return tree


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
