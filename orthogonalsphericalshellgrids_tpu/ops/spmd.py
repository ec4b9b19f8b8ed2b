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
