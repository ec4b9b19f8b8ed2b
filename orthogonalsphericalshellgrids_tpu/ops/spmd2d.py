"""2-D (x, y) domain decomposition: SPMD halo exchange with a fold-aware mirror gather.

The reference explicitly supports ONLY 1-D y-partitioning — x-partitioning is rejected
because the zipper fold couples column i with column Nx-i+1, pairing mirror ranks
across an x-decomposition (``src/distributed_tripolar_grid.jl:30-31``; SURVEY.md §2.3
flags this as the build's extension target, BASELINE config #4). Here the fold across
the x-partition is solved with a strip gather: the fold only ever reads the top
``Hy+1`` interior rows, so the top y-shards ``all_gather`` that thin strip along the x
axis (tiny message: (K, Hy+1, Nx)), apply the *global* fold logic verbatim
(ops/zipper.fold_north_batch), and keep their own column block.

Exchange order (2-phase with corner correctness):
1. y-exchange (ppermute over the y axis) + physical south fill on y-rank 0,
2. zipper fold on the top y-rank (x-gathered strip),
3. x-exchange (ppermute ring over the x axis — x is globally periodic) over ALL rows,
   which also fills the x-halos of the freshly written fold rows and the corners.

Everything is shape-static and uniform across shards (collectives run unconditionally;
rank-dependent behavior is `where`-selected), as shard_map requires.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import zipper

__all__ = ["Spmd2D", "fill_halos_spmd2d_batch"]


@dataclasses.dataclass(frozen=True)
class Spmd2D:
    """Static 2-D SPMD configuration. ``nx_global`` is the GLOBAL x size (the local
    model metadata carries local sizes; the fold needs the global one)."""

    axis_x: str = "x"
    axis_y: str = "y"
    n_x: int = 1
    n_y: int = 1
    nx_global: int = 0


def fill_halos_spmd2d_batch(S, locs, signs, nx_local, ny_local, Hx, Hy,
                            spmd: Spmd2D, south="zero_gradient"):
    """Batched halo fill of a (K, ny+2Hy, nx+2Hx) local stack on an (x, y) mesh."""
    nx_g = spmd.nx_global
    iy = jax.lax.axis_index(spmd.axis_y)
    ix = jax.lax.axis_index(spmd.axis_x)

    # ---- phase 1: y exchange + south ----
    top = S[:, ny_local : ny_local + Hy, :]
    bot = S[:, Hy : 2 * Hy, :]
    from_south = jax.lax.ppermute(
        top, spmd.axis_y, [(i, i + 1) for i in range(spmd.n_y - 1)])
    from_north = jax.lax.ppermute(
        bot, spmd.axis_y, [(i, i - 1) for i in range(1, spmd.n_y)])
    S = jnp.concatenate([from_south, S[:, Hy : Hy + ny_local, :], from_north], axis=-2)
    S = jnp.where(iy == 0, zipper.fill_south(S, ny_local, Hy, south, xp=jnp), S)

    # ---- phase 2: zipper fold via x-gathered strip (top y-rank only) ----
    # all shards participate in the gather (uniform collective); only the top rank's
    # result is used. Strip: top Hy+1 interior rows, interior columns.
    strip = S[:, Hy + ny_local - 1 - Hy : Hy + ny_local, Hx : Hx + nx_local]
    strip_g = jax.lax.all_gather(strip, spmd.axis_x, axis=2, tiled=True)  # (K, Hy+1, Nx)
    # embed into a pseudo halo-inclusive array (Ny = Hy+1 interior rows = the strip,
    # Hy dummy south-halo rows, Hy north-halo rows to be written; no x halos) and run
    # the global fold logic on it verbatim.
    zeros_h = jnp.zeros_like(strip_g[:, :Hy, :])
    pseudo = jnp.concatenate([zeros_h, strip_g, zeros_h], axis=-2)  # (K, 3*Hy+1, Nx)
    folded = zipper.fold_north_batch(pseudo, locs, signs, nx_g, Hy + 1, 0, Hy, xp=jnp)
    new_rows = folded[:, 2 * Hy :, :]  # row Ny (redundant half rewritten) + Hy halo rows
    zero = jnp.zeros_like(ix)
    own = jax.lax.dynamic_slice(
        new_rows,
        (zero, zero, ix * nx_local),
        (new_rows.shape[0], new_rows.shape[1], nx_local),
    )
    S_fold = S.at[:, Hy + ny_local - 1 :, Hx : Hx + nx_local].set(own)
    S = jnp.where(iy == spmd.n_y - 1, S_fold, S)

    # ---- phase 3: x exchange (periodic ring), all rows incl. fold rows/corners ----
    right = S[:, :, nx_local : nx_local + Hx]   # last Hx interior cols -> east neighbor's west halo
    left = S[:, :, Hx : 2 * Hx]                 # first Hx interior cols -> west neighbor's east halo
    ring_fwd = [(i, (i + 1) % spmd.n_x) for i in range(spmd.n_x)]
    ring_bwd = [(i, (i - 1) % spmd.n_x) for i in range(spmd.n_x)]
    from_west = jax.lax.ppermute(right, spmd.axis_x, ring_fwd)
    from_east = jax.lax.ppermute(left, spmd.axis_x, ring_bwd)
    return jnp.concatenate([from_west, S[:, :, Hx : Hx + nx_local], from_east], axis=-1)
