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
import numpy as np

from . import zipper

__all__ = ["Spmd2D", "fill_halos_spmd2d_batch", "fill_halos_spmd2d_groups"]


@dataclasses.dataclass(frozen=True)
class Spmd2D:
    """Static 2-D SPMD configuration. ``nx_global`` is the GLOBAL x size (the local
    model metadata carries local sizes; the fold needs the global one).

    ``fold_mode`` selects how the top y-rank's zipper fold crosses the
    x-partition: ``"gather"`` (all_gather of the thin strip along x — receive
    volume grows with n_x) or ``"mirror"`` (one ppermute to the mirror rank
    r ↔ n_x−1−r plus a one-column ring shift for face-x planes —
    N-INDEPENDENT volume; the fold pairs mirror ranks, so rank (r, top) only
    ever needs rank (n_x−1−r, top)'s strip). ``"auto"`` picks gather for
    n_x ≤ 4 (fewer latency hops, the gather is cheap at that width — the 2-D
    comm model in docs/performance.md) and mirror beyond. Both are
    bitwise-equal (tests/test_distributed2d.py)."""

    axis_x: str = "x"
    axis_y: str = "y"
    n_x: int = 1
    n_y: int = 1
    nx_global: int = 0
    fold_mode: str = "auto"

    @property
    def resolved_fold_mode(self) -> str:
        if self.fold_mode == "auto":
            return "gather" if self.n_x <= 4 else "mirror"
        if self.fold_mode not in ("gather", "mirror"):
            raise ValueError(f"unknown fold_mode {self.fold_mode!r}")
        return self.fold_mode


def _fold_arith(top, M, locs, signs, i0, nx_g):
    """Shared fold arithmetic on an (K, Hy+1, w) strip given its mirrored
    counterpart ``M`` (same shape, already rolled for face-x planes is NOT
    assumed — ``M`` must be the plain flip; the face-x roll variant is passed
    via ``M`` pre-selected by the caller). ``top``: the rank's own strip;
    ``i0``: GLOBAL column indices of its columns. Returns the rewritten
    (K, Hy+1, w) rows [row Ny | Hy halo rows] — identical arithmetic to
    zipper.fold_north_batch."""
    from .location import FACE, validate_location

    K = top.shape[0]
    Hy = top.shape[1] - 1
    locs_v = [validate_location(l) for l in locs]
    is_face_x = jnp.asarray([lx == FACE for lx, _ in locs_v]).reshape(K, 1, 1)
    sign_col = jnp.asarray(signs, dtype=top.dtype).reshape(K, 1, 1)
    sign_row = jnp.where(is_face_x & (i0.reshape(1, 1, -1) == 0),
                         jnp.abs(sign_col), sign_col)
    is_face_y = jnp.asarray([ly == FACE for _, ly in locs_v]).reshape(K, 1, 1)
    halo_c = jnp.flip(M[:, :Hy, :], axis=-2)
    halo_f = jnp.flip(M[:, 1 : Hy + 1, :], axis=-2)
    halo = jnp.where(is_face_y, halo_f, halo_c) * sign_row
    old_row = top[:, Hy, :]
    mir_row = M[:, Hy, :]
    cond = (~is_face_y[:, 0, :]) & (i0.reshape(1, -1) >= nx_g // 2)
    new_row = jnp.where(cond, sign_row[:, 0, :] * mir_row, old_row)
    return jnp.concatenate([new_row[:, None, :], halo], axis=-2)


def _mirror_strips(strips, spmd: Spmd2D):
    """(flip-mirror, face-x-rolled-mirror) of a (K, Hy+1, nxl) strip batch via
    the mirror-rank ppermute + one-column ring shift (see _fold_rows_mirror)."""
    n_x = spmd.n_x
    flipped = jnp.flip(strips, axis=-1)
    R = jax.lax.ppermute(flipped, spmd.axis_x,
                         [(i, n_x - 1 - i) for i in range(n_x)])
    recv = jax.lax.ppermute(R[:, :, -1:], spmd.axis_x,
                            [(i, (i + 1) % n_x) for i in range(n_x)])
    return R, jnp.concatenate([recv, R[:, :, :-1]], axis=-1)


def fill_halos_spmd2d_groups(groups, locs, signs, nx_local, ny_local, Hx, Hy,
                             spmd: Spmd2D, south="zero_gradient"):
    """Strip-based 2-D sharded halo fill of several field GROUPS (uniform
    (loc, sign) per group) without any full-plane concatenation — the 2-D
    counterpart of ops/spmd.fill_halos_spmd_groups (round-4 verdict item 4).
    Same three phases and collective COUNT as ``fill_halos_spmd2d_batch``
    (thin strips are concatenated across groups to share each collective);
    all write-backs are strip dynamic-update-slices and the rank-dependent
    south fill / fold are selected at strip granularity. Bitwise-equal to the
    batched path (tests/test_distributed2d.py). Returns the filled groups."""
    from .location import CENTER, validate_location

    iy = jax.lax.axis_index(spmd.axis_y)
    ix = jax.lax.axis_index(spmd.axis_x)
    n_y, n_x = spmd.n_y, spmd.n_x
    nx_g = spmd.nx_global
    Ks = [g.shape[0] for g in groups]
    splits = list(np.cumsum(Ks)[:-1]) if len(Ks) > 1 else []

    # ---- phase 1: y exchange (thin strips, 2 ppermutes) + south ----
    tops = jnp.concatenate([g[:, ny_local : ny_local + Hy, :] for g in groups])
    bots = jnp.concatenate([g[:, Hy : 2 * Hy, :] for g in groups])
    from_south = jax.lax.ppermute(tops, spmd.axis_y,
                                  [(i, i + 1) for i in range(n_y - 1)])
    from_north = jax.lax.ppermute(bots, spmd.axis_y,
                                  [(i, i - 1) for i in range(1, n_y)])
    fss = jnp.split(from_south, splits) if splits else [from_south]
    fns = jnp.split(from_north, splits) if splits else [from_north]
    out = []
    for g, fs, fn in zip(groups, fss, fns):
        south_strip = jnp.broadcast_to(g[:, Hy : Hy + 1, :], fs.shape)
        g = g.at[:, :Hy, :].set(jnp.where(iy == 0, south_strip, fs))
        g = g.at[:, Hy + ny_local :, :].set(fn)
        out.append(g)
    groups = out

    # ---- phase 2: fold across the x-partition (top y-rank only) ----
    strips = jnp.concatenate(
        [g[:, Hy + ny_local - 1 - Hy : Hy + ny_local, Hx : Hx + nx_local]
         for g in groups])
    i0 = ix * nx_local + jnp.arange(nx_local)
    if spmd.resolved_fold_mode == "mirror":
        R, R_face = _mirror_strips(strips, spmd)
        Rs = jnp.split(R, splits) if splits else [R]
        Rfs = jnp.split(R_face, splits) if splits else [R_face]
        tops_f = jnp.split(strips, splits) if splits else [strips]
        own = []
        for g, top, Rg, Rfg, loc, sign, K in zip(groups, tops_f, Rs, Rfs,
                                                 locs, signs, Ks):
            lx, _ = validate_location(loc)
            M = Rfg if lx != CENTER else Rg
            own.append(_fold_arith(top, M, [loc] * K, [sign] * K, i0, nx_g))
    else:
        strip_g = jax.lax.all_gather(strips, spmd.axis_x, axis=2, tiled=True)
        zero = jnp.zeros_like(ix)
        own = []
        o = 0
        for g, loc, sign, K in zip(groups, locs, signs, Ks):
            sg = strip_g[o : o + K]
            o += K
            flipped = jnp.flip(sg, axis=-1)
            lx, _ = validate_location(loc)
            M_full = (jnp.roll(flipped, 1, axis=-1) if lx != CENTER
                      else flipped)
            i0g = jnp.arange(nx_g)
            folded = _fold_arith(sg, M_full, [loc] * K, [sign] * K, i0g, nx_g)
            own.append(jax.lax.dynamic_slice(
                folded, (zero, zero, ix * nx_local),
                (K, folded.shape[1], nx_local)))
    out = []
    for g, ow in zip(groups, own):
        g_fold = g.at[:, Hy + ny_local - 1 :, Hx : Hx + nx_local].set(ow)
        # strip-granular select: only the written rows differ between branches
        rows = slice(Hy + ny_local - 1, None)
        g = g.at[:, rows, :].set(
            jnp.where(iy == n_y - 1, g_fold[:, rows, :], g[:, rows, :]))
        out.append(g)
    groups = out

    # ---- phase 3: x exchange (thin strips, 2 ppermutes), all rows ----
    rights = jnp.concatenate([g[:, :, nx_local : nx_local + Hx] for g in groups])
    lefts = jnp.concatenate([g[:, :, Hx : 2 * Hx] for g in groups])
    ring_fwd = [(i, (i + 1) % n_x) for i in range(n_x)]
    ring_bwd = [(i, (i - 1) % n_x) for i in range(n_x)]
    from_west = jax.lax.ppermute(rights, spmd.axis_x, ring_fwd)
    from_east = jax.lax.ppermute(lefts, spmd.axis_x, ring_bwd)
    fws = jnp.split(from_west, splits) if splits else [from_west]
    fes = jnp.split(from_east, splits) if splits else [from_east]
    out = []
    for g, fw, fe in zip(groups, fws, fes):
        g = g.at[:, :, :Hx].set(fw)
        g = g.at[:, :, Hx + nx_local :].set(fe)
        out.append(g)
    return out


def _fold_rows_mirror(S, locs, signs, nx_local, ny_local, Hx, Hy, spmd: Spmd2D, ix):
    """N-independent fold exchange: the rewritten fold rows (row Ny + Hy halo
    rows, OWN interior columns) via a single mirror-rank ppermute.

    The global fold mirror is ``flip`` over x (+ a one-column roll for face-x
    planes). A global flip decomposes as block-reversal ∘ within-block flip, so
    each rank flips its own strip locally and ppermutes it to its mirror rank
    (r ↔ n_x−1−r); the face-x one-column roll then needs exactly ONE column
    from the −x ring neighbor. Arithmetic is identical to
    ``zipper.fold_north_batch`` on the gathered strip — bitwise-equal by
    construction (pinned in tests/test_distributed2d.py)."""
    from .location import FACE, validate_location

    K = S.shape[0]
    locs_v = [validate_location(l) for l in locs]
    n_x = spmd.n_x
    nx_g = spmd.nx_global

    top = S[:, Hy + ny_local - 1 - Hy : Hy + ny_local, Hx : Hx + nx_local]
    flipped = jnp.flip(top, axis=-1)
    R = jax.lax.ppermute(flipped, spmd.axis_x,
                         [(i, n_x - 1 - i) for i in range(n_x)])
    # face-x planes read roll(flip(global), +1): local column 0 comes from the
    # last column of the -x ring neighbor's mirrored strip
    recv = jax.lax.ppermute(R[:, :, -1:], spmd.axis_x,
                            [(i, (i + 1) % n_x) for i in range(n_x)])
    R_face = jnp.concatenate([recv, R[:, :, :-1]], axis=-1)

    is_face_x = jnp.asarray([lx == FACE for lx, _ in locs_v]).reshape(K, 1, 1)
    M = jnp.where(is_face_x, R_face, R)

    i0 = ix * nx_local + jnp.arange(nx_local)  # GLOBAL column indices
    sign_col = jnp.asarray(signs, dtype=S.dtype).reshape(K, 1, 1)
    sign_row = jnp.where(is_face_x & (i0.reshape(1, 1, nx_local) == 0),
                         jnp.abs(sign_col), sign_col)

    is_face_y = jnp.asarray([ly == FACE for _, ly in locs_v]).reshape(K, 1, 1)
    halo_c = jnp.flip(M[:, :Hy, :], axis=-2)
    halo_f = jnp.flip(M[:, 1 : Hy + 1, :], axis=-2)
    halo = jnp.where(is_face_y, halo_f, halo_c) * sign_row

    old_row = top[:, Hy, :]
    mir_row = M[:, Hy, :]
    cond = (~is_face_y[:, 0, :]) & (i0.reshape(1, nx_local) >= nx_g // 2)
    new_row = jnp.where(cond, sign_row[:, 0, :] * mir_row, old_row)
    return jnp.concatenate([new_row[:, None, :], halo], axis=-2)  # (K, Hy+1, nxl)


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

    # ---- phase 2: zipper fold across the x-partition (top y-rank only) ----
    # all shards participate in the collectives (uniform); only the top rank's
    # result is used. Strip: top Hy+1 interior rows, interior columns.
    if spmd.resolved_fold_mode == "mirror":
        own = _fold_rows_mirror(S, locs, signs, nx_local, ny_local, Hx, Hy,
                                spmd, ix)
    else:
        strip = S[:, Hy + ny_local - 1 - Hy : Hy + ny_local, Hx : Hx + nx_local]
        strip_g = jax.lax.all_gather(strip, spmd.axis_x, axis=2, tiled=True)  # (K, Hy+1, Nx)
        # embed into a pseudo halo-inclusive array (Ny = Hy+1 interior rows = the
        # strip, Hy dummy south-halo rows, Hy north-halo rows to be written; no x
        # halos) and run the global fold logic on it verbatim.
        zeros_h = jnp.zeros_like(strip_g[:, :Hy, :])
        pseudo = jnp.concatenate([zeros_h, strip_g, zeros_h], axis=-2)  # (K, 3*Hy+1, Nx)
        folded = zipper.fold_north_batch(pseudo, locs, signs, nx_g, Hy + 1, 0, Hy,
                                         xp=jnp)
        new_rows = folded[:, 2 * Hy :, :]  # row Ny (redundant half) + Hy halo rows
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
