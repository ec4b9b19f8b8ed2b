"""Distributed (y-sharded) tripolar model over a JAX device mesh.

TPU-native build of the reference's distributed layer (SURVEY.md §2.3/2.4, C7):
the reference supports exactly 1-D y(j)-partitioning (guard at
``src/distributed_tripolar_grid.jl:30-31``), builds the global grid on the host and
slices a halo-inclusive j-range per rank (``jrange = jstart-Hy:jend+Hy``, :47-49), puts
the zipper fold only on the last rank (:143-147) and MPI halo-communication BCs on
interior ranks (:171).

Here the same decomposition maps to single-controller JAX:

- Every distributed 2-D array is stored globally as ``(n_shards * (ny + 2*Hy), Nx+2*Hx)``
  with ``NamedSharding(P('y', None))`` — each shard's block IS its halo-inclusive local
  array, the direct analog of the reference's halo-inclusive j-range slice.
- The step runs under ``shard_map``; halo exchange is two ``lax.ppermute`` neighbor
  shifts over the mesh's y axis (ICI), the zipper fold is a local flip on the top shard
  (each shard holds the full x extent, exactly like the reference's ranks), the south
  fill applies on shard 0 only.
- The barotropic substep loop stays communication-free: the free-surface fields carry
  the widened y-halo per shard, so substeps shrink validity into the halo instead of
  exchanging (the reference's with_halo trick, now per shard).

The local step body is the *same* serial code (models/hydrostatic.py) — the only
injection point is the halo-fill function, selected by the ``Spmd`` tag.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import hydrostatic as hydro
from ..models.hydrostatic import HydrostaticModel, State
from ..ops.spmd import Spmd, fill_halos_spmd

__all__ = ["Spmd", "fill_halos_spmd", "make_mesh", "distribute", "gather_state",
           "sharded_step_fn", "distribute_layered", "gather_layered_state",
           "sharded_layered_step_fn"]


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D y mesh over the available devices (ICI within a slice, DCN across)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise RuntimeError(f"requested a {n_devices}-device mesh but only "
                               f"{len(devices)} device(s) are visible")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("y",))


# --------------------------------------------------------------------------------------
# Serial -> distributed layout conversion
# --------------------------------------------------------------------------------------

def _partition_rows(A: np.ndarray, n: int, ny: int, Hy: int) -> np.ndarray:
    """Global halo-inclusive rows -> stacked per-shard halo-inclusive blocks.

    The k-th block is rows [k*ny, k*ny + ny + 2*Hy) of the global halo-inclusive array —
    the reference's halo-inclusive jrange slice (src/distributed_tripolar_grid.jl:47-49,
    :112-120) expressed in 0-based offsets."""
    blocks = [A[k * ny : k * ny + ny + 2 * Hy] for k in range(n)]
    return np.concatenate(blocks, axis=0)


def _spec_for(leaf, mesh):
    return NamedSharding(mesh, _pspec_for(leaf))


def _pspec_for(leaf):
    if hasattr(leaf, "ndim") and leaf.ndim == 2:
        return P("y", None)
    if hasattr(leaf, "ndim") and leaf.ndim == 3:
        return P(None, "y", None)
    return P()


def distribute(model: HydrostaticModel, state: State, mesh: Mesh):
    """Partition a serial model+state onto the mesh.

    Returns (dist_model, dist_state) whose 2-D leaves are ``(n*(ny+2Hy), X)`` arrays
    sharded over the mesh's y axis, and whose grid metadata is rewritten to the LOCAL
    sizes (Ny -> ny) so the unchanged serial step code runs correctly inside shard_map.
    Requires Ny % n == 0 and ny >= the extended y-halo."""
    n = mesh.devices.size
    g, ge = model.grid, model.grid_ext
    if g.Ny % n != 0:
        raise ValueError(f"Ny={g.Ny} must be divisible by the number of shards {n}")
    ny = g.Ny // n
    if ny < ge.Hy:
        raise ValueError(
            f"local rows ny={ny} must cover the extended halo Hy={ge.Hy} "
            f"(the communication-free barotropic loop folds that far)"
        )

    def repartition(leaf, Hy_base, Hy_ext, Ny_glob):
        a = np.asarray(leaf)
        if a.ndim == 3:
            # stacked operand packs (K, Ye, Xe) for the Pallas kernels: partition the
            # row axis per plane; the (possibly) padded rows beyond the halo layout
            # are rebuilt per shard by the kernels' own pad logic, so slice them off
            # check the larger (extended-halo) layout first: a padded ext pack also
            # clears the base-rows threshold
            for rows, Hy_k in ((Ny_glob + 2 * Hy_ext, Hy_ext), (Ny_glob + 2 * Hy_base, Hy_base)):
                if a.shape[1] >= rows:
                    blocks = [_partition_rows(a[k][:rows], n, ny, Hy_k) for k in range(a.shape[0])]
                    return np.stack(blocks)
            raise ValueError(f"unexpected 3-D leaf shape {a.shape}")
        if a.ndim != 2:
            return a
        if a.shape[0] == Ny_glob + 2 * Hy_base:
            return _partition_rows(a, n, ny, Hy_base)
        if a.shape[0] == Ny_glob + 2 * Hy_ext:
            return _partition_rows(a, n, ny, Hy_ext)
        raise ValueError(f"unexpected 2-D leaf rows {a.shape}")

    def convert(tree, grid_meta_updates):
        leaves = jax.tree_util.tree_map(
            lambda leaf: repartition(leaf, g.Hy, ge.Hy, g.Ny), tree
        )
        return leaves

    dist_model_host = convert(model, None)
    dist_state_host = convert(state, None)

    # rewrite static metadata to local sizes
    local_grid = dataclasses.replace(dist_model_host.grid, Ny=ny)
    local_grid_ext = dataclasses.replace(dist_model_host.grid_ext, Ny=ny)
    dist_model_host = dataclasses.replace(
        dist_model_host, grid=local_grid, grid_ext=local_grid_ext
    )

    put = lambda tree: jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, _spec_for(leaf, mesh)), tree
    )
    return put(dist_model_host), put(dist_state_host)


def gather_state(dist_state: State, model_serial: HydrostaticModel, n: int) -> State:
    """Reassemble a serial-layout State from a distributed one (the analog of the
    reference's reconstruct_global_grid path for fields,
    src/distributed_tripolar_grid.jl:201-226): keep each shard's interior rows, then
    re-wrap halos from the serial grid's fill on next use."""
    g, ge = model_serial.grid, model_serial.grid_ext
    ny = g.Ny // n

    def unpart(leaf, Hy, Ny_glob):
        a = np.asarray(leaf)
        block_rows = ny + 2 * Hy
        interiors = [a[k * block_rows + Hy : k * block_rows + Hy + ny] for k in range(n)]
        out = np.zeros((Ny_glob + 2 * Hy, a.shape[1]), a.dtype)
        out[Hy : Hy + Ny_glob] = np.concatenate(interiors, axis=0)
        return out

    def conv(leaf, ref_leaf):
        a = np.asarray(leaf)
        if a.ndim != 2:
            return jnp.asarray(a)
        ref_rows = np.asarray(ref_leaf).shape[0]
        if ref_rows == g.Ny + 2 * g.Hy:
            return jnp.asarray(unpart(a, g.Hy, g.Ny))
        return jnp.asarray(unpart(a, ge.Hy, g.Ny))

    ref = model_serial  # for shapes
    return State(
        u=conv(dist_state.u, ref.grid.lam_cc),
        v=conv(dist_state.v, ref.grid.lam_cc),
        eta=conv(dist_state.eta, ref.grid_ext.lam_cc),
        U=conv(dist_state.U, ref.grid_ext.lam_cc),
        V=conv(dist_state.V, ref.grid_ext.lam_cc),
        c=conv(dist_state.c, ref.grid.lam_cc),
        Gu=conv(dist_state.Gu, ref.grid.lam_cc),
        Gv=conv(dist_state.Gv, ref.grid.lam_cc),
        Gc=conv(dist_state.Gc, ref.grid.lam_cc),
        t=dist_state.t if np.ndim(dist_state.t) == 0 else np.asarray(dist_state.t).ravel()[0],
        iteration=dist_state.iteration,
    )


def sharded_step_fn(mesh: Mesh, dist_model: HydrostaticModel):
    """Jitted shard_map-wrapped step over the mesh. Returned fn: (state, dt) -> state."""
    n = mesh.devices.size
    spmd = Spmd(axis_name="y", n_shards=n)

    model_specs = jax.tree_util.tree_map(_pspec_for, dist_model)
    state_specs_fn = lambda s: jax.tree_util.tree_map(_pspec_for, s)

    def run(dist_state, dt):
        state_specs = state_specs_fn(dist_state)
        local = partial(hydro.step, spmd=spmd)
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(model_specs, state_specs, P()),
            out_specs=state_specs,
            # check_vma=False: the varying-mesh-axes checker cannot annotate the
            # Pallas kernel's ShapeDtypeStruct out_shape (ops/pallas_baro.py) and
            # rejects the trace; correctness is pinned by the sharded-vs-serial
            # bitwise tests instead.
            check_vma=False,
        )
        return fn(dist_model, dist_state, dt)

    return jax.jit(run)


# --------------------------------------------------------------------------------------
# Layered (Nz > 1) model distribution — same y-decomposition, 3-D (Nz, y, x) leaves
# --------------------------------------------------------------------------------------

def distribute_layered(model, state, mesh: Mesh):
    """Partition a layered model+state onto the mesh (the single-layer ``distribute``
    extended to (Nz, y, x) leaves: the layer axis is replicated, rows are sharded).

    Every 3-D leaf — per-layer state fields, per-layer masks, and the barotropic
    engine's stacked Pallas operand packs alike — is partitioned along its row axis
    into halo-inclusive per-shard blocks; grid metadata is rewritten to local sizes so
    the unchanged serial layered_step runs inside shard_map."""
    from ..models.layered import LayeredModel, LayeredState  # local import: no cycle

    n = mesh.devices.size
    g, ge = model.grid, model.baro.grid_ext
    if g.Ny % n != 0:
        raise ValueError(f"Ny={g.Ny} must be divisible by the number of shards {n}")
    ny = g.Ny // n
    if ny < ge.Hy:
        raise ValueError(f"local rows ny={ny} must cover the extended halo Hy={ge.Hy}")

    def repart(leaf):
        a = np.asarray(leaf)
        if a.ndim == 3:
            for rows, Hy_k in ((g.Ny + 2 * ge.Hy, ge.Hy), (g.Ny + 2 * g.Hy, g.Hy)):
                if a.shape[1] >= rows:
                    return np.stack(
                        [_partition_rows(a[k][:rows], n, ny, Hy_k) for k in range(a.shape[0])])
            raise ValueError(f"unexpected 3-D leaf shape {a.shape}")
        if a.ndim != 2:
            return a
        if a.shape[0] == g.Ny + 2 * g.Hy:
            return _partition_rows(a, n, ny, g.Hy)
        if a.shape[0] == g.Ny + 2 * ge.Hy:
            return _partition_rows(a, n, ny, ge.Hy)
        raise ValueError(f"unexpected 2-D leaf rows {a.shape}")

    dist_model = jax.tree_util.tree_map(repart, model)
    dist_state = jax.tree_util.tree_map(repart, state)

    local_baro = dataclasses.replace(
        dist_model.baro,
        grid=dataclasses.replace(dist_model.baro.grid, Ny=ny),
        grid_ext=dataclasses.replace(dist_model.baro.grid_ext, Ny=ny),
    )
    dist_model = dataclasses.replace(dist_model, baro=local_baro)

    put = lambda tree: jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, _spec_for(leaf, mesh)), tree)
    return put(dist_model), put(dist_state)


def gather_layered_state(dist_state, model_serial, n: int):
    """Reassemble a serial-layout LayeredState from a distributed one (interior rows
    per shard; halos re-filled by the serial step on next use)."""
    from ..models.layered import LayeredState

    g, ge = model_serial.grid, model_serial.baro.grid_ext
    ny = g.Ny // n

    def unpart2(a, Hy, Ny_glob):
        block = ny + 2 * Hy
        interiors = [a[k * block + Hy : k * block + Hy + ny] for k in range(n)]
        out = np.zeros((Ny_glob + 2 * Hy, a.shape[-1]), a.dtype)
        out[Hy : Hy + Ny_glob] = np.concatenate(interiors, axis=0)
        return out

    def conv(leaf, ext=False):
        a = np.asarray(leaf)
        Hy = ge.Hy if ext else g.Hy
        if a.ndim == 3:
            return jnp.asarray(np.stack([unpart2(a[k], Hy, g.Ny) for k in range(a.shape[0])]))
        if a.ndim == 2:
            return jnp.asarray(unpart2(a, Hy, g.Ny))
        return jnp.asarray(a)

    return LayeredState(
        u=conv(dist_state.u), v=conv(dist_state.v),
        eta=conv(dist_state.eta, ext=True), U=conv(dist_state.U, ext=True),
        V=conv(dist_state.V, ext=True),
        c=conv(dist_state.c), b=conv(dist_state.b),
        Gu=conv(dist_state.Gu), Gv=conv(dist_state.Gv), Gc=conv(dist_state.Gc),
        Gb=conv(dist_state.Gb),
        t=dist_state.t, iteration=dist_state.iteration,
    )


def sharded_layered_step_fn(mesh: Mesh, dist_model):
    """Jitted shard_map-wrapped layered step over the mesh: (state, dt) -> state."""
    from ..models import layered as lay

    n = mesh.devices.size
    spmd = Spmd(axis_name="y", n_shards=n)
    model_specs = jax.tree_util.tree_map(_pspec_for, dist_model)

    def run(dist_state, dt):
        state_specs = jax.tree_util.tree_map(_pspec_for, dist_state)
        fn = jax.shard_map(
            partial(lay.layered_step, spmd=spmd),
            mesh=mesh,
            in_specs=(model_specs, state_specs, P()),
            out_specs=state_specs,
            check_vma=False,
        )
        return fn(dist_model, dist_state, dt)

    return jax.jit(run)
