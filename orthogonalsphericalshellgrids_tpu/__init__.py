"""TPU-native tripolar-grid ocean stencil engine.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
CliMA/OrthogonalSphericalShellGrids.jl plus the Oceananigans machinery its examples
exercise (SURVEY.md §0): tripolar grid generation with precomputed metrics, the zipper
north-fold boundary condition, C-grid finite-volume WENO dynamics, a split-explicit free
surface, simulation driving/output, and y-sharded distributed execution over a JAX
device mesh.

The reference package exports exactly two names — ``TripolarGrid`` and
``ZipperBoundaryCondition`` (``src/OrthogonalSphericalShellGrids.jl:4``); here the same
two concepts are the core exports, alongside the model/simulation layer that the
reference delegates to Oceananigans.
"""

import os as _os

# Persistent XLA compilation cache: on a remote-compile TPU tunnel every fresh process
# otherwise pays multi-second compiles for each computation; the cache makes repeat
# runs (tests, benchmarks, restarts) warm-start.
try:  # pragma: no cover - best effort, environment dependent
    import jax as _jax

    if getattr(_jax.config, "jax_compilation_cache_dir", None) in (None, ""):
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("OSG_COMPILE_CACHE", _os.path.expanduser("~/.cache/jax_osg")),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

from .grids.geometry import R_EARTH
from .grids.tripolar import TripolarGrid, build_tripolar_arrays, with_halo
from .ops.location import CC, CF, FC, FF, default_zipper_sign, sign_for_field_name
from .ops.zipper import ZipperBoundaryCondition, fill_halos, fold_north, wrap_x

__all__ = [
    "TripolarGrid",
    "ZipperBoundaryCondition",
    "build_tripolar_arrays",
    "with_halo",
    "fill_halos",
    "fold_north",
    "wrap_x",
    "default_zipper_sign",
    "sign_for_field_name",
    "R_EARTH",
    "CC", "CF", "FC", "FF",
]

__version__ = "0.1.0"
