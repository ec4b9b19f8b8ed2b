from . import hydrostatic, layered, split_explicit
from .hydrostatic import HydrostaticModel, State, compute_cfl_dt, initial_state, make_model, step, vorticity
from .layered import (LayeredModel, LayeredState, layered_cfl_dt, layered_initial_state,
                      layered_multi_step, layered_step, make_layered_model,
                      vertical_velocity)
from .split_explicit import SplitExplicitFreeSurface, averaging_weights
