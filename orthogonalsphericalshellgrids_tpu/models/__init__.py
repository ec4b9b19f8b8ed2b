from . import hydrostatic, split_explicit
from .hydrostatic import HydrostaticModel, State, compute_cfl_dt, initial_state, make_model, step, vorticity
from .split_explicit import SplitExplicitFreeSurface, averaging_weights
