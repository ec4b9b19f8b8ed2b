from . import distributed
from .distributed import Spmd, distribute, fill_halos_spmd, gather_state, make_mesh, sharded_step_fn
