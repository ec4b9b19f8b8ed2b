from . import distributed, distributed2d
from .distributed import (Spmd, distribute, distribute_layered, fill_halos_spmd,
                          gather_layered_state, gather_state, make_mesh,
                          sharded_layered_step_fn, sharded_step_fn)
from .distributed2d import (distribute2d, distribute_layered2d, gather_layered_state2d,
                            gather_state2d, make_mesh2d, sharded_layered_step_fn2d,
                            sharded_step_fn2d)
