"""Ensemble data parallelism via vmap (SURVEY.md §2.3: the DP row — ensembles are a
trivial vmap over the state pytree; not in the reference, a capability extension).

Pins: vmapping `step` over a batch of initial states is member-wise serial stepping
(up to XLA fusion-order rounding), so ensemble runs need no new model code."""

import numpy as np

import jax
import jax.numpy as jnp

from test_model import bickley_model

from orthogonalsphericalshellgrids_tpu.models import initial_state, step


def test_vmap_ensemble_matches_member_runs():
    model, base = bickley_model(size=(32, 24, 1), dtype=jnp.float32, substeps=6)

    # three members: the base state with scaled tracer/velocity perturbations
    scales = jnp.asarray([0.5, 1.0, 1.5], jnp.float32)

    def member(s):
        return jax.tree.map(lambda a: (a * s).astype(a.dtype), base)

    batch = jax.vmap(member)(scales)
    # iteration counters must stay scalar per member (they are part of the pytree)
    assert batch.u.shape == (3,) + base.u.shape

    step2 = lambda st: step(model, step(model, st, 90.0), 90.0)
    out_batch = jax.jit(jax.vmap(step2))(batch)

    for i, s in enumerate(np.asarray(scales)):
        out_i = jax.jit(step2)(member(jnp.asarray(s)))
        for name in ("u", "v", "eta", "c"):
            a = np.asarray(getattr(out_i, name))
            b = np.asarray(getattr(out_batch, name))[i]
            scale = np.abs(a).max() + 1e-30
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-6,
                                       err_msg=f"member {i} field {name}")
