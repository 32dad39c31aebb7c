"""Driver interface: __graft_entry__.entry() must stay jittable."""

import jax
import numpy as np


def test_entry_compiles_and_steps():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[0].shape
    assert bool(np.isfinite(np.asarray(out)).all())
