"""Golden-field regression: the dense engine's lid-cavity field after 100
steps is pinned (SURVEY.md §4: golden-field regression vs small CPU runs).
Any change to streaming/collision/BC semantics trips this."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from lbm_tpu.cases import get_case
from lbm_tpu.engine.compile import compile_case
from lbm_tpu.engine.step import initial_f, macro_fields, make_step

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "golden_lid16_100.npz")


def test_lid16_golden_field():
    cc = compile_case(get_case("lid_driven_cavity", n=16))
    step = jax.jit(make_step(cc))
    f = initial_f(cc)
    for t in range(100):
        f, rho, u = step(f, jnp.int32(t))
    rho, u = macro_fields(cc, f)
    with np.load(GOLDEN) as g:
        np.testing.assert_allclose(np.asarray(u), g["u"], rtol=1e-5,
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(rho), g["rho"], rtol=1e-5)
