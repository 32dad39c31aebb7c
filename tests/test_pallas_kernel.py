"""Pallas fused-kernel correctness vs the dense XLA step (interpret mode
on CPU; the real-TPU path is exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.cases import get_case
from lbm_tpu.engine.compile import compile_case
from lbm_tpu.engine.step import initial_f, make_step
from lbm_tpu.kernels.collide_stream import (
    make_pallas_step,
    pack_state,
    pad_spec,
    unpack_state,
)


import jax


def _dense_run(cc, f0, nsteps):
    step = jax.jit(make_step(cc))
    f = f0
    for t in range(nsteps):
        f, rho, u = step(f, jnp.int32(t))
    return np.asarray(f)


def _pallas_run(cc, f0, nsteps, **kw):
    step = jax.jit(make_pallas_step(cc, interpret=True, **kw))
    p = pack_state(f0, jnp.asarray(np.asarray(cc.spec.mask)))
    vs = None
    for t in range(nsteps):
        p, vs = step(p, jnp.int32(t))
    return np.asarray(unpack_state(p)), vs


@pytest.mark.parametrize("case_name,kwargs", [
    ("lid_driven_cavity", dict(n=16)),
    ("poiseuille", dict(n=16)),
])
def test_pallas_matches_dense(case_name, kwargs):
    spec = pad_spec(get_case(case_name, **kwargs))
    cc = compile_case(spec)
    f0 = initial_f(cc)
    nsteps = 4
    f_ref = _dense_run(cc, f0, nsteps)
    f, _ = _pallas_run(cc, f0, nsteps)
    interior = (slice(None), slice(1, -1), slice(1, -1), slice(None))
    np.testing.assert_allclose(
        f[interior], f_ref[interior], rtol=3e-6, atol=1e-7
    )


def test_pallas_z_padded_lane_multiple():
    """z padding to a lane multiple must not change interior physics."""
    spec_p = pad_spec(get_case("lid_driven_cavity", n=16), lane_multiple=32)
    assert spec_p.shape[2] == 32
    cc = compile_case(spec_p)
    f0 = initial_f(cc)
    f, _ = _pallas_run(cc, f0, 3)

    spec_u = pad_spec(get_case("lid_driven_cavity", n=16))
    cc_u = compile_case(spec_u)
    f_ref = _dense_run(cc_u, initial_f(cc_u), 3)
    np.testing.assert_allclose(
        f[:, 1:-1, 1:-1, :16], f_ref[:, 1:-1, 1:-1, :],
        rtol=3e-6, atol=1e-7,
    )


def test_pallas_velsum_matches_dense():
    spec = pad_spec(get_case("lid_driven_cavity", n=16))
    cc = compile_case(spec)
    f0 = initial_f(cc)
    step_d = make_step(cc)
    f_d, rho, u = step_d(f0, jnp.int32(0))
    fluid = np.asarray(cc.fluid)
    s_ref = float(np.sum(np.sqrt(np.sum(np.asarray(u) ** 2, axis=0))[fluid]))
    _, vs = _pallas_run(cc, f0, 1)
    assert abs(float(vs) - s_ref) / s_ref < 1e-5


def test_pallas_coronary_multioutlet():
    """All five BC variants incl. z-plane sub-outlets run through the
    packed plane-fixup path."""
    spec = pad_spec(get_case("coronary", shape=(32, 24, 40), radius=5))
    cc = compile_case(spec)
    f0 = initial_f(cc)
    nsteps = 3
    f_ref = _dense_run(cc, f0, nsteps)
    f, _ = _pallas_run(cc, f0, nsteps)
    interior = (slice(None), slice(1, -1), slice(1, -1), slice(None))
    np.testing.assert_allclose(
        f[interior], f_ref[interior], rtol=3e-6, atol=1e-7
    )


def test_padded_spec_matches_unpadded_physics():
    spec_u = get_case("lid_driven_cavity", n=16)
    spec_p = pad_spec(get_case("lid_driven_cavity", n=16))
    cc_u, cc_p = compile_case(spec_u), compile_case(spec_p)
    f_u = _dense_run(cc_u, initial_f(cc_u), 5)
    f_p = _dense_run(cc_p, initial_f(cc_p), 5)
    np.testing.assert_allclose(
        f_p[:, 1:-1, 1:-1, :], f_u, rtol=2e-6, atol=1e-7
    )


def test_pallas_plane_multiples_padding():
    """x/y interior rounding to tile multiples must not change physics
    (bifurcation's prime ny=83 regime)."""
    spec_p = pad_spec(get_case("lid_driven_cavity", n=18),
                      plane_multiples=(4, 8))
    assert spec_p.shape[0] == 22 and spec_p.shape[1] == 26
    cc = compile_case(spec_p)
    f0 = initial_f(cc)
    f, _ = _pallas_run(cc, f0, 3)

    spec_u = pad_spec(get_case("lid_driven_cavity", n=18))
    cc_u = compile_case(spec_u)
    f_ref = _dense_run(cc_u, initial_f(cc_u), 3)
    np.testing.assert_allclose(
        f[:, 1:19, 1:19, :], f_ref[:, 1:-1, 1:-1, :],
        rtol=3e-6, atol=1e-7,
    )


def test_pallas_backend_in_runner_interpret():
    """Simulation(backend='pallas') off-TPU runs the kernel in interpret
    mode through the full runner (padding, packing, residuals, macro) and
    matches the xla backend."""
    from lbm_tpu.engine.runner import Simulation

    kw = dict(n=16, max_steps=8, time_save=4)
    sim = Simulation(get_case("lid_driven_cavity", **kw), backend="pallas")
    res = sim.run(verbose=False)
    assert res.steps == 8
    sim2 = Simulation(get_case("lid_driven_cavity", **kw), backend="xla")
    res2 = sim2.run(verbose=False)
    np.testing.assert_allclose(
        np.asarray(sim.f_standard()), np.asarray(sim2.f_standard()),
        rtol=3e-6, atol=1e-7,
    )
    assert abs(res.residual - res2.residual) < 1e-6
    rho, u = sim.macro()
    assert rho.shape == (16, 16, 16)
