"""Multi-chip decomposition tests on the 8-device virtual CPU mesh
(SURVEY.md section 4: sharded run must match the single-device run)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.cases import get_case
from lbm_tpu.engine.compile import compile_case
from lbm_tpu.engine.step import initial_f, make_step
from lbm_tpu.parallel.halo import make_halo_step
from lbm_tpu.parallel.mesh import (
    free_axis,
    lattice_mesh,
    lattice_sharding,
    shard_compiled,
)

pytestmark = pytest.mark.multichip


def _reference_run(cc, nsteps):
    step = jax.jit(make_step(cc))
    f = initial_f(cc)
    for t in range(nsteps):
        f, rho, u = step(f, jnp.int32(t))
    return np.asarray(f), np.asarray(rho), np.asarray(u)


@pytest.mark.parametrize("case_name,kwargs", [
    ("lid_driven_cavity", dict(n=16)),
    ("poiseuille", dict(n=16)),
    ("poiseuille", dict(n=16, collision="trt")),
    ("curved_vessel", dict(n=32, nphase=4, period_steps=8)),
])
def test_gspmd_sharded_matches_single_device(case_name, kwargs):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    spec = get_case(case_name, **kwargs)
    cc = compile_case(spec)
    nsteps = 7
    f_ref, rho_ref, u_ref = _reference_run(cc, nsteps)

    axis = free_axis(spec)
    mesh = lattice_mesh()
    cc_sh = shard_compiled(cc, mesh, axis=axis)
    shard = lattice_sharding(axis=axis, mesh=mesh, leading=1)
    step = jax.jit(make_step(cc_sh))
    f = jax.device_put(initial_f(cc), shard)
    for t in range(nsteps):
        f, rho, u = step(f, jnp.int32(t))
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=3e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=3e-6, atol=1e-6)


@pytest.mark.parametrize("case_name,kwargs", [
    ("lid_driven_cavity", dict(n=16)),
    ("poiseuille", dict(n=16)),
    ("poiseuille", dict(n=16, collision="trt")),
    ("poiseuille", dict(n=16, force=(0.0, 1e-5, 0.0))),
    ("lid_driven_cavity", dict(n=16, lid="bounceback")),
    ("poiseuille", dict(n=16, collision="mrt")),
    ("poiseuille", dict(n=16, smagorinsky_cs=0.17)),
    ("poiseuille", dict(n=16, rheology={"model": "carreau", "nu0": 0.3,
                            "nu_inf": 0.02, "lam": 3000.0, "n": 0.5})),
])
def test_halo_exchange_matches_single_device(case_name, kwargs):
    spec = get_case(case_name, **kwargs)
    cc = compile_case(spec)
    nsteps = 7
    f_ref, rho_ref, u_ref = _reference_run(cc, nsteps)

    axis = free_axis(spec)
    mesh = lattice_mesh()
    cc_sh = shard_compiled(cc, mesh, axis=axis)
    step = jax.jit(make_halo_step(cc_sh, mesh, shard_axis=axis))
    shard = lattice_sharding(axis=axis, mesh=mesh, leading=1)
    f = jax.device_put(initial_f(cc), shard)
    for t in range(nsteps):
        f, rho, u = step(f, jnp.int32(t))
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=3e-6, atol=1e-7)


def test_coronary_shards_on_y():
    spec = get_case("coronary", shape=(48, 32, 40), radius=5)
    assert free_axis(spec) == 1
    cc = compile_case(spec)
    nsteps = 4
    f_ref, _, _ = _reference_run(cc, nsteps)
    mesh = lattice_mesh()
    cc_sh = shard_compiled(cc, mesh, axis=1)
    step = jax.jit(make_halo_step(cc_sh, mesh, shard_axis=1))
    f = jax.device_put(initial_f(cc), lattice_sharding(axis=1, mesh=mesh, leading=1))
    for t in range(nsteps):
        f, rho, u = step(f, jnp.int32(t))
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=3e-6, atol=1e-7)


def test_gspmd_convergence_horizon():
    """600-step GSPMD-sharded-vs-dense equivalence (VERDICT r3 weak-#1):
    fields AND the per-step velsum series, long enough for information
    to cross every shard boundary many times."""
    spec = get_case("lid_driven_cavity", n=16)
    cc = compile_case(spec)
    nsteps = 600
    step_d = jax.jit(make_step(cc))
    fluid = np.asarray(cc.fluid)
    f = initial_f(cc)
    ref_series = np.empty(nsteps)
    for t in range(nsteps):
        f, rho, u = step_d(f, jnp.int32(t))
        ref_series[t] = float(
            np.sum(np.sqrt(np.sum(np.asarray(u) ** 2, axis=0))[fluid]))
    f_ref = np.asarray(f)

    axis = free_axis(spec)
    mesh = lattice_mesh()
    cc_sh = shard_compiled(cc, mesh, axis=axis)
    step = jax.jit(make_step(cc_sh))
    fs = jax.device_put(initial_f(cc),
                        lattice_sharding(axis=axis, mesh=mesh, leading=1))
    series = np.empty(nsteps)
    for t in range(nsteps):
        fs, rho, u = step(fs, jnp.int32(t))
        series[t] = float(
            np.sum(np.sqrt(np.sum(np.asarray(u) ** 2, axis=0))[fluid]))
    np.testing.assert_allclose(np.asarray(fs), f_ref, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(series, ref_series, rtol=1e-5)


def test_halo_step_rejects_bc_on_shard_axis():
    spec = get_case("poiseuille", n=16)
    cc = compile_case(spec)
    with pytest.raises(ValueError):
        make_halo_step(cc, lattice_mesh(), shard_axis=1)
