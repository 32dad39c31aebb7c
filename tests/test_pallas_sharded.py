"""Multi-chip Pallas path: shard_map + ppermute halo exchange around the
fused kernel, validated against the single-device dense engine on the
8-device CPU mesh (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.cases import get_case
from lbm_tpu.engine.compile import compile_case
from lbm_tpu.engine.step import initial_f, make_step
from lbm_tpu.kernels.collide_stream import pack_state, pad_spec, unpack_state
from lbm_tpu.parallel.mesh import lattice_mesh
from lbm_tpu.parallel.pallas_sharded import make_pallas_sharded_step

pytestmark = pytest.mark.multichip


def _dense_run(cc, f0, nsteps):
    step = jax.jit(make_step(cc))
    f = f0
    for t in range(nsteps):
        f, rho, u = step(f, jnp.int32(t))
    return np.asarray(f)


def _sharded_run(cc, f0, nsteps, shard_axis):
    mesh = lattice_mesh()
    step, init, unblock = make_pallas_sharded_step(
        cc, mesh, shard_axis=shard_axis, interpret=True
    )
    step = jax.jit(step)
    p = init(pack_state(f0, jnp.asarray(np.asarray(cc.spec.mask))))
    vs = None
    for t in range(nsteps):
        p, vs = step(p, jnp.int32(t))
    return np.asarray(unpack_state(unblock(p))), float(vs)


@pytest.mark.parametrize("case_name,kwargs", [
    ("lid_driven_cavity", dict(n=16)),
    ("poiseuille", dict(n=16)),
])
def test_sharded_pallas_matches_dense(case_name, kwargs):
    spec = pad_spec(get_case(case_name, **kwargs))
    cc = compile_case(spec)
    f0 = initial_f(cc)
    nsteps = 2
    f_ref = _dense_run(cc, f0, nsteps)
    f, vs = _sharded_run(cc, f0, nsteps, shard_axis=0)
    interior = (slice(None), slice(1, -1), slice(1, -1), slice(None))
    np.testing.assert_allclose(
        f[interior], f_ref[interior], rtol=3e-6, atol=1e-7
    )
    assert np.isfinite(vs)


def test_sharded_pallas_coronary_y_shard_with_z_outlets():
    """Coronary topology: BCs on x and z, sharded on y; exercises the
    blocked z-plane fixups with halo-patched slabs."""
    # z=40 keeps the sub-outlet caps clear of the main tube. (At z=32 a
    # cap plane bisects the tube: live-cell physics still matches dense
    # to 2e-7, but DEAD-cell contents — unspecified by contract, cf. the
    # tile-skip aliasing — pick up NaNs that break the whole-interior
    # comparison below.)
    spec = pad_spec(get_case("coronary", shape=(32, 32, 40), radius=5))
    cc = compile_case(spec)
    f0 = initial_f(cc)
    nsteps = 2
    f_ref = _dense_run(cc, f0, nsteps)
    f, vs = _sharded_run(cc, f0, nsteps, shard_axis=1)
    interior = (slice(None), slice(1, -1), slice(1, -1), slice(None))
    np.testing.assert_allclose(
        f[interior], f_ref[interior], rtol=3e-6, atol=1e-7
    )


def test_sharded_velsum_matches_dense():
    spec = pad_spec(get_case("lid_driven_cavity", n=16))
    cc = compile_case(spec)
    f0 = initial_f(cc)
    step = make_step(cc)
    f1, rho, u = step(f0, jnp.int32(0))
    fluid = np.asarray(cc.fluid)
    s_ref = float(np.sum(np.sqrt(np.sum(np.asarray(u) ** 2, axis=0))[fluid]))
    _, vs = _sharded_run(cc, f0, 1, shard_axis=0)
    assert abs(vs - s_ref) / s_ref < 1e-5


def test_sharded_rejects_bc_on_shard_axis():
    spec = pad_spec(get_case("poiseuille", n=16))
    cc = compile_case(spec)
    with pytest.raises(ValueError):
        make_pallas_sharded_step(cc, lattice_mesh(), shard_axis=1)


def test_runner_mesh_pallas_backend():
    """Simulation(backend='pallas', mesh=...) — the multi-chip production
    path end-to-end through the runner (interpret mode on CPU)."""
    from lbm_tpu.engine.runner import Simulation

    case_kw = dict(n=16, max_steps=4, time_save=2)
    sim = Simulation(get_case("lid_driven_cavity", **case_kw),
                     backend="pallas", mesh=lattice_mesh())
    res = sim.run(verbose=False)
    assert res.steps == 4
    sim2 = Simulation(get_case("lid_driven_cavity", **case_kw),
                      backend="xla")
    sim2.run(verbose=False)
    np.testing.assert_allclose(
        np.asarray(sim.f_standard()), np.asarray(sim2.f_standard()),
        rtol=3e-6, atol=1e-7,
    )
    rho, u = sim.macro()
    assert rho.shape == (16, 16, 16)
