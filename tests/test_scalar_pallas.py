"""Pallas D3Q7 scalar kernel vs the dense engine
(kernels/scalar_stream.ScalarTransportPallas vs
engine/scalar.ScalarTransport).

The kernel path must agree with the dense pass field-for-field on
every structural feature: pure bounce-back boxes (no BCs), axis-0/1
plane BCs with static and time-gated inlet concentrations (poiseuille
flows along y), axis-2 multi-outlet trees with source/mean-age mode
(coronary), div_fix on and off, and the block-sparse tile-skip walk
with the multi-tile seam path. Interpret mode on the CPU backend
(tests/conftest.py), same contract as the flow-kernel equivalence
suite (tests/test_pallas_kernel.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.cases import get_case
from lbm_tpu.core.units import UnitSystem
from lbm_tpu.engine.runner import Simulation
from lbm_tpu.engine.scalar import ScalarTransport
from lbm_tpu.engine.spec import CaseSpec
from lbm_tpu.geometry.mask import CellType
from lbm_tpu.kernels.scalar_stream import ScalarTransportPallas


def _closed_box(n: int) -> CaseSpec:
    mask = np.full((n, n, n), int(CellType.WALL), np.int32)
    mask[1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    return CaseSpec(name="box", shape=(n, n, n), tau=0.6,
                    units=UnitSystem(CH=1e-4, C_U=1.0), mask=mask,
                    boundaries=[])


def _blob(n: int) -> np.ndarray:
    x = np.arange(n) - (n - 1) / 2.0
    r2 = (x[:, None, None] ** 2 + x[None, :, None] ** 2
          + x[None, None, :] ** 2)
    return np.exp(-r2 / (2 * 2.0 ** 2)).astype(np.float32)


def _assert_match(st_d, st_p, atol=2e-6):
    cd = np.asarray(st_d.concentration())
    cp = np.asarray(st_p.concentration())
    assert cd.shape == cp.shape
    np.testing.assert_allclose(cp, cd, atol=atol)
    np.testing.assert_allclose(st_p.total(), st_d.total(),
                               rtol=1e-5, atol=1e-6)


def test_closed_box_matches_dense():
    """Bounce-back diffusion + swirl advection, no plane BCs: the
    kernel path (single whole-grid interpret tile) matches the dense
    pass on the whole box and conserves the total."""
    n = 12
    spec = _closed_box(n)
    fluid = np.asarray(spec.mask) == CellType.FLUID
    rng = np.random.default_rng(0)
    u = (0.04 * rng.standard_normal((3, n, n, n))).astype(np.float32)
    u[:, ~fluid] = 0.0
    c0 = _blob(n)
    c0[~fluid] = 0.0
    # div_fix OFF: the compensation source intentionally trades exact
    # conservation for the advective form, and this random u is NOT
    # divergence-free — conservation is only exact without it
    st_d = ScalarTransport(spec, u, D=0.02, c0=c0, div_fix=False)
    st_p = ScalarTransportPallas(spec, u, D=0.02, c0=c0,
                                 div_fix=False, interpret=True)
    tot0 = st_d.total()
    st_d.run(8)
    st_p.run(8)
    _assert_match(st_d, st_p)
    np.testing.assert_allclose(st_p.total(), tot0, rtol=1e-5)


def _frozen_pipe(n=16, flow_steps=200):
    spec = get_case("poiseuille", n=n)
    sim = Simulation(spec, backend="xla")
    sim.run(max_steps=flow_steps, time_save=flow_steps, verbose=False)
    _, u = sim.macro()
    return spec, jnp.asarray(u)


def test_pipe_washin_matches_dense():
    """Axis-0/1 plane BCs (poiseuille flows along y): static inlet
    concentration + zero-gradient outlet, div_fix ON — field AND
    per-step record series agree."""
    spec, u = _frozen_pipe()
    st_d = ScalarTransport(spec, u, D=0.02, inlet_c={0: 1.0})
    st_p = ScalarTransportPallas(spec, u, D=0.02, inlet_c={0: 1.0},
                                 interpret=True)
    sd = st_d.run(40, record=[0, 1])
    sp = st_p.run(40, record=[0, 1])
    np.testing.assert_allclose(sp, sd, atol=2e-6)
    _assert_match(st_d, st_p, atol=5e-6)


def test_pipe_bolus_gate_matches_dense():
    """Traced time-gated inlet (callable c_fn) with div_fix OFF: the
    gate phase must line up step-for-step across backends."""
    spec, u = _frozen_pipe()
    gate = lambda t: jnp.where(t < 10, 1.0, 0.0)  # noqa: E731
    st_d = ScalarTransport(spec, u, D=0.03, inlet_c={0: gate},
                           div_fix=False)
    st_p = ScalarTransportPallas(spec, u, D=0.03, inlet_c={0: gate},
                                 div_fix=False, interpret=True)
    sd = st_d.run(30, record=[1])
    sp = st_p.run(30, record=[1])
    np.testing.assert_allclose(sp, sd, atol=2e-6)
    _assert_match(st_d, st_p, atol=5e-6)


def test_coronary_source_and_tiles_match_dense():
    """Axis-2 multi-outlet tree in mean-age mode (source=1, zero inlet
    age) with an EXPLICIT multi-tile grid + block-sparse tile skip —
    exercises the z-plane slab fixups, the live-tile walk with the
    input-aliased output, and the pre-step seam path."""
    spec = get_case("coronary", shape=(24, 20, 32), radius=4)
    sim = Simulation(spec, backend="xla")
    sim.run(max_steps=300, time_save=300, verbose=False)
    _, u = sim.macro()
    outlets = list(range(1, len(spec.boundaries)))
    st_d = ScalarTransport(spec, u, D=0.02, inlet_c={0: 0.0},
                           source=1.0)
    st_p = ScalarTransportPallas(spec, u, D=0.02, inlet_c={0: 0.0},
                                 source=1.0, interpret=True,
                                 tx=4, ty=4, tile_skip=True)
    assert st_p.tids is not None, "tile skip must engage on the tree"
    sd = st_d.run(25, record=outlets)
    sp = st_p.run(25, record=outlets)
    np.testing.assert_allclose(sp, sd, atol=2e-6)
    # age values reach O(25) after 25 source steps: the atol must
    # absorb fp op-order noise at that magnitude (measured 5e-7 rel)
    _assert_match(st_d, st_p, atol=5e-5)


def test_coronary_bolus_washout_matches_dense():
    """Bolus washout on the tree (the demo_washout composition):
    gated inlet, div_fix ON, default single-tile interpret grid."""
    spec = get_case("coronary", shape=(24, 20, 32), radius=4)
    sim = Simulation(spec, backend="xla")
    sim.run(max_steps=300, time_save=300, verbose=False)
    _, u = sim.macro()
    gate = lambda t: jnp.where(t < 15, 1.0, 0.0)  # noqa: E731
    outlets = list(range(1, len(spec.boundaries)))
    st_d = ScalarTransport(spec, u, D=0.02, inlet_c={0: gate})
    st_p = ScalarTransportPallas(spec, u, D=0.02, inlet_c={0: gate},
                                 interpret=True)
    sd = st_d.run(40, record=outlets)
    sp = st_p.run(40, record=outlets)
    np.testing.assert_allclose(sp, sd, atol=2e-6)
    _assert_match(st_d, st_p, atol=1e-5)


def test_validation():
    spec = _closed_box(8)
    u = np.zeros((3, 8, 8, 8), np.float32)
    with pytest.raises(AssertionError):
        ScalarTransportPallas(spec, u, interpret=True)  # no D/tau_g
    with pytest.raises(AssertionError):
        ScalarTransportPallas(spec, u, D=0.02, inlet_c={3: 1.0},
                              interpret=True)


@pytest.mark.multichip
def test_scalar_pallas_sharded_matches_single_device():
    """mesh= on the SCALAR KERNEL (r5, VERDICT r4 next-#8): blocked
    per-shard g with ppermuted halo planes written into the local
    arrays, per-shard tile lists, union-window slab fixups with
    interior-owned record sums — multi-step fields AND washout series
    vs the single-chip kernel on the 8-device CPU mesh."""
    import jax

    from lbm_tpu.parallel.mesh import lattice_mesh

    assert len(jax.devices()) == 8
    spec = get_case("poiseuille", n=16)
    sim = Simulation(spec, backend="xla")
    sim.run(max_steps=200, time_save=100, verbose=False)
    u = np.asarray(sim.macro()[1])
    kw = dict(D=0.03, inlet_c={0: 1.0}, interpret=True)
    st1 = ScalarTransportPallas(spec, u, **kw)
    stm = ScalarTransportPallas(spec, u, mesh=lattice_mesh(), **kw)
    s1 = st1.run(48, record=[0, 1])
    sm = stm.run(48, record=[0, 1])
    np.testing.assert_allclose(sm, s1, rtol=2e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(stm.concentration()), np.asarray(st1.concentration()),
        rtol=2e-6, atol=1e-8)
    assert stm.total() == pytest.approx(st1.total(), rel=1e-6)


@pytest.mark.multichip
def test_scalar_pallas_sharded_coronary_bolus():
    """Sharded kernel on the branched tree (y shards, x-plane inlet +
    z-plane sub-outlet fixups with union windows + tile skip): bolus
    series and fields match single-chip through several shard-boundary
    crossings."""
    import jax
    import jax.numpy as jnp

    from lbm_tpu.parallel.mesh import lattice_mesh

    assert len(jax.devices()) == 8
    spec = get_case("coronary", shape=(48, 24, 40), radius=5)
    sim = Simulation(spec, backend="xla")
    sim.run(max_steps=200, time_save=100, verbose=False)
    u = np.asarray(sim.macro()[1])
    bolus = {0: lambda t: jnp.where(t < 16, 1.0, 0.0)}
    kw = dict(D=0.03, inlet_c=bolus, interpret=True)
    st1 = ScalarTransportPallas(spec, u, **kw)
    stm = ScalarTransportPallas(spec, u, mesh=lattice_mesh(),
                                shard_axis=1, **kw)
    s1 = st1.run(40, record=[0, 1, 2])
    sm = stm.run(40, record=[0, 1, 2])
    np.testing.assert_allclose(sm, s1, rtol=2e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(stm.concentration()), np.asarray(st1.concentration()),
        rtol=2e-6, atol=1e-8)
