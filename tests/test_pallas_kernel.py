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
    spec = pad_spec(get_case("coronary", shape=(24, 20, 32), radius=4))
    assert {5, 6, 7} <= set(np.unique(spec.mask).tolist())  # sub-outlets live
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


@pytest.mark.slow
@pytest.mark.parametrize("case_name,kwargs", [
    ("lid_driven_cavity", dict(n=16)),
    ("poiseuille", dict(n=16)),
])
def test_pallas_fuse2_matches_dense(case_name, kwargs):
    """Two temporally-fused steps per kernel call (ring-2 state) must
    reproduce the dense engine bit-for-bit-ish, including the NEE
    consumer rows recomputed in VMEM between the fused steps."""
    spec = pad_spec(get_case(case_name, **kwargs), halo=2)
    cc = compile_case(spec)
    f0 = initial_f(cc)
    nsteps = 2  # one fused call exercises both passes + the NEE rows
    f_ref = _dense_run(cc, f0, nsteps)
    step = jax.jit(make_pallas_step(cc, interpret=True, ring=2, fuse=2))
    p = pack_state(f0, jnp.asarray(np.asarray(cc.spec.mask)))
    for t in range(0, nsteps, 2):
        p, vs = step(p, jnp.int32(t))
    f = np.asarray(unpack_state(p))
    interior = (slice(None), slice(2, -2), slice(2, -2), slice(None))
    np.testing.assert_allclose(
        f[interior], f_ref[interior], rtol=3e-6, atol=1e-7
    )
    assert vs.shape == (2,) and bool(jnp.isfinite(vs).all())


@pytest.mark.slow
def test_pallas_fuse2_velsum_per_step():
    """The (vs1, vs2) pair must equal the dense per-step fluid |u| sums.
    (slow: the runner's odd-chunk test already pins the fuse2 residual
    SERIES against the xla backend per save, which fails if either vs
    of the pair is wrong — this test localizes the failure.)"""
    spec = pad_spec(get_case("lid_driven_cavity", n=16), halo=2)
    cc = compile_case(spec)
    f0 = initial_f(cc)
    step_d = make_step(cc)
    fluid = np.asarray(cc.fluid)
    refs = []
    f = f0
    for t in range(2):
        f, rho, u = step_d(f, jnp.int32(t))
        refs.append(float(
            np.sum(np.sqrt(np.sum(np.asarray(u) ** 2, axis=0))[fluid])
        ))
    step = make_pallas_step(cc, interpret=True, ring=2, fuse=2)
    p = pack_state(f0, jnp.asarray(np.asarray(cc.spec.mask)))
    _, vs = step(p, jnp.int32(0))
    vs = np.asarray(vs)
    for got, want in zip(vs, refs):
        assert abs(got - want) / want < 1e-5, (vs, refs)


@pytest.mark.slow
@pytest.mark.parametrize("fuse", [1, 2])
def test_pallas_pure_split_matches_dense(fuse):
    """Pure/mixed tile split (classify_tiles): interior tiles take the
    mask-free fast path (z-lane iota wall tests, no mask loads); the
    result must equal the dense engine on a grid large enough that pure
    tiles actually exist (n=24 with 4x8 tiles -> interior is pure)."""
    from lbm_tpu.kernels.collide_stream import classify_tiles

    ring = fuse
    spec = pad_spec(get_case("lid_driven_cavity", n=24), halo=ring)
    cc = compile_case(spec)
    order, n_pure, zspan = classify_tiles(
        np.asarray(spec.mask), 4, 8, ring=ring, fuse=fuse)
    assert 0 < n_pure < len(order)   # both paths exercised
    assert zspan == (2, 21)
    f0 = initial_f(cc)
    nsteps = 2
    f_ref = _dense_run(cc, f0, nsteps)
    step = jax.jit(make_pallas_step(cc, interpret=True, ring=ring,
                                    fuse=fuse, tx=4, ty=8,
                                    pure_split=True))
    p = pack_state(f0, jnp.asarray(np.asarray(cc.spec.mask)))
    for t in range(0, nsteps, fuse):
        p, vs = step(p, jnp.int32(t))
    f = np.asarray(unpack_state(p))
    interior = (slice(None), slice(ring, -ring), slice(ring, -ring),
                slice(None))
    np.testing.assert_allclose(
        f[interior], f_ref[interior], rtol=3e-6, atol=1e-7
    )


def test_classify_tiles_fast_smoke():
    """Kernel-free classifier coverage for the fast suite (the full
    pure-split kernel matrix is slow-marked): tile ordering, pure
    count, and zspan invariants on the lid mask at both fuse levels."""
    from lbm_tpu.geometry.mask import CellType
    from lbm_tpu.kernels.collide_stream import classify_tiles

    for fuse in (1, 2):
        ring = fuse
        spec = pad_spec(get_case("lid_driven_cavity", n=24), halo=ring)
        m = np.asarray(spec.mask)
        gx, gy = 24 // 4, 24 // 8
        order, n_pure, zspan = classify_tiles(m, 4, 8, ring=ring,
                                              fuse=fuse)
        # a permutation of the row-major tile grid, pure tiles first
        assert sorted(order.tolist()) == list(range(gx * gy))
        assert 0 < n_pure < len(order)
        assert zspan == (2, 21)
        # every pure tile's input region must be all-standard: no NEE
        # plane (the lid's moving wall is a y-plane BC at y=22) and a
        # wall-capped contiguous fluid column everywhere
        skirt = fuse
        for tid in order[:n_pure].tolist():
            i, j = tid // gy, tid % gy
            blk = m[ring - skirt + i * 4:ring + skirt + (i + 1) * 4,
                    ring - skirt + j * 8:ring + skirt + (j + 1) * 8]
            col = blk[:, :, zspan[0]:zspan[1] + 1]
            assert (col == int(CellType.FLUID)).all()
            assert (blk[:, :, zspan[0] - 1] == int(CellType.WALL)).all()
            assert (blk[:, :, zspan[1] + 1] == int(CellType.WALL)).all()
        # an all-mixed geometry (vessel tree) classifies with n_pure == 0
        spec_t = pad_spec(get_case("coronary", shape=(24, 20, 32),
                                   radius=4))
        order_t, n_pure_t, _ = classify_tiles(
            np.asarray(spec_t.mask), 4, 4, ring=1, fuse=1)
        assert n_pure_t == 0
        assert sorted(order_t.tolist()) == list(range(6 * 5))


def test_packed_macro_and_unpack_lowmem():
    """The 512^3 output primitives against their dense equivalents:
    packed_macro (streamed moments, never the dense unpack) and
    unpack_state_lowmem (chunked row extraction) on a stepped state."""
    from lbm_tpu.kernels.collide_stream import (
        packed_macro,
        unpack_state_lowmem,
    )
    from lbm_tpu.engine.step import macro_fields

    spec0 = get_case("coronary", shape=(24, 20, 32), radius=4)
    spec = pad_spec(spec0)
    cc = compile_case(spec)
    f0 = initial_f(cc)
    f_ref = _dense_run(cc, f0, 2)
    step = jax.jit(make_pallas_step(cc, interpret=True, in_place=True))
    p = pack_state(f0, jnp.asarray(np.asarray(cc.spec.mask)))
    for t in range(2):
        p, _ = step(p, jnp.int32(t))
    got = unpack_state_lowmem(p, spec0, ring=1, interpret=True)
    want = np.asarray(unpack_state(p))[:, 1:-1, 1:-1, :]
    np.testing.assert_array_equal(got, want)
    rho_m, u_m = packed_macro(p, ring=1, interpret=True)
    rho_ref, u_ref = macro_fields(cc, jnp.asarray(f_ref))
    # interior, fluid convention: non-fluid cells carry feq moments
    # instead of the init override — equal up to fp32 rounding
    np.testing.assert_allclose(
        np.asarray(rho_m), np.asarray(rho_ref)[1:-1, 1:-1, :],
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(u_m), np.asarray(u_ref)[:, 1:-1, 1:-1, :],
        rtol=1e-5, atol=1e-6)


def test_packed_initial_lowmem_matches_standard():
    """The channel-streamed large-grid init (host feq, donated buffer
    updates) must reproduce pack_state(initial_f(cc)) exactly — same
    fp32 expression, different materialization order."""
    from lbm_tpu.kernels.collide_stream import packed_initial_lowmem

    spec = pad_spec(get_case("poiseuille", n=12), halo=2)
    cc = compile_case(spec)
    want = np.asarray(pack_state(
        initial_f(cc), jnp.asarray(np.asarray(spec.mask))))
    got = np.asarray(packed_initial_lowmem(spec))
    np.testing.assert_array_equal(got, want)
    # sparse-velocity fast path (device W_i*rho fill + window patch)
    spec = pad_spec(get_case("coronary", shape=(24, 20, 32), radius=4))
    cc = compile_case(spec)
    want = np.asarray(pack_state(
        initial_f(cc), jnp.asarray(np.asarray(spec.mask))))
    got = np.asarray(packed_initial_lowmem(spec))
    np.testing.assert_array_equal(got, want)


def test_pallas_tile_skip_matches_dense():
    """Block-sparse tile skip on the coronary tree (the TPU-native
    answer to the reference's sparse compaction, Poiseulle.cu:257-271):
    all-dead tiles are never touched — the in-place aliased output keeps
    them valid — and live-tile physics is unchanged."""
    from lbm_tpu.kernels.collide_stream import live_tile_ids

    spec = pad_spec(get_case("coronary", shape=(24, 32, 32), radius=4))
    cc = compile_case(spec)
    tids = live_tile_ids(spec.mask, 4, 8, ring=1)
    gx, gy = (spec.shape[0] - 2) // 4, (spec.shape[1] - 2) // 8
    # strictly fewer live tiles than the grid: dead tiles REALLY skipped
    # (this shape has 12 of 24 live; the r2-era 32x24x40 had 24/24).
    assert 0 < len(tids) < gx * gy
    f0 = initial_f(cc)
    nsteps = 2
    f_ref = _dense_run(cc, f0, nsteps)
    f, _ = _pallas_run(cc, f0, nsteps, tile_skip=True, tx=4, ty=8)
    interior = (slice(None), slice(1, -1), slice(1, -1), slice(None))
    np.testing.assert_allclose(
        f[interior], f_ref[interior], rtol=3e-6, atol=1e-7
    )


@pytest.mark.slow
def test_pallas_fuse2_skip_series_curved_vessel():
    """fuse2 + tile skip + a time-SERIES NEE inlet together: the fused
    pair must index the phi* series at t AND t+1 (curved vessel's
    pulsatile inlet), with the in-place aliased live-tile list."""
    spec = pad_spec(get_case("curved_vessel", n=24, nphase=4,
                             period_steps=8), halo=2)
    cc = compile_case(spec)
    f0 = initial_f(cc)
    nsteps = 4
    f_ref = _dense_run(cc, f0, nsteps)
    step = jax.jit(make_pallas_step(cc, interpret=True, ring=2, fuse=2,
                                    tile_skip=True))
    p = pack_state(f0, jnp.asarray(np.asarray(cc.spec.mask)))
    for t in range(0, nsteps, 2):
        p, vs = step(p, jnp.int32(t))
    f = np.asarray(unpack_state(p))
    interior = (slice(None), slice(2, -2), slice(2, -2), slice(None))
    np.testing.assert_allclose(
        f[interior], f_ref[interior], rtol=3e-6, atol=1e-7
    )


def test_runner_fuse2_odd_chunk():
    """An odd chunk length runs (n//2) fused pairs + one single step on
    the ring-2 state; residual series must match the xla backend's."""
    from lbm_tpu.engine.runner import Simulation

    kw = dict(n=16, max_steps=3, time_save=3)
    sim = Simulation(get_case("lid_driven_cavity", **kw), backend="pallas",
                     fuse=2)
    assert sim._fuse2 and sim._ring == 2
    res = sim.run(verbose=False)
    assert res.steps == 3
    sim2 = Simulation(get_case("lid_driven_cavity", **kw), backend="xla")
    res2 = sim2.run(verbose=False)
    np.testing.assert_allclose(
        np.asarray(sim.f_standard()), np.asarray(sim2.f_standard()),
        rtol=3e-6, atol=1e-7,
    )
    assert abs(res.residual - res2.residual) < 1e-6


def test_pallas_backend_in_runner_interpret():
    """Simulation(backend='pallas') off-TPU runs the kernel in interpret
    mode through the full runner (padding, packing, residuals, macro) and
    matches the xla backend."""
    from lbm_tpu.engine.runner import Simulation

    kw = dict(n=16, max_steps=4, time_save=2)
    sim = Simulation(get_case("lid_driven_cavity", **kw), backend="pallas")
    res = sim.run(verbose=False)
    assert res.steps == 4
    sim2 = Simulation(get_case("lid_driven_cavity", **kw), backend="xla")
    res2 = sim2.run(verbose=False)
    np.testing.assert_allclose(
        np.asarray(sim.f_standard()), np.asarray(sim2.f_standard()),
        rtol=3e-6, atol=1e-7,
    )
    assert abs(res.residual - res2.residual) < 1e-6
    rho, u = sim.macro()
    assert rho.shape == (16, 16, 16)


def test_pallas_bf16_storage():
    """bf16 pdf STORAGE with fp32 in-kernel compute (VERDICT r2 next-#4):
    tracks the f32 dense engine within bf16 rounding on the single-step
    kernel + z-plane fixup path (coronary sub-outlets). The fuse2 shape
    is covered by the slow variant below."""
    spec = pad_spec(get_case("coronary", shape=(24, 20, 32), radius=4))
    cc = compile_case(spec)
    f0 = initial_f(cc)
    f_ref = _dense_run(cc, f0, 2)
    step = jax.jit(make_pallas_step(cc, interpret=True))
    p = pack_state(f0, jnp.asarray(np.asarray(cc.spec.mask)),
                   dtype=jnp.bfloat16)
    assert p.dtype == jnp.bfloat16
    for t in range(2):
        p, vs = step(p, jnp.int32(t))
    f = np.asarray(unpack_state(p))
    interior = (slice(None), slice(1, -1), slice(1, -1), slice(None))
    rel = (np.abs(f[interior] - f_ref[interior]).max()
           / np.abs(f_ref[interior]).max())
    assert rel < 2e-2, rel


@pytest.mark.slow
def test_pallas_bf16_storage_fuse2():
    """bf16 storage through fuse2 (fp32 mid tile: one narrowing per two
    steps) tracks the f32 dense engine within bf16 rounding."""
    spec = pad_spec(get_case("lid_driven_cavity", n=16), halo=2)
    cc = compile_case(spec)
    f0 = initial_f(cc)
    f_ref = _dense_run(cc, f0, 2)
    step = jax.jit(make_pallas_step(cc, interpret=True, ring=2, fuse=2))
    p = pack_state(f0, jnp.asarray(np.asarray(cc.spec.mask)),
                   dtype=jnp.bfloat16)
    for t in range(0, 2, 2):
        p, vs = step(p, jnp.int32(t))
    f = np.asarray(unpack_state(p))
    interior = (slice(None), slice(2, -2), slice(2, -2), slice(None))
    rel = (np.abs(f[interior] - f_ref[interior]).max()
           / np.abs(f_ref[interior]).max())
    assert rel < 2e-2, rel


@pytest.mark.slow
def test_pallas_bf16_mass_conservation():
    """Closed static box in bf16 storage: per-step mass error is rounding
    only — drift over 30 steps stays at the bf16 epsilon scale, not
    accumulating systematically."""
    from lbm_tpu.engine.runner import Simulation

    case = get_case("lid_driven_cavity", n=16, u_lid_phys=0.0,
                    max_steps=16, time_save=16)
    sim = Simulation(case, backend="pallas", store_dtype="bf16")
    fluid = np.asarray(sim.cc.fluid)[1:-1, 1:-1, :]
    m0 = float(np.asarray(sim.f_standard()).sum(axis=0)
               [np.asarray(case.mask) == 4].sum())
    sim.run(verbose=False)
    m1 = float(np.asarray(sim.f_standard()).sum(axis=0)
               [np.asarray(case.mask) == 4].sum())
    assert abs(m1 - m0) / m0 < 5e-3
