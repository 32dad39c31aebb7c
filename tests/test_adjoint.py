"""Differentiable-solver (adjoint) tests — engine/adjoint.py.

The functional step + lax.scan rollout make the whole solver
reverse-mode differentiable (no reference analogue: coronary.cu's
in-place CUDA kernels cannot be differentiated). Anchors:

  * make_step_theta with theta = the static RCR values reproduces
    make_step_wk state-for-state (the traced-parameter route changes
    no math),
  * the remat'd rollout is chunking-invariant (same forward state for
    any remat_chunk),
  * jax.grad through a multi-step rollout matches central finite
    differences (the gradient is the EXACT discrete adjoint),
  * gradient descent on log Rd moves a 4-outlet coronary's flow split
    toward a prescribed target (the FFR-CT outlet-calibration task).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.cases import get_case
from lbm_tpu.engine.adjoint import (fit_windkessel, flow_split,
                                    make_step_theta, outlet_fluxes,
                                    rollout, wk_params)
from lbm_tpu.engine.compile import compile_case, wk_init
from lbm_tpu.engine.step import initial_f, make_step_wk

_WK = (5e-4, 24000.0, 2.5e-3)  # Rp, C, Rd (lattice)


def test_step_theta_matches_static_wk():
    """theta == the compiled-in RCR values: the traced-parameter step is
    the static step (same expression tree, constants traced instead of
    folded)."""
    spec = get_case("poiseuille", n=16, windkessel=_WK)
    cc = compile_case(spec)
    step_s = jax.jit(make_step_wk(cc))
    step_t = jax.jit(make_step_theta(cc))
    theta = jnp.asarray(wk_params(cc))
    f_s = f_t = initial_f(cc)
    wk_s = wk_t = jnp.asarray(wk_init(cc.bcs))
    for t in range(30):
        f_s, _, _, wk_s = step_s(f_s, t, wk_s)
        f_t, wk_t = step_t(f_t, t, wk_t, theta)
    np.testing.assert_allclose(np.asarray(wk_t), np.asarray(wk_s),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f_t), np.asarray(f_s),
                               rtol=1e-6, atol=1e-9)


def test_rollout_remat_chunking_invariant():
    """The two-level remat scan's step indexing: any chunk split yields
    the same forward state (t0 + i must walk 0..n-1 exactly)."""
    spec = get_case("poiseuille", n=12, windkessel=_WK)
    cc = compile_case(spec)
    theta = jnp.asarray(wk_params(cc))
    f_a, wk_a = rollout(cc, theta, 60, remat_chunk=10)
    f_b, wk_b = rollout(cc, theta, 60, remat_chunk=30)
    np.testing.assert_array_equal(np.asarray(f_a), np.asarray(f_b))
    np.testing.assert_array_equal(np.asarray(wk_a), np.asarray(wk_b))
    # and matches the plain static-step evolution
    step_s = jax.jit(make_step_wk(cc))
    f, wk = initial_f(cc), jnp.asarray(wk_init(cc.bcs))
    for t in range(60):
        f, _, _, wk = step_s(f, t, wk)
    np.testing.assert_allclose(np.asarray(f_a), np.asarray(f),
                               rtol=1e-6, atol=1e-9)


def test_adjoint_gradient_matches_finite_difference():
    """d P_c(final) / d log Rd through a 60-step rollout: reverse-mode
    equals central finite differences — the exact discrete adjoint of
    the coupled LBM + windkessel system, boundary fixups and all."""
    spec = get_case("poiseuille", n=12, windkessel=_WK)
    cc = compile_case(spec)
    base = jnp.asarray(wk_params(cc))

    def loss(log_rd):
        theta = base.at[0, 2].set(jnp.exp(log_rd))
        _, wk = rollout(cc, theta, 60, remat_chunk=20)
        return wk[0]

    g = jax.jit(jax.grad(loss))
    x0 = jnp.log(base[0, 2])
    auto = float(g(x0))
    h = 0.1
    lf = jax.jit(loss)
    fd = (float(lf(x0 + h)) - float(lf(x0 - h))) / (2 * h)
    assert auto != 0.0
    np.testing.assert_allclose(auto, fd, rtol=2e-2)


def test_outlet_fluxes_match_coupling_q():
    """outlet_fluxes reads the same footprint/sign/macro the coupling's
    RCR ODE integrates: at the rollout end, one more windkessel update
    driven by outlet_fluxes' q reproduces the carried P_c'."""
    from lbm_tpu.engine.step import windkessel_update

    spec = get_case("poiseuille", n=12, windkessel=_WK)
    cc = compile_case(spec)
    theta = jnp.asarray(wk_params(cc))
    f, wk = rollout(cc, theta, 40, remat_chunk=20)
    q = outlet_fluxes(cc, f)
    step_t = jax.jit(make_step_theta(cc))
    _, wk_next = step_t(f, 40, wk, theta)
    p_pred, _ = windkessel_update(wk[0], q[0], _WK)
    np.testing.assert_allclose(float(wk_next[0]), float(p_pred),
                               rtol=1e-6)


@pytest.mark.slow
def test_fit_windkessel_moves_coronary_split_to_target():
    """The clinical calibration loop: 4 RCR outlets on the synthetic
    coronary tree, gradient descent on log Rd drives the computed flow
    split toward the measured target — the quantity the reference
    HARD-CODES as outlet speeds (coronary.cu:795-942). Asserts real
    progress (loss down >=5x, every split component closer) rather than
    exact convergence to keep the horizon CPU-cheap."""
    wk = [(1e-4, 5e3, 2e-3)] * 4
    spec = get_case("coronary", shape=(48, 24, 40), radius=5,
                    windkessel=wk)
    cc = compile_case(spec)
    theta0 = jnp.asarray(wk_params(cc))
    f0, _ = rollout(cc, theta0, 200, remat_chunk=25)
    split0 = np.asarray(flow_split(cc, f0))
    target = np.asarray([0.40, 0.30, 0.18, 0.12], np.float32)
    loss0 = float(np.sum((split0 - target) ** 2))

    theta, hist = fit_windkessel(spec, target, n_steps=200, iters=10,
                                 lr=0.35, remat_chunk=25)
    loss_end, split_end = hist[-1]
    assert loss_end < loss0 / 5, (loss0, loss_end)
    assert np.abs(split_end - target).max() < np.abs(split0 - target).max()
    # fitted resistances follow the physics: more flow demanded =>
    # lower distal resistance, so Rd ordering is the REVERSE of the
    # target-split ordering
    assert np.all(np.diff(theta[:, 2]) > 0) == np.all(
        np.diff(target) < 0)
