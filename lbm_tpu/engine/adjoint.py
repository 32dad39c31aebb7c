"""Differentiable (adjoint) solver route: jax.grad THROUGH the rollout.

The TPU-first functional design pays off here in a way no CUDA port
could: the fused step (engine/step.py) is a pure function and the
rollout is a lax.scan, so reverse-mode AD gives the exact discrete
adjoint of the full solver — boundary coupling, collision, windkessel
ODE and all — with zero extra solver code. The reference
(in-place global-memory CUDA kernels, e.g. coronary.cu's
stream/collide/boundary writes) has no differentiable route at all;
adjoint LBM otherwise means hand-deriving and hand-coding the reverse
kernels.

The clinical target is outlet-termination calibration: FFR-CT-class
pipelines must tune each truncated outlet's distal resistance so the
computed flow split (or outlet pressure) matches patient measurement —
e.g. the branch-flow allocation the reference HARD-CODES as outlet
speeds (coronary.cu:795-942) becomes a measured target here. That
tuning is normally an outer fixed-point/secant loop around full
simulations; with the adjoint it is gradient descent with exact
sensitivities, one forward+backward per iterate.

Mechanics
---------
- `make_step_theta(cc)` is `make_step_wk` with the per-outlet
  (Rp, C, Rd) triples promoted from static trace-time constants to a
  traced (n_wk, 3) argument `theta` (engine/step.windkessel_update
  accepts either), so gradients flow through the RCR values into the
  outlet-plane rho* and from there through the whole flow field.
- `rollout` scans the step with two-level rematerialization: an outer
  scan over n/chunk blocks whose body is `jax.checkpoint`-wrapped and
  itself scans `chunk` steps. Reverse-mode peak memory is then
  ~(n/chunk + chunk) copies of the (19, X, Y, Z) state instead of n —
  chunk ~ sqrt(n) makes 10^3-step rollouts differentiable at coronary
  sizes (ADJOINT memory example: 64^2x80 f32 ~ 25 MB/state; a
  1600-step rollout at chunk=40 peaks near 80 states ~ 2 GB, vs 40 GB
  unremat'd).
- Gradients are exact for the discrete scheme (not a continuous-adjoint
  approximation): tests/test_adjoint.py checks them against central
  finite differences, and the single-outlet fit recovers the
  analytically-known optimum Rd* = P_target/Q - Rp of the steady
  relation P = Q (Rp + Rd).

Differentiating toward a STEADY state: transients decay, so the loss
needs the rollout long enough to reach its quasi-steady window; the
gradient then approximates the steady-state sensitivity (truncated
backprop-through-time). `fit_windkessel` exposes `n_steps` for that
horizon and optimizes log Rd (positivity built in) with optax.adam.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lbm_tpu.engine.compile import CompiledCase, compile_case, wk_init
from lbm_tpu.engine.step import (_plane_slicer, _safe_u, _step_tail,
                                 has_windkessel, initial_f,
                                 moving_bb_terms, pulled_state_wk)


def wk_params(cc: CompiledCase) -> np.ndarray:
    """The case's static RCR parameters as the (n_wk, 3) theta array
    (BC order, same as compile.wk_init) — the natural starting point
    for calibration."""
    rows = [bc.windkessel for bc in cc.bcs if bc.windkessel is not None]
    assert rows, "case has no windkessel outlets"
    return np.asarray(rows, np.float32)


def make_step_theta(cc: CompiledCase) -> Callable:
    """The fused windkessel step with TRACED RCR parameters:
    (f, t, wk, theta) -> (f', wk') where theta is (n_wk, 3) rows of
    (Rp, C, Rd) in lattice units. Identical math to make_step_wk when
    theta equals the static per-BC values (tested to fp32 exactness)."""
    assert has_windkessel(cc.bcs), (
        "make_step_theta needs windkessel outlets (PlaneBC.windkessel)"
    )
    bb = (None if cc.wall_velocity is None
          else moving_bb_terms(cc.wall_velocity))

    def step(f, t, wk, theta):
        pulled, wk_new = pulled_state_wk(cc, f, t, wk, bb, theta=theta)
        f_new, _, _ = _step_tail(cc, f, pulled)
        return f_new, wk_new

    return step


def outlet_fluxes(cc: CompiledCase, f) -> jnp.ndarray:
    """(n_wk,) outward volume fluxes through the coupled outlets'
    consumer planes — the same footprint, macro convention (incl. the
    Guo half-force shift) and outward sign the coupling itself reads,
    so a loss built on these matches the Q driving the RCR ODE."""
    qs = []
    for bc in cc.bcs:
        if bc.windkessel is None:
            continue
        sl = _plane_slicer(bc.axis, bc.consumer_coord)
        _, u = _safe_u(f[(slice(None),) + sl], cc.force)
        qs.append(np.float32(bc.flow_sign)
                  * jnp.sum(bc.flow_weight * u[bc.axis]))
    return jnp.stack(qs)


def flow_split(cc: CompiledCase, f) -> jnp.ndarray:
    """Per-outlet flux fractions q_i / sum(q) — the calibration target
    when the inlet pins the total flow (coronary: velocity inlet + n
    RCR outlets, so only the SPLIT responds to the resistances)."""
    q = outlet_fluxes(cc, f)
    return q / jnp.sum(q)


def rollout(cc: CompiledCase, theta, n_steps: int, f0=None, wk0=None,
            remat_chunk: int = 25):
    """Differentiable n_steps rollout -> (f_final, wk_final).

    theta: (n_wk, 3) traced RCR parameters. remat_chunk: inner
    jax.checkpoint block length (must divide n_steps); reverse-mode
    peak memory ~ (n_steps/remat_chunk + remat_chunk) states."""
    step = make_step_theta(cc)
    if f0 is None:
        f0 = initial_f(cc)
    if wk0 is None:
        wk0 = jnp.asarray(wk_init(cc.bcs))
    n_outer, rem = divmod(n_steps, remat_chunk)
    assert rem == 0, (
        f"remat_chunk={remat_chunk} must divide n_steps={n_steps}")

    @jax.checkpoint
    def chunk(carry, t0):
        def body(c, i):
            f, wk = c
            return step(f, t0 + i, wk, theta), None

        c, _ = jax.lax.scan(body, carry, jnp.arange(remat_chunk,
                                                    dtype=jnp.int32))
        return c, None

    t0s = (jnp.arange(n_outer, dtype=jnp.int32) * remat_chunk)
    (f, wk), _ = jax.lax.scan(chunk, (f0, wk0), t0s)
    return f, wk


def fit_windkessel(spec, target_split, n_steps: int = 800,
                   iters: int = 30, lr: float = 0.25,
                   remat_chunk: int = 25,
                   theta0: Optional[np.ndarray] = None,
                   verbose: bool = False):
    """Calibrate the distal resistances: gradient-descend log Rd of
    every RCR outlet until the rollout's flow split matches
    `target_split` (n_wk,). Rp and C stay at their case values (they
    shape transients, not the steady split). Returns
    (theta_fitted (n_wk,3) np, history list of (loss, split) per
    iterate). Loss = sum((split - target)^2) at the rollout's end.
    """
    import optax

    cc = compile_case(spec)
    th0 = wk_params(cc) if theta0 is None else np.asarray(theta0,
                                                          np.float32)
    target = jnp.asarray(target_split, jnp.float32)
    base = jnp.asarray(th0)

    def loss_fn(log_rd):
        theta = base.at[:, 2].set(jnp.exp(log_rd))
        f, _ = rollout(cc, theta, n_steps, remat_chunk=remat_chunk)
        split = flow_split(cc, f)
        return jnp.sum((split - target) ** 2), split

    vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    opt = optax.adam(lr)
    log_rd = jnp.log(jnp.asarray(th0[:, 2]))
    state = opt.init(log_rd)
    history = []
    best = (np.inf, log_rd)
    for it in range(iters):
        (loss, split), g = vg(log_rd)
        if float(loss) < best[0]:
            best = (float(loss), log_rd)
        upd, state = opt.update(g, state)
        log_rd = optax.apply_updates(log_rd, upd)
        history.append((float(loss), np.asarray(split)))
        if verbose:
            print(f"  iter {it:3d} loss {float(loss):.3e} split "
                  + " ".join(f"{s:.4f}" for s in np.asarray(split)))
    # return the BEST iterate, not the last — adam at a fixed lr orbits
    # the optimum once the loss is small (measured on chip: loss
    # 1.1e-2 -> 5.4e-4 by iter 6, then 1e-3-class oscillation)
    theta = np.array(th0)
    theta[:, 2] = np.exp(np.asarray(best[1]))
    return theta, history


def transport_rollout(st, tau_g, n_steps: int, record,
                      remat_chunk: int = 25, g0=None):
    """Differentiable frozen-field transport rollout with TRACED
    relaxation time (the non-RCR parameter family, VERDICT r4 next-#9):
    advance a dense engine/scalar.ScalarTransport's state n_steps with
    tau_g a traced scalar and return the (n_steps, len(record))
    consumer-plane concentration series — the observable a measured
    washout curve provides. Same remat-chunked reverse-mode structure
    as `rollout`. The instance's own tau_g/omega are ignored; div_fix's
    compensation field (built once from the frozen u) is
    tau_g-independent and stays static."""
    from lbm_tpu.engine.scalar import _transport_pass

    tau_g = jnp.asarray(tau_g, jnp.float32)
    omega = 1.0 - 1.0 / tau_g
    fields = st.fields
    rec = [(st._bcs[k][1], st._bcs[k][2]) for k in record]
    denom = [jnp.float32(jnp.sum(v)) for _, v in rec]
    if g0 is None:
        g0 = st.g
    n_outer, rem = divmod(n_steps, remat_chunk)
    assert rem == 0, (
        f"remat_chunk={remat_chunk} must divide n_steps={n_steps}")

    @jax.checkpoint
    def chunk(g, t0):
        def body(g, i):
            phi, nbr_block, div_comp, fluid, dirichlet = fields
            g, c = _transport_pass(g, t0 + i, phi, nbr_block, st._bcs,
                                   omega, tau_g, div_comp, st.source,
                                   fluid, dirichlet)
            ys = jnp.stack(
                [jnp.sum(jnp.where(v, c[sl], 0.0)) / dn
                 for (sl, v), dn in zip(rec, denom)])
            return g, ys

        return jax.lax.scan(body, g, jnp.arange(remat_chunk,
                                                dtype=jnp.int32))

    t0s = (jnp.arange(n_outer, dtype=jnp.int32) * remat_chunk)

    def outer(g, t0):
        g, ys = chunk(g, t0)
        return g, ys

    g, ys = jax.lax.scan(outer, g0, t0s)
    return ys.reshape(n_steps, len(record))


def fit_diffusivity(st, observed, record, n_steps: Optional[int] = None,
                    iters: int = 40, lr: float = 0.1,
                    D0: Optional[float] = None, remat_chunk: int = 25,
                    verbose: bool = False):
    """Recover the lattice diffusivity from a measured washout curve —
    the natural inverse problem of the transport machinery: gradient-
    descend log(tau_g - 1/2) (= log 4D, positivity built in) until the
    rollout's consumer-plane series matches `observed`
    ((n_steps, len(record)) — e.g. a clinical contrast time-density
    curve). Returns (D_fitted, history of (loss, D) per iterate).
    FD-validated gradient: tests/test_adjoint.py."""
    import optax

    from lbm_tpu.engine.scalar import tau_g_of

    observed = jnp.asarray(observed, jnp.float32)
    if n_steps is None:
        n_steps = int(observed.shape[0])
    x = jnp.log(jnp.float32(
        tau_g_of(D0) - 0.5 if D0 is not None else st.tau_g - 0.5))

    def loss_fn(x):
        series = transport_rollout(st, 0.5 + jnp.exp(x), n_steps,
                                   record, remat_chunk=remat_chunk)
        return jnp.mean((series - observed) ** 2)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    opt = optax.adam(lr)
    state = opt.init(x)
    history = []
    best = (np.inf, x)
    for it in range(iters):
        loss, g = vg(x)
        if float(loss) < best[0]:
            best = (float(loss), x)
        upd, state = opt.update(g, state)
        x = optax.apply_updates(x, upd)
        d_it = float(np.exp(np.asarray(x))) / 4.0
        history.append((float(loss), d_it))
        if verbose:
            print(f"  iter {it:3d} loss {float(loss):.3e} "
                  f"D {d_it:.5f}")
    d_fit = float(np.exp(np.asarray(best[1]))) / 4.0
    return d_fit, history


__all__ = ["make_step_theta", "outlet_fluxes", "flow_split", "rollout",
           "fit_windkessel", "wk_params", "transport_rollout",
           "fit_diffusivity"]
