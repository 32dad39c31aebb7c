"""CoupledTransportPallas: kernel-pace time-resolved coupled transport
(VERDICT r4 next-#1) vs the dense engine/scalar.CoupledTransport.

The dense coupled route advects the scalar in each step's in-step Guo
velocity; the kernel route rebuilds u in-kernel from the post-collision
flow moments (equal in exact arithmetic by collision invariance —
kernels/scalar_stream._subtile7f), so comparisons are rtol-based like
every other cross-backend equivalence in this suite. div_fix is OFF on
both sides (the coupled kernel contract).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lbm_tpu.cases import get_case
from lbm_tpu.engine.scalar import CoupledTransport
from lbm_tpu.kernels.scalar_stream import CoupledTransportPallas

_WK = (5e-4, 24000.0, 2.5e-3)


def _compare(spec, n_steps, rtol, inlet_c, record, **kw):
    dense = CoupledTransport(spec, tau_g=0.8, inlet_c=inlet_c,
                             div_fix=False, **kw)
    pal = CoupledTransportPallas(spec, tau_g=0.8, inlet_c=inlet_c,
                                 interpret=True, **kw)
    s_d = dense.run(n_steps, record=record)
    s_p = pal.run(n_steps, record=record)
    c_d = np.asarray(dense.concentration())
    c_p = np.asarray(pal.concentration())
    scale = max(np.abs(c_d).max(), 1e-6)
    np.testing.assert_allclose(c_p, c_d, rtol=rtol, atol=rtol * scale)
    np.testing.assert_allclose(s_p, s_d, rtol=rtol, atol=rtol * scale)
    return dense, pal


def test_coupled_pallas_matches_dense_steady_inlet():
    """Steady velocity-inlet poiseuille wash-in: coupled kernel vs
    coupled dense — concentration field + inlet/outlet record series
    AND the advanced flow state itself."""
    spec = get_case("poiseuille", n=16)
    dense, pal = _compare(spec, 40, 2e-4, {0: 1.0}, [0, 1])
    # the flow advanced identically (kernel vs dense flow step)
    f_p = np.asarray(pal.p[pal._crop[0], pal._crop[1], :19,
                           pal._crop[2]]).transpose(2, 0, 1, 3)
    np.testing.assert_allclose(f_p, np.asarray(dense.f),
                               rtol=2e-5, atol=1e-7)


def test_coupled_pallas_matches_dense_pulsatile():
    """Pulsatile series inlet (curved_vessel): the regime where the
    frozen field is WRONG and the coupled scan is the honest contrast
    model — kernel vs dense through the time-varying u."""
    spec = get_case("curved_vessel", n=24, nphase=4, period_steps=8)
    bolus = {0: lambda t: jnp.where(t < 12, 1.0, 0.0)}
    _compare(spec, 32, 5e-4, bolus, [0, 1])


def test_coupled_pallas_windkessel_clinical():
    """The FULL clinical composition at kernel pace: coronary tree +
    4 RCR outlets + a time-gated contrast bolus — flow P_c carry and
    washout series both match the dense coupled route."""
    wk = [(1e-4, 5e3, 2e-3), (1e-4, 5e3, 1e-3),
          (1e-4, 5e3, 4e-3), (1e-4, 5e3, 8e-3)]
    spec = get_case("coronary", shape=(48, 24, 40), radius=5,
                    windkessel=wk)
    bolus = {0: lambda t: jnp.where(t < 10, 1.0, 0.0)}
    dense, pal = _compare(spec, 30, 5e-4, bolus, [0, 1, 2, 3])
    assert pal.has_wk and pal.wk.shape == (4,)
    np.testing.assert_allclose(np.asarray(pal.wk),
                               np.asarray(dense.wk),
                               rtol=3e-4, atol=1e-8)


def test_coupled_pallas_total_conserves_closed_walls():
    """Bounce-back walls + zero-gradient outlet on a steady flow: the
    coupled kernel keeps the conservation audit finite and sane (drift
    is rounding-scale per step, as for the frozen kernel)."""
    spec = get_case("poiseuille", n=16)
    pal = CoupledTransportPallas(
        spec, tau_g=0.8, inlet_c={0: 1.0}, interpret=True)
    pal.run(30)
    t0 = pal.total()
    assert np.isfinite(t0) and t0 > 0
    c = np.asarray(pal.concentration())
    assert np.isfinite(c).all() and c.max() <= 1.2


@pytest.mark.multichip
def test_coupled_pallas_reuses_frozen_kernel_machinery():
    """The coupled class inherits the frozen class's tile/fixup
    geometry: constructor surfaces stay consistent (tile sizes, fixup
    windows) and the stat pack carries the blocked-axis masks."""
    from lbm_tpu.kernels.scalar_stream import ST_FLUID, pack_stat

    spec = get_case("poiseuille", n=16)
    pal = CoupledTransportPallas(spec, tau_g=0.8, interpret=True)
    st = np.asarray(pack_stat(pal.spec_pad.mask))
    fluid = np.asarray(pal.spec_pad.mask) == 4
    assert np.array_equal(st[:, :, ST_FLUID, :] == 1.0, fluid)
    assert pal.aux is None and pal.stat.shape == st.shape
