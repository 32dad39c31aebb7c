"""Physiological-blood coronary demo on one real chip: the flagship
composition of the round-4 beyond-parity features — the synthetic
coronary tree under the Cho & Kensey Carreau blood model
(core/rheology.carreau_blood, per-cell tau_eff on the Pallas kernel's
closure path) with wall-shear-stress output in Pa (engine/stress.py).

The reference solves this geometry Newtonian-only and writes
velocity/pressure only (/root/reference/coronary_cfd/coronary.cu); WSS
under non-Newtonian blood is the quantity clinicians actually read.

Usage: python tools/demo_blood_wss.py [--shape 128,128,160] [--radius 8]
       [--steps 2000] [--newtonian] [--vtk OUT.vtk]
Prints per-stage summary lines to stdout. Default shape keeps the dense
stress pass comfortably in HBM (see Simulation.stress's memory note);
the hot loop itself would take the full 291x291x372.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="128,128,160")
    ap.add_argument("--radius", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--newtonian", action="store_true",
                    help="skip the rheology (comparison run)")
    ap.add_argument("--curved", action="store_true",
                    help="Bouzidi curved walls + SDF-gradient WSS "
                    "normals (coronary curved=True; runs the dense xla "
                    "backend — the packed kernel has no q-plane budget)")
    ap.add_argument("--windkessel", action="store_true",
                    help="terminate all four outlets on 3-element RCR "
                    "models (flow split emerges from downstream "
                    "resistances) and report per-outlet flux, P_c, and "
                    "the CFD-FFR estimate (engine/diagnostics)")
    ap.add_argument("--stenosis", type=float, default=None,
                    help="fractional diameter reduction of a proximal "
                    "main-tube cosine constriction (coronary stenosis=) "
                    "— FFR should drop vs the healthy run. Keep <=0.45 "
                    "at radius 8: throat velocity scales ~(R/r)^2 and "
                    "lattice Ma must stay <0.3")
    ap.add_argument("--vtk", default=None)
    args = ap.parse_args()

    # honor LBM_TPU_PLATFORM like the CLI (the axon plugin ignores
    # JAX_PLATFORMS; smoke runs need the CPU backend)
    platform = os.environ.get("LBM_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    import numpy as np

    from lbm_tpu.cases import get_case
    from lbm_tpu.core.rheology import carreau_blood
    from lbm_tpu.engine.runner import Simulation

    shape = tuple(int(s) for s in args.shape.split(","))
    base = get_case("coronary", shape=shape, radius=args.radius)
    rheo = None if args.newtonian else carreau_blood(base.units)
    # RCR terminations (lattice units): the main outlet drains the
    # trunk, the three sub-outlets carry ~3x its distal resistance, so
    # the split emerges from the resistances (not prescribed speeds).
    wk = ([(2e-4, 2e4, 1e-3)] + [(2e-4, 2e4, 3e-3)] * 3
          if args.windkessel else None)
    spec = get_case("coronary", shape=shape, radius=args.radius,
                    rheology=rheo, curved=args.curved, windkessel=wk,
                    stenosis=args.stenosis)
    print(f"case: coronary {shape} radius={args.radius} "
          f"rheology={'newtonian' if rheo is None else 'carreau_blood'} "
          f"walls={'bouzidi' if args.curved else 'staircase'} "
          f"outlets={'RCR windkessel' if wk else 'prescribed-velocity'} "
          f"stenosis={args.stenosis}")

    t0 = time.perf_counter()
    sim = Simulation(spec)
    print(f"build: backend={sim.backend} "
          f"{time.perf_counter() - t0:.1f}s")

    chunk = min(500, args.steps)
    t0 = time.perf_counter()
    sim.run(max_steps=chunk, time_save=chunk, verbose=False)
    print(f"warmup: first chunk (compile; the remote compile service "
          f"is erratic) {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    res = sim.run(max_steps=args.steps, time_save=chunk, verbose=False)
    dt = time.perf_counter() - t0
    ncell = int(np.prod(shape))
    print(f"run: {args.steps} steps in {dt:.1f}s = "
          f"{dt / args.steps * 1e3:.2f} ms/step, "
          f"{ncell * args.steps / dt / 1e6:.1f} MLUPS box-convention, "
          f"residual {res.residual:.3e}")

    if args.windkessel:
        from lbm_tpu.engine.diagnostics import (MMHG_PER_PA, ffr,
                                                plane_flux)

        rho_f, u_f = (np.asarray(a) for a in sim.macro())
        names = ["main", "sub5", "sub6", "sub7"]
        qs = [plane_flux(spec, u_f, 1 + k) for k in range(4)]
        qtot = sum(qs)
        pc = np.asarray(sim.wk) * spec.units.C_pre * MMHG_PER_PA
        for k, nm in enumerate(names):
            f_k, dp_k = ffr(spec, rho_f, 0, 1 + k)
            print(f"outlet {nm}: Q {qs[k]:+.2f} ({qs[k]/qtot*100:.0f}% "
                  f"of outflow), P_c {pc[k]:.2f} mmHg gauge, "
                  f"trans-tree dp {dp_k:.2f} mmHg, FFR~{f_k:.3f}")
        # the split is set by the TOTAL path resistance — in-tree
        # viscous segments (8 nu L / pi R^4 ~ 1e-2 here) plus each
        # RCR's Rd — so it shifts with geometry as much as with the
        # terminations; the quantitative RCR anchors live in
        # tests/test_windkessel.py on the single-path pipe.
        assert np.isfinite(pc).all() and qtot > 0 and all(
            np.isfinite(q) for q in qs)

    t0 = time.perf_counter()
    w = np.asarray(sim.wss()) * spec.units.C_pre  # Pa
    wall = w > 0
    print(f"wss: {wall.sum()} wall-adjacent cells, "
          f"mean {w[wall].mean():.3f} Pa, p95 "
          f"{np.percentile(w[wall], 95):.3f} Pa, max {w[wall].max():.3f} "
          f"Pa ({time.perf_counter() - t0:.1f}s)")
    assert np.isfinite(w).all()

    if args.vtk:
        from lbm_tpu.io.vtk import case_vtk

        t0 = time.perf_counter()
        path = case_vtk(sim, os.path.dirname(args.vtk) or ".", sim.t,
                        binary=True, include_wss=True)
        print(f"vtk: {path} ({os.path.getsize(path) / 1e6:.1f} MB, "
              f"{time.perf_counter() - t0:.1f}s)")


if __name__ == "__main__":
    main()
