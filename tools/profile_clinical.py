"""Isolate the flagship clinical step's cost components on chip
(VERDICT r4 next-#4 applied to the r5 clinical path): time the
291x291x372 coronary at increasing composition levels so each
increment prices ONE mechanism:

  flow          BGK + prescribed outlets (kernel + tile-skip baseline)
  flow+wksub    + RCR on the 3 z-sub-outlets  (3 windowed z fixups)
  flow+wk       + RCR on the main x-outlet    (the axis-0 fixup + DUS)
  flow+wk+pulse + series inlet                (in-kernel series NEE)
  coupled       transport, no wk              (scalar kernel + 5 slabs)
  clinical      everything                    (the washout demo config)

Usage: python tools/profile_clinical.py [--shape 291,291,372]
       [--radius 10] [--steps 300] [--only flow,clinical]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="291,291,372")
    ap.add_argument("--radius", type=int, default=10)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--only", default=None,
                    help="comma list of config names to run")
    args = ap.parse_args()

    if os.environ.get("LBM_TPU_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["LBM_TPU_PLATFORM"])
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lbm_tpu.cases import get_case
    from lbm_tpu.engine.runner import Simulation
    from lbm_tpu.kernels.scalar_stream import CoupledTransportPallas

    interpret = jax.default_backend() == "cpu"
    shape = tuple(int(s) for s in args.shape.split(","))
    wk = [(2e-4, 2e4, 1e-3)] + [(2e-4, 2e4, 3e-3)] * 3

    def wksub_spec():
        s = get_case("coronary", shape=shape, radius=args.radius,
                     windkessel=wk)
        bcs = list(s.boundaries)
        bcs[1] = dataclasses.replace(bcs[1], windkessel=None)
        return dataclasses.replace(s, boundaries=bcs)

    def time_sim(spec):
        sim = Simulation(spec, backend="pallas")
        # warm with the SAME chunk length as the timed run — a chunk
        # of a different length is a different scan and would put a
        # recompile inside the timing (the first cut of this tool
        # measured exactly that artifact)
        sim.run(max_steps=args.steps, time_save=args.steps,
                verbose=False)
        t0 = time.perf_counter()
        sim.run(max_steps=args.steps, time_save=args.steps,
                verbose=False)
        return (time.perf_counter() - t0) / args.steps * 1e3

    def time_coupled(spec):
        ct = CoupledTransportPallas(spec, tau_g=0.6,
                                    inlet_c={0: 1.0},
                                    interpret=interpret)
        ct.run(args.steps, record=[0, 1])  # compile at this length
        t0 = time.perf_counter()
        ct.run(args.steps, record=[0, 1])
        return (time.perf_counter() - t0) / args.steps * 1e3

    configs = {
        "flow": lambda: time_sim(
            get_case("coronary", shape=shape, radius=args.radius)),
        "flow+wksub": lambda: time_sim(wksub_spec()),
        "flow+wk": lambda: time_sim(
            get_case("coronary", shape=shape, radius=args.radius,
                     windkessel=wk)),
        "flow+wk+pulse": lambda: time_sim(
            get_case("coronary", shape=shape, radius=args.radius,
                     windkessel=wk, pulsatile=(40, 2000))),
        "coupled": lambda: time_coupled(
            get_case("coronary", shape=shape, radius=args.radius)),
        "clinical": lambda: time_coupled(
            get_case("coronary", shape=shape, radius=args.radius,
                     windkessel=wk, pulsatile=(40, 2000))),
    }
    only = (set(args.only.split(",")) if args.only else set(configs))
    prev = None
    for name, fn in configs.items():
        if name not in only:
            continue
        t0 = time.perf_counter()
        ms = fn()
        note = "" if prev is None else f" (delta {ms - prev:+.2f})"
        print(f"{name:<14} {ms:6.2f} ms/step{note}  "
              f"[total incl. compile {time.perf_counter()-t0:.0f}s]",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
