"""512^3 output-path demonstration on one real chip (VERDICT r3
missing-#2: "a 512^3 run cannot produce output" — the dense unpack OOMed
next to the packed state).

Runs the 512^3 synthetic coronary (tile-skip + in-place + lowmem init),
then exercises EVERY output surface at that size:
  - macro() via the streamed moments kernel (packed_macro)
  - a binary VTK file (the reference's always-writes-output contract,
    coronary.cu:948-1011)
  - a resumable PACKED checkpoint (engine/checkpoint), then a fresh
    Simulation restored from it and stepped further.

Usage: python tools/demo_512_outputs.py [--steps 20] [--out /tmp/demo512]
Prints timing stamps to stderr and a summary line per stage to stdout.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--out", default="/tmp/demo512")
    ap.add_argument("--resume-steps", type=int, default=5)
    ap.add_argument("--force-lowmem", action="store_true",
                    help="exercise the lowmem machinery below the size "
                    "threshold (CPU smoke runs)")
    ap.add_argument("--no-vtk", action="store_true",
                    help="skip the VTK stage (tunnel-bound ~7 min; for "
                    "re-demonstrating a single new stage)")
    ap.add_argument("--no-ckpt", action="store_true",
                    help="skip the checkpoint+resume stages (~30 min "
                    "of tunnel transfers)")
    ap.add_argument("--resume-only", action="store_true",
                    help="skip straight to the restore+step stage from "
                    "an existing checkpoint in --out (the 512^3 "
                    "checkpoint fetch alone is ~40 min over the axon "
                    "tunnel; this verifies resume in a separate run)")
    args = ap.parse_args()

    platform = os.environ.get("LBM_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    import jax.numpy as jnp
    import numpy as np

    from lbm_tpu.cases import get_case
    from lbm_tpu.engine import checkpoint as ckpt
    from lbm_tpu.engine.runner import Simulation
    from lbm_tpu.geometry.mask import CellType
    from lbm_tpu.io.vtk import case_vtk

    t0 = time.perf_counter()

    def stamp(msg):
        print(f"[{time.perf_counter()-t0:7.1f}s] {msg}", flush=True)

    n = args.n
    spec = get_case("coronary", shape=(n, n, n), radius=max(6, n // 36),
                    max_steps=args.steps, time_save=args.steps)
    live = int((np.asarray(spec.mask) != CellType.DEAD).sum())
    stamp(f"geometry built: {n}^3, occupancy {live/n**3:.3f}")
    lowmem = True if args.force_lowmem else None
    cpath = os.path.join(args.out, "demo512.ckpt.npz")

    def resume_stage():
        t1 = time.perf_counter()
        sim2 = Simulation(spec, backend="pallas", lowmem=lowmem)
        ckpt.restore(sim2, cpath)
        stamp(f"restored t={sim2.t} in {time.perf_counter()-t1:.1f}s "
              f"(incl. fresh init + state upload)")
        sim2._build_chunk(1)
        pstep2 = sim2._pallas_step
        import functools

        import jax

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chunk2(p, t):
            def body(i, carry):
                p, vs = carry
                p2, v = pstep2(p, t + i)
                return (p2, vs + v)

            return jax.lax.fori_loop(
                0, args.resume_steps, body, (p, jnp.float32(0.0)))

        sim2.f, s2 = chunk2(sim2.f, jnp.int32(sim2.t))
        s2 = float(s2)
        assert np.isfinite(s2)
        print(f"resume: {args.resume_steps} more steps from the "
              f"checkpoint, velsum {s2:.4e} (finite)", flush=True)
        stamp("RESUME OK at 512^3" if not args.force_lowmem
              else "RESUME OK")

    if args.resume_only:
        resume_stage()
        return

    sim = Simulation(spec, backend="pallas", lowmem=lowmem)
    assert sim._lowmem, "512^3-class must take the lowmem path"
    stamp("sim constructed (lowmem init on device)")

    # hot loop: summed-residual fori chunk (see tools/bench_sparse.py on
    # why the runner's stacked-series scan can't be used at 512^3)
    import functools

    import jax

    sim._build_chunk(1)  # builds sim._pallas_step (the guarded _chunk
    # wrapper defers building until first call)
    pstep = sim._pallas_step

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk(p, t):
        def body(i, carry):
            p, vs = carry
            p2, v = pstep(p, t + i)
            return (p2, vs + v)

        return jax.lax.fori_loop(
            0, args.steps, body, (p, jnp.float32(0.0)))

    sim.f, s = chunk(sim.f, jnp.int32(0))
    s = float(s)
    stamp(f"{args.steps} steps done (incl. compile), velsum {s:.4e}")
    assert np.isfinite(s)
    sim.t = args.steps
    t1 = time.perf_counter()
    sim.f, s = chunk(sim.f, jnp.int32(sim.t))
    s = float(s)
    dt = (time.perf_counter() - t1) / args.steps
    sim.t += args.steps
    print(f"hot loop: {dt*1e3:.2f} ms/step, "
          f"{live/dt/1e6:.0f} MLUPS(live), {n**3/dt/1e6:.0f} MLUPS(box)",
          flush=True)

    t1 = time.perf_counter()
    rho, u = sim.macro()
    # fused reduce: an eager abs would materialize another 1.6 GB
    umax = float(jax.jit(lambda a: jnp.max(jnp.abs(a)))(u))
    print(f"macro (streamed moments kernel): {time.perf_counter()-t1:.1f}s "
          f"on-device, |u|max {umax:.4f}", flush=True)
    assert np.isfinite(umax) and umax > 0
    del rho, u  # case_vtk recomputes macro(); two copies won't fit

    # WSS at 512^3: wss() routes through the compacted sparse stress
    # (live-cell pdfs gathered straight from the packed state); only
    # the single output field goes dense. The dense pull (~51 GB of
    # (19,512^3) arrays) could never run here.
    t1 = time.perf_counter()
    w = sim.wss()
    wmax, wsum, wcnt = jax.jit(
        lambda a: (jnp.max(a), jnp.sum(a), jnp.sum(a > 0)))(w)
    wmax, wsum, wcnt = float(wmax), float(wsum), int(wcnt)
    cpre = spec.units.C_pre
    print(f"wss (sparse stress route): {wcnt} wall-adjacent cells, "
          f"mean {wsum/max(wcnt,1)*cpre:.3f} Pa, max {wmax*cpre:.3f} Pa "
          f"in {time.perf_counter()-t1:.1f}s", flush=True)
    assert np.isfinite(wmax) and wmax > 0
    del w

    if not args.no_vtk:
        t1 = time.perf_counter()
        os.makedirs(args.out, exist_ok=True)
        path = case_vtk(sim, args.out, sim.t, include_density=True,
                        binary=True)
        sz = os.path.getsize(path) / 1e9
        print(f"VTK written: {path} ({sz:.2f} GB) in "
              f"{time.perf_counter()-t1:.1f}s", flush=True)

    if args.no_ckpt:
        stamp("REQUESTED OUTPUT SURFACES OK")
        return
    t1 = time.perf_counter()
    os.makedirs(args.out, exist_ok=True)
    ckpt.save_sim(cpath, sim)
    sz = os.path.getsize(cpath) / 1e9
    print(f"packed checkpoint: {cpath} ({sz:.2f} GB) in "
          f"{time.perf_counter()-t1:.1f}s", flush=True)

    # free the running sim's state before the resume sim allocates
    old, sim.f = sim.f, None
    old.delete()
    del sim

    resume_stage()
    stamp("ALL OUTPUT SURFACES OK at 512^3")


if __name__ == "__main__":
    main()
