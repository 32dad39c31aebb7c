"""Command-line runner: one engine, N case configs.

Replaces the reference's compile-and-run-per-case workflow
("nvcc Poiseulle.cu -o Poiseulle", Poiseulle_flow/README.md) with:

    python -m lbm_tpu run --case lid_driven_cavity --out out/
    python -m lbm_tpu run --case bifurcation --steps 4400
    python -m lbm_tpu run --case coronary --resume out/coronary.ckpt.npz
    python -m lbm_tpu list
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _parse_kv(pairs: list[str]) -> dict:
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="lbm_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run a case")
    runp.add_argument("--case", required=True)
    runp.add_argument("--out", default="out")
    runp.add_argument("--steps", type=int, default=None)
    runp.add_argument("--time-save", type=int, default=None)
    runp.add_argument("--checkpoint-every", type=int, default=0,
                      help="save a resumable checkpoint every N saves")
    runp.add_argument("--resume", default=None, help="checkpoint to resume")
    runp.add_argument("--no-vtk", action="store_true")
    runp.add_argument("--vtk-final", action="store_true",
                      help="write VTK only once, after the run finishes "
                      "(per-save VTK on a 31M-cell grid dominates wall "
                      "time; the residual curve still logs every save)")
    runp.add_argument("--binary-vtk", action="store_true")
    runp.add_argument("--wss", action="store_true",
                      help="add the wall-shear-stress field (Pa) to VTK "
                      "outputs (engine/stress.py; beyond-reference)")
    runp.add_argument("--wss-stats", action="store_true",
                      help="accumulate TAWSS (Pa) and OSI over the run "
                      "(sampled at every save; for pulsatile cases make "
                      "--time-save divide the period) and write both "
                      "into the FINAL VTK (engine/stress.WSSAccumulator)")
    runp.add_argument("--snapshots", action="store_true",
                      help="write end-of-run midplane/BC snapshots "
                           "(meas1.txt, s1_out.txt, vel.csv — the "
                           "reference's write_once/outtxt outputs)")
    runp.add_argument("--shard", type=int, default=0,
                      help="shard the lattice over N devices (0 = auto off)")
    runp.add_argument("--backend", default="auto",
                      choices=["auto", "xla", "pallas", "sparse"],
                      help="step backend (auto: pallas on TPU, else xla)")
    runp.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                      help="pdf STORAGE dtype on the pallas backend "
                      "(compute stays fp32; bf16 halves HBM)")
    runp.add_argument("--fuse", type=int, default=1, choices=[1, 2],
                      help="fused steps per HBM round-trip (pallas; "
                      "fuse=2 needs all BCs on x/y planes)")
    runp.add_argument("--lowmem", action="store_true",
                      help="force the 512^3-class lowmem machinery "
                      "(streamed init/macro/unpack, packed checkpoints; "
                      "auto-enabled above ~4 GB of state per device)")
    runp.add_argument("--profile", default=None,
                      help="write a jax.profiler trace to this directory")
    runp.add_argument("--opt", nargs="*", metavar="KEY=VAL",
                      help="case builder options (e.g. n=128 tau=0.55)")

    sub.add_parser("list", help="list available cases")

    args = parser.parse_args(argv)

    # Some TPU plugins override JAX_PLATFORMS; honor an explicit platform
    # request through jax.config before anything initializes a backend.
    platform = os.environ.get("LBM_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    if args.cmd == "list":
        from lbm_tpu.cases import list_cases

        for name in list_cases():
            print(name)
        return 0

    from lbm_tpu.cases import get_case
    from lbm_tpu.engine import checkpoint as ckpt
    from lbm_tpu.engine.runner import Simulation
    from lbm_tpu.io.convlog import ConvergenceLog
    from lbm_tpu.io.vtk import case_vtk

    spec = get_case(args.case, **_parse_kv(args.opt))
    sharding = None
    mesh = None
    if args.shard:
        import jax

        from lbm_tpu.parallel.mesh import (
            free_axis,
            lattice_mesh,
            lattice_sharding,
        )

        on_tpu = jax.default_backend() not in ("cpu",)
        if args.backend == "xla" or (args.backend == "auto" and not on_tpu):
            sharding = lattice_sharding(
                n_devices=args.shard, axis=free_axis(spec)
            )
        else:
            mesh = lattice_mesh(args.shard)
    sim = Simulation(
        spec, sharding=sharding, backend=args.backend, mesh=mesh,
        store_dtype=args.dtype, fuse=args.fuse,
        lowmem=True if args.lowmem else None,
    )
    if args.resume:
        ckpt.restore(sim, args.resume)
        print(f"resumed from {args.resume} at step {sim.t}")

    os.makedirs(args.out, exist_ok=True)
    log = ConvergenceLog(args.out)
    t0 = time.perf_counter()
    save_count = 0
    wss_acc = None

    def on_save(sim, k, residual):
        nonlocal save_count, wss_acc
        save_count += 1
        log.residual(residual)
        if args.wss_stats:
            if wss_acc is None:
                wss_acc = sim.wss_accumulator()
            wss_acc.sample_sim(sim)
        if not args.no_vtk and not args.vtk_final:
            case_vtk(sim, args.out, k, include_density=spec.vtk_density,
                     binary=args.binary_vtk, include_wss=args.wss)
        if args.checkpoint_every and save_count % args.checkpoint_every == 0:
            ckpt.save_sim(
                os.path.join(args.out, f"{spec.name}.ckpt.npz"), sim
            )

    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
    result = sim.run(
        max_steps=args.steps, time_save=args.time_save, on_save=on_save
    )
    if args.profile:
        import jax

        jax.profiler.stop_trace()

    elapsed_ms = (time.perf_counter() - t0) * 1e3
    import numpy as np

    nlattice = int((np.asarray(spec.mask) != 0).sum())
    print(
        f"TOTAL RUNNING TIME: {elapsed_ms:.1f} MILLI SECONDS "
        f"#LATTICE {nlattice}  {result.mlups:.1f} MLUPS"
    )
    print(f"Residual is {result.residual:g}")
    if sim.wk is not None:
        from lbm_tpu.engine.diagnostics import MMHG_PER_PA

        pc = np.asarray(sim.wk) * spec.units.C_pre * MMHG_PER_PA
        print("Windkessel P_c (mmHg gauge): "
              + " ".join(f"{v:.4f}" for v in pc))
    log.finish(elapsed_ms, nlattice, result.residual)
    if not args.no_vtk:
        extra = None
        if wss_acc is not None and wss_acc.n_samples:
            extra = {
                "TAWSS": np.asarray(wss_acc.tawss_field())
                * spec.units.C_pre,
                "OSI": np.asarray(wss_acc.osi_field()),
            }
        case_vtk(sim, args.out, sim.t, include_density=spec.vtk_density,
                 binary=args.binary_vtk, include_wss=args.wss,
                 extra_fields=extra)
    if args.snapshots:
        from lbm_tpu.io.snapshots import (
            write_bc_csv,
            write_midplane,
            write_midplane_fluid,
        )

        rho, u = sim.macro()
        u = np.asarray(u)
        write_midplane(os.path.join(args.out, "meas1.txt"), u)
        write_midplane_fluid(
            os.path.join(args.out, "s1_out.txt"), u, spec.mask
        )
        write_bc_csv(os.path.join(args.out, "vel.csv"), u, spec.mask)
    return 0


if __name__ == "__main__":
    sys.exit(main())
