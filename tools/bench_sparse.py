"""Sparse-vs-dense TPU benchmark on coronary-class geometry + the 512^3
stretch memory-fit (BASELINE.json configs[5]; VERDICT r1 next-#4/#6).

Run from the repo root (PYTHONPATH must NOT shadow the axon plugin):
    python tools/bench_sparse.py --steps 100

Prints one line per config: backend, shape, occupancy, ms/step, MLUPS
(live-cell and full-box conventions).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_chunk(sim, steps):
    run = sim._chunk(steps)
    sim.f, _, s = run(sim.f, jnp.int32(0))
    _ = np.asarray(s)  # forces completion over the axon tunnel
    t0 = time.perf_counter()
    sim.f, _, s = run(sim.f, jnp.int32(steps))
    _ = np.asarray(s)
    return (time.perf_counter() - t0) / steps


def run_512(backend: str, steps: int):
    """One 512^3 run. Invoked in a SUBPROCESS (--only-512) so the 13 GB
    buffer can't collide with leftovers from earlier configs — a prior
    in-process attempt OOMed sparse AFTER a pallas attempt even though
    each fits alone."""
    from lbm_tpu.cases import get_case
    from lbm_tpu.engine.runner import Simulation
    from lbm_tpu.geometry.mask import CellType

    t0 = time.perf_counter()

    def stamp(msg):
        print(f"[{time.perf_counter()-t0:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    spec = get_case("coronary", shape=(512, 512, 512), radius=14)
    stamp("geometry built")
    total = 512**3
    live = int((np.asarray(spec.mask) != CellType.DEAD).sum())
    occ = live / total
    sim = Simulation(spec, backend=backend)
    stamp("sim constructed (state initialized on device)")
    nchunk = max(20, steps // 5)
    if backend == "pallas":
        # The runner's lax.scan chunk stacks a per-step residual series;
        # at 512^3 XLA's remat-with-compression pass reacts by keeping a
        # COMPRESSED copy of the 13 GB carry whose uncompressed temp (a
        # transposed 15.2 GB layout) OOMs the chip. A fori_loop with a
        # summed residual gives XLA nothing to remat.
        import functools

        pstep = sim._pallas_step
        if pstep is None:
            sim._chunk(1)  # builds the step function
            pstep = sim._pallas_step

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chunk(p, t):
            def body(i, carry):
                p, vs = carry
                p2, v = pstep(p, t + i)
                return (p2, vs + v)

            return jax.lax.fori_loop(
                0, nchunk, body, (p, jnp.float32(0.0))
            )

        sim.f, s = chunk(sim.f, jnp.int32(0))
        _ = float(s)
        stamp("warmup chunk done (compile included)")
        t1 = time.perf_counter()
        sim.f, s = chunk(sim.f, jnp.int32(nchunk))
        _ = float(s)
        dt = (time.perf_counter() - t1) / nchunk
    else:
        dt = time_chunk(sim, nchunk)
    print(
        f"512^3 stretch occ={occ:.3f} {backend}(1 chip): "
        f"{dt*1e3:.2f} ms/step, {live/dt/1e6:.0f} MLUPS(live), "
        f"{total/dt/1e6:.0f} MLUPS(box)",
        flush=True,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--skip-512", action="store_true")
    p.add_argument("--only-512", choices=("pallas", "sparse"))
    args = p.parse_args()

    if args.only_512:
        run_512(args.only_512, args.steps)
        return

    from lbm_tpu.cases import get_case
    from lbm_tpu.engine.runner import Simulation
    from lbm_tpu.geometry.mask import CellType

    configs = [
        # real-coronary class: 291x291x372 -> padded-friendly 288x288x372
        ("coronary-class", dict(shape=(288, 288, 372), radius=10)),
        # mid-size cross-check
        ("mid", dict(shape=(128, 128, 128), radius=10)),
    ]
    for name, kw in configs:
        spec = get_case("coronary", **kw)
        total = int(np.prod(spec.shape))
        live = int((np.asarray(spec.mask) != CellType.DEAD).sum())
        occ = live / total
        for backend in ("sparse", "pallas"):
            try:
                sim = Simulation(spec, backend=backend)
                dt = time_chunk(sim, args.steps)
                print(
                    f"{name} {spec.shape} occ={occ:.3f} {backend}: "
                    f"{dt*1e3:.2f} ms/step, "
                    f"{live/dt/1e6:.0f} MLUPS(live), "
                    f"{total/dt/1e6:.0f} MLUPS(box)",
                    flush=True,
                )
                del sim
            except Exception as e:  # noqa: BLE001
                print(f"{name} {backend}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)

    if not args.skip_512:
        # 512^3 stretch (BASELINE configs[5]): the pallas path relies on
        # the in-place aliased kernel — the SINGLE 13 GB packed buffer
        # fits one 16 GB chip (a functional double buffer would not) —
        # plus block-sparse tile skip and the channel-streamed init.
        # Each backend runs in a fresh subprocess (see run_512).
        import subprocess

        for backend in ("pallas", "sparse"):
            for attempt in (0, 1):
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--only-512", backend, "--steps", str(args.steps)],
                    capture_output=True, text=True, timeout=3600,
                )
                out = (r.stdout or "").strip()
                if r.returncode == 0 and out:
                    print(out.splitlines()[-1], flush=True)
                    break
                err = (r.stderr or "").strip().splitlines()
                tail = err[-1][:160] if err else f"rc={r.returncode}"
                if attempt or "remote_compile" not in str(err):
                    print(f"512^3 {backend}: FAILED {tail}", flush=True)
                    break
                time.sleep(10)


if __name__ == "__main__":
    main()
