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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--skip-512", action="store_true")
    args = p.parse_args()

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
        # 512^3 stretch: the dense packed state (2 x 13 GB) exceeds one
        # v5e's 16 GB HBM — multi-chip territory (BASELINE configs[5]).
        # The sparse backend fits the ~5%-occupancy tree on ONE chip.
        spec = get_case("coronary", shape=(512, 512, 512), radius=14)
        total = 512**3
        live = int((np.asarray(spec.mask) != CellType.DEAD).sum())
        occ = live / total
        for backend in ("pallas", "sparse"):
            # pallas at 512^3 relies on the in-place aliased kernel: the
            # single 13 GB packed buffer fits one 16 GB chip, and the
            # block-sparse tile skip (auto at occ<50%) touches only the
            # ~6% of tiles containing the tree.
            for attempt in (0, 1):
                try:
                    sim = Simulation(spec, backend=backend)
                    dt = time_chunk(sim, max(20, args.steps // 5))
                    print(
                        f"512^3 stretch occ={occ:.3f} {backend}(1 chip): "
                        f"{dt*1e3:.2f} ms/step, "
                        f"{live/dt/1e6:.0f} MLUPS(live), "
                        f"{total/dt/1e6:.0f} MLUPS(box)",
                        flush=True,
                    )
                    del sim
                    break
                except Exception as e:  # noqa: BLE001
                    # the remote compile service 500s erratically —
                    # retry once before giving up
                    if attempt or "remote_compile" not in str(e):
                        print(f"512^3 {backend}: FAILED "
                              f"{type(e).__name__}: {str(e)[:160]}",
                              flush=True)
                        break
                    time.sleep(10)


if __name__ == "__main__":
    main()
