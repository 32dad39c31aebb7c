"""Tile sweep for the fused Pallas kernel on the real TPU.

Times the raw scan loop (no residual plumbing) at a given size for a
list of (tx, ty) candidates. Timing fetches the final state to defeat
the axon tunnel's early block_until_ready returns.

Usage: python tools/sweep_tiles.py [--n 256] [--steps 100] [--tiles 4x8,8x8,...]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--tiles", default="4x8,8x8,8x16,16x8,4x16,8x32")
    args = p.parse_args()

    from lbm_tpu.cases import get_case
    from lbm_tpu.engine.compile import compile_case
    from lbm_tpu.engine.step import initial_f
    from lbm_tpu.kernels.collide_stream import (
        make_pallas_step,
        pack_state,
        pad_spec,
    )

    spec = pad_spec(get_case("lid_driven_cavity", n=args.n),
                    lane_multiple=128, plane_multiples=(4, 8))
    cc = compile_case(spec, light=True)
    f = initial_f(cc)
    mask = jnp.asarray(np.asarray(cc.spec.mask))
    p0 = pack_state(f, mask)
    nsites = args.n**3

    for t in args.tiles.split(","):
        if "/" in t:
            dma, sub = t.split("/")
            tx, ty = (int(v) for v in dma.split("x"))
            stx, sty = (int(v) for v in sub.split("x"))
        else:
            tx, ty = (int(v) for v in t.split("x"))
            stx, sty = tx, ty
        nxp, nyp, _, _ = p0.shape
        if (nxp - 2) % tx or (nyp - 2) % ty:
            print(f"{t}: skipped (not divisible)")
            continue
        try:
            step = make_pallas_step(cc, tx=tx, ty=ty, stx=stx, sty=sty)

            def loop(p):
                def body(carry, _):
                    p, t = carry
                    p, vs = step(p, t)
                    return (p, t + 1), ()
                (p, _), _ = jax.lax.scan(
                    body, (p, jnp.int32(0)), xs=None,
                    length=args.steps, unroll=2,
                )
                return p

            run = jax.jit(loop, donate_argnums=(0,))
            t0 = time.perf_counter()
            p1 = run(jnp.array(p0))
            _ = np.asarray(p1[0, 0, 0, :1])
            compile_s = time.perf_counter() - t0
            p1 = None
            t0 = time.perf_counter()
            p1 = run(jnp.array(p0))
            _ = np.asarray(p1[0, 0, 0, :1])
            dt = time.perf_counter() - t0
            mlups = nsites * args.steps / dt / 1e6
            print(f"{t}: {mlups:.0f} MLUPS  ({dt/args.steps*1e3:.2f} ms/step,"
                  f" compile {compile_s:.0f}s)", flush=True)
            p1 = None
        except Exception as e:  # noqa: BLE001
            print(f"{t}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
