"""fuse2 sub-tile tail experiment (VERDICT r3 next-#6).

Hypothesis: fuse2's mid pass computes (tx+2, ty+2) = (18, 18) extents
with (1, 8) sub-tiles, leaving a ragged (1, 2) tail column per row —
2-sublane values use 1/4 of a vreg and schedule poorly. Variant B picks
the largest divisor of the extent <= the requested sty (18 -> 6), so
every sub-tile is uniform. Variant C forces sty=9 (2 vregs, 9/16
sublanes used, fewer loop bodies).

Usage: python tools/exp_fuse2_tail.py --n 256 --steps 60
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_scan(step, p0, steps, per_call):
    def body(carry, _):
        p, t = carry
        p, vs = step(p, t)
        return (p, t + per_call), jnp.sum(vs)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(p, t):
        (p, t), s = jax.lax.scan(body, (p, t), xs=None,
                                 length=steps // per_call, unroll=2)
        return p, s

    p, s = run(p0, jnp.int32(0))
    _ = np.asarray(s)
    t0 = time.perf_counter()
    p, s = run(p, jnp.int32(steps))
    _ = np.asarray(s)
    return (time.perf_counter() - t0) / steps


def patched_tile_compute(cs, pick):
    real = cs._tile_compute

    def wrapper(ft, ot, tau, ex_x, ex_y, gx0=None, gy0=None,
                bcs_static=(), stx=None, sty=None, **kw):
        sty = pick(ex_y, sty)
        return real(ft, ot, tau, ex_x, ex_y, gx0=gx0, gy0=gy0,
                    bcs_static=bcs_static, stx=stx, sty=sty, **kw)

    return wrapper


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--variants", default="A,B,C")
    args = ap.parse_args()

    from lbm_tpu.cases import get_case
    from lbm_tpu.engine.compile import compile_case
    from lbm_tpu.engine.step import initial_f
    from lbm_tpu.kernels import collide_stream as cs

    n3 = args.n ** 3
    spec = cs.pad_spec(get_case("lid_driven_cavity", n=args.n),
                       lane_multiple=128, plane_multiples=(16, 16),
                       halo=2)
    cc = compile_case(spec, light=True)
    f0_np = np.asarray(initial_f(cc))
    mask = jnp.asarray(np.asarray(spec.mask))

    def fresh():  # time_scan donates; every variant needs its own state
        return cs.pack_state(jnp.asarray(f0_np), mask)

    real = cs._tile_compute

    def divisor_pick(ex_y, sty):
        if sty is None or ex_y % sty == 0:
            return sty
        return max(d for d in range(1, sty + 1) if ex_y % d == 0)

    picks = {
        "A": None,                                   # baseline ragged
        "B": divisor_pick,                           # 18 -> (1,6)x3
        "C": lambda ex_y, sty: 9 if ex_y == 18 else sty,  # 18 -> (1,9)x2
    }
    for name in args.variants.split(","):
        pick = picks[name]
        cs._tile_compute = (real if pick is None
                            else patched_tile_compute(cs, pick))
        cs._pallas_bulk2.clear_cache()
        try:
            step = cs.make_pallas_step(cc, ring=2, fuse=2)
            dt = time_scan(step, fresh(), args.steps, 2)
            print(f"f2 tail-variant {name}: {dt*1e3:.2f} ms/step, "
                  f"{n3/dt/1e6:.0f} MLUPS", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"f2 tail-variant {name}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        finally:
            cs._tile_compute = real


if __name__ == "__main__":
    main()
