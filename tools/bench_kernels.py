"""Raw kernel-variant timing on the real TPU: 1-step vs 2-step fused,
copy-only floors, tile and sub-tile sweep. Times a donated lax.scan
chunk and fetches the velsum series to defeat early block_until_ready
returns over the axon tunnel.

Variant grammar (comma list): f1 | f2 | f1_copy | f2_copy, with an
optional @SXxSY sub-tile suffix (e.g. f2@4x8). _copy strips the physics
to a VMEM passthrough — the pure DMA floor of that pipeline shape.

Usage: python tools/bench_kernels.py --n 256 --steps 100 \
           --tiles 16x8,16x16 --variants f1,f1_copy,f2,f2_copy
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
        (p, t), s = jax.lax.scan(
            body, (p, t), xs=None, length=steps // per_call, unroll=2
        )
        return p, s

    p, s = run(p0, jnp.int32(0))
    _ = np.asarray(s)
    t0 = time.perf_counter()
    p, s = run(p, jnp.int32(steps))
    _ = np.asarray(s)
    return (time.perf_counter() - t0) / steps


def make_copy_stubs(cs, only_ex_x=None):
    """Copy-passthrough stubs. only_ex_x: stub ONLY calls whose compute
    extent matches (isolates the fuse2 mid pass (tx+2) vs out pass (tx))."""
    real = cs._tile_compute

    def copy_tile(ft, ot, tau, ex_x, ex_y, *a, **kw):
        if only_ex_x is not None and ex_x != only_ex_x:
            return real(ft, ot, tau, ex_x, ex_y, *a, **kw)
        ot[...] = ft[1 : 1 + ex_x, 1 : 1 + ex_y, :, :]
        return jnp.float32(0.0)

    def no_row_fix(*a, **kw):
        return jnp.float32(0.0)

    return copy_tile, (no_row_fix if only_ex_x is None else cs._row_fix)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--tiles", default="16x8")
    ap.add_argument("--variants", default="f1,f2")
    ap.add_argument("--pure", action="store_true",
                    help="enable the two-call pure/mixed tile split "
                    "(measured slower on the DMA-bound f1; see "
                    "make_pallas_step docstring)")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                    help="pdf storage dtype (kernel computes fp32)")
    ap.add_argument("--bits", action="store_true",
                    help="enable the channel-22 wall bitmask (measured "
                    "2x slower at 256^3; default off like the kernel)")
    args = ap.parse_args()

    from lbm_tpu.cases import get_case
    from lbm_tpu.engine.compile import compile_case
    from lbm_tpu.engine.step import initial_f
    from lbm_tpu.kernels import collide_stream as cs

    real_tile, real_fix = cs._tile_compute, cs._row_fix
    n3 = args.n ** 3
    for tile in args.tiles.split(","):
        tx, ty = (int(v) for v in tile.split("x"))
        for var in args.variants.split(","):
            name = var
            stx = sty = None
            if "@" in var:
                var, sub = var.split("@")
                stx, sty = (int(v) for v in sub.split("x"))
            s1copy = var.endswith("_s1copy")
            s2copy = var.endswith("_s2copy")
            copy_only = var.endswith("_copy") and not (s1copy or s2copy)
            fuse = 2 if var.startswith("f2") else 1
            ring = fuse
            # feature variants (VERDICT r4 weak-1: measure the
            # per-feature kernel taxes against the common copy floor):
            # f1_trt / f1_mrt / f1_les / f1_rheo / f1_force / f1_mov
            case_kw = {}
            for feat in ("trt", "mrt", "les", "rheo", "force", "mov"):
                if var.endswith("_" + feat):
                    from lbm_tpu.core.rheology import carreau_blood
                    from lbm_tpu.core.units import UnitSystem
                    case_kw = {
                        "trt": dict(collision="trt"),
                        "mrt": dict(collision="mrt"),
                        "les": dict(smagorinsky_cs=0.17),
                        "rheo": dict(rheology=carreau_blood(
                            UnitSystem(CH=1e-4, C_U=0.2,
                                       C_rho=1060.0))),
                        "force": dict(force=(1e-6, 0.0, 0.0)),
                        "mov": dict(lid="bounceback"),
                    }[feat]
                    break
            spec = cs.pad_spec(
                get_case("lid_driven_cavity", n=args.n, **case_kw),
                lane_multiple=128, plane_multiples=(tx, ty), halo=ring,
            )
            cc = compile_case(spec, light=True)
            f0 = initial_f(cc)
            sdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
            p0 = cs.pack_state(f0, jnp.asarray(np.asarray(spec.mask)),
                               dtype=sdt, bits=args.bits)
            del f0
            cs._pallas_bulk.clear_cache()
            cs._pallas_bulk2.clear_cache()
            if copy_only:
                cs._tile_compute, cs._row_fix = make_copy_stubs(cs)
            elif s1copy:
                cs._tile_compute, cs._row_fix = make_copy_stubs(
                    cs, only_ex_x=tx + 2)
            elif s2copy:
                cs._tile_compute, cs._row_fix = make_copy_stubs(
                    cs, only_ex_x=tx)
            try:
                for attempt in (0, 1):
                    try:
                        step = cs.make_pallas_step(
                            cc, tx=tx, ty=ty, ring=ring, fuse=fuse,
                            stx=stx, sty=sty,
                            pure_split=args.pure,
                            bits=args.bits)
                        dt = time_scan(step, p0, args.steps, fuse)
                        print(f"{name} {tile}: {dt*1e3:.2f} ms/step, "
                              f"{n3/dt/1e6:.0f} MLUPS", flush=True)
                        break
                    except Exception as e:  # noqa: BLE001
                        if attempt or "remote_compile" not in str(e):
                            print(f"{name} {tile}: FAILED "
                                  f"{type(e).__name__}: {str(e)[:160]}",
                                  flush=True)
                            break
                        time.sleep(5)
            finally:
                cs._tile_compute, cs._row_fix = real_tile, real_fix


if __name__ == "__main__":
    main()
