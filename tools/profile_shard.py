"""Decompose the sharded single-device overhead (VERDICT r3 weak-#4:
bench --shard 1 ran ~30% below the unsharded kernel; which part —
the halo-split tile DMAs, the exchange glue (gather/ppermute/scatter),
or the shard_map wrapper?).

At ndev=1 the blocked state (L+2 rings) is bit-identical in shape to
the unsharded padded state, so the variants are directly comparable:

  v1_unsharded : make_pallas_step, plain kernel          (the 2881 path)
  v2_halokernel: _pallas_bulk(halo_axis=0) called directly with
                 precomputed lo/hi planes — same split-DMA kernel, NO
                 shard_map, NO exchange glue
  v3_noexch    : the full sharded step with the ppermute exchange
                 replaced by reusing a constant zero plane (glue
                 removed, kernel + shard_map kept)
  v4_sharded   : the production make_pallas_sharded_step

Usage: python tools/profile_shard.py --n 256 --steps 100
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


def time_scan(step, p0, steps):
    def body(carry, _):
        p, t = carry
        p, vs = step(p, t)
        return (p, t + 1), jnp.sum(vs)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(p, t):
        (p, t), s = jax.lax.scan(body, (p, t), xs=None, length=steps,
                                 unroll=2)
        return p, s

    p, s = run(p0, jnp.int32(0))
    _ = np.asarray(s)
    t0 = time.perf_counter()
    p, s = run(p, jnp.int32(steps))
    _ = np.asarray(s)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--variants", default="v1,v2,v3,v4")
    args = ap.parse_args()

    platform = os.environ.get("LBM_TPU_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    from jax.sharding import Mesh

    from lbm_tpu.cases import get_case
    from lbm_tpu.engine.compile import compile_case
    from lbm_tpu.engine.step import initial_f
    from lbm_tpu.kernels import collide_stream as cs
    from lbm_tpu.parallel import pallas_sharded as ps

    interpret = jax.default_backend() == "cpu"
    n3 = args.n ** 3
    spec = cs.pad_spec(get_case("lid_driven_cavity", n=args.n),
                       lane_multiple=1 if interpret else 128,
                       plane_multiples=(4, 8))
    cc = compile_case(spec, light=True)
    f0_np = np.asarray(initial_f(cc))
    mask = jnp.asarray(np.asarray(spec.mask))

    def fresh():  # time_scan donates; every variant needs its own state
        return cs.pack_state(jnp.asarray(f0_np), mask)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("d",))
    want = set(args.variants.split(","))

    results = {}
    if "v1" in want:
        step = cs.make_pallas_step(cc, interpret=interpret)
        results["v1_unsharded"] = time_scan(step, fresh(), args.steps)
        print_result("v1_unsharded", results, n3)

    if "v2" in want:
        # the halo-split kernel without any shard_map/exchange: lo/hi
        # from the state's own wrap edges, computed once (static planes
        # are wrong physics after step 1 but identical kernel work)
        nxp, nyp, nzp = cc.shape
        tx, ty, stx, sty = cs._pick_tiles(nxp - 2, nyp - 2, nzp,
                                          prefer_small=interpret)
        bcs_static = tuple(
            cs.BCStatic.make(bc.axis, bc.consumer_coord, bc.dirs,
                             bc.rho_fixed, bc.u_mode == "extrapolate",
                             bc.omega)
            for bc in cc.bcs if bc.axis in (0, 1)
        )
        nee = [cs._build_nee(bc) for bc in cc.bcs if bc.axis in (0, 1)]
        L = nxp - 2
        p_init = fresh()
        lo = jnp.array(p_init[L : L + 1])
        hi = jnp.array(p_init[1:2])
        del p_init

        def step2(p, t):
            return cs._pallas_bulk(
                p, *nee, lo, hi, tau=float(cc.tau), tx=tx, ty=ty,
                bcs_static=bcs_static, halo_axis=0,
                interpret=interpret, stx=stx, sty=sty,
                in_place=False,
            )

        results["v2_halokernel"] = time_scan(step2, fresh(), args.steps)
        print_result("v2_halokernel", results, n3)

    if "v3" in want:
        # production sharded step with the exchange glue removed
        orig = jax.lax.ppermute
        try:
            jax.lax.ppermute = lambda x, axis_name, perm: x
            step3, init3, _ = ps.make_pallas_sharded_step(
                cc, mesh, shard_axis=0, interpret=interpret)
            pb = init3(fresh())
            results["v3_noexch"] = time_scan(step3, pb, args.steps)
        finally:
            jax.lax.ppermute = orig
        print_result("v3_noexch", results, n3)

    if "v4" in want:
        step4, init4, _ = ps.make_pallas_sharded_step(
            cc, mesh, shard_axis=0, interpret=interpret)
        pb = init4(fresh())
        results["v4_sharded"] = time_scan(step4, pb, args.steps)
        print_result("v4_sharded", results, n3)


def print_result(name, results, n3):
    dt = results[name]
    print(f"{name}: {dt*1e3:.2f} ms/step, {n3/dt/1e6:.0f} MLUPS",
          flush=True)


if __name__ == "__main__":
    main()
