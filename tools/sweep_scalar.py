#!/usr/bin/env python
"""Sub-tile / DMA-tile sweep for the D3Q7 scalar bulk kernel (timing
only, bare _scalar_bulk in a scan — see bench_scalar.py for the full
decomposition)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    if os.environ.get("LBM_TPU_PLATFORM"):
        import jax
        jax.config.update("jax_platforms",
                          os.environ["LBM_TPU_PLATFORM"])
    import jax
    import jax.numpy as jnp

    from lbm_tpu.cases import get_case
    from lbm_tpu.kernels.scalar_stream import (ScalarTransportPallas,
                                               _scalar_bulk)

    shape = (96, 96, 120)
    spec = get_case("coronary", shape=shape, radius=7)
    rng = np.random.default_rng(0)
    u = (rng.standard_normal((3,) + shape) * 0.01).astype(np.float32)
    steps = 100

    combos = []
    for tx, ty in ((32, 16), (16, 16), (16, 8), (8, 8)):
        for stx, sty in ((1, 8), (2, 8), (4, 8), (8, 8), (1, 16),
                         (2, 16), (4, 16), (8, 16), (16, 16)):
            if stx <= tx and sty <= ty:
                combos.append((tx, ty, stx, sty))
    want = os.environ.get("SWEEP", "")
    if want:
        combos = [tuple(int(v) for v in c.split("x"))
                  for c in want.split(",")]

    for tx, ty, stx, sty in combos:
        try:
            sp = ScalarTransportPallas(
                spec, u, D=0.02, inlet_c={0: lambda t: jnp.float32(1.0)},
                tx=tx, ty=ty, stx=stx, sty=sty, tile_skip="auto")

            @jax.jit
            def run_b(g, t0, sp=sp):
                def body(g, t):
                    extra = [sp.tids] if sp.tids is not None else []
                    if sp.need_seam:
                        from lbm_tpu.kernels.collide_stream import \
                            _extract_seam
                        seam = _extract_seam(g, sp.tx, 1)
                        g, seam = jax.lax.optimization_barrier(
                            (g, seam))
                        extra.append(seam)
                    g = _scalar_bulk(
                        g, sp.aux, *extra, tau_g=sp.tau_g,
                        source=sp.source, tx=sp.tx, ty=sp.ty,
                        stx=sp.stx, sty=sp.sty, n_live=sp.n_live,
                        in_place=sp.in_place or None,
                        has_seam=sp.need_seam)
                    return g, None
                g, _ = jax.lax.scan(
                    body, g, t0 + jnp.arange(steps, dtype=jnp.int32))
                return g

            g = run_b(sp.g, 0)
            np.asarray(g).ravel()[:1]
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                g = run_b(sp.g, 0)
                np.asarray(g).ravel()[:1]
                best = min(best, (time.perf_counter() - t0) / steps)
            print(f"tx={tx:3d} ty={ty:3d} stx={stx:3d} sty={sty:3d} "
                  f"n_live={sp.n_live}  {best*1e3:8.3f} ms/step",
                  flush=True)
        except Exception as e:
            print(f"tx={tx} ty={ty} stx={stx} sty={sty} FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
