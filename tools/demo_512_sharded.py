"""The BASELINE scale-out row, literally, in emulation: the 512^3
coronary tree SHARDED across an 8-device mesh with one-deep halo
exchange, per-shard block-sparse tile-skip, in-place aliased state and
the blocked channel-streamed init — the exact multi-chip configuration
a real v5e pod would run, executed on the virtual CPU mesh (this host
has one physical chip; the driver's dryrun validates the same path at
toy sizes every round).

Usage: python tools/demo_512_sharded.py [--n 512] [--steps 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--ndev", type=int, default=8)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.ndev}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    # the 512^3 interpret-mode step is a >10 min XLA:CPU compile; keep
    # it cached like the test suite does
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "tests", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from lbm_tpu.cases import get_case
    from lbm_tpu.engine.compile import compile_case
    from lbm_tpu.geometry.mask import CellType
    from lbm_tpu.kernels import collide_stream as cs
    from lbm_tpu.parallel import pallas_sharded as ps

    t0 = time.perf_counter()

    def stamp(msg):
        print(f"[{time.perf_counter()-t0:7.1f}s] {msg}", flush=True)

    n = args.n
    spec = cs.pad_spec(
        get_case("coronary", shape=(n, n, n), radius=max(6, n // 36)),
        lane_multiple=1,
    )
    live = int((np.asarray(spec.mask) != CellType.DEAD).sum())
    stamp(f"geometry: {n}^3, occupancy {live/n**3:.4f}")
    cc = compile_case(spec, light=True, host_arrays=True)
    mesh = Mesh(np.asarray(jax.devices()[: args.ndev]), ("d",))
    tids, n_max, total = ps.shard_tile_lists(
        np.asarray(spec.mask), args.ndev, 1, 16, 16)
    stamp(f"tile lists: n_max {n_max} / {total} per shard "
          f"({n_max/total:.1%} — skip active)")
    assert n_max < total
    step, _, unblock = ps.make_pallas_sharded_step(
        cc, mesh, shard_axis=1, interpret=True, tile_skip=True,
        tx=16, ty=16,
    )
    p = ps.packed_initial_blocked(spec, mesh, 1)
    stamp(f"blocked sharded init done: {p.shape}, "
          f"{p.nbytes/1e9:.1f} GB over {args.ndev} shards")
    step = jax.jit(step)
    vs = None
    for t in range(args.steps):
        p, vs = step(p, jnp.int32(t))
        vs = float(vs)
        stamp(f"step {t}: velsum {vs:.4e}")
        assert np.isfinite(vs)
    # dead-cell contract at scale: whole box finite after unblock
    g = unblock(p)
    assert bool(jnp.isfinite(g).all())
    stamp(f"unblocked global {g.shape} all-finite — "
          f"BASELINE scale-out row OK ({n}^3 sharded x{args.ndev}, "
          f"tile-skip, in-place, halo exchange)")


if __name__ == "__main__":
    main()
