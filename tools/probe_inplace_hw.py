"""On-hardware validation of the in-place (input-aliased) kernel paths.

Interpret-mode tests CANNOT catch aliasing-order bugs: pallas interpret
ignores input_output_aliases, so the kernel always reads a pristine
input copy. On real hardware, _drive's in-place ordering means tile q's
input DMA starts only after every out(r<=q-2) has LANDED — tile q's
north skirt row (owned by tile q-gy) is already POST-step whenever
gy>1. The pre-step seam buffer (collide_stream._extract_seam +
has_seam) fixes that; this probe proves it on the chip by comparing
transient (non-steady) steps against the dense engine:

  * single-chip make_pallas_step, in_place False/True
  * sharded make_pallas_sharded_step on a 1-device mesh, ditto

Run: python tools/probe_inplace_hw.py   (needs the real TPU; ~2 min)
Expected: all four rows "clean". Before the seam fix, the two
in_place=True rows measured ~2e-2 rel err after 5 steps at 64^3.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from lbm_tpu.cases import get_case
from lbm_tpu.engine.compile import compile_case
from lbm_tpu.engine.step import initial_f, make_step
from lbm_tpu.kernels.collide_stream import (
    make_pallas_step, pack_state, pad_spec, unpack_state,
)
from lbm_tpu.parallel.pallas_sharded import make_pallas_sharded_step

NSTEPS = 5


def main():
    print("backend:", jax.default_backend())
    spec = pad_spec(get_case("lid_driven_cavity", n=64), lane_multiple=128)
    cc = compile_case(spec)
    f0 = initial_f(cc)
    live = np.asarray(spec.mask) != 0
    mask = jnp.asarray(np.asarray(cc.spec.mask))

    step_d = jax.jit(make_step(cc))
    f = f0
    for t in range(NSTEPS):
        f, rho, u = step_d(f, jnp.int32(t))
    f_ref = np.asarray(jax.device_get(f))

    failed = False

    def check(label, fp, live_only):
        nonlocal failed
        assert np.isfinite(fp).all(), f"{label}: non-finite"
        if live_only:
            a, b = fp[:, live], f_ref[:, live]
        else:
            sl = (slice(None), slice(1, -1), slice(1, -1), slice(None))
            a, b = fp[sl], f_ref[sl]
        err = float((np.abs(a - b) / (np.abs(b) + 1e-12)).max())
        ok = err < 1e-5
        failed |= not ok
        print(f"{label}: max rel err {err:.3e}  "
              f"({'clean' if ok else 'BAD'})")

    for in_place in (False, True):
        step_p = jax.jit(make_pallas_step(cc, tx=16, ty=16,
                                          in_place=in_place))
        p = pack_state(f0, mask)
        for t in range(NSTEPS):
            p, vs = step_p(p, jnp.int32(t))
        check(f"single-chip in_place={in_place}",
              np.asarray(jax.device_get(unpack_state(p))), False)

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("d",))
    for in_place in (False, True):
        step_s, init_b, unblock = make_pallas_sharded_step(
            cc, mesh, shard_axis=0, in_place=in_place)
        p = init_b(pack_state(f0, mask))
        for t in range(NSTEPS):
            p, vs = step_s(p, jnp.int32(t))
        check(f"sharded 1-dev in_place={in_place}",
              np.asarray(jax.device_get(unpack_state(unblock(p)))), True)

    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
