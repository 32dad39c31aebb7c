"""Multi-chip Pallas path: spatial domain decomposition with explicit
ppermute halo exchange feeding the fused collide+stream kernel.

Layout: the packed padded state (kernels/collide_stream) is carved into
per-shard blocks along one spatial axis, each block carrying its own
one-cell halo ring — a global array of shape
(ndev*(L+2), ...) sharded on that dim. Per step, inside shard_map:

  1. each shard ppermutes its edge interior planes around the ring
     (the ICI halo exchange; wrap matches jnp.roll semantics),
  2. the fused kernel runs on the local block, with edge tiles patching
     their VMEM halo rows from the received planes (halo_axis DMAs in
     kernels/collide_stream._kernel),
  3. z-plane NEE boundaries (coronary sub-outlets) are fixed on small
     z-slabs whose block-edge rows are patched from the received planes,
  4. the fluid |u| partial sums psum over the mesh.

The shard axis must not host an x/y NEE boundary plane and must not be
z (halo rings exist in x/y): lid/poiseuille/bifurcation shard x,
coronary shards y.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lbm_tpu.core.lattice import D3Q19
from lbm_tpu.engine.compile import CompiledCase
from lbm_tpu.kernels import collide_stream as cs


def _overlap_windows(arr: np.ndarray, dim: int, ndev: int, L: int):
    """Stack ndev overlapping windows [s*L, s*L + L + 2) along `dim` and
    merge them back into that dim: (..., ndev*(L+2), ...)."""
    wins = [
        np.take(arr, np.arange(s * L, s * L + L + 2), axis=dim)
        for s in range(ndev)
    ]
    return np.concatenate(wins, axis=dim)


def blocked_sharding(mesh: Mesh, ndim: int, dim: int, name: str = "d"):
    spec = [None] * ndim
    spec[dim] = name
    return NamedSharding(mesh, P(*spec))


def to_blocked(p_global, ndev: int, axis: int):
    """Global packed padded (nxp, nyp, C, nz) -> blocked along `axis`.
    Initial halos come from the overlapping windows (valid values)."""
    arr = np.asarray(p_global)
    L = (arr.shape[axis] - 2) // ndev
    return _overlap_windows(arr, axis, ndev, L)


def from_blocked(P_blocked, ndev: int, axis: int):
    """Blocked -> global packed padded (static dead rings restored as
    zeros; they carry no physical cells)."""
    arr = jnp.asarray(P_blocked)
    Lp = arr.shape[axis] // ndev
    shape = list(arr.shape)
    shape[axis : axis + 1] = [ndev, Lp]
    arr = arr.reshape(shape)
    sl = [slice(None)] * len(shape)
    sl[axis + 1] = slice(1, -1)
    arr = arr[tuple(sl)]
    shape2 = list(arr.shape)
    shape2[axis : axis + 2] = [ndev * (Lp - 2)]
    interior = arr.reshape(shape2)
    pads = [(0, 0)] * interior.ndim
    pads[axis] = (1, 1)
    return jnp.pad(interior, pads)


def _fix_z_plane_blocked(cc_blk, bc, p_local, lo, hi, p_out, t, shard_axis):
    """z-plane NEE fixup on a shard block: patch the block's stale halo
    rows from the exchanged planes on the 3-thick z slab, recompute the
    consumer plane, splice it back (interior rows only)."""
    import lbm_tpu.engine.step as estep
    from lbm_tpu.core.lattice import D3Q19, phi

    c = bc.consumer_coord
    zsl = slice(c - 1, c + 2)
    slab = p_local[..., zsl]
    lo_s, hi_s = lo[..., zsl], hi[..., zsl]
    if shard_axis == 0:
        slab = jnp.concatenate([lo_s, slab[1:-1], hi_s], axis=0)
    else:
        slab = jnp.concatenate(
            [lo_s, slab[:, 1:-1], hi_s], axis=1
        )
    pulled = cs._plane_pull_packed(slab, bc.nbr_wall_plane, 2, 1)

    bc0 = dataclasses.replace(bc, consumer_coord=0)
    src_plane = slab[:, :, :19, 1].transpose(2, 0, 1)  # (19, x, y)
    pulled_slab = jnp.expand_dims(pulled, 3)
    src_slab = jnp.expand_dims(src_plane, 3)
    pulled_slab = estep.apply_bc_fixup(pulled_slab, src_slab, bc0, t)
    pulled = jnp.squeeze(pulled_slab, 3)

    ef = jnp.asarray(D3Q19.E.T.astype(np.float32))
    rho = jnp.sum(pulled, axis=0)
    mom = jnp.tensordot(ef, pulled, axes=([1], [0]),
                        precision=jax.lax.Precision.HIGHEST)
    u = mom / jnp.where(rho == 0, 1.0, rho)[None]
    feq = rho[None] * phi(u)
    post = pulled - (pulled - feq) / cc_blk.tau
    fluid_pl = cc_blk.fluid[..., c]
    newplane = jnp.where(fluid_pl[None], post, src_plane)  # (19, x, y)
    aux = slab[:, :, 19:, 1].transpose(2, 0, 1)
    full = jnp.concatenate([newplane, aux], axis=0).transpose(1, 2, 0)
    # Interior rows only — halo rows belong to the neighbors.
    if shard_axis == 0:
        return p_out.at[1:-1, :, :, c].set(full[1:-1])
    return p_out.at[:, 1:-1, :, c].set(full[:, 1:-1])


def make_pallas_sharded_step(
    cc_pad: CompiledCase,
    mesh: Mesh,
    shard_axis: int = 0,
    axis_name: str = "d",
    interpret: bool = False,
) -> tuple[Callable, Callable, Callable]:
    """Returns (step, init_blocked, unblock):
      step(P, t) -> (P', velsum) on the blocked sharded state
      init_blocked(p_global_packed) -> blocked sharded device array
      unblock(P) -> global packed padded array
    """
    if shard_axis not in (0, 1):
        raise ValueError(
            f"the sharded Pallas path shards axis 0 (x) or 1 (y) only — "
            f"got shard_axis={shard_axis}. The packed layout keeps z on "
            f"the 128-lane dimension, so z cannot be halo-sliced (Mosaic "
            f"DMA alignment). Cases whose only BC-free axis is z (e.g. "
            f"curved_vessel) must use backend='xla' with a GSPMD "
            f"sharding/halo step instead."
        )
    for bc in cc_pad.bcs:
        if bc.axis == shard_axis:
            raise ValueError(
                f"BC on axis {bc.axis} conflicts with shard axis"
            )
    ndev = mesh.devices.size
    nxp, nyp, nzp = cc_pad.shape
    n_axis = (nxp, nyp)[shard_axis] - 2
    if n_axis % ndev:
        raise ValueError(f"axis extent {n_axis} not divisible by {ndev}")
    L = n_axis // ndev

    kernel_bcs = [bc for bc in cc_pad.bcs if bc.axis in (0, 1)]
    fixup_bcs = [bc for bc in cc_pad.bcs if bc.axis == 2]
    bcs_static = tuple(
        cs.BCStatic.make(
            bc.axis, bc.consumer_coord, bc.dirs,
            bc.rho_fixed, bc.u_mode == "extrapolate", bc.omega,
        )
        for bc in kernel_bcs
    )

    # NEE plane tables; blocked along the lateral dim that is sharded.
    def lat_has_shard(bc):
        lat = [a for a in range(3) if a != bc.axis]
        return shard_axis in lat and lat.index(shard_axis) == 0

    nee_tabs = []
    for bc in kernel_bcs:
        if bc.u_mode == "series":
            tab, stride = cs._build_nee_series(bc), bc.series_stride
        else:
            tab, stride = cs._build_nee(bc), 1
        tab = np.asarray(tab)
        if lat_has_shard(bc):
            tab = _overlap_windows(tab, tab.ndim - 3, ndev, L)
        nee_tabs.append((bc.u_mode == "series", jnp.asarray(tab), stride))

    # Blocked per-shard views of the dense case arrays + per-BC lateral
    # plane data for the z fixups (z-BC lateral dims are (x, y); the
    # sharded one is at array dim 1 + shard_axis of the (D, A, B) data).
    cc_blk = None
    fixup_arrays = []
    if fixup_bcs:
        cc_blk = dataclasses.replace(
            cc_pad,
            nbr_wall=None,
            fluid=jnp.asarray(_overlap_windows(
                np.asarray(cc_pad.fluid), shard_axis, ndev, L)),
        )
        for bc in fixup_bcs:
            d = {}
            dim = 1 + shard_axis
            d["valid"] = jnp.asarray(_overlap_windows(
                np.asarray(bc.valid), dim, ndev, L))
            d["nbr_wall_plane"] = jnp.asarray(_overlap_windows(
                np.asarray(bc.nbr_wall_plane), dim, ndev, L))
            if bc.phi_star is not None:
                d["phi_star"] = jnp.asarray(_overlap_windows(
                    np.asarray(bc.phi_star), dim, ndev, L))
            if bc.phi_star_series is not None:
                d["phi_star_series"] = jnp.asarray(_overlap_windows(
                    np.asarray(bc.phi_star_series), 1 + dim, ndev, L))
            fixup_arrays.append(d)

    # Local tile sizes for the block shape.
    loc_nx = L if shard_axis == 0 else nxp - 2
    loc_ny = L if shard_axis == 1 else nyp - 2
    tx, ty, stx, sty = cs._pick_tiles(loc_nx, loc_ny, nzp,
                                      prefer_small=interpret)
    tau = float(cc_pad.tau)

    def local_step(p, t, *nee_and_blk):
        nee = nee_and_blk[: len(nee_tabs)]
        blk = nee_and_blk[len(nee_tabs):]
        if fixup_bcs:
            fluid_loc = blk[0]
            fix_dicts = []
            k = 1
            for d in fixup_arrays:
                loc = {}
                for key in d:
                    loc[key] = blk[k]
                    k += 1
                fix_dicts.append(loc)
        n = jax.lax.axis_size(axis_name)
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        # Exchange only the channels a halo row actually feeds: the 5
        # populations streaming inward across the face plus the 3 mask
        # channels (plain + z-prerolled, read by edge-cell wall tests and
        # the in-kernel NEE row fix) — 8 of C=24, a 3x ICI traffic cut.
        # Gather/scatter around the ppermute are one-plane XLA ops.
        mask_chs = [cs.MASK_CH, cs.MASK_ZP_CH, cs.MASK_ZM_CH]
        ch_lo = jnp.asarray(
            [i for i in range(1, 19)
             if int(D3Q19.E[i][shard_axis]) == 1] + mask_chs
        )
        ch_hi = jnp.asarray(
            [i for i in range(1, 19)
             if int(D3Q19.E[i][shard_axis]) == -1] + mask_chs
        )
        if shard_axis == 0:
            edge_lo, edge_hi = p[L : L + 1], p[1:2]
        else:
            edge_lo, edge_hi = p[:, L : L + 1], p[:, 1:2]
        lo_recv = jax.lax.ppermute(
            edge_lo[:, :, ch_lo, :], axis_name, fwd
        )
        hi_recv = jax.lax.ppermute(
            edge_hi[:, :, ch_hi, :], axis_name, bwd
        )
        zero_plane = jnp.zeros_like(edge_lo)
        lo = zero_plane.at[:, :, ch_lo, :].set(lo_recv)
        hi = zero_plane.at[:, :, ch_hi, :].set(hi_recv)
        nee_step = []
        for (is_series, _, stride), tab in zip(nee_tabs, nee):
            if is_series:
                T = tab.shape[0]
                phase = (t // stride) % T
                nee_step.append(
                    jax.lax.dynamic_index_in_dim(tab, phase, 0, False)
                )
            else:
                nee_step.append(tab)
        p_new, vs = cs._pallas_bulk(
            p, *nee_step, lo, hi, tau=tau, tx=tx, ty=ty,
            bcs_static=bcs_static, halo_axis=shard_axis,
            interpret=interpret, stx=stx, sty=sty,
            # the z-plane fixups below re-read the pre-step p; keep the
            # functional (non-aliased) output on the sharded path
            in_place=False,
        )
        if fixup_bcs:
            cc_loc = dataclasses.replace(cc_blk, fluid=fluid_loc)
            for bc, loc in zip(fixup_bcs, fix_dicts):
                bc_loc = dataclasses.replace(bc, **loc)
                p_new = _fix_z_plane_blocked(
                    cc_loc, bc_loc, p, lo, hi, p_new, t, shard_axis
                )
        return p_new, jax.lax.psum(vs, axis_name)

    pspec_state = [None, None, None, None]
    pspec_state[shard_axis] = axis_name
    state_spec = P(*pspec_state)
    in_specs = [state_spec, P()]
    extra_args = []
    for (is_series, tab, _), bc in zip(nee_tabs, kernel_bcs):
        spec = [None] * tab.ndim
        if lat_has_shard(bc):
            spec[tab.ndim - 3] = axis_name
        in_specs.append(P(*spec))
        extra_args.append(tab)
    if fixup_bcs:
        fl_spec = [None] * 3
        fl_spec[shard_axis] = axis_name
        in_specs += [P(*fl_spec)]
        extra_args += [cc_blk.fluid]
        for d in fixup_arrays:
            for key, arr in d.items():
                spec = [None] * arr.ndim
                off = 2 if key == "phi_star_series" else 1
                spec[off + shard_axis] = axis_name
                in_specs.append(P(*spec))
                extra_args.append(arr)

    shard_step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(state_spec, P()),
        # pallas_call's ShapeDtypeStruct outputs carry no varying-mesh-axes
        # annotation; skip the vma check.
        check_vma=False,
    )

    def step(Pstate, t):
        return shard_step(Pstate, t, *extra_args)

    def init_blocked(p_global):
        blocked = to_blocked(p_global, ndev, shard_axis)
        return jax.device_put(
            blocked, blocked_sharding(mesh, 4, shard_axis, axis_name)
        )

    def unblock(Pstate):
        return from_blocked(Pstate, ndev, shard_axis)

    return step, init_blocked, unblock


__all__ = [
    "make_pallas_sharded_step",
    "to_blocked",
    "from_blocked",
]
