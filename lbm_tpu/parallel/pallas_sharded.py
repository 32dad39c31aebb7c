"""Multi-chip Pallas path: spatial domain decomposition with explicit
ppermute halo exchange feeding the fused collide+stream kernel.

Layout: the packed padded state (kernels/collide_stream) is carved into
per-shard blocks along one spatial axis, each block carrying its own
one-cell halo ring — a global array of shape
(ndev*(L+2), ...) sharded on that dim. Per step, inside shard_map:

  1. each shard ppermutes its edge interior planes around the ring
     (the ICI halo exchange; wrap matches jnp.roll semantics),
  2. z-BC consumer slabs are DMA-extracted from the PRE-step state
     (windowed on the unsharded lateral dim) with their shard-edge rows
     patched from the received planes,
  3. the fused kernel runs on the local block, with edge tiles patching
     their VMEM halo rows from the received planes (halo_axis DMAs in
     kernels/collide_stream._kernel); with tile_skip the kernel walks a
     per-shard live-tile list and aliases its output onto the input so
     skipped (all-dead) tiles keep their static contents,
  4. z-plane NEE boundaries (coronary sub-outlets) are recomputed from
     the pre-extracted slabs and spliced in place, returning the velsum
     delta exactly like the single-chip path,
  5. the fluid |u| partial sums psum over the mesh.

The shard axis must not host an x/y NEE boundary plane and must not be
z (halo rings exist in x/y): lid/poiseuille/bifurcation shard x,
coronary shards y.

Scale features (BASELINE.md scale-out row — sharded 512^3-class runs):
  - tile_skip: per-shard live-tile lists from the local block mask,
    padded to a common static length with all-dead filler tiles (an
    all-dead tile's update is a bit-exact passthrough, so replaying one
    is a no-op — SPMD needs every shard to run the same tile count);
  - in_place: the kernel output aliases the input (halves per-shard
    HBM), made legal by step 2's pre-extraction of every z-BC slab;
  - packed_initial_blocked: the channel-streamed lowmem init built
    directly in blocked sharded form (no global dense f, no host
    round-trip through to_blocked).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lbm_tpu.engine.compile import CompiledCase
from lbm_tpu.geometry.mask import CellType
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


def shard_tile_lists(mask_padded, ndev: int, shard_axis: int,
                     tx: int, ty: int):
    """Per-shard live-tile id lists over each shard's local (tx, ty)
    grid, padded to a common static length with an all-dead filler tile
    (SPMD runs one program: every shard must process the same tile
    count; replaying an all-dead tile is a bit-exact no-op because its
    update is a pure passthrough). Returns (tids (ndev, n_max) int32,
    n_max, total_tiles); a shard shorter than n_max always owns at
    least one dead tile (otherwise its list would be full-length)."""
    m = np.asarray(mask_padded)
    L = (m.shape[shard_axis] - 2) // ndev
    mb = _overlap_windows(m, shard_axis, ndev, L)
    lists = []
    for s in range(ndev):
        sl = [slice(None)] * 3
        sl[shard_axis] = slice(s * (L + 2), (s + 1) * (L + 2))
        lists.append(cs.live_tile_ids(mb[tuple(sl)], tx, ty, ring=1))
    loc_nx = L if shard_axis == 0 else m.shape[0] - 2
    loc_ny = L if shard_axis == 1 else m.shape[1] - 2
    total = (loc_nx // tx) * (loc_ny // ty)
    n_max = max(len(l) for l in lists)
    rows = []
    for ids in lists:
        if len(ids) < n_max:
            dead = sorted(set(range(total)) - set(ids.tolist()))
            pad = np.full(n_max - len(ids), dead[0], np.int32)
            ids = np.concatenate([ids, pad])
        rows.append(ids)
    return np.stack(rows).astype(np.int32), n_max, total


def packed_initial_blocked(spec_pad, mesh: Mesh, shard_axis: int,
                           axis_name: str = "d", dtype=jnp.float32):
    """Channel-streamed feq init built DIRECTLY in blocked sharded form:
    the multi-chip mirror of packed_initial_lowmem — no global dense
    (19, X, Y, Z) f, no host round-trip through to_blocked (which at
    512^3 would pull the ~13 GB packed state to the host)."""
    ndev = mesh.devices.size
    L = (spec_pad.shape[shard_axis] - 2) // ndev
    mask_b = _overlap_windows(
        np.asarray(spec_pad.mask), shard_axis, ndev, L)
    rho0 = spec_pad.rho0
    rho_b = (np.ones(mask_b.shape, np.float32) if rho0 is None else
             _overlap_windows(np.asarray(rho0, np.float32),
                              shard_axis, ndev, L))
    u0 = spec_pad.u0
    u_b = (np.zeros((3,) + mask_b.shape, np.float32) if u0 is None else
           _overlap_windows(np.asarray(u0, np.float32),
                            1 + shard_axis, ndev, L))
    spec_b = dataclasses.replace(
        spec_pad, shape=mask_b.shape, mask=mask_b, rho0=rho_b, u0=u_b,
        boundaries=[],
    )
    return cs.packed_initial_lowmem(
        spec_b, dtype=dtype,
        out_sharding=blocked_sharding(mesh, 4, shard_axis, axis_name),
        value_sharding=blocked_sharding(mesh, 3, shard_axis, axis_name),
    )


def make_pallas_sharded_step(
    cc_pad: CompiledCase,
    mesh: Mesh,
    shard_axis: int = 0,
    axis_name: str = "d",
    interpret: bool = False,
    tile_skip=False,
    in_place: bool | None = None,
    tx: int | None = None,
    ty: int | None = None,
) -> tuple[Callable, Callable, Callable]:
    """Returns (step, init_blocked, unblock):
      step(P, t) -> (P', velsum) on the blocked sharded state
      init_blocked(p_global_packed) -> blocked sharded device array
      unblock(P) -> global packed padded array, with pdf channels ZEROED
        on DEAD cells (the dead-cell contract: dead contents are never
        physics, and the sharded halo exchange can leave NaNs there —
        zeroing makes every whole-box consumer safe)

    tile_skip: False | True | "auto" — per-shard block-sparse live-tile
    walk (see shard_tile_lists); "auto" enables it when the WORST
    shard's live-tile fraction is <60% (SPMD wall-clock is governed by
    the longest list, so n_max/total is the criterion). Requires (and
    implies) in_place. in_place=True aliases the kernel output onto the
    input even without skipping (halves per-shard HBM; costs the strict
    DMA ordering, ~25% on dense grids — see kernels/_drive)."""
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
    # Static fixup windows, LOCAL coords. Unsharded lateral dim: the
    # global valid-cell bbox (local == global there). Sharded dim: the
    # UNION over shards of the bbox's local images — one static window
    # that reads the same LOCAL rows on every shard (so whether a slab
    # row is a halo row is also static and uniform). Shards whose block
    # doesn't contain the bbox recompute+splice cells far from any NEE
    # cell, which is a bit-exact idempotent rewrite (the same margin
    # argument as the single-chip windowed fixup). A full-width window
    # here measured 5.15 vs 2.0 ms/step fixup-free on the 291^3
    # coronary at ndev=1 (the bbox is ~28 rows of 308).
    wins = []

    def shard_dim_window(b0: int, b1: int) -> tuple[int, int]:
        s_first = max(0, (b0 - (L + 2)) // L + 1)
        s_last = min(ndev - 1, -(-b1 // L) - 1)
        u_lo = max(0, b0 - s_last * L)
        u_hi = min(L + 2, b1 - s_first * L)
        return u_lo, u_hi
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
            wg = cs._valid_bbox(bc, (nxp, nyp))
            if wg is None:
                wins.append(None)
            elif shard_axis == 0:
                u = shard_dim_window(wg[0], wg[1])
                wins.append((u[0], u[1], wg[2], wg[3]))
            else:
                u = shard_dim_window(wg[2], wg[3])
                wins.append((wg[0], wg[1], u[0], u[1]))

    # Local tile sizes for the block shape.
    loc_nx = L if shard_axis == 0 else nxp - 2
    loc_ny = L if shard_axis == 1 else nyp - 2
    atx, aty, stx, sty = cs._pick_tiles(loc_nx, loc_ny, nzp,
                                        prefer_small=interpret)
    tx = atx if tx is None else tx
    ty = aty if ty is None else ty
    if interpret:
        stx, sty = tx, ty
    tau = float(cc_pad.tau)  # static float (BGK) or pair (TRT)
    if cc_pad.tau_minus is not None:
        tau = (tau, float(cc_pad.tau_minus))
    force = cc_pad.force  # static 3-tuple (Guo body force) or None
    wall_velocity = cc_pad.wall_velocity  # static 3-tuple or None
    mrt = None
    if cc_pad.mrt_k is not None:
        if force is not None:
            raise ValueError("MRT + body force: use the xla backend "
                             "under the mesh (see make_pallas_step)")
        from lbm_tpu.core.mrt import mrt_rank_update
        mrt = mrt_rank_update(float(cc_pad.tau), cc_pad.spec.mrt_rates)
    les = cc_pad.closure  # static tau-closure tuple (core/rheology)
    if les is not None and force is not None:
        raise ValueError("tau closure + body force: use the xla backend "
                         "under the mesh (see make_pallas_step)")

    # Per-shard block-sparse tile lists (see shard_tile_lists).
    tids_all = None
    n_max = None
    if tile_skip == "auto" or tile_skip is True:
        tids_np, nm, total = shard_tile_lists(
            cc_pad.spec.mask, ndev, shard_axis, tx, ty)
        if tile_skip == "auto":
            tile_skip = nm / max(total, 1) < 0.6 or (
                bool(in_place) and nm < total)
        if tile_skip:
            tids_all, n_max = jnp.asarray(tids_np), nm
    if in_place is None:
        in_place = bool(tile_skip)
    if tile_skip and not in_place:
        raise ValueError("tile_skip requires the in-place aliased output")

    def local_step(p, t, *args):
        nee = args[: len(nee_tabs)]
        rest = args[len(nee_tabs):]
        tids_loc = None
        if tids_all is not None:
            tids_loc, rest = rest[0].reshape(-1), rest[1:]
        if fixup_bcs:
            fluid_loc = rest[0]
            fix_dicts = []
            k = 1
            for d in fixup_arrays:
                loc = {}
                for key in d:
                    loc[key] = rest[k]
                    k += 1
                fix_dicts.append(loc)
        n = jax.lax.axis_size(axis_name)
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        # Exchange the FULL C-channel edge plane. Round 3 trimmed the
        # exchange to the 8 channels a halo row actually feeds (5
        # inward-streaming populations + 3 mask channels, a 3x ICI cut)
        # — but the trim's gather/scatter around the ppermute are
        # sublane-dim XLA gathers, MEASURED at 2.3 ms/step of the 2.6
        # ms/step total sharded overhead at 256^3 (tools/profile_shard:
        # v3_noexch 8.48 vs v2_halokernel 6.17). Full planes need no
        # channel surgery at all, and halo bytes are negligible next to
        # the per-shard state DMA (one 1-cell plane ~ 0.4% of the
        # state); the kernel and z-slab patches read a superset of what
        # the trimmed plane carried (exactly the to_blocked overlap
        # window), so contents only get MORE valid.
        if shard_axis == 0:
            edge_lo, edge_hi = p[L : L + 1], p[1:2]
        else:
            edge_lo, edge_hi = p[:, L : L + 1], p[:, 1:2]
        lo = jax.lax.ppermute(edge_lo, axis_name, fwd)
        hi = jax.lax.ppermute(edge_hi, axis_name, bwd)
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
        # z-BC consumer slabs come from the PRE-step state: DMA-extract
        # them BEFORE the (possibly input-aliased) kernel destroys p,
        # exactly like the single-chip path — with the shard-edge rows
        # patched from the exchanged planes (a block-edge ring row is
        # stale in p; its streaming-inward populations arrive in lo/hi).
        subs = []
        for bc, win in zip(fixup_bcs, wins):
            if win is None:
                subs.append(None)
                continue
            x0, x1, y0, y1 = win
            c = bc.consumer_coord
            sub = cs._extract_z_slab(
                p, x0=x0, y0=y0, wx=x1 - x0, wy=y1 - y0, c=c,
                interpret=interpret,
            )
            # Patch only the window rows that ARE shard-halo rows —
            # static and uniform across shards because the window is in
            # local coordinates (row 0 is the lo halo row iff the
            # window starts at 0, on every shard).
            zsl = slice(c - 1, c + 2)
            if shard_axis == 0:
                lo_s = lo[:, y0:y1, :, zsl].astype(jnp.float32)
                hi_s = hi[:, y0:y1, :, zsl].astype(jnp.float32)
                if x0 == 0:
                    sub = jnp.concatenate([lo_s, sub[1:]], axis=0)
                if x1 == L + 2:
                    sub = jnp.concatenate([sub[:-1], hi_s], axis=0)
            else:
                lo_s = lo[x0:x1, :, :, zsl].astype(jnp.float32)
                hi_s = hi[x0:x1, :, :, zsl].astype(jnp.float32)
                if y0 == 0:
                    sub = jnp.concatenate([lo_s, sub[:, 1:]], axis=1)
                if y1 == L + 2:
                    sub = jnp.concatenate([sub[:, :-1], hi_s], axis=1)
            subs.append(sub)
        # Pre-step seam rows for the aliased kernel (tile tid-gy's last
        # interior row is POST-step by the time tile tid's input DMA
        # starts — see cs._kernel / cs._extract_seam). For shard_axis=1
        # the seam's edge COLUMNS are the shard halo (stale in p): the
        # corner cells ride the seam row in the kernel, so patch them
        # from the exchanged pre-step planes.
        gx_loc, gy_loc = loc_nx // tx, loc_ny // ty
        need_seam = bool(in_place) and gx_loc > 1 and gy_loc > 1
        seam = None
        if need_seam:
            seam = cs._extract_seam(p, tx, ring=1)
            if shard_axis == 1:
                seam = jnp.concatenate(
                    [cs._extract_seam(lo, tx, ring=1), seam[:, 1:-1],
                     cs._extract_seam(hi, tx, ring=1)], axis=1)
        live_subs = [s for s in subs if s is not None]
        if in_place and (live_subs or seam is not None):
            # The slab/seam extraction is p's second consumer; without
            # an explicit ordering the input-aliased kernel forces XLA
            # to COPY the whole per-shard state every step (measured
            # +8.4 ms/step at 291^3-class — exactly one 3.45 GB
            # read+write). The barrier sequences extraction before the
            # kernel, so the aliased buffer has one live consumer.
            pre = [seam] if seam is not None else []
            bar = jax.lax.optimization_barrier((p, *pre, *live_subs))
            p = bar[0]
            it = iter(bar[1:])
            if seam is not None:
                seam = next(it)
            subs = [next(it) if s is not None else None for s in subs]
        extra = list(nee_step)
        if tids_loc is not None:
            extra.append(tids_loc)
        if seam is not None:
            extra.append(seam)
        p_new, vs = cs._pallas_bulk(
            p, *extra, lo, hi, tau=tau, tx=tx, ty=ty,
            bcs_static=bcs_static, halo_axis=shard_axis,
            interpret=interpret, stx=stx, sty=sty,
            n_live=n_max, in_place=in_place, has_seam=need_seam,
            force=force, wall_velocity=wall_velocity, mrt=mrt, les=les,
        )
        if fixup_bcs:
            for bc, loc, win, sub in zip(fixup_bcs, fix_dicts, wins,
                                         subs):
                if win is None:
                    continue
                cc_loc = dataclasses.replace(cc_blk, fluid=fluid_loc)
                bc_loc = dataclasses.replace(bc, **loc)
                p_new, dvs = cs._fix_z_plane_windowed(
                    cc_loc, bc_loc, win, sub, p_new, t,
                    interpret=interpret,
                )
                vs = vs + dvs
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
    if tids_all is not None:
        in_specs.append(P(axis_name, None))
        extra_args.append(tids_all)
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

    # Dead-cell contract: pdf channels are ZERO at DEAD cells in every
    # unblocked view. Dead contents are never physics (no pull crosses a
    # wall), but the sharded exchange can park NaNs there — zeroing makes
    # whole-box consumers (checkpoints, norms, mass audits) safe.
    live = jnp.asarray(
        np.asarray(cc_pad.spec.mask) != int(CellType.DEAD))

    def unblock(Pstate):
        g = from_blocked(Pstate, ndev, shard_axis)
        ch = jnp.arange(g.shape[2])[None, None, :, None]
        # pdf channels (<19) zero at DEAD cells; the padding channel
        # (23) zero everywhere (the kernel never writes it, so the
        # output buffer holds uninitialized VMEM there); mask/bits
        # channels (19..22) pass through.
        keep = (live[:, :, None, :] | (ch >= 19)) & (ch != cs.C - 1)
        return jnp.where(keep, g, jnp.zeros((), g.dtype))

    return step, init_blocked, unblock


__all__ = [
    "make_pallas_sharded_step",
    "packed_initial_blocked",
    "shard_tile_lists",
    "to_blocked",
    "from_blocked",
]
