"""Fused D3Q19 collide+stream Pallas TPU kernel — the speed-of-light path.

Motivation (measured): the XLA expression of the fused step touches ~40 GB
of HBM per 256^3 step (16x the 2.5 GB algorithmic minimum) because the 19
shifted pulls, selects and the collision chain do not fuse — see
engine/step.py for the semantics. This kernel performs the entire step in
ONE pass: each tile is DMA'd into VMEM once (with one-cell x/y halos),
all 19 pulls become VMEM slices (+ lane rolls along z), the moments / BGK
/ bounce-back / selects run on the VPU, and the post-collision tile is
DMA'd back. Input and output DMAs are double-buffered and overlap with
compute across tiles.

Packed TPU layout (the key design decision): state lives as
    (NX+2, NY+2, C=24, NZ) float32
where channels 0..18 are the D3Q19 populations, channel 19 carries the
cell-type mask (exact small integers in f32), 20/21 the mask pre-rolled
along z, 22 the wall bitmask, 23 padding. Mosaic tiles the last two
memref dims (8, 128) in HBM as well as VMEM and requires DMA slices
there to be tile-aligned (a 22-channel state fails to compile); the
halo-sliced spatial axes (x, y) are therefore placed in the untiled
leading dims, channels fill the sublane dim (24 = 3x8, the minimum
aligned width >= 22 — the two extra channels are traffic-free), and z
occupies the 128-aligned lane
dim. The mask rides in the same DMA as the populations.

The x/y halo rings hold no physical cell; their contents are only ever
pulled into dead/ghost cells (every case keeps its boundary layer
non-fluid), so they never reach observable state. z is padded to a
multiple of 128 with dead cells (pad_spec), which is equally inert.

NEE boundary planes are handled OUTSIDE the kernel by recomputing the
one-cell-thick consumer planes with the reference dense ops
(engine/step semantics) and splicing them into the kernel output —
O(N^2) work vs the kernel's O(N^3).

The kernel fuses what the reference runs as two kernels per step
(update: ldc.cu:204-369; boundary_stream wall pass: Poiseulle.cu:601-746),
re-designed for TPU VMEM tiling.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.core.lattice import D3Q19
from lbm_tpu.core.rheology import tau_eff_from_p
from lbm_tpu.geometry.mask import CellType

_E = D3Q19.E
_OPP = D3Q19.OPP
_W = D3Q19.W

C = 24  # channels: 19 pdfs + mask + 2 z-shifted masks + bits + padding.
# 24 is BYTE-OPTIMAL, not padding waste: Mosaic tiles HBM memrefs'
# last two dims (8, 128) just like VMEM, and DMA slices must be
# tile-aligned — a 22-channel state fails to compile ("Slice shape
# along dimension 2 must be aligned to tiling (8), but is 22",
# measured r3). The minimum aligned width >= 19+3 is 24, so the bits
# channel (22) and pad (23) ride traffic-free; only COMPUTE on bits
# costs (the i32 AND chain measured 2x slower, hence bits=False
# default). Kernel shapes derive from the array's own channel dim.
MASK_CH = 19
MASK_ZP_CH = 20  # mask rolled +1 along z: pull-source mask for e_z = +1
MASK_ZM_CH = 21  # mask rolled -1 along z: pull-source mask for e_z = -1
BITS_CH = 22     # per-direction neighbor-wall bitmask (wall_bits)
# History: the hoisted wall-direction BITMASK (channel 22, 18 ANDs in
# place of 18 shifted-mask loads+compares) FAILED in round 1 at the
# then-default 4x8 sub-tile (1849 -> 1065 MLUPS: the 8-vreg hoisted
# value spilled, like the 3-pre-rolled-masks experiment at 1216) and
# was retried after the 1x8 sub-tile change made it a resident 2-vreg
# value (`bits=` flag on the kernel builders for A/B).


def wall_bits(mask):
    """(X, Y, Z) mask -> float32-bitcast i32 channel: bit i set iff the
    pull source of direction i (cell x - e_i, z-wrapped like the
    kernel's lane roll) is a WALL. One load + 18 integer ANDs replace
    the 18 shifted mask loads + fp compares in the pull loop — the
    neighbor-wall pattern is static, so it rides in the (previously
    padding) channel 22 for free."""
    from lbm_tpu.core.lattice import D3Q19

    wall = np.asarray(mask) == int(CellType.WALL)
    bits = np.zeros(wall.shape, np.uint32)
    for i in range(1, D3Q19.Q):
        ex, ey, ez = (int(v) for v in D3Q19.E[i])
        bits |= np.uint32(1 << i) * np.roll(
            wall, shift=(ex, ey, ez), axis=(0, 1, 2)
        ).astype(np.uint32)
    return bits.view(np.float32)


def pack_state(f, mask, dtype=jnp.float32, bits=False):
    """(19, X, Y, Z) f + (X, Y, Z) mask -> packed (X, Y, C, Z).

    Channels 20/21 carry the mask pre-rolled by +/-1 along z, so the
    kernel's 10 e_z != 0 wall tests become plain (sliced) loads instead
    of lane rolls — the rolls ride in the (traffic-free, see C above)
    alignment channels. With bits=True channel 22 carries the static
    neighbor-wall bitmask (wall_bits) for the opt-in bits kernel path;
    the default kernel never reads it, so the default skips the 19
    full-box host rolls wall_bits costs (~20 transient 126 MB arrays on
    the 31.5M-cell coronary) and writes zeros.

    dtype=jnp.bfloat16 stores the pdfs (and exact-small-int mask
    channels) at half the HBM bytes — the kernel computes in fp32 either
    way (loads widen, stores narrow). The f32-bitcast wall_bits channel
    cannot survive the narrowing and is zeroed; the bits=True kernel
    path requires f32 storage."""
    m = jnp.asarray(mask, jnp.float32)
    mzp = jnp.roll(m, +1, axis=2)
    mzm = jnp.roll(m, -1, axis=2)
    if bits and dtype == jnp.float32:
        wb = jnp.asarray(wall_bits(np.asarray(mask)))
    else:
        wb = jnp.zeros_like(m)
    zeros = jnp.zeros((C - BITS_CH - 1,) + f.shape[1:], jnp.float32)
    return jnp.concatenate(
        [f, m[None], mzp[None], mzm[None], wb[None], zeros], axis=0
    ).transpose(1, 2, 0, 3).astype(dtype)


def unpack_state(p):
    """Packed (X, Y, C, Z) -> (19, X, Y, Z) f32."""
    return p.transpose(2, 0, 1, 3)[:19].astype(jnp.float32)


def packed_initial_lowmem(spec_pad, dtype=jnp.float32, bits=False,
                          out_sharding=None, value_sharding=None):
    """Packed feq(rho0, u0) state built one channel at a time.

    The standard init (`pack_state(initial_f(cc), mask)`) materializes
    the dense (19, X, Y, Z) f alongside the packed (X, Y, C, Z) buffer;
    at 512^3 the pair is ~23 GB and cannot coexist in one chip's HBM.
    Here each feq channel is computed on the HOST (same fp32 expression
    as lattice.phi) and written into a donated device buffer, so device
    residency peaks at packed + one channel (~13.5 GB at 512^3).

    out_sharding/value_sharding: multi-chip hooks (the blocked sharded
    init, parallel/pallas_sharded.packed_initial_blocked) — the state
    buffer is created under out_sharding and full-box host values enter
    through value_sharding, so no device ever holds more than its shard
    of a channel.
    """
    X, Y, Z = (int(s) for s in spec_pad.shape)
    mask_np = np.asarray(spec_pad.mask, np.float32)
    rho = np.asarray(spec_pad.rho0, np.float32)
    u = np.asarray(spec_pad.u0, np.float32)
    E = D3Q19.E.astype(np.float32)
    W = D3Q19.W.astype(np.float32)

    def put_value(v):
        if value_sharding is None:
            return jnp.asarray(v)
        return jax.device_put(np.asarray(v), value_sharding)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
    def put_ch(p, v, ch):
        return p.at[:, :, ch, :].set(v.astype(p.dtype))

    def host_feq(i, rho_w, u_w, usq_w):
        cu = (E[i, 0] * u_w[0] + E[i, 1] * u_w[1] + E[i, 2] * u_w[2])
        # same op order as phi(): w * (1 + 3cu + 4.5cu^2 - 1.5|u|^2)
        ph = W[i] * (np.float32(1.0) + np.float32(3.0) * cu
                     + np.float32(4.5) * cu * cu
                     - np.float32(1.5) * usq_w)
        return rho_w * ph

    if out_sharding is None:
        p = jnp.zeros((X, Y, C, Z), dtype)
    else:
        p = jax.jit(
            lambda: jnp.zeros((X, Y, C, Z), dtype),
            out_shardings=out_sharding,
        )()
    nzu = np.any(u != 0.0, axis=0)
    if nzu.mean() < 0.01:
        # Most cells start at rest, where feq_i = W_i * rho exactly
        # (phi's bracket is 1.0): fill on DEVICE from one rho transfer,
        # then patch the nonzero-u bounding box from host values. At
        # 512^3 the naive 19-channel host stream took 13.3 min over the
        # axon tunnel (~16 MB/s effective); this path moves ~1 GB.
        rho_dev = put_value(rho)

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnums=(3,))
        def put_scaled(p, r, w, ch):
            return p.at[:, :, ch, :].set((w * r).astype(p.dtype))

        for i in range(D3Q19.Q):
            p = put_scaled(p, rho_dev, np.float32(W[i]), i)
        del rho_dev
        if nzu.any():
            xs, ys, zs = np.nonzero(nzu)
            x0, x1 = int(xs.min()), int(xs.max()) + 1
            y0, y1 = int(ys.min()), int(ys.max()) + 1
            # lane-align the z window (unaligned lane slices of a
            # multi-GB array provoke layout-changing copies)
            blk = 128 if Z % 128 == 0 else Z
            z0 = (int(zs.min()) // blk) * blk
            z1 = min(-(-(int(zs.max()) + 1) // blk) * blk, Z)
            uw = u[:, x0:x1, y0:y1, z0:z1]
            usq_w = (uw * uw).sum(axis=0, dtype=np.float32)
            rho_w = rho[x0:x1, y0:y1, z0:z1]
            val = np.stack(
                [host_feq(i, rho_w, uw, usq_w)
                 for i in range(D3Q19.Q)], axis=2,
            )

            @functools.partial(jax.jit, donate_argnums=(0,))
            def put_win(p, v):
                return p.at[x0:x1, y0:y1, :19, z0:z1].set(
                    v.astype(p.dtype))

            p = put_win(p, jnp.asarray(val))
    else:
        usq = (u * u).sum(axis=0, dtype=np.float32)
        for i in range(D3Q19.Q):
            p = put_ch(p, put_value(host_feq(i, rho, u, usq)), i)
    m_dev = put_value(mask_np)
    p = put_ch(p, m_dev, MASK_CH)
    p = put_ch(p, jnp.roll(m_dev, +1, axis=2), MASK_ZP_CH)
    p = put_ch(p, jnp.roll(m_dev, -1, axis=2), MASK_ZM_CH)
    del m_dev
    if bits and dtype == jnp.float32:  # opt-in f32-bitcast bitmask
        p = put_ch(p, jnp.asarray(wall_bits(spec_pad.mask)), BITS_CH)
    return p


def _tile_compute(ft, ot, tau: float, ex_x: int, ex_y: int,
                  gx0=None, gy0=None, bcs_static=(),
                  stx: int | None = None, sty: int | None = None,
                  vs_win=None, pure_zspan=None, bits=False,
                  vs_scr=None, force=None, wall_velocity=None,
                  mrt=None, les=None, gft=None, fforce=None):
    """All-VMEM tile update, computed in (stx, sty) SUB-TILES.

    ft: ref (ex_x+2, ex_y+2, C, nz) f32 — packed tile with x/y halos.
    ot: ref (ex_x, ex_y, C, nz) — output tile, written per channel (a
    stacked value would materialize an extra tile-sized copy; +18%).
    ex_x/ex_y: static compute extents (= ot's spatial shape).
    gx0/gy0: traced GLOBAL coords of ot's (0, 0) cell, used for the NEE
    consumer-plane velsum exclusion.
    bcs_static: static per-BC descriptors for axis-0/1 NEE boundaries.
    vs_win: optional static (rlo, rhi, clo, chi) in ot-local coords —
    only cells inside the window count toward velsum (the 2-step fused
    kernel's mid pass computes a 1-cell skirt shared with neighboring
    tiles, but each cell's speed must be summed exactly once).
    returns velsum_partial (scalar).

    Why sub-tiles: the DMA tile wants to be LARGE (halo re-read overhead
    (tx+2)(ty+2)/(tx ty): 1.9x at 4x8 vs 1.27x at 16x16 — pure-copy
    floors 7.18 vs 5.82 ms/step at 256^3), but Mosaic schedules the
    compute best on SMALL value shapes (full kernel 4x8 = 8.3 ms vs
    8x8 = 9.5). Sub-tiling decouples the two: one big DMA, compute
    swept in the small shape that won the sweep. Sub-tile halos are
    interior to the big tile's VMEM, so only slicing changes.
    """
    # tau is a static float (BGK) or a static (tau, tau_minus) pair
    # (TRT, CaseSpec.collision='trt'): inv_tau mirrors that shape down
    # into the sub-tile collide.
    if isinstance(tau, tuple):
        inv_tau = (np.float32(1.0 / tau[0]), np.float32(1.0 / tau[1]))
    else:
        inv_tau = np.float32(1.0 / tau)
    stx = ex_x if stx is None else stx
    sty = ex_y if sty is None else sty
    if ex_y % sty:
        # avoid ragged tail columns: a (1, 2)-sublane leftover value
        # (fuse2's mid pass: ey=18 at sty=8) uses 1/4 of a vreg and
        # schedules poorly — the largest divisor <= sty keeps every
        # sub-tile uniform (18 -> (1,6)x3; measured f2 8.36 -> 8.03
        # ms/step at 256^3; exact divisions are untouched)
        sty = max(d for d in range(1, sty + 1) if ex_y % d == 0)
    nz = ft.shape[-1]
    total = jnp.float32(0.0)
    for ox in range(0, ex_x, stx):
        for oy in range(0, ex_y, sty):
            if pure_zspan is not None:
                total = total + _subtile_compute_pure(
                    ft, ot, inv_tau, ox, oy,
                    min(stx, ex_x - ox), min(sty, ex_y - oy), nz,
                    pure_zspan, vs_win, vs_scr=vs_scr, force=force,
                    mrt=mrt, les=les,
                )
            else:
                total = total + _subtile_compute(
                    ft, ot, inv_tau, ox, oy,
                    min(stx, ex_x - ox), min(sty, ex_y - oy), nz,
                    gx0, gy0, bcs_static, vs_win, bits=bits,
                    vs_scr=vs_scr, force=force,
                    wall_velocity=wall_velocity, mrt=mrt, les=les,
                    gft=gft, fforce=fforce,
                )
    return total


def _vs_sum(contrib, vs_scr):
    """Reduce a (a, b, nz) velsum contribution to a scalar.

    With bf16 storage the sliced operands inherit nonzero sublane
    layout offsets from the (16, 128)-tiled scratch, and Mosaic rejects
    float ADD multi_reductions whose reduced dims carry offsets
    ("shape_invariant_numerics ... must have zero offsets", observed at
    256^3). Bouncing the value through a small f32 VMEM scratch and
    reducing the offset-0 read-back sidesteps the constraint; f32
    storage keeps the direct reduction."""
    if vs_scr is None:
        return jnp.sum(contrib)
    a, b, _ = contrib.shape
    vs_scr[0:a, 0:b, :] = contrib
    return jnp.sum(vs_scr[0:a, 0:b, :])


def _subtile_compute_pure(ft, ot, inv_tau, ox, oy, stx, sty, nz,
                          zspan, vs_win, vs_scr=None, force=None,
                          mrt=None, les=None):
    """Fast path for statically-classified PURE tiles (classify_tiles):
    every column of the tile's input region is the standard z-slab
    [DEAD.., WALL, FLUID x (zf1-zf0+1), WALL, DEAD..] with one common
    fluid span zspan=(zf0, zf1). All wall/fluid tests collapse to
    z-lane iota compares — no mask-channel loads, no bounce-back on the
    8 in-plane channels (their pull sources are all fluid), and
    fluid-selects only on the 10 e_z != 0 channels and the final z-lane
    passthrough."""
    zf0, zf1 = zspan
    odt = ot.dtype  # bf16 storage: widen loads, narrow stores (see
    # _subtile_compute; no-ops for f32)
    inv_tau_m = None  # TRT second rate (inv_tau arrives as a pair)
    if isinstance(inv_tau, tuple):
        inv_tau, inv_tau_m = inv_tau
    cx, cy = slice(1 + ox, 1 + ox + stx), slice(1 + oy, 1 + oy + sty)
    zi = jax.lax.broadcasted_iota(jnp.int32, (stx, sty, nz), 2)
    z_fluid = (zi >= zf0) & (zi <= zf1)

    def pulled(i):
        ex, ey, ez = (int(v) for v in _E[i])
        sx = slice(1 + ox - ex, 1 + ox - ex + stx)
        sy = slice(1 + oy - ey, 1 + oy - ey + sty)
        # Widen BEFORE any z roll: Mosaic has no sub-32-bit dynamic
        # rotate, so bf16 storage must come up to f32 first.
        piece = ft[sx, sy, i, :].astype(jnp.float32)
        if ez != 0:
            piece = pltpu.roll(piece, shift=ez % nz, axis=2)
            # pull source at z -/+ 1 is a wall exactly on the first/last
            # fluid lane — half-way bounce-back from the cell's own
            # opposite, no mask read needed
            src_wall = (zi == zf0) if ez > 0 else (zi == zf1)
            own_opp = ft[cx, cy, _OPP[i], :]
            piece = jnp.where(src_wall, own_opp, piece)
        return piece.astype(jnp.float32)

    rho = ft[cx, cy, 0, :].astype(jnp.float32)
    mx = jnp.zeros_like(rho)
    my = jnp.zeros_like(rho)
    mz = jnp.zeros_like(rho)
    vals = [rho]
    for i in range(1, 19):
        v = pulled(i)
        vals.append(v)
        rho = rho + v
        ex, ey, ez = (int(c) for c in _E[i])
        if ex:
            mx = mx + v if ex > 0 else mx - v
        if ey:
            my = my + v if ey > 0 else my - v
        if ez:
            mz = mz + v if ez > 0 else mz - v
    if force is not None:  # Guo half-force velocity shift (engine/step)
        mx = mx + np.float32(0.5 * force[0])
        my = my + np.float32(0.5 * force[1])
        mz = mz + np.float32(0.5 * force[2])
    inv_rho = np.float32(1.0) / jnp.where(rho == 0.0, np.float32(1.0), rho)
    ux, uy, uz = mx * inv_rho, my * inv_rho, mz * inv_rho
    usq = ux * ux + uy * uy + uz * uz
    common = np.float32(1.0) - np.float32(1.5) * usq

    oxs, oys = slice(ox, ox + stx), slice(oy, oy + sty)
    if force is not None:  # Guo source (see _subtile_compute)
        cp_f = np.float32(1.0 - 0.5 * float(inv_tau))
        cm_f = (cp_f if inv_tau_m is None
                else np.float32(1.0 - 0.5 * float(inv_tau_m)))
        uF = (ux * np.float32(force[0]) + uy * np.float32(force[1])
              + uz * np.float32(force[2]))
    if les is not None:
        # Per-cell tau closure (core/rheology: Smagorinsky LES or
        # non-Newtonian nu(gamma)): Pi_ab is parity-EVEN, so only the
        # 9 pair sums of f_neq feed it (the rest and all pair diffs
        # drop); the per-cell tau_eff then drives a plain BGK relax.
        # Static coefficients of Pi are e_a e_b in {0, +-1} — pure
        # adds.
        pairs_l = [(i, int(_OPP[i])) for i in range(1, 19)
                   if int(_OPP[i]) > i]
        feq0_l = rho * np.float32(_W[0]) * common
        fneq_l = [None] * 19
        fneq_l[0] = vals[0] - feq0_l
        s_l = {}
        for i, o in pairs_l:
            ex, ey, ez = (int(c) for c in _E[i])
            cu = jnp.zeros_like(ux)
            if ex:
                cu = cu + ux if ex > 0 else cu - ux
            if ey:
                cu = cu + uy if ey > 0 else cu - uy
            if ez:
                cu = cu + uz if ez > 0 else cu - uz
            w = np.float32(_W[i])
            ev = rho * (w * (common + np.float32(4.5) * cu * cu))
            od = rho * (w * np.float32(3.0)) * cu
            fneq_l[i] = vals[i] - (ev + od)
            fneq_l[o] = vals[o] - (ev - od)
            s_l[i] = fneq_l[i] + fneq_l[o]
        def _pi(a, b):
            acc = None
            for i, o in pairs_l:
                cab = int(_E[i][a]) * int(_E[i][b])
                if cab == 0:
                    continue
                term = s_l[i] if cab == 1 else -s_l[i]
                acc = term if acc is None else acc + term
            return acc
        pxx, pyy, pzz = _pi(0, 0), _pi(1, 1), _pi(2, 2)
        pxy, pxz, pyz = _pi(0, 1), _pi(0, 2), _pi(1, 2)
        p_l = jnp.sqrt(np.float32(2.0) * (
            pxx * pxx + pyy * pyy + pzz * pzz
            + np.float32(2.0) * (pxy * pxy + pxz * pxz + pyz * pyz)))
        te = tau_eff_from_p(p_l, inv_rho, 1.0 / float(inv_tau), les)
        inv_te = np.float32(1.0) / te
        if inv_tau_m is not None:   # closure + TRT (see full path)
            lam = np.float32(
                (1.0 / float(inv_tau) - 0.5)
                * (1.0 / float(inv_tau_m) - 0.5))
            inv_te_m = np.float32(1.0) / (
                np.float32(0.5) + lam / (te - np.float32(0.5)))
            h_p = np.float32(0.5) * inv_te
            h_m = np.float32(0.5) * inv_te_m
            out0 = vals[0] - inv_te * fneq_l[0]
            ot[oxs, oys, 0, :] = jnp.where(
                z_fluid, out0, ft[cx, cy, 0, :]).astype(odt)
            for i, o in pairs_l:
                d_l = fneq_l[i] - fneq_l[o]
                ev_t = h_p * s_l[i]
                od_t = h_m * d_l
                ot[oxs, oys, i, :] = jnp.where(
                    z_fluid, vals[i] - (ev_t + od_t),
                    ft[cx, cy, i, :]).astype(odt)
                ot[oxs, oys, o, :] = jnp.where(
                    z_fluid, vals[o] - (ev_t - od_t),
                    ft[cx, cy, o, :]).astype(odt)
        else:
            for i in range(19):
                out_v = vals[i] - inv_te * fneq_l[i]
                ot[oxs, oys, i, :] = jnp.where(
                    z_fluid, out_v, ft[cx, cy, i, :]
                ).astype(odt)
    elif mrt is not None:
        # MRT (core/mrt.mrt_rank_update) in PARITY-PAIRED form: basis
        # rows have definite parity, so even rows consume only the 9
        # pair SUMS of f_neq (+ the rest), odd rows only the 9 pair
        # DIFFS, and the scatter back shares one even/odd accumulator
        # per pair — roughly half the FMAs of the naive 19x19 walk
        # (measured 1250 -> see PARITY for the current number).
        rows_m, coefs_m = mrt
        pairs_m = [(i, int(_OPP[i])) for i in range(1, 19)
                   if int(_OPP[i]) > i]
        feq0_m = rho * np.float32(_W[0]) * common
        fneq0_m = vals[0] - feq0_m
        base_m = [None] * 19
        base_m[0] = vals[0] - inv_tau * fneq0_m
        s_m, d_m = {}, {}
        for i, o in pairs_m:
            ex, ey, ez = (int(c) for c in _E[i])
            cu = jnp.zeros_like(ux)
            if ex:
                cu = cu + ux if ex > 0 else cu - ux
            if ey:
                cu = cu + uy if ey > 0 else cu - uy
            if ez:
                cu = cu + uz if ez > 0 else cu - uz
            w = np.float32(_W[i])
            ev = rho * (w * (common + np.float32(4.5) * cu * cu))
            od = rho * (w * np.float32(3.0)) * cu
            fni = vals[i] - (ev + od)
            fno = vals[o] - (ev - od)
            s_m[i] = fni + fno
            d_m[i] = fni - fno
            base_m[i] = vals[i] - inv_tau * fni
            base_m[o] = vals[o] - inv_tau * fno
        movs_m = []  # (is_even, mv, row)
        for r_row, c_r in zip(rows_m, coefs_m):
            is_even = all(
                abs(r_row[j] - r_row[int(_OPP[j])]) < 1e-9
                for j in range(19))
            acc = None
            if is_even and r_row[0] != 0.0:
                acc = (fneq0_m if r_row[0] == 1.0
                       else np.float32(r_row[0]) * fneq0_m)
            for i, o in pairs_m:
                a = float(r_row[i])
                if a == 0.0:
                    continue
                src_v = s_m[i] if is_even else d_m[i]
                term = src_v if a == 1.0 else np.float32(a) * src_v
                acc = term if acc is None else acc + term
            movs_m.append((is_even, np.float32(c_r) * acc, r_row))
        out0 = base_m[0]
        for is_even, mv, r_row in movs_m:
            if is_even and r_row[0] != 0.0:
                out0 = out0 + (mv if r_row[0] == 1.0
                               else np.float32(r_row[0]) * mv)
        ot[oxs, oys, 0, :] = jnp.where(
            z_fluid, out0, ft[cx, cy, 0, :]
        ).astype(odt)
        for i, o in pairs_m:
            ev_acc = None
            od_acc = None
            for is_even, mv, r_row in movs_m:
                a = float(r_row[i])
                if a == 0.0:
                    continue
                term = mv if a == 1.0 else np.float32(a) * mv
                if is_even:
                    ev_acc = term if ev_acc is None else ev_acc + term
                else:
                    od_acc = term if od_acc is None else od_acc + term
            out_i = base_m[i]
            out_o = base_m[o]
            if ev_acc is not None:
                out_i = out_i + ev_acc
                out_o = out_o + ev_acc
            if od_acc is not None:
                out_i = out_i + od_acc
                out_o = out_o - od_acc
            ot[oxs, oys, i, :] = jnp.where(
                z_fluid, out_i, ft[cx, cy, i, :]
            ).astype(odt)
            ot[oxs, oys, o, :] = jnp.where(
                z_fluid, out_o, ft[cx, cy, o, :]
            ).astype(odt)
    else:
        f0 = vals[0]
        feq0 = rho * np.float32(_W[0]) * common
        post_0 = f0 - (f0 - feq0) * inv_tau
        if force is not None:
            post_0 = post_0 + np.float32(-3.0 * cp_f * float(_W[0])) * uF
        ot[oxs, oys, 0, :] = jnp.where(z_fluid, post_0, f0).astype(odt)
    rho_tau = rho * inv_tau
    keep = np.float32(1.0) - inv_tau
    if inv_tau_m is not None:  # TRT parity split (see _subtile_compute)
        rho_tau_m = rho * inv_tau_m
        # f' = a f_i + b f_o + even + odd with STATIC a = 1-hp-hm,
        # b = hm-hp (the parity split distributed over the pair) —
        # same op count as BGK plus one FMA.
        hp = 0.5 * float(inv_tau)
        hm = 0.5 * float(inv_tau_m)
        keep_a = np.float32(1.0 - hp - hm)
        keep_b = np.float32(hm - hp)
    for i in range(1, 19) if (mrt is None and les is None) else ():
        o = int(_OPP[i])
        if o < i:
            continue
        ex, ey, ez = (int(c) for c in _E[i])
        cu = jnp.zeros_like(ux)
        if ex:
            cu = cu + ux if ex > 0 else cu - ux
        if ey:
            cu = cu + uy if ey > 0 else cu - uy
        if ez:
            cu = cu + uz if ez > 0 else cu - uz
        w = np.float32(_W[i])
        even = rho_tau * (w * (common + np.float32(4.5) * cu * cu))
        if inv_tau_m is None:
            odd = rho_tau * (w * np.float32(3.0)) * cu
            post_i = vals[i] * keep + even + odd
            post_o = vals[o] * keep + even - odd
        else:
            odd = rho_tau_m * (w * np.float32(3.0)) * cu
            post_i = keep_a * vals[i] + keep_b * vals[o] + even + odd
            post_o = keep_a * vals[o] + keep_b * vals[i] + even - odd
        if force is not None:
            eF = float(_E[i].astype(np.float64) @ np.asarray(force))
            se = np.float32(-3.0 * cp_f * w) * uF
            if eF:
                se = se + np.float32(9.0 * cp_f * w * eF) * cu
                so = np.float32(3.0 * cm_f * w * eF)
                post_i = post_i + (se + so)
                post_o = post_o + (se - so)
            else:
                post_i = post_i + se
                post_o = post_o + se
        ot[oxs, oys, i, :] = jnp.where(
            z_fluid, post_i, ft[cx, cy, i, :]
        ).astype(odt)
        ot[oxs, oys, o, :] = jnp.where(
            z_fluid, post_o, ft[cx, cy, o, :]
        ).astype(odt)
    for ch in range(MASK_CH, min(ot.shape[2], BITS_CH + 1)):
        ot[oxs, oys, ch, :] = ft[cx, cy, ch, :].astype(odt)
    if vs_win is not None:
        rlo, rhi, clo, chi = vs_win
        if (ox >= rhi or ox + stx <= rlo
                or oy >= chi or oy + sty <= clo):
            return jnp.float32(0.0)
    count = z_fluid
    if vs_win is not None:
        if not (ox >= rlo and ox + stx <= rhi):
            ridx = jax.lax.broadcasted_iota(
                jnp.int32, (stx, sty, nz), 0) + ox
            count = count & (ridx >= rlo) & (ridx < rhi)
        if not (oy >= clo and oy + sty <= chi):
            cidx = jax.lax.broadcasted_iota(
                jnp.int32, (stx, sty, nz), 1) + oy
            count = count & (cidx >= clo) & (cidx < chi)
    return _vs_sum(jnp.where(count, jnp.sqrt(usq), np.float32(0.0)),
                   vs_scr)


def _subtile_compute(ft, ot, inv_tau, ox, oy, stx, sty, nz,
                     gx0, gy0, bcs_static, vs_win, bits=False,
                     vs_scr=None, force=None, wall_velocity=None,
                     mrt=None, les=None, gft=None, fforce=None):
    # Storage may be bf16 (pack_state dtype=): every pdf load widens to
    # fp32 (_f32), collision runs in fp32, stores narrow to ot's dtype
    # (_st). Both casts are no-ops for f32 storage. Mask-channel values
    # are exact small integers in either dtype, so wall/fluid tests
    # compare in the storage dtype directly.
    odt = ot.dtype
    inv_tau_m = None  # TRT second rate (inv_tau arrives as a pair)
    if isinstance(inv_tau, tuple):
        inv_tau, inv_tau_m = inv_tau
    cx, cy = slice(1 + ox, 1 + ox + stx), slice(1 + oy, 1 + oy + sty)
    # Mask channels widen to f32 BEFORE comparing (exact small ints in
    # either dtype): a bool born from a bf16 compare carries a 16-bit
    # vector layout that Mosaic cannot mix into the f32 selects and the
    # velsum multi_reduction (observed compile failure at 256^3).
    m_ctr = ft[cx, cy, MASK_CH, :].astype(jnp.float32)
    is_fluid = m_ctr == np.float32(int(CellType.FLUID))

    # Per-cell Boussinesq force field (fforce = (buoy, c_ref, base)):
    # F = buoy * (c - c_ref) at fluid cells (+ base everywhere), with
    # c the PRE-update scalar summed from the g tile's 7 channels —
    # the kernel mirror of engine/thermal.BuoyantTransport._force_field
    # (flow advances with the previous step's temperature). Components
    # with a statically-zero buoyancy and base stay None, so e.g. a
    # z-only gravity pays force arithmetic on 5 of 9 pairs only.
    fF = None
    if fforce is not None:
        buoy, c_ref, base = fforce
        o_xs, o_ys = slice(ox, ox + stx), slice(oy, oy + sty)
        cph = gft[o_xs, o_ys, 0, :].astype(jnp.float32)
        for q7 in range(1, 7):
            cph = cph + gft[o_xs, o_ys, q7, :].astype(jnp.float32)
        dc = jnp.where(is_fluid, cph - np.float32(c_ref),
                       np.float32(0.0))
        fF = []
        for a in range(3):
            b = float(buoy[a])
            bs = None if base is None else float(base[a])
            if b == 0.0 and not bs:
                fF.append(None)
            elif b == 0.0:
                fF.append(jnp.full_like(dc, np.float32(bs)))
            else:
                v = np.float32(b) * dc
                if bs:
                    v = v + np.float32(bs)
                fF.append(v)

    # Per-direction wall tests. bits=True: ONE hoisted i32 bitmask
    # (channel 22, wall_bits) + an AND per direction — replaces 18
    # shifted mask loads and fp compares. Measured DEAD LAST both
    # rounds: 4x8 sub-tile 1849->1065 MLUPS (round 1, vreg spills),
    # 1x8 sub-tile 6.02->12.24 ms/step at 256^3 16x16 (round 2/3 —
    # Mosaic schedules the int bitcast+AND chain far worse than the
    # fp compares it replaces). Default OFF. bits=False: per-direction
    # shifted-mask load + compare; e_z != 0 reads the PRE-ROLLED mask
    # channels (20/21), so only the pdf planes pay a lane roll.
    if bits:
        if wall_velocity is not None:
            raise ValueError("bits kernel path has no mask loads for "
                             "the MOVING test — use bits=False")
        mb = jax.lax.bitcast_convert_type(
            ft[cx, cy, BITS_CH, :], jnp.int32
        )
    if wall_velocity is not None:
        from lbm_tpu.engine.step import moving_bb_terms
        bb = moving_bb_terms(wall_velocity)

    def pulled(i):
        ex, ey, ez = (int(v) for v in _E[i])
        sx = slice(1 + ox - ex, 1 + ox - ex + stx)
        sy = slice(1 + oy - ey, 1 + oy - ey + sty)
        # Widen BEFORE any z roll: Mosaic has no sub-32-bit dynamic
        # rotate, so bf16 storage must come up to f32 first.
        piece = ft[sx, sy, i, :].astype(jnp.float32)
        if ez != 0:
            piece = pltpu.roll(piece, shift=ez % nz, axis=2)
        own_opp = ft[cx, cy, _OPP[i], :]
        if bits:
            src_wall = (mb & np.int32(1 << i)) != 0
        elif ez != 0:
            nbr = ft[sx, sy, MASK_ZP_CH if ez > 0 else MASK_ZM_CH,
                     :].astype(jnp.float32)
            src_wall = nbr == np.float32(int(CellType.WALL))
        else:
            nbr = ft[sx, sy, MASK_CH, :].astype(jnp.float32)
            src_wall = nbr == np.float32(int(CellType.WALL))
        v = jnp.where(src_wall, own_opp, piece)
        if wall_velocity is not None:  # Ladd term: same nbr load,
            # one extra compare+select, static per-direction constant
            src_mov = nbr == np.float32(int(CellType.MOVING))
            v = jnp.where(src_mov, own_opp + np.float32(bb[i]), v)
        return v.astype(jnp.float32)

    # Pass 1: moments (VPU adds; a 19x3 contraction needs no MXU). Pulled
    # values are kept live in VMEM for the collide pass.
    rho = ft[cx, cy, 0, :].astype(jnp.float32)
    mx = jnp.zeros_like(rho)
    my = jnp.zeros_like(rho)
    mz = jnp.zeros_like(rho)
    vals = [rho]
    for i in range(1, 19):
        v = pulled(i)
        vals.append(v)
        rho = rho + v
        ex, ey, ez = (int(c) for c in _E[i])
        if ex:
            mx = mx + v if ex > 0 else mx - v
        if ey:
            my = my + v if ey > 0 else my - v
        if ez:
            mz = mz + v if ez > 0 else mz - v
    if force is not None:  # Guo half-force velocity shift (engine/step)
        mx = mx + np.float32(0.5 * force[0])
        my = my + np.float32(0.5 * force[1])
        mz = mz + np.float32(0.5 * force[2])
    if fF is not None:  # per-cell half-force shift (field mode)
        if fF[0] is not None:
            mx = mx + np.float32(0.5) * fF[0]
        if fF[1] is not None:
            my = my + np.float32(0.5) * fF[1]
        if fF[2] is not None:
            mz = mz + np.float32(0.5) * fF[2]
    inv_rho = np.float32(1.0) / jnp.where(rho == 0.0, np.float32(1.0), rho)
    ux, uy, uz = mx * inv_rho, my * inv_rho, mz * inv_rho
    usq = ux * ux + uy * uy + uz * uz
    common = np.float32(1.0) - np.float32(1.5) * usq

    oxs, oys = slice(ox, ox + stx), slice(oy, oy + sty)
    # Pass 2: BGK collide + fluid select, written straight into the
    # output tile. Opposite-direction pairs share their equilibrium
    # terms: feq_{i,opp} = w rho (common + 4.5 cu^2) +/- 3 w rho cu — the
    # classic pairwise LBM factorization, ~30% fewer VPU ops than the
    # naive per-direction form.
    if force is not None:
        # Guo source, parity-split (engine/step.guo_source): the even
        # part rides the pair's shared terms (one uF field + a static
        # scalar per direction), the odd part is a compile-time scalar.
        cp_f = np.float32(1.0 - 0.5 * float(inv_tau))
        cm_f = (cp_f if inv_tau_m is None
                else np.float32(1.0 - 0.5 * float(inv_tau_m)))
        uF = (ux * np.float32(force[0]) + uy * np.float32(force[1])
              + uz * np.float32(force[2]))
    elif fF is not None:
        # field-mode Guo source: same parity split, but e_i.F and u.F
        # are per-cell arrays (None components drop their terms)
        cp_f = np.float32(1.0 - 0.5 * float(inv_tau))
        cm_f = (cp_f if inv_tau_m is None
                else np.float32(1.0 - 0.5 * float(inv_tau_m)))
        uF = None
        for a, ua in enumerate((ux, uy, uz)):
            if fF[a] is not None:
                t_ = ua * fF[a]
                uF = t_ if uF is None else uF + t_
        if uF is None:
            uF = jnp.zeros_like(ux)
    if les is not None:
        # Per-cell tau closure (core/rheology: Smagorinsky LES or
        # non-Newtonian nu(gamma)): Pi_ab is parity-EVEN, so only the
        # 9 pair sums of f_neq feed it (the rest and all pair diffs
        # drop); the per-cell tau_eff then drives a plain BGK relax.
        # Static coefficients of Pi are e_a e_b in {0, +-1} — pure
        # adds.
        pairs_l = [(i, int(_OPP[i])) for i in range(1, 19)
                   if int(_OPP[i]) > i]
        feq0_l = rho * np.float32(_W[0]) * common
        fneq_l = [None] * 19
        fneq_l[0] = vals[0] - feq0_l
        s_l = {}
        for i, o in pairs_l:
            ex, ey, ez = (int(c) for c in _E[i])
            cu = jnp.zeros_like(ux)
            if ex:
                cu = cu + ux if ex > 0 else cu - ux
            if ey:
                cu = cu + uy if ey > 0 else cu - uy
            if ez:
                cu = cu + uz if ez > 0 else cu - uz
            w = np.float32(_W[i])
            ev = rho * (w * (common + np.float32(4.5) * cu * cu))
            od = rho * (w * np.float32(3.0)) * cu
            fneq_l[i] = vals[i] - (ev + od)
            fneq_l[o] = vals[o] - (ev - od)
            s_l[i] = fneq_l[i] + fneq_l[o]
        def _pi(a, b):
            acc = None
            for i, o in pairs_l:
                cab = int(_E[i][a]) * int(_E[i][b])
                if cab == 0:
                    continue
                term = s_l[i] if cab == 1 else -s_l[i]
                acc = term if acc is None else acc + term
            return acc
        pxx, pyy, pzz = _pi(0, 0), _pi(1, 1), _pi(2, 2)
        pxy, pxz, pyz = _pi(0, 1), _pi(0, 2), _pi(1, 2)
        p_l = jnp.sqrt(np.float32(2.0) * (
            pxx * pxx + pyy * pyy + pzz * pzz
            + np.float32(2.0) * (pxy * pxy + pxz * pxz + pyz * pyz)))
        te = tau_eff_from_p(p_l, inv_rho, 1.0 / float(inv_tau), les)
        inv_te = np.float32(1.0) / te
        if inv_tau_m is not None:
            # closure + TRT (r5, engine/step.closure_tau_minus): the
            # even parity relaxes at the per-cell tau_eff, the odd at
            # the constant-magic-Lambda rate te_m = 1/2 + Lam/(te-1/2)
            # — the pair sums s_l are in hand; diffs cost one sub each
            lam = np.float32(
                (1.0 / float(inv_tau) - 0.5)
                * (1.0 / float(inv_tau_m) - 0.5))
            inv_te_m = np.float32(1.0) / (
                np.float32(0.5) + lam / (te - np.float32(0.5)))
            h_p = np.float32(0.5) * inv_te
            h_m = np.float32(0.5) * inv_te_m
            out0 = vals[0] - inv_te * fneq_l[0]   # rest: own partner
            ot[oxs, oys, 0, :] = jnp.where(
                is_fluid, out0, ft[cx, cy, 0, :]).astype(odt)
            for i, o in pairs_l:
                d_l = fneq_l[i] - fneq_l[o]
                ev_t = h_p * s_l[i]
                od_t = h_m * d_l
                out_i = vals[i] - (ev_t + od_t)
                out_o = vals[o] - (ev_t - od_t)
                ot[oxs, oys, i, :] = jnp.where(
                    is_fluid, out_i, ft[cx, cy, i, :]).astype(odt)
                ot[oxs, oys, o, :] = jnp.where(
                    is_fluid, out_o, ft[cx, cy, o, :]).astype(odt)
        else:
            for i in range(19):
                out_v = vals[i] - inv_te * fneq_l[i]
                ot[oxs, oys, i, :] = jnp.where(
                    is_fluid, out_v, ft[cx, cy, i, :]
                ).astype(odt)
    elif mrt is not None:
        # MRT (core/mrt.mrt_rank_update) in PARITY-PAIRED form: basis
        # rows have definite parity, so even rows consume only the 9
        # pair SUMS of f_neq (+ the rest), odd rows only the 9 pair
        # DIFFS, and the scatter back shares one even/odd accumulator
        # per pair — roughly half the FMAs of the naive 19x19 walk
        # (measured 1250 -> see PARITY for the current number).
        rows_m, coefs_m = mrt
        pairs_m = [(i, int(_OPP[i])) for i in range(1, 19)
                   if int(_OPP[i]) > i]
        feq0_m = rho * np.float32(_W[0]) * common
        fneq0_m = vals[0] - feq0_m
        base_m = [None] * 19
        base_m[0] = vals[0] - inv_tau * fneq0_m
        s_m, d_m = {}, {}
        for i, o in pairs_m:
            ex, ey, ez = (int(c) for c in _E[i])
            cu = jnp.zeros_like(ux)
            if ex:
                cu = cu + ux if ex > 0 else cu - ux
            if ey:
                cu = cu + uy if ey > 0 else cu - uy
            if ez:
                cu = cu + uz if ez > 0 else cu - uz
            w = np.float32(_W[i])
            ev = rho * (w * (common + np.float32(4.5) * cu * cu))
            od = rho * (w * np.float32(3.0)) * cu
            fni = vals[i] - (ev + od)
            fno = vals[o] - (ev - od)
            s_m[i] = fni + fno
            d_m[i] = fni - fno
            base_m[i] = vals[i] - inv_tau * fni
            base_m[o] = vals[o] - inv_tau * fno
        movs_m = []  # (is_even, mv, row)
        for r_row, c_r in zip(rows_m, coefs_m):
            is_even = all(
                abs(r_row[j] - r_row[int(_OPP[j])]) < 1e-9
                for j in range(19))
            acc = None
            if is_even and r_row[0] != 0.0:
                acc = (fneq0_m if r_row[0] == 1.0
                       else np.float32(r_row[0]) * fneq0_m)
            for i, o in pairs_m:
                a = float(r_row[i])
                if a == 0.0:
                    continue
                src_v = s_m[i] if is_even else d_m[i]
                term = src_v if a == 1.0 else np.float32(a) * src_v
                acc = term if acc is None else acc + term
            movs_m.append((is_even, np.float32(c_r) * acc, r_row))
        out0 = base_m[0]
        for is_even, mv, r_row in movs_m:
            if is_even and r_row[0] != 0.0:
                out0 = out0 + (mv if r_row[0] == 1.0
                               else np.float32(r_row[0]) * mv)
        ot[oxs, oys, 0, :] = jnp.where(
            is_fluid, out0, ft[cx, cy, 0, :]
        ).astype(odt)
        for i, o in pairs_m:
            ev_acc = None
            od_acc = None
            for is_even, mv, r_row in movs_m:
                a = float(r_row[i])
                if a == 0.0:
                    continue
                term = mv if a == 1.0 else np.float32(a) * mv
                if is_even:
                    ev_acc = term if ev_acc is None else ev_acc + term
                else:
                    od_acc = term if od_acc is None else od_acc + term
            out_i = base_m[i]
            out_o = base_m[o]
            if ev_acc is not None:
                out_i = out_i + ev_acc
                out_o = out_o + ev_acc
            if od_acc is not None:
                out_i = out_i + od_acc
                out_o = out_o - od_acc
            ot[oxs, oys, i, :] = jnp.where(
                is_fluid, out_i, ft[cx, cy, i, :]
            ).astype(odt)
            ot[oxs, oys, o, :] = jnp.where(
                is_fluid, out_o, ft[cx, cy, o, :]
            ).astype(odt)
    if mrt is None and les is None:
        f0 = vals[0]
        feq0 = rho * np.float32(_W[0]) * common
        post_0 = f0 - (f0 - feq0) * inv_tau
        if force is not None or fF is not None:
            post_0 = post_0 + np.float32(-3.0 * cp_f * float(_W[0])) * uF
        ot[oxs, oys, 0, :] = jnp.where(is_fluid, post_0, f0).astype(odt)
    rho_tau = rho * inv_tau
    keep = np.float32(1.0) - inv_tau
    if inv_tau_m is not None:
        # TRT (engine/step.collide): the pair loop already shares the
        # even/odd equilibrium terms, so the parity split costs only
        # the two pair sums + two extra FMAs per pair.
        rho_tau_m = rho * inv_tau_m
        # f' = a f_i + b f_o + even + odd with STATIC a = 1-hp-hm,
        # b = hm-hp (the parity split distributed over the pair) —
        # same op count as BGK plus one FMA.
        hp = 0.5 * float(inv_tau)
        hm = 0.5 * float(inv_tau_m)
        keep_a = np.float32(1.0 - hp - hm)
        keep_b = np.float32(hm - hp)
    for i in range(1, 19) if (mrt is None and les is None) else ():
        o = int(_OPP[i])
        if o < i:
            continue  # handled with its partner
        ex, ey, ez = (int(c) for c in _E[i])
        cu = jnp.zeros_like(ux)
        if ex:
            cu = cu + ux if ex > 0 else cu - ux
        if ey:
            cu = cu + uy if ey > 0 else cu - uy
        if ez:
            cu = cu + uz if ez > 0 else cu - uz
        w = np.float32(_W[i])
        even = rho_tau * (w * (common + np.float32(4.5) * cu * cu))
        if inv_tau_m is None:
            odd = rho_tau * (w * np.float32(3.0)) * cu
            post_i = vals[i] * keep + even + odd
            post_o = vals[o] * keep + even - odd
        else:
            odd = rho_tau_m * (w * np.float32(3.0)) * cu
            post_i = keep_a * vals[i] + keep_b * vals[o] + even + odd
            post_o = keep_a * vals[o] + keep_b * vals[i] + even - odd
        if force is not None:
            eF = float(_E[i].astype(np.float64) @ np.asarray(force))
            se = np.float32(-3.0 * cp_f * w) * uF
            if eF:
                se = se + np.float32(9.0 * cp_f * w * eF) * cu
                so = np.float32(3.0 * cm_f * w * eF)
                post_i = post_i + (se + so)
                post_o = post_o + (se - so)
            else:
                post_i = post_i + se
                post_o = post_o + se
        elif fF is not None:
            se = np.float32(-3.0 * cp_f * w) * uF
            eFv = None
            for a in range(3):
                ea = int(_E[i][a])
                if ea and fF[a] is not None:
                    t_ = fF[a] if ea > 0 else -fF[a]
                    eFv = t_ if eFv is None else eFv + t_
            if eFv is not None:
                se = se + np.float32(9.0 * cp_f * w) * (eFv * cu)
                so = np.float32(3.0 * cm_f * w) * eFv
                post_i = post_i + (se + so)
                post_o = post_o + (se - so)
            else:
                post_i = post_i + se
                post_o = post_o + se
        ot[oxs, oys, i, :] = jnp.where(
            is_fluid, post_i, ft[cx, cy, i, :]
        ).astype(odt)
        ot[oxs, oys, o, :] = jnp.where(
            is_fluid, post_o, ft[cx, cy, o, :]
        ).astype(odt)
    # Mask (+ bitmask, when present) channels pass through unchanged;
    # the bits-mode padding channel 23 is never read — skip its copy.
    for ch in range(MASK_CH, min(ot.shape[2], BITS_CH + 1)):
        ot[oxs, oys, ch, :] = ft[cx, cy, ch, :].astype(odt)
    # Fluid speed sum, EXCLUDING rows a _row_fix will overwrite (those
    # rows' post-NEE contribution is added by the row fix itself) and
    # cells outside the velsum window (2-step mid-pass skirt cells are
    # owned — and counted — by the neighboring tile).
    if vs_win is not None:
        rlo, rhi, clo, chi = vs_win
        if (ox >= rhi or ox + stx <= rlo
                or oy >= chi or oy + sty <= clo):
            return jnp.float32(0.0)  # fully outside (writes already done)
    count = is_fluid
    for bc in bcs_static:
        if bc.axis == 0:
            ids = jax.lax.broadcasted_iota(jnp.int32, (stx, sty, nz), 0) \
                + gx0 + ox
        else:
            ids = jax.lax.broadcasted_iota(jnp.int32, (stx, sty, nz), 1) \
                + gy0 + oy
        count = count & (ids != bc.c)
    if vs_win is not None:
        # static per-subtile: mask only the dims that straddle the border
        if not (ox >= rlo and ox + stx <= rhi):
            ridx = jax.lax.broadcasted_iota(
                jnp.int32, (stx, sty, nz), 0) + ox
            count = count & (ridx >= rlo) & (ridx < rhi)
        if not (oy >= clo and oy + sty <= chi):
            cidx = jax.lax.broadcasted_iota(
                jnp.int32, (stx, sty, nz), 1) + oy
            count = count & (cidx >= clo) & (cidx < chi)
    return _vs_sum(jnp.where(count, jnp.sqrt(usq), np.float32(0.0)),
                   vs_scr)


def _row_fix(ft, ot_slot, bc, nee, r, lat0, tau: float, vs_lat=None,
             vs_scr=None, force=None, wall_velocity=None, mrt=None,
             les=None):
    """Recompute ONE consumer-plane row of a tile with the NEE boundary
    applied, and overwrite it in the output tile. Runs only for tiles
    intersecting the plane (under pl.when in the kernel), so the whole
    NEE machinery is O(N^2) per step.

    r: traced ot-local row index of the consumer plane (ft carries a
    one-cell halo around ot, so ft row 1+r is the same physical row).
    lat0: traced GLOBAL lateral coordinate of ot's lateral 0 (indexes
    the full-extent nee table). vs_lat: optional static (vlo, vhi)
    ot-local lateral window restricting the returned velsum (the 2-step
    mid pass owns only its interior columns).

    Exactly reproduces the dense fixup (engine/step.apply_bc_fixup +
    collide) on the row: pulls with wall bounce-back, NEE overwrite on
    bc.dirs, moments, BGK, fluid select.
    """
    # tau: static float (BGK) or (tau, tau_minus) pair (TRT).
    inv_tau_m = None
    if isinstance(tau, tuple):
        inv_tau = np.float32(1.0 / tau[0])
        inv_tau_m = np.float32(1.0 / tau[1])
    else:
        inv_tau = np.float32(1.0 / tau)
    axis = bc.axis
    odt = ot_slot.dtype  # bf16 storage: widen loads, narrow the store
    lat_len = ot_slot.shape[1] if axis == 0 else ot_slot.shape[0]

    def read(ch, ox, oy, ez):
        if axis == 0:
            piece = ft[pl.ds(1 + r + ox, 1), 1 + oy : 1 + oy + lat_len,
                       ch, :]
        else:
            piece = ft[1 + ox : 1 + ox + lat_len, pl.ds(1 + r + oy, 1),
                       ch, :]
        piece = piece.astype(jnp.float32)  # widen BEFORE the roll:
        # Mosaic has no sub-32-bit dynamic rotate (bf16 storage)
        if ez != 0:
            nz = piece.shape[-1]
            piece = pltpu.roll(piece, shift=ez % nz, axis=2)
        return piece  # (1, ty, nz) or (tx, 1, nz)

    def lat_expand(arr2d):
        return arr2d[None, :, :] if axis == 0 else arr2d[:, None, :]

    # Previous-step macroscopics at the consumer row (moments of the
    # carried f — BGK conserves rho,u): the NEE formula's rho_F/u_F.
    rp = read(0, 0, 0, 0)
    mxp = jnp.zeros_like(rp)
    myp = jnp.zeros_like(rp)
    mzp = jnp.zeros_like(rp)
    srcs = [rp]
    for i in range(1, 19):
        v = read(i, 0, 0, 0)
        srcs.append(v)
        rp = rp + v
        ex, ey, ez = (int(cmp) for cmp in _E[i])
        if ex:
            mxp = mxp + v if ex > 0 else mxp - v
        if ey:
            myp = myp + v if ey > 0 else myp - v
        if ez:
            mzp = mzp + v if ez > 0 else mzp - v
    if force is not None:  # Guo half-force shift (engine/step)
        mxp = mxp + np.float32(0.5 * force[0])
        myp = myp + np.float32(0.5 * force[1])
        mzp = mzp + np.float32(0.5 * force[2])
    irp = np.float32(1.0) / jnp.where(rp == 0.0, np.float32(1.0), rp)
    uxp, uyp, uzp = mxp * irp, myp * irp, mzp * irp
    commonp = np.float32(1.0) - np.float32(1.5) * (
        uxp * uxp + uyp * uyp + uzp * uzp
    )

    def phi_prev(i):
        ex, ey, ez = (int(cmp) for cmp in _E[i])
        cu = jnp.zeros_like(uxp)
        if ex:
            cu = cu + uxp if ex > 0 else cu - uxp
        if ey:
            cu = cu + uyp if ey > 0 else cu - uyp
        if ez:
            cu = cu + uzp if ez > 0 else cu - uzp
        return np.float32(_W[i]) * (
            commonp + np.float32(3.0) * cu + np.float32(4.5) * cu * cu
        )

    wall_f = np.float32(int(CellType.WALL))
    if wall_velocity is not None:
        from lbm_tpu.engine.step import moving_bb_terms
        bb_mov = moving_bb_terms(wall_velocity)
        moving_f = np.float32(int(CellType.MOVING))
    pulls = []
    for i in range(19):
        if i == 0:
            pulls.append(srcs[0])
            continue
        ex, ey, ez = (int(cmp) for cmp in _E[i])
        piece = read(i, -ex, -ey, ez)
        nbr = read(MASK_CH, -ex, -ey, ez)
        v = jnp.where(nbr == wall_f, srcs[_OPP[i]], piece)
        if wall_velocity is not None:
            v = jnp.where(nbr == moving_f,
                          srcs[_OPP[i]] + np.float32(bb_mov[i]), v)
        if i in bc.dirs:
            d = bc.dirs.index(i)
            phiv = lat_expand(nee[pl.ds(lat0, lat_len), d, :])
            valid = phiv > np.float32(0.0)
            phi_nbr = phi_prev(i)
            rho_star = (
                np.float32(bc.rho_fixed) if bc.rho_fixed is not None else rp
            )
            phi_star = phi_nbr if bc.u_extrap else phiv
            val = rho_star * phi_star + (srcs[i] - rp * phi_nbr) * np.float32(
                bc.omega
            )
            v = jnp.where(valid, val, v)
        pulls.append(v)

    rho = pulls[0]
    mx = jnp.zeros_like(rho)
    my = jnp.zeros_like(rho)
    mz = jnp.zeros_like(rho)
    for i in range(1, 19):
        v = pulls[i]
        rho = rho + v
        ex, ey, ez = (int(cmp) for cmp in _E[i])
        if ex:
            mx = mx + v if ex > 0 else mx - v
        if ey:
            my = my + v if ey > 0 else my - v
        if ez:
            mz = mz + v if ez > 0 else mz - v
    if force is not None:
        mx = mx + np.float32(0.5 * force[0])
        my = my + np.float32(0.5 * force[1])
        mz = mz + np.float32(0.5 * force[2])
    ir = np.float32(1.0) / jnp.where(rho == 0.0, np.float32(1.0), rho)
    ux, uy, uz = mx * ir, my * ir, mz * ir
    usq_row = ux * ux + uy * uy + uz * uz
    common = np.float32(1.0) - np.float32(1.5) * usq_row
    m_row = read(MASK_CH, 0, 0, 0)
    is_fluid = m_row == np.float32(int(CellType.FLUID))
    feqs = []
    cus = []
    for i in range(19):
        ex, ey, ez = (int(cmp) for cmp in _E[i])
        cu = jnp.zeros_like(ux)
        if ex:
            cu = cu + ux if ex > 0 else cu - ux
        if ey:
            cu = cu + uy if ey > 0 else cu - uy
        if ez:
            cu = cu + uz if ez > 0 else cu - uz
        cus.append(cu)
        feqs.append(rho * np.float32(_W[i]) * (
            common + np.float32(3.0) * cu + np.float32(4.5) * cu * cu
        ))
    if force is not None:  # Guo source (engine/step.guo_source)
        cp_f = np.float32(1.0 - 0.5 * float(inv_tau))
        cm_f = (cp_f if inv_tau_m is None
                else np.float32(1.0 - 0.5 * float(inv_tau_m)))
        uF = (ux * np.float32(force[0]) + uy * np.float32(force[1])
              + uz * np.float32(force[2]))
    inv_te_row = None
    if les is not None:  # tau closure (see _subtile_compute): tau_eff
        fneq_row = [pulls[i] - feqs[i] for i in range(19)]
        def _pi_row(a_, b_):
            acc = None
            for i in range(1, 19):
                cab = int(_E[i][a_]) * int(_E[i][b_])
                if cab == 0:
                    continue
                term = fneq_row[i] if cab == 1 else -fneq_row[i]
                acc = term if acc is None else acc + term
            return acc
        pxx_r, pyy_r, pzz_r = _pi_row(0, 0), _pi_row(1, 1), _pi_row(2, 2)
        pxy_r, pxz_r, pyz_r = _pi_row(0, 1), _pi_row(0, 2), _pi_row(1, 2)
        p_r = jnp.sqrt(np.float32(2.0) * (
            pxx_r * pxx_r + pyy_r * pyy_r + pzz_r * pzz_r
            + np.float32(2.0) * (pxy_r * pxy_r + pxz_r * pxz_r
                                 + pyz_r * pyz_r)))
        te_r = tau_eff_from_p(p_r, ir, 1.0 / float(inv_tau), les)
        inv_te_row = np.float32(1.0) / te_r
        inv_te_row_m = None
        if inv_tau_m is not None:   # closure + TRT (constant Lambda)
            lam_r = np.float32(
                (1.0 / float(inv_tau) - 0.5)
                * (1.0 / float(inv_tau_m) - 0.5))
            inv_te_row_m = np.float32(1.0) / (
                np.float32(0.5) + lam_r / (te_r - np.float32(0.5)))
    moms_m = None
    if mrt is not None:  # MRT rank update (see _subtile_compute)
        rows_m, coefs_m = mrt
        fneqs_m = [pulls[i] - feqs[i] for i in range(19)]
        moms_m = []
        for r_row, c_r in zip(rows_m, coefs_m):
            acc = None
            for j in range(19):
                a_ = float(r_row[j])
                if a_ == 0.0:
                    continue
                term = fneqs_m[j] if a_ == 1.0 else (
                    np.float32(a_) * fneqs_m[j])
                acc = term if acc is None else acc + term
            moms_m.append(np.float32(c_r) * acc)
    outs = []
    for i in range(19):
        v = pulls[i]
        if les is not None:
            if inv_te_row_m is None:
                post = v - inv_te_row * fneq_row[i]
            else:
                o_ = int(_OPP[i])
                s_ = fneq_row[i] + fneq_row[o_]
                d_ = fneq_row[i] - fneq_row[o_]
                post = v - (np.float32(0.5) * inv_te_row * s_
                            + np.float32(0.5) * inv_te_row_m * d_)
        elif mrt is not None:
            post = v - inv_tau * fneqs_m[i]
            for r_row, mv in zip(rows_m, moms_m):
                a_ = float(r_row[i])
                if a_ != 0.0:
                    post = post + (mv if a_ == 1.0 else
                                   np.float32(a_) * mv)
        elif inv_tau_m is None:
            post = v - (v - feqs[i]) * inv_tau
        else:  # TRT parity split, pair-distributed static weights
            o = int(_OPP[i])
            hp = 0.5 * float(inv_tau)
            hm = 0.5 * float(inv_tau_m)
            post = (np.float32(1.0 - hp - hm) * v
                    + np.float32(hm - hp) * pulls[o]
                    + np.float32(hp + hm) * feqs[i]
                    + np.float32(hp - hm) * feqs[o])
        if force is not None:
            w = float(_W[i])
            eF = float(_E[i].astype(np.float64) @ np.asarray(force))
            post = post + np.float32(-3.0 * cp_f * w) * uF
            if eF:
                post = (post + np.float32(9.0 * cp_f * w * eF) * cus[i]
                        + np.float32(3.0 * cm_f * w * eF))
        outs.append(jnp.where(is_fluid, post, srcs[i]))
    for ch in range(MASK_CH, ot_slot.shape[2]):
        outs.append(read(ch, 0, 0, 0))
    row_out = jnp.stack(outs, axis=2).astype(odt)
    if axis == 0:  # (1, L, C, nz) or (L, 1, C, nz)
        ot_slot[pl.ds(r, 1), :, :, :] = row_out
    else:
        ot_slot[:, pl.ds(r, 1), :, :] = row_out
    speed = jnp.where(is_fluid, jnp.sqrt(usq_row), np.float32(0.0))
    if vs_lat is not None:
        vlo, vhi = vs_lat
        li = jax.lax.broadcasted_iota(
            jnp.int32, speed.shape, 1 if axis == 0 else 0
        )
        speed = jnp.where((li >= vlo) & (li < vhi), speed,
                          np.float32(0.0))
    return _vs_sum(speed, vs_scr)


class BCStatic(tuple):
    """Hashable static NEE-boundary descriptor for the kernel."""

    axis = property(lambda s: s[0])
    c = property(lambda s: s[1])
    dirs = property(lambda s: s[2])
    rho_fixed = property(lambda s: s[3])
    u_extrap = property(lambda s: s[4])
    omega = property(lambda s: s[5])

    @staticmethod
    def make(axis, c, dirs, rho_fixed, u_extrap, omega):
        return BCStatic((axis, c, tuple(dirs), rho_fixed, u_extrap, omega))


def _kernel(
    *refs,
    tau: float, tx: int, ty: int, gx: int, gy: int, ring: int = 1,
    bcs_static=(), halo_axis=None, stx=None, sty=None,
    ntiles: int | None = None, skip: bool = False, in_place: bool = False,
    pure: bool = False, zspan=(0, -1), has_prev: bool = False,
    has_seam: bool = False, bits: bool = False, bounce: bool = False,
    force=None, wall_velocity=None, mrt=None, les=None,
    has_gf: bool = False, fforce=None,
):
    """Single-step kernel. ring: halo-ring width of the packed state (2
    when the state is shared with the 2-step fused kernel). skip: a
    leading SMEM operand holds a tile id list — the block-sparse live
    list (all-dead tiles are never touched; the output aliases the
    input, so their content stays valid) or one side of the pure/mixed
    split. pure: EVERY tile of this call is standard (classify_tiles) —
    trace only the mask-free fast path (_subtile_compute_pure) with
    static fluid z-span zspan. has_prev: an extra (ignored) operand
    carries the companion call's output, aliased onto this call's
    output so both writes land in one buffer. has_seam: an extra HBM
    operand carries the PRE-step seam rows (the last interior row of
    each tile-row above the first) — REQUIRED whenever the output
    aliases the input and gx > 1: under _drive's in-place ordering,
    out(q - gy) completes before in(q) starts, so tile q's north skirt
    row in p_hbm already holds POST-step values (measured 2e-2 rel
    error after 5 transient steps at 64^3 on hardware; interpret mode
    cannot reproduce it because pallas interpret does not honor
    input_output_aliases). Every other skirt cell is written only by
    tiles later in the list: west column by out(q-1), which starts
    only after in(q) landed; south row and remaining corners by
    future tiles.
    ntiles: number of processed tiles (= len(list) if skip).
    has_gf/fforce: per-cell Boussinesq force mode — a second HBM
    operand (the D3Q7 g-pack, right after p) streams INTERIOR tiles
    alongside the state and F = buoy (c - c_ref) + base is built
    in-kernel (_subtile_compute's fF path)."""
    nbc = len(bcs_static)
    p_hbm = refs[0]
    rest = refs[1:]
    gf_hbm = None
    if has_gf:
        gf_hbm, rest = rest[0], rest[1:]
    nee_refs = rest[:nbc]
    rest = rest[nbc:]
    if skip:
        tids_ref, rest = rest[0], rest[1:]
    if has_prev:
        rest = rest[1:]  # companion output: alias target only
    seam_ref = None
    if has_seam:
        seam_ref, rest = rest[0], rest[1:]
    vs_scr = None
    halo_sems = None
    if halo_axis is not None:
        lo_hbm, hi_hbm = rest[0], rest[1]
        rest = rest[2:]
    out_hbm, vs_out, ft, ot = rest[:4]
    rest = rest[4:]
    gft = None
    if has_gf:
        gft, rest = rest[0], rest[1:]
    if bounce:
        # bf16 storage: velsum contributions bounce through a small f32
        # VMEM scratch so the ADD multi_reduction sees zero layout
        # offsets (see _subtile_compute).
        vs_scr, rest = rest[0], rest[1:]
    acc, in_sems, out_sems = rest[:3]
    rest = rest[3:]
    gf_sems = None
    if has_gf:
        gf_sems, rest = rest[0], rest[1:]
    if halo_axis is not None:
        halo_sems, rest = rest[0], rest[1:]
    seam_sems = rest[0] if has_seam else None
    if ntiles is None:
        ntiles = gx * gy

    def get(p):
        return tids_ref[p] if skip else p

    def in_copy(slot, tid):
        base = _in_copy_base(slot, tid)
        if not has_gf:
            return base
        i, j = tid // gy, tid % gy
        gcp = pltpu.make_async_copy(
            gf_hbm.at[pl.ds(i * tx + ring, tx),
                      pl.ds(j * ty + ring, ty)],
            gft.at[slot], gf_sems.at[slot])
        return _PairCopy(base, gcp)

    def _in_copy_base(slot, tid):
        i, j = tid // gy, tid % gy
        if halo_axis is None:
            if not has_seam:
                return pltpu.make_async_copy(
                    p_hbm.at[pl.ds(i * tx + ring - 1, tx + 2),
                             pl.ds(j * ty + ring - 1, ty + 2)],
                    ft.at[slot],
                    in_sems.at[slot],
                )
            # Seam mode (in-place aliased output, gx>1 and gy>1): the
            # north skirt row belongs to tile tid-gy, whose out-DMA has
            # already LANDED under _drive's in-place ordering — source
            # it from the pre-extracted pre-step seam buffer instead.
            # All other skirt cells are written only by tiles later in
            # the list (see _kernel docstring).
            lat = pl.ds(j * ty + ring - 1, ty + 2)
            main = pltpu.make_async_copy(
                p_hbm.at[pl.ds(i * tx + ring, tx + 1), lat],
                ft.at[slot, 1 : tx + 2],
                in_sems.at[slot],
            )
            north = pltpu.make_async_copy(
                seam_ref.at[pl.ds(i, 1), lat],
                ft.at[slot, 0:1],
                seam_sems.at[slot],
            )
            return _PairCopy(main, north)
        # Sharded halo patch, OVERLAPPED (VERDICT r2 next-#7): the tile's
        # two ring rows along halo_axis ride their own DMAs (halo_sems),
        # sourced per-tile from either the shard state (interior side)
        # or the exchanged lo/hi plane (shard-edge side, where the
        # state's ring is stale). All three copies are issued one
        # pipeline stage ahead by _drive and land under a full tile of
        # compute — replacing the old start+wait patch serialized before
        # every edge tile's compute. Byte total is unchanged; the ring
        # rows simply arrive through separate descriptors.
        if halo_axis == 0:
            lat = pl.ds(j * ty + ring - 1, ty + 2)
            main = pltpu.make_async_copy(
                p_hbm.at[pl.ds(i * tx + ring, tx), lat],
                ft.at[slot, 1 : tx + 1], in_sems.at[slot])
            top_edge = lambda: pltpu.make_async_copy(
                lo_hbm.at[:, pl.ds(j * ty, ty + 2)],
                ft.at[slot, 0:1], halo_sems.at[slot, 0])
            if has_seam:
                # Interior-side north row: stale in the aliased state
                # (written by tile tid-gy) — read the pre-step seam.
                top_int = lambda: pltpu.make_async_copy(
                    seam_ref.at[pl.ds(i, 1), lat],
                    ft.at[slot, 0:1], halo_sems.at[slot, 0])
            else:
                top_int = lambda: pltpu.make_async_copy(
                    p_hbm.at[pl.ds(i * tx + ring - 1, 1), lat],
                    ft.at[slot, 0:1], halo_sems.at[slot, 0])
            bot_edge = lambda: pltpu.make_async_copy(
                hi_hbm.at[:, pl.ds(j * ty, ty + 2)],
                ft.at[slot, tx + 1 : tx + 2], halo_sems.at[slot, 1])
            bot_int = lambda: pltpu.make_async_copy(
                p_hbm.at[pl.ds(i * tx + ring + tx, 1), lat],
                ft.at[slot, tx + 1 : tx + 2], halo_sems.at[slot, 1])
            is_lo, is_hi = i == 0, i == gx - 1
            north = None
        else:
            lat = pl.ds(i * tx + ring - 1, tx + 2)
            north = None
            if has_seam:
                # Seam mode: the main copy's north row (tile tid-gy's
                # last interior row, POST-step in the aliased state) and
                # both its corner cells (tiles tid-gy∓1) come from the
                # pre-step seam buffer — FULL width, edge columns
                # patched from the exchanged lo/hi planes by the caller.
                # The lateral column copies are trimmed to skip the
                # north cell so no cell is written by two DMAs.
                main = pltpu.make_async_copy(
                    p_hbm.at[pl.ds(i * tx + ring, tx + 1),
                             pl.ds(j * ty + ring, ty)],
                    ft.at[slot, 1 : tx + 2, 1 : ty + 1],
                    in_sems.at[slot])
                north = pltpu.make_async_copy(
                    seam_ref.at[pl.ds(i, 1), pl.ds(j * ty + ring - 1,
                                                   ty + 2)],
                    ft.at[slot, 0:1], seam_sems.at[slot])
                rows_c = pl.ds(i * tx + ring, tx + 1)
                rows_e = pl.ds(i * tx + 1, tx + 1)
                dst_r = slice(1, tx + 2)
            else:
                main = pltpu.make_async_copy(
                    p_hbm.at[lat, pl.ds(j * ty + ring, ty)],
                    ft.at[slot, :, 1 : ty + 1], in_sems.at[slot])
                rows_c, rows_e = lat, pl.ds(i * tx, tx + 2)
                dst_r = slice(None)
            top_edge = lambda: pltpu.make_async_copy(
                lo_hbm.at[rows_e, :],
                ft.at[slot, dst_r, 0:1], halo_sems.at[slot, 0])
            top_int = lambda: pltpu.make_async_copy(
                p_hbm.at[rows_c, pl.ds(j * ty + ring - 1, 1)],
                ft.at[slot, dst_r, 0:1], halo_sems.at[slot, 0])
            bot_edge = lambda: pltpu.make_async_copy(
                hi_hbm.at[rows_e, :],
                ft.at[slot, dst_r, ty + 1 : ty + 2],
                halo_sems.at[slot, 1])
            bot_int = lambda: pltpu.make_async_copy(
                p_hbm.at[rows_c, pl.ds(j * ty + ring + ty, 1)],
                ft.at[slot, dst_r, ty + 1 : ty + 2],
                halo_sems.at[slot, 1])
            is_lo, is_hi = j == 0, j == gy - 1
        return _HaloSplitCopy(main, (is_lo, top_edge, top_int),
                              (is_hi, bot_edge, bot_int), extra=north)

    def out_copy(slot, tid):
        i, j = tid // gy, tid % gy
        return pltpu.make_async_copy(
            ot.at[slot],
            out_hbm.at[pl.ds(ring + i * tx, tx), pl.ds(ring + j * ty, ty)],
            out_sems.at[slot],
        )

    def full_work(tid, slot):
        ti, tj = tid // gy, tid % gy
        gx0, gy0 = ring + ti * tx, ring + tj * ty

        vs = _tile_compute(
            ft.at[slot], ot.at[slot], tau, tx, ty,
            gx0=gx0, gy0=gy0, bcs_static=bcs_static,
            stx=stx, sty=sty, bits=bits, vs_scr=vs_scr, force=force,
            wall_velocity=wall_velocity, mrt=mrt, les=les,
            gft=None if gft is None else gft.at[slot], fforce=fforce,
        )
        acc[0] = acc[0] + vs

        # NEE consumer-plane rows: recompute only on intersecting tiles.
        for bc_, nee_ in zip(bcs_static, nee_refs):
            if bc_.axis == 0:
                r_ = bc_.c - gx0
                pred = (r_ >= 0) & (r_ < tx)
                lat0_ = gy0
            else:
                r_ = bc_.c - gy0
                pred = (r_ >= 0) & (r_ < ty)
                lat0_ = gx0

            @pl.when(pred)
            def _(bc_=bc_, nee_=nee_, r_=r_, lat0_=lat0_):
                dv = _row_fix(
                    ft.at[slot], ot.at[slot], bc_, nee_, r_, lat0_, tau,
                    vs_scr=vs_scr, force=force,
                    wall_velocity=wall_velocity, mrt=mrt, les=les,
                )
                acc[0] = acc[0] + dv

    def pure_work(tid, slot):
        vs = _tile_compute(
            ft.at[slot], ot.at[slot], tau, tx, ty,
            stx=stx, sty=sty, pure_zspan=zspan, vs_scr=vs_scr,
            force=force, mrt=mrt, les=les,
        )
        acc[0] = acc[0] + vs

    def work(p, tid, slot):
        if pure:
            pure_work(tid, slot)
        else:
            full_work(tid, slot)

    acc[0] = jnp.float32(0.0)
    _drive(ntiles, get, in_copy, out_copy, work, in_place=in_place)
    vs_out[0, 0] = acc[0]


class _PairCopy:
    """Two unconditional DMAs (distinct semaphores) behind one
    start()/wait() pair — the seam-mode tile input (see _kernel)."""

    def __init__(self, a, b):
        self.a, self.b = a, b

    def start(self):
        self.a.start()
        self.b.start()

    def wait(self):
        self.a.wait()
        self.b.wait()


class _HaloSplitCopy:
    """Three-DMA tile input for the sharded path (see _kernel.in_copy):
    main interior rows + two ring rows, each ring row sourced from the
    shard state or the exchanged halo plane by a per-tile predicate.
    start() and wait() mirror the exact same branch structure so every
    issued descriptor is waited with a matching one. edge/interior are
    FACTORIES invoked inside the taken branch: tile ids known at trace
    time (the pipeline preamble's tile 0) make the predicate a static
    bool, and an eagerly-built descriptor on the untaken side would
    leak ("AsyncCopyDescriptor was not used"). extra: an optional
    unconditional fourth DMA (the seam-mode north row)."""

    def __init__(self, main, top, bot, extra=None):
        self.main, self.top, self.bot = main, top, bot
        self.extra = extra

    def _each(self, fn):
        fn(self.main)
        if self.extra is not None:
            fn(self.extra)
        for pred, edge, interior in (self.top, self.bot):
            if isinstance(pred, (bool, np.bool_)):
                fn(edge() if pred else interior())
                continue

            @pl.when(pred)
            def _(edge=edge):
                fn(edge())

            @pl.when(jnp.logical_not(pred))
            def _(interior=interior):
                fn(interior())

    def start(self):
        self._each(lambda cp: cp.start())

    def wait(self):
        self._each(lambda cp: cp.wait())


def _drive(ntiles, get, in_copy, out_copy, work, in_place=False):
    """Double-buffered DMA pipeline.

    relaxed mode (in_place=False, the default): the output goes to a
    SEPARATE buffer, so input and output DMAs never overlap in memory —
    out(p) runs concurrently with the next two tiles' compute and the
    input prefetch, the classic fully-overlapped stream.

    in_place mode: the output buffer ALIASES the input (block-sparse
    tile skip needs untouched tiles to keep their contents; also halves
    HBM footprint). Tile p's input halo can overlap tile q's output
    interior for spatially-adjacent tiles — which, over an arbitrary
    live-tile list, can be ANY list distance — so ordering is strict:
      (a) out(p).start is delayed until in(p+1) has LANDED, and
      (b) in(p+1).start is preceded by out(p-1).wait, so any in(q)
          starts only after every out(p<=q-2) has fully completed.
    This serializes output DMAs against the input stream (out(p) only
    overlaps the tail of work(p)'s successor), costing ~25% on dense
    grids — use it only when aliasing is required."""

    def process(p, slot):
        if in_place:
            # in(p) was waited by the previous iteration (or preamble)
            @pl.when(p >= 1)
            def _():
                out_copy(1 - slot, get(p - 1)).wait()

            @pl.when(p + 1 < ntiles)
            def _():
                in_copy(1 - slot, get(p + 1)).start()

            work(p, get(p), slot)

            @pl.when(p + 1 < ntiles)
            def _():
                in_copy(1 - slot, get(p + 1)).wait()

            out_copy(slot, get(p)).start()
        else:
            # functional output buffer: out never overlaps in, so the
            # classic fully-overlapped order — out(p) drains during the
            # next two tiles' compute, in(p+1) during this tile's
            @pl.when(p + 1 < ntiles)
            def _():
                in_copy(1 - slot, get(p + 1)).start()

            in_copy(slot, get(p)).wait()

            @pl.when(p >= 2)
            def _():
                out_copy(slot, get(p - 2)).wait()

            work(p, get(p), slot)

            out_copy(slot, get(p)).start()

    in_copy(0, get(0)).start()
    if in_place:
        in_copy(0, get(0)).wait()
    npairs = (ntiles + 1) // 2

    def body(q, _):
        p = 2 * q
        process(p, 0)

        @pl.when(p + 1 < ntiles)
        def _():
            process(p + 1, 1)

        return 0

    jax.lax.fori_loop(0, npairs, body, 0)
    if not in_place and ntiles >= 2:
        out_copy(ntiles % 2, get(ntiles - 2)).wait()
    out_copy((ntiles - 1) % 2, get(ntiles - 1)).wait()


def _kernel2(
    *refs,
    tau: float, tx: int, ty: int, gx: int, gy: int,
    bcs_static=(), stx=None, sty=None,
    ntiles: int | None = None, skip: bool = False, in_place: bool = False,
    pure: bool = False, zspan=(0, -1), has_prev: bool = False,
    bits: bool = False, bounce: bool = False, force=None,
    wall_velocity=None, mrt=None, les=None,
):
    """TWO fused LBM steps per HBM round-trip (temporal blocking): the
    input tile carries a 2-cell halo skirt; step 1 computes a mid tile
    with a 1-cell skirt in VMEM (including its NEE consumer rows), step
    2 consumes it and writes the interior tile. Cuts HBM traffic per
    step ~1.7x — the memory-bound LBM's biggest remaining lever.
    State ring must be 2. Requires all NEE BCs on axes 0/1 (z-plane
    fixups run outside the kernel and cannot interleave two steps).
    skip/pure/zspan/has_prev as in _kernel."""
    nbc = len(bcs_static)
    p_hbm = refs[0]
    nee1 = refs[1 : 1 + nbc]
    nee2 = refs[1 + nbc : 1 + 2 * nbc]
    rest = refs[1 + 2 * nbc :]
    if skip:
        tids_ref, rest = rest[0], rest[1:]
    if has_prev:
        rest = rest[1:]  # companion output: alias target only
    vs_scr = None
    if bounce:  # bf16 storage: f32 velsum bounce scratch (_kernel)
        out_hbm, vs_out, ft, mt, ot, vs_scr, acc, in_sems, out_sems = rest
    else:
        out_hbm, vs_out, ft, mt, ot, acc, in_sems, out_sems = rest
    if ntiles is None:
        ntiles = gx * gy

    def get(p):
        return tids_ref[p] if skip else p

    def in_copy(slot, tid):
        i, j = tid // gy, tid % gy
        return pltpu.make_async_copy(
            p_hbm.at[pl.ds(i * tx, tx + 4), pl.ds(j * ty, ty + 4)],
            ft.at[slot],
            in_sems.at[slot],
        )

    def out_copy(slot, tid):
        i, j = tid // gy, tid % gy
        return pltpu.make_async_copy(
            ot.at[slot],
            out_hbm.at[pl.ds(2 + i * tx, tx), pl.ds(2 + j * ty, ty)],
            out_sems.at[slot],
        )

    def row_fixes(src, dst, nee_refs, rbase_x, rbase_y, nlim, vs_slot,
                  owned):
        """NEE consumer rows on `dst` (ot-local coords relative to the
        (rbase_x, rbase_y) global origin); `owned` restricts the velsum
        delta to rows/cols this tile owns (mid-pass skirt rows are
        recomputed for step 2's pulls but counted by their owner)."""
        for bc_, nee_ in zip(bcs_static, nee_refs):
            if bc_.axis == 0:
                r_ = bc_.c - rbase_x
                n_, lat0_ = nlim[0], rbase_y
            else:
                r_ = bc_.c - rbase_y
                n_, lat0_ = nlim[1], rbase_x

            @pl.when((r_ >= 0) & (r_ < n_))
            def _(bc_=bc_, nee_=nee_, r_=r_, lat0_=lat0_, n_=n_):
                dv = _row_fix(
                    src, dst, bc_, nee_, r_, lat0_, tau, force=force,
                    wall_velocity=wall_velocity, mrt=mrt, les=les,
                    vs_lat=((1, (nlim[1] if bc_.axis == 0 else nlim[0]) - 1)
                            if owned else None),
                    vs_scr=vs_scr,
                )
                if owned:
                    dv = jnp.where((r_ >= 1) & (r_ < n_ - 1), dv,
                                   jnp.float32(0.0))
                acc[vs_slot] = acc[vs_slot] + dv

    def full_work(tid, slot):
        i, j = tid // gy, tid % gy
        # -- step 1: ft (tx+4, ty+4) -> mt (tx+2, ty+2), global origin
        #    of mt's (0,0) is (1 + i*tx, 1 + j*ty)
        g1x, g1y = 1 + i * tx, 1 + j * ty
        vs1 = _tile_compute(
            ft.at[slot], mt, tau, tx + 2, ty + 2,
            gx0=g1x, gy0=g1y, bcs_static=bcs_static,
            stx=stx, sty=sty, vs_win=(1, tx + 1, 1, ty + 1),
            bits=bits, vs_scr=vs_scr, force=force,
            wall_velocity=wall_velocity, mrt=mrt, les=les,
        )
        acc[0] = acc[0] + vs1
        row_fixes(ft.at[slot], mt, nee1, g1x, g1y,
                  (tx + 2, ty + 2), 0, owned=True)
        # -- step 2: mt -> ot (tx, ty), global origin (2 + i*tx, 2 + j*ty)
        g2x, g2y = 2 + i * tx, 2 + j * ty
        vs2 = _tile_compute(
            mt, ot.at[slot], tau, tx, ty,
            gx0=g2x, gy0=g2y, bcs_static=bcs_static,
            stx=stx, sty=sty, bits=bits, vs_scr=vs_scr, force=force,
            wall_velocity=wall_velocity, mrt=mrt, les=les,
        )
        acc[1] = acc[1] + vs2
        row_fixes(mt, ot.at[slot], nee2, g2x, g2y, (tx, ty), 1,
                  owned=False)

    def pure_work(tid, slot):
        vs1 = _tile_compute(
            ft.at[slot], mt, tau, tx + 2, ty + 2,
            stx=stx, sty=sty, vs_win=(1, tx + 1, 1, ty + 1),
            pure_zspan=zspan, vs_scr=vs_scr, force=force, mrt=mrt, les=les,
        )
        acc[0] = acc[0] + vs1
        vs2 = _tile_compute(
            mt, ot.at[slot], tau, tx, ty,
            stx=stx, sty=sty, pure_zspan=zspan, vs_scr=vs_scr,
            force=force, mrt=mrt, les=les,
        )
        acc[1] = acc[1] + vs2

    def work(p, tid, slot):
        if pure:
            pure_work(tid, slot)
        else:
            full_work(tid, slot)

    acc[0] = jnp.float32(0.0)
    acc[1] = jnp.float32(0.0)
    _drive(ntiles, get, in_copy, out_copy, work, in_place=in_place)
    vs_out[0, 0] = acc[0]
    vs_out[0, 1] = acc[1]


# Scoped-vmem ceiling handed to Mosaic (v5e VMEM is 128 MB). Mosaic's
# stack accounting runs ~3.8x the declared scratch (round-2 measurement:
# 109.36M scoped against 28.8 MB declared at 256^3 16x16), so the
# declared-scratch budget below is _VMEM_LIMIT / _STACK_FACTOR.
_VMEM_LIMIT = 127 * 1024 * 1024
_STACK_FACTOR = 3.9


def _pick_tiles(nx: int, ny: int, nz: int, budget_mb: float | None = None,
                prefer_small: bool = False, fuse: int = 1, skip: int = 0):
    """Choose (tx, ty, stx, sty): DMA tile + compute sub-tile.

    Measured on v5e at 256^3: the DMA tile wants to be LARGE (halo
    re-read overhead; pure-copy floors 6.08 ms at 16x8 vs 5.76 at
    16x16) while the compute value shape wants to be NARROW — a (1, 8,
    nz) f32 sub-tile value is 2 vregs, so the 19 pulled populations live
    in ~38 vregs and nothing spills; at 4x8 (8 vregs each) the pull set
    alone needs 152 of the 64 vregs and the spill traffic contends with
    the stream DMA for VMEM bandwidth. Sweep: 16x16@1x8 = 5.99 ms/step
    (2803 MLUPS, 0.23 ms over the pure-DMA floor) vs 16x8@4x8 = 7.95,
    16x16@4x8 = 9.25. Candidates in preference order, subject to
    divisibility and the VMEM budget; `skip` drops the first `skip`
    otherwise-viable candidates (the compile-OOM step-down ladder —
    Mosaic's stack estimate is not exactly predictable, so Simulation
    retries down the ladder when a compile exceeds _VMEM_LIMIT)."""
    if prefer_small:
        # interpret mode: no vector registers to spill off-TPU, and the
        # interpreter pays a fixed Python dispatch cost PER OP — one
        # whole-grid tile minimizes the op count (measured: the fast
        # suite's interpret kernel tests dominate at small tiles).
        # Tests that exercise the tile pipeline pass explicit tx/ty.
        return nx, ny, nx, ny
    if budget_mb is None:
        budget_mb = _VMEM_LIMIT / _STACK_FACTOR / 1e6
    col = C * nz * 4
    cands = ((16, 16), (16, 8), (8, 16), (8, 8), (4, 8), (8, 4),
             (4, 4), (2, 8), (2, 4), (2, 2), (1, 2), (1, 1))
    h = 2 * fuse  # total halo skirt of the in-DMA tile
    for txc, tyc in cands:
        if nx % txc or ny % tyc:
            continue
        need = (
            2 * ((txc + h) * (tyc + h) + txc * tyc) * col
            + (0 if fuse == 1 else (txc + 2) * (tyc + 2) * col)
            + 30 * min(txc, 1) * min(tyc, 8) * nz * 4
        )
        if need <= budget_mb * 1e6:
            if skip > 0:
                skip -= 1
                continue
            return txc, tyc, 1, min(tyc, 8)
    return 1, 1, 1, 1


@functools.partial(
    jax.jit,
    static_argnames=("tau", "tx", "ty", "bcs_static", "halo_axis",
                     "interpret", "stx", "sty", "ring", "n_live",
                     "in_place", "pure", "zspan", "has_prev",
                     "has_seam", "bits", "force", "wall_velocity",
                     "mrt", "les", "has_gf", "fforce"),
)
def _pallas_bulk(p, *extra, tau, tx, ty, bcs_static=(),
                 halo_axis=None, interpret=False, stx=None, sty=None,
                 ring=1, n_live=None, in_place=None, pure=False,
                 zspan=(0, -1), has_prev=False, has_seam=False,
                 bits=False, force=None, wall_velocity=None, mrt=None,
                 les=None, has_gf=False, fforce=None):
    """extra = [g-pack][, *nee_tables][, tile id list][, prev_out]
    [, seam][, lo, hi]. has_gf/fforce: per-cell Boussinesq force mode
    (the g-pack leads the extras; see _kernel).

    The tile id list (SMEM) drives two distinct features:
      - block-sparse skip: n_live < total tiles — untouched tiles must
        keep their static contents, so the output must ALIAS the input;
      - pure/mixed split: each call covers ONE side's tile list; the
        pure call traces only the mask-free fast path (pure/zspan from
        classify_tiles), the mixed call passes its companion's output
        as prev_out (has_prev) so the two calls' disjoint tile writes
        land in one aliased buffer.

    in_place aliasing also halves the HBM footprint, but its race-free
    DMA ordering (_drive) serializes output DMAs (~25% slower on dense
    grids), so dense runs default to a functional output."""
    nxp, nyp, c, nz = p.shape
    nx, ny = nxp - 2 * ring, nyp - 2 * ring
    gx, gy = nx // tx, ny // ty
    skip = n_live is not None
    sparse = skip and n_live < gx * gy and not (pure or has_prev)
    if in_place is None:
        in_place = sparse
    if sparse and not in_place:
        raise ValueError("tile skip requires the in-place aliased output")
    if in_place and gx > 1 and gy > 1 and not has_seam:
        raise ValueError(
            "in_place with a multi-row multi-column tile grid needs the "
            "pre-step seam buffer (has_seam): under _drive's in-place "
            "ordering tile q's north skirt row is already POST-step "
            "(see _kernel docstring)"
        )
    if has_seam and has_prev:
        raise ValueError("has_seam and has_prev are mutually exclusive")
    bounce = p.dtype != jnp.float32 and halo_axis is None
    kern = functools.partial(
        _kernel, tau=tau, tx=tx, ty=ty, gx=gx, gy=gy, ring=ring,
        bcs_static=bcs_static, halo_axis=halo_axis, stx=stx, sty=sty,
        ntiles=n_live, skip=skip, in_place=in_place,
        pure=pure, zspan=zspan, has_prev=has_prev,
        has_seam=has_seam, bits=bits,
        bounce=bounce, force=force, wall_velocity=wall_velocity,
        mrt=mrt, les=les, has_gf=has_gf, fforce=fforce,
    )
    if bits and (p.dtype != jnp.float32 or p.shape[2] <= BITS_CH):
        raise ValueError(
            "bits=True needs an f32 state packed with bits=True "
            "(channel 22 is an f32-bitcast i32 bitmask; "
            f"got dtype={p.dtype}, channels={p.shape[2]})"
        )
    n_nee = (len(extra) - (2 if halo_axis is not None else 0)
             - (1 if skip else 0) - (1 if has_prev else 0)
             - (1 if has_seam else 0) - (1 if has_gf else 0))
    cd = p.shape[2]  # 22, or 24 with the bits channel
    scratch = [
        pltpu.VMEM((2, tx + 2, ty + 2, cd, nz), p.dtype),
        pltpu.VMEM((2, tx, ty, cd, nz), p.dtype),
        pltpu.SMEM((1,), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if has_gf:  # interior g-pack tile, after ot (see _kernel unpack)
        c7 = int(extra[0].shape[2])
        scratch.insert(2, pltpu.VMEM((2, tx, ty, c7, nz),
                                     extra[0].dtype))
        scratch.append(pltpu.SemaphoreType.DMA((2,)))  # gf_sems (after
        # out_sems; halo/seam sems follow, matching _kernel's order)
    if bounce:  # f32 velsum bounce scratch, between ot and acc
        scratch.insert(2 + (1 if has_gf else 0),
                       pltpu.VMEM((tx, ty, nz), jnp.float32))
    if halo_axis is not None:
        # (slot, top/bottom ring row) — the split tile-input DMAs
        scratch.append(pltpu.SemaphoreType.DMA((2, 2)))
    if has_seam:
        # per-slot seam north-row DMA
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if in_place:
        aliases = {0: 0}
    elif has_prev:
        aliases = {1 + n_nee + (1 if skip else 0)
                   + (1 if has_gf else 0): 0}
    else:
        aliases = {}
    out, vs = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (1 if has_gf else 0)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_nee
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * (1 if skip else 0)
        + [pl.BlockSpec(memory_space=pl.ANY)] * (1 if has_prev else 0)
        + [pl.BlockSpec(memory_space=pl.ANY)] * (1 if has_seam else 0)
        + [pl.BlockSpec(memory_space=pl.ANY)]
        * (2 if halo_axis is not None else 0),
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # The default 16 MB scoped-vmem cap under-counts reuse of the
            # kernel's stack temporaries; run close to the hardware limit
            # (v5e has 128 MB of VMEM). Mosaic's stack accounting runs
            # ~3.8x the declared scratch (measured: 109.36M scoped for a
            # 28.8 MB-scratch 16x16 tile at 256^3) — _pick_tiles budgets
            # for that, and Simulation steps the tile ladder down on a
            # scoped-vmem compile OOM.
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(p, *extra)
    return out, vs[0, 0]


@functools.partial(
    jax.jit,
    static_argnames=("tau", "tx", "ty", "bcs_static", "interpret",
                     "stx", "sty", "n_live", "pure", "zspan", "has_prev",
                     "bits", "force", "wall_velocity", "mrt", "les"),
)
def _pallas_bulk2(p, *extra, tau, tx, ty, bcs_static=(),
                  interpret=False, stx=None, sty=None, n_live=None,
                  pure=False, zspan=(0, -1), has_prev=False, bits=False,
                  force=None, wall_velocity=None, mrt=None, les=None):
    """Two fused steps (see _kernel2). extra = [*nee_t, *nee_t1]
    [, tile id list][, prev_out]. State ring must be 2. pure/zspan/
    has_prev: pure/mixed split as in _pallas_bulk. Returns
    (p'', (vs1, vs2))."""
    nxp, nyp, c, nz = p.shape
    nx, ny = nxp - 4, nyp - 4
    gx, gy = nx // tx, ny // ty
    skip = n_live is not None
    sparse = skip and n_live < gx * gy and not (pure or has_prev)
    kern = functools.partial(
        _kernel2, tau=tau, tx=tx, ty=ty, gx=gx, gy=gy,
        bcs_static=bcs_static, stx=stx, sty=sty,
        ntiles=n_live, skip=skip, in_place=sparse,
        pure=pure, zspan=zspan, has_prev=has_prev, bits=bits,
        bounce=p.dtype != jnp.float32, force=force,
        wall_velocity=wall_velocity, mrt=mrt, les=les,
    )
    if bits and (p.dtype != jnp.float32 or p.shape[2] <= BITS_CH):
        raise ValueError("bits=True needs an f32 bits-packed state "
                         "(see _pallas_bulk)")
    n_nee = len(extra) - (1 if skip else 0) - (1 if has_prev else 0)
    bounce = p.dtype != jnp.float32
    cd = p.shape[2]
    scratch = [
        pltpu.VMEM((2, tx + 4, ty + 4, cd, nz), p.dtype),
        # The mid tile never touches HBM: keep it fp32 so the fused pair
        # pays only ONE narrowing rounding per two steps in bf16 mode.
        pltpu.VMEM((tx + 2, ty + 2, cd, nz), jnp.float32),
        pltpu.VMEM((2, tx, ty, cd, nz), p.dtype),
        pltpu.SMEM((2,), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if bounce:  # f32 velsum bounce scratch (mid-tile extents), before acc
        scratch.insert(3, pltpu.VMEM((tx + 2, ty + 2, nz), jnp.float32))
    out, vs = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_nee
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * (1 if skip else 0)
        + [pl.BlockSpec(memory_space=pl.ANY)] * (1 if has_prev else 0),
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=scratch,
        input_output_aliases=(
            {0: 0} if sparse
            else {1 + n_nee + (1 if skip else 0): 0} if has_prev
            else {}
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(p, *extra)
    return out, vs[0]


# ---------------------------------------------------------------------------
# Consumer-plane fixups on the packed layout
# ---------------------------------------------------------------------------

_SPATIAL_DIM = {0: 0, 1: 1, 2: 3}  # lattice axis -> packed array dim


def _plane_pull_packed(p, nbr_wall_plane, axis: int, c: int,
                       nbr_moving_plane=None, bb=None):
    """Pulled populations (19, A, B) on plane `c` along `axis` of the
    packed state, with fused wall bounce-back (plane-restricted
    engine/step.streamed). nbr_wall_plane: (19, A, B) per-direction
    wall-neighbor masks for THIS plane (CompiledBC.nbr_wall_plane).
    nbr_moving_plane/bb: MOVING-wall sources add the Ladd term
    (engine/step.moving_bb_terms)."""
    dim = _SPATIAL_DIM[axis]

    def plane(ch, coord):
        idx = [slice(None)] * 4
        idx[dim] = coord
        idx[2] = ch
        sl = p[tuple(idx)]
        return sl  # (A, B) lateral, in spatial order

    lat = [a for a in range(3) if a != axis]
    out = [plane(0, c)]
    for i in range(1, 19):
        e = [int(v) for v in _E[i]]
        nbr_plane = plane(i, c - e[axis])
        shifts = [e[a] for a in lat]
        ax = [k for k in range(2) if shifts[k] != 0]
        if ax:
            nbr_plane = jnp.roll(nbr_plane, [shifts[k] for k in ax], axis=ax)
        own_opp = plane(_OPP[i], c)
        v = jnp.where(nbr_wall_plane[i], own_opp, nbr_plane)
        if nbr_moving_plane is not None:
            v = jnp.where(nbr_moving_plane[i],
                          own_opp + np.float32(bb[i]), v)
        out.append(v)
    return jnp.stack(out)


def _build_nee(bc):
    """(A, 8, B) f32 NEE plane data: channels 0..4 hold phi*_d masked by
    validity (phi* > 0 <=> valid; for u-extrapolate BCs a 1.0 marker)."""
    valid = np.asarray(bc.valid)  # (D, A, B) bool
    d_, a, b = valid.shape
    arr = np.zeros((a, 8, b), np.float32)
    if bc.u_mode == "extrapolate":
        for d in range(d_):
            arr[:, d, :] = valid[d].astype(np.float32)
    else:
        phis = np.asarray(bc.phi_star)  # (D, A, B)
        for d in range(d_):
            arr[:, d, :] = np.where(valid[d], phis[d], 0.0)
    return jnp.asarray(arr)


def _build_nee_series(bc):
    """(T, A, 8, B) for u_mode='series' boundaries."""
    valid = np.asarray(bc.valid)
    series = np.asarray(bc.phi_star_series)  # (T, D, A, B)
    t_, d_, a, b = series.shape
    arr = np.zeros((t_, a, 8, b), np.float32)
    for d in range(d_):
        arr[:, :, d, :] = np.where(valid[d][None], series[:, d], 0.0)
    return jnp.asarray(arr)


def _valid_bbox(bc, shape_xy, margin: int = 2):
    """Static (x0, x1, y0, y1) window around a z-BC's valid consumer
    cells, inflated by `margin` so every written cell's lateral pulls
    stay inside the window (the written region excludes the outermost
    ring). Restricting the fixup to this window keeps the per-step XLA
    work O(window), not O(plane) — and the splice a small
    dynamic-update-slice instead of a full-plane one. Windkessel BCs
    union the flux footprint (flow_weight) into the bbox so the
    windowed Q sum equals the full-plane sum."""
    v = np.asarray(bc.valid).any(axis=0)  # (A, B) = (x, y)
    if bc.windkessel is not None:
        v = v | (np.asarray(bc.flow_weight) != 0)
    xs, ys = np.nonzero(v)
    if xs.size == 0:
        return None
    x0 = max(int(xs.min()) - margin, 0)
    x1 = min(int(xs.max()) + 1 + margin, shape_xy[0])
    y0 = max(int(ys.min()) - margin, 0)
    y1 = min(int(ys.max()) + 1 + margin, shape_xy[1])
    return x0, x1, y0, y1


def _valid_window_a(bc, a_extent, margin: int = 2):
    """Static (a0, a1) window along an x/y-plane fixup BC's FIRST
    lateral axis (the non-z one); the second lateral axis is z, which
    stays FULL — a z window would be a lane-dim slice of the packed
    state (the pathology _extract_z_slab exists to avoid), while full-z
    lateral pulls wrap exactly like the box so no margin is needed
    there. Used by the out-of-kernel windkessel fixups
    (_fix_xy_plane_windowed)."""
    v = np.asarray(bc.valid).any(axis=0)  # (A, B) = (lat0, z)
    if bc.windkessel is not None:
        v = v | (np.asarray(bc.flow_weight) != 0)
    idx = np.nonzero(v.any(axis=1))[0]
    if idx.size == 0:
        return None
    a0 = max(int(idx.min()) - margin, 0)
    a1 = min(int(idx.max()) + 1 + margin, a_extent)
    return a0, a1


def _fix_z_plane_windowed(cc, bc, win, sub, p_out, t,
                          interpret=False, splice=True,
                          wk_p=None, wk_rcr=None):
    """Windowed z-plane NEE fixup: recompute the fused step exactly on
    the consumer plane restricted to the bbox window, then splice it into
    the kernel output (exact because the written interior's pulls never
    reach the window border).

    sub: the PRE-STEP state slab p[x0:x1, y0:y1, :, c-1:c+2] — sliced
    by the caller BEFORE the (input-aliased) kernel call destroys p.

    wk_p / wk_rcr: windkessel-coupled outlet (bc.windkessel set) — the
    carried P_c scalar and optional traced RCR override; the outward
    flux Q sums the windowed flow_weight (the window covers the whole
    footprint, _valid_bbox) over the SAME previous-step slab macro the
    NEE formula reads, exactly engine/step.apply_bc_fixup's coupling.
    The return gains the updated P_c.

    Returns (p_out', velsum_delta[, P_c']): the kernel's velsum counted
    these plane cells with pre-NEE pulls, so the caller must add
    sum(|u_fixed|) - sum(|u_kernel|) over the spliced fluid cells to keep
    residual_flavor='velsum' honest for z-plane BCs."""
    from lbm_tpu.core.lattice import phi
    from lbm_tpu.engine.step import (apply_bc_fixup, collide, guo_source,
                                     half_force_shift, moving_bb_terms)

    x0, x1, y0, y1 = win
    c = bc.consumer_coord
    nbr_w = bc.nbr_wall_plane[:, x0:x1, y0:y1]
    nbr_m = (None if bc.nbr_moving_plane is None
             else bc.nbr_moving_plane[:, x0:x1, y0:y1])
    bb = (None if cc.wall_velocity is None
          else moving_bb_terms(cc.wall_velocity))
    pulled = _plane_pull_packed(sub, nbr_w, 2, 1,
                                nbr_moving_plane=nbr_m, bb=bb)
    fluid_pl = cc.fluid[x0:x1, y0:y1, c]

    def speed_sum(pl):
        """sum of |u| over the spliced fluid cells (window interior)."""
        rho_ = jnp.sum(pl, axis=0)
        ef_ = jnp.asarray(_E.T.astype(np.float32))
        mom_ = jnp.tensordot(ef_, pl, axes=([1], [0]),
                             precision=jax.lax.Precision.HIGHEST)
        mom_ = half_force_shift(mom_, cc.force)
        u_ = mom_ / jnp.where(rho_ == 0, 1.0, rho_)[None]
        speed = jnp.sqrt(jnp.sum(u_ * u_, axis=0))
        inner = jnp.zeros_like(fluid_pl).at[1:-1, 1:-1].set(
            fluid_pl[1:-1, 1:-1]
        )
        return jnp.sum(jnp.where(inner, speed, 0.0))

    vs_before = speed_sum(pulled)

    bc0 = dataclasses.replace(
        bc,
        consumer_coord=0,
        valid=bc.valid[:, x0:x1, y0:y1],
        phi_star=(None if bc.phi_star is None
                  else bc.phi_star[:, x0:x1, y0:y1]),
        phi_star_series=(None if bc.phi_star_series is None
                         else bc.phi_star_series[:, :, x0:x1, y0:y1]),
        flow_weight=(None if bc.flow_weight is None
                     else bc.flow_weight[x0:x1, y0:y1]),
    )
    src_plane = sub[:, :, :19, 1].transpose(2, 0, 1)  # (19, wx, wy)
    pulled_slab = jnp.expand_dims(pulled, 3)
    src_slab = jnp.expand_dims(src_plane, 3)
    wk_new = None
    if wk_p is not None:
        pulled_slab, wk_new = apply_bc_fixup(
            pulled_slab, src_slab, bc0, t, force=cc.force, wk_p=wk_p,
            wk_rcr=wk_rcr)
        pulled = jnp.squeeze(pulled_slab, 3)
    else:
        pulled = jnp.squeeze(
            apply_bc_fixup(pulled_slab, src_slab, bc0, t,
                           force=cc.force), 3)

    rho = jnp.sum(pulled, axis=0)
    ef = jnp.asarray(_E.T.astype(np.float32))
    mom = jnp.tensordot(ef, pulled, axes=([1], [0]),
                        precision=jax.lax.Precision.HIGHEST)
    mom = half_force_shift(mom, cc.force)
    u = mom / jnp.where(rho == 0, 1.0, rho)[None]
    feq = rho[None] * phi(u)
    post = collide(pulled, feq, cc.tau, cc.tau_minus, cc.mrt_k,
                   cc.closure, rho)
    if cc.force is not None:
        post = post + guo_source(u, cc.force, cc.tau, cc.tau_minus,
                                 cc.mrt_kf)
    vs_after = speed_sum(pulled)
    newplane = jnp.where(fluid_pl[None], post, src_plane)
    # Write the window interior only (border ring may be wrap-corrupted).
    # Channels >= 19 (mask/bits) are static and already correct in p_out.
    if splice:
        out = _splice_z_plane_inplace(
            p_out, newplane.transpose(1, 2, 0)[1:-1, 1:-1],
            x0=x0 + 1, y0=y0 + 1, c=c, interpret=interpret,
        )
    else:
        aux = sub[:, :, 19:, 1].transpose(2, 0, 1)
        full = jnp.concatenate([newplane, aux], axis=0).transpose(1, 2, 0)
        out = p_out.at[x0 + 1 : x1 - 1, y0 + 1 : y1 - 1, :, c].set(
            full[1:-1, 1:-1].astype(p_out.dtype)
        )
    dvs = vs_after - vs_before
    return (out, dvs) if wk_new is None else (out, dvs, wk_new)


def _fix_xy_plane_windowed(cc, bc, win, sub, p_out, t, interpret=False,
                           wk_p=None, wk_rcr=None):
    """Out-of-kernel consumer-plane fixup for an axis-0/1 NEE boundary —
    the windkessel route: RCR-coupled outlets need a per-step rho* from
    the carried P_c, which the in-kernel static NEE tables cannot
    express, so a windkessel BC on ANY axis runs as a windowed fixup
    (make_pallas_step routes them here; static/series x/y BCs keep the
    in-kernel path). Matches the dense windkessel coupling of
    engine/step.apply_bc_fixup (reference parity anchor: the hard-coded
    outlet split this replaces, coronary_cfd/coronary.cu:795-942).

    sub: the PRE-STEP packed slab p[c-1:c+2, a0:a1] (axis 0) or
    p[a0:a1, c-1:c+2] (axis 1) — a major-dim XLA slice (cheap; the
    lane-dim z stays FULL so in-plane z pulls wrap exactly like the
    box, see _valid_window_a). The splice back is a major-dim
    dynamic-update-slice of all 24 channels (mask channels rewritten
    with their own static values from the slab).

    Returns (p_out', velsum_delta[, P_c']) like _fix_z_plane_windowed."""
    from lbm_tpu.core.lattice import phi
    from lbm_tpu.engine.step import (apply_bc_fixup, collide, guo_source,
                                     half_force_shift, moving_bb_terms)

    axis = bc.axis
    a0, a1 = win
    c = bc.consumer_coord
    lat_w = (slice(a0, a1), slice(None))      # (A window, B=z full)
    nbr_w = bc.nbr_wall_plane[(slice(None),) + lat_w]
    nbr_m = (None if bc.nbr_moving_plane is None
             else bc.nbr_moving_plane[(slice(None),) + lat_w])
    bb = (None if cc.wall_velocity is None
          else moving_bb_terms(cc.wall_velocity))
    pulled = _plane_pull_packed(sub, nbr_w, axis, 1,
                                nbr_moving_plane=nbr_m, bb=bb)
    if axis == 0:
        fluid_pl = cc.fluid[c, a0:a1, :]
        src_plane = sub[1, :, :19, :].transpose(1, 0, 2)   # (19, A, B)
        aux_plane = sub[1, :, 19:, :]
    else:
        fluid_pl = cc.fluid[a0:a1, c, :]
        src_plane = sub[:, 1, :19, :].transpose(1, 0, 2)
        aux_plane = sub[:, 1, 19:, :]

    def speed_sum(pl):
        """sum of |u| over the spliced fluid cells (A-window interior;
        z is full and wraps like the box, so every z lane is owned)."""
        rho_ = jnp.sum(pl, axis=0)
        ef_ = jnp.asarray(_E.T.astype(np.float32))
        mom_ = jnp.tensordot(ef_, pl, axes=([1], [0]),
                             precision=jax.lax.Precision.HIGHEST)
        mom_ = half_force_shift(mom_, cc.force)
        u_ = mom_ / jnp.where(rho_ == 0, 1.0, rho_)[None]
        speed = jnp.sqrt(jnp.sum(u_ * u_, axis=0))
        inner = jnp.zeros_like(fluid_pl).at[1:-1, :].set(fluid_pl[1:-1, :])
        return jnp.sum(jnp.where(inner, speed, 0.0))

    vs_before = speed_sum(pulled)

    bc0 = dataclasses.replace(
        bc,
        consumer_coord=0,
        valid=bc.valid[(slice(None),) + lat_w],
        phi_star=(None if bc.phi_star is None
                  else bc.phi_star[(slice(None),) + lat_w]),
        phi_star_series=(None if bc.phi_star_series is None
                         else bc.phi_star_series[
                             (slice(None), slice(None)) + lat_w]),
        flow_weight=(None if bc.flow_weight is None
                     else bc.flow_weight[lat_w]),
    )
    # lift the (19, A, B) plane into a slab whose `axis` extent is 1 so
    # apply_bc_fixup's generic plane slicer addresses it at coord 0
    exp = 1 + axis
    pulled_slab = jnp.expand_dims(pulled, exp)
    src_slab = jnp.expand_dims(src_plane, exp)
    wk_new = None
    if wk_p is not None:
        pulled_slab, wk_new = apply_bc_fixup(
            pulled_slab, src_slab, bc0, t, force=cc.force, wk_p=wk_p,
            wk_rcr=wk_rcr)
    else:
        pulled_slab = apply_bc_fixup(pulled_slab, src_slab, bc0, t,
                                     force=cc.force)
    pulled = jnp.squeeze(pulled_slab, exp)

    rho = jnp.sum(pulled, axis=0)
    ef = jnp.asarray(_E.T.astype(np.float32))
    mom = jnp.tensordot(ef, pulled, axes=([1], [0]),
                        precision=jax.lax.Precision.HIGHEST)
    mom = half_force_shift(mom, cc.force)
    u = mom / jnp.where(rho == 0, 1.0, rho)[None]
    feq = rho[None] * phi(u)
    post = collide(pulled, feq, cc.tau, cc.tau_minus, cc.mrt_k,
                   cc.closure, rho)
    if cc.force is not None:
        post = post + guo_source(u, cc.force, cc.tau, cc.tau_minus,
                                 cc.mrt_kf)
    vs_after = speed_sum(pulled)
    newplane = jnp.where(fluid_pl[None], post, src_plane)
    # splice the A-window interior (all 24 channels: mask channels get
    # their own static slab values, so the channel dim stays full and
    # the update is one contiguous major-dim DUS)
    full = jnp.concatenate(
        [newplane.transpose(1, 0, 2), aux_plane], axis=1
    )[1:-1].astype(p_out.dtype)                         # (wa-2, C, B)
    if axis == 0:
        out = p_out.at[c, a0 + 1 : a1 - 1].set(full)
    else:
        out = p_out.at[a0 + 1 : a1 - 1, c].set(full)
    dvs = vs_after - vs_before
    return (out, dvs) if wk_new is None else (out, dvs, wk_new)


class _PairCopy:
    """start()/wait() over a pair of async copies (rho + u outputs)."""

    def __init__(self, a, b):
        self.a, self.b = a, b

    def start(self):
        self.a.start()
        self.b.start()

    def wait(self):
        self.a.wait()
        self.b.wait()


def packed_macro(p, ring: int = 1, interpret: bool = False,
                 tx: int | None = None, ty: int | None = None,
                 force=None):
    """(rho (nx, ny, nzp), u (3, nx, ny, nzp)) moments of the packed
    state's INTERIOR via a tile-streamed Pallas kernel — the 512^3
    output path.

    The dense route (`unpack_state` -> engine/step.macro_fields)
    materializes the (19, X, Y, Z) f32 array — ~10.2 GB at 512^3, which
    cannot coexist with the ~12.9 GB packed state in one chip's HBM
    (VERDICT r3 missing-#2). This kernel streams (tx, ty, C, Z) tiles
    through VMEM and emits only rho + u (~2.1 GB at 512^3), as TWO
    buffers so no caller ever pays a multi-GB slicing copy (a combined
    (4, ...) output measured RESOURCE_EXHAUSTED at 512^3: state 12.9 +
    combined 2.1 + sliced copies 2.1 GB > 16 GB HBM).

    Semantics note: engine/step.macro_fields overrides non-fluid cells
    with their init (rho0, u0). Here non-fluid cells get their MOMENTS
    instead — equal to the init values up to fp32 rounding, because
    non-fluid cells hold their initial feq(rho0, u0) forever (kernel
    passthrough) and feq's moments reproduce (rho0, rho0*u0) exactly in
    exact arithmetic. Rounding-level differences (~1e-7) only.
    """
    nxp, nyp, c, nz = p.shape
    nx, ny = nxp - 2 * ring, nyp - 2 * ring
    if tx is None or ty is None:
        if interpret:
            tx, ty = nx, ny
        else:
            tx = next((t for t in (16, 8, 4, 2, 1) if nx % t == 0), 1)
            ty = next((t for t in (16, 8, 4, 2, 1) if ny % t == 0), 1)
    gx, gy = nx // tx, ny // ty
    sty = ty if interpret else min(ty, 8)

    def kern(p_hbm, rho_hbm, u_hbm, ft, otr, otu, in_sems,
             out_sems):
        def in_copy(slot, tid):
            i, j = tid // gy, tid % gy
            return pltpu.make_async_copy(
                p_hbm.at[pl.ds(ring + i * tx, tx),
                         pl.ds(ring + j * ty, ty)],
                ft.at[slot], in_sems.at[slot],
            )

        def out_copy(slot, tid):
            i, j = tid // gy, tid % gy
            return _PairCopy(
                pltpu.make_async_copy(
                    otr.at[slot],
                    rho_hbm.at[pl.ds(i * tx, tx), pl.ds(j * ty, ty)],
                    out_sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    otu.at[slot],
                    u_hbm.at[:, pl.ds(i * tx, tx), pl.ds(j * ty, ty)],
                    out_sems.at[slot, 1],
                ),
            )

        def work(pidx, tid, slot):
            for ox in range(0, tx):
                for oy in range(0, ty, sty):
                    sx = slice(ox, ox + 1)
                    sy = slice(oy, oy + sty)
                    rho = ft[slot, sx, sy, 0, :].astype(jnp.float32)
                    mx = jnp.zeros_like(rho)
                    my = jnp.zeros_like(rho)
                    mz = jnp.zeros_like(rho)
                    for i in range(1, 19):
                        v = ft[slot, sx, sy, i, :].astype(jnp.float32)
                        rho = rho + v
                        ex, ey, ez = (int(cm) for cm in _E[i])
                        if ex:
                            mx = mx + v if ex > 0 else mx - v
                        if ey:
                            my = my + v if ey > 0 else my - v
                        if ez:
                            mz = mz + v if ez > 0 else mz - v
                    if force is not None:  # Guo half-force u shift
                        mx = mx + np.float32(0.5 * force[0])
                        my = my + np.float32(0.5 * force[1])
                        mz = mz + np.float32(0.5 * force[2])
                    inv = np.float32(1.0) / jnp.where(
                        rho == 0.0, np.float32(1.0), rho)
                    otr[slot, sx, sy, :] = rho
                    otu[slot, 0, sx, sy, :] = mx * inv
                    otu[slot, 1, sx, sy, :] = my * inv
                    otu[slot, 2, sx, sy, :] = mz * inv

        _drive(gx * gy, lambda q: q, in_copy, out_copy, work)

    rho, u = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32),
            jax.ShapeDtypeStruct((3, nx, ny, nz), jnp.float32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, tx, ty, c, nz), p.dtype),
            pltpu.VMEM((2, tx, ty, nz), jnp.float32),
            pltpu.VMEM((2, 3, tx, ty, nz), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(p)
    return rho, u


@functools.partial(jax.jit, static_argnames=("x0", "wx", "interpret"))
def _extract_rows(p, *, x0, wx, interpret=False):
    """p[x0:x0+wx] (full y/C/z) via one HBM-to-HBM DMA — the chunked
    device->host unpack primitive (an XLA slice of the multi-GB packed
    state risks the transposed-full-copy layout answer, cf.
    _extract_z_slab)."""

    def kern(p_hbm, out_ref, sem):
        cp = pltpu.make_async_copy(p_hbm.at[pl.ds(x0, wx)], out_ref, sem)
        cp.start()
        cp.wait()

    (out,) = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((wx,) + p.shape[1:], p.dtype)],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(p)
    return out


def unpack_state_lowmem(p, spec, ring: int = 1, interpret: bool = False):
    """Packed device state -> HOST portable (19, nx, ny, nz) f32, in
    bounded x-row chunks (the dense unpack is ~10.2 GB on device at
    512^3 — OOM next to the state; here device residency peaks at the
    state + one ~256 MB chunk)."""
    nx, ny, nz = (int(s) for s in spec.shape)
    Y, Cn, Z = (int(s) for s in p.shape[1:])
    out = np.empty((19, nx, ny, nz), np.float32)
    B = max(1, int(256e6) // (Y * Cn * Z * 4))
    for x0 in range(0, nx, B):
        b = min(B, nx - x0)
        blk = np.asarray(
            _extract_rows(p, x0=ring + x0, wx=b, interpret=interpret)
        ).astype(np.float32)
        out[:, x0 : x0 + b] = blk[:, ring : ring + ny, :19, :nz
                                  ].transpose(2, 0, 1, 3)
    return out


def pack_state_lowmem(f, spec_pad, ring: int = 1, dtype=jnp.float32):
    """Channel-streamed pack of a HOST portable (19, nx, ny, nz) f into
    the packed padded device layout — the 512^3 mirror of pack_state
    for checkpoint restore (pack_state would pad the dense f on device:
    ~10.2 GB next to the packed buffer)."""
    X, Y, Z = (int(s) for s in spec_pad.shape)
    f = np.asarray(f, np.float32)
    nx, ny, nz = f.shape[1:]
    pads = ((ring, X - nx - ring), (ring, Y - ny - ring), (0, Z - nz))

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
    def put_ch(p, v, ch):
        return p.at[:, :, ch, :].set(v.astype(p.dtype))

    p = jnp.zeros((X, Y, C, Z), dtype)
    for i in range(D3Q19.Q):
        p = put_ch(p, jnp.asarray(np.pad(f[i], pads)), i)
    m_dev = jnp.asarray(np.asarray(spec_pad.mask, np.float32))
    p = put_ch(p, m_dev, MASK_CH)
    p = put_ch(p, jnp.roll(m_dev, +1, axis=2), MASK_ZP_CH)
    p = put_ch(p, jnp.roll(m_dev, -1, axis=2), MASK_ZM_CH)
    return p


def live_tile_ids(mask_padded, tx: int, ty: int, ring: int = 1):
    """Static block-sparse tile list: ids (row-major over the (gx, gy)
    grid) of tiles containing at least one live (non-DEAD) cell. The
    TPU-native replacement for the reference's per-cell sparse
    compaction (Poiseulle.cu:257-271): per-cell gathers serialize on
    TPU sublanes, but whole dead TILES can be skipped outright — their
    contents are static, and the kernel's output aliases its input, so
    skipped tiles simply persist."""
    m = np.asarray(mask_padded) != int(CellType.DEAD)
    nxp, nyp = m.shape[0], m.shape[1]
    nx, ny = nxp - 2 * ring, nyp - 2 * ring
    gx, gy = nx // tx, ny // ty
    ids = []
    for i in range(gx):
        for j in range(gy):
            blk = m[ring + i * tx : ring + (i + 1) * tx,
                    ring + j * ty : ring + (j + 1) * ty]
            if blk.any():
                ids.append(i * gy + j)
    return np.asarray(ids, np.int32)


def _extract_seam(p, tx: int, ring: int = 1):
    """Pre-step seam rows for the in-place aliased kernel: row
    i*tx+ring-1 for every tile-row i (tile i's NORTH skirt row = tile
    i-1's last interior row, which _drive's in-place ordering has
    already overwritten by the time tile i's input DMA starts whenever
    gy>1 — see _kernel). Shape (gx, nyp, C, Z). A strided slice on the
    MAJOR dim is gx contiguous row copies (cheap; the pathological case
    _extract_z_slab works around is lane-dim slicing). Must be
    sequenced before the aliased kernel via optimization_barrier, like
    the z-BC slabs."""
    nxp = p.shape[0]
    gx = (nxp - 2 * ring) // tx
    return jax.lax.slice(
        p, (ring - 1, 0, 0, 0),
        (ring - 1 + (gx - 1) * tx + 1,) + p.shape[1:],
        (tx, 1, 1, 1))


@functools.partial(
    jax.jit,
    static_argnames=("x0", "y0", "c", "nch", "interpret"),
)
def _splice_z_plane_inplace(p, val, *, x0, y0, c, nch=19,
                            interpret=False):
    """Write val (wx, wy, nch) into p[x0:x0+wx, y0:y0+wy, :nch, c]
    IN PLACE via an aliased read-modify-write Pallas kernel.

    A `p.at[...].set(...)` here copies the ENTIRE multi-GB state per
    boundary per step — measured 16 of the coronary run's 19.7 ms/step
    went to three such splices. This kernel aliases its output onto p
    and touches only the lane block containing plane c (~MBs).
    nch: leading channel count to write (19 pdfs for the flow state;
    7 for the D3Q7 scalar state, kernels/scalar_stream.py)."""
    wx, wy, _ = val.shape
    nzp = p.shape[-1]
    blk = 128 if nzp % 128 == 0 else nzp
    cblk, coff = (c // blk) * blk, c % blk
    L = min(blk, nzp - cblk)
    cd = p.shape[2]
    # 24 MB chunk budget: at BX=1 a 300-row-wide splice (the sharded
    # fixup's full-shard-width window) serialized 26 start/wait DMA
    # pairs per BC per step — most of a measured 9 ms/step fixup bill.
    BX = max(1, min(wx, (24 << 20) // max(wy * cd * L * 4, 1)))
    chunks = [(k, min(BX, wx - k)) for k in range(0, wx, BX)]

    def kern(p_hbm, val_ref, out_hbm, buf, sem_in, sem_out):
        for off, bx in chunks:
            cp = pltpu.make_async_copy(
                p_hbm.at[pl.ds(x0 + off, bx), pl.ds(y0, wy), :,
                         pl.ds(cblk, L)],
                buf.at[pl.ds(0, bx)],
                sem_in,
            )
            cp.start()
            cp.wait()
            li = jax.lax.broadcasted_iota(jnp.int32, (bx, wy, nch, L), 3)
            v = val_ref[pl.ds(off, bx), :, :][..., None].astype(buf.dtype)
            buf[pl.ds(0, bx), :, :nch, :] = jnp.where(
                li == coff, v, buf[pl.ds(0, bx), :, :nch, :]
            )
            cp = pltpu.make_async_copy(
                buf.at[pl.ds(0, bx)],
                out_hbm.at[pl.ds(x0 + off, bx), pl.ds(y0, wy), :,
                           pl.ds(cblk, L)],
                sem_out,
            )
            cp.start()
            cp.wait()

    (out,) = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype)],
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((BX, wy, cd, L), p.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_VMEM_LIMIT,  # the 24 MB chunk buffer
            # exceeds the default 16 MB scoped cap
        ),
        interpret=interpret,
    )(p, val)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("x0", "y0", "wx", "wy", "c", "interpret"),
)
def _extract_z_slab(p, *, x0, y0, wx, wy, c, interpret=False):
    """p[x0:x0+wx, y0:y0+wy, :, c-1:c+2] without an XLA lane-dim slice
    of the full state: at 512^3, layout assignment answered that slice
    with a TRANSPOSED full copy of the 13 GB state inside the step loop
    (copy.*.remat4, {1,0,3,2} layout, 15.2 GB with padding) — the HBM
    OOM. Instead one HBM-to-HBM DMA moves the 128-aligned lane block(s)
    covering [c-1, c+1] (Mosaic requires lane-aligned DMA slices), and
    the 3-lane slice happens in XLA on the few-MB result."""
    nzp = int(p.shape[-1])
    blk = 128 if nzp % 128 == 0 else nzp
    b0 = ((c - 1) // blk) * blk
    b1 = min(-(-(c + 2) // blk) * blk, nzp)
    L = b1 - b0

    def kern(p_hbm, out_ref, sem):
        cp = pltpu.make_async_copy(
            p_hbm.at[pl.ds(x0, wx), pl.ds(y0, wy), :, pl.ds(b0, L)],
            out_ref,
            sem,
        )
        cp.start()
        cp.wait()

    (out,) = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((wx, wy, p.shape[2], L),
                                        p.dtype)],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(p)
    lo = (c - 1) - b0
    return out[:, :, :, lo : lo + 3].astype(jnp.float32)


def classify_tiles(mask_padded, tx: int, ty: int, ring: int = 1,
                   fuse: int = 1):
    """Static pure/mixed tile classification for the fast-path split.

    A tile is PURE when every column (x, y) of its kernel INPUT region
    (interior + the fuse-dependent halo skirt) has the standard z-slab
    pattern [DEAD.., WALL, FLUID span, WALL, DEAD..] with one
    common fluid span — then all wall tests are z-lane iota compares and
    whole mask machinery drops out (_subtile_compute_pure). Everything
    else (lateral walls, NEE boundary planes, vessel geometry, lane-
    structure oddities) is MIXED and takes the general path.

    Returns (order, n_pure, zspan): `order` is the row-major tile id list
    reordered pure-first (int32), n_pure the count of pure tiles, zspan
    the common fluid z-span (meaningless if n_pure == 0).
    """
    m = np.asarray(mask_padded)
    nxp, nyp, nzp = m.shape
    nx, ny = nxp - 2 * ring, nyp - 2 * ring
    gx, gy = nx // tx, ny // ty
    F = int(CellType.FLUID)
    W = int(CellType.WALL)
    fluid = m == F
    any_f = fluid.any(axis=2)
    nf = fluid.sum(axis=2)
    first_f = np.where(any_f, fluid.argmax(axis=2), -1)
    last_f = np.where(
        any_f, nzp - 1 - fluid[:, :, ::-1].argmax(axis=2), -2
    )

    def at_z(z):
        return np.take_along_axis(
            m, np.clip(z, 0, nzp - 1)[..., None], axis=2
        )[..., 0]

    # Cells beyond the WALL caps may carry any non-fluid label (DEAD,
    # -1 ghosts, lane padding): fluid never pulls from them (distance
    # > 1) and their own update is a passthrough on both paths.
    std = (
        any_f
        & (first_f >= 1) & (last_f <= nzp - 2)
        & (at_z(first_f - 1) == W)      # wall right below the span
        & (at_z(last_f + 1) == W)       # wall right above the span
        & (nf == last_f - first_f + 1)  # contiguous fluid, none outside
    )
    if std.any():
        spans = first_f[std] * nzp + last_f[std]
        vals, cnts = np.unique(spans, return_counts=True)
        win = int(vals[np.argmax(cnts)])
        zf0, zf1 = win // nzp, win % nzp
        std = std & (first_f == zf0) & (last_f == zf1)
        zspan = (int(zf0), int(zf1))
    else:
        zspan = (0, -1)
    # input region of tile (i, j): ring-1+fuse-1 == ring - 2 + fuse ...
    # _kernel reads [i*tx + ring - 1, ...+tx+2); _kernel2 (ring=2) reads
    # [i*tx, ...+tx+4) — both are [i*tx + ring - fuse, ...+tx+2*fuse)
    skirt = fuse
    x0s = ring - skirt
    pure = np.zeros(gx * gy, bool)
    for i in range(gx):
        for j in range(gy):
            blk = std[x0s + i * tx : x0s + i * tx + tx + 2 * skirt,
                      x0s + j * ty : x0s + j * ty + ty + 2 * skirt]
            pure[i * gy + j] = bool(blk.all())
    ids = np.arange(gx * gy, dtype=np.int32)
    order = np.concatenate([ids[pure], ids[~pure]]).astype(np.int32)
    return order, int(pure.sum()), zspan


def make_pallas_step(
    cc_pad, tx: int | None = None, ty: int | None = None,
    interpret: bool = False,
    stx: int | None = None, sty: int | None = None,
    ring: int = 1, fuse: int = 1, tile_skip=False,
    pure_split: bool = False, bits: bool = False,
    in_place: bool | None = None, tile_shrink: int = 0,
    force_field=None,
) -> Callable:
    """Build the Pallas-backed fused step over PACKED PADDED state.

    cc_pad: CompiledCase built from pad_spec(spec, lane_multiple=...,
    halo=ring); all coordinates padded. Returns step(p, t) ->
    (p', velsum) where p is the packed (X+2r, Y+2r, C, Z) state (see
    pack_state). fuse=2 advances TWO steps per call (requires ring=2
    and no z-plane BCs) and returns velsum as a (2,) vector. tile_skip
    skips all-dead tiles (block-sparse geometries; see live_tile_ids):
    True forces it, "auto" enables it when the LIVE TILE fraction is
    <60% (a tile spans all z, so a 1% cell-occupancy tree can still
    touch most tiles — measured at 288x288x372: 1.3% cells but enough
    live tiles that forced skip ran 19.7 ms/step vs 18.1 dense, while
    128^3 at 34% live tiles gained 3.10 -> 2.43) or when in_place
    already pays the strict DMA ordering anyway. in_place=True aliases
    the output onto the input even without skipping — REQUIRED at
    512^3-class sizes where two 13 GB buffers don't fit one chip.
    pure_split routes statically-all-standard tiles through the
    mask-free fast path (classify_tiles / _subtile_compute_pure).
    OPT-IN, measured a LOSS in every configuration on v5e at 256^3:
    the in-ONE-kernel two-path branch regresses f1 from 5.99 to 12.68
    ms/step (round 2; Mosaic schedules the doubled branchy body
    poorly, ~20 min compile); the two-pallas_call split over disjoint
    tile lists regresses f2 from 7.40 to 11.36 ms/step (round 3,
    >30 min compile). The fast path stays for correctness coverage
    and small-geometry reuse, but the HBM-bytes lever that actually
    pays is bf16 storage (pack_state dtype=).

    NEE boundaries on x/y planes run INSIDE the kernel (plane-row masks +
    VMEM phi* tables); z-plane boundaries (coronary sub-outlets) fall back
    to the XLA consumer-plane fixup. Windkessel (RCR) outlets on ANY
    axis run as out-of-kernel fixups too — their rho* depends on the
    carried per-outlet P_c, which rides the OUTER scan as an (n_wk,)
    carry: with windkessel BCs present the returned step's signature is
    step(p, t, wk) -> (p', velsum, wk'), matching engine/step
    .make_step_wk (wk order = windkessel BCs within cc.bcs, wk_init).

    force_field: static (buoy(3,), c_ref, base(3,)|None) — the per-cell
    Boussinesq force mode (engine/thermal semantics): the step gains a
    g-pack argument, step(p, t, gf[, wk]), and F = buoy (c - c_ref) +
    base is built in-kernel from gf's 7 scalar channels per tile
    (kernel mirror of step.make_step_force; plane-BC fixups keep the
    static base force, exactly the documented dense semantics).
    """
    from lbm_tpu.engine.step import has_windkessel
    has_wk = has_windkessel(cc_pad.bcs)
    if force_field is not None:
        if cc_pad.force is not None:
            raise ValueError(
                "force_field carries the static base force in its third "
                "slot; compile the case without CaseSpec.force")
        if fuse == 2 or pure_split:
            raise ValueError(
                "force_field is wired on the single-step full-tile path "
                "only (no fuse=2 / pure_split)")
        if cc_pad.mrt_k is not None or cc_pad.closure is not None:
            raise ValueError(
                "force_field + MRT/closure needs the moment-space or "
                "variable-rate source — use the dense backend")
        buoy_f, cref_f, base_f = force_field
        force_field = (tuple(float(v) for v in buoy_f), float(cref_f),
                       None if base_f is None
                       else tuple(float(v) for v in base_f))
    nxp, nyp, nz = cc_pad.shape
    nx, ny = nxp - 2 * ring, nyp - 2 * ring
    prefer_small = interpret and tx is None and ty is None
    # big DMA tiles only pay off on hardware; small tiles keep the
    # interpreter's unrolled sub-tile loop (and tracing time) short.
    # The budget default accounts for Mosaic's ~3.9x stack-over-scratch
    # accounting at every size (_VMEM_LIMIT/_STACK_FACTOR); tile_shrink
    # steps down the candidate ladder when a compile still overflows.
    auto = _pick_tiles(nx, ny, nz, prefer_small=prefer_small, fuse=fuse,
                       skip=tile_shrink)
    tx = tx if tx is not None else auto[0]
    ty = ty if ty is not None else auto[1]
    if interpret:
        # no vector registers to spill off-TPU, and every sub-tile is
        # another unrolled trace — default to whole-tile compute
        stx = stx if stx is not None else tx
        sty = sty if sty is not None else ty
    else:
        stx = stx if stx is not None else auto[2]
        sty = sty if sty is not None else auto[3]
    stx = min(stx, tx)
    sty = min(sty, ty)
    # Static collide rate(s): a float for BGK, a (tau, tau_minus) pair
    # for TRT (CaseSpec.collision='trt') — both hashable jit statics.
    tau = float(cc_pad.tau)
    if cc_pad.tau_minus is not None:
        tau = (tau, float(cc_pad.tau_minus))
    force = cc_pad.force  # static 3-tuple (Guo body force) or None
    wall_velocity = cc_pad.wall_velocity  # static 3-tuple or None
    mrt = None
    if cc_pad.mrt_k is not None:
        if force is not None:
            raise ValueError(
                "MRT + body force needs the moment-space source matmul "
                "— run it on the xla/sparse backends (the kernel "
                "supports MRT without force)")
        from lbm_tpu.core.mrt import mrt_rank_update
        spec0 = cc_pad.spec
        mrt = mrt_rank_update(float(cc_pad.tau), spec0.mrt_rates)
    les = cc_pad.closure  # static tau-closure tuple (core/rheology):
    # with TRT the closure branch runs the constant-Lambda parity
    # split (per-cell even rate tau_eff, odd via closure_tau_minus)
    if les is not None and force is not None:
        raise ValueError(
            "per-cell tau closure (LES/rheology) + body force needs the "
            "variable-rate Guo prefactor — run it on the xla/sparse "
            "backends (the kernel supports closures without force)")

    kernel_bcs = [bc for bc in cc_pad.bcs
                  if bc.axis in (0, 1) and bc.windkessel is None]
    fixup_bcs = [bc for bc in cc_pad.bcs
                 if bc.axis == 2 or bc.windkessel is not None]
    if in_place and (fuse == 2 or pure_split):
        raise ValueError(
            "in_place aliasing is only wired on the single-call fuse=1 "
            "path (512^3-class memory fits)"
        )
    if fuse == 2:
        if ring != 2:
            raise ValueError("fuse=2 needs a ring-2 padded state "
                             "(pad_spec(halo=2))")
        if fixup_bcs:
            raise ValueError(
                "fuse=2 cannot interleave the out-of-kernel NEE fixups "
                "(z-plane or windkessel boundaries) between the two "
                "fused steps — use fuse=1 for such cases"
            )
    bcs_static = tuple(
        BCStatic.make(
            bc.axis, bc.consumer_coord, bc.dirs,
            bc.rho_fixed, bc.u_mode == "extrapolate", bc.omega,
        )
        for bc in kernel_bcs
    )
    nee_static = []
    for bc in kernel_bcs:
        if bc.u_mode == "series":
            nee_static.append(("series", _build_nee_series(bc),
                               bc.series_stride))
        else:
            nee_static.append(("static", _build_nee(bc), 1))

    tids = None
    n_live = None
    split = None  # (pure_ids, mixed_ids, zspan): two-call pure/mixed
    if tile_skip == "auto":
        ids_np = live_tile_ids(cc_pad.spec.mask, tx, ty, ring=ring)
        total_tiles = (nx // tx) * (ny // ty)
        frac = len(ids_np) / max(total_tiles, 1)
        # skip pays its strict in-place DMA ordering only when enough
        # tiles actually drop out — or when in_place is forced anyway
        # (then the ordering cost is already paid and the list is free)
        tile_skip = frac < 0.6 or (bool(in_place) and frac < 1.0)
    if tile_skip:
        tids = jnp.asarray(live_tile_ids(
            cc_pad.spec.mask, tx, ty, ring=ring))
        n_live = int(tids.shape[0])
    elif pure_split:
        order, np_, zspan = classify_tiles(
            cc_pad.spec.mask, tx, ty, ring=ring, fuse=fuse)
        if 0 < np_ < len(order):
            split = (jnp.asarray(order[:np_]),
                     jnp.asarray(order[np_:]), zspan)

    wins = [
        _valid_bbox(bc, (nxp, nyp)) if bc.axis == 2
        else _valid_window_a(bc, nyp if bc.axis == 0 else nxp)
        for bc in fixup_bcs
    ]
    # carried-P_c index per fixup BC (wk order = windkessel BCs within
    # cc.bcs — all of which are fixups here, so enumeration agrees with
    # engine/compile.wk_init)
    wk_ks = []
    k = 0
    for bc in fixup_bcs:
        wk_ks.append(k if bc.windkessel is not None else None)
        if bc.windkessel is not None:
            k += 1

    def extract_sub(p, bc, w):
        if bc.axis == 2:
            return _extract_z_slab(
                p, x0=w[0], y0=w[2], wx=w[1] - w[0], wy=w[3] - w[2],
                c=bc.consumer_coord, interpret=interpret)
        a0, a1 = w
        c0 = bc.consumer_coord
        if bc.axis == 0:
            return jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(p, c0 - 1, c0 + 2, axis=0),
                a0, a1, axis=1)
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(p, c0 - 1, c0 + 2, axis=1),
            a0, a1, axis=0)

    def apply_fixup(p_bulk, idx, sub, t, wk):
        """Fixup BC #idx; returns (p', dvs, wk') with wk threaded."""
        bc, w, kk = fixup_bcs[idx], wins[idx], wk_ks[idx]
        kwargs = dict(wk_p=wk[kk]) if kk is not None else {}
        fn = (_fix_z_plane_windowed if bc.axis == 2
              else _fix_xy_plane_windowed)
        res = fn(cc_pad, bc, w, sub, p_bulk, t, interpret=interpret,
                 **kwargs)
        if kk is not None:
            p_bulk, dvs, p_new = res
            wk = jnp.asarray(wk).at[kk].set(p_new)
        else:
            p_bulk, dvs = res
        return p_bulk, dvs, wk

    def nee_at(t):
        nee = []
        for kind, arr, stride in nee_static:
            if kind == "series":
                T = arr.shape[0]
                phase = (t // stride) % T
                nee.append(
                    jax.lax.dynamic_index_in_dim(arr, phase, 0, False)
                )
            else:
                nee.append(arr)
        return nee

    if fuse == 2:
        def step(p, t):
            extra = nee_at(t) + nee_at(t + 1)
            if split is not None:
                pure_ids, mixed_ids, zs = split
                out_a, vs_a = _pallas_bulk2(
                    p, pure_ids, tau=tau, tx=tx, ty=ty, bcs_static=(),
                    interpret=interpret, stx=stx, sty=sty,
                    n_live=int(pure_ids.shape[0]), pure=True, zspan=zs,
                    force=force, mrt=mrt, les=les,
                )
                out, vs_b = _pallas_bulk2(
                    p, *extra, mixed_ids, out_a, tau=tau, tx=tx, ty=ty,
                    bcs_static=bcs_static, interpret=interpret,
                    stx=stx, sty=sty, n_live=int(mixed_ids.shape[0]),
                    has_prev=True, bits=bits, force=force, wall_velocity=wall_velocity, mrt=mrt, les=les,
                )
                return out, vs_a + vs_b
            if tids is not None:
                extra.append(tids)
            return _pallas_bulk2(
                p, *extra, tau=tau, tx=tx, ty=ty, bcs_static=bcs_static,
                interpret=interpret, stx=stx, sty=sty, n_live=n_live,
                bits=bits, force=force, wall_velocity=wall_velocity, mrt=mrt, les=les,
            )

        return step

    # Will the bulk call alias its output onto the input? (mirrors
    # _pallas_bulk's in_place default: sparse tile lists force it)
    total_tiles = (nx // tx) * (ny // ty)
    ip_bulk = bool(in_place) or (
        n_live is not None and n_live < total_tiles and split is None)
    need_seam = ip_bulk and (nx // tx) > 1 and (ny // ty) > 1

    def step_impl(p, t, wk, gf=None):
        extra = nee_at(t)
        if gf is not None:
            extra = [gf] + extra
        if tids is not None:
            extra.append(tids)
        # fixup-BC slabs and the seam rows must be extracted from the
        # PRE-step state before the input-aliased kernel call
        # overwrites it (z slabs via a DMA kernel, not an XLA lane
        # slice — see _extract_z_slab; x/y slabs and seam rows are
        # major-dim slices, fine in XLA).
        seam = _extract_seam(p, tx, ring) if need_seam else None
        subs = [
            extract_sub(p, bc, w)
            for bc, w in zip(fixup_bcs, wins) if w is not None
        ]
        if (subs or seam is not None) and ip_bulk:
            # sequence the extraction before the input-aliased kernel:
            # a second live consumer of p makes XLA copy the whole
            # state per step (measured +8.4 ms at 291^3-class on the
            # sharded path; same hazard here)
            pre = [seam] if seam is not None else []
            bar = jax.lax.optimization_barrier((p, *pre, *subs))
            p, rest_b = bar[0], list(bar[1:])
            if seam is not None:
                seam, rest_b = rest_b[0], rest_b[1:]
            subs = rest_b
        if seam is not None:
            extra.append(seam)
        if split is not None:
            pure_ids, mixed_ids, zs = split
            out_a, vs_a = _pallas_bulk(
                p, pure_ids, tau=tau, tx=tx, ty=ty, bcs_static=(),
                interpret=interpret, stx=stx, sty=sty, ring=ring,
                n_live=int(pure_ids.shape[0]), pure=True, zspan=zs,
                force=force, mrt=mrt, les=les,
            )
            p_bulk, vs_b = _pallas_bulk(
                p, *extra, mixed_ids, out_a, tau=tau, tx=tx, ty=ty,
                bcs_static=bcs_static, interpret=interpret,
                stx=stx, sty=sty, ring=ring,
                n_live=int(mixed_ids.shape[0]), has_prev=True, bits=bits,
                force=force, wall_velocity=wall_velocity, mrt=mrt, les=les,
            )
            vs = vs_a + vs_b
        else:
            p_bulk, vs = _pallas_bulk(
                p, *extra, tau=tau, tx=tx, ty=ty, bcs_static=bcs_static,
                interpret=interpret, stx=stx, sty=sty, ring=ring,
                n_live=n_live, bits=bits,
                in_place=True if in_place else None,
                has_seam=need_seam, force=force, wall_velocity=wall_velocity, mrt=mrt, les=les,
                has_gf=gf is not None, fforce=force_field,
            )
        k = 0
        for idx, win in enumerate(wins):
            if win is None:
                continue
            p_bulk, dvs, wk = apply_fixup(p_bulk, idx, subs[k], t, wk)
            k += 1
            vs = vs + dvs
        return p_bulk, vs, wk

    if force_field is not None:
        if has_wk:
            def step_ff_wk(p, t, gf, wk):
                return step_impl(p, t, wk, gf=gf)

            return step_ff_wk

        def step_ff(p, t, gf):
            p_, vs, _ = step_impl(p, t, None, gf=gf)
            return p_, vs

        return step_ff

    if has_wk:
        def step_wk(p, t, wk):
            return step_impl(p, t, wk)

        return step_wk

    def step(p, t):
        p, vs, _ = step_impl(p, t, None)
        return p, vs

    return step


def pad_spec(spec, lane_multiple: int = 1, plane_multiples=(1, 1),
             halo: int = 1):
    """A copy of a CaseSpec with the lattice halo-padded in x and y (mask
    gets DEAD rings, init fields zero/one rings, BC coords shift by
    +halo, lateral plane fields pad accordingly). halo=2 is the 2-step
    fused kernel's ring. If `lane_multiple` > 1, the z extent pads AT
    THE END with dead cells up to that multiple — Mosaic requires the
    lane dimension be 128-aligned. `plane_multiples` rounds the x/y
    interiors up the same way so awkward extents (e.g. the
    bifurcation's prime ny=83) still get efficient kernel tiles. Every
    case keeps its borders non-fluid, so trailing dead layers are inert
    (same argument as the halo rings)."""
    import copy
    import dataclasses as dc

    h = halo
    xpad = (-spec.shape[0]) % plane_multiples[0]
    ypad = (-spec.shape[1]) % plane_multiples[1]
    zpad = (-spec.shape[2]) % lane_multiple
    spatial = ((h, h + xpad), (h, h + ypad), (0, zpad))
    mask = np.pad(np.asarray(spec.mask), spatial)
    rho0 = np.pad(np.asarray(spec.rho0), spatial, constant_values=1.0)
    u0 = np.pad(np.asarray(spec.u0), ((0, 0),) + spatial)
    endpad = {0: xpad, 1: ypad, 2: zpad}

    def pad_lat(arr, axis, lead):
        lat = [a for a in range(3) if a != axis]
        pads = [(0, 0)] * lead + [
            ((h, h + endpad[lat[k]]) if lat[k] in (0, 1)
             else (0, zpad)) for k in range(2)
        ]
        return np.pad(arr, pads)

    bcs = []
    for bc in spec.boundaries:
        new = copy.copy(bc)
        new.coord = bc.coord + (h if bc.axis in (0, 1) else 0)
        if bc.u_field is not None:
            new.u_field = pad_lat(bc.u_field, bc.axis, 1)
        if bc.u_series is not None:
            new.u_series = pad_lat(bc.u_series, bc.axis, 2)
        bcs.append(new)

    return dc.replace(
        spec,
        shape=(
            spec.shape[0] + 2 * h + xpad,
            spec.shape[1] + 2 * h + ypad,
            spec.shape[2] + zpad,
        ),
        mask=mask,
        rho0=rho0,
        u0=u0,
        boundaries=bcs,
    )


__all__ = [
    "make_pallas_step",
    "pack_state",
    "wall_bits",
    "unpack_state",
    "packed_initial_lowmem",
    "pad_spec",
    "live_tile_ids",
    "C",
    "MASK_CH",
]
