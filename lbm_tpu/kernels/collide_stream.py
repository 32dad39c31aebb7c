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
cell-type mask (exact small integers in f32), and 20..23 are padding to
the 8-sublane tile. Mosaic requires DMA slices on the last two (tiled)
memref dims to be tile-aligned; the halo-sliced spatial axes (x, y) are
therefore placed in the untiled leading dims, channels fill the sublane
dim (24 = 3x8, no hidden padding), and z occupies the 128-aligned lane
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
from lbm_tpu.geometry.mask import CellType

_E = D3Q19.E
_OPP = D3Q19.OPP
_W = D3Q19.W

C = 24  # channels: 19 pdfs + mask + 2 z-shifted masks + 2 sublane padding
MASK_CH = 19
MASK_ZP_CH = 20  # mask rolled +1 along z: pull-source mask for e_z = +1
MASK_ZM_CH = 21  # mask rolled -1 along z: pull-source mask for e_z = -1
# Negative result (measured, do not retry): replacing the per-direction
# shifted-mask compare with ONE hoisted per-cell wall-direction BITMASK
# (i32 bitcast, 18 ANDs) dropped 1849 -> 1065 MLUPS at 256^3 — the
# hoisted value stays live across the whole pull loop and spills, same
# failure mode as the 3-pre-rolled-masks experiment (1216).


def pack_state(f, mask):
    """(19, X, Y, Z) f + (X, Y, Z) mask -> packed (X, Y, C, Z).

    Channels 20/21 carry the mask pre-rolled by +/-1 along z, so the
    kernel's 10 e_z != 0 wall tests become plain (sliced) loads instead
    of lane rolls — the rolls ride in the (previously zero-padding)
    channels for free, traffic-wise."""
    m = jnp.asarray(mask, jnp.float32)
    mzp = jnp.roll(m, +1, axis=2)
    mzm = jnp.roll(m, -1, axis=2)
    zeros = jnp.zeros((C - MASK_ZM_CH - 1,) + f.shape[1:], jnp.float32)
    return jnp.concatenate(
        [f, m[None], mzp[None], mzm[None], zeros], axis=0
    ).transpose(1, 2, 0, 3)


def unpack_state(p):
    """Packed (X, Y, C, Z) -> (19, X, Y, Z)."""
    return p.transpose(2, 0, 1, 3)[:19]


def _tile_compute(ft, ot, tau: float, tx: int, ty: int,
                  ti=None, tj=None, bcs_static=(), nee_refs=(),
                  stx: int | None = None, sty: int | None = None):
    """All-VMEM tile update, computed in (stx, sty) SUB-TILES.

    ft: ref (tx+2, ty+2, C, nz) f32 — packed tile with x/y halos.
    ot: ref (tx, ty, C, nz) — output tile, written per channel (a stacked
    value would materialize an extra tile-sized copy; measured +18%).
    ti/tj: dynamic tile coordinates (for in-kernel NEE plane masking).
    bcs_static: static per-BC dicts for axis-0/1 NEE boundaries; nee_refs:
    matching VMEM refs (A, 8, nz) holding the 5 per-direction shifted
    boundary equilibria phi* (0 marks invalid lateral cells).
    returns velsum_partial (scalar).

    Why sub-tiles: the DMA tile wants to be LARGE (halo re-read overhead
    (tx+2)(ty+2)/(tx ty): 1.9x at 4x8 vs 1.27x at 16x16 — pure-copy
    floors 7.18 vs 5.82 ms/step at 256^3), but Mosaic schedules the
    compute best on SMALL value shapes (full kernel 4x8 = 8.3 ms vs
    8x8 = 9.5). Sub-tiling decouples the two: one big DMA, compute
    swept in the small shape that won the sweep. Sub-tile halos are
    interior to the big tile's VMEM, so only slicing changes.
    """
    inv_tau = np.float32(1.0 / tau)
    stx = tx if stx is None else stx
    sty = ty if sty is None else sty
    nz = ft.shape[-1]
    total = jnp.float32(0.0)
    for ox in range(0, tx, stx):
        for oy in range(0, ty, sty):
            total = total + _subtile_compute(
                ft, ot, inv_tau, ox, oy, stx, sty, tx, ty, nz,
                ti, tj, bcs_static,
            )
    return total


def _subtile_compute(ft, ot, inv_tau, ox, oy, stx, sty, tx, ty, nz,
                     ti, tj, bcs_static):
    cx, cy = slice(1 + ox, 1 + ox + stx), slice(1 + oy, 1 + oy + sty)
    m_ctr = ft[cx, cy, MASK_CH, :]
    is_fluid = m_ctr == np.float32(int(CellType.FLUID))

    # Per-direction wall tests: fresh shifted-mask load + compare per
    # direction (hoisting spills — see the negative results above). The
    # e_z != 0 directions read the PRE-ROLLED mask channels (20/21), so
    # only the pdf planes pay a lane roll.
    def pulled(i):
        ex, ey, ez = (int(v) for v in _E[i])
        sx = slice(1 + ox - ex, 1 + ox - ex + stx)
        sy = slice(1 + oy - ey, 1 + oy - ey + sty)
        piece = ft[sx, sy, i, :]
        if ez != 0:
            piece = pltpu.roll(piece, shift=ez % nz, axis=2)
            nbr = ft[sx, sy, MASK_ZP_CH if ez > 0 else MASK_ZM_CH, :]
        else:
            nbr = ft[sx, sy, MASK_CH, :]
        own_opp = ft[cx, cy, _OPP[i], :]
        return jnp.where(
            nbr == np.float32(int(CellType.WALL)), own_opp, piece
        )

    # Pass 1: moments (VPU adds; a 19x3 contraction needs no MXU). Pulled
    # values are kept live in VMEM for the collide pass.
    rho = ft[cx, cy, 0, :]
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
    f0 = vals[0]
    feq0 = rho * np.float32(_W[0]) * common
    ot[oxs, oys, 0, :] = jnp.where(
        is_fluid, f0 - (f0 - feq0) * inv_tau, f0
    )
    rho_tau = rho * inv_tau
    keep = np.float32(1.0) - inv_tau
    for i in range(1, 19):
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
        odd = rho_tau * (w * np.float32(3.0)) * cu
        ot[oxs, oys, i, :] = jnp.where(
            is_fluid, vals[i] * keep + even + odd, ft[cx, cy, i, :]
        )
        ot[oxs, oys, o, :] = jnp.where(
            is_fluid, vals[o] * keep + even - odd, ft[cx, cy, o, :]
        )
    # Mask channels pass through unchanged; the 2 pure-padding channels
    # (22, 23) are never read by anyone — skip their copy.
    for ch in range(MASK_CH, MASK_ZM_CH + 1):
        ot[oxs, oys, ch, :] = ft[cx, cy, ch, :]
    # Fluid speed sum, EXCLUDING rows a _row_fix will overwrite (those
    # rows' post-NEE contribution is added by the row fix itself).
    count = is_fluid
    for bc in bcs_static:
        if bc.axis == 0:
            ids = jax.lax.broadcasted_iota(jnp.int32, (stx, sty, nz), 0) \
                + 1 + ti * tx + ox
        else:
            ids = jax.lax.broadcasted_iota(jnp.int32, (stx, sty, nz), 1) \
                + 1 + tj * ty + oy
        count = count & (ids != bc.c)
    return jnp.sum(jnp.where(count, jnp.sqrt(usq), np.float32(0.0)))


def _row_fix(ft, ot_slot, bc, nee, ti, tj, tau: float, tx: int, ty: int):
    """Recompute ONE consumer-plane row of a tile with the NEE boundary
    applied, and overwrite it in the output tile. Runs only for tiles
    intersecting the plane (under pl.when in the kernel), so the whole
    NEE machinery is O(N^2) per step.

    Exactly reproduces the dense fixup (engine/step.apply_bc_fixup +
    collide) on the row: pulls with wall bounce-back, NEE overwrite on
    bc.dirs, moments, BGK, fluid select.
    """
    inv_tau = np.float32(1.0 / tau)
    axis, c = bc.axis, bc.c
    if axis == 0:
        r = c - 1 - ti * tx
        lat0 = 1 + tj * ty
        lat_len = ty
    else:
        r = c - 1 - tj * ty
        lat0 = 1 + ti * tx
        lat_len = tx

    def read(ch, ox, oy, ez):
        if axis == 0:
            piece = ft[pl.ds(1 + r + ox, 1), 1 + oy : 1 + oy + ty, ch, :]
        else:
            piece = ft[1 + ox : 1 + ox + tx, pl.ds(1 + r + oy, 1), ch, :]
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
    pulls = []
    for i in range(19):
        if i == 0:
            pulls.append(srcs[0])
            continue
        ex, ey, ez = (int(cmp) for cmp in _E[i])
        piece = read(i, -ex, -ey, ez)
        nbr = read(MASK_CH, -ex, -ey, ez)
        v = jnp.where(nbr == wall_f, srcs[_OPP[i]], piece)
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
    ir = np.float32(1.0) / jnp.where(rho == 0.0, np.float32(1.0), rho)
    ux, uy, uz = mx * ir, my * ir, mz * ir
    usq_row = ux * ux + uy * uy + uz * uz
    common = np.float32(1.0) - np.float32(1.5) * usq_row
    m_row = read(MASK_CH, 0, 0, 0)
    is_fluid = m_row == np.float32(int(CellType.FLUID))
    outs = []
    for i in range(19):
        ex, ey, ez = (int(cmp) for cmp in _E[i])
        cu = jnp.zeros_like(ux)
        if ex:
            cu = cu + ux if ex > 0 else cu - ux
        if ey:
            cu = cu + uy if ey > 0 else cu - uy
        if ez:
            cu = cu + uz if ez > 0 else cu - uz
        feq = rho * np.float32(_W[i]) * (
            common + np.float32(3.0) * cu + np.float32(4.5) * cu * cu
        )
        v = pulls[i]
        outs.append(jnp.where(is_fluid, v - (v - feq) * inv_tau, srcs[i]))
    for ch in range(MASK_CH, C):
        outs.append(read(ch, 0, 0, 0))
    row_out = jnp.stack(outs, axis=2)  # (1, ty, C, nz) or (tx, 1, C, nz)
    if axis == 0:
        ot_slot[pl.ds(r, 1), :, :, :] = row_out
    else:
        ot_slot[:, pl.ds(r, 1), :, :] = row_out
    return jnp.sum(
        jnp.where(is_fluid, jnp.sqrt(usq_row), np.float32(0.0))
    )


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
    tau: float, tx: int, ty: int, gx: int, gy: int, bcs_static=(),
    halo_axis=None, stx=None, sty=None,
):
    nbc = len(bcs_static)
    p_hbm = refs[0]
    nee_refs = refs[1 : 1 + nbc]
    rest = refs[1 + nbc :]
    if halo_axis is not None:
        lo_hbm, hi_hbm = rest[0], rest[1]
        (out_hbm, vs_out, ft, ot, acc,
         in_sems, out_sems, halo_sems) = rest[2:]
    else:
        out_hbm, vs_out, ft, ot, acc, in_sems, out_sems = rest
    ntiles = gx * gy

    def in_copy(slot, tid):
        i, j = tid // gy, tid % gy
        return pltpu.make_async_copy(
            p_hbm.at[pl.ds(i * tx, tx + 2), pl.ds(j * ty, ty + 2)],
            ft.at[slot],
            in_sems.at[slot],
        )

    def out_copy(slot, tid):
        i, j = tid // gy, tid % gy
        return pltpu.make_async_copy(
            ot.at[slot],
            out_hbm.at[pl.ds(1 + i * tx, tx), pl.ds(1 + j * ty, ty)],
            out_sems.at[slot],
        )

    acc[0] = jnp.float32(0.0)
    in_copy(0, 0).start()

    def halo_copies(slot, tid):
        """Patch the tile's outer halo row from the exchanged neighbor
        planes (multi-chip decomposition): the shard-local state's halo
        ring along `halo_axis` is stale, so edge tiles overwrite it in
        VMEM from lo/hi after the main tile DMA lands."""
        i, j = tid // gy, tid % gy
        if halo_axis == 0:
            lo = pltpu.make_async_copy(
                lo_hbm.at[:, pl.ds(j * ty, ty + 2)],
                ft.at[slot, 0:1], halo_sems.at[slot],
            )
            hi = pltpu.make_async_copy(
                hi_hbm.at[:, pl.ds(j * ty, ty + 2)],
                ft.at[slot, tx + 1 : tx + 2], halo_sems.at[slot],
            )
            return (i == 0, lo), (i == gx - 1, hi)
        lo = pltpu.make_async_copy(
            lo_hbm.at[pl.ds(i * tx, tx + 2), :],
            ft.at[slot, :, 0:1], halo_sems.at[slot],
        )
        hi = pltpu.make_async_copy(
            hi_hbm.at[pl.ds(i * tx, tx + 2), :],
            ft.at[slot, :, ty + 1 : ty + 2], halo_sems.at[slot],
        )
        return (j == 0, lo), (j == gy - 1, hi)

    def process(tid, slot):
        @pl.when(tid + 1 < ntiles)
        def _():
            in_copy(1 - slot, tid + 1).start()

        in_copy(slot, tid).wait()
        if halo_axis is not None:
            for pred, cp in halo_copies(slot, tid):
                @pl.when(pred)
                def _(cp=cp):
                    cp.start()
                    cp.wait()
        ti, tj = tid // gy, tid % gy

        @pl.when(tid >= 2)
        def _():
            out_copy(slot, tid - 2).wait()

        vs = _tile_compute(
            ft.at[slot], ot.at[slot], tau, tx, ty,
            ti=ti, tj=tj, bcs_static=bcs_static, nee_refs=nee_refs,
            stx=stx, sty=sty,
        )
        acc[0] = acc[0] + vs

        # NEE consumer-plane rows: recompute only on intersecting tiles.
        for bc_, nee_ in zip(bcs_static, nee_refs):
            if bc_.axis == 0:
                r_ = bc_.c - 1 - ti * tx
                pred = (r_ >= 0) & (r_ < tx)
            else:
                r_ = bc_.c - 1 - tj * ty
                pred = (r_ >= 0) & (r_ < ty)

            @pl.when(pred)
            def _(bc_=bc_, nee_=nee_):
                dv = _row_fix(
                    ft.at[slot], ot.at[slot], bc_, nee_, ti, tj, tau, tx, ty
                )
                acc[0] = acc[0] + dv

        out_copy(slot, tid).start()

    npairs = (ntiles + 1) // 2

    def body(p, _):
        tid = 2 * p
        process(tid, 0)

        @pl.when(tid + 1 < ntiles)
        def _():
            process(tid + 1, 1)

        return 0

    jax.lax.fori_loop(0, npairs, body, 0)
    if ntiles >= 2:
        out_copy((ntiles - 2) % 2, ntiles - 2).wait()
    out_copy((ntiles - 1) % 2, ntiles - 1).wait()
    vs_out[0, 0] = acc[0]


def _pick_tiles(nx: int, ny: int, nz: int, budget_mb: float = 40.0,
                prefer_small: bool = False):
    """Choose (tx, ty, stx, sty): DMA tile + compute sub-tile.

    Measured on v5e at 256^3: the DMA tile wants to be LARGE (halo
    re-read overhead; pure-copy floors 7.18 ms at 4x8 vs 5.82 ms at
    16x16) while the compute value shape wants to be SMALL (full kernel
    4x8 = 8.3 ms vs 8x8 = 9.5 — Mosaic schedules small shapes better).
    Sub-tiling decouples them; the sweep winner is 16x8 DMA tiles with
    4x8 compute (2096 MLUPS vs 2016 at plain 4x8; 16x16 DMA regresses
    to 1809 — the gain saturates at 2x the compute shape). Candidates
    in preference order, subject to divisibility and the VMEM budget;
    the sub-tile is fixed at the sweep-winning 4x8."""
    col = C * nz * 4
    cands = ((16, 8), (8, 8), (8, 16), (4, 8), (16, 16), (8, 4),
             (4, 4), (2, 8), (2, 4), (2, 2), (1, 2), (1, 1))
    if prefer_small:
        cands = cands[4:]
    for txc, tyc in cands:
        if nx % txc or ny % tyc:
            continue
        need = (
            2 * ((txc + 2) * (tyc + 2) + txc * tyc) * col
            + 30 * min(txc, 4) * min(tyc, 8) * nz * 4
        )
        if need <= budget_mb * 1e6:
            return txc, tyc, min(txc, 4), min(tyc, 8)
    return 1, 1, 1, 1


@functools.partial(
    jax.jit,
    static_argnames=("tau", "tx", "ty", "bcs_static", "halo_axis",
                     "interpret", "stx", "sty"),
)
def _pallas_bulk(p, *nee_and_halos, tau, tx, ty, bcs_static=(),
                 halo_axis=None, interpret=False, stx=None, sty=None):
    nxp, nyp, c, nz = p.shape
    nx, ny = nxp - 2, nyp - 2
    gx, gy = nx // tx, ny // ty
    kern = functools.partial(
        _kernel, tau=tau, tx=tx, ty=ty, gx=gx, gy=gy,
        bcs_static=bcs_static, halo_axis=halo_axis, stx=stx, sty=sty,
    )
    n_nee = len(nee_and_halos) - (2 if halo_axis is not None else 0)
    scratch = [
        pltpu.VMEM((2, tx + 2, ty + 2, C, nz), jnp.float32),
        pltpu.VMEM((2, tx, ty, C, nz), jnp.float32),
        pltpu.SMEM((1,), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if halo_axis is not None:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    out, vs = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct(p.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_nee
        + [pl.BlockSpec(memory_space=pl.ANY)]
        * (2 if halo_axis is not None else 0),
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # The default 16 MB scoped-vmem cap under-counts reuse of the
            # kernel's stack temporaries; the real high-water mark fits
            # comfortably (v5e has 128 MB of VMEM).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(p, *nee_and_halos)
    return out, vs[0, 0]


# ---------------------------------------------------------------------------
# Consumer-plane fixups on the packed layout
# ---------------------------------------------------------------------------

_SPATIAL_DIM = {0: 0, 1: 1, 2: 3}  # lattice axis -> packed array dim


def _plane_pull_packed(p, nbr_wall_plane, axis: int, c: int):
    """Pulled populations (19, A, B) on plane `c` along `axis` of the
    packed state, with fused wall bounce-back (plane-restricted
    engine/step.streamed). nbr_wall_plane: (19, A, B) per-direction
    wall-neighbor masks for THIS plane (CompiledBC.nbr_wall_plane)."""
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
        out.append(jnp.where(nbr_wall_plane[i], own_opp, nbr_plane))
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
    dynamic-update-slice instead of a full-plane one."""
    v = np.asarray(bc.valid).any(axis=0)  # (A, B) = (x, y)
    xs, ys = np.nonzero(v)
    if xs.size == 0:
        return None
    x0 = max(int(xs.min()) - margin, 0)
    x1 = min(int(xs.max()) + 1 + margin, shape_xy[0])
    y0 = max(int(ys.min()) - margin, 0)
    y1 = min(int(ys.max()) + 1 + margin, shape_xy[1])
    return x0, x1, y0, y1


def _fix_z_plane_windowed(cc, bc, win, p_src, p_out, t):
    """Windowed z-plane NEE fixup: recompute the fused step exactly on
    the consumer plane restricted to the bbox window, then splice it into
    the kernel output (exact because the written interior's pulls never
    reach the window border).

    Returns (p_out', velsum_delta): the kernel's velsum counted these
    plane cells with pre-NEE pulls, so the caller must add
    sum(|u_fixed|) - sum(|u_kernel|) over the spliced fluid cells to keep
    residual_flavor='velsum' honest for z-plane BCs."""
    from lbm_tpu.core.lattice import phi
    from lbm_tpu.engine.step import apply_bc_fixup

    x0, x1, y0, y1 = win
    c = bc.consumer_coord
    sub = p_src[x0:x1, y0:y1, :, c - 1 : c + 2]  # (wx, wy, C, 3)
    nbr_w = bc.nbr_wall_plane[:, x0:x1, y0:y1]
    pulled = _plane_pull_packed(sub, nbr_w, 2, 1)  # (19, wx, wy)
    fluid_pl = cc.fluid[x0:x1, y0:y1, c]

    def speed_sum(pl):
        """sum of |u| over the spliced fluid cells (window interior)."""
        rho_ = jnp.sum(pl, axis=0)
        ef_ = jnp.asarray(_E.T.astype(np.float32))
        mom_ = jnp.tensordot(ef_, pl, axes=([1], [0]),
                             precision=jax.lax.Precision.HIGHEST)
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
    )
    src_plane = sub[:, :, :19, 1].transpose(2, 0, 1)  # (19, wx, wy)
    pulled_slab = jnp.expand_dims(pulled, 3)
    src_slab = jnp.expand_dims(src_plane, 3)
    pulled = jnp.squeeze(apply_bc_fixup(pulled_slab, src_slab, bc0, t), 3)

    rho = jnp.sum(pulled, axis=0)
    ef = jnp.asarray(_E.T.astype(np.float32))
    mom = jnp.tensordot(ef, pulled, axes=([1], [0]),
                        precision=jax.lax.Precision.HIGHEST)
    u = mom / jnp.where(rho == 0, 1.0, rho)[None]
    feq = rho[None] * phi(u)
    post = pulled - (pulled - feq) / cc.tau
    vs_after = speed_sum(pulled)
    newplane = jnp.where(fluid_pl[None], post, src_plane)
    aux = sub[:, :, 19:, 1].transpose(2, 0, 1)
    full = jnp.concatenate([newplane, aux], axis=0).transpose(1, 2, 0)
    # Write the window interior only (border ring may be wrap-corrupted).
    return p_out.at[x0 + 1 : x1 - 1, y0 + 1 : y1 - 1, :, c].set(
        full[1:-1, 1:-1]
    ), vs_after - vs_before


def make_pallas_step(
    cc_pad, tx: int | None = None, ty: int | None = None,
    interpret: bool = False,
    stx: int | None = None, sty: int | None = None,
) -> Callable:
    """Build the Pallas-backed fused step over PACKED PADDED state.

    cc_pad: CompiledCase built from pad_spec(spec, lane_multiple=...); all
    coordinates padded. Returns step(p, t) -> (p', velsum_fluid) where p
    is the packed (X+2, Y+2, C, Z) state (see pack_state).

    NEE boundaries on x/y planes run INSIDE the kernel (plane-row masks +
    VMEM phi* tables); z-plane boundaries (coronary sub-outlets) fall back
    to the XLA consumer-plane fixup.
    """
    nxp, nyp, nz = cc_pad.shape
    nx, ny = nxp - 2, nyp - 2
    auto = _pick_tiles(nx, ny, nz)
    if interpret and tx is None and ty is None:
        # big DMA tiles only pay off on hardware; small tiles keep the
        # interpreter's unrolled sub-tile loop (and tracing time) short
        auto = _pick_tiles(nx, ny, nz, prefer_small=True)
    tx = tx if tx is not None else auto[0]
    ty = ty if ty is not None else auto[1]
    stx = stx if stx is not None else auto[2]
    sty = sty if sty is not None else auto[3]
    stx = min(stx, tx)
    sty = min(sty, ty)
    tau = float(cc_pad.tau)

    kernel_bcs = [bc for bc in cc_pad.bcs if bc.axis in (0, 1)]
    fixup_bcs = [bc for bc in cc_pad.bcs if bc.axis == 2]
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

    wins = [
        _valid_bbox(bc, (nxp, nyp)) for bc in fixup_bcs
    ]

    def step(p, t):
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
        p_bulk, vs = _pallas_bulk(
            p, *nee, tau=tau, tx=tx, ty=ty, bcs_static=bcs_static,
            interpret=interpret, stx=stx, sty=sty,
        )
        for bc, win in zip(fixup_bcs, wins):
            if win is None:
                continue
            p_bulk, dvs = _fix_z_plane_windowed(cc_pad, bc, win, p, p_bulk, t)
            vs = vs + dvs
        return p_bulk, vs

    return step


def pad_spec(spec, lane_multiple: int = 1, plane_multiples=(1, 1)):
    """A copy of a CaseSpec with the lattice halo-padded in x and y (mask
    gets DEAD rings, init fields zero/one rings, BC coords shift by +1,
    lateral plane fields pad accordingly). If `lane_multiple` > 1, the z
    extent pads AT THE END with dead cells up to that multiple — Mosaic
    requires the lane dimension be 128-aligned. `plane_multiples` rounds
    the x/y interiors up the same way so awkward extents (e.g. the
    bifurcation's prime ny=83) still get efficient kernel tiles. Every
    case keeps its borders non-fluid, so trailing dead layers are inert
    (same argument as the halo rings)."""
    import copy
    import dataclasses as dc

    xpad = (-spec.shape[0]) % plane_multiples[0]
    ypad = (-spec.shape[1]) % plane_multiples[1]
    zpad = (-spec.shape[2]) % lane_multiple
    spatial = ((1, 1 + xpad), (1, 1 + ypad), (0, zpad))
    mask = np.pad(np.asarray(spec.mask), spatial)
    rho0 = np.pad(np.asarray(spec.rho0), spatial, constant_values=1.0)
    u0 = np.pad(np.asarray(spec.u0), ((0, 0),) + spatial)
    endpad = {0: xpad, 1: ypad, 2: zpad}

    def pad_lat(arr, axis, lead):
        lat = [a for a in range(3) if a != axis]
        pads = [(0, 0)] * lead + [
            ((1, 1 + endpad[lat[k]]) if lat[k] in (0, 1)
             else (0, zpad)) for k in range(2)
        ]
        return np.pad(arr, pads)

    bcs = []
    for bc in spec.boundaries:
        new = copy.copy(bc)
        new.coord = bc.coord + (1 if bc.axis in (0, 1) else 0)
        if bc.u_field is not None:
            new.u_field = pad_lat(bc.u_field, bc.axis, 1)
        if bc.u_series is not None:
            new.u_series = pad_lat(bc.u_series, bc.axis, 2)
        bcs.append(new)

    return dc.replace(
        spec,
        shape=(
            spec.shape[0] + 2 + xpad,
            spec.shape[1] + 2 + ypad,
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
    "unpack_state",
    "pad_spec",
    "C",
    "MASK_CH",
]
