"""Pallas D3Q7 kernel for passive scalar transport — the frozen-field
advection-diffusion hot loop (engine/scalar.ScalarTransport) at flow-
kernel pace.

The dense-XLA scalar step measures 3.8 ms/step at 96x96x120 on a v5e —
~30x off the HBM floor, because XLA materializes every rolled pull and
select on a 7-channel state whose whole per-cell bill is one FMA per
channel. At the flagship coronary box (291x291x372, coronary.cu:19) a
12k-step washout would cost ~20 min dense; this kernel reuses the flow
kernel's measured design (packed channel-last-but-one layout, manual
double-buffered DMA pipeline `_drive`, (1, 8, nz) compute sub-tiles,
block-sparse live-tile walk with an input-aliased output) to bring the
transport scan to flow-kernel speed. The reference has no transport
stage at all — its output stops at velocity/pressure
(coronary_cfd/coronary.cu:948-1011); see engine/scalar.py for why the
washout/residence-time questions matter downstream.

Layout — two packed (X+2, Y+2, 8, Z) f32 arrays (8 is the minimal
Mosaic-aligned channel width >= 7, exactly like the flow state's C=24
argument, collide_stream.py:61-69):

  G-pack  (dynamic): channels 0-6 the D3Q7 pdfs, 7 zero padding.
  AUX-pack (static): 0-2 the PROJECTED frozen velocity u (blocked-axis
    components zeroed, engine/scalar._project), 3 the div_fix
    compensation field (zeros when off), 4 the blocking indicator
    b = (mask in {WALL, MOVING}), 5/6 b pre-rolled by +/-1 along z
    (pull-source tests for the two e_z directions — the same
    pre-rolled-mask trick the flow kernel measured to beat in-kernel
    lane rolls, collide_stream.py:70-72), 7 the fluid indicator.

phi is NOT stored: the D3Q7 linear equilibrium factor is affine in u
(phi_i = w_i (1 + 4 e_i.u) = 0.125 * (1 +/- 4 u_axis) for the six
moving directions, 0.25 for rest), so the kernel rebuilds it from the
three u channels with one FMA each — cheaper than streaming six more
HBM channels per step. Per-tile DMA is therefore 16 channels in + 8
out, exactly half the flow kernel's 24 + 24.

Boundary planes run OUTSIDE the kernel as consumer-plane slab fixups —
the same architecture the flow path uses for z-plane NEE boundaries
(collide_stream._fix_z_plane_windowed): the bulk kernel computes every
cell with pure stream+bounce-back, then each BC's consumer plane is
recomputed exactly by running the DENSE scalar pass
(engine/scalar._transport_pass — one code path, correctness by
construction) on a static 3-plane slab window around the plane and
splicing the interior back. In D3Q7 exactly one direction crosses a
plane, and every case's BC planes have bbox-small footprints, so the
fixup is O(window) work per BC per step. The slab recompute also
yields the plane's post-stream concentration for free, which is how
`run(record=...)` samples the washout curves without ever lane-slicing
the full state.

Equivalence contract: `ScalarTransportPallas` matches
`engine/scalar.ScalarTransport` field-for-field (same projection, same
div_fix defect, same BC fixup expressions — tests/test_scalar_pallas.py
asserts multi-step whole-box agreement on every case family).

Measured on the real v5e (tools/bench_scalar.py; completion forced by
fetching a SCALAR only — fetching the state adds ~6.7 ms/step of pure
axon host-transfer at 96^3 and produced an early bogus 16.2 ms/step
reading): 96x96x120 radius-7 coronary pallas 0.284 vs dense 0.384
ms/step; flagship 291x291x372 radius-10 pallas 2.22 ms/step (292 live
tiles, in-place + tile-skip; BC fixups cost 0.18, kernel floor 2.05) —
the shape where the dense pass previously could not even compile: its
step closed over the (7,X,Y,Z) phi (~882 MB) as an HLO constant and
the remote compile service rejected the request (HTTP 413), which is
why every big static field now threads through run()'s jit as an
ARGUMENT (see ScalarTransport.fields / make_step / self.aux).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.core.lattice import D3Q19
from lbm_tpu.engine.scalar import (_E7, _OPP7, _Q7, _W7, _defect,
                                   _project, _transport_pass,
                                   bc_geometry, phi7, tau_g_of)

_E19 = D3Q19.E
from lbm_tpu.engine.step import _plane_slicer
from lbm_tpu.geometry.mask import CellType
from lbm_tpu.kernels.collide_stream import (_STACK_FACTOR, _VMEM_LIMIT,
                                            _drive, _extract_seam,
                                            _extract_z_slab,
                                            _splice_z_plane_inplace,
                                            live_tile_ids, pad_spec)

C7 = 8          # packed channel width (minimal aligned >= 7)
AUX_UX, AUX_UY, AUX_UZ = 0, 1, 2
AUX_COMP = 3    # div_fix compensation (zeros when div_fix=False)
AUX_B = 4       # blocking indicator (WALL | MOVING)
AUX_BZP = 5     # blocking rolled +1 along z (pull source for e_z=+1)
AUX_BZM = 6     # blocking rolled -1 along z (pull source for e_z=-1)
AUX_FLUID = 7

# STAT-pack channel map for the COUPLED kernel (_subtile7f): the
# velocity is no longer frozen, so its three AUX channels are replaced
# by the static per-axis impermeability masks (blocked_axes — the
# _project test, which the frozen route resolved on the host) and u is
# rebuilt in-kernel from the live flow tile's moments each step.
ST_BX, ST_BY, ST_BZ = 0, 1, 2   # blocked-axis masks (wall along +-a)
ST_B = 3                        # blocking indicator (WALL | MOVING)
ST_BZP = 4                      # blocking rolled +1 along z
ST_BZM = 5                      # blocking rolled -1 along z
ST_FLUID = 6
# channel 7 spare


def pack_g(g):
    """(7, X, Y, Z) dense g -> packed (X, Y, 8, Z) f32 (channel 7
    zero)."""
    z = jnp.zeros((C7 - _Q7,) + g.shape[1:], jnp.float32)
    return jnp.concatenate([jnp.asarray(g, jnp.float32), z],
                           axis=0).transpose(1, 2, 0, 3)


def unpack_g(p):
    """Packed (X, Y, 8, Z) -> dense (7, X, Y, Z) f32."""
    return p.transpose(2, 0, 1, 3)[:_Q7]


def pack_aux(u_proj, comp, blocking, fluid):
    """Static AUX-pack from host arrays (see module docstring)."""
    b = np.asarray(blocking, np.float32)
    ch = [np.asarray(u_proj[a], np.float32) for a in range(3)]
    ch.append(np.asarray(comp, np.float32))
    ch.append(b)
    ch.append(np.roll(b, +1, axis=2))
    ch.append(np.roll(b, -1, axis=2))
    ch.append(np.asarray(fluid, np.float32))
    return jnp.asarray(np.stack(ch, axis=2))  # (X, Y, 8, Z)


def _subtile7(ft, at, ot, ox, oy, stx, sty, nz, tau_g, source):
    """One (stx, sty, nz) compute sub-tile of the D3Q7 update.

    ft: (tx+2, ty+2, 8, nz) g tile with x/y halos; at: matching AUX
    tile; ot: (tx, ty, 8, nz) output. Mirrors the dense pass
    (engine/scalar._transport_pass) op-for-op: pull with wall
    bounce-back, c = sum, g' = pulled - (pulled - c*phi)/tau_g
    (+ div_fix + source), fluid select."""
    cx = slice(1 + ox, 1 + ox + stx)
    cy = slice(1 + oy, 1 + oy + sty)
    one = np.float32(1.0)

    vals = [ft[cx, cy, 0, :]]
    c = vals[0]
    for i in range(1, _Q7):
        ex, ey, ez = (int(v) for v in _E7[i])
        sx = slice(1 + ox - ex, 1 + ox - ex + stx)
        sy = slice(1 + oy - ey, 1 + oy - ey + sty)
        piece = ft[sx, sy, i, :]
        if ez != 0:
            piece = pltpu.roll(piece, shift=ez % nz, axis=2)
            bsrc = at[cx, cy, AUX_BZP if ez > 0 else AUX_BZM, :]
        else:
            bsrc = at[sx, sy, AUX_B, :]
        v = jnp.where(bsrc == one, ft[cx, cy, int(_OPP7[i]), :], piece)
        vals.append(v)
        c = c + v

    fluid = at[cx, cy, AUX_FLUID, :] == one
    comp = at[cx, cy, AUX_COMP, :]
    c_comp = c * comp
    inv_tau = np.float32(1.0 / tau_g)
    oxs, oys = slice(ox, ox + stx), slice(oy, oy + sty)
    for i in range(_Q7):
        if i == 0:
            phi = jnp.full_like(c, np.float32(_W7[0]))
        else:
            a = int(np.argmax(np.abs(_E7[i])))
            s = np.float32(4.0 * int(_E7[i][a]))
            # same rounding as the dense phi7(): w * (1 + 4 e.u), the
            # 0.125 scale exact
            phi = np.float32(_W7[i]) * (one + s * at[cx, cy, a, :])
        post = vals[i] - (vals[i] - c * phi) * inv_tau
        post = post + c_comp * np.float32(_W7[i])
        if source:
            post = post + np.float32(source * _W7[i])
        ot[oxs, oys, i, :] = jnp.where(fluid, post,
                                       ft[cx, cy, i, :])
    ot[oxs, oys, _Q7, :] = jnp.zeros_like(c)


def _tile7(ft, at, ot, tx, ty, stx, sty, tau_g, source):
    if ty % sty:
        sty = max(d for d in range(1, sty + 1) if ty % d == 0)
    nz = ft.shape[-1]
    for ox in range(0, tx, stx):
        for oy in range(0, ty, sty):
            _subtile7(ft, at, ot, ox, oy, min(stx, tx - ox),
                      min(sty, ty - oy), nz, tau_g, source)


def pack_stat(mask):
    """Static STAT pack (X, Y, 8, Z) for the coupled kernel: per-axis
    impermeability masks + blocking indicators + fluid (see ST_*)."""
    m = np.asarray(mask)
    blocking = ((m == CellType.WALL)
                | (m == CellType.MOVING)).astype(np.float32)
    nbr = [np.roll(blocking != 0, shift=tuple(int(v) for v in _E7[i]),
                   axis=(0, 1, 2)) for i in range(1, _Q7)]
    ch = [(nbr[2 * a] | nbr[2 * a + 1]).astype(np.float32)
          for a in range(3)]                        # blocked_axes
    ch.append(blocking)
    ch.append(np.roll(blocking, +1, axis=2))
    ch.append(np.roll(blocking, -1, axis=2))
    ch.append((m == CellType.FLUID).astype(np.float32))
    ch.append(np.zeros_like(blocking))
    return jnp.asarray(np.stack(ch, axis=2))        # (X, Y, 8, Z)


def _subtile7f(ft, st, pt, ot, ox, oy, stx, sty, nz, tau_g, source,
               force=None):
    """Coupled-transport sub-tile: like _subtile7, but u is rebuilt
    IN-KERNEL from the live packed flow tile's moments instead of the
    frozen AUX channels — the kernel-pace version of CoupledTransport's
    per-step phi7 rebuild (engine/scalar.py:507-524).

    pt: (tx, ty, C_flow, nz) INTERIOR flow tile (the flow kernel's
    output p' of this step; u at a cell needs no halo). The velocity is
    recovered from the POST-collision moments: every conservative
    collision relaxing the momentum mode at rate s with the matching
    Guo (1 - s/2) source prefactor lands at m' = m + F exactly, so
    u = (m' - F/2) / rho reproduces the in-step Guo velocity
    (m + F/2)/rho for BGK/TRT/MRT/closures alike; with force=None
    u = m'/rho. The impermeability projection (engine/scalar._project)
    applies the static per-axis blocked masks (ST_BX..ST_BZ).

    force: None, or the static Boussinesq triple (buoy(3,), c_ref,
    base(3,)|None) — F is rebuilt per cell from the PRE-update scalar
    c_prev = sum_i g_i, exactly engine/thermal.BuoyantTransport's
    ordering (flow advanced with the previous step's temperature)."""
    cx = slice(1 + ox, 1 + ox + stx)
    cy = slice(1 + oy, 1 + oy + sty)
    oxs, oys = slice(ox, ox + stx), slice(oy, oy + sty)
    one = np.float32(1.0)

    rho = pt[oxs, oys, 0, :].astype(jnp.float32)
    mx = jnp.zeros_like(rho)
    my = jnp.zeros_like(rho)
    mz = jnp.zeros_like(rho)
    for i in range(1, 19):
        v = pt[oxs, oys, i, :].astype(jnp.float32)
        rho = rho + v
        ex, ey, ez = (int(c_) for c_ in _E19[i])
        if ex:
            mx = mx + v if ex > 0 else mx - v
        if ey:
            my = my + v if ey > 0 else my - v
        if ez:
            mz = mz + v if ez > 0 else mz - v
    fluid = st[cx, cy, ST_FLUID, :] == one
    fF = (None, None, None)
    if force is not None:
        buoy, c_ref, base = force
        c_prev = ft[cx, cy, 0, :]
        for i in range(1, _Q7):
            c_prev = c_prev + ft[cx, cy, i, :]
        dc = jnp.where(fluid, c_prev - np.float32(c_ref),
                       np.float32(0.0))
        fF = tuple(
            (np.float32(b) * dc + np.float32(base[a]) if base is not None
             else np.float32(b) * dc) if b or base is not None else None
            for a, b in enumerate(buoy))
    inv_rho = one / jnp.where(rho == 0.0, one, rho)
    ux = (mx if fF[0] is None else mx - np.float32(0.5) * fF[0]) * inv_rho
    uy = (my if fF[1] is None else my - np.float32(0.5) * fF[1]) * inv_rho
    uz = (mz if fF[2] is None else mz - np.float32(0.5) * fF[2]) * inv_rho
    ux = jnp.where(st[cx, cy, ST_BX, :] == one, np.float32(0.0), ux)
    uy = jnp.where(st[cx, cy, ST_BY, :] == one, np.float32(0.0), uy)
    uz = jnp.where(st[cx, cy, ST_BZ, :] == one, np.float32(0.0), uz)
    u3 = (ux, uy, uz)

    vals = [ft[cx, cy, 0, :]]
    c = vals[0]
    for i in range(1, _Q7):
        ex, ey, ez = (int(v_) for v_ in _E7[i])
        sx = slice(1 + ox - ex, 1 + ox - ex + stx)
        sy = slice(1 + oy - ey, 1 + oy - ey + sty)
        piece = ft[sx, sy, i, :]
        if ez != 0:
            piece = pltpu.roll(piece, shift=ez % nz, axis=2)
            bsrc = st[cx, cy, ST_BZP if ez > 0 else ST_BZM, :]
        else:
            bsrc = st[sx, sy, ST_B, :]
        v = jnp.where(bsrc == one, ft[cx, cy, int(_OPP7[i]), :], piece)
        vals.append(v)
        c = c + v

    inv_tau = np.float32(1.0 / tau_g)
    for i in range(_Q7):
        if i == 0:
            phi = jnp.full_like(c, np.float32(_W7[0]))
        else:
            a = int(np.argmax(np.abs(_E7[i])))
            s = np.float32(4.0 * int(_E7[i][a]))
            phi = np.float32(_W7[i]) * (one + s * u3[a])
        post = vals[i] - (vals[i] - c * phi) * inv_tau
        if source:
            post = post + np.float32(source * _W7[i])
        ot[oxs, oys, i, :] = jnp.where(fluid, post, ft[cx, cy, i, :])
    ot[oxs, oys, _Q7, :] = jnp.zeros_like(c)


def _tile7f(ft, st, pt, ot, tx, ty, stx, sty, tau_g, source, force):
    if ty % sty:
        sty = max(d for d in range(1, sty + 1) if ty % d == 0)
    nz = ft.shape[-1]
    for ox in range(0, tx, stx):
        for oy in range(0, ty, sty):
            _subtile7f(ft, st, pt, ot, ox, oy, min(stx, tx - ox),
                       min(sty, ty - oy), nz, tau_g, source,
                       force=force)


class _Pair:
    """start()/wait() over the two per-tile input DMAs (g + aux)."""

    def __init__(self, *cps):
        self.cps = cps

    def start(self):
        for cp in self.cps:
            cp.start()

    def wait(self):
        for cp in self.cps:
            cp.wait()


def _kernel7(*refs, tau_g, source, tx, ty, gx, gy, ring, stx, sty,
             ntiles, skip, in_place, has_seam, has_flow=False,
             force=None):
    """D3Q7 bulk kernel over packed tiles, driven by the flow kernel's
    double-buffered pipeline (collide_stream._drive — identical DMA
    ordering rules, incl. the in-place seam hazard; see _kernel's
    docstring there). refs: g_hbm, a_hbm, [p_hbm], [tids], [seam],
    out_hbm, gt, at_, [pt_], ot, g_sems, a_sems, [p_sems], out_sems,
    [seam_sems]. has_flow: a_hbm is the STAT pack and p_hbm carries the
    live packed flow state — u is rebuilt in-kernel (_subtile7f); the
    flow tile is INTERIOR-only (no halo), so its DMA is (tx, ty)."""
    g_hbm, a_hbm = refs[0], refs[1]
    rest = refs[2:]
    p_hbm = None
    if has_flow:
        p_hbm, rest = rest[0], rest[1:]
    tids_ref = None
    if skip:
        tids_ref, rest = rest[0], rest[1:]
    seam_ref = None
    if has_seam:
        seam_ref, rest = rest[0], rest[1:]
    out_hbm, gt, at_ = rest[:3]
    rest = rest[3:]
    pt_ = None
    if has_flow:
        pt_, rest = rest[0], rest[1:]
    ot = rest[0]
    g_sems, a_sems = rest[1], rest[2]
    rest = rest[3:]
    p_sems = None
    if has_flow:
        p_sems, rest = rest[0], rest[1:]
    out_sems = rest[0]
    seam_sems = rest[1] if has_seam else None
    if ntiles is None:
        ntiles = gx * gy

    def get(p):
        return tids_ref[p] if skip else p

    def in_copy(slot, tid):
        i, j = tid // gy, tid % gy
        lat = pl.ds(j * ty + ring - 1, ty + 2)
        aux = pltpu.make_async_copy(
            a_hbm.at[pl.ds(i * tx + ring - 1, tx + 2), lat],
            at_.at[slot], a_sems.at[slot])
        cps = [aux]
        if has_flow:
            cps.append(pltpu.make_async_copy(
                p_hbm.at[pl.ds(i * tx + ring, tx),
                         pl.ds(j * ty + ring, ty)],
                pt_.at[slot], p_sems.at[slot]))
        if not has_seam:
            main = pltpu.make_async_copy(
                g_hbm.at[pl.ds(i * tx + ring - 1, tx + 2), lat],
                gt.at[slot], g_sems.at[slot])
            return _Pair(main, *cps)
        # in-place aliased output with a multi-row tile grid: the north
        # skirt row was already overwritten by tile tid-gy's output DMA
        # — source it from the pre-extracted pre-step seam buffer
        # (same hazard + fix as the flow kernel, collide_stream._kernel)
        main = pltpu.make_async_copy(
            g_hbm.at[pl.ds(i * tx + ring, tx + 1), lat],
            gt.at[slot, 1: tx + 2], g_sems.at[slot])
        north = pltpu.make_async_copy(
            seam_ref.at[pl.ds(i, 1), lat],
            gt.at[slot, 0:1], seam_sems.at[slot])
        return _Pair(main, north, *cps)

    def out_copy(slot, tid):
        i, j = tid // gy, tid % gy
        return pltpu.make_async_copy(
            ot.at[slot],
            out_hbm.at[pl.ds(ring + i * tx, tx),
                       pl.ds(ring + j * ty, ty)],
            out_sems.at[slot])

    def work(p, tid, slot):
        if has_flow:
            _tile7f(gt.at[slot], at_.at[slot], pt_.at[slot],
                    ot.at[slot], tx, ty, stx, sty, tau_g, source,
                    force)
        else:
            _tile7(gt.at[slot], at_.at[slot], ot.at[slot], tx, ty,
                   stx, sty, tau_g, source)

    _drive(ntiles, get, in_copy, out_copy, work, in_place=in_place)


def _pick_tiles7(nx, ny, nz, prefer_small=False, skip=0,
                 flow_c: int = 0):
    """DMA tile + compute sub-tile for the 8-channel scalar state. Same
    shape preferences the flow kernel measured (large DMA tile, narrow
    (1, 8, nz) compute value), with the VMEM budget scaled to the
    3 packed-tile buffers at C=8 (vs the flow's 2 at C=24). flow_c:
    extra per-tile channel columns of the coupled kernel's interior
    flow-tile buffer (C_flow=24, double-buffered)."""
    if prefer_small:
        return nx, ny, nx, ny
    budget = _VMEM_LIMIT / _STACK_FACTOR
    col = C7 * nz * 4
    cands = ((32, 16), (16, 16), (16, 8), (8, 16), (8, 8), (4, 8),
             (8, 4), (4, 4), (2, 8), (2, 4), (2, 2), (1, 2), (1, 1))
    for txc, tyc in cands:
        if nx % txc or ny % tyc:
            continue
        need = (2 * (2 * (txc + 2) * (tyc + 2) + txc * tyc) * col
                + 2 * txc * tyc * flow_c * nz * 4)
        if need <= budget:
            if skip > 0:
                skip -= 1
                continue
            return txc, tyc, 1, min(tyc, 8)
    return 1, 1, 1, 1


@functools.partial(
    jax.jit,
    static_argnames=("tau_g", "source", "tx", "ty", "stx", "sty",
                     "ring", "n_live", "in_place", "has_seam",
                     "has_flow", "force", "interpret"),
)
def _scalar_bulk(gp, ap, *extra, tau_g, source, tx, ty, stx, sty,
                 ring=1, n_live=None, in_place=None, has_seam=False,
                 has_flow=False, force=None, interpret=False):
    """extra = [flow p][, tile id list][, seam]. Same aliasing rules as
    the flow bulk (collide_stream._pallas_bulk): a sparse tile list
    forces the in-place aliased output (skipped tiles must keep their
    contents), and in-place with a multi-row multi-column grid needs
    the pre-step seam buffer. has_flow/force: coupled-transport mode
    (see _kernel7 / _subtile7f) — ap is then the STAT pack."""
    nxp, nyp, _, nz = gp.shape
    nx, ny = nxp - 2 * ring, nyp - 2 * ring
    gx, gy = nx // tx, ny // ty
    skip = n_live is not None
    sparse = skip and n_live < gx * gy
    if in_place is None:
        in_place = sparse
    if sparse and not in_place:
        raise ValueError("tile skip requires the in-place aliased "
                         "output")
    if in_place and gx > 1 and gy > 1 and not has_seam:
        raise ValueError("in_place with a multi-row multi-column tile "
                         "grid needs the pre-step seam buffer")
    kern = functools.partial(
        _kernel7, tau_g=tau_g, source=source, tx=tx, ty=ty, gx=gx,
        gy=gy, ring=ring, stx=stx, sty=sty, ntiles=n_live, skip=skip,
        in_place=in_place, has_seam=has_seam, has_flow=has_flow,
        force=force)
    scratch = [
        pltpu.VMEM((2, tx + 2, ty + 2, C7, nz), jnp.float32),
        pltpu.VMEM((2, tx + 2, ty + 2, C7, nz), jnp.float32),
    ]
    if has_flow:
        cflow = int(extra[0].shape[2])
        scratch.append(pltpu.VMEM((2, tx, ty, cflow, nz),
                                  extra[0].dtype))
    scratch += [
        pltpu.VMEM((2, tx, ty, C7, nz), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if has_flow:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if has_seam:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    (out,) = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct(gp.shape, jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * (1 if has_flow else 0)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * (1 if skip else 0)
        + [pl.BlockSpec(memory_space=pl.ANY)] * (1 if has_seam else 0),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=scratch,
        input_output_aliases={0: 0} if in_place else {},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(gp, ap, *extra)
    return out


class ScalarTransportPallas:
    """Drop-in Pallas-backed twin of engine/scalar.ScalarTransport
    (frozen-field D3Q7 on a converged flow) — same constructor
    semantics, same run()/concentration()/total() API, multi-step
    field-for-field agreement asserted by tests/test_scalar_pallas.py.

    spec/u arrive UNPADDED (any backend's converged macro); the class
    pads like the flow runner (pad_spec) and crops on output. Same
    kernel constraint as the flow path: periodic along z only, cases
    keep x/y boundary layers non-fluid.

    tile_skip='auto' walks the block-sparse live-tile list when the
    live fraction is below the flow kernel's measured 60% crossover —
    on the 1.3%-occupancy coronary tree most tiles never move.
    """

    def __init__(self, spec, u, D: Optional[float] = None,
                 tau_g: Optional[float] = None,
                 inlet_c: Optional[dict] = None, source: float = 0.0,
                 c0=None, div_fix: bool = True, interpret: bool = False,
                 tx: Optional[int] = None, ty: Optional[int] = None,
                 stx: Optional[int] = None, sty: Optional[int] = None,
                 tile_skip="auto", live_u: bool = False, mesh=None,
                 shard_axis: Optional[int] = None):
        assert (D is None) != (tau_g is None), (
            "give exactly one of D (lattice diffusivity) or tau_g")
        self.tau_g = float(tau_g_of(D) if D is not None else tau_g)
        assert self.tau_g > 0.5, "tau_g must exceed 1/2 (D > 0)"
        self.spec = spec
        sp = pad_spec(spec, lane_multiple=1 if interpret else 128,
                      plane_multiples=(1, 1) if interpret else (4, 8))
        self.spec_pad = sp
        self.interpret = bool(interpret)
        X, Y, Z = (int(s) for s in spec.shape)
        Xp, Yp, Zp = (int(s) for s in sp.shape)
        self._crop = (slice(1, 1 + X), slice(1, 1 + Y), slice(0, Z))

        mask = np.asarray(sp.mask)
        blocking = ((mask == CellType.WALL)
                    | (mask == CellType.MOVING)).astype(np.float32)
        fluid = (mask == CellType.FLUID)
        self.fluid_pad = jnp.asarray(fluid)
        nbr = [np.roll(blocking != 0,
                       shift=tuple(int(v) for v in _E7[i]),
                       axis=(0, 1, 2)) for i in range(1, _Q7)]
        nbr_block = np.stack(nbr)                       # (6, Xp, Yp, Zp)
        blocked_axes = np.stack(
            [nbr[2 * a] | nbr[2 * a + 1] for a in range(3)])

        up = np.zeros((3, Xp, Yp, Zp), np.float32)
        u = np.asarray(u, np.float32)
        assert u.shape == (3, X, Y, Z), u.shape
        up[:, 1:1 + X, 1:1 + Y, :Z] = u
        if live_u:
            # coupled route (CoupledTransportPallas): u is rebuilt from
            # the live flow each step, so the frozen projection is only
            # needed for the c0 init and slab statics — do it on the
            # HOST (a full-box device _project round-trip over the axon
            # tunnel moves ~400 MB at the flagship shape for nothing)
            up = np.where(blocked_axes, np.float32(0.0), up)
        else:
            up = np.asarray(_project(jnp.asarray(up),
                                     jnp.asarray(blocked_axes)))
        self.omega = np.float32(1.0 - 1.0 / self.tau_g)
        self.source = float(source)

        inlet_c = dict(inlet_c or {})
        self._bc_geo = bc_geometry(sp)
        bcs_cfn = [inlet_c.pop(k, None)
                   for k in range(len(sp.boundaries))]
        assert not inlet_c, f"inlet_c names absent boundaries: {inlet_c}"

        comp = np.zeros((Xp, Yp, Zp), np.float32)
        if div_fix:
            defect = np.asarray(_defect(jnp.asarray(up),
                                        jnp.asarray(nbr_block),
                                        self._bc_geo))
            comp = np.where(fluid, -defect, 0.0).astype(np.float32)

        # the coupled route never reads the frozen AUX pack — skip its
        # ~1 GB host->device transfer at the flagship shape
        self.aux = None if live_u else pack_aux(up, comp, blocking,
                                                fluid)
        if c0 is None:
            self.g = jnp.zeros((Xp, Yp, C7, Zp), jnp.float32)
        else:
            c0p = np.zeros((Xp, Yp, Zp), np.float32)
            c0p[1:1 + X, 1:1 + Y, :Z] = np.asarray(c0, np.float32)
            if live_u:  # host phi7 (same formula; avoid a full-box
                # device round-trip at flagship shapes)
                e = _E7.astype(np.float32)
                ph = np.stack([
                    _W7[i] * (np.float32(1.0)
                              + np.float32(4.0)
                              * (e[i, 0] * up[0] + e[i, 1] * up[1]
                                 + e[i, 2] * up[2]))
                    for i in range(_Q7)])
            else:
                ph = np.asarray(phi7(jnp.asarray(up)))
            g0 = np.where(fluid[None], c0p[None] * ph, 0.0)
            self.g = pack_g(jnp.asarray(g0))

        # ---- BC consumer-plane slab fixups (static per BC) ----------
        # Window the lateral bbox of each plane's valid footprint
        # (margin 2 so the written interior's lateral pulls stay inside
        # the slab); keep z FULL for axis-0/1 planes (a z window would
        # be a lane slice). The slab recompute calls the DENSE pass on
        # (7, *, *, 3) arrays with this plane's (and any same-plane
        # overlapping) fixups re-sliced into slab coordinates.
        self._fix = []
        for k, bc in enumerate(sp.boundaries):
            d, axis, sgn, sl, plane = self._bc_geo[k]
            cc = bc.coord + bc.normal
            assert 1 <= cc < sp.shape[axis] - 1, (
                "consumer plane must be interior along its axis")
            v = np.asarray(plane)
            xs, ys = np.nonzero(v)
            assert xs.size, f"boundary {k} has an empty footprint"
            lats = [a for a in range(3) if a != axis]
            lims = []
            for w, a in ((xs, lats[0]), (ys, lats[1])):
                if a == 2:
                    lims.append((0, Zp))        # full z: no lane slice
                else:
                    lims.append((max(int(w.min()) - 2, 1),
                                 min(int(w.max()) + 3, sp.shape[a] - 1)))
            (a0, a1), (b0, b1) = lims

            def crop(arr, lead=0):
                idx = [slice(None)] * lead + [None, None, None]
                idx[lead + axis] = slice(cc - 1, cc + 2)
                idx[lead + lats[0]] = slice(a0, a1)
                idx[lead + lats[1]] = slice(b0, b1)
                return np.ascontiguousarray(arr[tuple(idx)])

            slab_bcs = []
            rec_valid = None
            for k2, bc2 in enumerate(sp.boundaries):
                d2, axis2, _, _, plane2 = self._bc_geo[k2]
                if axis2 != axis or bc2.coord + bc2.normal != cc:
                    continue
                v2 = np.asarray(plane2)[a0:a1, b0:b1]
                if k2 != k and not v2.any():
                    continue
                sl2 = _plane_slicer(axis, 1)
                # slab slicers live in (lat0, lat1, axis)-reordered
                # coords only when axis == 2; for axis 0/1 the slab
                # keeps dense (x, y, z) order with the axis extent 3
                slab_bcs.append((d2, sl2, jnp.asarray(v2),
                                 bcs_cfn[k2]))
                if k2 == k:
                    rec_valid = jnp.asarray(v2)
            self._fix.append(dict(
                k=k, axis=axis, cc=cc, win=(a0, a1, b0, b1),
                # phi only on the slab crop — never materialize the
                # full-box (7, Xp, Yp, Zp) factor (3.7 GB at 512^3)
                phi=jnp.asarray(phi7(jnp.asarray(crop(up, lead=1)))),
                nbr=jnp.asarray(crop(nbr_block, lead=1)),
                comp=jnp.asarray(crop(comp)),
                fluid=jnp.asarray(crop(fluid)),
                bcs=slab_bcs,
                valid=rec_valid,
                denom=np.float32(max(float(np.asarray(
                    rec_valid).sum()), 1.0)),
            ))

        nx, ny = Xp - 2, Yp - 2
        auto = _pick_tiles7(nx, ny, Zp, prefer_small=interpret)
        self.tx = tx if tx is not None else auto[0]
        self.ty = ty if ty is not None else auto[1]
        if interpret:
            self.stx = stx if stx is not None else self.tx
            self.sty = sty if sty is not None else self.ty
        else:
            self.stx = stx if stx is not None else auto[2]
            self.sty = sty if sty is not None else auto[3]
        self.stx = min(self.stx, self.tx)
        self.sty = min(self.sty, self.ty)

        self.tids = None
        self.n_live = None
        total_tiles = (nx // self.tx) * (ny // self.ty)
        if tile_skip == "auto":
            ids_np = live_tile_ids(mask, self.tx, self.ty, ring=1)
            tile_skip = len(ids_np) / max(total_tiles, 1) < 0.6
        if tile_skip:
            tids_np = live_tile_ids(mask, self.tx, self.ty, ring=1)
            self.tids = jnp.asarray(tids_np)
            self.n_live = int(tids_np.shape[0])
        self.in_place = self.tids is not None and self.n_live < total_tiles
        self.need_seam = (self.in_place and (nx // self.tx) > 1
                          and (ny // self.ty) > 1)
        self.t = 0
        self._scan_cache = {}
        self.mesh = None
        if mesh is not None:
            assert not live_u, (
                "mesh= is the frozen-field kernel route; the coupled "
                "kernel is single-chip (use the dense CoupledTransport "
                "mesh= for sharded time-resolved transport)")
            self._build_sharded(mesh, shard_axis, up, comp, mask,
                                bcs_cfn)

    # ---- multi-chip: blocked layout + ppermuted halo planes ---------
    def _build_sharded(self, mesh, shard_axis, up, comp, mask, bcs_cfn):
        """Shard the frozen-field kernel over a device mesh: the packed
        g carves into per-shard blocks along one BC-free x/y axis, each
        block carrying its own one-cell halo rows IN the array (the
        to_blocked overlap layout of parallel/pallas_sharded). Per step
        each shard ppermutes its edge interior planes around the ring
        and WRITES them into its own halo rows, after which the
        UNCHANGED single-chip bulk kernel runs on the local block —
        no kernel halo machinery needed (D3Q7 pulls reach one cell).
        BC slab fixups recompute from per-shard HOST-built static crops
        (union local windows along the shard dim, the flow path's
        static-uniform-window argument); record sums count only shard-
        interior rows (each global row is interior to exactly one
        shard) and psum."""
        from lbm_tpu.parallel.mesh import free_axis
        from lbm_tpu.parallel.pallas_sharded import (_overlap_windows,
                                                     blocked_sharding,
                                                     shard_tile_lists)

        sp = self.spec_pad
        axis = free_axis(self.spec) if shard_axis is None else shard_axis
        assert axis in (0, 1), (
            "the packed scalar layout keeps z on the lane dim; shard "
            "x or y (use the dense GSPMD route for z-only cases)")
        for bc in sp.boundaries:
            assert bc.axis != axis, "BC on the shard axis"
        ndev = mesh.devices.size
        n_axis = sp.shape[axis] - 2
        assert n_axis % ndev == 0, (
            f"axis extent {n_axis} not divisible by {ndev}")
        L = n_axis // ndev
        self.mesh = mesh
        self._shax = axis
        self._L = L
        self._ndev = ndev
        self._axname = "d"

        mask_np = np.asarray(mask)
        self._g_blocked_sharding = blocked_sharding(mesh, 4, axis,
                                                    self._axname)
        self.g = jax.device_put(
            _overlap_windows(np.asarray(self.g), axis, ndev, L),
            self._g_blocked_sharding)
        self.aux = jax.device_put(
            _overlap_windows(np.asarray(self.aux), axis, ndev, L),
            self._g_blocked_sharding)

        # per-shard local tile geometry (block interior = L x loc_ny)
        loc_nx = L if axis == 0 else sp.shape[0] - 2
        loc_ny = L if axis == 1 else sp.shape[1] - 2
        atx, aty, astx, asty = _pick_tiles7(
            loc_nx, loc_ny, sp.shape[2], prefer_small=self.interpret)
        self._stx_s, self._sty_s = ((atx, aty) if self.interpret
                                    else (astx, asty))
        self._tx_s, self._ty_s = atx, aty
        tids_np, n_max, total = shard_tile_lists(mask_np, ndev, axis,
                                                 atx, aty)
        skip = n_max / max(total, 1) < 0.6
        self._tids_s = jnp.asarray(tids_np) if skip else None
        self._nmax_s = n_max if skip else None
        self._inplace_s = bool(skip)
        gx_l, gy_l = loc_nx // atx, loc_ny // aty
        self._seam_s = self._inplace_s and gx_l > 1 and gy_l > 1

        def sdw(b0, b1):
            """Union local window along the shard dim (flow path's
            shard_dim_window): one static window valid on every shard."""
            s_first = max(0, (b0 - (L + 2)) // L + 1)
            s_last = min(ndev - 1, -(-b1 // L) - 1)
            u_lo = max(0, b0 - s_last * L)
            u_hi = min(L + 2, b1 - s_first * L)
            return u_lo, u_hi

        # Per-fix per-shard static crops from the global host arrays.
        up = np.asarray(up, np.float32)
        e7 = _E7.astype(np.float32)
        phi_full = np.stack([
            _W7[i] * (np.float32(1.0) + np.float32(4.0)
                      * (e7[i, 0] * up[0] + e7[i, 1] * up[1]
                         + e7[i, 2] * up[2]))
            for i in range(_Q7)])
        blocking = ((mask_np == CellType.WALL)
                    | (mask_np == CellType.MOVING))
        nbr_full = np.stack(
            [np.roll(blocking, shift=tuple(int(v) for v in _E7[i]),
                     axis=(0, 1, 2)) for i in range(1, _Q7)])
        fluid_full = mask_np == CellType.FLUID
        comp_full = np.asarray(comp, np.float32)

        self._sfix = []
        for k, fx in enumerate(self._fix):
            a, cc0 = fx["axis"], fx["cc"]
            lats = [d for d in range(3) if d != a]
            a0, a1, b0, b1 = fx["win"]
            wins_g = {lats[0]: (a0, a1), lats[1]: (b0, b1)}
            loc_win = {}
            for d, (w0, w1) in wins_g.items():
                loc_win[d] = sdw(w0, w1) if d == axis else (w0, w1)
            (la0, la1) = loc_win[lats[0]]
            (lb0, lb1) = loc_win[lats[1]]

            def crops(arr, lead=0, a=a, cc0=cc0, lats=lats,
                      la0=la0, la1=la1, lb0=lb0, lb1=lb1):
                """(ndev, ...) stack of per-shard crops (local
                windows -> global rows s*L + local along the shard
                dim)."""
                outs = []
                for s in range(ndev):
                    idx = [slice(None)] * lead + [None] * 3
                    idx[lead + a] = slice(cc0 - 1, cc0 + 2)
                    for (d, w0, w1) in ((lats[0], la0, la1),
                                        (lats[1], lb0, lb1)):
                        off = s * L if d == axis else 0
                        idx[lead + d] = slice(off + w0, off + w1)
                    outs.append(np.ascontiguousarray(arr[tuple(idx)]))
                return jnp.asarray(np.stack(outs))

            # record mask: valid plane cells, HALO rows zeroed so each
            # global cell is counted by exactly one shard
            def plane_crops(v2d, zero_halo, a=a, lats=lats, la0=la0,
                            la1=la1, lb0=lb0, lb1=lb1):
                outs = []
                for s in range(ndev):
                    idx = [None, None]
                    for j, (d, w0, w1) in enumerate(
                            ((lats[0], la0, la1), (lats[1], lb0, lb1))):
                        off = s * L if d == axis else 0
                        idx[j] = slice(off + w0, off + w1)
                    blk = np.array(v2d[tuple(idx)])
                    if zero_halo and axis in lats:
                        j = lats.index(axis)
                        w0 = (la0, lb0)[j]
                        w1 = (la1, lb1)[j]
                        sel = [slice(None), slice(None)]
                        for halo_row in (0, L + 1):
                            if w0 <= halo_row < w1:
                                sel2 = list(sel)
                                sel2[j] = halo_row - w0
                                blk[tuple(sel2)] = False
                        # overlap-window duplicate: global row s*L+L+1
                        # == (s+1)*L + 1 appears as halo here and
                        # interior there — zeroing halos suffices
                    outs.append(blk)
                return jnp.asarray(np.stack(outs))

            # rebuild slab bcs from the global geometry with the LOCAL
            # windows (the single-chip fx["bcs"] crops used the global
            # window)
            sbcs = []
            rec_valid = None
            for k2, bc2 in enumerate(sp.boundaries):
                d2, axis2, _, _, plane2 = self._bc_geo[k2]
                if axis2 != a or bc2.coord + bc2.normal != cc0:
                    continue
                v_full = np.asarray(plane2)
                vb = plane_crops(v_full, zero_halo=False)
                if k2 != k and not bool(np.asarray(vb).any()):
                    continue
                sbcs.append((d2, _plane_slicer(a, 1), vb, bcs_cfn[k2]))
                if k2 == k:
                    rec_valid = plane_crops(v_full, zero_halo=True)
            self._sfix.append(dict(
                axis=a, cc=cc0, win=(la0, la1, lb0, lb1),
                phi=crops(phi_full, lead=1),
                nbr=crops(nbr_full, lead=1),
                comp=crops(comp_full),
                fluid=crops(fluid_full),
                bcs=sbcs, valid=rec_valid, denom=fx["denom"],
            ))

    def _sharded_step(self):
        """local shard_map body builder: (gp_loc, t, aux_loc, tids_loc,
        *fix crops) -> (gp', recs)."""
        axis, L, name = self._shax, self._L, self._axname
        tx, ty = self._tx_s, self._ty_s
        stx, sty = self._stx_s, self._sty_s
        n_max, in_place = self._nmax_s, self._inplace_s
        need_seam = self._seam_s
        interpret = self.interpret

        def local_step(gp, t, aux_loc, *arrs):
            arrs = list(arrs)
            tids_loc = None
            if self._tids_s is not None:
                tids_loc = arrs.pop(0).reshape(-1)
            fxs = []
            for fx in self._sfix:
                loc = dict(fx)
                loc["phi"] = arrs.pop(0)
                loc["nbr"] = arrs.pop(0)
                loc["comp"] = arrs.pop(0)
                loc["fluid"] = arrs.pop(0)
                bcs = []
                for (d2, sl2, v, cfn) in fx["bcs"]:
                    bcs.append((d2, sl2, arrs.pop(0), cfn))
                loc["bcs"] = bcs
                if fx["valid"] is not None:
                    loc["valid"] = arrs.pop(0)
                fxs.append(loc)
            n = jax.lax.axis_size(name)
            fwd = [(i, (i + 1) % n) for i in range(n)]
            bwd = [(i, (i - 1) % n) for i in range(n)]
            if axis == 0:
                lo = jax.lax.ppermute(gp[L:L + 1], name, fwd)
                hi = jax.lax.ppermute(gp[1:2], name, bwd)
                gp = gp.at[0:1].set(lo).at[L + 1:L + 2].set(hi)
            else:
                lo = jax.lax.ppermute(gp[:, L:L + 1], name, fwd)
                hi = jax.lax.ppermute(gp[:, 1:2], name, bwd)
                gp = gp.at[:, 0:1].set(lo).at[:, L + 1:L + 2].set(hi)
            extra = []
            if tids_loc is not None:
                extra.append(tids_loc)
            seam = (_extract_seam(gp, tx, 1) if need_seam else None)
            slabs = [self._slab_local(gp, fx, interpret) for fx in fxs]
            if in_place and (slabs or seam is not None):
                pre = [seam] if seam is not None else []
                bar = jax.lax.optimization_barrier((gp, *pre, *slabs))
                gp, rest = bar[0], list(bar[1:])
                if seam is not None:
                    seam, rest = rest[0], rest[1:]
                slabs = rest
            if seam is not None:
                extra.append(seam)
            out = _scalar_bulk(
                gp, aux_loc, *extra, tau_g=self.tau_g,
                source=self.source, tx=tx, ty=ty, stx=stx, sty=sty,
                n_live=n_max, in_place=in_place or None,
                has_seam=need_seam, interpret=interpret)
            recs = []
            for fx, slab in zip(fxs, slabs):
                bcs_loc = [(d2, sl2, v[0], cfn)
                           for (d2, sl2, v, cfn) in fx["bcs"]]
                g_new, c = _transport_pass(
                    slab, t, fx["phi"][0], fx["nbr"][0], bcs_loc,
                    self.omega, self.tau_g, fx["comp"][0], self.source,
                    fx["fluid"][0])
                plane_sl = _plane_slicer(fx["axis"], 1)
                newplane = g_new[(slice(None),) + plane_sl]
                c_plane = c[plane_sl]
                if fx["valid"] is not None:
                    recs.append(jnp.sum(jnp.where(
                        fx["valid"][0], c_plane, 0.0)) / fx["denom"])
                out = self._splice_local(out, newplane, fx, interpret)
            rec_v = (jnp.stack(recs) if recs
                     else jnp.zeros((0,), jnp.float32))
            return out, jax.lax.psum(rec_v, name)

        return local_step

    def _slab_local(self, gp, fx, interpret):
        """Pre-step slab on the LOCAL block, window in local coords."""
        a0, a1, b0, b1 = fx["win"]
        a, cc0 = fx["axis"], fx["cc"]
        if a == 2:
            sub = _extract_z_slab(gp, x0=a0, y0=b0, wx=a1 - a0,
                                  wy=b1 - b0, c=cc0,
                                  interpret=interpret)
            return sub.transpose(2, 0, 1, 3)[:_Q7]
        if a == 0:
            return gp[cc0 - 1: cc0 + 2, a0:a1, :_Q7,
                      b0:b1].transpose(2, 0, 1, 3)
        return gp[a0:a1, cc0 - 1: cc0 + 2, :_Q7,
                  b0:b1].transpose(2, 0, 1, 3)

    def _splice_local(self, g_out, newplane, fx, interpret):
        a0, a1, b0, b1 = fx["win"]
        a, cc0 = fx["axis"], fx["cc"]
        if a == 2:
            val = newplane.transpose(1, 2, 0)[1:-1, 1:-1]
            return _splice_z_plane_inplace(
                g_out, val, x0=a0 + 1, y0=b0 + 1, c=cc0, nch=_Q7,
                interpret=interpret)
        pl_v = newplane.transpose(1, 2, 0)[1:-1]
        val = jnp.concatenate(
            [pl_v, jnp.zeros(pl_v.shape[:2] + (C7 - _Q7,),
                             pl_v.dtype)], axis=2).transpose(0, 2, 1)
        if a == 0:
            return g_out.at[cc0, a0 + 1: a1 - 1, :, b0:b1].set(val)
        return g_out.at[a0 + 1: a1 - 1, cc0, :, b0:b1].set(val)

    # ---- one step: bulk kernel + per-BC slab fixups -----------------
    def _slab(self, gp, fx, nch=_Q7):
        a0, a1, b0, b1 = fx["win"]
        axis, cc = fx["axis"], fx["cc"]
        if axis == 2:
            sub = _extract_z_slab(gp, x0=a0, y0=b0, wx=a1 - a0,
                                  wy=b1 - b0, c=cc,
                                  interpret=self.interpret)
            return sub.transpose(2, 0, 1, 3)[:nch]     # (n, wx, wy, 3)
        if axis == 0:
            sub = gp[cc - 1: cc + 2, a0:a1, :nch, b0:b1]
            return sub.transpose(2, 0, 1, 3)           # (n, 3, wa, wb)
        sub = gp[a0:a1, cc - 1: cc + 2, :nch, b0:b1]
        return sub.transpose(2, 0, 1, 3)               # (n, wa, 3, wb)

    def _apply_fix(self, g_out, slab_g, fx, t, phi=None):
        """Recompute the consumer plane exactly on the pre-step slab via
        the dense pass, splice its window interior into the kernel
        output, and return the plane's post-stream mean concentration
        over the BC footprint (the washout record). phi: override of
        the static fx["phi"] — the coupled route rebuilds it per step
        from the live flow slab (CoupledTransportPallas._slab_phi)."""
        axis, cc = fx["axis"], fx["cc"]
        a0, a1, b0, b1 = fx["win"]
        g_new, c = _transport_pass(
            slab_g, t, fx["phi"] if phi is None else phi, fx["nbr"],
            fx["bcs"], self.omega,
            self.tau_g, fx["comp"], self.source, fx["fluid"],
            dirichlet=fx.get("dirichlet"))
        plane_sl = _plane_slicer(axis, 1)
        newplane = g_new[(slice(None),) + plane_sl]     # (7, A, B)
        c_plane = c[plane_sl]
        if fx.get("valid") is None:      # Dirichlet-wall fixup: no
            rec = jnp.float32(0.0)       # washout record to sample
        else:
            rec = (jnp.sum(jnp.where(fx["valid"], c_plane, 0.0))
                   / fx["denom"])
        # splice the window interior (margin >= 2 makes the outermost
        # ring the only wrap-corruptible cells; full-z laterals wrap
        # exactly like the box and need no trim)
        if axis == 2:
            ia = slice(1, -1)
            ib = slice(1, -1)
            val = newplane.transpose(1, 2, 0)[ia, ib]   # (wx-2, wy-2, 7)
            return _splice_z_plane_inplace(
                g_out, val, x0=a0 + 1, y0=b0 + 1, c=cc, nch=_Q7,
                interpret=self.interpret), rec
        # axis 0/1: lateral axes are (other plane axis, z); z is full
        # (wraps like the box), the other axis windowed -> trim [1:-1].
        # Write ALL 8 channels (pad channel zeroed — the bulk kernel
        # writes it zero too): a 7-of-8 channel-dim DUS is a
        # non-contiguous update that XLA answers with a copy of the
        # whole g-pack per fixup per step at flagship scale, exactly
        # the flow kernel's 24-channel-splice lesson
        # (collide_stream._fix_xy_plane_windowed).
        pl_v = newplane.transpose(1, 2, 0)[1:-1]        # (A-2, B, 7)
        val = jnp.concatenate(
            [pl_v, jnp.zeros(pl_v.shape[:2] + (C7 - _Q7,),
                             pl_v.dtype)], axis=2).transpose(0, 2, 1)
        if axis == 0:
            out = g_out.at[cc, a0 + 1: a1 - 1, :, b0:b1].set(val)
        else:
            out = g_out.at[a0 + 1: a1 - 1, cc, :, b0:b1].set(val)
        return out, rec

    def make_step(self):
        """step(gp, t, aux) — aux is self.aux, threaded as a jit
        ARGUMENT: a closed-over device array lowers to an HLO literal,
        and the (293, 293, 8, 376) AUX pack is ~1 GB at the flagship
        coronary box — the remote compile service rejects the request
        (HTTP 413; same fix as engine/scalar.ScalarTransport.fields)."""
        def step(gp, t, aux):
            extra = []
            if self.tids is not None:
                extra.append(self.tids)
            seam = (_extract_seam(gp, self.tx, 1)
                    if self.need_seam else None)
            slabs = [self._slab(gp, fx) for fx in self._fix]
            if self.in_place and (slabs or seam is not None):
                pre = [seam] if seam is not None else []
                bar = jax.lax.optimization_barrier((gp, *pre, *slabs))
                gp, rest = bar[0], list(bar[1:])
                if seam is not None:
                    seam, rest = rest[0], rest[1:]
                slabs = rest
            if seam is not None:
                extra.append(seam)
            out = _scalar_bulk(
                gp, aux, *extra, tau_g=self.tau_g,
                source=self.source, tx=self.tx, ty=self.ty,
                stx=self.stx, sty=self.sty, n_live=self.n_live,
                in_place=self.in_place or None,
                has_seam=self.need_seam, interpret=self.interpret)
            recs = []
            for fx, slab in zip(self._fix, slabs):
                out, rec = self._apply_fix(out, slab, fx, t)
                recs.append(rec)
            return out, (jnp.stack(recs) if recs
                         else jnp.zeros((0,), jnp.float32))

        return step

    def _run_sharded(self, n_steps: int, record):
        key = ("sh", int(n_steps),
               None if record is None else tuple(record))
        if key not in self._scan_cache:
            from jax.sharding import PartitionSpec as P

            local_step = self._sharded_step()
            name, axis = self._axname, self._shax
            st = [None] * 4
            st[axis] = name
            st_spec = P(*st)
            in_specs = [st_spec, P(), st_spec]
            extras = []

            def add(arr):
                in_specs.append(P(name, *([None] * (arr.ndim - 1))))
                extras.append(arr)

            if self._tids_s is not None:
                add(self._tids_s)
            for fx in self._sfix:
                for arr in (fx["phi"], fx["nbr"], fx["comp"],
                            fx["fluid"]):
                    add(arr)
                for (_, _, v, _) in fx["bcs"]:
                    add(v)
                if fx["valid"] is not None:
                    add(fx["valid"])
            sm = jax.shard_map(local_step, mesh=self.mesh,
                               in_specs=tuple(in_specs),
                               out_specs=(st_spec, P()),
                               check_vma=False)
            rec_idx = tuple(record) if record is not None else ()

            def scan_fn(g, t0, aux, *ex):
                def body(g, t):
                    g, recs = sm(g, t, aux, *ex)
                    ys = (recs[jnp.asarray(rec_idx)] if rec_idx
                          else jnp.zeros((0,), jnp.float32))
                    return g, ys

                return jax.lax.scan(
                    body, g,
                    t0 + jnp.arange(n_steps, dtype=jnp.int32))

            self._scan_cache[key] = (jax.jit(scan_fn), extras)
        fn, extras = self._scan_cache[key]
        self.g, series = fn(self.g, jnp.int32(self.t), self.aux,
                            *extras)
        self.t += n_steps
        return np.asarray(series) if record is not None else None

    def _g_global(self):
        """The packed global state (host round-trip when sharded)."""
        if self.mesh is None:
            return self.g
        gb = np.asarray(self.g)
        ndev, L, axis = self._ndev, self._L, self._shax
        blocks = np.split(gb, ndev, axis=axis)
        inner = [np.take(b, range(1, L + 1), axis=axis)
                 for b in blocks]
        first = np.take(blocks[0], [0], axis=axis)
        last = np.take(blocks[-1], [L + 1], axis=axis)
        return jnp.asarray(np.concatenate([first] + inner + [last],
                                          axis=axis))

    def run(self, n_steps: int, record: Optional[list] = None):
        """Advance n_steps in one jitted lax.scan; record: boundary
        indices whose consumer-plane mean concentration is sampled
        every step (from the fixup recompute — no state slicing)."""
        if self.mesh is not None:
            return self._run_sharded(n_steps, record)
        key = (int(n_steps), None if record is None else tuple(record))
        if key not in self._scan_cache:
            step = self.make_step()
            rec_idx = tuple(record) if record is not None else ()

            def scan_fn(g, t0, aux):
                def body(carry, t):
                    (g,) = carry
                    g, recs = step(g, t, aux)
                    ys = (recs[jnp.asarray(rec_idx)] if rec_idx
                          else jnp.zeros((0,), jnp.float32))
                    return (g,), ys

                return jax.lax.scan(
                    body, (g,),
                    t0 + jnp.arange(n_steps, dtype=jnp.int32))

            self._scan_cache[key] = jax.jit(scan_fn)
        (self.g,), series = self._scan_cache[key](
            self.g, jnp.int32(self.t), self.aux)
        self.t += n_steps
        return np.asarray(series) if record is not None else None

    @property
    def fluid(self):
        """(X, Y, Z) fluid mask on the UNPADDED box (dense-class API
        parity — e.g. the residence-time statistics in demo_washout)."""
        return self.fluid_pad[self._crop]

    def concentration(self):
        """(X, Y, Z) scalar field on the UNPADDED box (zeros at
        non-fluid cells)."""
        c = jnp.sum(unpack_g(self._g_global()), axis=0)
        c = jnp.where(self.fluid_pad, c, 0.0)
        return c[self._crop]

    def total(self) -> float:
        """f64 host sum over the UNPADDED box (same audit contract as
        the dense class). The packed state's halo ring is unspecified
        in functional-output mode — the kernel never writes it and no
        fluid cell ever pulls from it (x/y boundary layers are
        non-fluid, the same proof the flow kernel rests on) — so the
        sum must crop to the interior."""
        gg = self._g_global()
        X, Y, Z = (int(s) for s in self.spec.shape)
        if int(np.prod(gg.shape)) * 4 > 2e9:
            # 512^3-class: the dense unpack (transposed (7, X, Y, Z)
            # copy) next to the g/aux packs OOMs one chip — stream
            # x-row chunks through the DMA extractor instead
            from lbm_tpu.kernels.collide_stream import _extract_rows

            B = max(1, int(256e6) // (gg.shape[1] * C7
                                      * gg.shape[3] * 4))
            tot = 0.0
            for x0 in range(0, X, B):
                b = min(B, X - x0)
                blk = np.asarray(_extract_rows(
                    gg, x0=1 + x0, wx=b, interpret=self.interpret),
                    np.float64)
                tot += blk[:, 1:1 + Y, :_Q7, :Z].sum()
            return float(tot)
        g = np.asarray(unpack_g(gg), np.float64)
        return float(g[(slice(None),) + self._crop].sum())


class CoupledTransportPallas(ScalarTransportPallas):
    """Kernel-pace time-resolved coupled transport (VERDICT r4
    next-#1): the flow Pallas kernel and the D3Q7 scalar kernel advance
    in ONE lax.scan body — per step the fused flow kernel produces p'
    (including its NEE/windkessel plane fixups), then the coupled
    scalar kernel (_subtile7f) streams p' interior tiles alongside the
    g tiles and rebuilds the advection velocity IN-KERNEL from p''s
    moments, replacing engine/scalar.CoupledTransport's dense-XLA flow
    step — the route that could not even compile at the flagship
    291x291x372 coronary box. BC consumer planes recompute densely on
    pre-step slabs as in the frozen class, with the slab phi rebuilt
    per step from the flow slab (_slab_phi).

    Semantics vs the dense CoupledTransport (div_fix=False):
      - the scalar advects in u = (m' - F/2)/rho from the POST-collision
        flow state; collision invariance makes this the in-step Guo
        velocity exactly in exact arithmetic (see _subtile7f), so
        agreement is to fp32 op-order rounding (tests use rtol).
      - div_fix is OFF (the defect compensation is a property of one
        frozen field; for time-resolved flow it would have to be
        rebuilt per step — 6 dense rolls — defeating the kernel; the
        dense class accepts div_fix=False for the same regime).
    Windkessel outlets ride the flow step's P_c carry
    (collide_stream.make_pallas_step wk route) — the full clinical
    pulsatile configuration (coronary + RCR + contrast washout) runs
    at kernel pace.

    flow_kwargs: forwarded to make_pallas_step (e.g. in_place=True at
    512^3-class sizes, tx/ty overrides).
    """

    def __init__(self, spec, D: Optional[float] = None,
                 tau_g: Optional[float] = None,
                 inlet_c: Optional[dict] = None, source: float = 0.0,
                 c0=None, f0=None, wk0=None, interpret: bool = False,
                 tx: Optional[int] = None, ty: Optional[int] = None,
                 stx: Optional[int] = None, sty: Optional[int] = None,
                 tile_skip="auto", flow_kwargs: Optional[dict] = None,
                 lowmem: Optional[bool] = None):
        from lbm_tpu.engine.compile import compile_case, wk_init
        from lbm_tpu.engine.step import has_windkessel, initial_f
        from lbm_tpu.kernels import collide_stream as cs

        super().__init__(spec, np.asarray(spec.u0), D=D, tau_g=tau_g,
                         inlet_c=inlet_c, source=source, c0=c0,
                         div_fix=False, interpret=interpret, tx=tx,
                         ty=ty, stx=stx, sty=sty, tile_skip=tile_skip,
                         live_u=True)
        sp = self.spec_pad
        self.stat = pack_stat(sp.mask)
        self.aux = None     # frozen-u AUX replaced by stat + live flow
        for fx in self._fix:
            nbr = np.asarray(fx["nbr"])
            fx["blocked"] = jnp.asarray(np.stack(
                [nbr[2 * a] | nbr[2 * a + 1] for a in range(3)]))
            fx["phi"] = None            # rebuilt per step (_slab_phi)

        if lowmem is None:
            lowmem = int(np.prod(sp.shape)) * 24 * 4 > 4e9
        self._lowmem = bool(lowmem)
        self.cc = compile_case(sp, light=True, host_arrays=lowmem)
        self.has_wk = has_windkessel(self.cc.bcs)
        self._flow_force = (None if spec.force is None else
                            tuple(float(v) for v in spec.force))
        kw = dict(interpret=interpret, tile_skip="auto")
        if lowmem:
            kw["in_place"] = True
        kw.update(flow_kwargs or {})
        self._flow_step = cs.make_pallas_step(self.cc, **kw)
        # coupled-kernel force constants (None for pure transport; the
        # Boussinesq subclass sets (buoy, c_ref, base))
        self._force_const = (None if self._flow_force is None
                             else ((0.0, 0.0, 0.0), 0.0,
                                   self._flow_force))

        if f0 is None:
            if lowmem:
                self.p = cs.packed_initial_lowmem(sp)
            else:
                mask = jnp.asarray(np.asarray(sp.mask))
                self.p = cs.pack_state(initial_f(self.cc), mask)
        else:
            f0 = np.asarray(f0, np.float32)
            assert f0.shape == (19,) + tuple(spec.shape), f0.shape
            if lowmem:
                self.p = cs.pack_state_lowmem(f0, sp)
            else:
                X, Y, Z = spec.shape
                Xp, Yp, Zp = sp.shape
                fpad = jnp.pad(jnp.asarray(f0),
                               ((0, 0), (1, Xp - X - 1),
                                (1, Yp - Y - 1), (0, Zp - Z)))
                mask = jnp.asarray(np.asarray(sp.mask))
                self.p = cs.pack_state(fpad, mask)
        w0 = wk_init(self.cc.bcs)
        if not self.has_wk:
            self.wk = jnp.zeros((0,), jnp.float32)
        else:
            self.wk = jnp.asarray(w0 if wk0 is None else wk0,
                                  jnp.float32)
        self.velsum = None  # last step's fluid speed sum (diagnostic)
        self._ff = None     # Boussinesq force-field flow (subclass)
        self._dfix = []     # Dirichlet-wall plane fixups (subclass)

    def _slab_phi(self, slab_p, fx, slab_g=None):
        """phi7 on a fixup slab from the live flow slab's moments: u =
        (m' - F/2)/rho, impermeability-projected with the slab's static
        blocked-axis masks — the slab mirror of _subtile7f. slab_g:
        used by the Boussinesq subclass for the per-cell F."""
        rho = jnp.sum(slab_p, axis=0)
        mom = jnp.tensordot(
            jnp.asarray(_E19.T.astype(np.float32)), slab_p,
            axes=([1], [0]), precision=jax.lax.Precision.HIGHEST)
        F = self._slab_force(fx, slab_g)
        if F is not None:
            mom = mom - 0.5 * F
        u = mom / jnp.where(rho == 0, 1.0, rho)[None]
        u = jnp.where(fx["blocked"], 0.0, u)
        return phi7(u)

    def _slab_force(self, fx, slab_g):
        """Slab force field (None for pure transport; static case force
        broadcasts)."""
        if self._flow_force is None:
            return None
        return jnp.asarray(self._flow_force, jnp.float32).reshape(
            (3,) + (1,) * 3)

    def make_coupled_step(self):
        def step(p, gp, t, wk, stat):
            if self._ff is not None:
                # Boussinesq mode: the flow kernel streams the g-pack
                # and builds F = buoy (c_prev - c_ref) per cell
                if self.has_wk:
                    p, vs, wk = self._flow_step(p, t, gp, wk)
                else:
                    p, vs = self._flow_step(p, t, gp)
            elif self.has_wk:
                p, vs, wk = self._flow_step(p, t, wk)
            else:
                p, vs = self._flow_step(p, t)
            extra = [p]
            if self.tids is not None:
                extra.append(self.tids)
            seam = (_extract_seam(gp, self.tx, 1)
                    if self.need_seam else None)
            fixes = list(self._fix) + list(self._dfix)
            slabs_g = [self._slab(gp, fx) for fx in fixes]
            # post-flow-step slabs: the dense coupled route advects in
            # THIS step's u, which includes the flow BC fixups
            slabs_p = [self._slab(p, fx, nch=19) for fx in fixes]
            if self.in_place and (slabs_g or seam is not None):
                # sequence EVERY other consumer of gp (slab extraction,
                # and in force-field mode the flow kernel's own g read,
                # via p) before the input-aliased scalar kernel
                pre = [seam] if seam is not None else []
                bar = jax.lax.optimization_barrier(
                    (gp, p, *pre, *slabs_g))
                gp, p, rest = bar[0], bar[1], list(bar[2:])
                if seam is not None:
                    seam, rest = rest[0], rest[1:]
                slabs_g = rest
                extra[0] = p
            if seam is not None:
                extra.append(seam)
            out = _scalar_bulk(
                gp, stat, *extra, tau_g=self.tau_g,
                source=self.source, tx=self.tx, ty=self.ty,
                stx=self.stx, sty=self.sty, n_live=self.n_live,
                in_place=self.in_place or None,
                has_seam=self.need_seam, has_flow=True,
                force=self._force_const, interpret=self.interpret)
            recs = []
            for fx, sg, sp_ in zip(fixes, slabs_g, slabs_p):
                phi = self._slab_phi(sp_, fx, slab_g=sg)
                out, rec = self._apply_fix(out, sg, fx, t, phi=phi)
                if fx.get("valid") is not None:
                    recs.append(rec)
            return p, out, (jnp.stack(recs) if recs
                            else jnp.zeros((0,), jnp.float32)), vs, wk

        return step

    def run(self, n_steps: int, record: Optional[list] = None):
        """Advance flow + scalar n_steps in one jitted scan (flow state,
        g state and windkessel carry all ride the scan); record as in
        ScalarTransport.run."""
        key = (int(n_steps), None if record is None else tuple(record))
        if key not in self._scan_cache:
            step = self.make_coupled_step()
            rec_idx = tuple(record) if record is not None else ()

            def scan_fn(p, g, wk, t0, stat):
                def body(carry, t):
                    p, g, wk = carry
                    p, g, recs, vs, wk = step(p, g, t, wk, stat)
                    ys = (recs[jnp.asarray(rec_idx)] if rec_idx
                          else jnp.zeros((0,), jnp.float32))
                    return (p, g, wk), ys

                # unroll=2: the two big in-place-aliased carries (p and
                # g) keep their buffers in place within the unrolled
                # body — without it XLA copies a multi-GB carry per
                # step to maintain the scan's alternating-buffer
                # invariant (measured 17.3 -> see PARITY; the same
                # +42% lesson as the flow runner's chunk scan)
                return jax.lax.scan(
                    body, (p, g, wk),
                    t0 + jnp.arange(n_steps, dtype=jnp.int32),
                    unroll=2 if n_steps % 2 == 0 else 1)

            self._scan_cache[key] = jax.jit(scan_fn,
                                            donate_argnums=(0, 1))
        (self.p, self.g, self.wk), series = self._scan_cache[key](
            self.p, self.g, self.wk, jnp.int32(self.t), self.stat)
        self.t += n_steps
        return np.asarray(series) if record is not None else None

    def macro(self):
        """(rho, u) of the live flow on the UNPADDED box (streamed
        packed moments, runner semantics)."""
        from lbm_tpu.kernels.collide_stream import packed_macro

        nx, ny, nz = self.spec.shape
        rho, u = packed_macro(self.p, ring=1, force=self.cc.force,
                              interpret=self.interpret)
        return rho[:nx, :ny, :nz], u[:, :nx, :ny, :nz]


class BuoyantTransportPallas(CoupledTransportPallas):
    """Boussinesq thermal convection at kernel pace (VERDICT r4
    next-#3): the flow Pallas kernel runs in force-field mode
    (collide_stream.make_pallas_step force_field=) — streaming the
    temperature g-pack's interior tiles and building the buoyancy
    F = buoy (c - c_ref) per cell in-kernel — and the coupled scalar
    kernel advects the temperature in the resulting live velocity,
    replacing engine/thermal.BuoyantTransport's dense-only route
    (engine/thermal.py:112) for 3D thermal boxes at 128^3-256^3 scale.

    Isothermal (Dirichlet) walls: the D3Q7 kernel keeps plain
    bounce-back; every fluid plane adjacent to a Dirichlet wall plate
    is recomputed exactly by the dense pass (anti-bounce-back included)
    on a 3-plane slab and spliced — the same consumer-plane fixup
    architecture as the BC planes. This requires the finite wall_c
    cells to decompose into axis-aligned planes (plates — both
    canonical cavities qualify); anything more complex raises with
    guidance to the dense route.

    Kernel geometry contract applies: x/y boundary layers must be
    non-fluid (use cases/thermal.heated_cavity_3d / a walled 3D RB box;
    the laterally-PERIODIC quasi-2D cases stay on the dense route).
    spec.force must be None (no static base force on this route)."""

    def __init__(self, spec, D: Optional[float] = None,
                 tau_g: Optional[float] = None, buoyancy=(0.0, 0.0, 0.0),
                 c_ref: float = 0.0, wall_c=None,
                 inlet_c: Optional[dict] = None, source: float = 0.0,
                 c0=None, f0=None, interpret: bool = False,
                 tx: Optional[int] = None, ty: Optional[int] = None,
                 stx: Optional[int] = None, sty: Optional[int] = None,
                 tile_skip="auto", flow_kwargs: Optional[dict] = None,
                 lowmem: Optional[bool] = None):
        assert spec.force is None, (
            "the Pallas buoyant route carries no static base force "
            "(plane-BC fixups would need it threaded); use the dense "
            "BuoyantTransport for CaseSpec.force cases")
        buoy = tuple(float(v) for v in buoyancy)
        fk = dict(flow_kwargs or {})
        fk["force_field"] = (buoy, float(c_ref), None)
        super().__init__(spec, D=D, tau_g=tau_g, inlet_c=inlet_c,
                         source=source, c0=c0, f0=f0,
                         interpret=interpret, tx=tx, ty=ty, stx=stx,
                         sty=sty, tile_skip=tile_skip, flow_kwargs=fk,
                         lowmem=lowmem)
        self._ff = (buoy, float(c_ref))
        self._force_const = (buoy, float(c_ref), None)
        self._buoy = jnp.asarray(buoy, jnp.float32)
        self._cref = np.float32(c_ref)
        if wall_c is not None:
            self._build_dirichlet_fixes(wall_c)

    def _build_dirichlet_fixes(self, wall_c):
        """Plane-decompose the Dirichlet wall set and build one slab
        fixup per affected fluid consumer plane (see class docstring)."""
        sp = self.spec_pad
        X, Y, Z = (int(s) for s in self.spec.shape)
        Xp, Yp, Zp = (int(s) for s in sp.shape)
        wcp = np.full((Xp, Yp, Zp), np.nan, np.float32)
        wcp[1:1 + X, 1:1 + Y, :Z] = np.asarray(wall_c, np.float32)
        mask = np.asarray(sp.mask)
        isd = np.isfinite(wcp)
        blocking = ((mask == CellType.WALL)
                    | (mask == CellType.MOVING))
        assert (mask[isd] == CellType.WALL).all(), (
            "wall_c prescribes values at non-wall (or MOVING) cells "
            "(NaN = adiabatic; see scalar.dirichlet_walls)")
        vals = np.where(isd, wcp, 0.0).astype(np.float32)
        ax3 = (0, 1, 2)
        nbr_dir = np.stack(
            [np.roll(isd, shift=tuple(int(v) for v in _E7[i]), axis=ax3)
             for i in range(1, _Q7)])
        cw2 = np.stack(
            [(2.0 * _W7[i]
              * np.roll(vals, shift=tuple(int(v) for v in _E7[i]),
                        axis=ax3)).astype(np.float32)
             for i in range(1, _Q7)])
        nbr_b = np.stack(
            [np.roll(blocking, shift=tuple(int(v) for v in _E7[i]),
                     axis=ax3) for i in range(1, _Q7)])
        fluid = mask == CellType.FLUID
        affected = nbr_dir.any(axis=0) & fluid
        # consumer planes: for each axis a, the coords holding fluid
        # cells whose Dirichlet neighbor lies ALONG a (cells adjacent
        # to a plate only laterally must not spawn a plane per lateral
        # coordinate — that would be O(N) planes for one plate). Every
        # affected cell has a Dirichlet neighbor along some axis, so
        # it lands on that axis's plane at its own coordinate, and the
        # plane recompute (full dense pass with the complete dirichlet
        # crop) repairs ALL its links at once.
        cov = np.zeros_like(affected)
        planes = []
        for a in range(3):
            dirs_a = [i - 1 for i in range(1, _Q7)
                      if int(_E7[i][a]) != 0]
            aff_a = (nbr_dir[dirs_a[0]] | nbr_dir[dirs_a[1]]) & fluid
            for kc in np.unique(np.nonzero(aff_a)[a]):
                kc = int(kc)
                if not (1 <= kc < sp.shape[a] - 1):
                    raise ValueError(
                        "Dirichlet consumer plane at the domain edge — "
                        "the slab fixup needs one interior plane on "
                        "each side; use the dense BuoyantTransport")
                sl = [slice(None)] * 3
                sl[a] = kc
                aff_pl = affected[tuple(sl)]
                planes.append((a, kc, aff_pl))
                cov[tuple(sl)] |= aff_pl
        assert (cov == affected).all(), (
            "internal: Dirichlet consumer-plane decomposition missed "
            "affected cells — report this geometry")
        for (a, kc, aff_pl) in planes:
            lats = [ax for ax in range(3) if ax != a]
            xs, ys = np.nonzero(aff_pl)
            lims = []
            for w, lat in ((xs, lats[0]), (ys, lats[1])):
                if lat == 2:
                    lims.append((0, Zp))        # full z: no lane slice
                else:
                    lims.append((max(int(w.min()) - 2, 1),
                                 min(int(w.max()) + 3,
                                     sp.shape[lat] - 1)))
            (a0, a1), (b0, b1) = lims

            def crop(arr, lead=0, a=a, kc=kc, lats=lats, a0=a0, a1=a1,
                     b0=b0, b1=b1):
                idx = [slice(None)] * lead + [None, None, None]
                idx[lead + a] = slice(kc - 1, kc + 2)
                idx[lead + lats[0]] = slice(a0, a1)
                idx[lead + lats[1]] = slice(b0, b1)
                return np.ascontiguousarray(arr[tuple(idx)])

            self._dfix.append(dict(
                axis=a, cc=kc, win=(a0, a1, b0, b1), phi=None,
                nbr=jnp.asarray(crop(nbr_b, lead=1)),
                comp=None, fluid=jnp.asarray(crop(fluid)),
                bcs=[], valid=None,
                dirichlet=(jnp.asarray(crop(nbr_dir, lead=1)),
                           jnp.asarray(crop(cw2, lead=1))),
                blocked=jnp.asarray(np.stack(
                    [crop(nbr_b[2 * ax] | nbr_b[2 * ax + 1])
                     for ax in range(3)])),
            ))

    def _slab_force(self, fx, slab_g):
        """Per-cell Boussinesq force on the fixup slab, from the
        PRE-step temperature slab (dense _force_field semantics)."""
        c_prev = jnp.sum(slab_g, axis=0)
        dc = jnp.where(fx["fluid"], c_prev - self._cref, 0.0)
        return self._buoy.reshape((3, 1, 1, 1)) * dc[None]

    def nusselt_profile(self, hot_axis: int, kappa: float, dT: float,
                        H: float):
        """Per-plane Nusselt number (engine/thermal semantics) from the
        live kernel state — u includes the buoyant half-force shift."""
        c = np.asarray(self.concentration(), np.float64)
        _, u = self._macro_buoyant()
        ua = np.asarray(u[hot_axis], np.float64)
        return self._nusselt_from(c, ua, hot_axis, kappa, dT, H)

    def _nusselt_from(self, c, ua, hot_axis, kappa, dT, H):
        fluid = np.asarray(self.fluid)
        n = c.shape[hot_axis]
        planes, nu = [], []
        for x in range(2, n - 2):
            sl = [slice(None)] * 3
            sl[hot_axis] = x
            slp = list(sl)
            slp[hot_axis] = x + 1
            slm = list(sl)
            slm[hot_axis] = x - 1
            adv = (ua[tuple(sl)] * c[tuple(sl)])[fluid[tuple(sl)]].sum()
            dif = (-kappa * 0.5
                   * (c[tuple(slp)] - c[tuple(slm)]))[
                       fluid[tuple(sl)]].sum()
            area = fluid[tuple(sl)].sum()
            if area == 0:
                continue
            planes.append(x)
            nu.append((adv + dif) / (area * kappa * dT / H))
        return np.asarray(planes), np.asarray(nu)

    def _macro_buoyant(self):
        """(rho, u) on the unpadded box, SAME convention as the dense
        BuoyantTransport.macro(): moments of the stored post-collision
        state with the current force's +F/2 half-shift — u_macro =
        (m' + F/2)/rho = u_packed + F/(2 rho). (The in-step Guo
        velocity the transport advects in is (m' - F/2)/rho; the dense
        class's Nusselt anchors were validated in the +F/2 macro
        convention, so the diagnostics keep it.)"""
        from lbm_tpu.kernels.collide_stream import packed_macro

        nx, ny, nz = self.spec.shape
        rho, u = packed_macro(self.p, ring=1,
                              interpret=self.interpret)
        rho = rho[:nx, :ny, :nz]
        u = u[:, :nx, :ny, :nz]
        c = jnp.sum(unpack_g(self.g), axis=0)[self._crop]
        fluid = self.fluid
        dc = jnp.where(fluid, c - self._cref, 0.0)
        F = jnp.asarray(self._buoy).reshape((3, 1, 1, 1)) * dc[None]
        u = u + 0.5 * F / jnp.where(rho == 0, 1.0, rho)[None]
        return rho, u

    macro = _macro_buoyant


__all__ = ["ScalarTransportPallas", "CoupledTransportPallas",
           "BuoyantTransportPallas", "pack_g", "unpack_g", "pack_aux",
           "pack_stat"]
