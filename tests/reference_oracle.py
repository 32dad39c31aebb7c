"""Test-only NumPy oracle: a literal transcription of the reference's
two-kernel step (update + boundary_stream), used to demonstrate the
BASELINE accuracy target "<1e-5 relative L2 vs CUDA-reference steady
fields" without a GPU.

Transcribed op-for-op (same per-cell expression trees, same fp32
arithmetic) from:
  - update (fused pull-stream + moments + BGK collide):
      Lid_driven_cavity/ldc.cu:204-369, Poiseulle_flow/Poiseulle.cu:384-583
  - ldc's pre-collision wall bounce-back inside update (on d_scr):
      ldc.cu:75-202
  - boundary_stream wall half-way bounce-back (on d_dst):
      Poiseulle.cu:601-746, bifurcation.cu:654-799
  - NEE velocity / pressure boundaries:
      ldc.cu:391-456 (lid), Poiseulle.cu:748-891 (parabola in/out),
      bifurcation.cu:877-1021 (pressure outlet rho*=1 + measured inlet),
      coronary.cu:716-942 (fixed rho+u inlet, fixed-u outlets)

Determinism notes (why a sequential oracle is faithful to the CUDA code):
  - The only intra-kernel write/read overlaps are wall-cell slot rewrites.
    A wall w's stored slot q holds scr[opp(q)] of the cell F = w + e_q,
    and is consumed (pulled) only when F is fluid — whose slots the wall
    pass never writes. Every CONSUMED value is therefore race-free, and
    phase ordering (walls first, then fluid / NEE) reproduces it exactly.
  - np.roll wraps all axes. The reference wraps y explicitly in the
    Poiseuille wall pass (Poiseulle.cu:617,624 `% NY`) and otherwise reads
    out-of-range block indices; those values land only in never-consumed
    slots (consumer would be outside the grid), so wrapping is equivalent.
  - feq[14]'s `3.0*tmp_uz*tmp_uz` uses a double literal in all four
    solvers (e.g. ldc.cu:344) — the term is computed in f64 and the
    product rounds back to f32 at store; reproduced literally.

Layout: f is a (19, nx, ny, nz) float32 array (the reference's block-tiled
flat indexing is a pure permutation and does not change values).
"""

from __future__ import annotations

import numpy as np

F32 = np.float32

# Velocity set, read off the reference's pull offsets (fnq[q] is gathered
# from x - e_q; ldc.cu:75-182) and moment sums (ldc.cu:320-322).
E = np.array(
    [
        (0, 0, 0),
        (1, 0, 0), (-1, 0, 0),
        (0, 1, 0), (0, -1, 0),
        (0, 0, 1), (0, 0, -1),
        (1, 1, 0), (1, -1, 0), (-1, 1, 0), (-1, -1, 0),
        (1, 0, 1), (1, 0, -1), (-1, 0, 1), (-1, 0, -1),
        (0, 1, 1), (0, -1, 1), (0, 1, -1), (0, -1, -1),
    ],
    dtype=np.int32,
)
# Bounce-back pairs from the reversed writes at ldc.cu:184-201.
OPP = np.array([0, 2, 1, 4, 3, 6, 5, 10, 9, 8, 7, 14, 13, 12, 11, 18, 17, 16, 15])


def pull(arr: np.ndarray, q: int) -> np.ndarray:
    """Value at x - e_q arrives at x (the reference's pull gather)."""
    return np.roll(arr, shift=tuple(E[q]), axis=(0, 1, 2))


def at_consumer(arr: np.ndarray, q: int) -> np.ndarray:
    """arr evaluated at x + e_q, viewed at x (NEE neighbour reads)."""
    return np.roll(arr, shift=tuple(-E[q]), axis=(0, 1, 2))


def feq_one(q: int, rho, ux, uy, uz):
    """feq[q] exactly as written at ldc.cu:330-348 (same text in all
    solvers), preserving expression order and the feq[14] f64 term."""
    if q == 0:
        return rho / 3.0 * (1.0 - 1.5 * ux * ux - 1.5 * uy * uy - 1.5 * uz * uz)
    if q == 1:
        return rho / 18.0 * (1.0 + 3.0 * ux + 3.0 * ux * ux - 1.5 * uy * uy - 1.5 * uz * uz)
    if q == 2:
        return rho / 18.0 * (1.0 - 3.0 * ux + 3.0 * ux * ux - 1.5 * uy * uy - 1.5 * uz * uz)
    if q == 3:
        return rho / 18.0 * (1.0 + 3.0 * uy + 3.0 * uy * uy - 1.5 * ux * ux - 1.5 * uz * uz)
    if q == 4:
        return rho / 18.0 * (1.0 - 3.0 * uy + 3.0 * uy * uy - 1.5 * ux * ux - 1.5 * uz * uz)
    if q == 5:
        return rho / 18.0 * (1.0 + 3.0 * uz + 3.0 * uz * uz - 1.5 * ux * ux - 1.5 * uy * uy)
    if q == 6:
        return rho / 18.0 * (1.0 - 3.0 * uz + 3.0 * uz * uz - 1.5 * ux * ux - 1.5 * uy * uy)
    if q == 7:
        return rho / 36.0 * (1.0 + 3.0 * (ux + uy) + 3.0 * ux * ux + 3.0 * uy * uy + 9.0 * ux * uy - 1.5 * uz * uz)
    if q == 8:
        return rho / 36.0 * (1.0 + 3.0 * (ux - uy) + 3.0 * ux * ux + 3.0 * uy * uy - 9.0 * ux * uy - 1.5 * uz * uz)
    if q == 9:
        return rho / 36.0 * (1.0 + 3.0 * (uy - ux) + 3.0 * ux * ux + 3.0 * uy * uy - 9.0 * ux * uy - 1.5 * uz * uz)
    if q == 10:
        return rho / 36.0 * (1.0 - 3.0 * (ux + uy) + 3.0 * ux * ux + 3.0 * uy * uy + 9.0 * ux * uy - 1.5 * uz * uz)
    if q == 11:
        return rho / 36.0 * (1.0 + 3.0 * (ux + uz) + 3.0 * ux * ux + 3.0 * uz * uz + 9.0 * ux * uz - 1.5 * uy * uy)
    if q == 12:
        return rho / 36.0 * (1.0 + 3.0 * (ux - uz) + 3.0 * ux * ux + 3.0 * uz * uz - 9.0 * ux * uz - 1.5 * uy * uy)
    if q == 13:
        return rho / 36.0 * (1.0 + 3.0 * (uz - ux) + 3.0 * ux * ux + 3.0 * uz * uz - 9.0 * ux * uz - 1.5 * uy * uy)
    if q == 14:
        # `3.0*tmp_uz*tmp_uz` is a DOUBLE literal in the reference
        # (ldc.cu:344) — that term promotes the sum to f64; the final
        # product rounds back to f32 at the store.
        val = rho / 36.0 * (
            1.0 - 3.0 * (ux + uz) + 3.0 * ux * ux
            + np.float64(3.0) * uz * uz + 9.0 * ux * uz - 1.5 * uy * uy
        )
        return np.asarray(val, dtype=np.result_type(rho, ux))
    if q == 15:
        return rho / 36.0 * (1.0 + 3.0 * (uy + uz) + 3.0 * uy * uy + 3.0 * uz * uz + 9.0 * uy * uz - 1.5 * ux * ux)
    if q == 16:
        return rho / 36.0 * (1.0 + 3.0 * (uz - uy) + 3.0 * uy * uy + 3.0 * uz * uz - 9.0 * uy * uz - 1.5 * ux * ux)
    if q == 17:
        return rho / 36.0 * (1.0 + 3.0 * (uy - uz) + 3.0 * uy * uy + 3.0 * uz * uz - 9.0 * uy * uz - 1.5 * ux * ux)
    if q == 18:
        return rho / 36.0 * (1.0 - 3.0 * (uy + uz) + 3.0 * uy * uy + 3.0 * uz * uz + 9.0 * uy * uz - 1.5 * ux * ux)
    raise ValueError(q)


def initial_state(rho0: np.ndarray, u0: np.ndarray, dtype=F32):
    """scr = dst = feq(rho0, u0) plus the persistent macro arrays
    (ldc.cu:504-580 semantics; both buffers initialized)."""
    rho0 = rho0.astype(dtype)
    ux, uy, uz = (u0[a].astype(dtype) for a in range(3))
    f = np.stack([feq_one(q, rho0, ux, uy, uz) for q in range(19)]).astype(dtype)
    return f.copy(), f.copy(), rho0.copy(), ux.copy(), uy.copy(), uz.copy()


def update(scr, dst, fluid, rho, ux, uy, uz, tau):
    """The reference `update` kernel on fluid cells: pull 19 pdfs from scr,
    moments, BGK collide, write dst; persistent macro arrays refreshed
    with the PRE-collision moments (ldc.cu:204-369)."""
    fnq = [scr[0]] + [pull(scr[q], q) for q in range(1, 19)]
    tmp_rho = fnq[0].copy()
    for q in range(1, 19):  # sequential sum, ldc.cu:317-319
        tmp_rho = tmp_rho + fnq[q]
    with np.errstate(divide="ignore", invalid="ignore"):
        tmp_ux = (fnq[1] - fnq[2] + fnq[7] + fnq[8] - fnq[9] - fnq[10]
                  + fnq[11] + fnq[12] - fnq[13] - fnq[14]) / tmp_rho
        tmp_uy = (fnq[3] - fnq[4] + fnq[7] - fnq[8] + fnq[9] - fnq[10]
                  + fnq[15] - fnq[16] + fnq[17] - fnq[18]) / tmp_rho
        tmp_uz = (fnq[5] - fnq[6] + fnq[11] - fnq[12] + fnq[13] - fnq[14]
                  + fnq[15] + fnq[16] - fnq[17] - fnq[18]) / tmp_rho
    rho[fluid] = tmp_rho[fluid]
    ux[fluid] = tmp_ux[fluid]
    uy[fluid] = tmp_uy[fluid]
    uz[fluid] = tmp_uz[fluid]
    for q in range(19):
        feq = feq_one(q, tmp_rho, tmp_ux, tmp_uy, tmp_uz)
        dst[q][fluid] = (fnq[q] - (fnq[q] - feq) / tau)[fluid]


def wall_bounce(buf, wall):
    """Half-way bounce-back: wall cells store their 18 neighbour pulls
    direction-reversed in their own slots. In ldc this runs on d_scr
    inside `update` (ldc.cu:75-202); in the other solvers on d_dst inside
    boundary_stream (Poiseulle.cu:601-746). Same transcription, different
    buffer/phase."""
    fn = [None] + [pull(buf[q], q) for q in range(1, 19)]
    stored = [None] + [fn[OPP[q]] for q in range(1, 19)]
    for q in range(1, 19):
        buf[q][wall] = stored[q][wall]


def nee(dst, bc_cells, dirs, rho, ux, uy, uz, tau,
        rho_star=None, u_star=None):
    """Non-equilibrium extrapolation write at `bc_cells` for `dirs`
    (ldc.cu:391-456 and the matching blocks in the other solvers):

      dst[q at b] = feq_q(rho*, u*) + (dst[q at F] - feq_q(rho_F, u_F))
                    * (1 - 1/tau),   F = b + e_q.

    rho_star None -> extrapolate rho_F; scalar -> prescribed (pressure BC).
    u_star None -> extrapolate u_F (pressure outlet); else a (3,) vector
    or a tuple of three broadcastable arrays (lid / parabola / bc-map).
    """
    dt = rho.dtype.type
    omega = dt(1.0) - dt(1.0) / dt(tau)
    for q in dirs:
        rF = at_consumer(rho, q)
        uxF = at_consumer(ux, q)
        uyF = at_consumer(uy, q)
        uzF = at_consumer(uz, q)
        dstF = at_consumer(dst[q], q)
        feq_nbr = feq_one(q, rF, uxF, uyF, uzF)
        rs = rF if rho_star is None else dt(rho_star)
        if u_star is None:
            us = (uxF, uyF, uzF)
        else:
            us = tuple(np.asarray(c, dtype=rho.dtype) for c in u_star)
        tmp = feq_one(q, rs, us[0], us[1], us[2])
        val = tmp + (dstF - feq_nbr) * omega
        dst[q][bc_cells] = np.broadcast_to(val, dst[q].shape)[bc_cells]


class OracleRun:
    """Drives the per-case reference main loop. Masks use the repo's
    CellType values (DEAD 0 / WALL 1 / INLET 2 / OUTLET 3 / FLUID 4 /
    GHOST -1), which match the reference's general scheme; ldc's private
    {ghost 0, wall 1, lid 2, fluid 3} maps onto it 1:1."""

    def __init__(self, mask, rho0, u0, tau, bcs, ldc_mode=False, f0=None,
                 dtype=F32):
        """bcs: list of dicts {label, dirs, rho_star, u_star} passed to
        nee(). ldc_mode: wall bounce-back runs pre-collision on scr inside
        update (ldc.cu ordering) instead of post-collision on dst.
        f0: optional (19, nx, ny, nz) initial pdfs overriding the feq
        init — lets parity tests seed oracle and engine identically (the
        reference's own init uses a third feq spelling, ldc.cu:553-571,
        so init ulps are not part of the step-map comparison)."""
        self.fluid = np.asarray(mask) == 4
        self.wall = np.asarray(mask) == 1
        self.tau = dtype(tau)
        self.bc_masks = [(np.asarray(mask) == bc["label"], bc) for bc in bcs]
        self.ldc_mode = ldc_mode
        self.scr, self.dst, self.rho, self.ux, self.uy, self.uz = (
            initial_state(rho0, u0, dtype)
        )
        if f0 is not None:
            self.scr = np.array(f0, dtype=dtype)
            self.dst = self.scr.copy()

    def step(self):
        if self.ldc_mode:
            wall_bounce(self.scr, self.wall)  # pre-collision, on scr
        update(self.scr, self.dst, self.fluid,
               self.rho, self.ux, self.uy, self.uz, self.tau)
        if not self.ldc_mode:
            wall_bounce(self.dst, self.wall)  # post-collision, on dst
        for cells, bc in self.bc_masks:
            nee(self.dst, cells, bc["dirs"],
                self.rho, self.ux, self.uy, self.uz, self.tau,
                rho_star=bc.get("rho_star"), u_star=bc.get("u_star"))
        self.scr, self.dst = self.dst, self.scr

    def run(self, steps: int):
        for _ in range(steps):
            self.step()
        return self


# Directions into the domain across a y-plane (from the reference's NEE
# blocks): +y set {3,7,9,15,17}, -y set {4,8,10,16,18}.
DIRS_PLUS_Y = (3, 7, 9, 15, 17)
DIRS_MINUS_Y = (4, 8, 10, 16, 18)
DIRS_PLUS_X = (1, 7, 8, 11, 12)
DIRS_MINUS_X = (2, 9, 10, 13, 14)
DIRS_PLUS_Z = (5, 11, 13, 15, 16)
DIRS_MINUS_Z = (6, 12, 14, 17, 18)


def oracle_from_spec(spec, ldc_mode=False, f0=None, dtype=F32) -> OracleRun:
    """Build an OracleRun from a repo CaseSpec: same mask/init arrays, BC
    table mapped to the reference NEE parameterization. Direction sets are
    derived from the oracle's own E table (e[axis] == normal), which
    reproduces the reference's literal lists (e.g. {4,8,10,16,18} for the
    -y lid, ldc.cu:391-456)."""
    bcs = []
    for bc in spec.boundaries:
        dirs = tuple(
            q for q in range(1, 19) if int(E[q][bc.axis]) == bc.normal
        )
        rho_star = None if bc.rho_mode == "extrapolate" else bc.rho_value
        if bc.u_mode == "fixed":
            u_star = tuple(dtype(c) for c in bc.u_value)
        elif bc.u_mode == "field":
            u_star = tuple(
                np.expand_dims(bc.u_field[c].astype(dtype), axis=bc.axis)
                for c in range(3)
            )
        elif bc.u_mode == "extrapolate":
            u_star = None
        else:
            raise NotImplementedError(
                f"oracle has no literal reference source for u_mode="
                f"{bc.u_mode!r}"
            )
        bcs.append({"label": bc.mask_value, "dirs": dirs,
                    "rho_star": rho_star, "u_star": u_star})
    return OracleRun(spec.mask, spec.rho0, spec.u0, spec.tau, bcs,
                     ldc_mode=ldc_mode, f0=f0, dtype=dtype)
