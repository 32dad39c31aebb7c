"""Explicit halo-exchange step via shard_map + lax.ppermute.

The manual-collective formulation of the spatial decomposition: each
device owns a contiguous slab along one lattice axis; per step it
exchanges one face plane of all 19 populations with each ring neighbor
over ICI (only the 5 inbound populations per face are strictly needed —
the full-plane exchange keeps the pull logic uniform and the plane is
tiny; trimming to 5 is a bandwidth optimization for later rounds).

Functionally identical to letting GSPMD partition the jnp.roll step
(parallel/mesh.py); tests/test_parallel.py checks both against the
single-device engine bit-for-bit on the 8-device CPU mesh.

The sharded axis must carry no NEE boundary plane (see mesh.py); the
ring exchange reproduces jnp.roll's global wrap, whose wrapped-in values
only ever land on dead/ghost cells (or implement Poiseuille's intended
y-wrap, Poiseulle.cu:617).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lbm_tpu.core.lattice import D3Q19, phi
from lbm_tpu.engine.compile import CompiledCase
from lbm_tpu.engine.step import apply_bc_fixup

import numpy as np

_E = D3Q19.E
_OPP = D3Q19.OPP
_EF = _E.astype(np.float32)


def _exchange_halos(f, axis_name: str, lat_axis: int):
    """Return (lo, hi) neighbor face planes: lo = left neighbor's last
    plane (needed by pulls with e_axis = +1), hi = right neighbor's first
    plane. Ring wrap matches jnp.roll semantics."""
    n = jax.lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    ax = 1 + lat_axis
    last = jax.lax.slice_in_dim(f, f.shape[ax] - 1, f.shape[ax], axis=ax)
    first = jax.lax.slice_in_dim(f, 0, 1, axis=ax)
    lo = jax.lax.ppermute(last, axis_name, fwd)   # from left neighbor
    hi = jax.lax.ppermute(first, axis_name, bwd)  # from right neighbor
    return lo, hi


def _pull_ext(f_ext_i, e, lat_axis: int, nloc: int):
    """Pull-stream one direction from the halo-extended slab: the sharded
    axis uses a slice of the extended array, the local axes use rolls."""
    shifts = [int(s) for s in e]
    s_ax = shifts[lat_axis]
    start = 1 - s_ax
    sliced = jax.lax.slice_in_dim(f_ext_i, start, start + nloc, axis=lat_axis)
    other = [a for a in range(3) if a != lat_axis]
    roll_axes = [a for a in other if shifts[a] != 0]
    if roll_axes:
        sliced = jnp.roll(
            sliced, shift=[shifts[a] for a in roll_axes], axis=roll_axes
        )
    return sliced


def make_halo_step(
    cc: CompiledCase, mesh: Mesh, shard_axis: int = 0, axis_name: str = "d"
) -> Callable:
    """Build a shard_map'd fused step over `mesh`, decomposed along
    `shard_axis`. Arrays must be sharded with PartitionSpec along that
    axis (see mesh.shard_compiled)."""
    import dataclasses

    inv_tau = 1.0 / cc.tau
    for bc in cc.bcs:
        if bc.axis == shard_axis:
            raise ValueError(
                f"BC on axis {bc.axis} conflicts with shard axis {shard_axis}"
            )

    # BC plane arrays are global lateral planes whose lateral axes include
    # the sharded lattice axis -> pass them through shard_map, sharded on
    # the matching lateral dim.
    def _bc_lat_dim(bc) -> int:
        lat = [a for a in range(3) if a != bc.axis]
        return lat.index(shard_axis)

    bc_arrays = []
    bc_specs = []
    for bc in cc.bcs:
        idx = _bc_lat_dim(bc)
        arrs, specs = {}, {}
        arrs["valid"] = bc.valid
        specs["valid"] = P(*(
            [None, axis_name, None] if idx == 0 else [None, None, axis_name]
        ))
        if bc.phi_star is not None:
            arrs["phi_star"] = bc.phi_star
            specs["phi_star"] = specs["valid"]
        if bc.phi_star_series is not None:
            arrs["phi_star_series"] = bc.phi_star_series
            specs["phi_star_series"] = P(*(
                [None, None, axis_name, None] if idx == 0
                else [None, None, None, axis_name]
            ))
        bc_arrays.append(arrs)
        bc_specs.append(specs)

    def local_step(f, nbr_wall, fluid, t, bc_data):
        nloc = f.shape[1 + shard_axis]
        lo, hi = _exchange_halos(f, axis_name, shard_axis)
        f_ext = jnp.concatenate([lo, f, hi], axis=1 + shard_axis)
        pulled = [f[0]]
        for i in range(1, D3Q19.Q):
            direct = _pull_ext(f_ext[i], _E[i], shard_axis, nloc)
            pulled.append(jnp.where(nbr_wall[i], f[_OPP[i]], direct))
        pulled = jnp.stack(pulled)
        for bc, arrs in zip(cc.bcs, bc_data):
            pulled = apply_bc_fixup(pulled, f, dataclasses.replace(bc, **arrs), t)
        rho = jnp.sum(pulled, axis=0)
        mom = jnp.tensordot(
            jnp.asarray(_EF.T), pulled, axes=([1], [0]),
            precision=jax.lax.Precision.HIGHEST,
        )
        u = mom / jnp.where(rho == 0, 1.0, rho)[None]
        f_eq = rho[None] * phi(u)
        f_post = pulled - (pulled - f_eq) * inv_tau
        f_new = jnp.where(fluid[None], f_post, f)
        return f_new, rho, u

    def sspec(leading):
        s = [None] * (leading + 3)
        s[leading + shard_axis] = axis_name
        return P(*s)

    fspec = sspec(1)
    shard_step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(fspec, fspec, sspec(0), P(), bc_specs),
        out_specs=(fspec, sspec(0), sspec(1)),
    )

    def step(f, t):
        return shard_step(f, cc.nbr_wall, cc.fluid, t, bc_arrays)

    return step


__all__ = ["make_halo_step"]
