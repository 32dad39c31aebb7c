"""Checkpoint / resume — a capability the reference lacks entirely
(SURVEY.md section 5: "a crashed run restarts from step 0"; pdfs are never
saved). State = (f, t, convergence window) plus case identity; npz on
disk, via a temp-file rename for crash atomicity.

Two on-disk layouts:
  - portable (default): the unpadded (19, nx, ny, nz) f — transfers
    between backends (xla <-> pallas <-> sparse) and shardings;
  - packed (512^3-class lowmem runs): the padded packed (X, Y, C, Z)
    state verbatim, because building the portable layout would go
    through the dense unpack. Restore accepts either: a packed
    checkpoint restores directly into a matching lowmem Simulation, or
    is cropped to the portable layout ON THE HOST for any other target
    (the packed layout is self-describing via the `layout` meta).
"""

from __future__ import annotations

import json
import os

import numpy as np


def save(path: str, f, t: int, case_name: str, meta: dict | None = None,
         compressed: bool = True) -> None:
    tmp = path + ".tmp"
    saver = np.savez_compressed if compressed else np.savez
    saver(
        tmp,
        f=np.asarray(f),
        t=np.int64(t),
        case=np.bytes_(case_name.encode()),
        meta=np.bytes_(json.dumps(meta or {}).encode()),
    )
    # np.savez appends .npz to names lacking it.
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)


def save_sim(path: str, sim, meta: dict | None = None) -> None:
    """Checkpoint a Simulation including its convergence state, so the
    first post-resume residual is computed against the pre-crash window
    instead of from scratch (a resumed run must not report a spurious
    'converged' or reset residual)."""
    m = dict(meta or {})
    m["conv"] = {
        "last_velsum": sim._last_velsum,
        "last_usq": sim._last_usq,
    }
    if getattr(sim, "wk", None) is not None:
        # windkessel per-outlet P_c carry (spec.PlaneBC.windkessel)
        m["wk"] = [float(v) for v in np.asarray(sim.wk)]
    if getattr(sim, "_lowmem", False) and sim.mesh is None:
        # 512^3-class: save the packed state verbatim (the portable
        # layout would cost a second full-state device pass; compression
        # of ~13 GB of fp32 pdfs is minutes of host CPU for ~nothing).
        m["layout"] = {
            "packed": True,
            "ring": int(sim._ring),
            "padded_shape": [int(s) for s in sim._padded_spec.shape],
            "dtype": str(np.dtype(sim._store_dtype)),
        }
        save(path, np.asarray(sim.f), sim.t, sim.spec.name, m,
             compressed=False)
        return
    save(path, sim.f_standard(), sim.t, sim.spec.name, m)


def load(path: str):
    with np.load(path) as data:
        f = data["f"]
        t = int(data["t"])
        case = bytes(data["case"]).decode()
        meta = json.loads(bytes(data["meta"]).decode())
    return f, t, case, meta


def restore(sim, path: str) -> None:
    """Restore a Simulation in place, verifying case identity.

    Portable checkpoints hold the unpadded (19, nx, ny, nz) layout and
    restore into any backend/sharding. Packed checkpoints (lowmem runs)
    restore zero-copy into a matching lowmem pallas Simulation, or are
    host-cropped to the portable layout for anything else.
    """
    f, t, case, meta = load(path)
    if case != sim.spec.name:
        raise ValueError(
            f"checkpoint is for case {case!r}, simulation is {sim.spec.name!r}"
        )
    lay = meta.get("layout") or {}
    if lay.get("packed"):
        ring = int(lay["ring"])
        same = (
            sim.backend == "pallas"
            and sim.mesh is None
            and getattr(sim, "_lowmem", False)
            and [int(s) for s in sim._padded_spec.shape]
            == list(lay["padded_shape"])
            and int(sim._ring) == ring
            and str(np.dtype(sim._store_dtype)) == lay["dtype"]
        )
        if same:
            import jax

            old, sim.f = sim.f, None
            if old is not None:
                try:
                    old.delete()
                except Exception:
                    pass
            sim.f = jax.device_put(f)
        else:
            nx, ny, nz = sim.spec.shape
            f = np.ascontiguousarray(
                f.transpose(2, 0, 1, 3)[:19, ring : ring + nx,
                                        ring : ring + ny, :nz]
            ).astype(np.float32)
            sim.set_f_standard(f)
    else:
        if f.shape != (19,) + tuple(sim.spec.shape):
            raise ValueError(
                f"checkpoint shape {f.shape} != case {sim.spec.shape}")
        sim.set_f_standard(f)
    sim.t = t
    conv = meta.get("conv", {})
    sim._last_velsum = conv.get("last_velsum")
    sim._last_usq = conv.get("last_usq")
    if meta.get("wk") is not None:
        if getattr(sim, "wk", None) is None:
            raise ValueError(
                "checkpoint carries windkessel state but the target "
                "case has no windkessel outlets"
            )
        import jax.numpy as jnp

        sim.wk = jnp.asarray(meta["wk"], jnp.float32)


__all__ = ["save", "save_sim", "load", "restore"]
