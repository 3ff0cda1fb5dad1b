"""AMR tagging criteria (reference ``src/refinement/gradient.cpp`` and
``other.cpp``): per-block refine/same/derefine decisions from prim fields.

Tags: +1 refine, 0 same, -1 derefine (the reference's ``AmrTag``).
All criteria are vectorized over the block axis — one reduction per block.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.indices import IDN, IV1, IV2, IPR


@dataclasses.dataclass(frozen=True)
class RefinementConfig:
    method: str = "none"   # pressure_gradient | xyvelocity_gradient | maxdensity
    threshold_pressure_gradient: float = 0.0
    threshold_xyvelocity_gradient: float = 0.0
    maxdensity_refine_above: float = 0.0
    maxdensity_deref_below: float = 0.0

    @classmethod
    def from_parameter_input(cls, pin):
        if not pin.has("refinement", "type"):
            return cls()
        method = pin.get_string("refinement", "type")
        kw = dict(method=method)
        if method == "pressure_gradient":
            kw["threshold_pressure_gradient"] = pin.get_real(
                "refinement", "threshold_pressure_gradient")
        elif method == "xyvelocity_gradient":
            kw["threshold_xyvelocity_gradient"] = pin.get_real(
                "refinement", "threshold_xyvelocity_gradient")
        elif method == "maxdensity":
            kw["maxdensity_refine_above"] = pin.get_real(
                "refinement", "maxdensity_refine_above")
            kw["maxdensity_deref_below"] = pin.get_real(
                "refinement", "maxdensity_deref_below")
        elif method != "none":
            raise ValueError(f"unknown refinement type '{method}'")
        return cls(**kw)


def _interior_p1(mesh):
    """Interior extended by one cell (the criteria sample +-1 rings)."""
    ks, ke, js, je, is_, ie = mesh.interior
    return (slice(None), slice(max(ks - 1, 0), ke + 2),
            slice(max(js - 1, 0), je + 2), slice(is_ - 1, ie + 2))


def pressure_gradient(prim, mesh, threshold):
    """max |grad P| / P per block (``gradient.cpp:18-61``)."""
    p = prim[:, IPR]
    dpx = 0.5 * (jnp.roll(p, -1, -1) - jnp.roll(p, 1, -1))
    eps2 = dpx ** 2
    if mesh.nx2 > 1:
        eps2 = eps2 + (0.5 * (jnp.roll(p, -1, -2) - jnp.roll(p, 1, -2))) ** 2
    if mesh.nx3 > 1:
        eps2 = eps2 + (0.5 * (jnp.roll(p, -1, -3) - jnp.roll(p, 1, -3))) ** 2
    eps = jnp.sqrt(eps2) / p
    maxeps = jnp.max(eps[_interior_p1(mesh)], axis=(1, 2, 3))
    return jnp.where(maxeps > threshold, 1,
                     jnp.where(maxeps < 0.25 * threshold, -1, 0))


def xyvelocity_gradient(prim, mesh, threshold):
    """max sqrt((d_x v2)^2 + (d_y v1)^2) per block (``gradient.cpp:64``)."""
    v1 = prim[:, IV1]
    v2 = prim[:, IV2]
    vgy = jnp.abs(jnp.roll(v2, -1, -1) - jnp.roll(v2, 1, -1)) * 0.5
    vgx = jnp.abs(jnp.roll(v1, -1, -2) - jnp.roll(v1, 1, -2)) * 0.5
    vg = jnp.sqrt(vgx ** 2 + vgy ** 2)
    ks, ke, js, je, is_, ie = mesh.interior
    sel = (slice(None), slice(ks, ke + 1),
           slice(max(js - 1, 0), je + 2), slice(is_ - 1, ie + 2))
    vgmax = jnp.max(vg[sel], axis=(1, 2, 3))
    return jnp.where(vgmax > threshold, 1,
                     jnp.where(vgmax < 0.5 * threshold, -1, 0))


def maxdensity(prim, mesh, refine_above, deref_below):
    """max rho per block within [deref, refine] bands (``other.cpp:18``)."""
    sl = mesh.interior_slices
    rho = prim[:, IDN][tuple([sl[0]] + list(sl[2:]))]
    maxrho = jnp.max(rho, axis=(1, 2, 3))
    return jnp.where(maxrho > refine_above, 1,
                     jnp.where(maxrho < deref_below, -1, 0))


def check_refinement(cfg: RefinementConfig, prim, mesh):
    """-> [nblocks] int tags; 0s when no criterion is configured."""
    if cfg.method == "pressure_gradient":
        return pressure_gradient(prim, mesh,
                                 cfg.threshold_pressure_gradient)
    if cfg.method == "xyvelocity_gradient":
        return xyvelocity_gradient(prim, mesh,
                                   cfg.threshold_xyvelocity_gradient)
    if cfg.method == "maxdensity":
        return maxdensity(prim, mesh, cfg.maxdensity_refine_above,
                          cfg.maxdensity_deref_below)
    return jnp.zeros(prim.shape[0], dtype=jnp.int32)
