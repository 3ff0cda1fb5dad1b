"""Pallas fused lane-sweep flux divergence (ghost-free periodic path).

The ghost-free periodic layout (one mesh-spanning block, cyclic rolls as
the boundary condition) lets each directional sweep be phrased as a
LANE-dimension stencil: tile the two leading spatial axes over the grid,
keep the full sweep axis (= the minormost, lane axis) in VMEM, and do
recon + Riemann + flux divergence for that direction in one pass.
Cyclic lane rolls inside the tile ARE the periodic boundary — no halo
DMAs at all.  This is the TPU answer to the reference's scratch-pencil
``par_for_outer`` pattern (``src/hydro/hydro.cpp:1070-1098``): the
pencil is a (tz, ty, n) VMEM slab, and the ~6 array-sized intermediates
per direction (edge states, face states, fluxes) that the XLA
whole-array formulation writes to HBM never leave VMEM.

The y and z sweeps reuse the SAME kernel on transposed data: the
Riemann solver's direction argument ``d`` only selects the normal
momentum/field components (elementwise), so a z-sweep is a lane-sweep
with ``d=3`` on an array whose minor axis is z.  Two 600 MB transposes
per direction are ~2 HBM passes against the ~20 the kernel saves.

The kernel body reuses the exact jnp reconstruction / Riemann code of
the XLA path (pure shifted-array expressions), so the two paths are
numerically identical (tested bitwise in interpret mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..recon import reconstruct
from ..riemann import solve_riemann


def make_lane_sweep_negdiv(cfg, eos, positivity_mask, recon: str, d: int,
                           dx: float, tz: int = 1, ty: int = 32,
                           interpret: bool = False):
    """Build ``fn(q, c_h) -> -dF_d/dx_d`` for a lane-axis sweep.

    ``q``: [nb, nvar, A, B, n] with the SWEEP axis last (periodic);
    ``d``: physical direction (1/2/3) for the Riemann solver's normal
    component selection — independent of the memory layout.
    """
    nvar = cfg.nvar

    def kernel(c_h_ref, prim_ref, out_ref):
        q = prim_ref[...]                     # [1, nvar, tz, ty, n]
        c_h = c_h_ref[0]
        qm, qp = reconstruct(recon, q, -1, dx,
                             positivity_mask=positivity_mask)
        wl = jnp.roll(qp, 1, axis=-1)         # right edge of cell i-1
        F = solve_riemann(cfg.riemann, cfg.fluid, eos, wl, qm, d,
                          c_h=c_h, nscalars=cfg.nscalars)
        out_ref[...] = -(jnp.roll(F, -1, axis=-1) - F) / dx

    def negdiv(q, c_h):
        nb, _, A, B, n = q.shape
        assert A % tz == 0 and B % ty == 0, (A, B, tz, ty)
        c_h_arr = jnp.reshape(jnp.asarray(c_h, q.dtype), (1,))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, A // tz, B // ty),
            in_specs=[pl.BlockSpec((1, nvar, tz, ty, n),
                                   lambda b, i, j, c: (b, 0, i, j, 0))],
            out_specs=pl.BlockSpec((1, nvar, tz, ty, n),
                                   lambda b, i, j, c: (b, 0, i, j, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            interpret=interpret,
        )(c_h_arr, q)

    return negdiv


def make_lane_sweep_negdiv_faces(cfg, eos, positivity_mask, recon: str,
                                 d: int, dx: float, g: int, n_int: int,
                                 tz: int = 1, ty: int = 32,
                                 interpret: bool = False):
    """Correction-aware variant: ``fn(q, c_h) -> (negdiv, faces)``.

    ``faces[..., 0]`` / ``faces[..., 1]`` are the Riemann fluxes at the
    block-interior boundary faces of the sweep axis (lane indices ``g``
    and ``g + n_int``, co-indexed face i = i-1/2) — exactly the values
    the coarse-fine flux correction needs (``amr/smr_hydro.py``
    ``_flux_correct``; reference ``Load/Send/ReceiveFluxCorrections``).
    Emitting two lane slices costs ~2/n of the kernel's output traffic,
    against re-materializing ALL face fluxes in HBM (the whole point of
    the fusion).
    """
    nvar = cfg.nvar

    def kernel(c_h_ref, prim_ref, out_ref, faces_ref):
        q = prim_ref[...]                     # [1, nvar, tz, ty, n]
        c_h = c_h_ref[0]
        qm, qp = reconstruct(recon, q, -1, dx,
                             positivity_mask=positivity_mask)
        wl = jnp.roll(qp, 1, axis=-1)         # right edge of cell i-1
        F = solve_riemann(cfg.riemann, cfg.fluid, eos, wl, qm, d,
                          c_h=c_h, nscalars=cfg.nscalars)
        out_ref[...] = -(jnp.roll(F, -1, axis=-1) - F) / dx
        faces_ref[...] = jnp.stack([F[..., g], F[..., g + n_int]], axis=-1)

    def negdiv_faces(q, c_h):
        nb, _, A, B, n = q.shape
        assert A % tz == 0 and B % ty == 0, (A, B, tz, ty)
        c_h_arr = jnp.reshape(jnp.asarray(c_h, q.dtype), (1,))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, A // tz, B // ty),
            in_specs=[pl.BlockSpec((1, nvar, tz, ty, n),
                                   lambda b, i, j, c: (b, 0, i, j, 0))],
            out_specs=(pl.BlockSpec((1, nvar, tz, ty, n),
                                    lambda b, i, j, c: (b, 0, i, j, 0)),
                       pl.BlockSpec((1, nvar, tz, ty, 2),
                                    lambda b, i, j, c: (b, 0, i, j, 0))),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                       jax.ShapeDtypeStruct((nb, nvar, A, B, 2), q.dtype)),
            interpret=interpret,
        )(c_h_arr, q)

    return negdiv_faces


def _pick_tile(extent: int, want: int) -> int:
    """Largest divisor of ``extent`` that is <= ``want``."""
    for t in range(min(want, extent), 0, -1):
        if extent % t == 0:
            return t
    return 1


def make_fused_negdiv_faces(block_shape, dx, cfg, eos, positivity_mask,
                            recon: str, g: int, tz: int = 1, ty: int = 32,
                            interpret: bool = False):
    """fn(prim, c_h) -> (negdiv, {d: faces}) over all three directions
    for the ghosted refined-mesh layout (block shape + per-level dx).

    ``faces[d]`` has shape [nb, nvar, A, B, 2] with the transverse axes
    in original array order (d=1 -> (NZ, NY); d=2 -> (NZ, NX);
    d=3 -> (NY, NX)); [..., 0] is the flux at the lo interior boundary
    face (lane g) and [..., 1] at the hi face (lane g + n_int) — the
    inputs to the coarse-fine flux correction."""
    NZ, NY, NX = block_shape
    mk = lambda d, dxd, nint, a, b: make_lane_sweep_negdiv_faces(  # noqa: E731
        cfg, eos, positivity_mask, recon, d, dxd, g, nint,
        _pick_tile(a, tz), _pick_tile(b, ty), interpret)
    sweeps = [
        # x: lanes already minormost; faces canonical (z, y)
        (1, None, None, mk(1, dx[0], NX - 2 * g, NZ, NY)),
        # y: swap (y, x); faces come back as (z, x) — canonical
        (2, (0, 1, 2, 4, 3), None, mk(2, dx[1], NY - 2 * g, NZ, NX)),
        # z: swap (z, x); faces come back as (x, y) -> swap to (y, x)
        (3, (0, 1, 4, 3, 2), (0, 1, 3, 2, 4), mk(3, dx[2], NZ - 2 * g,
                                                 NX, NY)),
    ]

    def negdiv_faces(prim, c_h):
        out = None
        slabs = {}
        for d, perm, fperm, sweep in sweeps:
            q = prim if perm is None else jnp.transpose(prim, perm)
            r, f = sweep(q, c_h)
            if perm is not None:
                r = jnp.transpose(r, perm)
            if fperm is not None:
                f = jnp.transpose(f, fperm)
            slabs[d] = f
            out = r if out is None else out + r
        return out, slabs

    return negdiv_faces


def make_fused_negdiv(mesh, cfg, eos, positivity_mask, recon: str,
                      tz: int = 1, ty: int = 32, interpret: bool = False):
    """fn(prim, c_h) -> -div(F) over all active directions.

    Works on BOTH layouts: ghost-free periodic (cyclic lane rolls are
    the BC) and ghosted multi-block (the roll wrap-around garbage lands
    in the ghost rim, exactly like the XLA roll-based path; the caller's
    boundary fill overwrites it).  Tile sizes snap down to divisors of
    the per-block extents."""
    NZ, NY, NX = mesh.block_shape
    sweeps = []
    # x: lanes already minormost; grid tiles (z, y)
    sweeps.append((1, None,
                   make_lane_sweep_negdiv(cfg, eos, positivity_mask, recon,
                                          1, mesh.dx1, _pick_tile(NZ, tz),
                                          _pick_tile(NY, ty), interpret)))
    if mesh.nx2 > 1:
        # y: swap (y, x) -> minor axis y; grid tiles (z, x)
        sweeps.append((2, (0, 1, 2, 4, 3),
                       make_lane_sweep_negdiv(cfg, eos, positivity_mask,
                                              recon, 2, mesh.dx2,
                                              _pick_tile(NZ, tz),
                                              _pick_tile(NX, ty),
                                              interpret)))
    if mesh.nx3 > 1:
        # z: swap (z, x) -> minor axis z; grid tiles (x, y)
        sweeps.append((3, (0, 1, 4, 3, 2),
                       make_lane_sweep_negdiv(cfg, eos, positivity_mask,
                                              recon, 3, mesh.dx3,
                                              _pick_tile(NX, tz),
                                              _pick_tile(NY, ty),
                                              interpret)))

    def negdiv(prim, c_h):
        out = None
        for _, perm, sweep in sweeps:
            q = prim if perm is None else jnp.transpose(prim, perm)
            r = sweep(q, c_h)
            if perm is not None:
                r = jnp.transpose(r, perm)
            out = r if out is None else out + r
        return out

    return negdiv
