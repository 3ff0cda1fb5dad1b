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
            compiler_params=_compiler_params(),
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
            compiler_params=_compiler_params(),
        )(c_h_arr, q)

    return negdiv_faces


# --------------------------------------------------------------------- v2
# Transpose-free multi-axis sweeps.  The v1 kernels above keep the sweep
# axis on the LANES and transpose the array for y/z — two full HBM
# passes per transposed direction.  The v2 design keeps the array in its
# canonical [nb, nvar, NZ, NY, NX] layout for every direction:
#
#   * x: lane-axis stencil on the full-NX tile (as v1),
#   * y: SUBLANE-axis stencil on a halo-extended (tz, ty+2h, NX) slab,
#   * z: leading-axis stencil on a halo-extended (tz+2h, ty, NX) slab,
#
# where the thin y/z halo slabs are gathered by XLA before the call
# (2h/t of an HBM pass each) instead of transposing whole arrays.
# ``make_fused_stage`` goes one step further and performs the entire 2S
# integrator stage — cons->prim (with floors), all three sweeps, and the
# stage axpy — in ONE kernel: HBM traffic per stage drops to ~1 read of
# u0 (+halo fraction), 1 read of u1, 1 write of u_new, against ~20
# array-sized passes for the unfused XLA formulation.  This is the
# speed-of-light shape for the reference's ``CalculateFluxes`` +
# ``UpdateWithFluxDivergence`` chain (``src/hydro/hydro.cpp:1026-1208``,
# Parthenon ``update.cpp``) on a bandwidth-bound TPU.


def _halo_slabs(q, t, h, axis):
    """[..] -> per-tile halo slab along ``axis`` (2 or 3 of a 5-D array):
    returns an array with a new tile axis at ``axis`` and a 2h halo axis
    after it: planes [i*t-h, i*t) ++ [(i+1)*t, (i+1)*t+h) (periodic).

    Each roll+reshape yields at most ``t`` contiguous planes per tile,
    so when ``t < h`` the halo is assembled from ``ceil(h/t)`` chunks
    (a single truncated roll would silently return a short slab and
    Pallas would pad the block reads with garbage)."""
    n = q.shape[axis]
    nb_t = n // t
    lead = q.shape[:axis]
    trail = q.shape[axis + 1:]

    def tile_planes(shift, k):
        # planes [i*t + shift, i*t + shift + k) of each tile (periodic)
        r = jnp.roll(q, -shift, axis=axis).reshape(lead + (nb_t, t) + trail)
        sl = (slice(None),) * (axis + 1) + (slice(0, k),)
        return r[sl]

    parts = []
    off = -h
    while off < 0:                       # lo halo [i*t-h, i*t)
        k = min(t, -off)
        parts.append(tile_planes(off, k))
        off += k
    off = t
    while off < t + h:                   # hi halo [(i+1)*t, (i+1)*t+h)
        k = min(t, t + h - off)
        parts.append(tile_planes(off, k))
        off += k
    return jnp.concatenate(parts, axis=axis + 1)


def _negdiv_slab(cfg, eos, positivity_mask, recon, d, dx, c_h, slab, axis,
                 h, t):
    """recon+Riemann+divergence along ``axis`` of a halo-extended slab;
    returns the valid middle ``t`` entries of that axis."""
    qm, qp = reconstruct(recon, slab, axis, dx,
                         positivity_mask=positivity_mask)
    wl = jnp.roll(qp, 1, axis=axis)
    F = solve_riemann(cfg.riemann, cfg.fluid, eos, wl, qm, d,
                      c_h=c_h, nscalars=cfg.nscalars)
    nd = -(jnp.roll(F, -1, axis=axis) - F) / dx
    if h == 0:
        return nd
    sl = [slice(None)] * nd.ndim
    sl[axis] = slice(h, h + t)
    return nd[tuple(sl)]


def make_fused_stage(mesh, cfg, eos, positivity_mask, recon: str,
                     tz: int = 8, ty: int = 8, interpret: bool = False,
                     emit_dt: bool = False, emit_prim: bool = False):
    """Whole-stage kernel for 3-D layouts:
    ``fn(u0, u1, gam0, gam1, beta_dt, c_h) -> u_new`` computing

        u0f, prim = cons_to_prim(u0)            (floors applied)
        u_new = gam0*u0f + gam1*u1 + beta_dt * (-div F(prim))

    identically to the XLA path, in one HBM pass.  y and z stencils run
    on halo-extended slabs in canonical layout (no transposes); x is
    the lane stencil.  On the ghost-free periodic layout the cyclic
    wrap IS the boundary condition; on ghosted multi-block layouts the
    wrap garbage lands in the ghost rim and the caller's boundary fill
    overwrites it (same contract as the XLA roll path).

    ``emit_dt`` (ghost-free only): additionally converts the freshly
    computed ``u_new`` tile to prim IN VMEM and emits the per-tile raw
    hyperbolic CFL minimum ``min_d min(dx_d/(|v_d|+lam_d))`` — the last
    integrator stage then produces the next cycle's dt without the
    separate cons->prim + reduction HBM passes
    (``EstimateTimestep``, ``src/hydro/hydro.cpp:914-976``).

    ``emit_prim``: additionally writes the STAGE-START prim (of u0,
    floors applied) so prim-consuming epilogues (problem sources, the
    extended Dedner source) can run after the kernel without a separate
    cons->prim pass.  Output order: ``u_new[, raw_dt][, prim]``."""
    from ..core.indices import IDN, IPR
    from ..eos.adiabatic import cons_to_prim, fast_magnetosonic_speed
    from ..recon import nghost_for

    assert mesh.nx2 > 1 and mesh.nx3 > 1
    assert not emit_dt or mesh.nghost == 0  # dt needs interior == all
    NZ, NY, NX = mesh.block_shape
    nvar = cfg.nvar
    h = nghost_for(recon)
    ty = _pick_tile_sublane(NY, ty)
    tz = _fit_tz(NZ, tz, ty, NX, nvar, h)
    nzb, nyb = NZ // tz, NY // ty
    dx1, dx2, dx3 = mesh.dx1, mesh.dx2, mesh.dx3

    def c2p(u):
        return cons_to_prim(eos, u, cfg.fluid, cfg.nscalars)

    def kernel(sref, u0_ref, hz_ref, hy_ref, u1_ref, out_ref,
               *extra_refs):
        gam0, gam1, beta_dt, c_h = sref[0], sref[1], sref[2], sref[3]
        u0c = u0_ref[...]                 # (1, nvar, tz, ty, NX)
        hz = hz_ref[...][:, :, 0]         # (1, nvar, 2h, ty, NX)
        hy = hy_ref[...][:, :, :, 0]      # (1, nvar, tz, 2h, NX)
        u0f, prim = c2p(u0c)
        if emit_prim:
            extra_refs[-1][...] = prim
        _, pzlo = c2p(hz[:, :, :h])
        _, pzhi = c2p(hz[:, :, h:])
        _, pylo = c2p(hy[:, :, :, :h])
        _, pyhi = c2p(hy[:, :, :, h:])
        prim_z = jnp.concatenate([pzlo, prim, pzhi], axis=2)
        prim_y = jnp.concatenate([pylo, prim, pyhi], axis=3)
        args = (cfg, eos, positivity_mask, recon)
        nd = _negdiv_slab(*args, 1, dx1, c_h, prim, -1, 0, NX)
        nd = nd + _negdiv_slab(*args, 2, dx2, c_h, prim_y, -2, h, ty)
        nd = nd + _negdiv_slab(*args, 3, dx3, c_h, prim_z, -3, h, tz)
        u_new = gam0 * u0f + gam1 * u1_ref[...] + beta_dt * nd
        out_ref[...] = u_new
        if emit_dt:
            _, wn = c2p(u_new)
            rho, p = wn[:, IDN], wn[:, IPR]
            if cfg.fluid == "glmmhd":
                from ..core.indices import IB1, IB2, IB3
                b1, b2, b3 = wn[:, IB1], wn[:, IB2], wn[:, IB3]
                lams = (fast_magnetosonic_speed(eos, rho, p, b1, b2, b3),
                        fast_magnetosonic_speed(eos, rho, p, b2, b3, b1),
                        fast_magnetosonic_speed(eos, rho, p, b3, b1, b2))
            else:
                cs = jnp.sqrt(eos.gamma * p / rho)
                lams = (cs, cs, cs)
            m = jnp.asarray(jnp.inf, u_new.dtype)
            for d, dxd in ((1, dx1), (2, dx2), (3, dx3)):
                m = jnp.minimum(m, jnp.min(
                    dxd / (jnp.abs(wn[:, d]) + lams[d - 1])))
            # Mosaic needs (8, 128)-aligned trailing dims on every block:
            # broadcast the scalar minimum over one aligned tile (the
            # caller reduces with jnp.min, so the padding is free).
            extra_refs[0][...] = jnp.broadcast_to(m, (1, 1, 1, 8, 128))

    def stage(u0, u1, gam0, gam1, beta_dt, c_h):
        nb = u0.shape[0]
        dt_ = u0.dtype
        s = jnp.stack([jnp.asarray(gam0, dt_), jnp.asarray(gam1, dt_),
                       jnp.asarray(beta_dt, dt_), jnp.asarray(c_h, dt_)])
        hz = _halo_slabs(u0, tz, h, 2)   # [nb, nvar, nzb, 2h, NY, NX]
        hy = _halo_slabs(u0, ty, h, 3)   # [nb, nvar, NZ, nyb, 2h, NX]
        tile = pl.BlockSpec((1, nvar, tz, ty, NX),
                            lambda b, i, j, c: (b, 0, i, j, 0))
        out_specs = [tile]
        out_shape = [jax.ShapeDtypeStruct(u0.shape, dt_)]
        if emit_dt:
            out_specs.append(pl.BlockSpec(
                (1, 1, 1, 8, 128), lambda b, i, j, c: (b, i, j, 0, 0)))
            out_shape.append(
                jax.ShapeDtypeStruct((nb, nzb, nyb, 8, 128), dt_))
        if emit_prim:
            out_specs.append(tile)
            out_shape.append(jax.ShapeDtypeStruct(u0.shape, dt_))
        if len(out_specs) == 1:
            out_specs, out_shape = out_specs[0], out_shape[0]
        else:
            out_specs, out_shape = tuple(out_specs), tuple(out_shape)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, nzb, nyb),
            in_specs=[
                pl.BlockSpec((1, nvar, tz, ty, NX),
                             lambda b, i, j, c: (b, 0, i, j, 0)),
                pl.BlockSpec((1, nvar, 1, 2 * h, ty, NX),
                             lambda b, i, j, c: (b, 0, i, 0, j, 0)),
                pl.BlockSpec((1, nvar, tz, 1, 2 * h, NX),
                             lambda b, i, j, c: (b, 0, i, j, 0, 0)),
                pl.BlockSpec((1, nvar, tz, ty, NX),
                             lambda b, i, j, c: (b, 0, i, j, 0)),
            ],
            out_specs=out_specs,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(s, u0, hz, hy, u1)

    return stage


def make_fused_negdiv_v2(mesh, cfg, eos, positivity_mask, recon: str,
                         tz: int = 8, ty: int = 8,
                         interpret: bool = False):
    """Transpose-free ``fn(prim, c_h) -> -div(F)`` for 1-D/2-D/3-D
    layouts (both ghost-free periodic and ghosted multi-block: the wrap
    garbage lands in the ghost rim exactly like the XLA roll path).
    Same sweeps as ``make_fused_stage`` but prim-in / negdiv-out, for
    decks that need prim or the raw update elsewhere (FOFC rescue
    operand, Strang sources).  Inactive dimensions (extent 1) skip
    their sweep."""
    from ..recon import nghost_for

    NZ, NY, NX = mesh.block_shape
    nvar = cfg.nvar
    h = nghost_for(recon)
    do_y = mesh.nx2 > 1
    do_z = mesh.nx3 > 1
    ty = _pick_tile_sublane(NY, ty) if do_y else 1
    tz = _fit_tz(NZ, tz, ty, NX, nvar, h) if do_z else 1
    nzb, nyb = NZ // tz, NY // ty
    dx1, dx2, dx3 = mesh.dx1, mesh.dx2, mesh.dx3

    def kernel(c_h_ref, p_ref, *refs):
        c_h = c_h_ref[0]
        prim = p_ref[...]                 # (1, nvar, tz, ty, NX)
        refs = list(refs)
        hz = refs.pop(0)[...][:, :, 0] if do_z else None
        hy = refs.pop(0)[...][:, :, :, 0] if do_y else None
        out_ref = refs.pop(0)
        args = (cfg, eos, positivity_mask, recon)
        nd = _negdiv_slab(*args, 1, dx1, c_h, prim, -1, 0, NX)
        if do_y:
            prim_y = jnp.concatenate(
                [hy[:, :, :, :h], prim, hy[:, :, :, h:]], axis=3)
            nd = nd + _negdiv_slab(*args, 2, dx2, c_h, prim_y, -2, h, ty)
        if do_z:
            prim_z = jnp.concatenate(
                [hz[:, :, :h], prim, hz[:, :, h:]], axis=2)
            nd = nd + _negdiv_slab(*args, 3, dx3, c_h, prim_z, -3, h, tz)
        out_ref[...] = nd

    def negdiv(prim, c_h):
        nb = prim.shape[0]
        c_h_arr = jnp.reshape(jnp.asarray(c_h, prim.dtype), (1,))
        in_specs = [pl.BlockSpec((1, nvar, tz, ty, NX),
                                 lambda b, i, j, c: (b, 0, i, j, 0))]
        operands = [prim]
        if do_z:
            operands.append(_halo_slabs(prim, tz, h, 2))
            in_specs.append(pl.BlockSpec((1, nvar, 1, 2 * h, ty, NX),
                                         lambda b, i, j, c:
                                         (b, 0, i, 0, j, 0)))
        if do_y:
            operands.append(_halo_slabs(prim, ty, h, 3))
            in_specs.append(pl.BlockSpec((1, nvar, tz, 1, 2 * h, NX),
                                         lambda b, i, j, c:
                                         (b, 0, i, j, 0, 0)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, nzb, nyb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, nvar, tz, ty, NX),
                                   lambda b, i, j, c: (b, 0, i, j, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(prim.shape, prim.dtype),
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(c_h_arr, *operands)

    return negdiv


def make_fused_negdiv_faces_v2(block_shape, dx, cfg, eos, positivity_mask,
                               recon: str, g: int, tz: int = 8,
                               ty: int = 8, interpret: bool = False):
    """Transpose-free correction-aware sweeps for ghosted 3-D blocks:
    ``fn(prim, c_h) -> (negdiv, {d: faces})`` with ``faces[d]`` of
    shape [nb, nvar, A, B, 2] — the Riemann fluxes at the block-interior
    boundary faces (sweep index ``g`` and ``g + n_int``), exactly the
    v1 ``make_fused_negdiv_faces`` contract that feeds the coarse-fine
    flux correction (``amr/smr_hydro._slab_flux_correct``).

    Face capture without transposes or dynamic slicing: the face plane
    at global sweep index G lives in tile ``G // t`` at STATIC local
    slab index ``h + G % t``, so every tile writes its candidate planes
    and the XLA epilogue keeps only the owner tiles' blocks."""
    from ..recon import nghost_for

    NZ, NY, NX = block_shape
    nvar = cfg.nvar
    h = nghost_for(recon)
    ty = _pick_tile_sublane(NY, ty)
    dx1, dx2, dx3 = dx[0], dx[1], dx[2]
    nxi, nyi, nzi = NX - 2 * g, NY - 2 * g, NZ - 2 * g
    # owner tiles + static local slab indices of the lo/hi face planes
    ylo_t, ylo_i = g // ty, h + g % ty
    yhi_t, yhi_i = (g + nyi) // ty, h + (g + nyi) % ty

    def _sweep(slab, axis, d, dxd, c_h):
        qm, qp = reconstruct(recon, slab, axis, dxd,
                             positivity_mask=positivity_mask)
        wl = jnp.roll(qp, 1, axis=axis)
        F = solve_riemann(cfg.riemann, cfg.fluid, eos, wl, qm, d,
                          c_h=c_h, nscalars=cfg.nscalars)
        return F, -(jnp.roll(F, -1, axis=axis) - F) / dxd

    if NZ == 1:
        # ------------------------------- 2-D variant (VERDICT r4 weak
        # 6): x on the lanes, y as a sublane halo slab; no z sweep, no
        # z faces.  Serves 2-D refined meshes (1-D SMR stays on XLA —
        # a lane sweep alone doesn't pay for a kernel there).
        def kernel2(c_h_ref, p_ref, hy_ref, out_ref, fx_ref, fy_ref):
            c_h = c_h_ref[0]
            prim = p_ref[...]                 # (1, nvar, 1, ty, NX)
            hy = hy_ref[...][:, :, :, 0]      # (1, nvar, 1, 2h, NX)
            prim_y = jnp.concatenate(
                [hy[:, :, :, :h], prim, hy[:, :, :, h:]], axis=3)
            Fx, nd = _sweep(prim, -1, 1, dx1, c_h)
            Fy, ndy = _sweep(prim_y, -2, 2, dx2, c_h)
            out_ref[...] = nd + ndy[:, :, :, h:h + ty]
            fx_ref[...] = jnp.stack([Fx[..., g], Fx[..., g + nxi]],
                                    axis=-1)
            # (1, nvar, 1, 2, NX) -> (1, nvar, 1, 1, 2, NX)
            fy_ref[...] = jnp.stack(
                [Fy[:, :, :, ylo_i], Fy[:, :, :, yhi_i]],
                axis=3)[:, :, None]

        nyb2 = NY // ty

        def negdiv_faces_2d(prim, c_h):
            nb = prim.shape[0]
            c_h_arr = jnp.reshape(jnp.asarray(c_h, prim.dtype), (1,))
            hy = _halo_slabs(prim, ty, h, 3)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb, nyb2),
                in_specs=[
                    pl.BlockSpec((1, nvar, 1, ty, NX),
                                 lambda b, j, c: (b, 0, 0, j, 0)),
                    pl.BlockSpec((1, nvar, 1, 1, 2 * h, NX),
                                 lambda b, j, c: (b, 0, 0, j, 0, 0)),
                ],
                out_specs=(
                    pl.BlockSpec((1, nvar, 1, ty, NX),
                                 lambda b, j, c: (b, 0, 0, j, 0)),
                    pl.BlockSpec((1, nvar, 1, ty, 2),
                                 lambda b, j, c: (b, 0, 0, j, 0)),
                    # y candidates: tile axis LEADS (see 3-D note)
                    pl.BlockSpec((1, nvar, 1, 1, 2, NX),
                                 lambda b, j, c: (b, 0, j, 0, 0, 0)),
                ),
            )
            nd, fx, fy = pl.pallas_call(
                kernel2,
                grid_spec=grid_spec,
                out_shape=(
                    jax.ShapeDtypeStruct(prim.shape, prim.dtype),
                    jax.ShapeDtypeStruct((nb, nvar, 1, NY, 2),
                                         prim.dtype),
                    jax.ShapeDtypeStruct((nb, nvar, nyb2, 1, 2, NX),
                                         prim.dtype),
                ),
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT,
                    dimension_semantics=("parallel", "parallel")),
            )(c_h_arr, prim, hy)
            slab_y = jnp.stack([fy[:, :, ylo_t, :, 0],
                                fy[:, :, yhi_t, :, 1]],
                               axis=-1)        # [nb, nvar, 1, NX, 2]
            return nd, {1: fx, 2: slab_y}

        return negdiv_faces_2d

    tz = _fit_tz(NZ, tz, ty, NX, nvar, h)
    nzb, nyb = NZ // tz, NY // ty
    zlo_t, zlo_i = g // tz, h + g % tz
    zhi_t, zhi_i = (g + nzi) // tz, h + (g + nzi) % tz

    def kernel(c_h_ref, p_ref, hz_ref, hy_ref, out_ref, fx_ref, fy_ref,
               fz_ref):
        c_h = c_h_ref[0]
        prim = p_ref[...]                 # (1, nvar, tz, ty, NX)
        hz = hz_ref[...][:, :, 0]
        hy = hy_ref[...][:, :, :, 0]
        prim_z = jnp.concatenate([hz[:, :, :h], prim, hz[:, :, h:]],
                                 axis=2)
        prim_y = jnp.concatenate([hy[:, :, :, :h], prim, hy[:, :, :, h:]],
                                 axis=3)
        Fx, nd = _sweep(prim, -1, 1, dx1, c_h)
        Fy, ndy = _sweep(prim_y, -2, 2, dx2, c_h)
        Fz, ndz = _sweep(prim_z, -3, 3, dx3, c_h)
        out_ref[...] = (nd + ndy[:, :, :, h:h + ty]
                        + ndz[:, :, h:h + tz])
        fx_ref[...] = jnp.stack([Fx[..., g], Fx[..., g + nxi]], axis=-1)
        # (1, nvar, tz, 2, NX) -> (1, nvar, 1, tz, 2, NX)
        fy_ref[...] = jnp.stack([Fy[:, :, :, ylo_i], Fy[:, :, :, yhi_i]],
                                axis=3)[:, :, None]
        # (1, nvar, 2, ty, NX) -> (1, nvar, 1, 2, ty, NX)
        fz_ref[...] = jnp.stack([Fz[:, :, zlo_i], Fz[:, :, zhi_i]],
                                axis=2)[:, :, None]

    def negdiv_faces(prim, c_h):
        nb = prim.shape[0]
        c_h_arr = jnp.reshape(jnp.asarray(c_h, prim.dtype), (1,))
        hz = _halo_slabs(prim, tz, h, 2)
        hy = _halo_slabs(prim, ty, h, 3)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, nzb, nyb),
            in_specs=[
                pl.BlockSpec((1, nvar, tz, ty, NX),
                             lambda b, i, j, c: (b, 0, i, j, 0)),
                pl.BlockSpec((1, nvar, 1, 2 * h, ty, NX),
                             lambda b, i, j, c: (b, 0, i, 0, j, 0)),
                pl.BlockSpec((1, nvar, tz, 1, 2 * h, NX),
                             lambda b, i, j, c: (b, 0, i, j, 0, 0)),
            ],
            out_specs=(
                # negdiv
                pl.BlockSpec((1, nvar, tz, ty, NX),
                             lambda b, i, j, c: (b, 0, i, j, 0)),
                # x faces: every tile owns its (z, y) patch
                pl.BlockSpec((1, nvar, tz, ty, 2),
                             lambda b, i, j, c: (b, 0, i, j, 0)),
                # y candidates per (iz, jy): [nb, nvar, nyb, NZ,
                # 2, NX] — the tile axis LEADS (a 1-extent block dim in
                # the sublane slot would violate Mosaic's 8-alignment)
                pl.BlockSpec((1, nvar, 1, tz, 2, NX),
                             lambda b, i, j, c: (b, 0, j, i, 0, 0)),
                # z candidates per (iz, jy): [nb, nvar, nzb, 2, NY, NX]
                pl.BlockSpec((1, nvar, 1, 2, ty, NX),
                             lambda b, i, j, c: (b, 0, i, 0, j, 0)),
            ),
        )
        nd, fx, fy, fz = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(prim.shape, prim.dtype),
                jax.ShapeDtypeStruct((nb, nvar, NZ, NY, 2), prim.dtype),
                jax.ShapeDtypeStruct((nb, nvar, nyb, NZ, 2, NX),
                                     prim.dtype),
                jax.ShapeDtypeStruct((nb, nvar, nzb, 2, NY, NX),
                                     prim.dtype),
            ),
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(c_h_arr, prim, hz, hy)
        # keep only the owner tiles' candidate planes
        slab_y = jnp.stack([fy[:, :, ylo_t, :, 0], fy[:, :, yhi_t, :, 1]],
                           axis=-1)                 # [nb, nvar, NZ, NX, 2]
        slab_z = jnp.stack([fz[:, :, zlo_t, 0], fz[:, :, zhi_t, 1]],
                           axis=-1)                 # [nb, nvar, NY, NX, 2]
        return nd, {1: fx, 2: slab_y, 3: slab_z}

    return negdiv_faces


def _pick_pack_lanes(NX, NY, nvar, h, nb):
    """Lane-packing factor for the ghosted stage+faces kernel (VERDICT
    r3 item 1): concatenate k blocks' rows along the LANE axis so the
    128-lane quantum is better used.  Ghosted extents (NX = mb + 2g,
    e.g. 36) usually have NO k with k*NX an exact 128-multiple at sane
    k, so instead of demanding exactness (``_pick_pack``) this scores
    every k by lane utilization discounted by the row padding needed to
    make nb divisible by k, and keeps the best k whose minimal (tz=1)
    tile still fits the scoped-VMEM budget.  mb=32 g=2: k=7 puts 252 of
    256 lanes to work (98%) vs 36/128 (28%) unpacked.

    Packing requires h <= g (the caller gates): interior-face stencils
    then never cross a packed slot's NX span, so cross-slot leakage
    lands only in ghost-lane outputs the boundary fill overwrites."""
    if _os.environ.get("ATHENAPK_PALLAS_PACK", "1") != "1":
        return 1
    if NX % 128 == 0 or nb <= 1:
        return 1
    ty = _pick_tile_sublane(NY, 8)

    def score(k):
        nbp = -(-nb // k) * k
        return (k * NX) / _pad_lane(k * NX) * nb / nbp

    def fits(k):
        return _slab_bytes(nvar, 1 + 2 * h, ty + 2 * h,
                           k * NX) <= _VMEM_BUDGET

    best, best_s = 1, score(1)
    for k in range(2, min(nb, 16) + 1):
        s = score(k)
        if s > best_s and fits(k):
            best, best_s = k, s
    return best if best_s >= 1.25 * score(1) else 1


def make_fused_stage_faces(block_shape, dx, cfg, eos, positivity_mask,
                           recon: str, g: int, tz: int = 8, ty: int = 8,
                           interpret: bool = False,
                           emit_prim: bool = False):
    """Whole-stage + face-capture kernel for ghosted 3-D refined-mesh
    layouts: ``fn(u0, u1, gam0, gam1, beta_dt, c_h) ->
    (u_new, prim_or_None, {d: faces})``.

    Fuses cons->prim (with floors), the three transpose-free sweeps of
    ``make_fused_negdiv_faces_v2`` (boundary-face fluxes captured at
    static owner-tile indices for the coarse-fine correction), and the
    2S-integrator axpy ``u_new = gam0*u0f + gam1*u1 + beta_dt*negdiv``
    into ONE kernel — the refined-mesh analog of ``make_fused_stage``.
    The reference serves every mesh with the same scratch-pencil sweep +
    update chain (``src/hydro/hydro.cpp:1026-1208`` +
    ``UpdateWithFluxDivergence``); this is that chain in ~3 HBM passes.
    The caller applies the coarse-fine slab deltas directly to ``u_new``
    scaled by ``beta_dt`` (``SmrHydro._slab_flux_correct(scale=...)``) —
    algebraically identical to correcting the negdiv before the axpy.

    ``emit_prim`` additionally writes the tile's prim for decks whose
    problem sources consume it (e.g. the cluster package): one extra
    HBM write against the two full passes a separate XLA cons_to_prim
    would spend.
    """
    from ..eos.adiabatic import cons_to_prim as _c2p
    from ..recon import nghost_for

    NZ, NY, NX = block_shape
    nvar = cfg.nvar
    h = nghost_for(recon)
    ty = _pick_tile_sublane(NY, ty)
    tz_want = tz
    dx1, dx2, dx3 = dx[0], dx[1], dx[2]
    nxi, nyi, nzi = NX - 2 * g, NY - 2 * g, NZ - 2 * g

    def c2p(u):
        return _c2p(eos, u, cfg.fluid, cfg.nscalars)

    def _sweep(slab, axis, d, dxd, c_h):
        qm, qp = reconstruct(recon, slab, axis, dxd,
                             positivity_mask=positivity_mask)
        wl = jnp.roll(qp, 1, axis=axis)
        F = solve_riemann(cfg.riemann, cfg.fluid, eos, wl, qm, d,
                          c_h=c_h, nscalars=cfg.nscalars)
        return F, -(jnp.roll(F, -1, axis=axis) - F) / dxd

    def build(nb, k):
        """Kernel + pallas_call for a pack factor ``k`` (k blocks' rows
        concatenated along the LANE axis; ``nb`` is the packed row
        count nb_padded//k, lane width L = k*NX)."""
        L = k * NX
        tz = _fit_tz(NZ, tz_want, ty, L, nvar, h)
        nzb, nyb = NZ // tz, NY // ty
        ylo_t, ylo_i = g // ty, h + g % ty
        yhi_t, yhi_i = (g + nyi) // ty, h + (g + nyi) % ty
        zlo_t, zlo_i = g // tz, h + g % tz
        zhi_t, zhi_i = (g + nzi) // tz, h + (g + nzi) % tz

        def kernel(sref, u0_ref, hz_ref, hy_ref, u1_ref, out_ref, fx_ref,
                   fy_ref, fz_ref, *prim_refs):
            gam0, gam1, beta_dt, c_h = sref[0], sref[1], sref[2], sref[3]
            u0c = u0_ref[...]                 # (1, nvar, tz, ty, L)
            hz = hz_ref[...][:, :, 0]         # (1, nvar, 2h, ty, L)
            hy = hy_ref[...][:, :, :, 0]      # (1, nvar, tz, 2h, L)
            u0f, prim = c2p(u0c)
            _, pzlo = c2p(hz[:, :, :h])
            _, pzhi = c2p(hz[:, :, h:])
            _, pylo = c2p(hy[:, :, :, :h])
            _, pyhi = c2p(hy[:, :, :, h:])
            prim_z = jnp.concatenate([pzlo, prim, pzhi], axis=2)
            prim_y = jnp.concatenate([pylo, prim, pyhi], axis=3)
            # x-sweep stencil safety under packing: every interior face
            # F[g..g+nxi] of a packed slot reads lanes within its own
            # NX span when h <= g (qp[g-1] reaches lane g-h >= 0,
            # qm[g+nxi] reaches lane NX-1); the roll wrap / cross-slot
            # leakage lands only in ghost-lane outputs, which the
            # boundary fill overwrites — the unpacked kernel's contract.
            Fx, nd = _sweep(prim, -1, 1, dx1, c_h)
            Fy, ndy = _sweep(prim_y, -2, 2, dx2, c_h)
            Fz, ndz = _sweep(prim_z, -3, 3, dx3, c_h)
            nd = nd + ndy[:, :, :, h:h + ty] + ndz[:, :, h:h + tz]
            out_ref[...] = gam0 * u0f + gam1 * u1_ref[...] + beta_dt * nd
            cols = []
            for j in range(k):
                cols.append(Fx[..., j * NX + g])
                cols.append(Fx[..., j * NX + g + nxi])
            fx_ref[...] = jnp.stack(cols, axis=-1)
            # (1, nvar, tz, 2, L) -> (1, nvar, 1, tz, 2, L)
            fy_ref[...] = jnp.stack([Fy[:, :, :, ylo_i],
                                     Fy[:, :, :, yhi_i]],
                                    axis=3)[:, :, None]
            # (1, nvar, 2, ty, L) -> (1, nvar, 1, 2, ty, L)
            fz_ref[...] = jnp.stack([Fz[:, :, zlo_i], Fz[:, :, zhi_i]],
                                    axis=2)[:, :, None]
            if emit_prim:
                prim_refs[0][...] = prim

        def call(u0, u1, s):
            dt_ = u0.dtype
            hz = _halo_slabs(u0, tz, h, 2)
            hy = _halo_slabs(u0, ty, h, 3)
            tile = pl.BlockSpec((1, nvar, tz, ty, L),
                                lambda b, i, j, c: (b, 0, i, j, 0))
            out_specs = [
                tile,
                # x faces: every tile owns its (z, y) patch
                pl.BlockSpec((1, nvar, tz, ty, 2 * k),
                             lambda b, i, j, c: (b, 0, i, j, 0)),
                # y candidates per (iz, jy): [nb, nvar, nyb, NZ, 2, L]
                # — the tile axis LEADS (a 1-extent block dim in the
                # sublane slot would violate Mosaic's 8-alignment)
                pl.BlockSpec((1, nvar, 1, tz, 2, L),
                             lambda b, i, j, c: (b, 0, j, i, 0, 0)),
                # z candidates per (iz, jy): [nb, nvar, nzb, 2, NY, L]
                pl.BlockSpec((1, nvar, 1, 2, ty, L),
                             lambda b, i, j, c: (b, 0, i, 0, j, 0)),
            ]
            out_shape = [
                jax.ShapeDtypeStruct(u0.shape, dt_),
                jax.ShapeDtypeStruct((nb, nvar, NZ, NY, 2 * k), dt_),
                jax.ShapeDtypeStruct((nb, nvar, nyb, NZ, 2, L), dt_),
                jax.ShapeDtypeStruct((nb, nvar, nzb, 2, NY, L), dt_),
            ]
            if emit_prim:
                out_specs.append(tile)
                out_shape.append(jax.ShapeDtypeStruct(u0.shape, dt_))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb, nzb, nyb),
                in_specs=[
                    tile,
                    pl.BlockSpec((1, nvar, 1, 2 * h, ty, L),
                                 lambda b, i, j, c: (b, 0, i, 0, j, 0)),
                    pl.BlockSpec((1, nvar, tz, 1, 2 * h, L),
                                 lambda b, i, j, c: (b, 0, i, j, 0, 0)),
                    tile,
                ],
                out_specs=tuple(out_specs),
            )
            res = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=tuple(out_shape),
                interpret=interpret,
                compiler_params=_compiler_params(),
            )(s, u0, hz, hy, u1)
            u_new, fx, fy, fz = res[:4]
            prim = res[4] if emit_prim else None
            # keep only the owner tiles' candidate planes
            slab_y = jnp.stack([fy[:, :, ylo_t, :, 0],
                                fy[:, :, yhi_t, :, 1]],
                               axis=-1)         # [nb, nvar, NZ, L, 2]
            slab_z = jnp.stack([fz[:, :, zlo_t, 0], fz[:, :, zhi_t, 1]],
                               axis=-1)         # [nb, nvar, NY, L, 2]
            return u_new, prim, fx, slab_y, slab_z

        return call

    def _unpack_rows(a, nb, k, nbp):
        """[nbp//k, ..., k*W] -> [nb, ..., W] (inverse of the row pack
        on the lane axis; drops the padded rows)."""
        W = a.shape[-1] // k
        a = a.reshape(a.shape[:-1] + (k, W))
        a = jnp.moveaxis(a, -2, 1)
        return a.reshape((nbp,) + a.shape[2:])[:nb]

    def stage_faces(u0, u1, gam0, gam1, beta_dt, c_h):
        nb = u0.shape[0]
        dt_ = u0.dtype
        s = jnp.stack([jnp.asarray(gam0, dt_), jnp.asarray(gam1, dt_),
                       jnp.asarray(beta_dt, dt_), jnp.asarray(c_h, dt_)])
        k = _pick_pack_lanes(NX, NY, nvar, h, nb) if h <= g else 1
        if k == 1:
            u_new, prim, fx, slab_y, slab_z = build(nb, 1)(u0, u1, s)
            return u_new, prim, {1: fx, 2: slab_y, 3: slab_z}
        nbp = -(-nb // k) * k
        pad = nbp - nb

        def pack(a):
            if pad:
                a = jnp.concatenate(
                    [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])],
                    axis=0)
            a = a.reshape(nbp // k, k, nvar, NZ, NY, NX)
            return a.transpose(0, 2, 3, 4, 1, 5).reshape(
                nbp // k, nvar, NZ, NY, k * NX)

        u_new, prim, fx, slab_y, slab_z = build(nbp // k, k)(
            pack(u0), pack(u1), s)
        u_new = _unpack_rows(u_new, nb, k, nbp)
        if prim is not None:
            prim = _unpack_rows(prim, nb, k, nbp)
        fx = _unpack_rows(fx, nb, k, nbp)          # 2k cols -> 2
        slab_y = jnp.swapaxes(
            _unpack_rows(jnp.swapaxes(slab_y, -1, -2), nb, k, nbp),
            -1, -2)
        slab_z = jnp.swapaxes(
            _unpack_rows(jnp.swapaxes(slab_z, -1, -2), nb, k, nbp),
            -1, -2)
        return u_new, prim, {1: fx, 2: slab_y, 3: slab_z}

    return stage_faces


def _pick_tile(extent: int, want: int) -> int:
    """Largest divisor of ``extent`` that is <= ``want``."""
    for t in range(min(want, extent), 0, -1):
        if extent % t == 0:
            return t
    return 1


def _pick_tile_sublane(extent: int, want: int) -> int:
    """Largest MOSAIC-LEGAL sublane tile: the second-to-last block dim
    must be a multiple of 8 (the f32 sublane quantum) or equal to the
    overall array dim.  Ghosted layouts (extent = mb + 2g, e.g. 14 or
    70) often have no 8-multiple divisor at all — fall back to the full
    extent (always legal; VMEM is then bounded by shrinking the
    unconstrained leading-axis tile, ``_fit_tz``)."""
    for t in range(min(want, extent), 7, -1):
        if extent % t == 0 and t % 8 == 0:
            return t
    return extent


import os as _os

# Mosaic's default scoped-vmem limit is 16 MiB; v5e VMEM is larger, and
# raising the cap (as the large JAX TPU kernels do) lets the stage
# kernel keep tz >= h at 256^3 nvar=9 instead of collapsing to chunked
# sub-stencil tiles.  The measured kernel stack is ~1.6x the 8-slab
# estimate below, so the tile budget is set to limit/1.6.
_VMEM_LIMIT = int(_os.environ.get("ATHENAPK_PALLAS_VMEM_MB", "32")) * 2 ** 20
_VMEM_BUDGET = int(_VMEM_LIMIT / 1.6)


def _compiler_params():
    # every kernel here runs a 3-D grid of fully independent tiles
    return pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT,
        dimension_semantics=("parallel", "parallel", "parallel"))


def _pad_lane(n: int) -> int:
    """Mosaic pads the minormost (lane) dim to the 128 quantum."""
    return -(-n // 128) * 128


def _pad_sub(n: int) -> int:
    """... and the second-to-minor (sublane) dim to the 8 quantum."""
    return -(-n // 8) * 8


def _slab_bytes(nvar: int, tlead: int, tsub: int, nlanes: int,
                itemsize: int = 4) -> int:
    """PADDED VMEM footprint of the ~8 live kernel slabs of logical
    shape (nvar, tlead, tsub, nlanes): lane dim padded to the 128
    quantum, sublane to 8 (Mosaic's tiling quanta).  The single
    estimator shared by every tile fitter AND pack picker, so a pack
    decision can never be more optimistic than the tile fit that
    follows it (an optimistic pick that only faults at Mosaic lowering
    wedges the TPU tunnel on this environment)."""
    return 8 * nvar * tlead * _pad_sub(tsub) * _pad_lane(nlanes) * itemsize


def _fit_tz(NZ: int, want: int, ty: int, NX: int, nvar: int, h: int,
            itemsize: int = 4) -> int:
    """Pick the z tile (a LEADING block dim — unconstrained by Mosaic)
    so the kernel's working set (~8 live halo-extended slabs) fits
    VMEM; needed when the sublane tile fell back to the full extent.
    Prefers tiles >= h so the XLA halo-slab gather stays a bounded
    fraction (<= 2x) of the tile traffic; tiles < h remain correct
    (chunked ``_halo_slabs``) but are a last resort.

    The estimate uses the PADDED tile footprint (lane dim to the
    128 quantum, sublane to 8): at AMR-class ghosted extents (e.g.
    38 = 32 + 2*3) the physical VMEM slab is ~3.4x the logical one,
    and the unpadded estimate let the stage+faces kernel pick tiles
    that scoped-VMEM-OOM'd at Mosaic lowering (seen on device at
    mb=32 g=3)."""
    def est(t):
        return _slab_bytes(nvar, t + 2 * h, ty + 2 * h, NX, itemsize)

    divs = [t for t in range(1, NZ + 1) if NZ % t == 0]
    fit = [t for t in divs if est(t) <= _VMEM_BUDGET]
    pref = [t for t in fit if t <= want and t >= h]
    if pref:
        return max(pref)
    big = [t for t in fit if t >= h]
    if big:
        return min(big)       # smallest >= h that still fits
    return max(fit) if fit else 1


def _fit_lead(extent: int, want: int, ty: int, nlanes: int,
              nvar: int, itemsize: int = 4) -> int:
    """Leading-axis tile for the v1 lane sweeps: largest divisor of
    ``extent`` <= ``want`` whose working set (~8 live (t, ty, nlanes)
    slabs; the lane-sweep stencil has no transverse halo) fits the
    scoped-VMEM budget.  With the default want=1 this is a no-op; it
    guards env-forced large ATHENAPK_PALLAS_TZ against sublane-fallback
    layouts where ty is the full extent (advisor r3 finding 1).
    Padded footprint, like ``_fit_tz``."""
    def est(t):
        return _slab_bytes(nvar, t, ty, nlanes, itemsize)

    best = 1
    for t in range(1, min(want, extent) + 1):
        if extent % t == 0 and est(t) <= _VMEM_BUDGET:
            best = t
    return best


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

    def mk(d, dxd, nint, a, b):
        tsub = _pick_tile_sublane(b, ty)
        nlanes = {1: NX, 2: NY, 3: NZ}[d]
        tlead = _fit_lead(a, _pick_tile(a, tz), tsub, nlanes, cfg.nvar)
        return make_lane_sweep_negdiv_faces(
            cfg, eos, positivity_mask, recon, d, dxd, g, nint,
            tlead, tsub, interpret)
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


def _pick_pack(nblocks: int, lane_ext: int, nvar: int,
               itemsize: int = 4):
    """Lane-packing factor for the v1 multi-block sweeps (VERDICT r3
    item 1 — the 3-5x lane-padding tax on ghosted AMR-class block
    sizes): concatenate k blocks' rows along the LANE axis so the
    padded width k*lane_ext is an exact multiple of the 128-lane
    quantum (utilization 100% instead of lane_ext/roundup(lane_ext,
    128), e.g. 70/128 = 55% at mb=64 g=3).

    Stencil safety: the sweep stencil reads at most h <= nghost cells
    across a leaf's row edge, i.e. the NEIGHBOR leaf's ghost columns;
    the contaminated outputs are the leaf's own ghost columns, which
    the boundary fill overwrites — the same contract as the cyclic
    wrap garbage of the unpacked kernel.

    Returns the smallest k that divides nblocks, makes k*lane_ext a
    128 multiple, fits the VMEM budget at the minimal (1, 8) tile
    (the PADDED ``_slab_bytes`` footprint — the same accounting the
    tile fitters use, so the pick can never out-promise them), and
    keeps the packed row width sane; 1 when packing is impossible or
    pointless.

    Width cap (r5, measured): packing 64 mb=64/g=3 blocks into ONE
    4480-lane row LOSES 2x to the unpacked layout (2.63e7 vs 5.16e7
    zc/s on device) — a single huge row collapses the kernel grid and
    the padding it saves (70->128, 1.8x) cannot pay for it.  Packs are
    capped at 1024 lanes (the validated mb=8 k=32 geometry is 384)."""
    import os as _o
    if _o.environ.get("ATHENAPK_PALLAS_PACK", "1") != "1":
        return 1
    if lane_ext % 128 == 0 or nblocks <= 1:
        return 1
    for k in range(2, nblocks + 1):
        if nblocks % k or (k * lane_ext) % 128:
            continue
        if k * lane_ext > 1024:
            break
        if _slab_bytes(nvar, 1, 8, k * lane_ext, itemsize) > _VMEM_BUDGET:
            break
        return k
    return 1


def make_fused_negdiv(mesh, cfg, eos, positivity_mask, recon: str,
                      tz: int = 1, ty: int = 32, interpret: bool = False):
    """fn(prim, c_h) -> -div(F) over all active directions.

    Works on BOTH layouts: ghost-free periodic (cyclic lane rolls are
    the BC) and ghosted multi-block (the roll wrap-around garbage lands
    in the ghost rim, exactly like the XLA roll-based path; the caller's
    boundary fill overwrites it).  Tile sizes snap down to divisors of
    the per-block extents.

    Ghosted multi-block layouts additionally LANE-PACK k blocks per
    kernel row (``_pick_pack``) and pad the sublane extent to the
    8-quantum — both pure data movement around the unchanged kernel;
    interior outputs are bitwise-identical to the unpacked sweep."""
    NZ, NY, NX = mesh.block_shape
    nvar = cfg.nvar
    nblocks = mesh.nblocks

    def mk(d, dxd, lead_ext, sub_ext, lane_ext):
        k = _pick_pack(nblocks, lane_ext, nvar)
        if k > 1:
            lanes = k * lane_ext
            sub_pad = (-sub_ext) % 8
            sub_p = sub_ext + sub_pad
            # sublane tile: largest 8-multiple divisor of the padded
            # extent that fits the budget at the packed lane width
            tsub = 8
            for t in range(min(ty, sub_p), 7, -1):
                if sub_p % t == 0 and t % 8 == 0 and \
                        _slab_bytes(nvar, 1, t, lanes) <= _VMEM_BUDGET:
                    tsub = t
                    break
            tlead = _fit_lead(lead_ext, _pick_tile(lead_ext, tz), tsub,
                              lanes, nvar)
        else:
            sub_pad = 0
            tsub = _pick_tile_sublane(sub_ext, ty)
            tlead = _fit_lead(lead_ext, _pick_tile(lead_ext, tz), tsub,
                              lane_ext, nvar)
        fn = make_lane_sweep_negdiv(cfg, eos, positivity_mask, recon,
                                    d, dxd, tlead, tsub, interpret)
        return fn, k, sub_pad

    sweeps = []
    # x: lanes already minormost; grid tiles (z, y)
    sweeps.append((1, None) + mk(1, mesh.dx1, NZ, NY, NX))
    if mesh.nx2 > 1:
        # y: swap (y, x) -> minor axis y; grid tiles (z, x)
        sweeps.append((2, (0, 1, 2, 4, 3)) + mk(2, mesh.dx2, NZ, NX, NY))
    if mesh.nx3 > 1:
        # z: swap (z, x) -> minor axis z; grid tiles (x, y)
        sweeps.append((3, (0, 1, 4, 3, 2)) + mk(3, mesh.dx3, NX, NY, NZ))

    def negdiv(prim, c_h):
        out = None
        for _, perm, sweep, k, sub_pad in sweeps:
            q = prim if perm is None else jnp.transpose(prim, perm)
            if k > 1:
                nb, _, A, B, L = q.shape
                if sub_pad:
                    q = jnp.pad(q, ((0, 0), (0, 0), (0, 0),
                                    (0, sub_pad), (0, 0)), mode="edge")
                Bp = B + sub_pad
                q = q.reshape(nb // k, k, nvar, A, Bp, L)
                q = q.transpose(0, 2, 3, 4, 1, 5)
                q = q.reshape(nb // k, nvar, A, Bp, k * L)
                r = sweep(q, c_h)
                r = r.reshape(nb // k, nvar, A, Bp, k, L)
                r = r.transpose(0, 4, 1, 2, 3, 5).reshape(nb, nvar, A,
                                                          Bp, L)
                if sub_pad:
                    r = r[:, :, :, :B, :]
            else:
                r = sweep(q, c_h)
            if perm is not None:
                r = jnp.transpose(r, perm)
            out = r if out is None else out + r
        return out

    return negdiv
