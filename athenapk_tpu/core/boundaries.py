"""Ghost-zone fill: inter-block exchange + physical boundary conditions.

TPU-native re-design of Parthenon's boundary communication
(``AddBoundaryExchangeTasks``, AthenaPK ``src/hydro/hydro_driver.cpp:567``):
instead of per-neighbor buffer pack / MPI send / unpack, the regular block
grid is reshaped to ``[nb3, nb2, nb1, nvar, NZ, NY, NX]`` and neighbor face
slabs are obtained with ``jnp.roll`` along the block-grid axes — a single
fused gather that XLA turns into on-chip copies (and, under ``shard_map``,
into ICI collective-permutes; see ``athenapk_tpu.parallel.halo``).

Physical BCs (periodic / outflow / reflecting) mirror the reference
(Parthenon built-ins + AthenaPK's ``ReflectBC``,
``src/bvals/boundary_conditions_apk.hpp:38-85``).  Directions are processed
x -> y -> z so that edge/corner ghosts are filled consistently (the same
dimension-by-dimension sweep Parthenon performs).

All functions operate on conserved variables (the reference exchanges
"cons" and derives "prim" afterwards); reflecting therefore flips the sign
of the normal *momentum*.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from .indices import IM1, IM2, IM3
from .mesh import Mesh

_NORMAL_MOM = {1: IM1, 2: IM2, 3: IM3}


def check_reflecting_mhd(mesh: Mesh, fluid: str) -> None:
    """Reflecting BCs are hydro-only: B needs special treatment the
    reference refuses to fake ('Reflecting boundary conditions for MHD
    need special treatment', src/bvals/boundary_conditions_apk.hpp) —
    hard-error instead of silently flipping only the normal momentum."""
    if fluid != "glmmhd":
        return
    bcs = (mesh.ix1_bc, mesh.ox1_bc, mesh.ix2_bc, mesh.ox2_bc,
           mesh.ix3_bc, mesh.ox3_bc)
    if "reflecting" in bcs:
        raise ValueError(
            "Reflecting boundary conditions for MHD need special treatment "
            "(magnetic-field components are not handled); use outflow or "
            "periodic — matches the reference's guard in "
            "bvals/boundary_conditions_apk.hpp")


def _reflect_signs(nvar: int, dirn: int, dtype):
    s = [1.0] * nvar
    s[_NORMAL_MOM[dirn]] = -1.0
    # note: reflecting BCs are hydro-only in the reference (main.cpp:129-140)
    return jnp.asarray(s, dtype=dtype).reshape((nvar, 1, 1, 1))


def _cslice(cell_ax: int, a, b):
    idx = [slice(None)] * 7
    idx[cell_ax] = slice(a, b)
    return tuple(idx)


def _bslice(blk_ax: int, pos: str):
    idx = [slice(None)] * 7
    idx[blk_ax] = slice(0, 1) if pos == "inner" else slice(-1, None)
    return tuple(idx)


def apply_physical_dir(grid, mesh: Mesh, dirn: int, bc: str, pos: str,
                       custom_bcs=None):
    """Apply one physical BC to the domain-boundary block layer of ``grid``
    ([nb3, nb2, nb1, nvar, NZ, NY, NX]); returns the updated grid.

    Shared between the single-host fill (``_fill_dir``) and the sharded
    fill (``parallel.halo``), where the "boundary layer" is the edge
    device's first/last local block layer."""
    if bc == "periodic":
        return grid
    g = mesh.nghost
    cell_ax = {1: 6, 2: 5, 3: 4}[dirn]
    blk_ax = {1: 2, 2: 1, 3: 0}[dirn]
    N = grid.shape[cell_ax]
    nvar = grid.shape[3]
    cs = lambda a, b: _cslice(cell_ax, a, b)
    layer = grid[_bslice(blk_ax, pos)]
    if custom_bcs and bc in custom_bcs:
        # user-registered BC (RegisterBoundaryCondition analog,
        # main.cpp:129-140): mutates the ghost slab of the layer
        gsl = cs(0, g) if pos == "inner" else cs(N - g, N)
        layer = custom_bcs[bc](layer, gsl, mesh, dirn, pos)
    elif bc == "outflow":
        if pos == "inner":
            edge = layer[cs(g, g + 1)]
            ghost = jnp.broadcast_to(edge, layer[cs(0, g)].shape)
            layer = layer.at[cs(0, g)].set(ghost)
        else:
            edge = layer[cs(N - g - 1, N - g)]
            ghost = jnp.broadcast_to(edge, layer[cs(N - g, N)].shape)
            layer = layer.at[cs(N - g, N)].set(ghost)
    elif bc == "reflecting":
        signs = _reflect_signs(nvar, dirn, grid.dtype)
        if pos == "inner":
            mirror = jnp.flip(layer[cs(g, 2 * g)], axis=cell_ax)
            layer = layer.at[cs(0, g)].set(signs * mirror)
        else:
            mirror = jnp.flip(layer[cs(N - 2 * g, N - g)], axis=cell_ax)
            layer = layer.at[cs(N - g, N)].set(signs * mirror)
    else:
        raise ValueError(f"unknown boundary condition '{bc}'")
    return grid.at[_bslice(blk_ax, pos)].set(layer)


def _fill_dir(grid, mesh: Mesh, dirn: int, inner_bc: str, outer_bc: str,
              custom_bcs=None):
    """Exchange + physical BC along one direction of the block grid.

    grid: [nb3, nb2, nb1, nvar, NZ, NY, NX].
    """
    g = mesh.nghost
    # cell axis in grid coords and matching block-grid axis
    cell_ax = {1: 6, 2: 5, 3: 4}[dirn]
    blk_ax = {1: 2, 2: 1, 3: 0}[dirn]
    N = grid.shape[cell_ax]

    # --- inter-block exchange (periodic across the domain by construction)
    left = jnp.roll(grid, 1, axis=blk_ax)    # neighbor at -dirn
    right = jnp.roll(grid, -1, axis=blk_ax)  # neighbor at +dirn
    grid = grid.at[_cslice(cell_ax, 0, g)].set(
        left[_cslice(cell_ax, N - 2 * g, N - g)])
    grid = grid.at[_cslice(cell_ax, N - g, N)].set(
        right[_cslice(cell_ax, g, 2 * g)])

    # --- physical BCs on the domain-boundary block layer
    grid = apply_physical_dir(grid, mesh, dirn, inner_bc, "inner", custom_bcs)
    grid = apply_physical_dir(grid, mesh, dirn, outer_bc, "outer", custom_bcs)
    return grid


def make_boundary_fn(mesh: Mesh, custom_bcs=None) -> Callable:
    """Build the jit-compatible ghost-fill closure for this mesh.

    ``custom_bcs``: {bc_name: fn(layer, ghost_slice, mesh, dirn, pos)} for
    problem-registered boundary conditions (e.g. cloud inflow)."""
    if mesh.nghost == 0:
        # ghost-free periodic fast path (Mesh.__post_init__ validated
        # all-periodic single-block): cyclic rolls in the stencil code
        # already wrap correctly — the ghost fill is the identity.
        if custom_bcs:
            raise ValueError("custom boundary conditions require nghost > 0")
        return lambda u: u
    nb3, nb2, nb1 = mesh.nb3, mesh.nb2, mesh.nb1

    def apply_boundaries(u):
        """u: [nblocks, nvar, NZ, NY, NX] conserved state -> ghost-filled."""
        nvar = u.shape[1]
        grid = u.reshape(nb3, nb2, nb1, nvar, *mesh.block_shape)
        grid = _fill_dir(grid, mesh, 1, mesh.ix1_bc, mesh.ox1_bc, custom_bcs)
        if mesh.nx2 > 1:
            grid = _fill_dir(grid, mesh, 2, mesh.ix2_bc, mesh.ox2_bc,
                             custom_bcs)
        if mesh.nx3 > 1:
            grid = _fill_dir(grid, mesh, 3, mesh.ix3_bc, mesh.ox3_bc,
                             custom_bcs)
        return grid.reshape(u.shape)

    return apply_boundaries
