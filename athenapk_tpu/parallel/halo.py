"""Explicit shard_map halo exchange over the device mesh.

The GSPMD path (``mesh_sharding.py``) lets XLA partition the roll-based
ghost fill into collective-permutes automatically.  This module is the
explicit alternative (SURVEY §2c "Ghost-zone exchange"): the block-grid z
axis is sharded over the 1-D device mesh, and the z-direction neighbor
slabs move with ``jax.lax.ppermute`` — the direct ICI analog of the
reference's per-neighbor MPI Isend/Irecv halo buffers
(``AddBoundaryExchangeTasks``, ``src/hydro/hydro_driver.cpp:567``).
x/y exchanges stay device-local (slab decomposition).

``make_sharded_step`` builds a shard_map'ed full step + dt estimate whose
global reductions use ``lax.pmin`` (the reference's ``MPI_Allreduce``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh as DeviceMesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.boundaries import _fill_dir
from ..core.mesh import Mesh


def _fill_z_sharded(grid, mesh: Mesh, axis_name: str, n_dev: int):
    """z-direction exchange when the block-grid z axis is sharded.

    grid: local [nbz_loc, nb2, nb1, nvar, NZ, NY, NX].
    Periodic-z only (slab decomposition; physical z BCs on edge devices
    use masked application below)."""
    g = mesh.nghost
    NZc = grid.shape[4]

    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    # neighbor block-layers across the shard boundary
    from_prev = lax.ppermute(grid[-1:], axis_name, fwd)
    from_next = lax.ppermute(grid[:1], axis_name, bwd)
    left = jnp.concatenate([from_prev, grid[:-1]], axis=0)
    right = jnp.concatenate([grid[1:], from_next], axis=0)

    def cslice(a, b):
        idx = [slice(None)] * 7
        idx[4] = slice(a, b)
        return tuple(idx)

    grid = grid.at[cslice(0, g)].set(left[cslice(NZc - 2 * g, NZc - g)])
    grid = grid.at[cslice(NZc - g, NZc)].set(right[cslice(g, 2 * g)])

    if mesh.ix3_bc != "periodic" or mesh.ox3_bc != "periodic":
        raise NotImplementedError(
            "sharded z-decomposition currently supports periodic z "
            "(slab layout keeps x/y BCs fully general)")
    return grid


def make_sharded_boundary_fn(mesh: Mesh, axis_name: str, n_dev: int):
    """Ghost fill for a z-slab-sharded state (runs inside shard_map)."""
    assert mesh.nb3 % n_dev == 0, "nb3 must divide over devices"
    nb3_loc = mesh.nb3 // n_dev

    def apply_boundaries(u_local):
        nvar = u_local.shape[1]
        grid = u_local.reshape(nb3_loc, mesh.nb2, mesh.nb1, nvar,
                               *mesh.block_shape)
        grid = _fill_dir(grid, mesh, 1, mesh.ix1_bc, mesh.ox1_bc)
        if mesh.nx2 > 1:
            grid = _fill_dir(grid, mesh, 2, mesh.ix2_bc, mesh.ox2_bc)
        if mesh.nx3 > 1:
            grid = _fill_z_sharded(grid, mesh, axis_name, n_dev)
        return grid.reshape(u_local.shape)

    return apply_boundaries


def make_sharded_step(pkg, dmesh: DeviceMesh, axis_name: str = "blocks"):
    """shard_map'ed (step, estimate) pair over the block axis.

    Returns (step_fn(u, dt, c_h) -> u', dt_fn(u) -> (dt, dt_hyp, dt_diff))
    operating on globally-sharded arrays.
    """
    import copy

    n_dev = dmesh.devices.size
    mesh = pkg.mesh
    sharded_bounds = make_sharded_boundary_fn(mesh, axis_name, n_dev)

    # a shallow clone whose ghost fill uses the explicit collectives
    pkg_local = copy.copy(pkg)
    pkg_local.apply_boundaries = sharded_bounds

    def _step_local(u, dt, c_h):
        return pkg_local._step(u, dt, c_h)

    def _dt_local(u):
        _, prim = pkg_local._cons_to_prim(u)
        dt, dt_hyp, dt_diff = pkg_local._estimate_timestep(prim)
        # the reference's MPI_Allreduce(min) over ranks
        return (lax.pmin(dt, axis_name), lax.pmin(dt_hyp, axis_name),
                lax.pmin(dt_diff, axis_name))

    spec_u = P(axis_name)
    spec_s = P()
    step_fn = jax.jit(shard_map(
        _step_local, mesh=dmesh,
        in_specs=(spec_u, spec_s, spec_s), out_specs=spec_u))
    dt_fn = jax.jit(shard_map(
        _dt_local, mesh=dmesh, in_specs=(spec_u,),
        out_specs=(spec_s, spec_s, spec_s)))
    return step_fn, dt_fn
