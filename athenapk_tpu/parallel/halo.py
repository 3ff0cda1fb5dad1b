"""Explicit shard_map halo exchange over 1-D and 2-D device meshes.

The GSPMD path (``mesh_sharding.py``) lets XLA partition the roll-based
ghost fill into collective-permutes automatically.  This module is the
explicit alternative (SURVEY §2c "Ghost-zone exchange"): block-grid axes
are sharded over the device mesh and neighbor face slabs move with
``jax.lax.ppermute`` — the direct ICI analog of the reference's
per-neighbor MPI Isend/Irecv halo buffers (``AddBoundaryExchangeTasks``,
``src/hydro/hydro_driver.cpp:567``).

Supported decompositions:

* 1-D: block-grid z axis over a 1-axis mesh (``make_sharded_step``, flat
  ``[nblocks, nvar, NZ, NY, NX]`` state) — z-slabs; x/y exchange local.
* 2-D: block-grid (z, y) over a ``("z", "y")`` mesh
  (``make_sharded_step_grid``, grid-shaped
  ``[nb3, nb2, nb1, nvar, NZ, NY, NX]`` state) — the pod-shaped layout.

Physical (outflow/reflecting) and problem-registered custom BCs are
applied on the edge devices of a sharded axis by computing the physically
filled ghost slab locally and selecting it with ``lax.axis_index`` —
the SPMD analog of the reference applying physical BCs only on blocks
that touch the domain boundary.  Global reductions use ``lax.pmin``
(the reference's ``MPI_Allreduce``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh as DeviceMesh, PartitionSpec as P

try:  # jax >= 0.8 moved shard_map to the top level
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core.boundaries import _fill_dir, apply_physical_dir
from ..core.mesh import Mesh

_CELL_AX = {1: 6, 2: 5, 3: 4}
_BLK_AX = {1: 2, 2: 1, 3: 0}


def _axsl(arr, ax: int, a, b):
    idx = [slice(None)] * arr.ndim
    idx[ax] = slice(a, b)
    return arr[tuple(idx)]


def _fill_dir_sharded(grid, mesh: Mesh, dirn: int, axis_name: str,
                      n_dev: int, custom_bcs=None):
    """Ghost fill along one SHARDED block-grid direction.

    grid: local [nb3_loc, nb2_loc, nb1_loc, nvar, NZ, NY, NX] inside
    shard_map.  Neighbor slabs (g cells deep) cross the device boundary
    via ppermute; intra-device neighbors use the same roll construction
    as the single-host fill; non-periodic faces are fixed up on the edge
    devices only.
    """
    g = mesh.nghost
    cell_ax = _CELL_AX[dirn]
    blk_ax = _BLK_AX[dirn]
    N = grid.shape[cell_ax]
    inner_bc = {1: mesh.ix1_bc, 2: mesh.ix2_bc, 3: mesh.ix3_bc}[dirn]
    outer_bc = {1: mesh.ox1_bc, 2: mesh.ox2_bc, 3: mesh.ox3_bc}[dirn]

    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    # cross-device slabs: my first layer's ghosts come from the previous
    # device's last layer; only the g ghost-adjacent cells travel.
    send_up = _axsl(_axsl(grid, blk_ax, -1, None), cell_ax, N - 2 * g, N - g)
    send_dn = _axsl(_axsl(grid, blk_ax, 0, 1), cell_ax, g, 2 * g)
    from_prev = lax.ppermute(send_up, axis_name, fwd)
    from_next = lax.ppermute(send_dn, axis_name, bwd)

    # intra-device neighbor slabs via the roll construction; layer 0 /
    # layer -1 get the cross-device slabs instead.
    left_all = _axsl(jnp.roll(grid, 1, axis=blk_ax), cell_ax, N - 2 * g, N - g)
    right_all = _axsl(jnp.roll(grid, -1, axis=blk_ax), cell_ax, g, 2 * g)
    left = jnp.concatenate(
        [from_prev, _axsl(left_all, blk_ax, 1, None)], axis=blk_ax)
    right = jnp.concatenate(
        [_axsl(right_all, blk_ax, 0, -1), from_next], axis=blk_ax)

    def cs(a, b):
        idx = [slice(None)] * 7
        idx[cell_ax] = slice(a, b)
        return tuple(idx)

    grid = grid.at[cs(0, g)].set(left)
    grid = grid.at[cs(N - g, N)].set(right)

    # physical BCs on the edge devices (periodic is already correct)
    idx = lax.axis_index(axis_name)
    if inner_bc != "periodic":
        phys = apply_physical_dir(grid, mesh, dirn, inner_bc, "inner",
                                  custom_bcs)
        sl = [slice(None)] * 7
        sl[blk_ax] = slice(0, 1)
        sl[cell_ax] = slice(0, g)
        sl = tuple(sl)
        grid = grid.at[sl].set(jnp.where(idx == 0, phys[sl], grid[sl]))
    if outer_bc != "periodic":
        phys = apply_physical_dir(grid, mesh, dirn, outer_bc, "outer",
                                  custom_bcs)
        sl = [slice(None)] * 7
        sl[blk_ax] = slice(-1, None)
        sl[cell_ax] = slice(N - g, N)
        sl = tuple(sl)
        grid = grid.at[sl].set(
            jnp.where(idx == n_dev - 1, phys[sl], grid[sl]))
    return grid


def make_sharded_boundary_fn(mesh: Mesh, axis_name: str, n_dev: int,
                             custom_bcs=None):
    """Ghost fill for a z-slab-sharded flat state (runs inside shard_map)."""
    assert mesh.nb3 % n_dev == 0, "nb3 must divide over devices"
    nb3_loc = mesh.nb3 // n_dev

    def apply_boundaries(u_local):
        nvar = u_local.shape[1]
        grid = u_local.reshape(nb3_loc, mesh.nb2, mesh.nb1, nvar,
                               *mesh.block_shape)
        grid = _fill_dir(grid, mesh, 1, mesh.ix1_bc, mesh.ox1_bc, custom_bcs)
        if mesh.nx2 > 1:
            grid = _fill_dir(grid, mesh, 2, mesh.ix2_bc, mesh.ox2_bc,
                             custom_bcs)
        if mesh.nx3 > 1:
            grid = _fill_dir_sharded(grid, mesh, 3, axis_name, n_dev,
                                     custom_bcs)
        return grid.reshape(u_local.shape)

    return apply_boundaries


def make_sharded_step(pkg, dmesh: DeviceMesh, axis_name: str = "blocks"):
    """shard_map'ed (step, estimate) pair over the block axis (1-D mesh).

    Returns (step_fn(u, dt, c_h) -> u', dt_fn(u) -> (dt, dt_hyp, dt_diff))
    operating on globally-sharded flat [nblocks, nvar, NZ, NY, NX] arrays.
    """
    import copy

    n_dev = dmesh.devices.size
    mesh = pkg.mesh
    custom_bcs = getattr(pkg, "custom_bcs", None)
    sharded_bounds = make_sharded_boundary_fn(mesh, axis_name, n_dev,
                                              custom_bcs)

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


# ---------------------------------------------------------------- 2-D mesh
def make_device_mesh_2d(devices, shape, names=("z", "y")) -> DeviceMesh:
    """2-D device mesh over (block-grid z, block-grid y) — pod layout."""
    import numpy as np
    ndz, ndy = shape
    devices = list(devices)
    assert len(devices) >= ndz * ndy, "not enough devices"
    return DeviceMesh(np.array(devices[:ndz * ndy]).reshape(ndz, ndy), names)


def grid_sharding(dmesh: DeviceMesh, names=("z", "y")):
    """Sharding for grid-shaped [nb3, nb2, nb1, nvar, NZ, NY, NX] state."""
    from jax.sharding import NamedSharding
    return NamedSharding(dmesh, P(*names))


def to_grid(u, mesh: Mesh):
    """[nblocks, nvar, ...] -> [nb3, nb2, nb1, nvar, ...] (host reshape)."""
    return u.reshape(mesh.nb3, mesh.nb2, mesh.nb1, u.shape[1],
                     *mesh.block_shape)


def from_grid(ug, mesh: Mesh):
    return ug.reshape(mesh.nblocks, ug.shape[3], *mesh.block_shape)


def make_sharded_step_grid(pkg, dmesh: DeviceMesh, names=("z", "y")):
    """shard_map'ed (step, estimate) over a 2-D (z, y) device mesh.

    State is grid-shaped [nb3, nb2, nb1, nvar, NZ, NY, NX], sharded
    ``P("z", "y")`` (use ``to_grid``/``grid_sharding`` to place it).
    Either mesh axis may have size 1.
    """
    import copy

    mesh = pkg.mesh
    zname, yname = names
    ndz, ndy = (dmesh.shape[zname], dmesh.shape[yname])
    if mesh.nb3 % ndz != 0 or mesh.nb2 % ndy != 0:
        raise ValueError(
            f"block grid ({mesh.nb3},{mesh.nb2}) not divisible by device "
            f"mesh ({ndz},{ndy})")
    nb3_loc = mesh.nb3 // ndz
    nb2_loc = mesh.nb2 // ndy
    custom_bcs = getattr(pkg, "custom_bcs", None)

    def fill_local(u_local):
        nvar = u_local.shape[1]
        grid = u_local.reshape(nb3_loc, nb2_loc, mesh.nb1, nvar,
                               *mesh.block_shape)
        grid = _fill_dir(grid, mesh, 1, mesh.ix1_bc, mesh.ox1_bc, custom_bcs)
        if mesh.nx2 > 1:
            if ndy == 1:
                grid = _fill_dir(grid, mesh, 2, mesh.ix2_bc, mesh.ox2_bc,
                                 custom_bcs)
            else:
                grid = _fill_dir_sharded(grid, mesh, 2, yname, ndy,
                                         custom_bcs)
        if mesh.nx3 > 1:
            if ndz == 1:
                grid = _fill_dir(grid, mesh, 3, mesh.ix3_bc, mesh.ox3_bc,
                                 custom_bcs)
            else:
                grid = _fill_dir_sharded(grid, mesh, 3, zname, ndz,
                                         custom_bcs)
        return grid.reshape(u_local.shape)

    pkg_local = copy.copy(pkg)
    pkg_local.apply_boundaries = fill_local

    nvar = pkg.cfg.nvar

    def _step_local(ug, dt, c_h):
        u = ug.reshape(-1, nvar, *mesh.block_shape)
        u2 = pkg_local._step(u, dt, c_h)
        return u2.reshape(ug.shape)

    def _dt_local(ug):
        u = ug.reshape(-1, nvar, *mesh.block_shape)
        _, prim = pkg_local._cons_to_prim(u)
        dt, dt_hyp, dt_diff = pkg_local._estimate_timestep(prim)
        return (lax.pmin(dt, names), lax.pmin(dt_hyp, names),
                lax.pmin(dt_diff, names))

    spec_u = P(zname, yname)
    spec_s = P()
    step_fn = jax.jit(shard_map(
        _step_local, mesh=dmesh,
        in_specs=(spec_u, spec_s, spec_s), out_specs=spec_u))
    dt_fn = jax.jit(shard_map(
        _dt_local, mesh=dmesh, in_specs=(spec_u,),
        out_specs=(spec_s, spec_s, spec_s)))
    return step_fn, dt_fn
