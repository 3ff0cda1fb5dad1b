"""Lagrangian tracer particles (reference ``src/tracers/tracers.cpp``).

TPU-native re-design of Parthenon swarms: instead of per-block particle
containers with MPI migration, all tracers live in flat fixed-capacity
device arrays ``[n_tracers]`` (static shapes); "block hand-off" is implicit
because interpolation indexes the global uniform grid directly.  (Under
multi-chip sharding this becomes a ppermute of ragged fixed-capacity
buffers — SURVEY §2c "Swarms"; uniform-mesh round-1 keeps them replicated.)

Capabilities, matching the reference:
* seeding: ``random_per_block`` with per-block seeded RNG
  (``SeedInitialTracers``, ``tracers.cpp:95-167``) or a user hook
* advection: Heun/RK2 with trilinear (cell-centered linear) velocity
  interpolation, using the last-filled tracer velocity as predictor
  (``AdvectTracers``, ``tracers.cpp:189-242``)
* field sampling at output time: rho, p, v (,B)
  (``FillTracers``, ``tracers.cpp:249-308``)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.indices import IDN, IV1, IV2, IV3, IPR, IB1, IB2, IB3, GLMMHD


class Tracers:
    def __init__(self, pin, mesh, cfg):
        self.enabled = pin.get_or_add_bool("tracers", "enabled", False)
        self.mesh = mesh
        self.mhd = cfg.fluid == GLMMHD
        if not self.enabled:
            return
        if mesh.nx3 == 1:
            raise ValueError("tracers currently only supported in 3D "
                             "(matches reference)")
        self.seed_method = pin.get_or_add_string(
            "tracers", "initial_seed_method", "none")
        self.num_per_cell = pin.get_or_add_real(
            "tracers", "initial_num_tracers_per_cell", 0.0)
        self.rng_seed = pin.get_or_add_integer("tracers", "initial_rng_seed", 0)
        self._advect = jax.jit(self._advect_impl)
        self._fill = jax.jit(self._fill_impl)

    # ------------------------------------------------------------------ seed
    def seed(self):
        """Random-per-block seeding with gid-seeded RNG streams."""
        mesh = self.mesh
        n_cells_per_block = mesh.mbnx1 * mesh.mbnx2 * mesh.mbnx3
        n_per_block = int(n_cells_per_block * self.num_per_cell)
        if self.seed_method == "none":
            return None
        if n_per_block <= 0:
            raise ValueError("initial_num_tracers_per_cell too small")
        xs, ys, zs, ids = [], [], [], []
        for b in range(mesh.nblocks):
            rng = np.random.default_rng(b + self.rng_seed)
            x0, y0, z0 = mesh.block_origin(b)
            xs.append(x0 + rng.random(n_per_block) * mesh.mbnx1 * mesh.dx1)
            ys.append(y0 + rng.random(n_per_block) * mesh.mbnx2 * mesh.dx2)
            zs.append(z0 + rng.random(n_per_block) * mesh.mbnx3 * mesh.dx3)
            ids.append(n_per_block * b + np.arange(n_per_block))
        n = mesh.nblocks * n_per_block
        state = dict(
            x=jnp.asarray(np.concatenate(xs)),
            y=jnp.asarray(np.concatenate(ys)),
            z=jnp.asarray(np.concatenate(zs)),
            id=jnp.asarray(np.concatenate(ids)),
            vel_x=jnp.zeros(n), vel_y=jnp.zeros(n), vel_z=jnp.zeros(n),
            rho=jnp.zeros(n), pressure=jnp.zeros(n),
        )
        if self.mhd:
            state.update(B_x=jnp.zeros(n), B_y=jnp.zeros(n),
                         B_z=jnp.zeros(n))
        return state

    # ---------------------------------------------------------------- interp
    def _global_field(self, prim, comp):
        """Assemble the global interior array [gnz, gny, gnx] for one
        component from the block-batched state."""
        mesh = self.mesh
        sl = mesh.interior_slices
        q = prim[:, comp][tuple([sl[0]] + list(sl[2:]))]
        grid = q.reshape(mesh.nb3, mesh.nb2, mesh.nb1,
                         mesh.mbnx3, mesh.mbnx2, mesh.mbnx1)
        grid = grid.transpose(0, 3, 1, 4, 2, 5)
        return grid.reshape(mesh.nx3, mesh.nx2, mesh.nx1)

    def _interp(self, field, x, y, z):
        """Trilinear interpolation among cell centers with periodic wrap
        (the reference's LCInterp)."""
        mesh = self.mesh
        fx = (x - mesh.x1min) / mesh.dx1 - 0.5
        fy = (y - mesh.x2min) / mesh.dx2 - 0.5
        fz = (z - mesh.x3min) / mesh.dx3 - 0.5
        i0 = jnp.floor(fx).astype(jnp.int32)
        j0 = jnp.floor(fy).astype(jnp.int32)
        k0 = jnp.floor(fz).astype(jnp.int32)
        wx = fx - i0
        wy = fy - j0
        wz = fz - k0
        i0 = jnp.mod(i0, mesh.nx1)
        j0 = jnp.mod(j0, mesh.nx2)
        k0 = jnp.mod(k0, mesh.nx3)
        i1 = jnp.mod(i0 + 1, mesh.nx1)
        j1 = jnp.mod(j0 + 1, mesh.nx2)
        k1 = jnp.mod(k0 + 1, mesh.nx3)
        out = 0.0
        for dk, kk, wk in ((0, k0, 1 - wz), (1, k1, wz)):
            for dj, jj, wj in ((0, j0, 1 - wy), (1, j1, wy)):
                for di, ii, wi in ((0, i0, 1 - wx), (1, i1, wx)):
                    out = out + field[kk, jj, ii] * (wk * wj * wi)
        return out

    def _wrap(self, x, lo, hi):
        return lo + jnp.mod(x - lo, hi - lo)

    # ---------------------------------------------------------------- advect
    def _advect_impl(self, state, prim, dt):
        """Heun: predictor uses the stored (last-filled) tracer velocity,
        corrector re-samples at the predicted position."""
        mesh = self.mesh
        vx = self._global_field(prim, IV1)
        vy = self._global_field(prim, IV2)
        vz = self._global_field(prim, IV3)
        x, y, z = state["x"], state["y"], state["z"]
        x_s = x + dt * state["vel_x"]
        y_s = y + dt * state["vel_y"]
        z_s = z + dt * state["vel_z"]
        x_s = self._wrap(x_s, mesh.x1min, mesh.x1max)
        y_s = self._wrap(y_s, mesh.x2min, mesh.x2max)
        z_s = self._wrap(z_s, mesh.x3min, mesh.x3max)
        vx_s = self._interp(vx, x_s, y_s, z_s)
        vy_s = self._interp(vy, x_s, y_s, z_s)
        vz_s = self._interp(vz, x_s, y_s, z_s)
        state = dict(state)
        state["x"] = self._wrap(x + dt * 0.5 * (state["vel_x"] + vx_s),
                                mesh.x1min, mesh.x1max)
        state["y"] = self._wrap(y + dt * 0.5 * (state["vel_y"] + vy_s),
                                mesh.x2min, mesh.x2max)
        state["z"] = self._wrap(z + dt * 0.5 * (state["vel_z"] + vz_s),
                                mesh.x3min, mesh.x3max)
        return state

    def advect(self, state, prim, dt):
        if state is None:
            return None
        return self._advect(state, prim, jnp.asarray(dt))

    # ------------------------------------------------------------------ fill
    def _fill_impl(self, state, prim):
        comps = dict(vel_x=IV1, vel_y=IV2, vel_z=IV3, rho=IDN, pressure=IPR)
        if self.mhd:
            comps.update(B_x=IB1, B_y=IB2, B_z=IB3)
        state = dict(state)
        x, y, z = state["x"], state["y"], state["z"]
        for name, c in comps.items():
            state[name] = self._interp(self._global_field(prim, c), x, y, z)
        return state

    def fill(self, state, prim):
        if state is None:
            return None
        return self._fill(state, prim)
