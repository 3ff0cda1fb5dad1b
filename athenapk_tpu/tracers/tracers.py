"""Lagrangian tracer particles (reference ``src/tracers/tracers.cpp``).

TPU-native swarm redesign (round 2): tracers live in per-block
fixed-capacity device buffers ``[nblocks, cap]`` with an ``active`` mask —
the static-shape analog of Parthenon's per-block swarm containers.
Interpolation is BLOCK-LOCAL: each tracer reads only its owner block's
ghost-inclusive array (``LCInterp`` on the block pack, ``tracers.cpp:
226-231``), so the whole subsystem shards over the block axis exactly
like the fluid state — no global-grid gather.  Migration between blocks
is one static-shape stable key-sort over the flattened particle pool
followed by a masked scatter; under GSPMD the sort lowers to the
cross-device routing that Parthenon does with swarm MPI communication
(``hydro_driver.cpp:638-642``).

Capabilities, matching the reference:
* seeding: ``random_per_block`` with gid-seeded RNG streams
  (``SeedInitialTracers``, ``tracers.cpp:95-167``) or a ``user`` hook
  (``ProblemSeedInitialTracers``)
* advection: Heun/RK2 with block-local trilinear (cell-centered linear)
  velocity interpolation, using the last-filled tracer velocity as the
  predictor (``AdvectTracers``, ``tracers.cpp:189-242``)
* field sampling at output time: rho, p, v (,B)
  (``FillTracers``, ``tracers.cpp:249-308``)
* boundaries: periodic faces wrap; non-periodic faces DEACTIVATE
  particles that leave the domain (Parthenon's swarm outflow behavior)
* adaptive meshes are rejected exactly like the reference
  (``tracers.cpp:77-79``)

Fixed capacity is the TPU tax for static shapes: a block whose incoming
particle count exceeds ``cap = ceil(num_per_cell * cells_per_block *
capacity_factor)`` drops the excess and counts it in ``state["n_lost"]``
(the deck knob ``tracers/capacity_factor``, default 2.0, sizes the
headroom).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.indices import IDN, IV1, IV2, IV3, IPR, IB1, IB2, IB3, GLMMHD


def particle_fields(state):
    """Names of per-particle entries ([nblocks, cap, ...]); skips scalar
    bookkeeping (n_lost) and any non-particle auxiliary entries."""
    return [k for k, v in state.items() if jnp.ndim(v) >= 2]


def scatter_pool(fields, key, nb, cap):
    """Route a flat particle pool into per-block fixed-capacity slots.

    ``fields``: {name: [n, ...]} flattened particle data; ``key``: [n]
    destination block index in [0, nb] (nb = inactive sentinel, sorts
    last).  Stable sort by key, then masked scatter into [nb, cap, ...];
    per-block overflow beyond ``cap`` is dropped.  Returns
    ({name: [nb, cap, ...]}, n_overflow).  This is the TPU swarm-routing
    primitive shared by the single-device migrate (pool n = nb*cap) and
    the sharded migrate (pool extended by the ppermute'd transfer
    buffers)."""
    n = key.shape[0]
    key_s, perm = jax.lax.sort([key, jnp.arange(n, dtype=jnp.int32)],
                               num_keys=1, is_stable=True)
    counts = jnp.bincount(key, length=nb + 1)
    starts = jnp.concatenate([jnp.zeros(1, counts.dtype),
                              jnp.cumsum(counts)[:-1]])
    slot = jnp.arange(n) - starts[key_s]
    valid = (key_s < nb) & (slot < cap)
    dest = jnp.where(valid, key_s * cap + slot, nb * cap)  # OOB = dropped
    out = {}
    for name, q in fields.items():
        qp = q[perm]
        if name == "active":
            qp = valid
        out[name] = (jnp.zeros((nb * cap,) + q.shape[1:], q.dtype)
                     .at[dest].set(qp, mode="drop")
                     .reshape((nb, cap) + q.shape[1:]))
    n_overflow = (jnp.sum(key_s < nb) - jnp.sum(valid)).astype(jnp.int32)
    return out, n_overflow


class Tracers:
    def __init__(self, pin, mesh, cfg, extra_fields=None):
        self.enabled = pin.get_or_add_bool("tracers", "enabled", False)
        self.mesh = mesh
        self.mhd = cfg.fluid == GLMMHD
        if not self.enabled:
            return
        if mesh.nx3 == 1:
            raise ValueError("tracers currently only supported in 3D "
                             "(matches reference)")
        if pin.get_or_add_string("parthenon/mesh", "refinement",
                                 "none") == "adaptive":
            raise ValueError("Tracers/swarms currently only supported on "
                             "non-adaptive meshes (matches reference "
                             "tracers.cpp)")
        self.seed_method = pin.get_or_add_string(
            "tracers", "initial_seed_method", "none")
        self.num_per_cell = pin.get_or_add_real(
            "tracers", "initial_num_tracers_per_cell", 0.0)
        self.rng_seed = pin.get_or_add_integer("tracers", "initial_rng_seed", 0)
        self.cap_factor = pin.get_or_add_real("tracers", "capacity_factor", 2.0)
        # problem-specific per-particle fields: {name: trailing shape}
        # (the reference's ProblemInitTracerData/AddSwarmValue hook, e.g.
        # turbulence's n_lookback vectors — turbulence.cpp:200-219)
        self.extra_fields = dict(extra_fields or {})

        # per-block origins as device arrays (block-local coordinates)
        nb = mesh.nblocks
        origins = np.array([mesh.block_origin(b) for b in range(nb)])
        self._bx0 = jnp.asarray(origins[:, 0])
        self._by0 = jnp.asarray(origins[:, 1])
        self._bz0 = jnp.asarray(origins[:, 2])

        self._advect = jax.jit(self._advect_impl)
        self._fill = jax.jit(self._fill_impl)

    # ------------------------------------------------------------------ seed
    def _field_names(self):
        names = ["vel_x", "vel_y", "vel_z", "rho", "pressure"]
        if self.mhd:
            names += ["B_x", "B_y", "B_z"]
        return names

    def seed(self, user_hook=None):
        """Random-per-block seeding with gid-seeded RNG streams, into
        per-block fixed-capacity buffers."""
        mesh = self.mesh
        n_cells_per_block = mesh.mbnx1 * mesh.mbnx2 * mesh.mbnx3
        n_per_block = int(n_cells_per_block * self.num_per_cell)
        if self.seed_method == "none":
            return None
        if self.seed_method == "user":
            if user_hook is None:
                raise ValueError("initial_seed_method=user requires the "
                                 "problem generator to define "
                                 "seed_initial_tracers")
            return user_hook(self)
        if self.seed_method != "random_per_block":
            raise ValueError(f"Unknown tracer initial_seed_method "
                             f"'{self.seed_method}'")
        if n_per_block <= 0:
            raise ValueError("initial_num_tracers_per_cell too small")
        nb = mesh.nblocks
        cap = max(int(np.ceil(n_per_block * self.cap_factor)), n_per_block)
        self.cap = cap
        x = np.zeros((nb, cap))
        y = np.zeros((nb, cap))
        z = np.zeros((nb, cap))
        ids = np.full((nb, cap), -1, np.int32)
        active = np.zeros((nb, cap), bool)
        for b in range(nb):
            rng = np.random.default_rng(b + self.rng_seed)
            x0, y0, z0 = mesh.block_origin(b)
            x[b, :n_per_block] = x0 + rng.random(n_per_block) * (
                mesh.mbnx1 * mesh.dx1)
            y[b, :n_per_block] = y0 + rng.random(n_per_block) * (
                mesh.mbnx2 * mesh.dx2)
            z[b, :n_per_block] = z0 + rng.random(n_per_block) * (
                mesh.mbnx3 * mesh.dx3)
            ids[b, :n_per_block] = n_per_block * b + np.arange(n_per_block)
            active[b, :n_per_block] = True
        state = dict(
            x=jnp.asarray(x), y=jnp.asarray(y), z=jnp.asarray(z),
            id=jnp.asarray(ids), active=jnp.asarray(active),
            n_lost=jnp.zeros((), jnp.int32),
        )
        for name in self._field_names():
            state[name] = jnp.zeros((nb, cap))
        for name, trailing in self.extra_fields.items():
            state[name] = jnp.zeros((nb, cap) + tuple(trailing))
        return state

    # ---------------------------------------------------------------- interp
    def _interp(self, prim, comp, x, y, z, origins=None):
        """Block-local trilinear interpolation among cell centers.

        ``x/y/z`` are ``[nb, cap]`` positions owned by block ``b``; the
        stencil reads the block's ghost-inclusive array only (ghosts are
        filled every stage, so stencils that cross the block edge see the
        neighbor copy — same contract as the reference's LCInterp on a
        ghosted pack).  ``origins``: optional (bx0, by0, bz0) arrays for
        the rows of ``prim`` — the sharded path passes its local shard's
        block origins (prim then holds only the local blocks)."""
        mesh = self.mesh
        bx0, by0, bz0 = origins if origins is not None else (
            self._bx0, self._by0, self._bz0)
        field = prim[:, comp]                      # [nb, NZ, NY, NX]
        fx = (x - bx0[:, None]) / mesh.dx1 + (mesh.ng1 - 0.5)
        fy = (y - by0[:, None]) / mesh.dx2 + (mesh.ng2 - 0.5)
        fz = (z - bz0[:, None]) / mesh.dx3 + (mesh.ng3 - 0.5)
        i0f = jnp.floor(fx)
        j0f = jnp.floor(fy)
        k0f = jnp.floor(fz)
        wx = fx - i0f
        wy = fy - j0f
        wz = fz - k0f
        if mesh.nghost == 0:
            # ghost-free periodic fast path: ONE mesh-spanning block,
            # cyclic index wrap IS the periodic boundary
            i0 = jnp.mod(i0f.astype(jnp.int32), mesh.NX)
            j0 = jnp.mod(j0f.astype(jnp.int32), mesh.NY)
            k0 = jnp.mod(k0f.astype(jnp.int32), mesh.NZ)
            i1 = jnp.mod(i0 + 1, mesh.NX)
            j1 = jnp.mod(j0 + 1, mesh.NY)
            k1 = jnp.mod(k0 + 1, mesh.NZ)
        else:
            i0 = jnp.clip(i0f.astype(jnp.int32), 0, mesh.NX - 2)
            j0 = jnp.clip(j0f.astype(jnp.int32), 0, mesh.NY - 2)
            k0 = jnp.clip(k0f.astype(jnp.int32), 0, mesh.NZ - 2)
            i1 = i0 + 1
            j1 = j0 + 1
            k1 = k0 + 1
        b = jnp.arange(prim.shape[0], dtype=jnp.int32)[:, None]
        out = 0.0
        for kk, wk in ((k0, 1 - wz), (k1, wz)):
            for jj, wj in ((j0, 1 - wy), (j1, wy)):
                for ii, wi in ((i0, 1 - wx), (i1, wx)):
                    out = out + field[b, kk, jj, ii] * (wk * wj * wi)
        return out

    def _wrap(self, x, lo, hi):
        return lo + jnp.mod(x - lo, hi - lo)

    def _apply_domain_bcs(self, state):
        """Periodic faces wrap positions; non-periodic faces deactivate
        leavers (Parthenon swarm behavior for outflow-like BCs)."""
        mesh = self.mesh
        active = state["active"]
        lost = jnp.zeros((), jnp.int32)
        for comp, lo, hi, per in (
                ("x", mesh.x1min, mesh.x1max, mesh.ix1_bc == "periodic"),
                ("y", mesh.x2min, mesh.x2max, mesh.ix2_bc == "periodic"),
                ("z", mesh.x3min, mesh.x3max, mesh.ix3_bc == "periodic")):
            q = state[comp]
            if per:
                state[comp] = self._wrap(q, lo, hi)
            else:
                escaped = active & ((q < lo) | (q >= hi))
                lost = lost + jnp.sum(escaped).astype(jnp.int32)
                active = active & ~escaped
        state["active"] = active
        state["n_lost"] = state["n_lost"] + lost
        return state

    # --------------------------------------------------------------- migrate
    def _dest_gid(self, state):
        """Owner block gid from position (x-fastest block ordering)."""
        mesh = self.mesh
        b1 = jnp.clip(jnp.floor((state["x"] - mesh.x1min)
                                / (mesh.mbnx1 * mesh.dx1)).astype(jnp.int32),
                      0, mesh.nb1 - 1)
        b2 = jnp.clip(jnp.floor((state["y"] - mesh.x2min)
                                / (mesh.mbnx2 * mesh.dx2)).astype(jnp.int32),
                      0, mesh.nb2 - 1)
        b3 = jnp.clip(jnp.floor((state["z"] - mesh.x3min)
                                / (mesh.mbnx3 * mesh.dx3)).astype(jnp.int32),
                      0, mesh.nb3 - 1)
        return b1 + mesh.nb1 * (b2 + mesh.nb2 * b3)

    def _migrate(self, state):
        """Route particles to their owner blocks: stable sort of the
        flattened pool by destination gid, then scatter into per-block
        slots (``scatter_pool``).  Inactive particles carry the sentinel
        key ``nblocks`` and sort to the end; per-block overflow beyond
        ``cap`` is dropped and counted."""
        mesh = self.mesh
        nb = mesh.nblocks
        if nb == 1:
            return state
        cap = state["x"].shape[1]
        n = nb * cap
        gid = self._dest_gid(state)
        key = jnp.where(state["active"], gid, nb).reshape(n).astype(jnp.int32)
        fields = {name: state[name].reshape((n,) + state[name].shape[2:])
                  for name in particle_fields(state)}
        routed, n_overflow = scatter_pool(fields, key, nb, cap)
        out = dict(state)
        out.update(routed)
        out["n_lost"] = state["n_lost"] + n_overflow
        return out

    # ---------------------------------------------------------------- advect
    def _advect_impl(self, state, prim, dt, origins=None, migrate=None):
        """Heun: predictor uses the stored (last-filled) tracer velocity,
        corrector re-samples at the predicted position; then domain BCs
        and block migration.  ``origins``/``migrate`` parameterize the
        sharded path (local block origins + ppermute routing)."""
        x, y, z = state["x"], state["y"], state["z"]
        x_s = x + dt * state["vel_x"]
        y_s = y + dt * state["vel_y"]
        z_s = z + dt * state["vel_z"]
        vx_s = self._interp(prim, IV1, x_s, y_s, z_s, origins)
        vy_s = self._interp(prim, IV2, x_s, y_s, z_s, origins)
        vz_s = self._interp(prim, IV3, x_s, y_s, z_s, origins)
        state = dict(state)
        state["x"] = x + dt * 0.5 * (state["vel_x"] + vx_s)
        state["y"] = y + dt * 0.5 * (state["vel_y"] + vy_s)
        state["z"] = z + dt * 0.5 * (state["vel_z"] + vz_s)
        state = self._apply_domain_bcs(state)
        return (migrate or self._migrate)(state)

    def advect(self, state, prim, dt):
        if state is None:
            return None
        return self._advect(state, prim, jnp.asarray(dt))

    # ------------------------------------------------------------------ fill
    def _fill_impl(self, state, prim, origins=None):
        comps = dict(vel_x=IV1, vel_y=IV2, vel_z=IV3, rho=IDN, pressure=IPR)
        if self.mhd:
            comps.update(B_x=IB1, B_y=IB2, B_z=IB3)
        state = dict(state)
        x, y, z = state["x"], state["y"], state["z"]
        act = state["active"]
        for name, c in comps.items():
            state[name] = jnp.where(
                act, self._interp(prim, c, x, y, z, origins), 0.0)
        return state

    def fill(self, state, prim):
        if state is None:
            return None
        return self._fill(state, prim)


def compact_swarm(state, variables):
    """Host-side compaction of active particles for output: returns
    {name: np.ndarray[n_active]} in (block, slot) order."""
    active = np.asarray(state["active"]).reshape(-1)
    out = {}
    for name in variables:
        if name not in state:
            raise KeyError(f"unknown tracer variable '{name}'")
        q = np.asarray(state[name])
        out[name] = q.reshape((active.size,) + q.shape[2:])[active]
    return out
