"""Tracer particles on statically refined (SMR) meshes.

Extends the per-block swarm design of ``tracers.py`` to the mixed-level
leaf table: buffers are per-LEVEL batched ``{lev: {field: [nb_lev, cap]}}``
mirroring the fluid state layout, interpolation is leaf-local at the
leaf's own cell width, and migration routes particles across blocks AND
levels in one static-shape sort over the concatenated particle pool.
Ownership (which leaf holds a position) is resolved with per-level dense
lookup tables — ``tab[lev][c3, c2, c1] -> index in the level batch or
-1`` — scanned finest-to-coarsest, the flat-array analog of the
reference forest's ``GetNeighborBlockIndex`` walk.

The reference restricts tracers to non-adaptive meshes
(``src/tracers/tracers.cpp:77-79``); we match that — static refinement
only, enforced by the driver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.indices import IDN, IV1, IV2, IV3, IPR, IB1, IB2, IB3, GLMMHD


class SmrTracers:
    def __init__(self, pin, smesh, cfg):
        self.enabled = pin.get_or_add_bool("tracers", "enabled", False)
        self.smesh = smesh
        self.mhd = cfg.fluid == GLMMHD
        if not self.enabled:
            return
        base = smesh.base
        if base.nx3 == 1:
            raise ValueError("tracers currently only supported in 3D "
                             "(matches reference)")
        self.seed_method = pin.get_or_add_string(
            "tracers", "initial_seed_method", "none")
        self.num_per_cell = pin.get_or_add_real(
            "tracers", "initial_num_tracers_per_cell", 0.0)
        self.rng_seed = pin.get_or_add_integer("tracers",
                                               "initial_rng_seed", 0)
        self.cap_factor = pin.get_or_add_real("tracers", "capacity_factor",
                                              2.0)

        self.levels = sorted(smesh.level_ids)
        # concatenated-leaf-order offsets (sorted level, then batch order)
        self._leaf_off = {}
        c = 0
        for lev in self.levels:
            self._leaf_off[lev] = c
            c += len(smesh.level_ids[lev])
        self.total_leaves = c

        # per-level leaf origins and ownership lookup tables
        self._orig = {}
        self._tab = {}
        for lev in self.levels:
            ids = smesh.level_ids[lev]
            org = np.array([smesh.block_origin(g) for g in ids])
            self._orig[lev] = (jnp.asarray(org[:, 0]),
                               jnp.asarray(org[:, 1]),
                               jnp.asarray(org[:, 2]))
            s1, s2, s3 = smesh._scales(lev)
            n1, n2, n3 = base.nb1 * s1, base.nb2 * s2, base.nb3 * s3
            tab = np.full((n3, n2, n1), -1, np.int32)
            for i, g in enumerate(ids):
                tab[smesh.lx3[g], smesh.lx2[g], smesh.lx1[g]] = i
            self._tab[lev] = jnp.asarray(tab)

        self._advect = jax.jit(self._advect_impl)
        self._fill = jax.jit(self._fill_impl)

    # ------------------------------------------------------------------ seed
    def _field_names(self):
        names = ["vel_x", "vel_y", "vel_z", "rho", "pressure"]
        if self.mhd:
            names += ["B_x", "B_y", "B_z"]
        return names

    def seed(self):
        """Random-per-block seeding, one gid-seeded RNG stream per leaf.

        Finer leaves are smaller, so per-leaf seeding yields higher
        tracer density in refined regions — same as the reference, which
        seeds ``num_per_cell * cells_per_block`` per MeshBlock at any
        level."""
        if self.seed_method == "none":
            return None
        if self.seed_method != "random_per_block":
            raise ValueError(f"Unknown tracer initial_seed_method "
                             f"'{self.seed_method}' (SMR supports "
                             "random_per_block)")
        base = self.smesh.base
        n_cells = base.mbnx1 * base.mbnx2 * base.mbnx3
        n_per_block = int(n_cells * self.num_per_cell)
        if n_per_block <= 0:
            raise ValueError("initial_num_tracers_per_cell too small")
        cap = max(int(np.ceil(n_per_block * self.cap_factor)), n_per_block)
        self.cap = cap
        per_level = {}
        for lev in self.levels:
            ids = self.smesh.level_ids[lev]
            nb = len(ids)
            d1, d2, d3 = self.smesh.dx(lev)
            x = np.zeros((nb, cap))
            y = np.zeros((nb, cap))
            z = np.zeros((nb, cap))
            pid = np.full((nb, cap), -1, np.int32)
            active = np.zeros((nb, cap), bool)
            for i, g in enumerate(ids):
                rng = np.random.default_rng(int(g) + self.rng_seed)
                x0, y0, z0 = self.smesh.block_origin(g)
                x[i, :n_per_block] = x0 + rng.random(n_per_block) * (
                    base.mbnx1 * d1)
                y[i, :n_per_block] = y0 + rng.random(n_per_block) * (
                    base.mbnx2 * d2)
                z[i, :n_per_block] = z0 + rng.random(n_per_block) * (
                    base.mbnx3 * d3)
                pid[i, :n_per_block] = n_per_block * int(g) + np.arange(
                    n_per_block)
                active[i, :n_per_block] = True
            st = dict(x=jnp.asarray(x), y=jnp.asarray(y), z=jnp.asarray(z),
                      id=jnp.asarray(pid), active=jnp.asarray(active))
            for name in self._field_names():
                st[name] = jnp.zeros((nb, cap))
            per_level[lev] = st
        return {"levels": per_level, "n_lost": jnp.zeros((), jnp.int32)}

    # ---------------------------------------------------------------- interp
    def _interp(self, lev, prim, comp, x, y, z):
        """Leaf-local trilinear interpolation at level ``lev``'s cell
        width; stencils crossing the leaf edge read its (filled) ghosts,
        including prolongated coarse-fine copies."""
        base = self.smesh.base
        d1, d2, d3 = self.smesh.dx(lev)
        ox, oy, oz = self._orig[lev]
        field = prim[:, comp]
        fx = (x - ox[:, None]) / d1 + (base.ng1 - 0.5)
        fy = (y - oy[:, None]) / d2 + (base.ng2 - 0.5)
        fz = (z - oz[:, None]) / d3 + (base.ng3 - 0.5)
        i0f = jnp.floor(fx)
        j0f = jnp.floor(fy)
        k0f = jnp.floor(fz)
        wx = fx - i0f
        wy = fy - j0f
        wz = fz - k0f
        i0 = jnp.clip(i0f.astype(jnp.int32), 0, base.NX - 2)
        j0 = jnp.clip(j0f.astype(jnp.int32), 0, base.NY - 2)
        k0 = jnp.clip(k0f.astype(jnp.int32), 0, base.NZ - 2)
        b = jnp.arange(field.shape[0], dtype=jnp.int32)[:, None]
        out = 0.0
        for kk, wk in ((k0, 1 - wz), (k0 + 1, wz)):
            for jj, wj in ((j0, 1 - wy), (j0 + 1, wy)):
                for ii, wi in ((i0, 1 - wx), (i0 + 1, wx)):
                    out = out + field[b, kk, jj, ii] * (wk * wj * wi)
        return out

    def _wrap_or_drop(self, per_level, n_lost):
        base = self.smesh.base
        for lev, st in per_level.items():
            active = st["active"]
            for comp, lo, hi, per in (
                    ("x", base.x1min, base.x1max, base.ix1_bc == "periodic"),
                    ("y", base.x2min, base.x2max, base.ix2_bc == "periodic"),
                    ("z", base.x3min, base.x3max, base.ix3_bc == "periodic")):
                q = st[comp]
                if per:
                    st[comp] = lo + jnp.mod(q - lo, hi - lo)
                else:
                    escaped = active & ((q < lo) | (q >= hi))
                    n_lost = n_lost + jnp.sum(escaped).astype(jnp.int32)
                    active = active & ~escaped
            st["active"] = active
        return per_level, n_lost

    # --------------------------------------------------------------- migrate
    def _dest_col(self, x, y, z):
        """Concatenated-leaf-order destination index: the FINEST level
        whose lookup table has a leaf at the position wins."""
        base = self.smesh.base
        dest = jnp.full(x.shape, -1, jnp.int32)
        for lev in reversed(self.levels):
            s1, s2, s3 = self.smesh._scales(lev)
            w1 = base.mbnx1 * base.dx1 / s1
            w2 = base.mbnx2 * base.dx2 / s2
            w3 = base.mbnx3 * base.dx3 / s3
            c1 = jnp.clip(jnp.floor((x - base.x1min) / w1).astype(jnp.int32),
                          0, base.nb1 * s1 - 1)
            c2 = jnp.clip(jnp.floor((y - base.x2min) / w2).astype(jnp.int32),
                          0, base.nb2 * s2 - 1)
            c3 = jnp.clip(jnp.floor((z - base.x3min) / w3).astype(jnp.int32),
                          0, base.nb3 * s3 - 1)
            idx = self._tab[lev][c3, c2, c1]
            hit = (idx >= 0) & (dest < 0)
            dest = jnp.where(hit, self._leaf_off[lev] + idx, dest)
        return dest

    def _migrate(self, per_level, n_lost):
        """One stable key-sort over the concatenated particle pool routes
        particles across blocks and levels simultaneously."""
        cap = next(iter(per_level.values()))["x"].shape[1]
        tot = self.total_leaves
        n = tot * cap

        names = ["x", "y", "z", "id", "active"] + self._field_names()
        key_parts = []
        flat = {k: [] for k in names}
        for lev in self.levels:
            st = per_level[lev]
            col = self._dest_col(st["x"], st["y"], st["z"])
            key_parts.append(jnp.where(st["active"], col, tot)
                             .reshape(-1).astype(jnp.int32))
            for k in names:
                flat[k].append(st[k].reshape(-1))
        key = jnp.concatenate(key_parts)
        ops = [jnp.concatenate(flat[k]) for k in names]
        sorted_ops = jax.lax.sort([key] + ops, num_keys=1, is_stable=True)
        key_s, ops_s = sorted_ops[0], sorted_ops[1:]

        counts = jnp.bincount(key, length=tot + 1)
        starts = jnp.concatenate([jnp.zeros(1, counts.dtype),
                                  jnp.cumsum(counts)[:-1]])
        slot = jnp.arange(n) - starts[key_s]
        valid = (key_s < tot) & (slot < cap)
        dest = jnp.where(valid, key_s * cap + slot, n)

        out = {}
        for lev in self.levels:
            out[lev] = {}
        for k, q in zip(names, ops_s):
            if k == "active":
                newq = jnp.zeros(n, bool).at[dest].set(valid, mode="drop")
            else:
                newq = jnp.zeros(n, q.dtype).at[dest].set(q, mode="drop")
            for lev in self.levels:
                o = self._leaf_off[lev] * cap
                nb = len(self.smesh.level_ids[lev])
                out[lev][k if k != "active" else "active"] = \
                    newq[o:o + nb * cap].reshape(nb, cap)
        n_overflow = (jnp.sum(key_s < tot) - jnp.sum(valid)).astype(jnp.int32)
        return out, n_lost + n_overflow

    # ----------------------------------------------------------------- adopt
    def adopt(self, state):
        """Re-bin an existing tracer population onto THIS mesh topology.

        Adaptive-remesh support — this EXCEEDS the reference, which
        rejects tracers on adaptive meshes outright
        (``src/tracers/tracers.cpp:77-79``).  Positions are global
        coordinates, so after a remesh the new topology's tracer object
        adopts the old state: compact every level's buffers into one
        pool, route each active particle to its destination leaf with
        the NEW ownership tables (finest level covering the position
        wins), and pack per-leaf slots with one stable sort — the same
        static-shape machinery as per-cycle migration.  Identity,
        position, and field samples are preserved exactly; a particle
        whose position has no leaf (cannot happen on a covering forest)
        or that overflows a leaf's capacity counts as lost.
        """
        if state is None:
            return None
        old_levels = state["levels"]
        cap = next(iter(old_levels.values()))["x"].shape[1]
        self.cap = cap
        names = ["x", "y", "z", "id", "active"] + self._field_names()
        pool = {k: jnp.concatenate(
            [old_levels[lev][k].reshape(-1) for lev in sorted(old_levels)])
            for k in names}

        tot = self.total_leaves
        n = tot * cap
        npool = pool["x"].shape[0]
        dest = self._dest_col(pool["x"][None], pool["y"][None],
                              pool["z"][None])[0]
        key = jnp.where(pool["active"] & (dest >= 0), dest, tot) \
            .astype(jnp.int32)
        ops = [pool[k] for k in names]
        sorted_ops = jax.lax.sort([key] + ops, num_keys=1, is_stable=True)
        key_s, ops_s = sorted_ops[0], sorted_ops[1:]

        counts = jnp.bincount(key, length=tot + 1)
        starts = jnp.concatenate([jnp.zeros(1, counts.dtype),
                                  jnp.cumsum(counts)[:-1]])
        slot = jnp.arange(npool) - starts[key_s]
        valid = (key_s < tot) & (slot < cap)
        out_pos = jnp.where(valid, key_s * cap + slot, n)

        per_level = {lev: {} for lev in self.levels}
        for k, q in zip(names, ops_s):
            if k == "active":
                newq = jnp.zeros(n, bool).at[out_pos].set(valid,
                                                          mode="drop")
            else:
                newq = jnp.zeros(n, q.dtype).at[out_pos].set(q,
                                                             mode="drop")
            for lev in self.levels:
                o = self._leaf_off[lev] * cap
                nb = len(self.smesh.level_ids[lev])
                per_level[lev][k] = newq[o:o + nb * cap].reshape(nb, cap)
        n_lost = state["n_lost"] + (jnp.sum(key_s < tot)
                                    - jnp.sum(valid)).astype(jnp.int32)
        return {"levels": per_level, "n_lost": n_lost}

    # ---------------------------------------------------------------- advect
    def _advect_impl(self, state, prims, dt):
        """Heun per level with the stored velocity as predictor, then
        domain BCs and cross-level migration."""
        per_level = {lev: dict(st) for lev, st in state["levels"].items()}
        for lev, st in per_level.items():
            w = prims[lev]
            x, y, z = st["x"], st["y"], st["z"]
            x_s = x + dt * st["vel_x"]
            y_s = y + dt * st["vel_y"]
            z_s = z + dt * st["vel_z"]
            vx_s = self._interp(lev, w, IV1, x_s, y_s, z_s)
            vy_s = self._interp(lev, w, IV2, x_s, y_s, z_s)
            vz_s = self._interp(lev, w, IV3, x_s, y_s, z_s)
            st["x"] = x + dt * 0.5 * (st["vel_x"] + vx_s)
            st["y"] = y + dt * 0.5 * (st["vel_y"] + vy_s)
            st["z"] = z + dt * 0.5 * (st["vel_z"] + vz_s)
        per_level, n_lost = self._wrap_or_drop(per_level, state["n_lost"])
        per_level, n_lost = self._migrate(per_level, n_lost)
        return {"levels": per_level, "n_lost": n_lost}

    def advect(self, state, prims, dt):
        if state is None:
            return None
        return self._advect(state, prims, jnp.asarray(dt))

    # ------------------------------------------------------------------ fill
    def _fill_impl(self, state, prims):
        comps = dict(vel_x=IV1, vel_y=IV2, vel_z=IV3, rho=IDN, pressure=IPR)
        if self.mhd:
            comps.update(B_x=IB1, B_y=IB2, B_z=IB3)
        per_level = {}
        for lev, st in state["levels"].items():
            st = dict(st)
            x, y, z = st["x"], st["y"], st["z"]
            act = st["active"]
            for name, c in comps.items():
                st[name] = jnp.where(
                    act, self._interp(lev, prims[lev], c, x, y, z), 0.0)
            per_level[lev] = st
        return {"levels": per_level, "n_lost": state["n_lost"]}

    def fill(self, state, prims):
        if state is None:
            return None
        return self._fill(state, prims)


def compact_swarm_smr(state, variables):
    """Host-side compaction of active particles across all levels."""
    out = {v: [] for v in variables}
    for lev in sorted(state["levels"]):
        st = state["levels"][lev]
        act = np.asarray(st["active"]).reshape(-1)
        for v in variables:
            if v not in st:
                raise KeyError(f"unknown tracer variable '{v}'")
            q = np.asarray(st[v])
            out[v].append(q.reshape((act.size,) + q.shape[2:])[act])
    return {v: np.concatenate(parts) for v, parts in out.items()}
