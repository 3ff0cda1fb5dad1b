"""Magnetic tower injection (reference
``src/pgen/cluster/magnetic_tower.hpp``): Li et al. (2006) or donut
potential in the jet frame; fixed-field-rate or power-scaled injection
(the latter solves the global quadratic for the field scale so the
injected magnetic energy matches the requested power — the reference's
linear/quadratic-contribution reduction, ``hydro_driver.cpp:409-449``)."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.indices import IDN, IM1, IM2, IM3, IEN, IB1, IB2, IB3


class MagneticTower:
    def __init__(self, pin, units, jet_coords,
                 block="problem/cluster/magnetic_tower"):
        self.jet_coords = jet_coords
        self.potential = pin.get_or_add_string(block, "potential_type", "li")
        self.alpha = pin.get_or_add_real(block, "li_alpha", 0.0) \
            if self.potential == "li" else 0.0
        self.l_scale = pin.get_or_add_real(block, "l_scale", 0.0)
        self.offset = pin.get_or_add_real(block, "offset", 0.0)
        self.thickness = pin.get_or_add_real(block, "thickness", 0.0)
        self.initial_field = pin.get_or_add_real(block, "initial_field", 0.0)
        self.fixed_field_rate = pin.get_or_add_real(block, "fixed_field_rate",
                                                    0.0)
        self.fixed_mass_rate = pin.get_or_add_real(block, "fixed_mass_rate",
                                                   0.0)
        self.l_mass_scale = pin.get_or_add_real(block, "l_mass_scale", 0.0)

    # -------------------------------------------------------------- field
    def unit_field(self, x, y, z, t):
        """Tower B for field_=1 in simulation Cartesian components
        (``MagneticTowerObj::FieldInSimCart``)."""
        if self.l_scale <= 0:
            z0 = jnp.zeros_like(x)
            return z0, z0, z0
        jc = self.jet_coords
        r, cth, sth, h = jc.sim_to_jet(x, y, z, t)
        rl = r / self.l_scale
        hl = h / self.l_scale
        if self.potential == "donut":
            ex = jnp.exp(-rl ** 2)
            in_slab = (jnp.abs(h) >= self.offset) & (
                jnp.abs(h) <= self.offset + self.thickness)
            b_r = jnp.zeros_like(r)
            b_th = jnp.where(in_slab, 2.0 * rl * ex, 0.0)
            b_h = jnp.zeros_like(r)
        elif self.potential == "li":
            ex = jnp.exp(-rl ** 2 - hl ** 2)
            b_r = 2.0 * hl * rl * ex
            b_th = self.alpha * rl * ex
            b_h = 2.0 * (1.0 - rl ** 2) * ex
        else:
            raise ValueError(f"unknown tower potential {self.potential}")
        return jc.jet_vec_to_sim(cth, sth, b_r, b_th, b_h, t)

    def _mass_density(self, x, y, z, t, rate):
        if self.l_mass_scale <= 0:
            return 0.0
        jc = self.jet_coords
        r, _, _, h = jc.sim_to_jet(x, y, z, t)
        return rate * jnp.exp(-(r ** 2 + h ** 2) / self.l_mass_scale ** 2)

    # ------------------------------------------------------------- inject
    def initial_field(self, pin, mesh, u_np):
        """Add the t=0 tower field (host-side numpy path for the pgen)."""
        import numpy as np
        if self.initial_field == 0.0 or self.l_scale <= 0:
            return u_np
        x, y, z = mesh.cell_centers_mesh()
        shape = (mesh.nblocks,) + mesh.block_shape
        bx, by, bz = self.unit_field(
            jnp.asarray(np.broadcast_to(x, shape)),
            jnp.asarray(np.broadcast_to(y, shape)),
            jnp.asarray(np.broadcast_to(z, shape)), 0.0)
        u_np[:, IB1] += self.initial_field * np.asarray(bx)
        u_np[:, IB2] += self.initial_field * np.asarray(by)
        u_np[:, IB3] += self.initial_field * np.asarray(bz)
        return u_np

    def power_src_term(self, u, power, mass_rate, beta_dt, t, xb, yb, zb,
                       cell_volume):
        """Inject dB = f * T(x) with f chosen so the global magnetic-energy
        increase equals power * beta_dt (PowerSrcTerm).  Also injects mass
        with the Gaussian profile."""
        bx_t, by_t, bz_t = self.unit_field(xb, yb, zb, t)
        if power > 0.0 or self.fixed_field_rate != 0.0:
            if power > 0.0:
                # dME = f * linear + f^2 * quadratic = power * beta_dt
                linear = jnp.sum(u[:, IB1] * bx_t + u[:, IB2] * by_t
                                 + u[:, IB3] * bz_t) * cell_volume
                quad = 0.5 * jnp.sum(bx_t ** 2 + by_t ** 2 + bz_t ** 2) \
                    * cell_volume
                target = power * beta_dt
                disc = jnp.sqrt(jnp.maximum(linear ** 2 + 4 * quad * target,
                                            0.0))
                f = jnp.where(quad > 0, (-linear + disc) / (2 * jnp.maximum(
                    quad, 1e-300)), 0.0)
            else:
                f = self.fixed_field_rate * beta_dt
            db1, db2, db3 = f * bx_t, f * by_t, f * bz_t
            u = u.at[:, IEN].add(u[:, IB1] * db1 + u[:, IB2] * db2
                                 + u[:, IB3] * db3
                                 + 0.5 * (db1 ** 2 + db2 ** 2 + db3 ** 2))
            u = u.at[:, IB1].add(db1)
            u = u.at[:, IB2].add(db2)
            u = u.at[:, IB3].add(db3)
        rate = mass_rate if mass_rate > 0.0 else self.fixed_mass_rate
        if (rate and self.l_mass_scale > 0.0):
            norm = jnp.pi ** 1.5 * self.l_mass_scale ** 3
            drho = beta_dt * self._mass_density(xb, yb, zb, t, rate) / norm
            u = u.at[:, IDN].add(drho)
        return u
