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
    # NOTE: the t=0 tower-field injection lives in pgen._init_cons (the
    # float attribute ``self.initial_field`` holds the field amplitude; a
    # method of the same name would be shadowed by it).

    def tower_partials(self, u, bt, cell_volume, valid=None):
        """(linear, quadratic) contributions of one leaf group to the
        global magnetic-energy quadratic dME = f*linear + f^2*quad
        (the reference's per-rank reduction, ``hydro_driver.cpp:409-449``).
        ``valid`` masks out ghost zones; ``cell_volume`` is per-group."""
        bx_t, by_t, bz_t = bt
        m = 1.0 if valid is None else valid
        linear = jnp.sum((u[:, IB1] * bx_t + u[:, IB2] * by_t
                          + u[:, IB3] * bz_t) * m) * cell_volume
        quad = 0.5 * jnp.sum((bx_t ** 2 + by_t ** 2 + bz_t ** 2) * m) \
            * cell_volume
        return linear, quad

    @staticmethod
    def scale_from_power(linear, quad, power, beta_dt):
        """Solve f*linear + f^2*quad = power*beta_dt for the field scale."""
        target = power * beta_dt
        disc = jnp.sqrt(jnp.maximum(linear ** 2 + 4 * quad * target, 0.0))
        return jnp.where(quad > 0,
                         (-linear + disc) / (2 * jnp.maximum(quad, 1e-300)),
                         0.0)

    def apply_scaled(self, u, f, bt, mass_rate, beta_dt, t, xb, yb, zb):
        """Inject dB = f * T(x) (+ Gaussian mass) into one leaf group.
        ``mass_rate`` may be a traced scalar (AGN-triggered rate)."""
        bx_t, by_t, bz_t = bt
        db1, db2, db3 = f * bx_t, f * by_t, f * bz_t
        u = u.at[:, IEN].add(u[:, IB1] * db1 + u[:, IB2] * db2
                             + u[:, IB3] * db3
                             + 0.5 * (db1 ** 2 + db2 ** 2 + db3 ** 2))
        u = u.at[:, IB1].add(db1)
        u = u.at[:, IB2].add(db2)
        u = u.at[:, IB3].add(db3)
        if self.l_mass_scale > 0.0:
            rate = jnp.where(mass_rate > 0.0, mass_rate,
                             self.fixed_mass_rate)
            norm = jnp.pi ** 1.5 * self.l_mass_scale ** 3
            drho = beta_dt * self._mass_density(xb, yb, zb, t, rate) / norm
            u = u.at[:, IDN].add(drho)
        return u

    def power_src_term(self, u, power, mass_rate, beta_dt, t, xb, yb, zb,
                       cell_volume, valid=None):
        """Inject dB = f * T(x) with f chosen so the global magnetic-energy
        increase equals power * beta_dt (PowerSrcTerm).  Also injects mass
        with the Gaussian profile.  (Single-group convenience; multi-level
        meshes combine ``tower_partials`` across groups instead.)"""
        bt = self.unit_field(xb, yb, zb, t)
        if power > 0.0 or self.fixed_field_rate != 0.0:
            if power > 0.0:
                linear, quad = self.tower_partials(u, bt, cell_volume, valid)
                f = self.scale_from_power(linear, quad, power, beta_dt)
            else:
                f = self.fixed_field_rate * beta_dt
            return self.apply_scaled(u, f, bt, mass_rate, beta_dt, t,
                                     xb, yb, zb)
        if self.l_mass_scale > 0.0:
            rate = jnp.where(mass_rate > 0.0, mass_rate,
                             self.fixed_mass_rate)
            norm = jnp.pi ** 1.5 * self.l_mass_scale ** 3
            drho = beta_dt * self._mass_density(xb, yb, zb, t, rate) / norm
            u = u.at[:, IDN].add(drho)
        return u
