"""SN Ia and stellar feedback for the cluster application (reference
``src/pgen/cluster/snia_feedback.cpp`` and ``stellar_feedback.cpp``).

SNIA: thermal energy + mass deposited in proportion to the BCG stellar
density profile (rates per unit BCG mass).

Stellar: cold dense gas inside [exclusion_radius, stellar_radius] is
converted to thermal energy at rate efficiency*c^2: its density is reset
to the threshold and the removed mass is returned as heat (at fixed
velocity + temperature).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.indices import IDN, IM1, IM2, IM3, IEN, IPR


class SNIAFeedback:
    def __init__(self, pin, units, bcg_gravity,
                 block="problem/cluster/snia_feedback"):
        self.power_per_bcg_mass = pin.get_or_add_real(
            block, "power_per_bcg_mass", 0.0)
        self.mass_rate_per_bcg_mass = pin.get_or_add_real(
            block, "mass_rate_per_bcg_mass", 0.0)
        self.disabled = pin.get_or_add_bool(block, "disabled", False)
        # BCG-only copy of the gravity profile (no NFW/SMBH)
        import copy
        self.bcg = copy.copy(bcg_gravity)
        self.bcg.include_nfw = False
        self.bcg.include_smbh = False
        if not self.disabled and (self.power_per_bcg_mass
                                  or self.mass_rate_per_bcg_mass):
            if self.bcg.which_bcg == "NONE":
                raise ValueError("SNIA feedback requires a BCG profile")

    def apply(self, u, prim, beta_dt, r):
        if self.disabled or (self.power_per_bcg_mass == 0.0
                             and self.mass_rate_per_bcg_mass == 0.0):
            return u
        bcg_rho = self.bcg.rho_from_r(r)
        de = self.power_per_bcg_mass * beta_dt * bcg_rho
        drho = self.mass_rate_per_bcg_mass * beta_dt * bcg_rho
        u = u.at[:, IEN].add(de)
        # add density at fixed velocity (momentum scales, KE grows)
        rho = u[:, IDN]
        fac = (rho + drho) / rho
        ke_old = 0.5 * (u[:, IM1] ** 2 + u[:, IM2] ** 2
                        + u[:, IM3] ** 2) / rho
        u = u.at[:, IDN].add(drho)
        for c in (IM1, IM2, IM3):
            u = u.at[:, c].multiply(fac)
        u = u.at[:, IEN].add(ke_old * (fac - 1.0))
        return u


class StellarFeedback:
    def __init__(self, pin, units, mu, mbar_over_kb,
                 block="problem/cluster/stellar_feedback"):
        self.stellar_radius = pin.get_or_add_real(block, "stellar_radius",
                                                  0.0)
        self.exclusion_radius = pin.get_or_add_real(block,
                                                    "exclusion_radius", 0.0)
        self.efficiency = pin.get_or_add_real(block, "efficiency", 0.0)
        self.n_thresh = pin.get_or_add_real(block,
                                            "number_density_threshold", 0.0)
        self.t_thresh = pin.get_or_add_real(block, "temperature_threshold",
                                            0.0)
        self.disabled = (self.stellar_radius == 0.0
                         and self.exclusion_radius == 0.0
                         and self.efficiency == 0.0
                         and self.n_thresh == 0.0 and self.t_thresh == 0.0)
        if not self.disabled and self.exclusion_radius == 0.0:
            self.exclusion_radius = pin.get_or_add_real(
                "problem/cluster/agn_triggering", "accretion_radius", 0.0)
        if not self.disabled and not all(
                (self.stellar_radius, self.exclusion_radius,
                 self.efficiency, self.n_thresh, self.t_thresh)):
            raise ValueError("stellar feedback requires all parameters set")
        self.mbar = mu * units.mh()
        self.mbar_over_kb = mbar_over_kb
        self.mass_to_energy = self.efficiency * units.speed_of_light() ** 2

    def apply(self, u, prim, beta_dt, r):
        if self.disabled:
            return u
        rho = prim[:, IDN]
        number_density = rho / self.mbar
        temp = self.mbar_over_kb * prim[:, IPR] / rho
        sel = ((r <= self.stellar_radius) & (r > self.exclusion_radius)
               & (number_density >= self.n_thresh)
               & (temp <= self.t_thresh))
        # reset density to the threshold; removed mass becomes heat
        delta_rho = jnp.where(sel, self.n_thresh * self.mbar - rho, 0.0)
        fac = (u[:, IDN] + delta_rho) / u[:, IDN]
        # momentum at fixed velocity, internal energy at fixed temperature
        ke_old = 0.5 * (u[:, IM1] ** 2 + u[:, IM2] ** 2
                        + u[:, IM3] ** 2) / u[:, IDN]
        eint_spec = prim[:, IPR] / ((5.0 / 3.0 - 1.0) * rho)  # e per mass
        u = u.at[:, IDN].add(delta_rho)
        for c in (IM1, IM2, IM3):
            u = u.at[:, c].multiply(fac)
        u = u.at[:, IEN].add(ke_old * (fac - 1.0) + delta_rho * eint_spec)
        u = u.at[:, IEN].add(-self.mass_to_energy * delta_rho)
        return u
