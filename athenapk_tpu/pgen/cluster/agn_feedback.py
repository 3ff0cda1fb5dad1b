"""AGN feedback: kinetic jet + thermal dump + magnetic tower fractions
(reference ``src/pgen/cluster/agn_feedback.cpp``).

Power = fixed_power + efficiency * Mdot * c^2 (Mdot from AGNTriggering);
mass rate = Mdot (1 - efficiency) + fixed_power / (efficiency c^2).
Thermal: uniform energy/mass dump inside thermal_radius.  Kinetic: paired
jet slabs (radius/thickness/offset in the precessing jet frame) receive
density + momentum + energy.  Magnetic: tower injection (power-scaled).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ...core.indices import IDN, IM1, IM2, IM3, IEN


class AGNFeedback:
    def __init__(self, pin, units, jet_coords, magnetic_tower,
                 mbar_over_kb, gamma, block="problem/cluster/agn_feedback"):
        self.fixed_power = pin.get_or_add_real(block, "fixed_power", 0.0)
        self.efficiency = pin.get_or_add_real(block, "efficiency", 1e-3)
        self.thermal_fraction = pin.get_or_add_real(block,
                                                    "thermal_fraction", 0.0)
        self.kinetic_fraction = pin.get_or_add_real(block,
                                                    "kinetic_fraction", 0.0)
        self.magnetic_fraction = pin.get_or_add_real(block,
                                                     "magnetic_fraction", 0.0)
        total = (self.thermal_fraction + self.kinetic_fraction
                 + self.magnetic_fraction)
        if total > 0:
            self.thermal_fraction /= total
            self.kinetic_fraction /= total
            self.magnetic_fraction /= total
        if (self.thermal_fraction < 0 or self.kinetic_fraction < 0
                or self.magnetic_fraction < 0):
            raise ValueError("AGN feedback energy fractions must be "
                             "non-negative")
        # mass deposition fractions: by default mirror the energy
        # fractions; disabling tower mass injection renormalizes over
        # thermal+kinetic (agn_feedback.cpp:57-82)
        if pin.get_or_add_bool(block, "enable_magnetic_tower_mass_injection",
                               True):
            self.thermal_mass_fraction = self.thermal_fraction
            self.kinetic_mass_fraction = self.kinetic_fraction
            self.magnetic_mass_fraction = self.magnetic_fraction
        else:
            tk = self.thermal_fraction + self.kinetic_fraction
            tk = tk if tk > 0 else 1.0
            self.thermal_mass_fraction = self.thermal_fraction / tk
            self.kinetic_mass_fraction = self.kinetic_fraction / tk
            self.magnetic_mass_fraction = 0.0
        # passive-scalar AGN tracer: jet-launching cells get
        # concentration 1 (agn_feedback.cpp:374-376)
        self.enable_tracer = pin.get_or_add_bool(block, "enable_tracer",
                                                 False)
        if self.enable_tracer and pin.get_or_add_integer(
                "hydro", "nscalars", 0) != 1:
            raise ValueError("Enabling tracer for AGN feedback requires "
                             "hydro/nscalars=1 (agn_feedback.cpp:181)")
        self.thermal_radius = pin.get_or_add_real(block, "thermal_radius",
                                                  0.01)
        self.kinetic_jet_radius = pin.get_or_add_real(
            block, "kinetic_jet_radius", 0.01)
        self.kinetic_jet_thickness = pin.get_or_add_real(
            block, "kinetic_jet_thickness", 0.02)
        self.kinetic_jet_offset = pin.get_or_add_real(
            block, "kinetic_jet_offset", 0.02)
        # jet velocity/temperature pair (either may be derived)
        c = units.speed_of_light()
        kjt = pin.get_or_add_real(block, "kinetic_jet_temperature", -1.0)
        kjv = pin.get_or_add_real(block, "kinetic_jet_velocity", -1.0)
        gm1 = gamma - 1.0
        if kjv < 0 and kjt >= 0:
            e_jet = kjt / (mbar_over_kb * gm1)
            kjv = math.sqrt(max(2 * (self.efficiency * c * c
                                     - (1 - self.efficiency) * e_jet), 0.0))
        elif kjv >= 0:
            e_jet = max(self.efficiency * c * c
                        - 0.5 * kjv ** 2, 0.0) / max(1 - self.efficiency,
                                                     1e-300)
        else:
            kjv = math.sqrt(2 * self.efficiency) * c
            e_jet = 0.0
        self.kinetic_jet_velocity = kjv
        self.kinetic_jet_e = e_jet
        self.disabled = pin.get_or_add_bool(block, "disabled", False)
        self.jet_coords = jet_coords
        self.magnetic_tower = magnetic_tower
        self.units = units
        self.gamma = gamma

        self.triggering = None  # set by pgen after AGNTriggering built
        self._mesh_cell_volume = None

    def power_and_mass_rate(self, mdot):
        c2 = self.units.speed_of_light() ** 2
        power = self.fixed_power + mdot * self.efficiency * c2
        mass_rate = mdot * (1 - self.efficiency)
        if self.efficiency > 0:
            mass_rate = mass_rate + self.fixed_power / (self.efficiency * c2)
        return power, mass_rate

    def apply(self, u, prim, beta_dt, t, xb, yb, zb, mhd, valid=None):
        """Single-group (uniform mesh) entry: delegates to apply_groups."""
        group = dict(u=u, prim=prim, x=xb, y=yb, z=zb,
                     vol=self._mesh_cell_volume, valid=valid)
        return self.apply_groups([group], beta_dt, t, mhd)[0]

    def apply_groups(self, groups, beta_dt, t, mhd):
        """AGN feedback over multiple leaf groups (one per refinement
        level on SMR/AMR meshes).  Each group is a dict with keys
        ``u, prim, x, y, z, vol, valid`` (``vol`` = that group's cell
        volume, ``valid`` = interior mask or None).  Global reductions
        (accretion rate, tower energy quadratic) are volume-weighted sums
        of per-group partials — the cross-level analog of the reference's
        MPI_Allreduce wiring (``hydro_driver.cpp:360-449``).  Returns the
        list of updated ``u`` arrays in group order."""
        # A tower configured with only fixed_field_rate injects without
        # any fixed_power/triggering (the reference declares this path,
        # ``magnetic_tower.cpp:243-254`` FixedFieldSrcTerm, though never
        # wires it into its AGN task list; we make it live).
        fixed_field = (self.magnetic_fraction > 0
                       and self.magnetic_tower is not None
                       and self.magnetic_tower.fixed_field_rate != 0.0)
        if self.disabled or (self.fixed_power == 0.0
                             and self.triggering is None
                             and not fixed_field):
            return [g["u"] for g in groups]
        for g in groups:
            g["r"] = jnp.sqrt(g["x"] ** 2 + g["y"] ** 2 + g["z"] ** 2)

        # --- global accretion rate from combined per-group partials
        if self.triggering is not None and self.triggering.mode != "NONE":
            parts = [self.triggering.accretion_partials(
                g["prim"], g["r"], g["vol"], g["valid"]) for g in groups]
            totals = {k: sum(p[k] for p in parts) for k in parts[0]}
            mdot = self.triggering.rate_from_partials(totals)
        else:
            mdot = jnp.asarray(0.0)
        power, mass_rate = self.power_and_mass_rate(mdot)

        # --- magnetic tower scale from combined (linear, quad) partials
        tower_f = None
        tower_bt = None
        if mhd and self.magnetic_fraction > 0:
            tower_bt = [self.magnetic_tower.unit_field(g["x"], g["y"],
                                                       g["z"], t)
                        for g in groups]
            m_power = self.magnetic_fraction * power
            if self.fixed_power > 0 or self.triggering is not None:
                lq = [self.magnetic_tower.tower_partials(
                    g["u"], bt, g["vol"], g["valid"])
                    for g, bt in zip(groups, tower_bt)]
                linear = sum(l for l, _ in lq)
                quad = sum(q for _, q in lq)
                tower_f = self.magnetic_tower.scale_from_power(
                    linear, quad, m_power, beta_dt)
            else:
                tower_f = self.magnetic_tower.fixed_field_rate * beta_dt

        # --- Bondi mass removal needs the global region mass
        region_mass = None
        if (self.triggering is not None and self.triggering.mode
                not in ("NONE", "COLD_GAS") and self.triggering.remove_mass):
            region_mass = sum(self.triggering.region_mass(
                g["prim"], g["r"], g["vol"], g["valid"]) for g in groups)

        out = []
        for gi, g in enumerate(groups):
            u, r, xb, yb, zb = g["u"], g["r"], g["x"], g["y"], g["z"]

            # thermal dump inside thermal_radius
            if self.thermal_fraction > 0:
                vol = 4.0 / 3.0 * math.pi * self.thermal_radius ** 3
                de = self.thermal_fraction * power / vol * beta_dt
                drho = (self.thermal_mass_fraction * mass_rate / vol
                        * beta_dt)
                inside = r ** 2 <= self.thermal_radius ** 2
                u = u.at[:, IEN].add(jnp.where(inside, de, 0.0))
                # add density at fixed velocity: scale momenta, add KE
                rho = u[:, IDN]
                fac = jnp.where(inside, (rho + drho) / rho, 1.0)
                ke_old = 0.5 * (u[:, IM1] ** 2 + u[:, IM2] ** 2
                                + u[:, IM3] ** 2) / rho
                u = u.at[:, IDN].add(jnp.where(inside, drho, 0.0))
                for cidx in (IM1, IM2, IM3):
                    u = u.at[:, cidx].multiply(fac)
                u = u.at[:, IEN].add(jnp.where(inside, ke_old * (fac - 1.0),
                                               0.0))

            # kinetic jet slabs
            if self.kinetic_fraction > 0:
                rj, cth, sth, h = self.jet_coords.sim_to_jet(xb, yb, zb, t)
                in_jet = ((rj < self.kinetic_jet_radius)
                          & (jnp.abs(h) >= self.kinetic_jet_offset)
                          & (jnp.abs(h) <= self.kinetic_jet_offset
                             + self.kinetic_jet_thickness))
                scal = 1.0 / (2 * self.kinetic_jet_thickness * math.pi
                              * self.kinetic_jet_radius ** 2)
                jet_density = (self.kinetic_mass_fraction * mass_rate
                               * scal * beta_dt)
                jet_momentum = jet_density * self.kinetic_jet_velocity
                jet_feedback = self.kinetic_fraction * power * scal * beta_dt
                ax, ay, az = self.jet_coords.jet_vec_to_sim(
                    cth, sth, 0.0, 0.0, jnp.ones_like(h), t)
                sign = jnp.where(h > 0, 1.0, -1.0)
                u = u.at[:, IDN].add(jnp.where(in_jet, jet_density, 0.0))
                u = u.at[:, IM1].add(jnp.where(in_jet,
                                               jet_momentum * sign * ax, 0.0))
                u = u.at[:, IM2].add(jnp.where(in_jet,
                                               jet_momentum * sign * ay, 0.0))
                u = u.at[:, IM3].add(jnp.where(in_jet,
                                               jet_momentum * sign * az, 0.0))
                u = u.at[:, IEN].add(jnp.where(in_jet, jet_feedback, 0.0))
                if self.enable_tracer:
                    # reset the passive tracer to concentration 1 for
                    # ALL material in the launching region
                    # (agn_feedback.cpp:371-376)
                    from ...core.indices import NGLMMHD, NHYDRO
                    si = NGLMMHD if mhd else NHYDRO
                    u = u.at[:, si].set(jnp.where(in_jet, u[:, IDN],
                                                  u[:, si]))

            # magnetic tower (globally scaled field injection)
            if tower_f is not None:
                u = self.magnetic_tower.apply_scaled(
                    u, tower_f, tower_bt[gi],
                    self.magnetic_mass_fraction * mass_rate, beta_dt, t,
                    xb, yb, zb)

            # mass removal by the triggering region
            if self.triggering is not None:
                u = self.triggering.remove_accreted(
                    u, g["prim"], r, mdot, beta_dt, g["vol"],
                    region_mass=region_mass)
            out.append(u)
        return out
