"""AGN triggering: accretion-rate estimation + mass removal (reference
``src/pgen/cluster/agn_triggering.{hpp,cpp}``).

Modes:
  COLD_GAS      — Mdot = M_cold(r < r_acc, T < T_thresh) / t_acc; the same
                  cells lose mass at rate rho/t_acc.
  BOOSTED_BONDI — Mdot = alpha 2 pi G^2 M_smbh^2 <rho> / (<v>^2+<cs>^2)^1.5
                  with mass-weighted means inside r_acc.
  BOOTH_SCHAYE  — as Bondi with alpha = (n/n0)^beta density boost.

The reference's per-cycle MPI_Allreduce of the accretion quantities
(``hydro_driver.cpp:360-394``) becomes jnp global sums.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ...core.indices import IDN, IM1, IM2, IM3, IEN, IPR, IV1, IV2, IV3


class AGNTriggering:
    def __init__(self, pin, units, mbar_over_kb, gamma,
                 block="problem/cluster/agn_triggering"):
        self.mode = pin.get_or_add_string(block, "triggering_mode", "NONE")
        self.gamma = gamma
        self.accretion_radius = pin.get_or_add_real(block,
                                                    "accretion_radius", 0.0)
        self.cold_temp_thresh = pin.get_or_add_real(block,
                                                    "cold_temp_thresh", 0.0)
        self.cold_t_acc = pin.get_or_add_real(block, "cold_t_acc", 0.0)
        self.bondi_alpha = pin.get_or_add_real(block, "bondi_alpha", 0.0)
        self.bondi_m_smbh = pin.get_or_add_real("problem/cluster/gravity",
                                                "m_smbh", 0.0)
        self.bondi_n0 = pin.get_or_add_real(block, "bondi_n0", 0.0)
        self.bondi_beta = pin.get_or_add_real(block, "bondi_beta", 0.0)
        self.accretion_cfl = pin.get_or_add_real(block, "accretion_cfl", 0.1)
        self.remove_mass = pin.get_or_add_bool(block, "removed_accreted_mass",
                                               True)
        self.mbar_over_kb = mbar_over_kb
        self.units = units
        self.mean_molecular_mass = mbar_over_kb * units.k_boltzmann()

    # ------------------------------------------------------------------
    def accretion_partials(self, prim, r, cell_volume, valid=None):
        """Per-group partial sums of the accretion reduction.

        ``cell_volume`` is the group's (per-level) cell volume; ``valid``
        is an optional broadcastable interior mask excluding ghost zones
        (on refined meshes a leaf group contributes only its interiors —
        the volume-weighted cross-level reduction of the reference's
        MPI_Allreduce, ``hydro_driver.cpp:360-394``).  Partials from
        multiple groups are combined by plain addition before
        ``rate_from_partials``."""
        inside = r < self.accretion_radius
        if valid is not None:
            inside = inside & valid
        rho = prim[:, IDN]
        if self.mode == "COLD_GAS":
            temp = self.mbar_over_kb * prim[:, IPR] / rho
            cold = inside & (temp <= self.cold_temp_thresh)
            return {"cold_mass":
                    jnp.sum(jnp.where(cold, rho, 0.0)) * cell_volume}
        # Bondi-like: mass-weighted sums inside the accretion region
        w = jnp.where(inside, rho, 0.0) * cell_volume
        v2 = prim[:, IV1] ** 2 + prim[:, IV2] ** 2 + prim[:, IV3] ** 2
        cs = jnp.sqrt(self.gamma * prim[:, IPR] / rho)
        return {"w": jnp.sum(w),
                "w_rho": jnp.sum(w * rho),
                "w_v": jnp.sum(w * jnp.sqrt(v2)),
                "w_cs": jnp.sum(w * cs)}

    def rate_from_partials(self, p):
        """Accretion rate from (summed) partials."""
        if self.mode == "COLD_GAS":
            return p["cold_mass"] / self.cold_t_acc
        total = jnp.maximum(p["w"], 1e-300)
        mean_rho = p["w_rho"] / total
        mean_v = p["w_v"] / total
        mean_cs = p["w_cs"] / total
        if self.mode == "BOOSTED_BONDI":
            alpha = self.bondi_alpha
        elif self.mode == "BOOTH_SCHAYE":
            n = mean_rho / self.mean_molecular_mass
            alpha = jnp.where(n < self.bondi_n0, 1.0,
                              (n / self.bondi_n0) ** self.bondi_beta)
        else:
            raise ValueError(f"unknown triggering mode {self.mode}")
        G = self.units.gravitational_constant()
        return (alpha * 2.0 * math.pi * G ** 2 * self.bondi_m_smbh ** 2
                * mean_rho / (mean_v ** 2 + mean_cs ** 2) ** 1.5)

    def accretion_rate(self, u, prim, r, cell_volume, valid=None):
        """Global accretion rate (jnp scalar; single-group convenience)."""
        if self.mode == "NONE":
            return jnp.asarray(0.0)
        return self.rate_from_partials(
            self.accretion_partials(prim, r, cell_volume, valid))

    def region_mass(self, prim, r, cell_volume, valid=None):
        inside = r < self.accretion_radius
        if valid is not None:
            inside = inside & valid
        return jnp.sum(jnp.where(inside, prim[:, IDN], 0.0)) * cell_volume

    def remove_accreted(self, u, prim, r, mdot, beta_dt, cell_volume,
                        region_mass=None):
        """Proportionally remove the accreted gas from the triggering
        region (``RemoveGas``).  ``region_mass`` may be passed in when the
        region spans multiple levels (global volume-weighted sum)."""
        if self.mode == "NONE" or not self.remove_mass:
            return u
        inside = r < self.accretion_radius
        rho = prim[:, IDN]
        if self.mode == "COLD_GAS":
            temp = self.mbar_over_kb * prim[:, IPR] / rho
            sel = inside & (temp <= self.cold_temp_thresh)
            frac = beta_dt / self.cold_t_acc
        else:
            sel = inside
            if region_mass is None:
                region_mass = self.region_mass(prim, r, cell_volume)
            region_mass = jnp.maximum(region_mass, 1e-300)
            frac = jnp.minimum(mdot * beta_dt / region_mass, 0.9)
        scale = jnp.where(sel, 1.0 - frac, 1.0)
        for c in (IDN, IM1, IM2, IM3, IEN):
            u = u.at[:, c].multiply(scale)
        return u
