"""Optically thin tabulated cooling (reference
``src/hydro/srcterms/tabular_cooling.{hpp,cpp}``).

Three integrators, as the reference:

* ``townsend`` — Townsend (2009) exact integration over piecewise power-law
  fits of the cooling curve (Y_k / alpha_k tables,
  ``tabular_cooling.cpp:233-265``, ``TownsendSrcTerm`` ``:489``) — fully
  vectorized here (the reference's per-cell bin-walk loops become prefix
  counts over the monotone Y_k / temps arrays).
* ``rk12`` / ``rk45`` — adaptive subcycling (``SubcyclingFixedIntSrcTerm``
  ``:291``) — vectorized as a masked lock-step ``lax.while_loop`` with
  per-cell sub-times and step sizes.

The table is a two-column text file (log10 T[K], log10 Lambda[cgs]),
evenly spaced in log T; Lambda is converted to code units via
``lambda_units_cgs`` and the <units> block.  de/dt = -Lambda(T) (X/m_h)^2
rho (per unit mass), T = mbar (gamma-1) e / k_B.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.indices import IDN, IM1, IM2, IM3, IEN, IB1, IB2, IB3, GLMMHD


class TabularCooling:
    def __init__(self, pin, units, gamma: float, mu: float,
                 he_mass_fraction: float, mbar_over_kb: float):
        c = "cooling"
        table_filename = pin.get_string(c, "table_filename")
        lambda_units_cgs = pin.get_real(c, "lambda_units_cgs")
        self.integrator = pin.get_or_add_string(c, "integrator", "rk12")
        self.max_iter = pin.get_or_add_integer(c, "max_iter", 100)
        self.cooling_time_cfl = pin.get_or_add_real(c, "cfl", 0.1)
        self.d_e_tol = pin.get_or_add_real(c, "d_e_tol", 1e-8)
        self.t_floor = pin.get_or_add_real("hydro", "Tfloor", -1.0)

        lambda_units = lambda_units_cgs / (
            units.erg() * units.cm() ** 3 / units.s())

        log_temps = []
        log_lambdas = []
        with open(table_filename) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                cols = line.split()
                if len(cols) != 2:
                    raise ValueError(f"cooling table: expected 2 columns, "
                                     f"got '{line}'")
                log_temps.append(float(cols[0]))
                log_lambdas.append(float(cols[1]) - math.log10(lambda_units))
        if len(log_temps) < 2:
            raise ValueError("cooling table too short")
        log_temps = np.asarray(log_temps)
        log_lambdas = np.asarray(log_lambdas)
        d = np.diff(log_temps)
        if np.any(d <= 0):
            raise ValueError("cooling table log_temp not increasing")
        # even-spacing tolerance (reference d_log_temp_tol,
        # tabular_cooling.cpp:65,179)
        d_log_temp_tol = pin.get_or_add_real(c, "d_log_temp_tol", 1e-8)
        if np.any(np.abs(d - d[0]) / d[0] > d_log_temp_tol):
            raise ValueError("cooling table log_temp not evenly spaced")

        self.n_temp = len(log_temps)
        self.log_temp_start = float(log_temps[0])
        self.log_temp_final = float(log_temps[-1])
        self.d_log_temp = float(d[0])
        self.log_lambdas = jnp.asarray(log_lambdas)

        # Townsend piecewise power-law fits (Townsend 2009 eqs A4-A7)
        lambdas = 10.0 ** log_lambdas
        temps = 10.0 ** log_temps
        nbins = self.n_temp - 1
        alpha_k = (np.log10(lambdas[1:]) - np.log10(lambdas[:-1])) / d
        if np.any(alpha_k == 1.0):
            raise ValueError("alpha_k == 1 special case not implemented "
                             "(matches reference)")
        Y_k = np.zeros(nbins)
        for i in range(nbins - 2, -1, -1):
            am1 = alpha_k[i] - 1.0
            step = (lambdas[nbins] / lambdas[i]) * (temps[i] / temps[nbins]) \
                * ((temps[i] / temps[i + 1]) ** am1 - 1.0) / am1
            Y_k[i] = Y_k[i + 1] - step
        self.temps = jnp.asarray(temps)
        self.lambdas = jnp.asarray(lambdas)
        self.alpha_k = jnp.asarray(alpha_k)
        self.Y_k = jnp.asarray(Y_k)
        self.lambda_final = float(lambdas[-1])
        self.temp_final = float(temps[-1])

        self.gamma = gamma
        self.mbar_gm1_over_kb = mbar_over_kb * (gamma - 1.0)
        self.x_h_over_mh2 = ((1.0 - he_mass_fraction) / units.mh()) ** 2

    # ------------------------------------------------------------------ DeDt
    def dedt(self, e, rho):
        """Specific-internal-energy loss rate (``CoolingTableObj::DeDt``).
        Below the table: 0; above: free-free-like Lambda ~ T^1/2 extension."""
        temp = self.mbar_gm1_over_kb * e
        log_temp = jnp.log10(jnp.maximum(temp, 1e-300))
        i = jnp.clip(((log_temp - self.log_temp_start)
                      / self.d_log_temp).astype(jnp.int32),
                     0, self.n_temp - 2)
        lt_i = self.log_temp_start + self.d_log_temp * i
        ll_i = self.log_lambdas[i]
        ll_ip1 = self.log_lambdas[i + 1]
        log_lambda_interp = ll_i + (log_temp - lt_i) * (ll_ip1 - ll_i) \
            / self.d_log_temp
        log_lambda_ext = (0.5 * log_temp - 0.5 * self.log_temp_final
                          + self.log_lambdas[-1])
        log_lambda = jnp.where(log_temp > self.log_temp_final,
                               log_lambda_ext, log_lambda_interp)
        lam = 10.0 ** log_lambda
        out = -lam * self.x_h_over_mh2 * rho
        invalid = (e < 0) | jnp.isnan(e) | (log_temp < self.log_temp_start)
        return jnp.where(invalid, 0.0, out)

    # -------------------------------------------------------------- selftest
    def test_cooling_table(self, pin):
        """Deck-triggered table validation (``TestCoolingTable``,
        reference ``tabular_cooling.cpp:666-722`` — declared there but
        never wired into a caller; here ``<cooling> test_filename``
        triggers it at startup): evaluate de/dt on a log-spaced
        (rho, pres) grid and write '#rho pres internal_e de_dt' rows,
        so a table/units misconfiguration is visible before a long run.
        """
        import numpy as np
        c = "cooling"
        fn = pin.get_string(c, "test_filename")
        rho0 = pin.get_real(c, "test_rho0")
        rho1 = pin.get_real(c, "test_rho1")
        n_rho = pin.get_integer(c, "test_n_rho")
        pres0 = pin.get_real(c, "test_pres0")
        pres1 = pin.get_real(c, "test_pres1")
        n_pres = pin.get_integer(c, "test_n_pres")
        gm1 = self.gamma - 1.0
        j = np.arange(n_rho)[:, None]
        i = np.arange(n_pres)[None, :]
        rho = rho0 * (rho1 / rho0) ** (j / max(n_rho - 1, 1)) \
            * np.ones((1, n_pres))
        pres = pres0 * (pres1 / pres0) ** (i / max(n_pres - 1, 1)) \
            * np.ones((n_rho, 1))
        internal_e = pres / (rho * gm1)
        de_dt = np.asarray(self.dedt(jnp.asarray(internal_e),
                                     jnp.asarray(rho)))
        with open(fn, "w") as fh:
            fh.write("#rho pres internal_e de_dt\n")
            for jj in range(n_rho):
                for ii in range(n_pres):
                    fh.write(f"{rho[jj, ii]:.12g} {pres[jj, ii]:.12g} "
                             f"{internal_e[jj, ii]:.12g} "
                             f"{de_dt[jj, ii]:.12g}\n")
        return rho, pres, internal_e, de_dt

    # ------------------------------------------------------------- internals
    def _internal_e(self, cons, is_mhd):
        rho = cons[:, IDN]
        ie = cons[:, IEN] - 0.5 * (cons[:, IM1] ** 2 + cons[:, IM2] ** 2
                                   + cons[:, IM3] ** 2) / rho
        if is_mhd:
            ie = ie - 0.5 * (cons[:, IB1] ** 2 + cons[:, IB2] ** 2
                             + cons[:, IB3] ** 2)
        return ie / rho, rho

    # ------------------------------------------------------------- integrate
    def apply(self, cons, dt, fluid: str):
        """Return cons with the cooling source applied over dt."""
        is_mhd = fluid == GLMMHD
        e0, rho = self._internal_e(cons, is_mhd)
        if self.integrator == "townsend":
            e1 = self._townsend(e0, rho, dt)
        elif self.integrator in ("rk12", "rk45"):
            e1 = self._subcycle(e0, rho, dt)
        else:
            raise ValueError(f"unknown cooling integrator {self.integrator}")
        return cons.at[:, IEN].add(rho * (e1 - e0))

    def _townsend(self, e0, rho, dt):
        """Exact Townsend (2009) update, vectorized."""
        mgk = self.mbar_gm1_over_kb
        temp_cool_floor = 10.0 ** self.log_temp_start
        e_floor = self.t_floor / mgk if self.t_floor > 0 else -jnp.inf

        temp = mgk * e0
        nbins = self.n_temp - 1
        # idx: last bin whose upper edge is below temp (bin-walk up)
        idx = jnp.clip(
            jnp.sum(self.temps[1:][None, ...]
                    < temp[..., None], axis=-1).astype(jnp.int32),
            0, nbins - 1)
        a_m1 = self.alpha_k[idx] - 1.0
        lam_fin = self.lambda_final
        t_fin = self.temp_final
        tef = self.Y_k[idx] + (lam_fin / self.lambdas[idx]) \
            * (self.temps[idx] / t_fin) \
            * ((self.temps[idx] / temp) ** a_m1 - 1.0) / a_m1
        n_h2_by_rho = rho * self.x_h_over_mh2
        tef_adj = tef + lam_fin * dt / t_fin * mgk * n_h2_by_rho
        # bin-walk down: largest k with Y_k[k] >= tef_adj (Y_k descending)
        kstar = jnp.sum(self.Y_k[None, ...] >= tef_adj[..., None],
                        axis=-1).astype(jnp.int32) - 1
        idx2 = jnp.minimum(idx, jnp.maximum(kstar, 0))
        one_m_a = 1.0 - self.alpha_k[idx2]
        temp_new = self.temps[idx2] * (
            1.0 - one_m_a * (self.lambdas[idx2] / lam_fin)
            * (t_fin / self.temps[idx2]) * (tef_adj - self.Y_k[idx2])
        ) ** (1.0 / one_m_a)
        e_new = jnp.where(temp_new > temp_cool_floor,
                          temp_new / mgk, temp_cool_floor / mgk)
        # floor handling + skip cells below table start
        e_new = jnp.where(temp < temp_cool_floor, e0, e_new)
        e_new = jnp.where(e0 <= e_floor, jnp.maximum(e0, e_floor), e_new)
        return e_new

    def _subcycle(self, e0, rho, dt):
        """Adaptive RK12/RK45 subcycling, lock-step vectorized
        (``SubcyclingFixedIntSrcTerm``).  Per-cell adaptive sub-dt with a
        shared while_loop; finished cells are masked out."""
        temp_cool_floor = 10.0 ** self.log_temp_start
        e_floor_t = self.t_floor / self.mbar_gm1_over_kb \
            if self.t_floor > 0 else 0.0
        e_floor = max(e_floor_t, temp_cool_floor / self.mbar_gm1_over_kb)
        min_sub_dt = dt / self.max_iter
        tol = self.d_e_tol

        def f(e):
            return self.dedt(e, rho)

        def rk12(e, h):
            k1 = f(e)
            e1l = e + h * k1
            e1h = e + 0.5 * h * (k1 + f(e1l))
            return e1h, e1l

        def rk45(e, h):
            k1 = h * f(e)
            k2 = h * f(e + 0.25 * k1)
            k3 = h * f(e + 3.0 / 32.0 * k1 + 9.0 / 32.0 * k2)
            k4 = h * f(e + 1932.0 / 2197.0 * k1 - 7200.0 / 2197.0 * k2
                       + 7296.0 / 2197.0 * k3)
            k5 = h * f(e + 439.0 / 216.0 * k1 - 8.0 * k2
                       + 3680.0 / 513.0 * k3 - 845.0 / 4104.0 * k4)
            k6 = h * f(e - 8.0 / 27.0 * k1 + 2.0 * k2 - 3544.0 / 2565.0 * k3
                       + 1859.0 / 4104.0 * k4 - 11.0 / 40.0 * k5)
            y_l = e + 25.0 / 216.0 * k1 + 1408.0 / 2565.0 * k3 \
                + 2197.0 / 4104.0 * k4 - 0.2 * k5
            y_h = e + 16.0 / 135.0 * k1 + 6656.0 / 12825.0 * k3 \
                + 28561.0 / 56430.0 * k4 - 9.0 / 50.0 * k5 + 2.0 / 55.0 * k6
            return y_h, y_l

        step = rk45 if self.integrator == "rk45" else rk12
        order = 5.0 if self.integrator == "rk45" else 2.0

        def cond(state):
            _, sub_t, _, it = state
            # the reference's max_iter bounds accepted subcycles; rejected
            # attempts also consume iterations here, so allow headroom
            return jnp.logical_and(it < 4 * self.max_iter,
                                   jnp.any(sub_t < dt * (1 - 1e-12)))

        def body(state):
            e, sub_t, sub_dt, it = state
            active = (sub_t < dt * (1 - 1e-12)) & (f(e) != 0.0) & (e > e_floor)
            h = jnp.minimum(sub_dt, dt - sub_t)
            y_h, y_l = step(e, h)
            err = jnp.abs((y_h - y_l) / jnp.where(y_h != 0, y_h, 1.0))
            accept = active & ((err < tol) | (h <= min_sub_dt * (1 + 1e-12)))
            e = jnp.where(accept, jnp.maximum(y_h, e_floor), e)
            sub_t = jnp.where(accept, sub_t + h, sub_t)
            # optimal next step (0.95 * h * (tol/err)^order), clamped
            new_dt = 0.95 * h * (tol / jnp.maximum(err, 1e-300)) ** order
            new_dt = jnp.clip(new_dt, min_sub_dt, dt)
            sub_dt = jnp.where(active, new_dt, sub_dt)
            # finished/inactive cells stay put
            sub_t = jnp.where(active, sub_t, dt)
            return e, sub_t, sub_dt, it + 1

        e_fin, _, _, _ = jax.lax.while_loop(
            cond, body,
            (e0, jnp.zeros_like(e0), jnp.full_like(e0, dt), 0))
        return e_fin

    # ------------------------------------------------------------------- dt
    def estimate_timestep(self, prim, mesh):
        """cooling-CFL dt = cfl * min |e / (de/dt)|
        (``TabularCooling::EstimateTimeStep``)."""
        if self.cooling_time_cfl <= 0.0 or math.isnan(self.cooling_time_cfl):
            return jnp.inf
        from ..core.indices import IPR
        sl = mesh.interior_slices
        w = prim[sl]
        rho = w[:, IDN]
        gm1 = self.gamma - 1.0
        e = w[:, IPR] / (rho * gm1)
        dedt = self.dedt(e, rho)
        temp_cool_floor = 10.0 ** self.log_temp_start
        e_floor = max(self.t_floor, temp_cool_floor) / self.mbar_gm1_over_kb
        ct = jnp.where((dedt == 0) | (e < e_floor), jnp.inf,
                       jnp.abs(e / jnp.where(dedt != 0, dedt, 1.0)))
        return self.cooling_time_cfl * jnp.min(ct)
