"""Hydro stepping on a static refined mesh (two+-level SMR).

Per-level flux sweeps with level-scaled dx, coarse-fine flux correction
(the reference's ``Load/Send/Receive/SetFluxCorrections`` machinery,
``src/hydro/hydro_driver.cpp:507-531``): at every coarse face adjacent to
a refined region the coarse flux is replaced by the area-restricted fine
face fluxes, making the scheme conservative across level boundaries.

Same global dt on all levels (the Parthenon default); ghost fill via
``SmrState.fill_ghosts`` (restrict -> same -> prolong).

Round-1 scope: euler/glmmhd hyperbolic core + unsplit diffusion
(conduction/viscosity/resistivity, level-scaled dx, conservative through
the flux correction) + pointwise tabular cooling; periodic domains.
RKL2 super-time-stepping and coordinate-dependent sources on refined
meshes land round 2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.indices import GLMMHD, IDN, IPR
from ..eos.adiabatic import cons_to_prim, fast_magnetosonic_speed
from ..recon import reconstruct
from ..riemann import solve_riemann
from ..solver.integrators import INTEGRATORS
from .smr import SmrMesh, SmrState

_AXIS_OF_DIR = {1: -1, 2: -2, 3: -3}


class SmrHydro:
    def __init__(self, smesh: SmrMesh, cfg, eos, cooling=None,
                 diffusion=None):
        self.smesh = smesh
        self.cfg = cfg
        self.eos = eos
        self.cooling = cooling   # pointwise unsplit source (per stage)
        self.diffusion = (diffusion if diffusion is not None
                          and diffusion.any_enabled else None)
        if self.diffusion is not None \
                and self.diffusion.integrator == "rkl2":
            raise NotImplementedError(
                "RKL2 super-time-stepping on refined meshes: round 2 "
                "(use diffusion/integrator = unsplit)")
        # per-level mesh proxy for the diffusion operators (they read
        # dx / nx2 / nx3 / interior_slices only)
        import types
        b = smesh.base
        self._level_mesh = {
            lev: types.SimpleNamespace(
                dx=smesh.dx(lev), nx2=b.nx2, nx3=b.nx3,
                interior_slices=b.interior_slices)
            for lev in smesh.level_ids}
        self.state_mgr = SmrState(smesh, cfg.nvar)
        mask = [False] * cfg.nvar
        mask[IDN] = True
        mask[IPR] = True
        self._positivity_mask = jnp.asarray(mask)
        # flux-correction batches: one restricted write per (level, face)
        # group of coarse-fine sites (payload = the 4 face-touching fine
        # kids, octant-sorted, from the ghost-fill plans)
        import numpy as np
        loc_of = {}
        for lev, ids in smesh.level_ids.items():
            for li, gid in enumerate(ids):
                loc_of[gid] = (lev, li)
        fc = {}
        for lev in smesh.level_ids:
            for (li, face, kind, payload) in self.state_mgr._plans[lev]:
                if kind != "fine":
                    continue
                kids = sorted(payload)
                d_list, k_list, ocs = fc.setdefault(
                    (lev, face), ([], [], [oc for (oc, _) in kids]))
                d_list.append(li)
                k_list.append([loc_of[kid][1] for (_, kid) in kids])
        self._fc_batch = {
            key: (np.asarray(d, np.int32), np.asarray(k, np.int32), ocs)
            for key, (d, k, ocs) in fc.items()}
        self.step = jax.jit(self._step)

    # ----------------------------------------------------------------- core
    def _fluxes_level(self, prim, lev, c_h, recon):
        dx = self.smesh.dx(lev)
        out = {}
        if self.cfg.riemann == "none":
            # null solver (source-only runs; hydro_pkg.py:154-157)
            out = {d: jnp.zeros_like(prim) for d in (1, 2, 3)}
            return self._add_diff(out, prim, lev)
        for d in (1, 2, 3):
            axis = _AXIS_OF_DIR[d]
            qm, qp = reconstruct(recon, prim, axis, dx[d - 1],
                                 positivity_mask=self._positivity_mask)
            wl = jnp.roll(qp, 1, axis=axis)
            wr = qm
            out[d] = solve_riemann(self.cfg.riemann, self.cfg.fluid,
                                   self.eos, wl, wr, d, c_h=c_h,
                                   nscalars=self.cfg.nscalars)
        return self._add_diff(out, prim, lev)

    def _add_diff(self, fluxes, prim, lev):
        """Add diffusive fluxes (level-scaled dx) before flux
        correction, so coarse-fine conservation covers them too."""
        if self.diffusion is None:
            return fluxes
        from ..diffusion.diffusion import calc_diff_fluxes
        df = calc_diff_fluxes(self.diffusion, prim,
                              self._level_mesh[lev])
        for d, f in df.items():
            fluxes[d] = fluxes[d] + f
        return fluxes

    def _flux_correct(self, fluxes):
        """Replace coarse fluxes at coarse-fine faces with the 2x2
        transverse average of the matching fine face fluxes — batched:
        one gather + restricted write per (level, face) group."""
        b = self.smesh.base
        g = b.nghost
        nz, ny, nx = b.mbnx3, b.mbnx2, b.mbnx1
        nsz = {1: nx, 2: ny, 3: nz}

        for (lev, face), (d_arr, kidmat, ocs) in self._fc_batch.items():
            axis = 3 - face // 2            # 3=x, 2=y, 1=z (no var axis)
            d = {3: 1, 2: 2, 1: 3}[axis]
            lo = face % 2 == 0
            n = nsz[d]
            # coarse face index (co-indexed i = face i-1/2); fine face on
            # the kids' matching boundary
            cface = g if lo else g + n
            fface = g + n if lo else g
            tdims = [t for t in (1, 2, 3) if t != d]
            nops = kidmat.shape[0]
            Ff = fluxes[lev + 1][d][kidmat.reshape(-1)]
            idx = [slice(None)] * 5
            idx[5 + _AXIS_OF_DIR[d]] = fface
            for t in tdims:
                idx[5 + _AXIS_OF_DIR[t]] = slice(g, g + nsz[t])
            fine_face = Ff[tuple(idx)]      # [nops*4, nvar, tB, tA]
            rest = 0.25 * (fine_face[..., 0::2, 0::2]
                           + fine_face[..., 1::2, 0::2]
                           + fine_face[..., 0::2, 1::2]
                           + fine_face[..., 1::2, 1::2])
            rest = rest.reshape((nops, len(ocs)) + rest.shape[1:])
            t_shapes = [nsz[t] for t in sorted(tdims, reverse=True)]
            Fc = jnp.zeros((nops, rest.shape[2]) + tuple(t_shapes),
                           dtype=rest.dtype)
            for col, oc in enumerate(ocs):
                # quadrant position from the transverse octant bits
                offs = [((oc >> {1: 0, 2: 1, 3: 2}[t]) & 1) * (nsz[t] // 2)
                        for t in sorted(tdims, reverse=True)]
                Fc = Fc.at[:, :, offs[0]:offs[0] + rest.shape[3],
                           offs[1]:offs[1] + rest.shape[4]].set(
                    rest[:, col])
            F = fluxes[lev][d]
            widx = [d_arr, slice(None), slice(g, g + nz),
                    slice(g, g + ny), slice(g, g + nx)]
            widx[5 + _AXIS_OF_DIR[d]] = cface
            fluxes[lev] = dict(fluxes[lev])
            fluxes[lev][d] = F.at[tuple(widx)].set(Fc)
        return fluxes

    def _update_level(self, u0, u1, fluxes_lev, lev, gam0, gam1, beta_dt):
        dx = self.smesh.dx(lev)
        div = None
        for d in (1, 2, 3):
            F = fluxes_lev[d]
            dF = (jnp.roll(F, -1, axis=_AXIS_OF_DIR[d]) - F) / dx[d - 1]
            div = dF if div is None else div + dF
        return gam0 * u0 + gam1 * u1 - beta_dt * div

    def _step(self, state, dt, c_h):
        cfg = self.cfg
        tab = INTEGRATORS[cfg.integrator]
        u0 = dict(state)
        u1 = dict(state)
        for s in range(tab["nstages"]):
            recon = cfg.reconstruction
            if cfg.integrator == "vl2" and s == 0:
                recon = "dc"
            prims = {}
            flux = {}
            for lev in u0:
                u0f, prim = cons_to_prim(self.eos, u0[lev], cfg.fluid,
                                         cfg.nscalars)
                u0[lev] = u0f
                prims[lev] = prim
                flux[lev] = self._fluxes_level(prim, lev, c_h, recon)
            flux = self._flux_correct(flux)
            beta_dt = tab["beta"][s] * dt
            for lev in u0:
                u0[lev] = self._update_level(u0[lev], u1[lev], flux[lev],
                                             lev, tab["gam0"][s],
                                             tab["gam1"][s], beta_dt)
                if cfg.fluid == GLMMHD:
                    # Dedner psi damping, level-scaled mindx (the uniform
                    # path's glmmhd source; hydro_pkg.py:239-270)
                    from ..core.indices import IPS
                    mindx = min(self.smesh.dx(lev))
                    coeff = jnp.exp(-cfg.glmmhd_alpha * c_h * beta_dt
                                    / mindx)
                    u0[lev] = u0[lev].at[:, IPS].multiply(coeff)
                if self.cooling is not None:
                    # pointwise unsplit cooling per stage (the uniform
                    # path's ordering; hydro_pkg.py:296-298)
                    u0[lev] = self.cooling.apply(u0[lev], beta_dt,
                                                 cfg.fluid)
            u0 = self.state_mgr.fill_ghosts(u0)
        return u0

    # ------------------------------------------------------------------- dt
    def estimate_dt(self, state):
        cfg = self.cfg
        eos = self.eos
        b = self.smesh.base
        g = b.nghost
        min_dt = jnp.inf
        for lev, u in state.items():
            _, w = cons_to_prim(eos, u, cfg.fluid, cfg.nscalars)
            wi = w[:, :, g:-g, g:-g, g:-g]
            rho = wi[:, IDN]
            p = wi[:, IPR]
            dx = self.smesh.dx(lev)
            if cfg.fluid == GLMMHD:
                from ..core.indices import IB1, IB2, IB3
                b1, b2, b3 = wi[:, IB1], wi[:, IB2], wi[:, IB3]
                lam = (fast_magnetosonic_speed(eos, rho, p, b1, b2, b3),
                       fast_magnetosonic_speed(eos, rho, p, b2, b3, b1),
                       fast_magnetosonic_speed(eos, rho, p, b3, b1, b2))
            else:
                c = jnp.sqrt(eos.gamma * p / rho)
                lam = (c, c, c)
            for d in (1, 2, 3):
                min_dt = jnp.minimum(min_dt, jnp.min(
                    dx[d - 1] / (jnp.abs(wi[:, d]) + lam[d - 1])))
        min_dt = cfg.cfl * min_dt
        if self.diffusion is not None:
            from ..diffusion.diffusion import estimate_diff_dt
            for lev, u in state.items():
                _, w = cons_to_prim(eos, u, cfg.fluid, cfg.nscalars)
                min_dt = jnp.minimum(min_dt, estimate_diff_dt(
                    self.diffusion, w, self._level_mesh[lev], cfg.cfl))
        return min_dt

    # ------------------------------------------------------------ reductions
    def total_mass(self, state):
        b = self.smesh.base
        g = b.nghost
        total = 0.0
        for lev, u in state.items():
            vol = (self.smesh.dx(lev)[0] * self.smesh.dx(lev)[1]
                   * self.smesh.dx(lev)[2])
            total = total + jnp.sum(u[:, IDN, g:-g, g:-g, g:-g]) * vol
        return total
