"""Hydro stepping on a static refined mesh (two+-level SMR).

Per-level flux sweeps with level-scaled dx, coarse-fine flux correction
(the reference's ``Load/Send/Receive/SetFluxCorrections`` machinery,
``src/hydro/hydro_driver.cpp:507-531``): at every coarse face adjacent to
a refined region the coarse flux is replaced by the area-restricted fine
face fluxes, making the scheme conservative across level boundaries.

Same global dt on all levels (the Parthenon default); ghost fill via
``SmrState.fill_ghosts`` (restrict -> same -> prolong).

Round-1 scope: euler/glmmhd hyperbolic core + diffusion
(conduction/viscosity/resistivity, level-scaled dx, conservative through
the flux correction; unsplit or RKL2 super-time-stepping) + pointwise
tabular cooling; periodic/outflow/reflecting domains.
Coordinate-dependent sources and custom problem BCs on refined meshes
land round 2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.indices import GLMMHD, IDN, IPR
from ..eos.adiabatic import cons_to_prim, fast_magnetosonic_speed
from ..recon import reconstruct
from ..riemann import solve_riemann
from ..solver.hydro_pkg import first_order_flux_correct, fofc_bad_cells
from ..solver.integrators import INTEGRATORS
from .smr import SmrMesh, SmrState

_AXIS_OF_DIR = {1: -1, 2: -2, 3: -3}


class SmrHydro:
    def __init__(self, smesh: SmrMesh, cfg, eos, cooling=None,
                 diffusion=None, problem_source_unsplit=None,
                 problem_source_first_order=None,
                 problem_source_strang=None, custom_bcs=None):
        self.smesh = smesh
        self.cfg = cfg
        self.eos = eos
        self.cooling = cooling   # pointwise unsplit source (per stage)
        # per-level problem source: src(state, prims, beta_dt, t) -> state
        # (coordinate-dependent sources get per-leaf centers; see
        # pgen.cluster.problem_source_unsplit_smr)
        self.problem_source_unsplit = problem_source_unsplit
        # split sources: src(state, dt, t) -> state.  Stored here (and
        # rebuilt per remesh by AmrHydro) but APPLIED by the driver loop
        # OUTSIDE the jitted step — split sources may do host-side work
        # (rand_blast's schedule branch, turbulence's host RNG), exactly
        # like the uniform path (driver.py run loop).  First-order runs
        # once per cycle at full dt after the last stage
        # (AddSplitSourcesFirstOrder, hydro_driver.cpp:548-561); Strang
        # runs before stage 1 AND after the last stage
        # (AddSplitSourcesStrang, hydro_driver.cpp:460-470,548-553).
        self.problem_source_first_order = problem_source_first_order
        self.problem_source_strang = problem_source_strang
        self.diffusion = (diffusion if diffusion is not None
                          and diffusion.any_enabled else None)
        self.sts = (self.diffusion is not None
                    and self.diffusion.integrator == "rkl2")
        # per-level mesh proxy for the diffusion operators (they read
        # dx / nx2 / nx3 / interior_slices only)
        import types
        b = smesh.base
        self._level_mesh = {
            lev: types.SimpleNamespace(
                dx=smesh.dx(lev), nx2=b.nx2, nx3=b.nx3,
                interior_slices=b.interior_slices)
            for lev in smesh.level_ids}
        self.state_mgr = SmrState(smesh, cfg.nvar, custom_bcs=custom_bcs)
        # static tuple (Pallas-legal; see hydro_pkg._positivity_mask)
        mask = [False] * cfg.nvar
        mask[IDN] = True
        mask[IPR] = True
        self._positivity_mask = tuple(mask)
        # active flux directions (2-D/1-D decks have no y/z sweeps) and
        # per-direction ghost counts (inactive dims carry no ghosts)
        b = smesh.base
        self._dirs = tuple(d for d, n in ((1, b.nx1), (2, b.nx2),
                                          (3, b.nx3)) if n > 1)
        self._act = {1: True, 2: b.nx2 > 1, 3: b.nx3 > 1}
        self._g_of_dir = {1: b.ng1, 2: b.ng2, 3: b.ng3}
        # interior-cell mask [1,1,NZ,NY,NX] for the first-order rescue
        im = jnp.zeros(b.block_shape, dtype=bool)
        isl = tuple(slice(gx, dim - gx) if gx else slice(None)
                    for gx, dim in zip((b.ng3, b.ng2, b.ng1),
                                       b.block_shape))
        self._interior_mask = im.at[isl].set(True)[None, None]
        # interior slices of [nb, nvar, NZ, NY, NX] per-level arrays
        self._int_sl = (slice(None), slice(None)) + isl
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
        import os as _os
        self._stage_jits = {}
        # Whole-step composition is the default; =split runs each stage
        # and fill as separate dispatches (sum-of-parts cost, immune to
        # cross-phase copy-insertion — see _step_split's docstring).
        # Measured at the AMR bench geometry with the lane-packed stage
        # kernels: composed 45.0 ms vs split 56.0 ms per cycle.
        if _os.environ.get("ATHENAPK_SMR_STEP") == "split":
            self.step = self._step_split
        else:
            self.step = jax.jit(self._step)
        # jitted ghost fill for the driver loop's post-split-source
        # refill (split sources touch interiors outside the jitted step)
        self.fill_ghosts = jax.jit(self.state_mgr.fill_ghosts)
        # jitted dt estimates: the eager per-op dispatch of the whole
        # per-level reduction chain was a per-cycle host-side cost
        self.estimate_dt = jax.jit(self._estimate_dt_impl)
        self.dt_pack = jax.jit(self._dt_pack_impl)
        self.estimate_dt_with_diff = jax.jit(
            self._estimate_dt_with_diff_impl)
        self._rkl2_first = jax.jit(self._rkl2_first_impl,
                                   static_argnames=("s_rkl",))
        self._rkl2_other = jax.jit(self._rkl2_other_impl)

    # ------------------------------------------------------ fused lane sweep
    def _use_pallas_sweep(self, dtype=None):
        """Fused flux path selection on the refined mesh — same policy
        as the uniform path (``hydro_pkg._use_pallas_sweep``): env knob
        1/0 forces, unset means auto (f32 + TPU + x64 off).  Diffusion
        needs raw per-face fluxes everywhere, so it stays on the XLA
        path; FOFC runs as a per-level lax.cond rescue."""
        import os
        # 3-D and (since r5) 2-D refined meshes run fused; the 2-D
        # faces kernel exists only in the v2 family, so a forced
        # ATHENAPK_PALLAS_V2=0 keeps 2-D on XLA.  1-D SMR stays on XLA
        # (a lone lane sweep doesn't pay for a kernel).
        b = self.smesh.base
        eligible = (self.cfg.riemann != "none" and self.diffusion is None
                    and (b.ndim == 3
                         or (b.ndim == 2
                             and os.environ.get("ATHENAPK_PALLAS_V2")
                             != "0")))
        knob = os.environ.get("ATHENAPK_PALLAS_SWEEP")
        if knob == "1":
            return eligible
        if knob == "0":
            return False
        return (eligible
                and dtype == jnp.float32
                and not jax.config.jax_enable_x64
                and jax.default_backend() == "tpu")

    def _fused_negdiv_faces(self, recon, lev):
        """Per-(recon, level) correction-aware fused kernel (level-scaled
        dx); emits negdiv plus the boundary-face flux slabs that feed
        ``_slab_flux_correct``."""
        import os
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        key = (recon, lev)
        if key not in cache:
            from ..solver.pallas_sweep import (make_fused_negdiv_faces,
                                               make_fused_negdiv_faces_v2)
            interp = jax.default_backend() != "tpu"
            if os.environ.get("ATHENAPK_PALLAS_V2") != "0":
                # transpose-free halo-slab sweeps (face planes captured
                # at static local tile indices)
                cache[key] = make_fused_negdiv_faces_v2(
                    self.smesh.base.block_shape, self.smesh.dx(lev),
                    self.cfg, self.eos, self._positivity_mask, recon,
                    self.smesh.base.nghost,
                    tz=int(os.environ.get("ATHENAPK_PALLAS_TZ", "8")),
                    ty=int(os.environ.get("ATHENAPK_PALLAS_TY", "8")),
                    interpret=interp)
            else:
                cache[key] = make_fused_negdiv_faces(
                    self.smesh.base.block_shape, self.smesh.dx(lev),
                    self.cfg, self.eos, self._positivity_mask, recon,
                    self.smesh.base.nghost,
                    tz=int(os.environ.get("ATHENAPK_PALLAS_TZ", "1")),
                    ty=int(os.environ.get("ATHENAPK_PALLAS_TY", "8")),
                    interpret=interp)
        return cache[key]

    def _use_stage_fused(self):
        """Whole-stage fusion rung of the eligibility ladder on refined
        meshes: v2 kernels, 3-D blocks, no FOFC (its lax.cond rescue
        consumes the unfused prim/u0f operands).  Prim-consuming
        problem sources and the extended Dedner source are SERVED (the
        kernel emits prim) — unlike the uniform-path stage rung, which
        excludes them (``hydro_pkg._use_fused_stage``)."""
        import os
        b = self.smesh.base
        return (os.environ.get("ATHENAPK_PALLAS_V2") != "0"
                and os.environ.get("ATHENAPK_PALLAS_STAGE") != "0"
                and not self.cfg.first_order_flux_correct
                and b.nx2 > 1 and b.nx3 > 1)

    def _need_prim(self):
        """Does anything outside the stage kernel consume prim?"""
        return (self.problem_source_unsplit is not None
                or (self.cfg.fluid == GLMMHD
                    and self.cfg.glmmhd_source == "dedner_extended"))

    def _fused_stage_faces(self, recon, lev, emit_prim):
        """Per-(recon, level) whole-stage + face-capture kernel:
        cons->prim (floors) + the three transpose-free sweeps +
        boundary-face capture + the 2S axpy in ONE kernel
        (``make_fused_stage_faces``); the caller applies the
        coarse-fine slab deltas to ``u_new`` scaled by ``beta_dt``."""
        import os
        cache = getattr(self, "_stage_cache", None)
        if cache is None:
            cache = self._stage_cache = {}
        key = (recon, lev, emit_prim)
        if key not in cache:
            from ..solver.pallas_sweep import make_fused_stage_faces
            interp = jax.default_backend() != "tpu"
            cache[key] = make_fused_stage_faces(
                self.smesh.base.block_shape, self.smesh.dx(lev),
                self.cfg, self.eos, self._positivity_mask, recon,
                self.smesh.base.nghost,
                tz=int(os.environ.get("ATHENAPK_PALLAS_TZ", "8")),
                ty=int(os.environ.get("ATHENAPK_PALLAS_TY", "8")),
                interpret=interp, emit_prim=emit_prim)
        return cache[key]

    def _slabs_from_fluxes(self, fluxes):
        """Extract the boundary-face slabs (canonical layout of
        ``make_fused_negdiv_faces``) from full per-face flux arrays —
        the XLA/rescue branch's counterpart of the kernel's slab
        output."""
        b = self.smesh.base
        g = b.nghost
        nsz = {1: b.mbnx1, 2: b.mbnx2, 3: b.mbnx3}
        out = {}
        for d, F in fluxes.items():
            ax = 5 + _AXIS_OF_DIR[d]
            lo = [slice(None)] * 5
            lo[ax] = g
            hi = [slice(None)] * 5
            hi[ax] = g + nsz[d]
            out[d] = jnp.stack([F[tuple(lo)], F[tuple(hi)]], axis=-1)
        return out

    def _restrict_transverse(self, ff, tdims):
        """Average factor-2 along each ACTIVE transverse direction of a
        face slab whose LAST ``len(tdims)`` axes correspond to ``tdims``
        (array order).  Inactive (degenerate) dims pass through — the
        2-D coarse-fine correction averages pairs, not 2x2 quads."""
        out = ff
        nt = len(tdims)
        for k, t in enumerate(tdims):
            if not self._act[t]:
                continue
            ax = out.ndim - nt + k
            ev = [slice(None)] * out.ndim
            od = [slice(None)] * out.ndim
            ev[ax] = slice(0, None, 2)
            od[ax] = slice(1, None, 2)
            out = 0.5 * (out[tuple(ev)] + out[tuple(od)])
        return out

    def _slab_flux_correct(self, targets, slabs, scale=1.0):
        """Slab-based coarse-fine flux correction: restrict the fine
        boundary-face fluxes (2x2 transverse average), and add the
        resulting flux delta to the single interior cell layer adjacent
        to each corrected coarse face — algebraically identical to
        replacing the coarse flux before the divergence
        (``_flux_correct``), but without materializing full flux
        arrays (the fused path never does).  ``targets`` are the
        per-level negdivs (``scale=1``) or, on the whole-stage fused
        path, the freshly axpy'd ``u_new`` arrays with
        ``scale=beta_dt`` (u_new = ... + beta_dt*negdiv, so the same
        delta enters scaled)."""
        b = self.smesh.base
        nsz = {1: b.mbnx1, 2: b.mbnx2, 3: b.mbnx3}
        gd = self._g_of_dir

        targets = dict(targets)
        for (lev, face), (d_arr, kidmat, ocs) in self._fc_batch.items():
            axis = 3 - face // 2
            d = {3: 1, 2: 2, 1: 3}[axis]
            lo = face % 2 == 0
            g, n = gd[d], nsz[d]
            # fine kids' boundary face: hi end for a lo coarse face
            fidx = 1 if lo else 0
            cidx = 0 if lo else 1
            tdims = sorted([t for t in (1, 2, 3) if t != d], reverse=True)
            nops = kidmat.shape[0]
            Ff = slabs[lev + 1][d][kidmat.reshape(-1)]   # [nops*K,nvar,A,B,2]
            fine_face = Ff[:, :, gd[tdims[0]]:gd[tdims[0]] + nsz[tdims[0]],
                           gd[tdims[1]]:gd[tdims[1]] + nsz[tdims[1]], fidx]
            rest = self._restrict_transverse(fine_face, tdims)
            rest = rest.reshape((nops, len(ocs)) + rest.shape[1:])
            t_shapes = [nsz[t] for t in tdims]
            Fc = jnp.zeros((nops, rest.shape[2]) + tuple(t_shapes),
                           dtype=rest.dtype)
            for col, oc in enumerate(ocs):
                offs = [((oc >> {1: 0, 2: 1, 3: 2}[t]) & 1) * (nsz[t] // 2)
                        for t in tdims]
                Fc = Fc.at[:, :, offs[0]:offs[0] + rest.shape[3],
                           offs[1]:offs[1] + rest.shape[4]].set(rest[:, col])
            old = slabs[lev][d][d_arr][
                :, :, gd[tdims[0]]:gd[tdims[0]] + t_shapes[0],
                gd[tdims[1]]:gd[tdims[1]] + t_shapes[1], cidx]
            delta = (Fc - old) / self.smesh.dx(lev)[d - 1]
            # div_i = (F[i+1] - F[i])/dx: a lo coarse face (index g) is
            # the left face of interior cell g (negdiv += delta); a hi
            # face (index g+n) is the right face of cell g+n-1
            # (negdiv -= delta)
            layer = g if lo else g + n - 1
            widx = [d_arr, slice(None)] + list(self._int_sl[2:])
            widx[5 + _AXIS_OF_DIR[d]] = layer
            sign = 1.0 if lo else -1.0
            targets[lev] = targets[lev].at[tuple(widx)].add(
                sign * scale * delta)
        return targets

    # ----------------------------------------------------------------- core
    def _fluxes_level(self, prim, lev, c_h, recon):
        dx = self.smesh.dx(lev)
        out = {}
        if self.cfg.riemann == "none":
            # null solver (source-only runs; hydro_pkg.py:154-157)
            out = {d: jnp.zeros_like(prim) for d in self._dirs}
            return self._add_diff(out, prim, lev)
        for d in self._dirs:
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
        correction, so coarse-fine conservation covers them too.
        RKL2 runs handle diffusion in the Strang-wrapped super-step
        instead (hydro_pkg.py:169)."""
        if self.diffusion is None or self.sts:
            return fluxes
        from ..diffusion.diffusion import calc_diff_fluxes
        df = calc_diff_fluxes(self.diffusion, prim,
                              self._level_mesh[lev])
        for d, f in df.items():
            fluxes[d] = fluxes[d] + f
        return fluxes

    def _diff_div(self, state):
        """-div(F_diff) per level from ghost-filled cons (the RKL2
        operator M), with the diffusive fluxes coarse-fine corrected
        for conservation (hydro_pkg.py:429-437 uniform analog)."""
        from ..diffusion.diffusion import calc_diff_fluxes
        flux = {}
        for lev, u in state.items():
            _, prim = cons_to_prim(self.eos, u, self.cfg.fluid,
                                   self.cfg.nscalars)
            df = calc_diff_fluxes(self.diffusion, prim,
                                  self._level_mesh[lev])
            flux[lev] = {dirn: df.get(dirn, jnp.zeros_like(prim))
                         for dirn in self._dirs}
        flux = self._flux_correct(flux)
        out = {}
        for lev in state:
            dx = self.smesh.dx(lev)
            div = None
            for dirn in self._dirs:
                F = flux[lev][dirn]
                dF = (jnp.roll(F, -1, axis=_AXIS_OF_DIR[dirn])
                      - F) / dx[dirn - 1]
                div = dF if div is None else div + dF
            out[lev] = -div
        return out

    def _rkl2_first_impl(self, state, tau, s_rkl):
        """Y1 = Y0 + mu_tilde_1 tau M(Y0) (RKL2StepFirst analog)."""
        s = float(s_rkl)
        mu_tilde_1 = 4.0 / 3.0 / (s * s + s - 2.0)
        MY0 = self._diff_div(state)
        Y1 = {lev: state[lev] + mu_tilde_1 * tau * MY0[lev]
              for lev in state}
        return self.state_mgr.fill_ghosts(Y1), MY0

    def _rkl2_other_impl(self, Yjm1, Yjm2, Y0, MY0, coeffs, tau):
        """One RKL2 recursion stage (RKL2StepOther analog)."""
        mu_j, nu_j, mu_tilde_j, gamma_tilde_j = coeffs
        MYjm1 = self._diff_div(Yjm1)
        Yj = {lev: (mu_j * Yjm1[lev] + nu_j * Yjm2[lev]
                    + (1.0 - mu_j - nu_j) * Y0[lev]
                    + mu_tilde_j * tau * MYjm1[lev]
                    + gamma_tilde_j * tau * MY0[lev]) for lev in Y0}
        return self.state_mgr.fill_ghosts(Yj)

    def sts_half_step(self, state, tau, dt_diff: float):
        """RKL2 super-time-step over tau on the refined mesh (one half
        of the Strang wrap; mirrors hydro_pkg.sts_half_step)."""
        import math as _math
        s_rkl = int(0.5 * (_math.sqrt(9.0 + 16.0 * tau / dt_diff)
                           - 1.0)) + 1
        if s_rkl % 2 == 0:
            s_rkl += 1
        tau = jnp.asarray(tau)
        Y0 = state
        Yjm1, MY0 = self._rkl2_first(state, tau, s_rkl)
        Yjm2 = Y0
        s = float(s_rkl)
        w1 = 4.0 / (s * s + s - 2.0)
        b_jm1 = b_jm2 = 1.0 / 3.0
        for jj in range(2, s_rkl + 1):
            j = float(jj)
            b_j = (j * j + j - 2.0) / (2.0 * j * (j + 1.0))
            mu_j = (2.0 * j - 1.0) / j * b_j / b_jm1
            nu_j = -(j - 1.0) / j * b_j / b_jm2
            mu_tilde_j = mu_j * w1
            gamma_tilde_j = -(1.0 - b_jm1) * mu_tilde_j
            coeffs = (jnp.asarray(mu_j), jnp.asarray(nu_j),
                      jnp.asarray(mu_tilde_j), jnp.asarray(gamma_tilde_j))
            Yj = self._rkl2_other(Yjm1, Yjm2, Y0, MY0, coeffs, tau)
            Yjm2 = Yjm1
            Yjm1 = Yj
            b_jm2 = b_jm1
            b_jm1 = b_j
        return Yjm1

    def _flux_correct(self, fluxes):
        """Replace coarse fluxes at coarse-fine faces with the 2x2
        transverse average of the matching fine face fluxes — batched:
        one gather + restricted write per (level, face) group."""
        b = self.smesh.base
        nsz = {1: b.mbnx1, 2: b.mbnx2, 3: b.mbnx3}
        gd = self._g_of_dir

        for (lev, face), (d_arr, kidmat, ocs) in self._fc_batch.items():
            axis = 3 - face // 2            # 3=x, 2=y, 1=z (no var axis)
            d = {3: 1, 2: 2, 1: 3}[axis]
            lo = face % 2 == 0
            g, n = gd[d], nsz[d]
            # coarse face index (co-indexed i = face i-1/2); fine face on
            # the kids' matching boundary
            cface = g if lo else g + n
            fface = g + n if lo else g
            tdims = sorted([t for t in (1, 2, 3) if t != d], reverse=True)
            nops = kidmat.shape[0]
            Ff = fluxes[lev + 1][d][kidmat.reshape(-1)]
            idx = [slice(None)] * 5
            idx[5 + _AXIS_OF_DIR[d]] = fface
            for t in tdims:
                idx[5 + _AXIS_OF_DIR[t]] = slice(gd[t], gd[t] + nsz[t])
            fine_face = Ff[tuple(idx)]      # [nops*K, nvar, tB, tA]
            rest = self._restrict_transverse(fine_face, tdims)
            rest = rest.reshape((nops, len(ocs)) + rest.shape[1:])
            t_shapes = [nsz[t] for t in tdims]
            Fc = jnp.zeros((nops, rest.shape[2]) + tuple(t_shapes),
                           dtype=rest.dtype)
            for col, oc in enumerate(ocs):
                # quadrant position from the transverse octant bits
                offs = [((oc >> {1: 0, 2: 1, 3: 2}[t]) & 1) * (nsz[t] // 2)
                        for t in tdims]
                Fc = Fc.at[:, :, offs[0]:offs[0] + rest.shape[3],
                           offs[1]:offs[1] + rest.shape[4]].set(
                    rest[:, col])
            F = fluxes[lev][d]
            widx = [d_arr, slice(None)] + list(self._int_sl[2:])
            widx[5 + _AXIS_OF_DIR[d]] = cface
            fluxes[lev] = dict(fluxes[lev])
            fluxes[lev][d] = F.at[tuple(widx)].set(Fc)
        return fluxes

    def _update_level(self, u0, u1, fluxes_lev, lev, gam0, gam1, beta_dt):
        dx = self.smesh.dx(lev)
        div = None
        for d in self._dirs:
            F = fluxes_lev[d]
            dF = (jnp.roll(F, -1, axis=_AXIS_OF_DIR[d]) - F) / dx[d - 1]
            div = dF if div is None else div + dF
        return gam0 * u0 + gam1 * u1 - beta_dt * div

    def _fused_level_stage(self, lev, u0f, u1l, prim, c_h, recon,
                           gam0, gam1, beta_dt):
        """Fused-kernel (negdiv, slabs) for one level, with the optional
        DC+LLF rescue as a lax.cond: a level whose fused candidate has
        any rho<=0 / p<=0 interior cell re-runs through the XLA flux
        path + 4-pass rescue (slabs then come from the rescued fluxes,
        preserving the rescue-before-restrict task order)."""
        cfg = self.cfg
        nd, sl = self._fused_negdiv_faces(recon, lev)(prim, c_h)
        if not cfg.first_order_flux_correct:
            return nd, sl
        u_cand = gam0 * u0f + gam1 * u1l + beta_dt * nd
        bad = fofc_bad_cells(cfg, u_cand, self._interior_mask)
        dx = self.smesh.dx(lev)

        def _rescue(_):
            fl = self._fluxes_level(prim, lev, c_h, recon)
            fl = first_order_flux_correct(
                cfg, self.eos, self._dirs, _AXIS_OF_DIR,
                {d: dx[d - 1] for d in self._dirs}, self._interior_mask,
                u0f, u1l, prim, fl, gam0, gam1, beta_dt, c_h)
            div = None
            for dd in self._dirs:
                dF = (jnp.roll(fl[dd], -1, axis=_AXIS_OF_DIR[dd])
                      - fl[dd]) / dx[dd - 1]
                div = dF if div is None else div + dF
            return -div, self._slabs_from_fluxes(fl)

        return jax.lax.cond(jnp.any(bad), _rescue, lambda _: (nd, sl),
                            None)

    def _dedner_source_level(self, u, prim, beta_dt, c_h, lev):
        """Per-level Dedner source: psi damping with level-scaled mindx,
        plus the optional EXTENDED non-conservative divB terms (central
        differences of the stage-start prim; the uniform path's
        ``hydro_pkg._dedner_source``; reference
        ``src/hydro/glmmhd/dedner_source.cpp:17-79`` wires either
        variant for every mesh)."""
        cfg = self.cfg
        dx = self.smesh.dx(lev)
        coeff = jnp.exp(-cfg.glmmhd_alpha * c_h * beta_dt
                        / self.smesh.min_dx(lev))
        if cfg.glmmhd_source == "dedner_extended":
            from ..core.indices import IB1, IB2, IB3, IM1, IM2, IM3, \
                IEN, IPS

            def cdiff(q, d):
                ax = _AXIS_OF_DIR[d]
                return (jnp.roll(q, -1, axis=ax)
                        - jnp.roll(q, 1, axis=ax)) / (2.0 * dx[d - 1])

            b1, b2, b3 = prim[:, IB1], prim[:, IB2], prim[:, IB3]
            psi = prim[:, IPS]
            divB = cdiff(b1, 1) + cdiff(b2, 2) + cdiff(b3, 3)
            psi_gradB = (b1 * cdiff(psi, 1) + b2 * cdiff(psi, 2)
                         + b3 * cdiff(psi, 3))
            u = u.at[:, IM1].add(-beta_dt * divB * b1)
            u = u.at[:, IM2].add(-beta_dt * divB * b2)
            u = u.at[:, IM3].add(-beta_dt * divB * b3)
            u = u.at[:, IEN].add(-beta_dt * psi_gradB)
        from ..core.indices import IPS
        return u.at[:, IPS].multiply(coeff)

    def _step(self, state, dt, c_h, t=0.0):
        """Whole-step composition (all stages + fills in one trace) —
        kept for A/B against the production split dispatch."""
        tab = INTEGRATORS[self.cfg.integrator]
        u0 = dict(state)
        u1 = dict(state)
        for s in range(tab["nstages"]):
            u0 = self._stage_impl(s, u0, u1, dt, c_h, t)
            u0 = self.state_mgr.fill_ghosts(u0)
        return u0

    def _step_split(self, state, dt, c_h, t=0.0):
        """Production step: each integrator stage and each ghost fill is
        its OWN jitted dispatch, never composed into one XLA module.

        Measured on device (AMR bench geometry, 128^3 + level-1 center,
        mb 32^3): the composed jit(_step) costs 183 ms while its parts
        sum to ~62 ms — fusing the slab-assembly fill with the Pallas
        stage custom-calls makes XLA copy-insert the fill's full-array
        dynamic-update-slices (37 GB of HBM traffic vs 17 GB for the
        parts; 533 copy ops in the composed HLO).  Separate dispatches
        keep each piece at its standalone cost (56 ms measured).

        With the LANE-PACKED stage kernels the composed trace no longer
        misbehaves (45 ms — the pack/unpack transposes around the
        custom-calls break the aliasing chains that forced the copies),
        so composed is the default and this path is the
        ``ATHENAPK_SMR_STEP=split`` safety lever for deck/path
        combinations where composition regresses."""
        tab = INTEGRATORS[self.cfg.integrator]
        u1 = dict(state)
        u0 = dict(state)
        for s in range(tab["nstages"]):
            fn = self._stage_jits.get(s)
            if fn is None:
                import functools
                fn = self._stage_jits[s] = jax.jit(
                    functools.partial(self._stage_impl, s))
            u0 = fn(u0, u1, dt, c_h, t)
            u0 = self.fill_ghosts(u0)
        return u0

    def _stage_impl(self, s, state, state1, dt, c_h, t=0.0):
        """One 2S-integrator stage WITHOUT the trailing ghost fill:
        per-level (fused) sweeps + coarse-fine flux correction + Dedner
        + cooling + unsplit problem sources."""
        cfg = self.cfg
        tab = INTEGRATORS[cfg.integrator]
        u0 = dict(state)
        u1 = dict(state1)
        fused = self._use_pallas_sweep(next(iter(state.values())).dtype)
        stage_fused = fused and self._use_stage_fused()
        recon = cfg.reconstruction
        if cfg.integrator == "vl2" and s == 0:
            recon = "dc"
        beta_dt = tab["beta"][s] * dt
        prims = {}
        if stage_fused:
            # whole-stage kernel (cons->prim + sweeps + face capture
            # + 2S axpy in VMEM); coarse-fine deltas land on u_new
            # scaled by beta_dt — algebraically the same correction
            need_prim = self._need_prim()
            u_news = {}
            slabs = {}
            for lev in u0:
                u_new, prim, sl = self._fused_stage_faces(
                    recon, lev, need_prim)(
                    u0[lev], u1[lev], tab["gam0"][s], tab["gam1"][s],
                    beta_dt, c_h)
                u_news[lev] = u_new
                slabs[lev] = sl
                if need_prim:
                    prims[lev] = prim
            u0 = self._slab_flux_correct(u_news, slabs,
                                         scale=beta_dt)
        elif fused:
            negdivs = {}
            slabs = {}
            for lev in u0:
                u0f, prim = cons_to_prim(self.eos, u0[lev], cfg.fluid,
                                         cfg.nscalars)
                u0[lev] = u0f
                prims[lev] = prim
                negdivs[lev], slabs[lev] = self._fused_level_stage(
                    lev, u0f, u1[lev], prim, c_h, recon,
                    tab["gam0"][s], tab["gam1"][s], beta_dt)
            negdivs = self._slab_flux_correct(negdivs, slabs)
            for lev in u0:
                u0[lev] = (tab["gam0"][s] * u0[lev]
                           + tab["gam1"][s] * u1[lev]
                           + beta_dt * negdivs[lev])
        else:
            flux = {}
            for lev in u0:
                u0f, prim = cons_to_prim(self.eos, u0[lev], cfg.fluid,
                                         cfg.nscalars)
                u0[lev] = u0f
                prims[lev] = prim
                flux[lev] = self._fluxes_level(prim, lev, c_h, recon)
            if cfg.first_order_flux_correct:
                # per-level DC+LLF rescue BEFORE the coarse-fine
                # restriction, matching the reference task order
                # (first_order_flux_correct ->
                # LoadAndSendFluxCorrections,
                # hydro_driver.cpp:517-531)
                for lev in u0:
                    flux[lev] = first_order_flux_correct(
                        cfg, self.eos, self._dirs, _AXIS_OF_DIR,
                        {d: self.smesh.dx(lev)[d - 1]
                         for d in self._dirs},
                        self._interior_mask, u0[lev], u1[lev],
                        prims[lev], flux[lev], tab["gam0"][s],
                        tab["gam1"][s], beta_dt, c_h)
            flux = self._flux_correct(flux)
            for lev in u0:
                u0[lev] = self._update_level(u0[lev], u1[lev],
                                             flux[lev], lev,
                                             tab["gam0"][s],
                                             tab["gam1"][s], beta_dt)
        for lev in u0:
            if cfg.fluid == GLMMHD:
                u0[lev] = self._dedner_source_level(
                    u0[lev], prims.get(lev), beta_dt, c_h, lev)
            if self.cooling is not None:
                # pointwise unsplit cooling per stage (the uniform
                # path's ordering; hydro_pkg.py:296-298)
                u0[lev] = self.cooling.apply(u0[lev], beta_dt,
                                             cfg.fluid)
        if self.problem_source_unsplit is not None:
            # per-level coordinate-dependent sources with cross-level
            # global reductions (AddUnsplitSources analog)
            u0 = self.problem_source_unsplit(u0, prims, beta_dt, t)
        return u0

    # ------------------------------------------------------------------- dt
    def _dt_pack_impl(self, state, tm_dt, t, tlim):
        """Device-side per-cycle timestep package for the PIPELINED
        driver loop: ``[dt_raw, dt_eff, c_h]`` where dt_raw is the CFL
        estimate capped by the 2x growth ratchet and dt_eff adds the
        tlim clamp (the legacy host clamp chain, kept on device so the
        driver never blocks between cycles — the single host read of
        this pack overlaps the step's execution).  c_h is the GLM
        cleaning speed for dt_eff (cfl * min_dx / dt, ``_c_h``)."""
        dt_raw = jnp.minimum(self._estimate_dt_impl(state), 2.0 * tm_dt)
        dt_eff = jnp.minimum(dt_raw, tlim - t)
        if self.cfg.fluid == GLMMHD:
            mindx = self.smesh.min_dx(self.smesh.max_level)
            c_h = jnp.where(dt_eff > 0,
                            self.cfg.cfl * mindx / dt_eff,
                            jnp.zeros_like(dt_eff))
        else:
            c_h = jnp.zeros_like(dt_eff)
        return jnp.stack([dt_raw, dt_eff, c_h])

    def _estimate_dt_impl(self, state):
        cfg = self.cfg
        eos = self.eos
        min_dt = jnp.inf
        for lev, u in state.items():
            _, w = cons_to_prim(eos, u, cfg.fluid, cfg.nscalars)
            wi = w[self._int_sl]
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
            for d in self._dirs:
                min_dt = jnp.minimum(min_dt, jnp.min(
                    dx[d - 1] / (jnp.abs(wi[:, d]) + lam[d - 1])))
        dt_hyp = cfg.cfl * min_dt
        if self.cooling is not None:
            # cooling-CFL dt across all levels (uniform path:
            # hydro_pkg.py:421-423)
            for lev, u in state.items():
                _, w = cons_to_prim(eos, u, cfg.fluid, cfg.nscalars)
                dt_hyp = jnp.minimum(dt_hyp, self.cooling.estimate_timestep(
                    w, self._level_mesh[lev]))
        if self.diffusion is None:
            return dt_hyp
        return self._estimate_dt_with_diff_impl(state, dt_hyp=dt_hyp)[0]

    def _estimate_dt_with_diff_impl(self, state, dt_hyp=None):
        """-> (dt, dt_diff) applying the integrator policy: unsplit
        takes the strict min; rkl2 keeps the hyperbolic dt capped at
        rkl2_max_dt_ratio * dt_diff (hydro_pkg.py:404-417)."""
        cfg = self.cfg
        if dt_hyp is None:
            saved, self.diffusion = self.diffusion, None
            try:
                dt_hyp = self._estimate_dt_impl(state)
            finally:
                self.diffusion = saved
        from ..diffusion.diffusion import estimate_diff_dt
        dt_diff = jnp.inf
        for lev, u in state.items():
            _, w = cons_to_prim(self.eos, u, cfg.fluid, cfg.nscalars)
            dt_diff = jnp.minimum(dt_diff, estimate_diff_dt(
                self.diffusion, w, self._level_mesh[lev], cfg.cfl))
        if self.sts:
            dt = dt_hyp
            ratio = self.diffusion.rkl2_max_dt_ratio
            if ratio > 0.0:
                dt = jnp.where(dt_hyp / dt_diff > ratio,
                               ratio * dt_diff, dt)
            return dt, dt_diff
        return jnp.minimum(dt_hyp, dt_diff), dt_diff

    # ------------------------------------------------------------ reductions
    def total_mass(self, state):
        total = 0.0
        for lev, u in state.items():
            vol = (self.smesh.dx(lev)[0] * self.smesh.dx(lev)[1]
                   * self.smesh.dx(lev)[2])
            total = total + jnp.sum(u[self._int_sl][:, IDN]) * vol
        return total
