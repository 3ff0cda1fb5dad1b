"""The Hydro package: flux sweeps, stage updates, timestep, full cycle step.

This is the TPU-native counterpart of AthenaPK's Hydro package + driver
(``src/hydro/hydro.cpp`` ``Hydro::Initialize``/``CalculateFluxes`` and
``src/hydro/hydro_driver.cpp`` ``HydroDriver::MakeTaskCollection``): the
reference's compile-time (fluid x reconstruction x riemann) template table
becomes Python closure specialization, and the per-stage task list becomes
straight-line traced code inside one jitted ``step``.

State layout: conserved ``u`` is ``[nblocks, nvar, NZ, NY, NX]`` (ghost-
inclusive); fluxes are co-indexed with cells (index i = face i-1/2).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.boundaries import make_boundary_fn
from ..core.indices import (AXIS_X, AXIS_Y, AXIS_Z, IDN, IPR, IPS, EULER,
                            GLMMHD, nvar_for_fluid)
from ..core.mesh import Mesh
from ..eos.adiabatic import EOS, cons_to_prim, fast_magnetosonic_speed
from ..recon import reconstruct
from ..riemann import solve_riemann
from .integrators import INTEGRATORS

_AXIS_OF_DIR = {1: AXIS_X, 2: AXIS_Y, 3: AXIS_Z}


def fofc_bad_cells(cfg, u_new, interior):
    """Interior cells whose candidate state fails the reference's
    good-cell test ``rho > 0 && p > 0`` (``hydro.cpp:1280``) — phrased
    as a negation so NaN candidates (e.g. NaN fluxes from Riemann
    solves of negative reconstructed edge states) are also flagged and
    rescued."""
    from ..core.indices import IM1, IM2, IM3, IEN, IB1, IB2, IB3
    rho = u_new[:, IDN:IDN + 1]
    ke_ = 0.5 * (u_new[:, IM1:IM1 + 1] ** 2 + u_new[:, IM2:IM2 + 1] ** 2
                 + u_new[:, IM3:IM3 + 1] ** 2) / rho
    p_like = u_new[:, IEN:IEN + 1] - ke_
    if cfg.fluid == GLMMHD:
        p_like = p_like - 0.5 * (u_new[:, IB1:IB1 + 1] ** 2
                                 + u_new[:, IB2:IB2 + 1] ** 2
                                 + u_new[:, IB3:IB3 + 1] ** 2)
    return ~((rho > 0.0) & (p_like > 0.0)) & interior


def first_order_flux_correct(cfg, eos, dirs, axis_of_dir, dx_of_dir,
                             interior, u0, u1, prim, fluxes,
                             gam0, gam1, beta_dt, c_h):
    """Iterative first-order flux correction
    (``FirstOrderFluxCorrect``, ``src/hydro/hydro.cpp:1223-1342``):
    cells whose candidate update would go rho<=0 or p<=0 get all their
    face fluxes replaced by first-order DC+LLF fluxes; <=4 passes.
    The reference's early-exit loop becomes 4 unrolled masked passes
    (a pass with no bad cells is a no-op select).

    Shared between the uniform path (``HydroPackage``) and the refined-
    mesh path (``amr.smr_hydro.SmrHydro``, per level with level-scaled
    dx) — the reference wires it for every mesh
    (``hydro_driver.cpp:517-525``)."""
    from ..core.indices import IM1, IM2, IM3, IEN, IB1, IB2, IB3

    # DC+LLF point fluxes from unreconstructed prim
    llf = {}
    for d in dirs:
        axis = axis_of_dir[d]
        wl = jnp.roll(prim, 1, axis=axis)
        llf[d] = solve_riemann("llf", cfg.fluid, eos, wl, prim, d,
                               c_h=c_h, nscalars=cfg.nscalars)

    def flux_div(fl):
        div = None
        for d in dirs:
            axis = axis_of_dir[d]
            dF = (jnp.roll(fl[d], -1, axis=axis) - fl[d]) / dx_of_dir[d]
            div = dF if div is None else div + dF
        return div

    for attempt in range(4):
        div = flux_div(fluxes)
        u_new = gam0 * u0 + gam1 * u1 - beta_dt * div
        rho = u_new[:, IDN:IDN + 1]
        ke_ = 0.5 * (u_new[:, IM1:IM1 + 1] ** 2 + u_new[:, IM2:IM2 + 1] ** 2
                     + u_new[:, IM3:IM3 + 1] ** 2) / rho
        p_like = u_new[:, IEN:IEN + 1] - ke_
        if cfg.fluid == GLMMHD:
            p_like = p_like - 0.5 * (u_new[:, IB1:IB1 + 1] ** 2
                                     + u_new[:, IB2:IB2 + 1] ** 2
                                     + u_new[:, IB3:IB3 + 1] ** 2)
        # negated good-cell tests (hydro.cpp:1280-1292) so NaN
        # candidates are also corrected
        bad = ~((rho > 0.0) & (p_like > 0.0))
        if attempt > 2:
            # last pass: rho>0 but p<0 cells are left to the floors
            bad = ~(rho > 0.0)
        bad = bad & interior
        new_fluxes = {}
        for d in dirs:
            axis = axis_of_dir[d]
            bad_face = bad | jnp.roll(bad, 1, axis=axis)
            new_fluxes[d] = jnp.where(bad_face, llf[d], fluxes[d])
        fluxes = new_fluxes
    return fluxes


@dataclasses.dataclass(frozen=True)
class HydroConfig:
    """Static solver configuration (the reference's <hydro> + <parthenon/time>
    options, ``src/hydro/hydro.cpp:264-470``)."""

    fluid: str = EULER                # euler | glmmhd
    reconstruction: str = "plm"       # dc | plm | ppm | weno3 | limo3 | wenoz
    riemann: str = "hlle"             # llf | hlle | hllc | hlld | none
    integrator: str = "vl2"           # rk1 | rk2 | rk3 | vl2
    cfl: float = 0.3
    nscalars: int = 0
    glmmhd_source: str = "dedner_plain"   # dedner_plain | dedner_extended
    glmmhd_alpha: float = 0.1
    calc_dt_hyp: bool = True
    max_dt: float = -1.0
    first_order_flux_correct: bool = False
    dtype: str = "float64"

    @property
    def nvar(self) -> int:
        return nvar_for_fluid(self.fluid, self.nscalars)

    @classmethod
    def from_parameter_input(cls, pin) -> "HydroConfig":
        h = "hydro"
        fluid = pin.get_or_add_string(h, "fluid", EULER)
        if fluid not in (EULER, GLMMHD):
            raise ValueError(f"unknown fluid '{fluid}'")
        # validate the EOS selection instead of silently assuming it
        # (the reference requires eos=adiabatic too, hydro.cpp:486-506)
        eos_str = pin.get_or_add_string(h, "eos", "adiabatic")
        if eos_str != "adiabatic":
            raise ValueError(f"unsupported <hydro> eos '{eos_str}' "
                             "(only 'adiabatic', as the reference)")
        riemann = pin.get_string(h, "riemann")
        # 'none' disables hyperbolic fluxes (and their dt constraint);
        # explicit hydro/calc_dt_hyp takes precedence (hydro.cpp:355-374)
        calc_dt_hyp = riemann != "none"
        if pin.has(h, "calc_dt_hyp"):
            calc_dt_hyp = pin.get_bool(h, "calc_dt_hyp")
        if riemann == "none" and pin.get_string(h, "reconstruction") != "dc":
            raise ValueError("riemann 'none' requires dc reconstruction")
        return cls(
            calc_dt_hyp=calc_dt_hyp,
            fluid=fluid,
            reconstruction=pin.get_string(h, "reconstruction"),
            riemann=riemann,
            integrator=pin.get_string("parthenon/time", "integrator"),
            cfl=pin.get_real("parthenon/time", "cfl"),
            nscalars=pin.get_or_add_integer(h, "nscalars", 0),
            glmmhd_source=pin.get_or_add_string(h, "glmmhd_source",
                                                "dedner_plain"),
            glmmhd_alpha=pin.get_or_add_real(h, "glmmhd_alpha", 0.1),
            max_dt=pin.get_or_add_real(h, "max_dt", -1.0),
            first_order_flux_correct=pin.get_or_add_bool(
                h, "first_order_flux_correct", False),
        )


class HydroPackage:
    """Bundles mesh + config + EOS into jit-compiled compute closures."""

    def __init__(self, mesh: Mesh, cfg: HydroConfig, eos: EOS,
                 problem_source_unsplit: Optional[Callable] = None,
                 diffusion=None, cooling=None, custom_bcs=None):
        from ..diffusion import DiffusionConfig
        self.mesh = mesh
        self.cfg = cfg
        self.eos = eos
        self.diffusion = diffusion if diffusion is not None else DiffusionConfig()
        self.cooling = cooling  # TabularCooling or None
        self.custom_bcs = custom_bcs
        self.apply_boundaries = make_boundary_fn(mesh, custom_bcs)
        # NOTE: Strang split sources (ProblemSourceStrangSplit) are a
        # DRIVER-loop concern, not a stage concern — the hooks may do
        # host-side work, so Simulation.run applies them around step()
        # exactly like first-order split sources (driver.py run loop).
        self.problem_source_unsplit = problem_source_unsplit

        from ..core.boundaries import check_reflecting_mhd
        check_reflecting_mhd(mesh, cfg.fluid)
        if cfg.fluid == GLMMHD and cfg.riemann == "hllc":
            raise ValueError("hllc is a hydro-only Riemann solver")
        if cfg.fluid == EULER and cfg.riemann == "hlld":
            raise ValueError("hlld is an MHD-only Riemann solver")
        from ..recon import nghost_for
        need = nghost_for(cfg.reconstruction)
        # nghost=0 is the ghost-free periodic fast path: cyclic rolls give
        # every cell a full-width stencil, so no ghost-depth requirement.
        if mesh.nghost != 0 and mesh.nghost < need:
            raise ValueError(
                f"reconstruction '{cfg.reconstruction}' needs nghost >= "
                f"{need}, got {mesh.nghost} (set parthenon/mesh/nghost)")

        # limo3 positivity fallback applies to rho and p (prim layout);
        # STATIC tuple — a device array would be an (illegal) captured
        # constant inside the Pallas kernels
        mask = [False] * cfg.nvar
        mask[IDN] = True
        mask[IPR] = True
        self._positivity_mask = tuple(mask)

        self._active_dirs = [1]
        if mesh.nx2 > 1:
            self._active_dirs.append(2)
        if mesh.nx3 > 1:
            self._active_dirs.append(3)

        self.step = jax.jit(self._step)
        self.step_with_dt = jax.jit(self._step_with_dt)
        # donate u: the scan loop rewrites the state every cycle anyway
        self.advance_cycles = jax.jit(self._advance_cycles,
                                      static_argnames=("n_cycles",),
                                      donate_argnums=(0,))
        self.estimate_timestep = jax.jit(self._estimate_timestep)
        self.cons_to_prim = jax.jit(self._cons_to_prim)
        self._rkl2_first = jax.jit(self._rkl2_first_impl,
                                   static_argnames=("s_rkl",))
        self._rkl2_other = jax.jit(self._rkl2_other_impl)

    # ------------------------------------------------------------------ prim
    def _cons_to_prim(self, u):
        return cons_to_prim(self.eos, u, self.cfg.fluid, self.cfg.nscalars)

    # ------------------------------------------------------ fused lane sweep
    def _use_pallas_sweep(self, dtype=None):
        """Fused flux path selection.  ``ATHENAPK_PALLAS_SWEEP=1`` forces
        it on (CPU runs use interpret mode), ``=0`` forces it off; unset
        means AUTO: f32 state + TPU backend + global x64 off (Mosaic's
        layout pass rejects 64-bit index types).  Both the ghost-free
        periodic and the ghosted multi-block layout are served (the roll
        wrap garbage lands in the ghost rim either way); first-order flux
        correction runs as a lax.cond rescue on top (see _stage_update).
        Excluded: unsplit diffusion (needs raw per-face fluxes) and the
        null Riemann solver."""
        import os
        eligible = (self.cfg.riemann != "none"
                    and not (self.diffusion.any_enabled
                             and self.diffusion.integrator == "unsplit"))
        knob = os.environ.get("ATHENAPK_PALLAS_SWEEP")
        if knob == "1":
            return eligible
        if knob == "0":
            return False
        # auto: production f32 TPU runs get the fused path with no flags
        return (eligible
                and self.mesh.nx3 > 1
                and dtype == jnp.float32
                and not jax.config.jax_enable_x64
                and jax.default_backend() == "tpu")

    def _fused_negdiv(self, recon: str):
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        if recon not in cache:
            import os
            import jax as _jax
            from .pallas_sweep import make_fused_negdiv, make_fused_negdiv_v2
            interp = _jax.default_backend() != "tpu"
            # MEASURED default (BENCH_r03 ladder, 256^3 PPM+HLLD f32):
            # the workload is VPU-compute-bound, not HBM-bound — v1's
            # transposes are cheap (~1.5 ms/pass at 256^3) while v2's
            # halo-slab y/z sweeps redo (1+2h/t)^2 ~ 3x of the recon
            # work, so v1 wins 2.43e8 vs ~1.5e8 zc/s.  3-D meshes
            # default to v1; 1-D/2-D layouts have no v1 kernels and
            # always use v2.  ATHENAPK_PALLAS_V2=1/0 forces (A/B lever).
            three_d = self.mesh.nx2 > 1 and self.mesh.nx3 > 1
            use_v2 = (not three_d
                      or os.environ.get("ATHENAPK_PALLAS_V2") == "1")
            if use_v2:
                cache[recon] = make_fused_negdiv_v2(
                    self.mesh, self.cfg, self.eos, self._positivity_mask,
                    recon,
                    tz=int(os.environ.get("ATHENAPK_PALLAS_TZ", "8")),
                    ty=int(os.environ.get("ATHENAPK_PALLAS_TY", "8")),
                    interpret=interp)
            else:
                cache[recon] = make_fused_negdiv(
                    self.mesh, self.cfg, self.eos, self._positivity_mask,
                    recon,
                    tz=int(os.environ.get("ATHENAPK_PALLAS_TZ", "1")),
                    ty=int(os.environ.get("ATHENAPK_PALLAS_TY", "32")),
                    interpret=interp)
        return cache[recon]

    # ---------------------------------------------------- whole-stage fusion
    def _stage_needs_prim(self):
        """Does a post-kernel epilogue consume the stage-start prim?
        (Problem sources and the extended Dedner divB terms.)  Served
        on the stage path by the kernel's ``emit_prim`` output."""
        return (self.problem_source_unsplit is not None
                or (self.cfg.fluid == GLMMHD
                    and self.cfg.glmmhd_source == "dedner_extended"))

    def _use_fused_stage(self, dtype=None):
        """Whole-stage kernel eligibility: everything the fused sweep
        needs, PLUS nothing else in the stage may require raw face
        fluxes — 3-D layout (ghost-free or ghosted) and no FOFC (its
        rescue consumes the unfused operands).  Prim-consuming
        epilogues (problem sources, extended Dedner) are served by the
        kernel's ``emit_prim`` output.

        OPT-IN via ``ATHENAPK_PALLAS_STAGE=1``: measured on device the
        uniform-mesh stage kernel LOSES to the v1 lane-sweep path
        (1.46e8 vs 2.43e8 zc/s at 256^3 PPM+HLLD f32 — the workload is
        VPU-compute-bound and the stage kernel's halo-slab y/z sweeps
        redo ~3x of the recon work), and its scoped-VMEM footprint OOMs
        Mosaic on ghosted multi-block layouts (mb<=128).  The SMR path
        keeps its own default (``SmrHydro._use_stage_fused``: v1 has no
        multi-axis faces kernel there)."""
        import os
        if os.environ.get("ATHENAPK_PALLAS_STAGE") != "1":
            return False
        return (self._use_pallas_sweep(dtype)
                and self.mesh.nx2 > 1 and self.mesh.nx3 > 1
                and not self.cfg.first_order_flux_correct)

    def _use_hybrid_dc_stage(self, dtype=None):
        """OPT-IN (``ATHENAPK_PALLAS_HYBRID=1``) A/B lever: DC-recon
        stages (VL2's predictor; every stage of a ``reconstruction =
        dc`` deck) via the whole-stage kernel while full-order stages
        stay on v1.  The hypothesis was that the DC stage is
        bandwidth-dominated (trivial recon, h=1), so the stage kernel's
        fewer HBM passes should win there.  MEASURED FALSE on device
        (256^3 HLLD+PPM+VL2 f32): 1.87e8 zc/s hybrid vs 2.43e8 pure v1
        — the *Riemann solve* dominates even the DC stage, and the
        halo-slab y/z sweeps redo (1+2h/t)^2 ~ 1.5x of the HLLD work at
        h=1, t=8, outweighing the saved cons_to_prim/transpose/axpy
        passes.  Kept as a lever (tested in interpret mode); ghost-free
        3-D only.

        Like every ``ATHENAPK_PALLAS_*`` lever, this is read at TRACE
        time and baked into the jitted step: set it before the first
        ``step()`` call on a given HydroPackage (ideally before
        construction) — flipping it afterwards has no effect on the
        cached trace (advisor r3 finding 2)."""
        import os
        if os.environ.get("ATHENAPK_PALLAS_HYBRID") != "1":
            return False
        return ((self.cfg.integrator == "vl2"
                 or self.cfg.reconstruction == "dc")
                and self._use_pallas_sweep(dtype)
                and self.mesh.nghost == 0
                and self.mesh.nx2 > 1 and self.mesh.nx3 > 1
                and not self.cfg.first_order_flux_correct)

    def _use_fused_stage_dt(self, dtype=None):
        """dt-emitting stage kernel eligibility: the fused stage plus
        a dt estimate that reduces to the pure hyperbolic CFL over the
        whole array — ghost-free layout (interior == everything), no
        diffusion/cooling dt terms, hyperbolic dt enabled, and no
        prim-consuming epilogue (post-kernel sources would invalidate
        the in-kernel CFL minima of u_new)."""
        return (self._use_fused_stage(dtype)
                and self.mesh.nghost == 0
                and self.cfg.calc_dt_hyp
                and not self.diffusion.any_enabled
                and self.cooling is None
                and not self._stage_needs_prim())

    def _fused_stage(self, recon: str, emit_dt: bool = False,
                     emit_prim: bool = False):
        cache = getattr(self, "_fused_stage_cache", None)
        if cache is None:
            cache = self._fused_stage_cache = {}
        key = (recon, emit_dt, emit_prim)
        if key not in cache:
            import os
            import jax as _jax
            from .pallas_sweep import make_fused_stage
            interp = _jax.default_backend() != "tpu"
            cache[key] = make_fused_stage(
                self.mesh, self.cfg, self.eos, self._positivity_mask,
                recon,
                tz=int(os.environ.get("ATHENAPK_PALLAS_TZ", "8")),
                ty=int(os.environ.get("ATHENAPK_PALLAS_TY", "8")),
                interpret=interp, emit_dt=emit_dt, emit_prim=emit_prim)
        return cache[key]

    def _fused_stage_update(self, u0, u1, gam0, gam1, beta_dt, c_h,
                            recon: str, t=0.0, emit_dt: bool = False):
        """cons->prim + 3 sweeps + stage axpy in ONE kernel (one HBM
        pass over the state); the cheap pointwise epilogues (Dedner
        source, cooling, problem sources, boundary fill) stay outside.
        ``emit_dt`` additionally returns the per-tile raw CFL minima of
        u_new; prim-consuming epilogues read the kernel's emitted
        stage-start prim."""
        raw_dt = None
        prim = None
        emit_prim = self._stage_needs_prim()
        with jax.named_scope("fused_stage"):
            out = self._fused_stage(recon, emit_dt, emit_prim)(
                u0, u1, gam0, gam1, beta_dt, c_h)
            if emit_dt or emit_prim:
                u_new = out[0]
                rest = list(out[1:])
                if emit_dt:
                    raw_dt = rest.pop(0)
                if emit_prim:
                    prim = rest.pop(0)
            else:
                u_new = out
        if self.cfg.fluid == GLMMHD:
            with jax.named_scope("dedner_source"):
                if self.cfg.glmmhd_source == "dedner_extended":
                    u_new = self._dedner_source(u_new, prim, beta_dt, c_h)
                else:
                    # plain: psi *= exp(-alpha c_h dt / dx) — prim-free
                    coeff = jnp.exp(-self.cfg.glmmhd_alpha * c_h * beta_dt
                                    / self.mesh.min_dx)
                    u_new = u_new.at[:, IPS].multiply(coeff)
        if self.cooling is not None:
            with jax.named_scope("tabular_cooling"):
                u_new = self.cooling.apply(u_new, beta_dt, self.cfg.fluid)
        if self.problem_source_unsplit is not None:
            with jax.named_scope("problem_source"):
                u_new = self.problem_source_unsplit(u_new, prim, self.mesh,
                                                    beta_dt, t)
        with jax.named_scope("boundary_fill"):
            u_new = self.apply_boundaries(u_new)
        return (u_new, raw_dt) if emit_dt else u_new

    # ----------------------------------------------------------------- fluxes
    def _compute_fluxes(self, prim, c_h, recon: str):
        """One flux array per active direction, co-indexed faces (i = i-1/2).

        Mirrors ``CalculateFluxes`` (``src/hydro/hydro.cpp:1026-1208``) but as
        three fused whole-array sweeps instead of scratch-pencil loops.
        """
        cfg = self.cfg
        fluxes = {}
        if cfg.riemann == "none":
            # null solver: diffusion-only runs (rsolvers.hpp:35-63)
            for d in self._active_dirs:
                fluxes[d] = jnp.zeros_like(prim)
        else:
            for d in self._active_dirs:
                axis = _AXIS_OF_DIR[d]
                dx = self.mesh.dx[d - 1]
                qm, qp = reconstruct(recon, prim, axis, dx,
                                     positivity_mask=self._positivity_mask)
                wl = jnp.roll(qp, 1, axis=axis)   # right edge of cell i-1
                wr = qm                            # left edge of cell i
                fluxes[d] = solve_riemann(cfg.riemann, cfg.fluid, self.eos,
                                          wl, wr, d, c_h=c_h,
                                          nscalars=cfg.nscalars)
        if self.diffusion.any_enabled and self.diffusion.integrator == "unsplit":
            from ..diffusion import calc_diff_fluxes
            dflux = calc_diff_fluxes(self.diffusion, prim, self.mesh)
            for d in self._active_dirs:
                fluxes[d] = fluxes[d] + dflux[d]
        return fluxes

    def _flux_divergence(self, fluxes):
        """div(F) with the same sign convention as the reference update:
        ``u_new = ... - beta*dt*divF`` (``Update::UpdateWithFluxDivergence``)."""
        div = None
        for d, F in fluxes.items():
            axis = _AXIS_OF_DIR[d]
            dFx = (jnp.roll(F, -1, axis=axis) - F) / self.mesh.dx[d - 1]
            div = dFx if div is None else div + dFx
        return div

    # ------------------------------------------------------- flux correction
    def _fofc_bad_cells(self, u_new):
        interior = jnp.zeros(self.mesh.block_shape, dtype=bool)
        ks, ke, js, je, is_, ie = self.mesh.interior
        interior = interior.at[ks:ke + 1, js:je + 1, is_:ie + 1].set(True)
        return fofc_bad_cells(self.cfg, u_new, interior[None, None])

    def _first_order_flux_correct(self, u0, u1, prim, fluxes,
                                  gam0, gam1, beta_dt, c_h):
        mesh = self.mesh
        # interior mask [1,1,NZ,NY,NX]
        interior = jnp.zeros(mesh.block_shape, dtype=bool)
        ks, ke, js, je, is_, ie = mesh.interior
        interior = interior.at[ks:ke + 1, js:je + 1, is_:ie + 1].set(True)
        dx_of = {d: mesh.dx[d - 1] for d in self._active_dirs}
        return first_order_flux_correct(
            self.cfg, self.eos, self._active_dirs, _AXIS_OF_DIR, dx_of,
            interior[None, None], u0, u1, prim, fluxes,
            gam0, gam1, beta_dt, c_h)

    # ---------------------------------------------------------------- sources
    def _dedner_source(self, u, prim, beta_dt, c_h):
        """Dedner psi damping (+ optional extended divB terms);
        ``src/hydro/glmmhd/dedner_source.cpp:17-79`` (Mignone & Tzeferacos
        2010 eq 27)."""
        cfg = self.cfg
        mindx = self.mesh.min_dx
        coeff = jnp.exp(-cfg.glmmhd_alpha * c_h * beta_dt / mindx)
        if cfg.glmmhd_source == "dedner_extended":
            from ..core.indices import IB1, IB2, IB3, IM1, IM2, IM3, IEN
            mesh = self.mesh

            def cdiff(q, d):
                # q is a per-variable 4-D [nb, z, y, x] slice: shift the
                # 5-D axis map down by the dropped var axis
                ax = _AXIS_OF_DIR[d] - 1
                return (jnp.roll(q, -1, axis=ax) - jnp.roll(q, 1, axis=ax)) / (
                    2.0 * mesh.dx[d - 1])

            b1 = prim[:, IB1]
            b2 = prim[:, IB2]
            b3 = prim[:, IB3]
            psi = prim[:, IPS]
            divB = cdiff(b1, 1)
            psi_gradB = b1 * cdiff(psi, 1)
            if mesh.nx2 > 1:
                divB = divB + cdiff(b2, 2)
                psi_gradB = psi_gradB + b2 * cdiff(psi, 2)
            if mesh.nx3 > 1:
                divB = divB + cdiff(b3, 3)
                psi_gradB = psi_gradB + b3 * cdiff(psi, 3)
            u = u.at[:, IM1].add(-beta_dt * divB * b1)
            u = u.at[:, IM2].add(-beta_dt * divB * b2)
            u = u.at[:, IM3].add(-beta_dt * divB * b3)
            u = u.at[:, IEN].add(-beta_dt * psi_gradB)
        return u.at[:, IPS].multiply(coeff)

    # ------------------------------------------------------------------ step
    def _stage_update(self, u0, u1, prim, gam0, gam1, beta_dt, c_h,
                     recon: str, t):
        """One 2S stage: flux -> update(interior) -> unsplit sources -> ghosts.

        Matches the per-stage task chain in ``MakeTaskCollection``
        (``src/hydro/hydro_driver.cpp:499-577``)."""
        # named scopes mirror the reference's named Kokkos kernels
        # ("x1 flux" etc., hydro.cpp:1071) so jax.profiler traces
        # attribute time per phase (SURVEY §5 tracing)
        if self._use_pallas_sweep(prim.dtype):
            # fused per-direction lane sweep: recon + Riemann + divergence
            # in VMEM (solver/pallas_sweep.py); no HBM intermediates
            with jax.named_scope("fused_lane_sweep"):
                negdiv = self._fused_negdiv(recon)(prim, c_h)
                u_new = gam0 * u0 + gam1 * u1 + beta_dt * negdiv
            if self.cfg.first_order_flux_correct:
                # DC+LLF rescue as a lax.cond: healthy cycles (the common
                # case — the reference's pass-with-no-bad-cells is a
                # no-op too) stay at fused speed; a cycle with any
                # candidate rho<=0 / p<=0 cell re-runs the stage through
                # the XLA flux path + 4-pass rescue.
                with jax.named_scope("first_order_flux_correct"):
                    bad = self._fofc_bad_cells(u_new)

                    def _rescue(_):
                        fluxes = self._compute_fluxes(prim, c_h, recon)
                        fluxes = self._first_order_flux_correct(
                            u0, u1, prim, fluxes, gam0, gam1, beta_dt, c_h)
                        div = self._flux_divergence(fluxes)
                        return gam0 * u0 + gam1 * u1 - beta_dt * div

                    u_new = jax.lax.cond(jnp.any(bad), _rescue,
                                         lambda _: u_new, None)
        else:
            with jax.named_scope("calculate_fluxes"):
                fluxes = self._compute_fluxes(prim, c_h, recon)
            if self.cfg.first_order_flux_correct:
                with jax.named_scope("first_order_flux_correct"):
                    fluxes = self._first_order_flux_correct(
                        u0, u1, prim, fluxes, gam0, gam1, beta_dt, c_h)
            with jax.named_scope("flux_divergence_update"):
                div = self._flux_divergence(fluxes)
                u_new = gam0 * u0 + gam1 * u1 - beta_dt * div
        # restore ghost entries of u0 (the divergence is garbage there;
        # boundary fill below overwrites them from valid interiors)
        if self.cfg.fluid == GLMMHD:
            with jax.named_scope("dedner_source"):
                u_new = self._dedner_source(u_new, prim, beta_dt, c_h)
        if self.cooling is not None:
            with jax.named_scope("tabular_cooling"):
                u_new = self.cooling.apply(u_new, beta_dt, self.cfg.fluid)
        if self.problem_source_unsplit is not None:
            with jax.named_scope("problem_source"):
                u_new = self.problem_source_unsplit(u_new, prim, self.mesh,
                                                    beta_dt, t)
        with jax.named_scope("boundary_fill"):
            u_new = self.apply_boundaries(u_new)
        return u_new

    def _step(self, u, dt, c_h, t=0.0, emit_dt=False):
        """Advance one full cycle (all integrator stages).

        ``u`` must enter ghost-filled; returns ghost-filled u(t+dt).
        ``emit_dt`` (fused-stage-dt path only): the LAST stage kernel
        also emits per-tile raw CFL minima; returns (u', raw_dt).
        """
        # follow the state dtype (f32 runs keep scalars in f32)
        dt = jnp.asarray(dt, dtype=u.dtype)
        c_h = jnp.asarray(c_h, dtype=u.dtype)
        cfg = self.cfg
        tab = INTEGRATORS[cfg.integrator]
        u0 = u
        u1 = u
        cur_t = t
        raw_dt = None
        fused_stage = self._use_fused_stage(u.dtype)
        hybrid_dc = (not fused_stage
                     and self._use_hybrid_dc_stage(u.dtype))
        assert not emit_dt or self._use_fused_stage_dt(u.dtype)
        for s in range(tab["nstages"]):
            last = s == tab["nstages"] - 1
            recon = cfg.reconstruction
            if cfg.integrator == "vl2" and s == 0:
                recon = "dc"   # first-order predictor (hydro.cpp:459-464)
            if fused_stage or (hybrid_dc and recon == "dc"):
                # cons->prim happens inside the kernel; skip the
                # separate prim materialization entirely
                out = self._fused_stage_update(u0, u1, tab["gam0"][s],
                                               tab["gam1"][s],
                                               tab["beta"][s] * dt, c_h,
                                               recon, cur_t,
                                               emit_dt=emit_dt and last)
                if emit_dt and last:
                    u0, raw_dt = out
                else:
                    u0 = out
            else:
                u0f, prim = self._cons_to_prim(u0)
                u0 = self._stage_update(u0f, u1, prim,
                                        tab["gam0"][s], tab["gam1"][s],
                                        tab["beta"][s] * dt, c_h, recon,
                                        cur_t)
        return (u0, raw_dt) if emit_dt else u0

    def _advance_cycles(self, u, t, dt, dt_hyp, tlim, n_cycles):
        """Run ``n_cycles`` cycles fully on-device via lax.scan: per-cycle
        dt comes from the on-device estimate (2x growth cap, tlim clamp),
        c_h from the previous hyperbolic dt — zero host sync inside.

        Returns (u', t', dt_next, dt_hyp', n_taken) where cycles past tlim
        become no-ops (masked)."""
        cfg = self.cfg
        mindx = self.mesh.min_dx

        def body(carry, _):
            u, t, dt, dt_hyp, taken = carry
            active = t < tlim * (1.0 - 1e-14)
            dt_eff = jnp.minimum(dt, tlim - t)
            c_h = (cfg.cfl * mindx / dt_hyp if cfg.fluid == GLMMHD
                   else jnp.asarray(0.0, u.dtype))
            u_new, (dt_next, dt_hyp_new, _) = self._step_with_dt(
                u, dt_eff, c_h, t)
            u = jnp.where(active, u_new, u)
            t = jnp.where(active, t + dt_eff, t)
            dt = jnp.where(active,
                           jnp.minimum(2.0 * dt_eff, dt_next), dt)
            dt_hyp = jnp.where(active, dt_hyp_new, dt_hyp)
            taken = taken + jnp.where(active, 1, 0)
            return (u, t, dt, dt_hyp, taken), None

        carry, _ = jax.lax.scan(
            body, (u, jnp.asarray(t, u.dtype), jnp.asarray(dt, u.dtype),
                   jnp.asarray(dt_hyp, u.dtype), jnp.asarray(0)),
            None, length=n_cycles)
        return carry

    def _step_with_dt(self, u, dt, c_h, t=0.0):
        """One cycle + next-dt estimate fused into a single jit (saves a
        separate cons->prim pass and a dispatch per cycle).  On the
        fused-stage-dt path the LAST stage kernel emits the CFL minima
        directly — no post-step cons->prim / reduction passes at all."""
        if self._use_fused_stage_dt(u.dtype):
            u_new, raw = self._step(u, dt, c_h, t, emit_dt=True)
            dt_hyp = self.cfg.cfl * jnp.min(raw)
            dt_full = dt_hyp
            if self.cfg.max_dt > 0.0:
                dt_full = jnp.minimum(dt_full, self.cfg.max_dt)
            inf = jnp.asarray(jnp.inf, u.dtype)
            return u_new, (dt_full, dt_hyp, inf)
        u_new = self._step(u, dt, c_h, t)
        _, prim = self._cons_to_prim(u_new)
        dts = self._estimate_timestep(prim)
        return u_new, dts

    # ------------------------------------------------------------------- dt
    def _estimate_timestep(self, prim):
        """Full timestep estimate (``EstimateTimestep``,
        ``src/hydro/hydro.cpp:914-976``): hyperbolic CFL, diffusive dt
        (strict for unsplit, ratio-capped for rkl2), max_dt cap.
        Returns (dt_full, dt_hyp, dt_diff)."""
        cfg = self.cfg
        mesh = self.mesh
        eos = self.eos
        sl = mesh.interior_slices
        w = prim[sl]  # interior only
        rho = w[:, IDN]
        p = w[:, IPR]
        if cfg.fluid == EULER:
            c = jnp.sqrt(eos.gamma * p / rho)
            lam = (c, c, c)
        else:
            from ..core.indices import IB1, IB2, IB3
            b1, b2, b3 = w[:, IB1], w[:, IB2], w[:, IB3]
            lam = (fast_magnetosonic_speed(eos, rho, p, b1, b2, b3),
                   fast_magnetosonic_speed(eos, rho, p, b2, b3, b1),
                   fast_magnetosonic_speed(eos, rho, p, b3, b1, b2))
        dt_hyp = jnp.inf
        for d in self._active_dirs:
            vi = w[:, d]  # IV1/IV2/IV3 are 1/2/3
            dt_hyp = jnp.minimum(
                dt_hyp,
                jnp.min(mesh.dx[d - 1] / (jnp.abs(vi) + lam[d - 1])))
        dt_hyp = cfg.cfl * dt_hyp

        min_dt = dt_hyp if cfg.calc_dt_hyp else jnp.inf

        dt_diff = jnp.inf
        dc = self.diffusion
        if dc.any_enabled and dc.integrator != "none":
            from ..diffusion import estimate_diff_dt
            dt_diff = estimate_diff_dt(dc, prim, mesh, cfg.cfl)
            if dc.integrator == "unsplit":
                min_dt = jnp.minimum(min_dt, dt_diff)
            elif dc.integrator == "rkl2" and dc.rkl2_max_dt_ratio > 0.0:
                # cap dt so dt_hyp / dt_diff <= max ratio; when hyperbolic
                # dt is disabled the reference's dt_hyp stays at huge, so
                # the cap always binds (hydro.cpp:948-957 + :344-362)
                dt_hyp_eff = dt_hyp if cfg.calc_dt_hyp else jnp.inf
                min_dt = jnp.minimum(
                    min_dt,
                    jnp.where(dt_hyp_eff / dt_diff > dc.rkl2_max_dt_ratio,
                              dc.rkl2_max_dt_ratio * dt_diff, min_dt))

        if self.cooling is not None:
            min_dt = jnp.minimum(min_dt,
                                 self.cooling.estimate_timestep(prim, mesh))

        dt = min_dt
        if cfg.max_dt > 0.0:
            dt = jnp.minimum(dt, cfg.max_dt)
        return dt, dt_hyp, dt_diff

    # ------------------------------------------------------------------ RKL2
    def _diff_divergence(self, u):
        """-div(F_diff) over the interior from ghost-filled cons ``u``
        (the RKL2 operator M; ResetFluxes+CalcDiffFluxes+FluxDivergence,
        ``hydro_driver.cpp:225-260``)."""
        from ..diffusion import calc_diff_fluxes
        _, prim = self._cons_to_prim(u)
        fluxes = calc_diff_fluxes(self.diffusion, prim, self.mesh)
        return -self._flux_divergence(fluxes)

    def _rkl2_first_impl(self, u, tau, s_rkl):
        """Y1 = Y0 + mu_tilde_1 tau M(Y0) (``RKL2StepFirst``,
        ``hydro_driver.cpp:93-126``).  Returns (Y1 ghost-filled, MY0)."""
        s = float(s_rkl)
        mu_tilde_1 = 4.0 / 3.0 / (s * s + s - 2.0)
        MY0 = self._diff_divergence(u)
        Y1 = u + mu_tilde_1 * tau * MY0
        return self.apply_boundaries(Y1), MY0

    def _rkl2_other_impl(self, Yjm1, Yjm2, Y0, MY0, coeffs, tau):
        """One RKL2 recursion stage (``RKL2StepOther``,
        ``hydro_driver.cpp:128-167``)."""
        mu_j, nu_j, mu_tilde_j, gamma_tilde_j = coeffs
        MYjm1 = self._diff_divergence(Yjm1)
        Yj = (mu_j * Yjm1 + nu_j * Yjm2 + (1.0 - mu_j - nu_j) * Y0
              + mu_tilde_j * tau * MYjm1 + gamma_tilde_j * tau * MY0)
        return self.apply_boundaries(Yj)

    def sts_half_step(self, u, tau, dt_diff: float):
        """RKL2 super-time-step over tau (one half of the Strang wrap;
        ``AddSTSTasks``, ``hydro_driver.cpp:170-344``).  Host loop over
        jitted substages: s is data-dependent, so it stays on the host
        (the reference computes it when building the task list too).
        """
        import math as _math
        s_rkl = int(0.5 * (_math.sqrt(9.0 + 16.0 * tau / dt_diff) - 1.0)) + 1
        if s_rkl % 2 == 0:
            s_rkl += 1
        tau = jnp.asarray(tau)
        Y0 = u
        Yjm1, MY0 = self._rkl2_first(u, tau, s_rkl)
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

    # ------------------------------------------------------------------ misc
    def c_h_from_dt_hyp(self, dt_hyp):
        """Divergence-cleaning speed c_h = cfl * min_dx / dt_hyp
        (``PreStepMeshUserWorkInLoop``, ``src/hydro/hydro.cpp:102-143``)."""
        if self.cfg.fluid != GLMMHD:
            return jnp.asarray(0.0)  # dtype follows the x64 mode
        return self.cfg.cfl * self.mesh.min_dx / dt_hyp
