"""Evolution driver: the main simulation loop.

TPU-native counterpart of Parthenon's ``EvolutionDriver``/``MultiStageDriver``
plus AthenaPK's ``HydroDriver`` (``src/hydro/hydro_driver.cpp:34-41``):

* per cycle: update c_h from the previous hyperbolic dt (the reference's
  ``PreStepMeshUserWorkInLoop`` global reduction, ``src/hydro/hydro.cpp:
  102-143``), run the jitted multi-stage ``step``, estimate the next dt
  (growth-capped at 2x), trigger outputs.
* throughput accounting prints ``zone-cycles/wallsecond`` at the end, with
  ``perf_cycle_offset`` warm-up exclusion — the exact protocol parsed by the
  reference performance suite (``tst/regression/test_suites/performance/
  performance.py:95-96``).
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config.parameter_input import ParameterInput
from .core.mesh import Mesh
from .eos.adiabatic import EOS
from .outputs.hdf5 import write_phdf
from .outputs.history import HistoryOutput
from .pgen import get_pgen
from .solver.hydro_pkg import HydroConfig, HydroPackage


class Simulation:
    """Owns mesh, package, state, and the time loop."""

    def __init__(self, pin: ParameterInput, base_name: Optional[str] = None,
                 quiet: bool = False, restart: Optional[dict] = None):
        self.pin = pin
        self.quiet = quiet
        self.problem_id = pin.get_string("job", "problem_id")
        self.base_name = base_name or self.problem_id

        # <hydro> precision = double | single (repo extension; the
        # reference is compile-time Real=double).  "single" disables
        # global x64 so all state/compute runs f32 — the production TPU
        # mode, and the trigger for the fused Pallas lane-sweep
        # auto-select (hydro_pkg._use_pallas_sweep).  Must happen before
        # any jax arrays are created.
        prec = pin.get_or_add_string("hydro", "precision", "double")
        if prec == "single":
            jax.config.update("jax_enable_x64", False)
        elif prec != "double":
            raise ValueError(f"hydro/precision must be single|double, "
                             f"got '{prec}'")

        self.mesh = Mesh.from_parameter_input(pin)
        self.cfg = HydroConfig.from_parameter_input(pin)
        self.eos = EOS.from_parameter_input(pin)
        self.pgen = get_pgen(self.problem_id)
        # InitUserMeshData analog: may mutate pin (e.g. linear_wave test=true
        # rescales tlim) before time controls are read below
        init_hook = getattr(self.pgen, "init_user_mesh_data", None)
        if init_hook is not None:
            init_hook(pin)
        self.mesh = self._merge_blocks(pin, self.mesh, restart)

        # units + composition (for spitzer coefficients, T floors)
        from .utils.units import Units, mean_molecular_weights
        self.units = Units(pin) if pin.has_block("units") else None
        mu = None
        if pin.has("hydro", "He_mass_fraction") and self.units is not None:
            mu, _ = mean_molecular_weights(
                pin.get_real("hydro", "He_mass_fraction"))
        from .diffusion import DiffusionConfig
        diffusion = DiffusionConfig.from_parameter_input(
            pin, units=self.units, mu=mu)

        cooling = None
        if pin.get_or_add_string("cooling", "enable_cooling", "none") \
                == "tabular":
            from .srcterms.tabular_cooling import TabularCooling
            if self.units is None or mu is None:
                raise ValueError("tabular cooling requires <units> block and "
                                 "hydro/He_mass_fraction")
            he_x = pin.get_real("hydro", "He_mass_fraction")
            mbar_over_kb = mu * self.units.mh() / self.units.k_boltzmann()
            cooling = TabularCooling(
                pin, self.units, pin.get_real("hydro", "gamma"), mu, he_x,
                mbar_over_kb)
            if pin.has("cooling", "test_filename"):
                cooling.test_cooling_table(pin)

        src_unsplit = getattr(self.pgen, "problem_source_unsplit", None)
        if src_unsplit is not None:
            src_unsplit = src_unsplit(pin, self.mesh, self.cfg, self.eos)
        src_first = getattr(self.pgen, "problem_source_first_order", None)
        if src_first is not None:
            src_first = src_first(pin, self.mesh, self.cfg, self.eos)
        self.src_first_order = src_first
        # Strang split source hook (ProblemSourceStrangSplit,
        # main.cpp:25 / hydro.cpp:257-260): applied before stage 1 and
        # after the last stage, receiving full dt both times (the hook
        # applies dt/2 itself — hydro_driver.cpp:460-470,548-553)
        src_strang = getattr(self.pgen, "problem_source_strang", None)
        if src_strang is not None:
            src_strang = src_strang(pin, self.mesh, self.cfg, self.eos)
        self.src_strang = src_strang
        # pgen dt constraint (ProblemEstimateTimestep, main.cpp:107).
        # Factory form resolves at build time — returning None keeps the
        # fused-dt fast path for decks that don't use the constraint.
        pe_fac = getattr(self.pgen, "estimate_timestep_factory", None)
        if pe_fac is not None:
            self._pe_fn = pe_fac(pin, self.mesh, self.cfg, self.eos)
        else:
            raw_pe = getattr(self.pgen, "estimate_timestep", None)
            self._pe_fn = ((lambda prim, t: raw_pe(
                self.pin, self.mesh, self.cfg, self.eos, prim, t))
                if raw_pe is not None else None)
        custom_bcs = None
        bc_hook = getattr(self.pgen, "register_boundary_conditions", None)
        if bc_hook is not None:
            custom_bcs = bc_hook(pin, self.mesh, self.cfg, self.eos)
        self.pkg = HydroPackage(self.mesh, self.cfg, self.eos,
                                problem_source_unsplit=src_unsplit,
                                diffusion=diffusion, cooling=cooling,
                                custom_bcs=custom_bcs)

        # time integration controls (<parthenon/time>)
        t = "parthenon/time"
        self.tlim = pin.get_real(t, "tlim")
        self.nlim = pin.get_or_add_integer(t, "nlim", -1)
        self.perf_cycle_offset = pin.get_or_add_integer(
            t, "perf_cycle_offset", 0)
        self.ncycle_out = pin.get_or_add_integer(t, "ncycle_out", 1)

        # initial state (fresh problem generation or restart payload)
        self.is_restart = restart is not None
        self._restart_dt = float(restart.get("dt", 0.0)) if restart else 0.0
        if self.is_restart:
            u = jnp.asarray(restart["cons"])
            self.t = restart["t"]
            self.ncycle = restart["ncycle"]
        else:
            u = jnp.asarray(self.pgen.problem_generator(
                pin, self.mesh, self.cfg, self.eos))
            u = self.pkg.apply_boundaries(u)
            self.t = 0.0
            self.ncycle = 0
        self.u = u
        self.tm_dt = None  # set by _estimate

        # tracers (swarm analog); pgen may add per-particle fields
        # (ProblemInitTracerData analog) and a per-cycle fill hook
        from .tracers import Tracers
        extra = getattr(self.pgen, "tracer_extra_fields", None)
        self.tracers = Tracers(pin, self.mesh, self.cfg,
                               extra_fields=extra(pin) if extra else None)
        self._fill_tracers_hook = getattr(self.pgen, "problem_fill_tracers",
                                          None)
        self.tracer_state = None
        if self.tracers.enabled:
            if self.is_restart and "tracers" in restart:
                self.tracer_state = {k: jnp.asarray(v) for k, v in
                                     restart["tracers"].items()}
            else:
                self.tracer_state = self.tracers.seed(
                    user_hook=getattr(self.pgen, "seed_initial_tracers",
                                      None))
                if self.tracer_state is not None:
                    _, w0 = self.pkg.cons_to_prim(self.u)
                    self.tracer_state = self.tracers.fill(self.tracer_state,
                                                          w0)
        # tracers on the FAST PATH (VERDICT r3 item 8): advect + fill
        # run INSIDE the jitted cycle (one dispatch, no per-cycle
        # cons_to_prim host round-trip) — the tracer kernels are pure
        # jax (Heun + trilinear + sort-based migration), so the whole
        # (step, dt estimate, tracer update) chain fuses into one jit.
        self._step_tracers = None
        if self.tracers.enabled:
            _pkg, _tr = self.pkg, self.tracers

            def _step_tr(u, tstate, dt, c_h, t):
                u_new, dts = _pkg._step_with_dt(u, dt, c_h, t)
                _, w = _pkg._cons_to_prim(u_new)
                tstate = _tr._advect_impl(tstate, w, dt)
                tstate = _tr._fill_impl(tstate, w)
                return u_new, tstate, dts

            self._step_tracers = jax.jit(_step_tr)

        # OU forcing state
        if self.is_restart and "few_modes_ft" in restart:
            from .pgen import turbulence as _turb
            fm = _turb._fmft(pin, self.mesh)
            fm.set_state(*restart["few_modes_ft"])

        # outputs
        self.outputs = []
        for blk in pin.output_blocks():
            ftype = pin.get_string(blk, "file_type")
            dt_out = pin.get_or_add_real(blk, "dt", -1.0)
            oid = pin.get_or_add_string(blk, "id", blk.rsplit("output", 1)[-1])
            if ftype == "hst":
                extra_cols = ()
                hook = getattr(self.pgen, "history_columns", None)
                if hook is not None:
                    extra_cols = hook(pin, self.mesh, self.cfg, self.eos)
                self.outputs.append(HistoryOutput(
                    f"{self.base_name}.out{oid}.hst", self.cfg.fluid, dt_out,
                    extra_columns=extra_cols))
            elif ftype == "hdf5":
                var = pin.get_or_add_string(blk, "variables", "cons")
                sp = pin.get_or_add_bool(blk, "single_precision_output", False)
                # swarm output (reference docs/input.md:353-366):
                #   swarms = tracers
                #   tracers_variables = id, x, y, z, rho
                swarm_vars = {}
                for sname in pin.get_or_add_string(blk, "swarms", "").split():
                    sname = sname.strip(",")
                    if not sname:
                        continue
                    if sname != "tracers":
                        raise ValueError(f"unknown swarm '{sname}' in {blk}")
                    raw = pin.get_or_add_string(
                        blk, f"{sname}_variables", "id, x, y, z")
                    swarm_vars[sname] = [v.strip() for v in
                                         raw.replace(",", " ").split()]
                self.outputs.append(_Hdf5Output(
                    self.base_name, oid, var, dt_out, sp,
                    swarm_vars=swarm_vars, sim=self))
            elif ftype == "rst":
                self.outputs.append(_RestartOutput(
                    self.base_name, oid, dt_out, self))
        if self.is_restart and restart.get("triggers") is not None:
            for out, (nt, cnt) in zip(self.outputs, restart["triggers"]):
                out.next_time = float(nt)
                out.count = int(cnt)
        if self.is_restart:
            for out in self.outputs:
                if isinstance(out, HistoryOutput):
                    # resume appends to the existing .hst (no re-header)
                    out._wrote_header = True

        self._dump_count = {}

    # ----------------------------------------------------------- block merge
    @staticmethod
    def _merge_blocks(pin, mesh, restart):
        """Single-chip uniform meshes solve as ONE mesh-spanning block.

        The reference decomposes a uniform mesh into meshblocks for
        MPI-rank granularity and packs them per rank
        (``src/hydro/hydro.cpp:270-271``); on one TPU chip the natural
        pack IS the whole mesh: merging removes every inter-block ghost
        copy and the per-block lane-padding tax (a 70-wide mb=64 row
        wastes 45% of each 128-lane register; the merged 256-row wastes
        none).  When every boundary is periodic the merged block takes
        the ghost-FREE layout (cyclic rolls are the BCs — zero ghost
        storage and no boundary-fill pass), which is the production
        bench layout measured at 2.4e8 zone-cycles/s vs 5.2e7 for the
        same deck left in mb=64 ghosted blocks.

        ``parthenon/mesh/merge_blocks = auto|true|false`` (repo
        extension): ``auto`` merges when exactly one device is visible
        (multi-device runs shard the block axis, which needs the
        decomposition).  Outputs/restarts then carry one block — any
        phdf reader reassembles by LogicalLocations, so readers see
        identical global data.  Restart payloads written in a different
        layout resume unmerged (bit-exact resume wins over speed)."""
        mode = pin.get_or_add_string("parthenon/mesh", "merge_blocks",
                                     "auto")
        if mode not in ("auto", "true", "false"):
            raise ValueError(
                f"parthenon/mesh/merge_blocks must be auto|true|false, "
                f"got '{mode}'")
        if mode == "false":
            return mesh
        if mode == "auto" and jax.device_count() != 1:
            return mesh
        merged = mesh
        if mesh.nblocks > 1:
            merged = dataclasses.replace(mesh, mbnx1=mesh.nx1,
                                         mbnx2=mesh.nx2, mbnx3=mesh.nx3)
        # ghost-free upgrade: all-periodic + no custom boundary hooks
        bcs = {merged.ix1_bc, merged.ox1_bc}
        if merged.nx2 > 1:
            bcs |= {merged.ix2_bc, merged.ox2_bc}
        if merged.nx3 > 1:
            bcs |= {merged.ix3_bc, merged.ox3_bc}
        has_bc_hook = getattr(
            get_pgen(pin.get_string("job", "problem_id")),
            "register_boundary_conditions", None) is not None
        if bcs == {"periodic"} and not has_bc_hook and merged.nghost > 0:
            merged = dataclasses.replace(merged, nghost=0)
        if merged is mesh:
            return mesh
        if restart is not None:
            shp = restart["cons"].shape
            want = (1,) + (shp[1],) + (
                merged.nx3 + 2 * merged.ng3, merged.nx2 + 2 * merged.ng2,
                merged.nx1 + 2 * merged.ng1)
            if tuple(shp) != want:
                return mesh       # resume in the checkpoint's own layout
        return merged

    # ------------------------------------------------------------------ steps
    def _estimate(self):
        _, prim = self.pkg.cons_to_prim(self.u)
        dt, dt_hyp, dt_diff = self.pkg.estimate_timestep(prim)
        if self._pe_fn is not None:
            dt = jnp.minimum(dt, self._pe_fn(prim, self.t))
        self.dt_diff = float(dt_diff)
        return dt, dt_hyp

    def _do_outputs(self, force=False):
        if not self.outputs:
            return
        u_np = None
        w_np = None
        for out in self.outputs:
            if not (force or out.due(self.t)):
                continue
            if u_np is None:
                u_j, w_j = self.pkg.cons_to_prim(self.u)
                u_np, w_np = u_j, w_j
            out.write(self.t, self.tm_dt if self.tm_dt is not None else 0.0,
                      u_np, w_np, self.mesh)

    # ------------------------------------------------------------------- run
    def run(self):
        dt, dt_hyp = self._estimate()
        dt = float(dt)
        if self.is_restart and self._restart_dt > 0.0:
            # continue the 2x-growth-cap history across the checkpoint: a
            # resumed run must take the same first dt as the continuous run
            dt = min(2.0 * self._restart_dt, dt)
        self.tm_dt = dt
        if self.tracer_state is not None \
                and self._fill_tracers_hook is not None \
                and not self.is_restart:
            # initial fill of problem tracer fields (the reference calls
            # ProblemFillTracers right after seeding, tracers.cpp:184-186)
            self.tracer_state = self._fill_tracers_hook(
                self.pin, self.mesh, self.cfg, self.tracer_state,
                self.ncycle, self.t, dt)
        self._do_outputs()

        zones = self.mesh.nx1 * self.mesh.nx2 * self.mesh.nx3
        perf_cycles = 0
        perf_start = None

        while self.t < self.tlim and (self.nlim < 0 or self.ncycle < self.nlim):
            if self.ncycle == self.perf_cycle_offset:
                # block on pending work before starting the perf clock
                self.u.block_until_ready()
                perf_start = time.time()
            dt_eff = min(dt, self.tlim - self.t)
            c_h = self.pkg.c_h_from_dt_hyp(float(dt_hyp))
            sts = (self.pkg.diffusion.any_enabled
                   and self.pkg.diffusion.integrator == "rkl2")
            fused_dt = not sts and self.src_first_order is None \
                and self.src_strang is None \
                and self._pe_fn is None
            if sts:
                # Strang wrap: half diffusive step before and after the
                # hydro cycle (hydro_driver.cpp:456-458, 581-583)
                self.u = self.pkg.sts_half_step(self.u, 0.5 * dt_eff,
                                                self.dt_diff)
            if self.src_strang is not None:
                # initial Strang split source (hydro_driver.cpp:460-470)
                self.u = self.pkg.apply_boundaries(
                    self.src_strang(self.u, dt_eff, self.t))
            if fused_dt and self.tracer_state is not None:
                # one dispatch: step + dt estimate + tracer advect/fill
                self.u, self.tracer_state, dts = self._step_tracers(
                    self.u, self.tracer_state, dt_eff, c_h, self.t)
            elif fused_dt:
                self.u, dts = self.pkg.step_with_dt(self.u, dt_eff, c_h,
                                                    self.t)
            else:
                self.u = self.pkg.step(self.u, dt_eff, c_h, self.t)
            if self.src_strang is not None:
                # final Strang application (hydro_driver.cpp:548-553)
                self.u = self.pkg.apply_boundaries(
                    self.src_strang(self.u, dt_eff, self.t))
            if self.src_first_order is not None:
                # first-order split source, once per cycle at full dt
                # (AddSplitSourcesFirstOrder, hydro_driver.cpp:548-561)
                self.u = self.pkg.apply_boundaries(
                    self.src_first_order(self.u, dt_eff, self.t))
            if sts:
                self.u = self.pkg.sts_half_step(self.u, 0.5 * dt_eff,
                                                self.dt_diff)
            if self.tracer_state is not None and not fused_dt:
                # slow path (split sources / STS / pgen dt): advect with
                # last-filled velocities, then resample fields
                _, w_now = self.pkg.cons_to_prim(self.u)
                self.tracer_state = self.tracers.advect(
                    self.tracer_state, w_now, dt_eff)
                self.tracer_state = self.tracers.fill(self.tracer_state,
                                                      w_now)
            self.t += dt_eff
            self.ncycle += 1
            if self.tracer_state is not None \
                    and self._fill_tracers_hook is not None:
                self.tracer_state = self._fill_tracers_hook(
                    self.pin, self.mesh, self.cfg, self.tracer_state,
                    self.ncycle, self.t, dt_eff)
            if perf_start is not None:
                perf_cycles += 1
            self.tm_dt = dt_eff

            if fused_dt:
                dt_new, dt_hyp, dt_diff = dts
                self.dt_diff = float(dt_diff)
            else:
                dt_new, dt_hyp = self._estimate()
            dt = min(2.0 * dt, float(dt_new))

            if not self.quiet and self.ncycle_out > 0 and \
                    self.ncycle % self.ncycle_out == 0:
                print(f"cycle={self.ncycle} time={self.t:.8e} dt={dt_eff:.8e}",
                      flush=True)
            self._do_outputs()

        self.u.block_until_ready()
        if perf_start is not None and perf_cycles > 0:
            wall = time.time() - perf_start
            zc_per_s = zones * perf_cycles / wall
            print(f"walltime used = {wall:.6e}")
            print(f"zone-cycles/wallsecond = {zc_per_s:.6e}", flush=True)

        self._do_outputs(force=True)
        after = getattr(self.pgen, "user_work_after_loop", None)
        if after is not None:
            after(self.pin, self.mesh, self.cfg, self.eos, self)
        return self

    # ------------------------------------------------------------- accessors
    def prim(self):
        _, w = self.pkg.cons_to_prim(self.u)
        return np.asarray(w)

    def cons(self):
        u, _ = self.pkg.cons_to_prim(self.u)
        return np.asarray(u)


class _Hdf5Output:
    def __init__(self, base_name, oid, variables, dt, single_precision,
                 swarm_vars=None, sim=None):
        self.base_name = base_name
        self.oid = oid
        self.variables = variables
        self.dt = dt
        self.single_precision = single_precision
        self.swarm_vars = swarm_vars or {}
        self.sim = sim
        self.next_time = 0.0
        self.count = 0

    def due(self, t):
        return self.dt >= 0.0 and t >= self.next_time

    def write(self, t, dt, u, w, mesh):
        fname = f"{self.base_name}.out_{self.oid}.{self.count:05d}.phdf"
        kw = {}
        if "cons" in self.variables:
            kw["cons"] = np.asarray(u)
        if "prim" in self.variables:
            kw["prim"] = np.asarray(w)
        if self.swarm_vars and self.sim is not None and \
                self.sim.tracer_state is not None:
            from .tracers import compact_swarm
            kw["swarms"] = {name: compact_swarm(self.sim.tracer_state, vs)
                            for name, vs in self.swarm_vars.items()}
        from .core.indices import GLMMHD, NGLMMHD, NHYDRO  # noqa
        fluid = "glmmhd" if u.shape[1] >= NGLMMHD else "euler"
        write_phdf(fname, mesh, fluid, t, dt, self.count,
                   single_precision=self.single_precision, **kw)
        self.count += 1
        # negative dt = final-output-only (no periodic trigger to advance)
        while self.dt > 0.0 and self.next_time <= t:
            self.next_time += self.dt


class _RestartOutput:
    def __init__(self, base_name, oid, dt, sim):
        self.base_name = base_name
        self.oid = oid
        self.dt = dt
        self.sim = sim
        self.next_time = 0.0
        self.count = 0

    def due(self, t):
        return self.dt >= 0.0 and t >= self.next_time

    def write(self, t, dt, u, w, mesh):
        from .outputs.restart import write_restart
        fname = f"{self.base_name}.out_{self.oid}.{self.count:05d}.rhdf"
        # advance the trigger BEFORE writing so the checkpoint stores the
        # post-write state: a resume continues at count+1, not rewriting us
        self.count += 1
        while self.dt > 0.0 and self.next_time <= t:
            self.next_time += self.dt
        write_restart(fname, self.sim)


def run_from_file(path: str, overrides=None, quiet=False):
    pin = ParameterInput.from_file(path, overrides)
    mode = pin.get_or_add_string("parthenon/mesh", "refinement", "none")
    if mode in ("static", "adaptive"):
        from .amr.driver import SmrSimulation
        return SmrSimulation(pin, quiet=quiet).run()
    if mode != "none":
        raise ValueError(
            f"<parthenon/mesh> refinement = '{mode}' — expected "
            "'none', 'static', or 'adaptive'")
    return Simulation(pin, quiet=quiet).run()


def run_from_restart(path: str, overrides=None, quiet=False):
    from .outputs.restart import read_restart
    pin, payload = read_restart(path)
    if overrides:
        pin.apply_overrides(overrides)
    if "levels" in payload:   # refined-mesh checkpoint
        from .amr.driver import SmrSimulation
        return SmrSimulation(pin, quiet=quiet, restart=payload).run()
    return Simulation(pin, quiet=quiet, restart=payload).run()


def write_restart_file(sim, fname):
    from .outputs.restart import write_restart
    write_restart(fname, sim)


def main(argv=None):
    """CLI: python -m athenapk_tpu.driver -i deck.in [ovr...]
            python -m athenapk_tpu.driver -r file.rhdf [ovr...]
       Optional: -t TRACE_DIR wraps the run in a jax.profiler trace
       (viewable in XProf/TensorBoard) — the Kokkos-Tools/nvprof analog
       of the reference's named kernels (SURVEY §5; every jitted phase
       here carries a jax.named_scope)."""
    argv = argv if argv is not None else sys.argv[1:]
    trace_dir = None
    if "-t" in argv:
        i = argv.index("-t")
        trace_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]

    def _run():
        if "-r" in argv:
            i = argv.index("-r")
            path = argv[i + 1]
            overrides = [a for a in argv[:i] + argv[i + 2:] if "=" in a]
            run_from_restart(path, overrides)
            return 0
        if "-i" not in argv:
            print("usage: python -m athenapk_tpu.driver -i input.in "
                  "[block/key=value ...]  (or -r file.rhdf) "
                  "[-t trace_dir]")
            return 1
        i = argv.index("-i")
        path = argv[i + 1]
        overrides = [a for a in argv[:i] + argv[i + 2:] if "=" in a]
        run_from_file(path, overrides)
        return 0

    if trace_dir is not None:
        import jax
        with jax.profiler.trace(trace_dir):
            return _run()
    return _run()


if __name__ == "__main__":
    raise SystemExit(main())
