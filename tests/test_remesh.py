"""Dynamic AMR: conservative remesh transfers + criterion-driven evolution.

Remesh transfers (minmod prolongation / average restriction) preserve
block means, so a refine->derefine roundtrip conserves totals to
rounding; a maxdensity-tagged advecting blob must stay refined where the
blob is and the evolution must conserve mass through every remesh."""

import numpy as np
import pytest
import jax.numpy as jnp

from athenapk_tpu.amr import SmrMesh
from athenapk_tpu.amr.remesh import AmrHydro, remesh
from athenapk_tpu.core.mesh import Mesh
from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons
from athenapk_tpu.refinement import RefinementConfig
from athenapk_tpu.solver.hydro_pkg import HydroConfig


def _mesh(n=32, mb=8, g=2):
    return Mesh(nx1=n, nx2=n, nx3=n, mbnx1=mb, mbnx2=mb, mbnx3=mb,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=g)


def _blob_state(sm, eos, x0=0.25):
    base = sm.base
    state = {}
    for lev, ids in sm.level_ids.items():
        w = np.zeros((len(ids), 5) + base.block_shape)
        for li, gid in enumerate(ids):
            x, y, z = sm.cell_centers_leaf(gid)
            r2 = (x - x0) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
            w[li, 0] = 1.0 + np.broadcast_to(np.exp(-r2 / 0.005),
                                             base.block_shape)
            w[li, 1] = 1.0
            w[li, 4] = 1.0
        state[lev] = jnp.asarray(np.asarray(
            prim_to_cons(eos, jnp.asarray(w), "euler")))
    return state


def _total_mass(sm, state):
    g = sm.base.nghost
    tot = 0.0
    for lev, u in state.items():
        d1, d2, d3 = sm.dx(lev)
        tot += float(jnp.sum(u[:, 0, g:-g, g:-g, g:-g])) * d1 * d2 * d3
    return tot


def test_remesh_roundtrip_conserves():
    base = _mesh()
    sm = SmrMesh(base, [], max_level=1)
    eos = EOS(gamma=5.0 / 3.0)
    state = _blob_state(sm, eos)
    from athenapk_tpu.amr.smr import SmrState
    state = SmrState(sm, 5).fill_ghosts(state)
    m0 = _total_mass(sm, state)

    # refine the blob's block neighborhood
    tags = np.zeros(sm.levels.size, np.int32)
    for gid in range(sm.levels.size):
        x, y, z = sm.cell_centers_leaf(gid)
        if ((x - 0.25) ** 2).min() < 0.02 and \
           ((y - 0.5) ** 2).min() < 0.02 and ((z - 0.5) ** 2).min() < 0.02:
            tags[gid] = 1
    sm2, state2 = remesh(sm, state, tags)
    assert sm2.max_level == 1
    m1 = _total_mass(sm2, state2)
    assert abs(m1 - m0) / m0 < 1e-13

    # derefine everything back
    tags2 = -np.ones(sm2.levels.size, np.int32)
    sm3, state3 = remesh(sm2, state2, tags2)
    assert sm3.max_level == 0
    assert sm3.levels.size == 64
    m2 = _total_mass(sm3, state3)
    assert abs(m2 - m0) / m0 < 1e-13


def test_amr_blob_tracking():
    base = _mesh(n=16, mb=8, g=3)
    sm = SmrMesh(base, [], max_level=1)
    eos = EOS(gamma=5.0 / 3.0)
    cfg = HydroConfig(fluid="euler", riemann="hllc",
                      reconstruction="plm", integrator="rk2")
    rcfg = RefinementConfig(method="maxdensity",
                            maxdensity_refine_above=1.3,
                            maxdensity_deref_below=1.1)
    drv = AmrHydro(sm, cfg, eos, rcfg, check_interval=2)
    state = _blob_state(sm, eos, x0=0.3)
    from athenapk_tpu.amr.smr import SmrState
    state = SmrState(sm, 5).fill_ghosts(state)
    state, changed = drv.maybe_remesh(state)
    assert changed and drv.smesh.max_level == 1
    m0 = drv.total_mass(state)
    state = drv.advance(state, 6)
    m1 = drv.total_mass(state)
    assert abs(float(m1) - float(m0)) / float(m0) < 1e-12
    # refined region still tracks the (advected) blob: the densest cell
    # must live on the finest level
    gg = drv.smesh.base.nghost
    best = {lev: float(jnp.max(u[:, 0, gg:-gg, gg:-gg, gg:-gg]))
            for lev, u in state.items()}
    assert best[drv.smesh.max_level] == max(best.values())
    assert all(bool(jnp.isfinite(u).all()) for u in state.values())


def test_deck_driven_smr_simulation(tmp_path, monkeypatch):
    """End-to-end: refinement=static deck through run_from_file."""
    monkeypatch.chdir(tmp_path)
    from athenapk_tpu.driver import run_from_file
    sim = run_from_file(
        "/root/repo/inputs/blast_3d_smr.in",
        overrides=["parthenon/mesh/nx1=32", "parthenon/mesh/nx2=32",
                   "parthenon/mesh/nx3=32", "parthenon/meshblock/nx1=8",
                   "parthenon/meshblock/nx2=8", "parthenon/meshblock/nx3=8",
                   "parthenon/output1/file_type=hdf5",
                   "parthenon/output1/variables=prim",
                   "parthenon/output1/dt=-1.0",
                   "parthenon/time/nlim=4"], quiet=True)
    assert sim.ncycle == 4
    assert {k: v.size for k, v in sim.smesh.level_ids.items()} == \
        {0: 56, 1: 64}
    hst = np.loadtxt(tmp_path / "blast.out0.hst")
    mass0 = hst[2] if hst.ndim == 1 else hst[0, 2]
    assert abs(sim.total_mass() - mass0) / mass0 < 1e-12
    # mixed-level hdf5 dump: per-block coords at level spacing
    import h5py
    with h5py.File(tmp_path / "blast.out1.00000.phdf") as f:
        lv = f["Levels"][:]
        assert list(np.bincount(lv)) == [56, 64]
        x = f["Locations/x"][:]
        dxc = x[np.where(lv == 0)[0][0]]
        dxf = x[np.where(lv == 1)[0][0]]
        assert np.isclose(dxc[1] - dxc[0], 2 * (dxf[1] - dxf[0]))
        assert np.isfinite(f["prim"][:]).all()


def test_smr_restart_bitwise(tmp_path, monkeypatch):
    """Refined-mesh checkpoint/resume is bitwise identical to an
    uninterrupted run (the reference's AMR restart guarantee)."""
    monkeypatch.chdir(tmp_path)
    from athenapk_tpu.driver import run_from_file, run_from_restart
    base_ovr = ["parthenon/mesh/nx1=32", "parthenon/mesh/nx2=32",
                "parthenon/mesh/nx3=32", "parthenon/meshblock/nx1=8",
                "parthenon/meshblock/nx2=8", "parthenon/meshblock/nx3=8",
                "parthenon/output1/file_type=rst",
                "parthenon/output1/dt=-1.0"]
    simA = run_from_file("/root/repo/inputs/blast_3d_smr.in",
                         overrides=base_ovr + ["parthenon/time/nlim=4"],
                         quiet=True)
    refA = {k: np.array(v) for k, v in simA.state.items()}

    simB = run_from_file("/root/repo/inputs/blast_3d_smr.in",
                         overrides=base_ovr + ["parthenon/time/nlim=2"],
                         quiet=True)
    assert (tmp_path / "blast.out_1.00000.rhdf").exists()
    simC = run_from_restart(str(tmp_path / "blast.out_1.00000.rhdf"),
                            overrides=["parthenon/time/nlim=4"],
                            quiet=True)
    assert simC.ncycle == 4 and simC.is_restart
    for k in refA:
        np.testing.assert_array_equal(np.asarray(simC.state[k]), refA[k])


def test_smr_cooling_matches_exact(tmp_path):
    """Pointwise tabular cooling on a two-level mesh: uniform hot gas
    cools identically on both levels and tracks the exact ODE
    (Townsend integrator, same protocol as test_cooling)."""
    import math
    from scipy.integrate import solve_ivp
    from athenapk_tpu.amr.smr_hydro import SmrHydro
    from athenapk_tpu.amr.smr import SmrState
    from athenapk_tpu.config.parameter_input import ParameterInput
    from athenapk_tpu.srcterms.tabular_cooling import TabularCooling
    from athenapk_tpu.utils.units import Units, mean_molecular_weights
    from athenapk_tpu.eos.adiabatic import EOS

    GAMMA, HE_X, RHO = 5.0 / 3.0, 0.25, 1e-24
    MH = 1.007947 * 1.660538921e-24
    table = tmp_path / "powerlaw.cool"
    logT = np.linspace(4.0, 8.0, 41)
    logL = math.log10(1e-23) + 0.5 * (logT - 6.0)
    with open(table, "w") as fh:
        fh.write("# logT logLambda\n")
        for a, b in zip(logT, logL):
            fh.write(f"{a} {b}\n")
    deck = f"""
<units>
code_length_cgs = 1.0
code_mass_cgs = 1.0
code_time_cgs = 1.0

<cooling>
enable_cooling = tabular
table_filename = {table}
lambda_units_cgs = 1.0
integrator = townsend
cfl = -1.0
"""
    pin = ParameterInput.from_string(deck)
    units = Units(pin)
    mu, _ = mean_molecular_weights(HE_X)
    mbar_over_kb = mu * units.mh() / units.k_boltzmann()
    cooling = TabularCooling(pin, units, GAMMA, mu, HE_X, mbar_over_kb)

    base = Mesh(nx1=16, nx2=16, nx3=16, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=2)
    sm = SmrMesh(base, [(0.5, 1.0, 0.5, 1.0, 0.5, 1.0, 1)])
    cfg = HydroConfig(fluid="euler", riemann="none",
                      reconstruction="dc", integrator="rk1")
    eos = EOS(gamma=GAMMA)
    sh = SmrHydro(sm, cfg, eos, cooling=cooling)
    e0 = 1e6 / (mbar_over_kb * (GAMMA - 1.0))
    state = {}
    for lev, ids in sm.level_ids.items():
        u = np.zeros((len(ids), 5) + base.block_shape)
        u[:, 0] = RHO
        u[:, 4] = RHO * e0
        state[lev] = jnp.asarray(u)
    t_end = 3.0e13
    state = sh.step(state, jnp.asarray(t_end), jnp.asarray(0.0))

    def dedt(t, y):
        T = mbar_over_kb * (GAMMA - 1.0) * y
        lam = 1e-23 * (T / 1e6) ** 0.5
        return -lam * ((1.0 - HE_X) / MH) ** 2 * RHO

    e_exact = solve_ivp(dedt, (0.0, t_end), [e0],
                        rtol=1e-12, atol=1e-6).y[0, -1]
    g = base.nghost
    for lev, u in state.items():
        e_sim = np.asarray(u[:, 4, g:-g, g:-g, g:-g]) / RHO
        assert abs(e_sim.mean() - e_exact) / e_exact < 1e-8, lev
        assert e_sim.std() < 1e-8 * e0


def test_smr_conduction_conserves_and_contracts():
    """Thermal conduction across a two-level mesh: total energy is
    conserved to rounding through the coarse-fine flux correction, and
    the temperature field obeys the max principle (extrema contract)."""
    from athenapk_tpu.amr.smr_hydro import SmrHydro
    from athenapk_tpu.amr.smr import SmrState
    from athenapk_tpu.diffusion import DiffusionConfig
    from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons

    base = Mesh(nx1=32, nx2=32, nx3=32, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=2)
    sm = SmrMesh(base, [(0.25, 0.75, 0.25, 0.75, 0.25, 0.75, 1)])
    dc = DiffusionConfig(conduction="isotropic", conduction_coeff="fixed",
                         thermal_diff_coeff=0.05, integrator="unsplit")
    cfg = HydroConfig(fluid="euler", riemann="none",
                      reconstruction="dc", integrator="rk2")
    eos = EOS(gamma=5.0 / 3.0)
    sh = SmrHydro(sm, cfg, eos, diffusion=dc)
    state = {}
    for lev, ids in sm.level_ids.items():
        w = np.zeros((len(ids), 5) + base.block_shape)
        for li, gid in enumerate(ids):
            x, y, z = sm.cell_centers_leaf(gid)
            r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
            w[li, 0] = 1.0
            w[li, 4] = 1.0 + np.broadcast_to(2.0 * np.exp(-r2 / 0.02),
                                             base.block_shape)
        state[lev] = jnp.asarray(np.asarray(
            prim_to_cons(eos, jnp.asarray(w), "euler")))
    state = SmrState(sm, 5).fill_ghosts(state)
    g = base.nghost

    def total_e(st):
        tot = 0.0
        for lev, u in st.items():
            d1, d2, d3 = sm.dx(lev)
            tot += float(jnp.sum(u[:, 4, g:-g, g:-g, g:-g])) * d1 * d2 * d3
        return tot

    def extrema(st):
        pmax = max(float(jnp.max(u[:, 4, g:-g, g:-g, g:-g]))
                   for u in st.values())
        pmin = min(float(jnp.min(u[:, 4, g:-g, g:-g, g:-g]))
                   for u in st.values())
        return pmin, pmax

    e0 = total_e(state)
    lo0, hi0 = extrema(state)
    dt = float(sh.estimate_dt(state))
    assert dt < 0.3 * (sm.dx(1)[0] ** 2) / 0.05   # parabolic dt binds
    for _ in range(6):
        state = sh.step(state, dt, jnp.asarray(0.0))
    e1 = total_e(state)
    lo1, hi1 = extrema(state)
    assert abs(e1 - e0) / e0 < 1e-13
    assert hi1 < hi0 and lo1 >= lo0 - 1e-12
    assert all(bool(jnp.isfinite(u).all()) for u in state.values())


@pytest.mark.slow
def test_smr_rkl2_matches_unsplit():
    """RKL2 super-time-stepping on the refined mesh: conserves energy
    through the coarse-fine-corrected diffusive operator and agrees
    with the unsplit integrator on a smooth conduction problem."""
    from athenapk_tpu.amr.smr_hydro import SmrHydro
    from athenapk_tpu.amr.smr import SmrState
    from athenapk_tpu.diffusion import DiffusionConfig
    from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons

    base = Mesh(nx1=16, nx2=16, nx3=16, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=2)
    sm = SmrMesh(base, [(0.5, 1.0, 0.5, 1.0, 0.5, 1.0, 1)])
    cfg = HydroConfig(fluid="euler", riemann="none",
                      reconstruction="dc", integrator="rk1")
    eos = EOS(gamma=5.0 / 3.0)

    def mk_state():
        state = {}
        for lev, ids in sm.level_ids.items():
            w = np.zeros((len(ids), 5) + base.block_shape)
            for li, gid in enumerate(ids):
                x, y, z = sm.cell_centers_leaf(gid)
                w[li, 0] = 1.0
                w[li, 4] = 1.0 + np.broadcast_to(
                    0.5 * np.sin(2 * np.pi * x) * np.sin(2 * np.pi * y)
                    * np.sin(2 * np.pi * z) + 0.6, base.block_shape)
            state[lev] = jnp.asarray(np.asarray(
                prim_to_cons(eos, jnp.asarray(w), "euler")))
        return SmrState(sm, 5).fill_ghosts(state)

    g = base.nghost
    t_end = 0.02
    kappa = 0.05

    def total_e(st):
        tot = 0.0
        for lev, u in st.items():
            d1, d2, d3 = sm.dx(lev)
            tot += float(jnp.sum(u[:, 4, g:-g, g:-g, g:-g])) * d1 * d2 * d3
        return tot

    results = {}
    for integ in ("unsplit", "rkl2"):
        dc = DiffusionConfig(conduction="isotropic",
                             conduction_coeff="fixed",
                             thermal_diff_coeff=kappa, integrator=integ)
        sh = SmrHydro(sm, cfg, eos, diffusion=dc)
        st = mk_state()
        e0 = total_e(st)
        t = 0.0
        while t < t_end - 1e-12:
            if integ == "rkl2":
                dt_j, dt_diff_j = sh.estimate_dt_with_diff(st)
                dt = min(float(dt_j), t_end - t)
                st = sh.sts_half_step(st, 0.5 * dt, float(dt_diff_j))
                st = sh.step(st, dt, jnp.asarray(0.0))
                st = sh.sts_half_step(st, 0.5 * dt, float(dt_diff_j))
            else:
                dt = min(float(sh.estimate_dt(st)), t_end - t)
                st = sh.step(st, dt, jnp.asarray(0.0))
            t += dt
        assert abs(total_e(st) - e0) / e0 < 1e-12, integ
        results[integ] = {k: np.asarray(v[:, 4, g:-g, g:-g, g:-g])
                          for k, v in st.items()}

    for k in results["unsplit"]:
        diff = np.abs(results["rkl2"][k] - results["unsplit"][k]).max()
        base_mag = np.abs(results["unsplit"][k]).max()
        assert diff / base_mag < 5e-3, (k, diff)


@pytest.mark.slow
def test_sharded_adaptive_remesh_bitwise():
    """Adaptive evolution under GSPMD: AmrHydro(sharding=...) re-deals
    the leaf population over the device mesh after every remesh (the
    AMR load-balancing analog); transfers stay on device and the result
    matches the unsharded run bitwise (VERDICT round-2 item 7)."""
    import jax
    from jax.sharding import (Mesh as JMesh, NamedSharding,
                              PartitionSpec as P)

    base = _mesh()
    eos = EOS(gamma=5.0 / 3.0)
    cfg = HydroConfig(fluid="euler", riemann="hllc",
                      reconstruction="plm", integrator="rk2")
    rcfg = RefinementConfig(method="maxdensity",
                            maxdensity_refine_above=1.3,
                            maxdensity_deref_below=1.05)
    from athenapk_tpu.amr.smr import SmrState

    def fresh():
        sm = SmrMesh(base, [], max_level=1)
        st = _blob_state(sm, eos)
        return sm, SmrState(sm, 5).fill_ghosts(st)

    # unsharded reference
    sm_a, st_a = fresh()
    amr_a = AmrHydro(sm_a, cfg, eos, rcfg, derefine_count=1)
    st_a = amr_a.advance(st_a, 4)

    # sharded: 8-device mesh over the leaf axis
    jm = JMesh(np.array(jax.devices()), ("blocks",))
    shd = NamedSharding(jm, P("blocks"))
    sm_b, st_b = fresh()
    amr_b = AmrHydro(sm_b, cfg, eos, rcfg, derefine_count=1, sharding=shd)
    st_b = {k: jax.device_put(v, shd) for k, v in st_b.items()}
    st_b = amr_b.advance(st_b, 4)

    assert amr_b.smesh.levels.size == amr_a.smesh.levels.size
    assert amr_b.smesh.max_level > 0  # remesh actually refined
    # flat leaf-axis layout (the sharded default): one leaf-major array
    # distributed over the device mesh with exact ±1 real-leaf balance
    assert not isinstance(st_b, dict)
    assert st_b.sharding.spec == P("blocks"), \
        "flat leaf array lost its sharding across remesh"
    dl = amr_b.device_leaf_counts(st_b)
    vals = sorted(dl.values())
    assert sum(vals) == amr_b.smesh.levels.size
    assert vals[-1] - vals[0] <= 1, f"imbalance: {vals}"
    ex_b = amr_b.exact_state(st_b)
    for lev in st_a:
        # flat layout contract: f64 roundoff of the unsharded run (XLA
        # may FMA-contract differently across the reshard boundary —
        # 1-ulp-of-operand cancellation residues where momenta cancel
        # to ~0; the padded layout keeps strict bitwise —
        # test_amr_balance)
        np.testing.assert_allclose(np.asarray(st_a[lev]),
                                   np.asarray(ex_b[lev]),
                                   rtol=1e-12, atol=1e-13,
                                   err_msg=f"level {lev}")


def test_check_interval_limits_remesh_cadence():
    """parthenon/mesh/check_interval: refinement checks fire only every
    N cycles on the deck-driven adaptive driver."""
    from athenapk_tpu.amr.driver import SmrSimulation
    from athenapk_tpu.config.parameter_input import ParameterInput

    deck = """
<job>
problem_id = advection

<problem/advection>
vx = 1.0
vy = 0.0
vz = 0.0
rho_ratio = 8.0
rho_radius = 0.12
rho0 = 1.0
p0 = 1.0

<parthenon/mesh>
refinement = adaptive
numlevel = 2
check_interval = 4
nghost = 2
nx1 = 32
x1min = -0.5
x1max = 0.5
nx2 = 16
x2min = -0.25
x2max = 0.25
nx3 = 16
x3min = -0.25
x3max = 0.25

<parthenon/meshblock>
nx1 = 8
nx2 = 8
nx3 = 8

<refinement>
type = maxdensity
maxdensity_refine_above = 3.0
maxdensity_deref_below = 1.5

<parthenon/time>
integrator = rk2
cfl = 0.3
tlim = 1.0
nlim = 6
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hllc
reconstruction = plm
gamma = 1.6666666666666667
"""
    pin = ParameterInput.from_string(deck)
    sim = SmrSimulation(pin, quiet=True)
    assert sim.driver.check_interval == 4
    calls = []
    orig = sim.driver.maybe_remesh

    def spy(state, tags=None):
        calls.append(sim.ncycle)
        return orig(state, tags)

    sim.driver.maybe_remesh = spy
    sim.run()
    # cycles 0 and 4 only (6 cycles, interval 4)
    assert calls == [0, 4], calls
