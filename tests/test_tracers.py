"""Tracer particle tests (reference particle_advection suite +
swarm behavior): per-block buffers, block migration, non-periodic
deactivation, sharded execution, and .phdf swarm output."""

import os

import jax
import numpy as np

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.driver import Simulation

DECK = """
<job>
problem_id = advection

<problem/advection>
vx = 1.0
vy = 0.5
vz = 0.25
rho_ratio = 0.0
rho_radius = 0.0
rho0 = 1.0
p0 = 1.0

<parthenon/mesh>
nghost = 2
nx1 = 16
x1min = 0.0
x1max = 1.0
nx2 = 16
x2min = 0.0
x2max = 1.0
nx3 = 16
x3min = 0.0
x3max = 1.0

<parthenon/meshblock>
nx1 = 8
nx2 = 8
nx3 = 8

<parthenon/time>
integrator = rk2
cfl = 0.4
tlim = 0.0577350269189626
nlim = 1000
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hllc
reconstruction = plm
gamma = 1.666666666666667

<tracers>
enabled = true
initial_seed_method = random_per_block
initial_num_tracers_per_cell = 0.05
initial_rng_seed = 42
"""


def _active_sorted_by_id(state):
    """{field: np[n_active]} in tracer-id order (migration permutes
    buffer slots, so compare by id)."""
    act = np.asarray(state["active"]).ravel()
    ids = np.asarray(state["id"]).ravel()[act]
    order = np.argsort(ids)
    out = {}
    for k, v in state.items():
        if k in ("active", "n_lost"):
            continue
        out[k] = np.asarray(v).ravel()[act][order]
    return out


def test_tracer_uniform_advection():
    pin = ParameterInput.from_string(DECK)
    sim = Simulation(pin, quiet=True)
    ts0 = _active_sorted_by_id(sim.tracer_state)
    n0 = int(np.asarray(sim.tracer_state["active"]).sum())
    sim.run()
    ts = _active_sorted_by_id(sim.tracer_state)
    # no particle lost on a periodic domain
    assert int(np.asarray(sim.tracer_state["active"]).sum()) == n0
    assert int(np.asarray(sim.tracer_state["n_lost"])) == 0
    np.testing.assert_array_equal(ts0["id"], ts["id"])
    # advection pgen rescales tlim by diag/|v|; final t known from sim.t
    t = sim.t
    for comp, v in (("x", 1.0), ("y", 0.5), ("z", 0.25)):
        expect = (ts0[comp] + v * t) % 1.0
        err = np.abs((ts[comp] - expect + 0.5) % 1.0 - 0.5)
        assert err.max() < 1e-10, f"{comp}: max err {err.max():.2e}"
    # sampled fields present and sane
    np.testing.assert_allclose(ts["rho"], 1.0, rtol=1e-10)
    np.testing.assert_allclose(ts["vel_x"], 1.0, rtol=1e-10)


def test_tracer_migration_ownership():
    """After advecting across block boundaries every active particle
    sits in the buffer of the block that contains its position."""
    pin = ParameterInput.from_string(DECK)
    sim = Simulation(pin, quiet=True)
    sim.run()
    st = sim.tracer_state
    mesh = sim.mesh
    act = np.asarray(st["active"])
    x = np.asarray(st["x"])
    y = np.asarray(st["y"])
    z = np.asarray(st["z"])
    nb, cap = act.shape
    b1 = np.clip((x // (mesh.mbnx1 * mesh.dx1)).astype(int), 0, mesh.nb1 - 1)
    b2 = np.clip((y // (mesh.mbnx2 * mesh.dx2)).astype(int), 0, mesh.nb2 - 1)
    b3 = np.clip((z // (mesh.mbnx3 * mesh.dx3)).astype(int), 0, mesh.nb3 - 1)
    owner = b1 + mesh.nb1 * (b2 + mesh.nb2 * b3)
    slots = np.broadcast_to(np.arange(nb)[:, None], (nb, cap))
    np.testing.assert_array_equal(owner[act], slots[act])
    # migration happened at least once (flow crosses block boundaries)
    ids0_by_block = np.asarray(st["id"])  # ids were seeded block-contiguous
    n_per_block = int(mesh.mbnx1 * mesh.mbnx2 * mesh.mbnx3 * 0.05)
    home = ids0_by_block // n_per_block
    assert (home[act] != slots[act]).any()


def test_tracer_outflow_deactivates():
    """Non-periodic faces drop leavers (Parthenon swarm behavior):
    with outflow-x1 the +x drift pushes tracers out; none wrap."""
    deck = DECK.replace(
        "<parthenon/meshblock>",
        "ix1_bc = outflow\nox1_bc = outflow\n\n<parthenon/meshblock>")
    pin = ParameterInput.from_string(deck)
    sim = Simulation(pin, quiet=True)
    st0 = _active_sorted_by_id(sim.tracer_state)
    n0 = int(np.asarray(sim.tracer_state["active"]).sum())
    sim.run()
    st = sim.tracer_state
    act = np.asarray(st["active"])
    n_end = int(act.sum())
    n_lost = int(np.asarray(st["n_lost"]))
    assert n_end + n_lost == n0
    # exactly the tracers seeded within v*t of the +x face left
    expected_lost = int((st0["x"] + 1.0 * sim.t >= 1.0).sum())
    assert n_lost == expected_lost, (n_lost, expected_lost)
    x = np.asarray(st["x"])[act]
    assert (x >= 0.0).all() and (x < 1.0).all()


def test_tracer_fast_path_matches_slow_path():
    """Tracers on the fused fast path (one jitted dispatch per cycle:
    step + dt estimate + tracer advect/fill) must reproduce the slow
    path (separate cons_to_prim + advect + fill dispatches).  The slow
    path is forced with a no-op Strang source (fused_dt requires
    src_strang is None); on a periodic domain the extra boundary fill
    is a no-op, so the two runs are physically identical."""
    pin = ParameterInput.from_string(DECK)
    fast = Simulation(pin, quiet=True)
    assert fast._step_tracers is not None
    fast.run()

    pin2 = ParameterInput.from_string(DECK)
    slow = Simulation(pin2, quiet=True)
    slow.src_strang = lambda u, dt, t: u
    slow.run()

    assert fast.ncycle == slow.ncycle
    assert abs(fast.t - slow.t) < 1e-12
    ts_f = _active_sorted_by_id(fast.tracer_state)
    ts_s = _active_sorted_by_id(slow.tracer_state)
    np.testing.assert_array_equal(ts_f["id"], ts_s["id"])
    for comp in ("x", "y", "z", "rho", "vel_x"):
        np.testing.assert_allclose(ts_f[comp], ts_s[comp], rtol=1e-6,
                                   atol=1e-12, err_msg=comp)


def test_tracer_advect_sharded_bitwise():
    """advect+fill on a block-sharded 8-device mesh must be bitwise
    identical to the replicated run (per-block interpolation is local;
    migration is the only cross-device op)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from athenapk_tpu.parallel.mesh_sharding import make_device_mesh

    pin = ParameterInput.from_string(DECK)
    sim = Simulation(pin, quiet=True)
    _, w = sim.pkg.cons_to_prim(sim.u)
    st = sim.tracer_state
    dt = 0.01

    ref_a = sim.tracers.advect(st, w, dt)
    ref = sim.tracers.fill(ref_a, w)

    dmesh = make_device_mesh()
    shard = NamedSharding(dmesh, P("blocks"))
    w_s = jax.device_put(w, shard)
    st_s = {k: jax.device_put(v, shard if np.ndim(v) == 2 else
                              NamedSharding(dmesh, P()))
            for k, v in st.items()}
    got_a = sim.tracers.advect(st_s, w_s, dt)
    got = sim.tracers.fill(got_a, w_s)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k]),
                                      np.asarray(got[k]), err_msg=k)


def test_tracer_swarm_phdf_output(tmp_path):
    """`swarms = tracers` in an hdf5 output block writes the compacted
    swarm group with the requested variables (docs/input.md:353-366)."""
    deck = DECK + """
<parthenon/output0>
file_type = hdf5
variables = prim
dt = 1.0
id = prim
swarms = tracers
tracers_variables = id, x, y, z, rho
"""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        pin = ParameterInput.from_string(deck)
        pin.apply_overrides(["parthenon/time/nlim=2"])
        sim = Simulation(pin, quiet=True)
        sim.run()
        from athenapk_tpu.outputs.hdf5 import read_phdf
        d = read_phdf("advection.out_prim.00000.phdf")
    finally:
        os.chdir(cwd)
    assert "tracers" in d.swarms
    sw = d.swarms["tracers"]
    n_active = int(np.asarray(sim.tracer_state["active"]).sum())
    for var in ("id", "x", "y", "z", "rho"):
        assert var in sw, f"missing swarm var {var}"
        assert len(sw[var]) == n_active
    assert (np.sort(sw["id"]) == np.arange(n_active)).all()


# capacity_factor 16: the refined octant is seeded at 8x the coarse
# per-volume density, so a downstream coarse block can receive well over
# the default 2x headroom without any physical loss
SMR_DECK = (DECK + "capacity_factor = 16.0\n").replace(
    "<parthenon/meshblock>",
    """refinement = static
numlevel = 2

<parthenon/static_refinement0>
x1min = 0.55
x1max = 0.95
x2min = 0.55
x2max = 0.95
x3min = 0.55
x3max = 0.95
level = 1

<parthenon/meshblock>""")


def test_tracer_smr_advection():
    """Uniform flow on a two-level static mesh: ballistic positions exact
    across level boundaries; every particle sits in the finest leaf
    covering its position; none lost on the periodic domain."""
    from athenapk_tpu.amr.driver import SmrSimulation

    pin = ParameterInput.from_string(SMR_DECK)
    sim = SmrSimulation(pin, quiet=True)
    assert len(sim.smesh.level_ids) == 2

    def active_by_id(state):
        out = {}
        for lev in sorted(state["levels"]):
            st = state["levels"][lev]
            act = np.asarray(st["active"]).reshape(-1)
            for k, v in st.items():
                if k == "active":
                    continue
                out.setdefault(k, []).append(
                    np.asarray(v).reshape(-1)[act])
        merged = {k: np.concatenate(v) for k, v in out.items()}
        order = np.argsort(merged["id"])
        return {k: v[order] for k, v in merged.items()}

    ts0 = active_by_id(sim.tracer_state)
    n0 = len(ts0["id"])
    assert n0 > 0
    sim.run()
    ts = active_by_id(sim.tracer_state)
    assert int(np.asarray(sim.tracer_state["n_lost"])) == 0
    np.testing.assert_array_equal(ts0["id"], ts["id"])
    t = sim.t
    for comp, v in (("x", 1.0), ("y", 0.5), ("z", 0.25)):
        expect = (ts0[comp] + v * t) % 1.0
        err = np.abs((ts[comp] - expect + 0.5) % 1.0 - 0.5)
        assert err.max() < 1e-10, f"{comp}: max err {err.max():.2e}"
    np.testing.assert_allclose(ts["rho"], 1.0, rtol=1e-10)

    # ownership: each particle lives in the finest leaf covering it
    sm = sim.smesh
    base = sm.base
    for lev in sorted(sim.tracer_state["levels"]):
        st = sim.tracer_state["levels"][lev]
        act = np.asarray(st["active"])
        if not act.any():
            continue
        ids_lev = sm.level_ids[lev]
        x = np.asarray(st["x"])
        y = np.asarray(st["y"])
        z = np.asarray(st["z"])
        w1 = base.mbnx1 * base.dx1 / (1 << lev)
        w2 = base.mbnx2 * base.dx2 / (1 << lev)
        w3 = base.mbnx3 * base.dx3 / (1 << lev)
        for i in range(act.shape[0]):
            gid = ids_lev[i]
            sel = act[i]
            if not sel.any():
                continue
            assert (np.floor(x[i][sel] / w1).astype(int)
                    == sm.lx1[gid]).all()
            assert (np.floor(y[i][sel] / w2).astype(int)
                    == sm.lx2[gid]).all()
            assert (np.floor(z[i][sel] / w3).astype(int)
                    == sm.lx3[gid]).all()


def test_tracer_smr_swarm_dump_and_restart(tmp_path):
    """Swarm group in the mixed-level .phdf; tracer state survives a
    bitwise SMR restart."""
    from athenapk_tpu.amr.driver import SmrSimulation
    from athenapk_tpu.driver import run_from_restart

    deck = SMR_DECK + """
<parthenon/output0>
file_type = hdf5
variables = prim
dt = 1.0
id = prim
swarms = tracers
tracers_variables = id, x, y, z, rho

<parthenon/output1>
file_type = rst
dt = 1.0
id = restart
"""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        pin = ParameterInput.from_string(deck)
        pin.apply_overrides(["parthenon/time/nlim=2"])
        sim = SmrSimulation(pin, quiet=True)
        sim.run()
        from athenapk_tpu.outputs.hdf5 import read_phdf
        d = read_phdf("advection.outprim.00000.phdf")
        n_active = sum(int(np.asarray(st["active"]).sum())
                       for st in sim.tracer_state["levels"].values())
        assert "tracers" in d.swarms
        assert len(d.swarms["tracers"]["x"]) == n_active

        sim2 = run_from_restart("advection.out_restart.00000.rhdf",
                                ["parthenon/time/nlim=2"], quiet=True)
        for lev, st in sim.tracer_state["levels"].items():
            st2 = sim2.tracer_state["levels"][lev]
            for k in st:
                np.testing.assert_array_equal(
                    np.asarray(st[k]), np.asarray(st2[k]),
                    err_msg=f"lev{lev}/{k}")
    finally:
        os.chdir(cwd)


TURB_DECK = """
<job>
problem_id = turbulence

<problem/turbulence>
rho0 = 1.0
p0 = 1.0
kpeak = 2.0
corr_time = 0.5
rseed = 1234
sol_weight = 1.0
accel_rms = 0.5
num_modes = 2

<modes>
k_1_0 = 2
k_1_1 = 0
k_1_2 = 0
k_2_0 = 1
k_2_1 = 1
k_2_2 = 0

<parthenon/mesh>
nghost = 2
nx1 = 16
x1min = 0.0
x1max = 1.0
nx2 = 16
x2min = 0.0
x2max = 1.0
nx3 = 16
x3min = 0.0
x3max = 1.0

<parthenon/meshblock>
nx1 = 8
nx2 = 8
nx3 = 8

<parthenon/time>
integrator = rk2
cfl = 0.3
tlim = 100.0
nlim = 4
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hlle
reconstruction = plm
gamma = 1.666666666666667

<tracers>
enabled = true
initial_seed_method = random_per_block
initial_num_tracers_per_cell = 0.05
initial_rng_seed = 7
"""


def test_turbulence_tracer_correlations(tmp_path):
    """Turbulence problem tracer fields (s=log rho lookback vectors +
    correlations.csv) — the reference's ProblemFillTracers
    (turbulence.cpp:513-650)."""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        pin = ParameterInput.from_string(TURB_DECK)
        sim = Simulation(pin, quiet=True)
        sim.run()
        st = sim.tracer_state
        act = np.asarray(st["active"])
        s = np.asarray(st["s"])
        rho = np.asarray(st["rho"])
        # slot 0 is the current log(rho)
        np.testing.assert_allclose(s[..., 0][act], np.log(rho[act]),
                                   rtol=1e-12)
        # cadence: slot 1 shifts every cycle, so after the last fill it
        # holds the previous cycle's s0 (nonzero once turbulence stirs)
        assert np.asarray(st["t_lookback"])[0] == sim.t
        with open("correlations.csv") as fh:
            lines = fh.readlines()
        assert lines[0].startswith("# cycle, time, s, sdot")
        # one row per fill: cycles 0..nlim
        assert len(lines) == 1 + 4 + 1
        last = np.array(lines[-1].split(","), dtype=float)
        n_act = act.sum()
        np.testing.assert_allclose(last[2], s[..., 0][act].sum() / n_act,
                                   rtol=1e-12)
        # corr_s[0] = <s0*s0>
        np.testing.assert_allclose(
            last[4], (s[..., 0][act] ** 2).sum() / n_act, rtol=1e-12)
    finally:
        os.chdir(cwd)
