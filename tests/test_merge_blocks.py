"""Single-chip block merging (`Simulation._merge_blocks`).

On one device a uniform mesh solves as ONE mesh-spanning block —
ghost-free when all-periodic — removing the inter-block ghost copies
and the per-block lane-padding tax (the reference decomposes only for
MPI-rank granularity, ``src/hydro/hydro.cpp:270-271``; a single XLA
device wants the whole pack).  The merged run must be *numerically
identical* on interiors to the blocked run, and the merge must never
fire when the decomposition is load-bearing (multi-device sharding,
custom boundary hooks, checkpoint layouts).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.driver import Simulation

DECK = """
<job>
problem_id = linear_wave_mhd

<problem/linear_wave>
compute_error = false
wave_flag = 0
amp = 1.0e-3
vflow = 0.0

<parthenon/mesh>
nghost = 3
nx1 = 32
x1min = 0.0
x1max = 3.0
nx2 = 16
x2min = 0.0
x2max = 1.5
nx3 = 16
x3min = 0.0
x3max = 1.5

<parthenon/meshblock>
nx1 = 16
nx2 = 8
nx3 = 8

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 0.03
nlim = 3
ncycle_out = 0

<hydro>
fluid = glmmhd
eos = adiabatic
riemann = hlld
reconstruction = ppm
gamma = 1.666666666666667
"""


def _global_interior(sim):
    m = sim.mesh
    u = np.asarray(sim.u)
    g1, g2, g3 = m.ng1, m.ng2, m.ng3
    ui = u[:, :,
           g3:u.shape[2] - g3 or None,
           g2:u.shape[3] - g2 or None,
           g1:u.shape[4] - g1 or None]
    nvar = ui.shape[1]
    gl = ui.reshape(m.nb3, m.nb2, m.nb1, nvar, m.mbnx3, m.mbnx2, m.mbnx1)
    return gl.transpose(3, 0, 4, 1, 5, 2, 6).reshape(
        nvar, m.nx3, m.nx2, m.nx1)


def _run(merge):
    pin = ParameterInput.from_string(DECK)
    pin.apply_overrides([f"parthenon/mesh/merge_blocks={merge}"])
    sim = Simulation(pin, quiet=True)
    sim.run()
    return sim


def test_merged_bitwise_matches_blocked():
    """Merged ghost-free layout == blocked ghosted layout on every
    interior cell (the ghost-fill contract makes ghost values equal
    rolled interiors EXACTLY, so the whole cycle loop is FP-identical)."""
    blocked = _run("false")
    merged = _run("true")
    assert blocked.mesh.nblocks == 8 and blocked.mesh.nghost == 3
    assert merged.mesh.nblocks == 1 and merged.mesh.nghost == 0
    np.testing.assert_array_equal(_global_interior(blocked),
                                  _global_interior(merged))
    assert blocked.t == merged.t


def test_merge_auto_off_multidevice():
    """conftest forces 8 virtual devices, so auto must keep the
    decomposition (the sharded path needs the block axis)."""
    pin = ParameterInput.from_string(DECK)
    sim = Simulation(pin, quiet=True)
    assert sim.mesh.nblocks == 8 and sim.mesh.nghost == 3


def test_merge_keeps_ghosts_non_periodic():
    """Non-periodic boundaries keep the ghost rim (merge only fuses the
    blocks); the domain BC fill still applies."""
    pin = ParameterInput.from_string(DECK)
    pin.apply_overrides(["parthenon/mesh/merge_blocks=true",
                         "parthenon/mesh/ix1_bc=outflow",
                         "parthenon/mesh/ox1_bc=outflow"])
    sim = Simulation(pin, quiet=True)
    assert sim.mesh.nblocks == 1 and sim.mesh.nghost == 3


def test_merge_skipped_for_foreign_restart_layout():
    """A checkpoint written in a blocked layout resumes in that layout
    (bit-exact resume beats speed)."""
    from athenapk_tpu.core.mesh import Mesh
    pin = ParameterInput.from_string(DECK)
    pin.apply_overrides(["parthenon/mesh/merge_blocks=true"])
    mesh = Mesh.from_parameter_input(pin)
    payload = {"cons": np.zeros((mesh.nblocks, 9) + mesh.block_shape)}
    out = Simulation._merge_blocks(pin, mesh, payload)
    assert out is mesh


def test_merge_rejects_bad_mode():
    pin = ParameterInput.from_string(DECK)
    pin.apply_overrides(["parthenon/mesh/merge_blocks=sometimes"])
    with pytest.raises(ValueError, match="merge_blocks"):
        Simulation(pin, quiet=True)


def test_merged_outputs_read_identically(tmp_path):
    """A user reading dumps sees IDENTICAL global data whether the
    solve merged blocks or not: the merged run writes one
    mesh-spanning block, the phdf reader reassembles both layouts to
    the same global array (the reference's reader contract —
    LogicalLocations-driven reassembly)."""
    import os
    from athenapk_tpu.outputs.hdf5 import read_phdf

    out_deck = DECK + """
<parthenon/output0>
file_type = hdf5
dt = 0.02
variables = prim
"""

    def run_in(sub, merge):
        d = tmp_path / sub
        d.mkdir()
        cwd = os.getcwd()
        os.chdir(d)
        try:
            pin = ParameterInput.from_string(out_deck)
            pin.apply_overrides(
                [f"parthenon/mesh/merge_blocks={merge}"])
            Simulation(pin, quiet=True).run()
        finally:
            os.chdir(cwd)
        dumps = sorted(p for p in d.iterdir()
                       if p.name.endswith(".phdf"))
        assert dumps, "no dumps written"
        return dumps

    da = run_in("blocked", "false")
    db = run_in("merged", "true")
    assert len(da) == len(db)
    for pa, pb in zip(da, db):
        a = read_phdf(str(pa))
        b = read_phdf(str(pb))
        fa, fb = a.flat("prim"), b.flat("prim")
        assert fa.shape == fb.shape
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_merged_tracers_match_blocked():
    """Tracers on a merged ghost-free mesh (single block, cyclic-wrap
    interpolation) reproduce the blocked run's trajectories exactly.
    Seeding itself is decomposition-dependent (per-block RNG streams —
    reference behavior, tracers.cpp:95-167), so the merged run is
    handed the BLOCKED run's initial particle population and must
    advect it identically."""
    import jax.numpy as jnp

    tr_deck = DECK.replace("problem_id = linear_wave_mhd",
                           "problem_id = advection").replace(
        """<problem/linear_wave>
compute_error = false
wave_flag = 0
amp = 1.0e-3
vflow = 0.0""",
        """<problem/advection>
vx = 1.0
vy = 0.5
vz = 0.25
rho_ratio = 0.0
rho_radius = 0.0
rho0 = 1.0
p0 = 1.0""").replace("""<hydro>
fluid = glmmhd
eos = adiabatic
riemann = hlld
reconstruction = ppm""", """<hydro>
fluid = euler
eos = adiabatic
riemann = hllc
reconstruction = plm""").replace("nghost = 3", "nghost = 2").replace(
        "nlim = 3", "nlim = 12") + """
<tracers>
enabled = true
initial_seed_method = random_per_block
initial_num_tracers_per_cell = 0.05
initial_rng_seed = 5
"""

    def make(merge):
        pin = ParameterInput.from_string(tr_deck)
        pin.apply_overrides([f"parthenon/mesh/merge_blocks={merge}"])
        return Simulation(pin, quiet=True)

    a = make("false")
    b = make("true")
    assert b.mesh.nblocks == 1 and b.mesh.nghost == 0

    # hand the blocked seed to the merged run (one block owns all)
    st_a = a.tracer_state
    act = np.asarray(st_a["active"]).ravel()
    n = int(act.sum())
    st_b = {}
    for k, v in st_a.items():
        if k == "n_lost":
            st_b[k] = jnp.zeros((), jnp.int32)
            continue
        q = np.asarray(v)
        st_b[k] = jnp.asarray(
            q.reshape((q.shape[0] * q.shape[1],) + q.shape[2:])[act]
            [None])                       # [1, n, ...]
    b.tracer_state = st_b
    b.tracers.cap = n

    a.run()
    b.run()

    def by_id(st):
        m = np.asarray(st["active"]).ravel()
        ids = np.asarray(st["id"]).ravel()[m]
        order = np.argsort(ids)
        return {k: np.asarray(v).ravel()[m][order]
                for k, v in st.items() if k != "n_lost"}

    sa, sb = by_id(a.tracer_state), by_id(b.tracer_state)
    assert sa["id"].size == sb["id"].size == n > 0
    for k in ("x", "y", "z", "rho", "vel_x"):
        np.testing.assert_allclose(sa[k], sb[k], rtol=0, atol=1e-13,
                                   err_msg=k)
