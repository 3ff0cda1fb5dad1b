"""Tracer particles on ADAPTIVE meshes.

The reference rejects tracers on adaptive meshes outright
(``src/tracers/tracers.cpp:77-79`` — "Tracers/swarms currently only
supported on non-adaptive meshes").  Here they are supported: tracer
positions are global coordinates, so on every remesh the new topology's
``SmrTracers`` re-bins the existing population (``adopt``) — a
compact-to-pool + destination-column + stable-sort pack, the same
static-shape machinery as per-cycle migration.  Particle identity,
position, and field samples are preserved exactly across the rebin.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from athenapk_tpu.amr import SmrMesh
from athenapk_tpu.amr.smr import SmrState
from athenapk_tpu.core.mesh import Mesh as CMesh
from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons
from athenapk_tpu.solver.hydro_pkg import HydroConfig
from athenapk_tpu.tracers.smr_tracers import SmrTracers, compact_swarm_smr


def _base(n=16, mb=8):
    return CMesh(nx1=n, nx2=n, nx3=n, mbnx1=mb, mbnx2=mb, mbnx3=mb,
                 x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                 nghost=2)


def _pin():
    return ParameterInput.from_string("""
<job>
problem_id = blast

<tracers>
enabled = true
initial_seed_method = random_per_block
initial_num_tracers_per_cell = 0.02
initial_rng_seed = 5

<parthenon/mesh>
nghost = 2
""")


def _cfg():
    return HydroConfig(fluid="euler", riemann="hllc",
                       reconstruction="plm", integrator="rk2")


def test_adopt_preserves_particles_across_topology_change():
    """Rebin the same population from a 1-region SMR mesh onto a
    2-region mesh: every active particle survives with identical
    (id, x, y, z, fields) and lands on the finest leaf covering it."""
    base = _base()
    pin = _pin()
    sm_old = SmrMesh(base, [(0.0, 0.45, 0.0, 0.45, 0.0, 0.45, 1)])
    sm_new = SmrMesh(base, [(0.0, 0.45, 0.0, 0.45, 0.0, 0.45, 1),
                            (0.55, 1.0, 0.55, 1.0, 0.55, 1.0, 1)])
    tr_old = SmrTracers(pin, sm_old, _cfg())
    st = tr_old.seed()
    assert st is not None
    # stamp a recognizable field value per particle
    for lev in st["levels"]:
        s = st["levels"][lev]
        s["rho"] = jnp.where(s["active"], 1.0 + 0.001 * s["id"], 0.0)

    before = compact_swarm_smr(st, ["id", "x", "y", "z", "rho"])
    order_b = np.argsort(before["id"])

    tr_new = SmrTracers(pin, sm_new, _cfg())
    st2 = tr_new.adopt(st)
    after = compact_swarm_smr(st2, ["id", "x", "y", "z", "rho"])
    order_a = np.argsort(after["id"])

    assert after["id"].size == before["id"].size
    for k in ("id", "x", "y", "z", "rho"):
        np.testing.assert_array_equal(after[k][order_a], before[k][order_b],
                                      err_msg=k)
    assert int(st2["n_lost"]) == int(st["n_lost"])

    # particles inside the NEW refined corner live on level-1 leaves now
    lev1 = st2["levels"][1]
    act1 = np.asarray(lev1["active"])
    x1 = np.asarray(lev1["x"])[act1]
    y1 = np.asarray(lev1["y"])[act1]
    z1 = np.asarray(lev1["z"])[act1]
    in_r2 = (x1 > 0.55) & (y1 > 0.55) & (z1 > 0.55)
    assert in_r2.any(), "no particles rebinned into the new refined region"
    # and NO active particle on a coarse leaf sits inside a refined region
    lev0 = st2["levels"][0]
    act0 = np.asarray(lev0["active"])
    x0 = np.asarray(lev0["x"])[act0]
    y0 = np.asarray(lev0["y"])[act0]
    z0 = np.asarray(lev0["z"])[act0]
    misplaced = ((x0 < 0.45) & (y0 < 0.45) & (z0 < 0.45)) \
        | ((x0 > 0.55) & (y0 > 0.55) & (z0 > 0.55))
    assert not misplaced.any()


@pytest.mark.slow
def test_adaptive_blast_with_tracers_end_to_end():
    """Adaptive blast deck with tracers enabled: the driver refines
    during evolution, tracers survive every remesh (constant active
    population on a fully periodic box) and keep sampling fields."""
    from athenapk_tpu.amr.driver import SmrSimulation

    deck = """
<job>
problem_id = blast

<problem/blast>
radius_outer = 0.12
pressure_ratio = 20.0
density_ratio = 1.0

<refinement>
type = pressure_gradient
threshold_pressure_gradient = 0.06

<tracers>
enabled = true
initial_seed_method = random_per_block
initial_num_tracers_per_cell = 0.05
initial_rng_seed = 3

<parthenon/mesh>
refinement = adaptive
numlevel = 2
nghost = 2
nx1 = 16
x1min = -0.5
x1max = 0.5
ix1_bc = periodic
ox1_bc = periodic
nx2 = 16
x2min = -0.5
x2max = 0.5
ix2_bc = periodic
ox2_bc = periodic
nx3 = 16
x3min = -0.5
x3max = 0.5
ix3_bc = periodic
ox3_bc = periodic

<parthenon/meshblock>
nx1 = 8
nx2 = 8
nx3 = 8

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 0.06
nlim = 12
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hllc
reconstruction = plm
gamma = 1.6666666666667
"""
    pin = ParameterInput.from_string(deck)
    sim = SmrSimulation(pin, quiet=True)
    assert sim.adaptive and sim.tracer_state is not None
    n0 = sum(int(np.asarray(s["active"]).sum())
             for s in sim.tracer_state["levels"].values())
    assert n0 > 0
    sim.run()
    assert sim.driver.smesh.max_level > 0, "blast never refined"
    n1 = sum(int(np.asarray(s["active"]).sum())
             for s in sim.tracer_state["levels"].values())
    assert n1 == n0, f"lost {n0 - n1} tracers across remeshes"
    assert int(sim.tracer_state["n_lost"]) == 0
    # samples are live (filled from the evolved state, not zeros)
    comp = compact_swarm_smr(sim.tracer_state, ["rho", "pressure"])
    assert np.all(comp["rho"] > 0) and np.all(np.isfinite(comp["pressure"]))
