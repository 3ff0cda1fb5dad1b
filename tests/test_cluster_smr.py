"""Cluster application on refined meshes (VERDICT round-2 item 4).

The reference's cluster decks all run with static refinement
(``/root/reference/inputs/cluster/cluster.in:26``); its AGN reductions
are volume-weighted across levels via MPI_Allreduce
(``hydro_driver.cpp:360-449``).  These tests check (a) the reference
deck runs end-to-end on the refined-mesh driver, (b) the HSE atmosphere
stays static across a level boundary, (c) the COLD_GAS accretion
reduction is exactly volume-weighted on a mixed-level mesh.
"""

import os

import numpy as np
import pytest

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.core.indices import IDN, IPR, IV1, IV2, IV3

REF_DECK = "/root/reference/inputs/cluster/cluster.in"
COOL_TABLE = "/root/reference/inputs/cooling_tables/schure.cooling_1.0Z"

from tests.test_cluster import DECK as HSE_DECK  # noqa: E402

SMR_HSE_DECK = HSE_DECK.replace(
    "<parthenon/mesh>",
    """<parthenon/mesh>
refinement = static
""").replace("""<parthenon/meshblock>
nx1 = 16
nx2 = 16
nx3 = 16""", """<parthenon/meshblock>
nx1 = 8
nx2 = 8
nx3 = 8""") + """
<parthenon/static_refinement0>
x1min = -0.02
x1max = 0.02
x2min = -0.02
x2max = 0.02
x3min = -0.02
x3max = 0.02
level = 1
"""


def test_hse_stays_static_on_smr(tmp_path):
    """The reference cluster_hse essence on a two-level static mesh."""
    from athenapk_tpu.amr.driver import SmrSimulation
    pin = ParameterInput.from_string(SMR_HSE_DECK)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = SmrSimulation(pin, quiet=True)
        from athenapk_tpu.eos.adiabatic import cons_to_prim
        g = sim.smesh.base.nghost
        w0 = {lev: np.asarray(cons_to_prim(sim.eos, u, "euler", 0)[1])
              for lev, u in sim.state.items()}
        sim.run()
        w1 = {lev: np.asarray(cons_to_prim(sim.eos, u, "euler", 0)[1])
              for lev, u in sim.state.items()}
    finally:
        os.chdir(cwd)
    assert set(w1) == {0, 1}, "expected a two-level mesh"
    for lev in w1:
        a = w0[lev][:, :, g:-g, g:-g, g:-g]
        b = w1[lev][:, :, g:-g, g:-g, g:-g]
        cs0 = np.sqrt(sim.eos.gamma * a[:, IPR] / a[:, IDN])
        mach = np.abs(b[:, [IV1, IV2, IV3]]).max() / cs0.min()
        assert mach < 2e-2, f"level {lev}: HSE developed Mach {mach:.2e}"
        drho = np.abs((b[:, IDN] - a[:, IDN]) / a[:, IDN])
        assert drho.mean() < 2e-3, f"level {lev}: drift {drho.mean():.2e}"


def test_cold_gas_accretion_volume_weighted():
    """COLD_GAS accretion on a mixed-level mesh: the removed mass must be
    mdot*beta_dt with mdot the exact volume-weighted interior sum across
    levels (a single scalar cell_volume would be wrong here)."""
    import jax.numpy as jnp
    from athenapk_tpu.amr.driver import SmrSimulation
    from athenapk_tpu.eos.adiabatic import cons_to_prim
    from athenapk_tpu.pgen.cluster.pgen import problem_source_unsplit_smr

    deck = SMR_HSE_DECK + """
<problem/cluster/uniform_gas>
init_uniform_gas = true
rho = 100.0
ux = 0.0
uy = 0.0
uz = 0.0
pres = 1.5

<problem/cluster/agn_triggering>
triggering_mode = COLD_GAS
accretion_radius = 0.08
cold_temp_thresh = 1.0e30
cold_t_acc = 0.1

<problem/cluster/agn_feedback>
efficiency = 0.0
fixed_power = 0.0
thermal_fraction = 0.0
kinetic_fraction = 0.0
magnetic_fraction = 0.0
"""
    pin = ParameterInput.from_string(deck)
    pin.set("problem/cluster/gravity", "gravity_srcterm", False)
    sim = SmrSimulation(pin, quiet=True)
    sm = sim.smesh
    base = sm.base
    g = base.nghost

    # independent count of interior cells inside the accretion radius
    r_acc = 0.08
    rho0 = 100.0
    v_counted = 0.0
    v_by_level = {}
    for gid in range(sm.levels.size):
        lev = int(sm.levels[gid])
        x, y, z = sm.cell_centers_leaf(gid)
        r = np.sqrt(np.broadcast_to(x ** 2 + y ** 2 + z ** 2,
                                    base.block_shape))
        inside = r[g:-g, g:-g, g:-g] < r_acc
        d1, d2, d3 = sm.dx(lev)
        v_counted += inside.sum() * d1 * d2 * d3
        v_by_level[lev] = v_by_level.get(lev, 0.0) + inside.sum()
    # the accretion region must genuinely span both levels
    assert all(n > 0 for n in v_by_level.values()) and len(v_by_level) == 2

    src = problem_source_unsplit_smr(pin, sm, sim.cfg, sim.eos)
    prims = {lev: cons_to_prim(sim.eos, u, "euler", 0)[1]
             for lev, u in sim.state.items()}
    beta_dt = 1.0e-4
    state2 = src(dict(sim.state), prims, jnp.asarray(beta_dt), 0.0)

    def total_mass(state):
        m = 0.0
        for lev, u in state.items():
            d1, d2, d3 = sm.dx(lev)
            m += float(np.sum(np.asarray(
                u[:, IDN, g:-g, g:-g, g:-g]))) * d1 * d2 * d3
        return m

    mdot_expected = rho0 * v_counted / 0.1
    removed = total_mass(sim.state) - total_mass(state2)
    np.testing.assert_allclose(removed, mdot_expected * beta_dt, rtol=1e-10)


@pytest.mark.slow
def test_reference_cluster_deck_runs(tmp_path):
    """The reference cluster.in (static refinement, GLM-MHD, cooling,
    full AGN subsystem) runs end-to-end, shrunk to test size."""
    from athenapk_tpu.driver import run_from_file
    overrides = [
        "parthenon/mesh/nx1=32", "parthenon/mesh/nx2=32",
        "parthenon/mesh/nx3=32",
        "parthenon/meshblock/nx1=8", "parthenon/meshblock/nx2=8",
        "parthenon/meshblock/nx3=8",
        "parthenon/static_refinement1/level=2",
        "parthenon/time/nlim=2",
        "parthenon/time/ncycle_out=0",
        f"cooling/table_filename={COOL_TABLE}",
        "parthenon/output1/dt=-1",
        "parthenon/output2/dt=-1",
    ]
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = run_from_file(REF_DECK, overrides, quiet=True)
    finally:
        os.chdir(cwd)
    assert sim.ncycle == 2
    for lev, u in sim.state.items():
        assert np.isfinite(np.asarray(u)).all(), f"level {lev} not finite"


@pytest.mark.slow
def test_cloud_deck_adaptive_inflow():
    """The reference cloud deck (refinement=adaptive + custom
    cloud_inflow_x2 BC + ProblemCheckRefinementBlock scalar tagging)
    runs end-to-end on the adaptive mesh: finite state, multi-level
    grid tracking the cloud, wind state present in the inflow ghosts
    (VERDICT round-2 item 6; reference main.cpp:76-77, cloud.cpp)."""
    import jax.numpy as jnp
    from athenapk_tpu.config.parameter_input import ParameterInput
    from athenapk_tpu.amr.driver import SmrSimulation

    pin = ParameterInput.from_file(
        "/root/reference/inputs/cloud.in",
        ["parthenon/mesh/nx1=16", "parthenon/mesh/nx2=32",
         "parthenon/mesh/nx3=16", "parthenon/meshblock/nx1=8",
         "parthenon/meshblock/nx2=8", "parthenon/meshblock/nx3=8",
         "parthenon/mesh/numlevel=2", "parthenon/time/nlim=2",
         "parthenon/time/ncycle_out=0", "parthenon/time/ncycle_out_mesh=0",
         "hydro/reconstruction=plm", "parthenon/mesh/nghost=2"])
    sim = SmrSimulation(pin, quiet=True)
    assert "cloud_inflow_x2" in sim._custom_bcs
    assert sim._problem_check is not None
    sim.run()
    assert sim.ncycle == 2
    # initial-AMR loop refined around the cloud (regenerated, not
    # prolongated: pressure stays positive without floors)
    assert sim._smesh_now().max_level >= 1
    from athenapk_tpu.eos.adiabatic import cons_to_prim
    for lev, u in sim.state.items():
        assert bool(jnp.isfinite(u).all()), f"level {lev} not finite"
        _, w = cons_to_prim(sim.eos, u, sim.cfg.fluid, sim.cfg.nscalars)
        g = sim.smesh.base.nghost
        assert float(w[:, 4, g:-g, g:-g, g:-g].min()) > 0.0
    # inflow ghosts on the inner-x2 face carry the wind density
    from athenapk_tpu.pgen.cloud import _params
    cp = _params(pin)
    sm = sim._smesh_now()
    lev0 = min(sm.level_ids)
    ids = sm.level_ids[lev0]
    edge = [i for i, gid in enumerate(ids) if sm.lx2[gid] == 0]
    g = sm.base.nghost
    rho_ghost = np.asarray(sim.state[lev0])[edge, 0, g:-g, :g, g:-g]
    np.testing.assert_allclose(rho_ghost, cp.rho_wind, rtol=1e-12)
