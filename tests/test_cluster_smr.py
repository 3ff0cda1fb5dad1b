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


def test_init_perturb_smr_matches_uniform_at_2x():
    """`init_perturb` on a refined mesh (cluster.cpp:377-461): a FULLY
    refined two-level mesh samples the same continuous few-modes
    realization as the uniform mesh at 2x resolution — velocity,
    magnetic field, and energy agree cell-by-cell; and the rms
    normalization is exactly volume-weighted across levels."""
    from athenapk_tpu.amr.driver import SmrSimulation
    from athenapk_tpu.core.indices import IM1, IM2, IM3, IEN, IB1, IB3
    from athenapk_tpu.driver import Simulation
    from tests.test_agn_feedback import BASE

    sigma_v, sigma_b = 7.5e-2, 2.5e-3
    PERTURB = f"""
<hydro>
fluid = glmmhd

<parthenon/time>
nlim = 0

<problem/cluster/init_perturb>
sigma_v = {sigma_v}
l_peak_v = 0.5
num_modes_v = 10
sol_weight_v = 1.0
rseed_v = 3
sigma_b = {sigma_b}
k_peak_b = 4.0
num_modes_b = 10
rseed_b = 4
"""
    # uniform 32^3 (BASE's own mesh)
    pin_u = ParameterInput.from_string(BASE + PERTURB)
    sim_u = Simulation(pin_u, quiet=True)
    m = sim_u.mesh
    g = m.nghost
    uu = np.asarray(sim_u.cons())
    glob_u = uu[:, :, g:-g, g:-g, g:-g].reshape(
        m.nb3, m.nb2, m.nb1, uu.shape[1], m.mbnx3, m.mbnx2, m.mbnx1
    ).transpose(3, 0, 4, 1, 5, 2, 6).reshape(uu.shape[1], 32, 32, 32)

    # fully-refined SMR: 16^3 base, everything at level 1 -> fine 32^3
    smr_deck = BASE.replace("""<parthenon/mesh>
nghost = 2
nx1 = 32""", """<parthenon/mesh>
refinement = static
nghost = 2
nx1 = 16""").replace("""nx2 = 32
x2min""", """nx2 = 16
x2min""").replace("""nx3 = 32
x3min""", """nx3 = 16
x3min""").replace("""<parthenon/meshblock>
nx1 = 32
nx2 = 32
nx3 = 32""", """<parthenon/meshblock>
nx1 = 8
nx2 = 8
nx3 = 8""") + """
<parthenon/static_refinement0>
x1min = -0.5
x1max = 0.5
x2min = -0.5
x2max = 0.5
x3min = -0.5
x3max = 0.5
level = 1
""" + PERTURB
    pin_s = ParameterInput.from_string(smr_deck)
    sim_s = SmrSimulation(pin_s, quiet=True)
    sm = sim_s.smesh
    assert set(sim_s.state) == {1}, "expected a fully-refined mesh"
    st = np.asarray(sim_s.state[1])
    gb = sm.base.nghost
    mb = sm.base.mbnx1
    glob_s = np.empty_like(glob_u)
    for li, gid in enumerate(sm.level_ids[1]):
        ox = int(sm.lx1[gid]) * mb
        oy = int(sm.lx2[gid]) * mb
        oz = int(sm.lx3[gid]) * mb
        glob_s[:, oz:oz + mb, oy:oy + mb, ox:ox + mb] = \
            st[li, :, gb:-gb, gb:-gb, gb:-gb]

    for c in (IM1, IM2, IM3, IB1, IB1 + 1, IB3, IEN):
        scale = np.abs(glob_u[c]).max()
        np.testing.assert_allclose(glob_s[c], glob_u[c],
                                   rtol=0, atol=1e-9 * scale,
                                   err_msg=f"component {c}")

    # mixed-level normalization: rms is volume-weighted across levels
    mixed = smr_deck.replace("""<parthenon/static_refinement0>
x1min = -0.5
x1max = 0.5
x2min = -0.5
x2max = 0.5
x3min = -0.5
x3max = 0.5""", """<parthenon/static_refinement0>
x1min = -0.45
x1max = -0.05
x2min = -0.45
x2max = -0.05
x3min = -0.45
x3max = -0.05""")
    pin_m = ParameterInput.from_string(mixed)
    sim_m = SmrSimulation(pin_m, quiet=True)
    assert set(sim_m.state) == {0, 1}
    v2_sum = 0.0
    b2_sum = 0.0
    for lev, u in sim_m.state.items():
        ui = np.asarray(u)[:, :, gb:-gb, gb:-gb, gb:-gb]
        d1, d2, d3 = sim_m.smesh.dx(lev)
        vol = d1 * d2 * d3
        rho = ui[:, 0]
        v2_sum += float((((ui[:, IM1] / rho) ** 2 + (ui[:, IM2] / rho) ** 2
                          + (ui[:, IM3] / rho) ** 2)).sum()) * vol
        b2_sum += float((ui[:, IB1] ** 2 + ui[:, IB1 + 1] ** 2
                         + ui[:, IB3] ** 2).sum()) * vol
    assert abs(np.sqrt(v2_sum) - sigma_v) / sigma_v < 1e-12
    assert abs(np.sqrt(b2_sum) - sigma_b) / sigma_b < 1e-12
