"""Split sources on refined meshes (VERDICT r3 item 4) + the Strang
split-source hook: any pgen's problem_source_first_order/strang must run
on SMR/AMR (reference wires them for every mesh,
``hydro_driver.cpp:469,548-561``) — pointwise sources through the
generic per-level adapter (rand_blast), reduction-bearing sources
through their ``*_smr`` hooks (turbulence OU driving)."""

import numpy as np
import pytest

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.core.indices import IDN, IEN, IM1, IM2, IM3
from athenapk_tpu.driver import Simulation, run_from_file

RAND_BLAST_SMR = """
<job>
problem_id = rand_blast

<problem/rand_blast>
rho0 = 1.0
p0 = 0.3
Bx0 = 0.056117

<parthenon/mesh>
refinement = static
numlevel = 2
nghost = 2
nx1 = 16
x1min = -0.1
x1max = 0.1
nx2 = 16
x2min = -0.1
x2max = 0.1
nx3 = 16
x3min = -0.1
x3max = 0.1

<parthenon/static_refinement0>
x1min = -0.1
x1max = 0.1
x2min = 0.0
x2max = 0.1
x3min = 0.0
x3max = 0.1
level = 1

<parthenon/meshblock>
nx1 = 8
nx2 = 8
nx3 = 8

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 0.002
nlim = 40
ncycle_out = 0

<hydro>
fluid = glmmhd
eos = adiabatic
reconstruction = plm
riemann = hlle
gamma = 1.666666666666667
"""


def _totals(sim):
    sm = sim._smesh_now()
    g = sm.base.nghost
    mass = etot = 0.0
    for lev, u in sim.state.items():
        vol = float(np.prod(sm.dx(lev)))
        ui = np.asarray(u)[:, :, g:-g, g:-g, g:-g]
        mass += ui[:, IDN].sum() * vol
        etot += ui[:, IEN].sum() * vol
    return mass, etot


def test_rand_blast_on_smr_injects_energy_conserves_mass(tmp_path,
                                                         monkeypatch):
    """rand_blast has NO *_smr hook: the generic per-level adapter must
    carry its uniform problem_source_first_order onto the refined mesh.
    Blast 1 fires at t = 0.00125 inside the cycle that crosses it;
    energy jumps, mass is untouched (the blast resets pressure only,
    ``rand_blast.cpp`` RandomBlasts)."""
    monkeypatch.chdir(tmp_path)
    from athenapk_tpu.amr.driver import SmrSimulation

    pin = ParameterInput.from_string(RAND_BLAST_SMR)
    sim = SmrSimulation(pin, quiet=True)
    mass0, etot0 = _totals(sim)
    sim.run()
    assert sim.t >= 0.00125, "run must cross the first blast time"
    mass1, etot1 = _totals(sim)
    # periodic box: mass bit-conserved; blast pressure 13649.6 >> p0
    np.testing.assert_allclose(mass1, mass0, rtol=1e-12)
    assert etot1 > etot0 * 1.5, \
        f"no blast energy injected: {etot0:.4e} -> {etot1:.4e}"
    assert all(bool(np.isfinite(np.asarray(u)).all())
               for u in sim.state.values())


TURB_SMR = """
<job>
problem_id = turbulence

<problem/turbulence>
rho0 = 1.0
p0 = 1.0
kpeak = 2.0
corr_time = 1.0
rseed = 20190729
sol_weight = 1.0
accel_rms = 0.5

<modes>
k_1_0 = 2
k_1_1 = 0
k_1_2 = 0
k_2_0 = 0
k_2_1 = 2
k_2_2 = 0
k_3_0 = 0
k_3_1 = 0
k_3_2 = 2

<parthenon/mesh>
refinement = static
numlevel = 2
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

<parthenon/static_refinement0>
x1min = 0.0
x1max = 0.5
x2min = 0.0
x2max = 0.5
x3min = 0.0
x3max = 0.5
level = 1

<parthenon/meshblock>
nx1 = 8
nx2 = 8
nx3 = 8

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 0.1
nlim = 5
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
reconstruction = plm
riemann = hlle
gamma = 1.666666666666667
"""

# the problem/turbulence block carries num_modes in the reference decks
TURB_SMR = TURB_SMR.replace("kpeak = 2.0", "kpeak = 2.0\nnum_modes = 3")


def test_turbulence_ou_driving_on_smr(tmp_path, monkeypatch):
    """OU driving on a static refined mesh through the dedicated
    turbulence *_smr hook: kinetic energy grows, total momentum stays
    ~0 (the density-weighted mean-acceleration subtraction reduces
    ACROSS levels, turbulence.cpp:415-443), mass is conserved."""
    monkeypatch.chdir(tmp_path)
    from athenapk_tpu.amr.driver import SmrSimulation

    pin = ParameterInput.from_string(TURB_SMR)
    sim = SmrSimulation(pin, quiet=True)
    mass0, _ = _totals(sim)
    sim.run()
    mass1, _ = _totals(sim)
    np.testing.assert_allclose(mass1, mass0, rtol=1e-12)

    sm = sim._smesh_now()
    g = sm.base.nghost
    ke = 0.0
    mom = np.zeros(3)
    for lev, u in sim.state.items():
        vol = float(np.prod(sm.dx(lev)))
        ui = np.asarray(u)[:, :, g:-g, g:-g, g:-g]
        ke += (0.5 * (ui[:, IM1] ** 2 + ui[:, IM2] ** 2
                      + ui[:, IM3] ** 2) / ui[:, IDN]).sum() * vol
        mom += np.array([ui[:, IM1].sum(), ui[:, IM2].sum(),
                         ui[:, IM3].sum()]) * vol
    assert ke > 0.0, "driving injected no kinetic energy"
    # the mean-momentum subtraction keeps the global kick at zero
    # (cross-level reduction) and the coarse-fine-corrected fluxes
    # conserve momentum in a periodic box — roundoff only
    assert np.abs(mom).max() < 1e-9, f"net momentum injected: {mom}"


def test_fewmodes_smr_matches_uniform_at_same_resolution():
    """FewModesFTSmr phase correctness: a fully-refined (all level-1)
    mesh must produce the SAME acceleration field as a uniform mesh at
    the fine resolution (identical spectrum, same left-edge phase
    convention)."""
    from athenapk_tpu.core.mesh import Mesh
    from athenapk_tpu.amr.smr import SmrMesh
    from athenapk_tpu.utils.few_modes_ft import FewModesFT, FewModesFTSmr

    k_vec = np.array([[2.0, 0.0, 1.0], [0.0, 2.0, 1.0],
                      [0.0, 0.0, 0.0]])
    kw = dict(k_peak=2.0, sol_weight=1.0, t_corr=1.0, rseed=42)

    uni = Mesh(nx1=16, nx2=16, nx3=16, mbnx1=8, mbnx2=8, mbnx3=8,
               x1min=0.0, x1max=1.0, x2min=0.0, x2max=1.0,
               x3min=0.0, x3max=1.0, nghost=2)
    fm_uni = FewModesFT(uni, 3, k_vec, **kw)
    acc_uni = np.asarray(fm_uni.generate(0.1))  # [3, 8 blocks, 8,8,8]

    base = Mesh(nx1=8, nx2=8, nx3=8, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0.0, x1max=1.0, x2min=0.0, x2max=1.0,
                x3min=0.0, x3max=1.0, nghost=2)
    sm = SmrMesh(base, [(0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 1)])
    assert set(sm.level_ids) == {1} and len(sm.level_ids[1]) == 8
    fm_smr = FewModesFTSmr(sm, 3, k_vec, **kw)
    accs = fm_smr.generate(0.1)
    acc_smr = np.asarray(accs[1])

    # map uniform block order (x fastest) onto the forest's leaf order
    for li in range(8):
        bx, by, bz = (int(sm.lx1[sm.level_ids[1][li]]),
                      int(sm.lx2[sm.level_ids[1][li]]),
                      int(sm.lx3[sm.level_ids[1][li]]))
        bu = bx + 2 * (by + 2 * bz)
        np.testing.assert_allclose(acc_smr[:, li], acc_uni[:, bu],
                                   rtol=1e-12, atol=1e-13)


STRANG_DECK = """
<job>
problem_id = advection

<problem/advection>
vx = 1.0
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
tlim = 1.0
nlim = 3
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hllc
reconstruction = plm
gamma = 1.666666666666667
"""

EDOT = 0.25  # energy injection rate of the dummy Strang source


def _dummy_strang_factory(pin, mesh, cfg, eos):
    """Uniform-signature Strang hook: de/dt = EDOT, applied as dt/2 per
    invocation (the hook receives full dt twice per cycle — the
    reference's AddSplitSourcesStrang contract)."""
    import jax.numpy as jnp

    def src(u, dt, t):
        return u.at[:, IEN].add(jnp.asarray(0.5 * EDOT * dt,
                                            dtype=u.dtype))

    return src


def test_strang_split_source_uniform(monkeypatch, tmp_path):
    """The Strang hook fires twice per cycle at dt/2 each -> exactly
    EDOT * t_total of specific energy added."""
    monkeypatch.chdir(tmp_path)
    from athenapk_tpu.pgen import advection as adv

    monkeypatch.setattr(adv, "problem_source_strang",
                        _dummy_strang_factory, raising=False)
    pin = ParameterInput.from_string(STRANG_DECK)
    sim = Simulation(pin, quiet=True).run()
    u = sim.cons()
    sl = sim.mesh.interior_slices
    e_mean = u[sl][:, IEN].mean()
    # uniform advection: e0 = p0/gm1 + 0.5*rho*vx^2 = 1.5 + 0.5
    e_expected = 1.0 / (5.0 / 3.0 - 1.0) + 0.5 + EDOT * sim.t
    np.testing.assert_allclose(e_mean, e_expected, rtol=1e-10)


def test_strang_split_source_smr(monkeypatch, tmp_path):
    """Same hook on a refined mesh through the generic adapter."""
    monkeypatch.chdir(tmp_path)
    from athenapk_tpu.amr.driver import SmrSimulation
    from athenapk_tpu.pgen import advection as adv

    monkeypatch.setattr(adv, "problem_source_strang",
                        _dummy_strang_factory, raising=False)
    deck = STRANG_DECK.replace(
        "<parthenon/mesh>",
        "<parthenon/mesh>\nrefinement = static\nnumlevel = 2\n") + """
<parthenon/static_refinement0>
x1min = 0.0
x1max = 0.5
x2min = 0.0
x2max = 0.5
x3min = 0.0
x3max = 0.5
level = 1
"""
    pin = ParameterInput.from_string(deck)
    sim = SmrSimulation(pin, quiet=True).run()
    sm = sim._smesh_now()
    g = sm.base.nghost
    e_expected = 1.0 / (5.0 / 3.0 - 1.0) + 0.5 + EDOT * sim.t
    for lev, u in sim.state.items():
        ui = np.asarray(u)[:, :, g:-g, g:-g, g:-g]
        np.testing.assert_allclose(ui[:, IEN].mean(), e_expected,
                                   rtol=1e-10)
