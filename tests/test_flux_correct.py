"""First-order flux correction keeps a strong blast positive where the
uncorrected higher-order update would need rescue (reference
``first_order_flux_correct`` option)."""

import numpy as np
import pytest

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.core.indices import IDN, IPR
from athenapk_tpu.driver import Simulation

DECK = """
<job>
problem_id = blast

<problem/blast>
radius_outer = 0.1
radius_inner = 0.05
pressure_ratio = 1.0e6
density_ratio = 1.0

<parthenon/mesh>
nghost = 3
nx1 = 64
x1min = -0.5
x1max = 0.5
nx2 = 64
x2min = -0.5
x2max = 0.5
nx3 = 1
x3min = -0.5
x3max = 0.5

<parthenon/meshblock>
nx1 = 64
nx2 = 64

<parthenon/time>
integrator = rk2
cfl = 0.3
tlim = 3.0e-3
nlim = 200
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hllc
reconstruction = ppm
gamma = 1.666666666666667
first_order_flux_correct = true
"""


def test_strong_blast_stays_positive():
    pin = ParameterInput.from_string(DECK)
    sim = Simulation(pin, quiet=True).run()
    w = sim.prim()
    sl = sim.mesh.interior_slices
    assert np.isfinite(w[sl]).all()
    assert w[sl][:, IDN].min() > 0.0
    assert w[sl][:, IPR].min() > 0.0


SMR_DECK = """
<job>
problem_id = blast

<problem/blast>
radius_outer = 0.12
radius_inner = 0.06
pressure_ratio = 1.0e6
density_ratio = 1.0

<parthenon/mesh>
refinement = static
nghost = 3
nx1 = 32
x1min = -0.5
x1max = 0.5
nx2 = 32
x2min = -0.5
x2max = 0.5
nx3 = 32
x3min = -0.5
x3max = 0.5

<parthenon/static_refinement0>
x1min = -0.25
x1max =  0.25
x2min = -0.25
x2max =  0.25
x3min = -0.25
x3max =  0.25
level = 1

<parthenon/meshblock>
nx1 = 8
nx2 = 8
nx3 = 8

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 2.0e-3
nlim = 40
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hllc
reconstruction = ppm
gamma = 1.666666666666667
first_order_flux_correct = true
"""


def test_fofc_mechanism_replaces_exactly_bad_faces():
    """Surgical check of the DC+LLF rescue on the SMR path: tamper one
    face flux so exactly one interior cell would go rho<0, and assert
    the corrected fluxes equal the LLF fluxes on that cell's six faces
    and are bit-identical to the input everywhere else
    (``FirstOrderFluxCorrect`` semantics, ``hydro.cpp:1223-1342``)."""
    import jax.numpy as jnp
    from athenapk_tpu.amr.smr import SmrMesh
    from athenapk_tpu.amr.smr_hydro import SmrHydro, _AXIS_OF_DIR
    from athenapk_tpu.core.mesh import Mesh
    from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons, cons_to_prim
    from athenapk_tpu.riemann import solve_riemann
    from athenapk_tpu.solver.hydro_pkg import (HydroConfig,
                                               first_order_flux_correct)

    base = Mesh(nx1=16, nx2=16, nx3=16, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=-0.5, x1max=0.5, x2min=-0.5, x2max=0.5,
                x3min=-0.5, x3max=0.5, nghost=3)
    sm = SmrMesh(base, [(-0.5, 0.0, -0.5, 0.0, -0.5, 0.0, 1)])
    eos = EOS(gamma=5.0 / 3.0)
    cfg = HydroConfig(fluid="euler", riemann="hllc", reconstruction="ppm",
                      integrator="rk2", cfl=0.3,
                      first_order_flux_correct=True)
    sh = SmrHydro(sm, cfg, eos)

    # smooth state on the fine level
    lev = 1
    nb = len(sm.level_ids[lev])
    w = np.zeros((nb, 5) + base.block_shape)
    w[:, 0] = 1.0
    w[:, 1] = 0.1
    w[:, 4] = 0.5
    state = {l: jnp.asarray(np.asarray(prim_to_cons(
        eos, jnp.asarray(np.full((len(ids), 5) + base.block_shape, 0.0)
                         + w[:len(ids)]), "euler")))
        for l, ids in sm.level_ids.items()}
    state = sh.state_mgr.fill_ghosts(state)
    u = state[lev]
    _, prim = cons_to_prim(eos, u, "euler", 0)
    fluxes = sh._fluxes_level(prim, lev, jnp.asarray(0.0), "ppm")

    # tamper: huge outflow at the right x-face of interior cell (k,j,i)
    g = base.nghost
    k, j, i = g + 4, g + 3, g + 2
    dt = 1.0e-3
    dx = sm.dx(lev)[0]
    big = 2.0 * float(u[0, 0, k, j, i]) * dx / dt    # drains rho past 0
    tampered = dict(fluxes)
    tampered[1] = fluxes[1].at[0, 0, k, j, i + 1].add(big)

    dxmap = {d: sm.dx(lev)[d - 1] for d in (1, 2, 3)}
    fixed = first_order_flux_correct(
        cfg, eos, (1, 2, 3), _AXIS_OF_DIR, dxmap, sh._interior_mask,
        u, u, prim, tampered, 1.0, 0.0, dt, jnp.asarray(0.0))

    llf = {d: solve_riemann("llf", "euler", eos,
                            jnp.roll(prim, 1, axis=_AXIS_OF_DIR[d]),
                            prim, d, c_h=jnp.asarray(0.0), nscalars=0)
           for d in (1, 2, 3)}

    # the bad cell's six faces are now LLF ...
    np.testing.assert_array_equal(np.asarray(fixed[1][0, :, k, j, i]),
                                  np.asarray(llf[1][0, :, k, j, i]))
    np.testing.assert_array_equal(np.asarray(fixed[1][0, :, k, j, i + 1]),
                                  np.asarray(llf[1][0, :, k, j, i + 1]))
    np.testing.assert_array_equal(np.asarray(fixed[2][0, :, k, j, i]),
                                  np.asarray(llf[2][0, :, k, j, i]))
    np.testing.assert_array_equal(np.asarray(fixed[2][0, :, k, j + 1, i]),
                                  np.asarray(llf[2][0, :, k, j + 1, i]))
    np.testing.assert_array_equal(np.asarray(fixed[3][0, :, k, j, i]),
                                  np.asarray(llf[3][0, :, k, j, i]))
    np.testing.assert_array_equal(np.asarray(fixed[3][0, :, k + 1, j, i]),
                                  np.asarray(llf[3][0, :, k + 1, j, i]))
    # ... and every other face is bit-identical to the input
    for d in (1, 2, 3):
        diff = np.asarray(fixed[d] != tampered[d])
        changed = set(map(tuple, np.argwhere(diff[0, 0])))
        allowed = {1: {(k, j, i), (k, j, i + 1)},
                   2: {(k, j, i), (k, j + 1, i)},
                   3: {(k, j, i), (k + 1, j, i)}}[d]
        assert changed <= allowed, (d, changed - allowed)
    # the rescued update stays positive where the tampered one would not
    div_bad = sum((jnp.roll(tampered[d], -1, axis=_AXIS_OF_DIR[d])
                   - tampered[d]) / dxmap[d] for d in (1, 2, 3))
    div_fix = sum((jnp.roll(fixed[d], -1, axis=_AXIS_OF_DIR[d])
                   - fixed[d]) / dxmap[d] for d in (1, 2, 3))
    rho_bad = float((u - dt * div_bad)[0, 0, k, j, i])
    rho_fix = float((u - dt * div_fix)[0, 0, k, j, i])
    assert rho_bad <= 0.0 and rho_fix > 0.0


@pytest.mark.slow
def test_smr_strong_blast_fofc_positive_and_conservative():
    """The near-vacuum blast on a 2-level static mesh needs the DC+LLF
    rescue; the rescue runs BEFORE the coarse-fine restriction
    (reference task order, ``hydro_driver.cpp:517-531``) so total mass
    stays machine-exact."""
    from athenapk_tpu.amr.driver import SmrSimulation

    pin = ParameterInput.from_string(SMR_DECK)
    sim = SmrSimulation(pin, quiet=True)
    m0 = float(sim.total_mass())
    sim.run()
    m1 = float(sim.total_mass())
    g = sim.smesh.base.nghost
    for lev, u in sim.state.items():
        ui = np.asarray(u[:, :, g:-g, g:-g, g:-g])
        assert np.isfinite(ui).all(), f"level {lev} not finite"
        assert ui[:, IDN].min() > 0.0, f"level {lev} rho<=0"
    assert abs(m1 - m0) / abs(m0) < 1e-12
