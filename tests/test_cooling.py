"""Tabular cooling vs exact ODE integration (reference
``cluster_tabular_cooling`` suite protocol: power-law table, compare the
in-code integrators against the exact cooling solution)."""

import math

import numpy as np
import pytest
from scipy.integrate import solve_ivp

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.core.indices import IDN, IPR
from athenapk_tpu.driver import Simulation

DECK = """
<job>
problem_id = diffusion

<problem/diffusion>
iprob = 30
t0 = 0.5
amp = 0.0

<parthenon/mesh>
nghost = 2
nx1 = 8
x1min = -1.0
x1max = 1.0
nx2 = 1
x2min = -1.0
x2max = 1.0
nx3 = 1
x3min = -1.0
x3max = 1.0

<parthenon/time>
integrator = rk1
cfl = 0.3
tlim = {tlim}
nlim = {nlim}
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = none
reconstruction = dc
gamma = 1.666666666666667
He_mass_fraction = 0.25
max_dt = {max_dt}
calc_dt_hyp = false

<units>
code_length_cgs = 1.0
code_mass_cgs = 1.0
code_time_cgs = 1.0

<cooling>
enable_cooling = tabular
table_filename = {table}
lambda_units_cgs = 1.0
integrator = {integrator}
cfl = -1.0
<diffusion>
integrator = none
viscosity = none
mom_diff_coeff_code = 0.25
"""

GAMMA = 5.0 / 3.0
HE_X = 0.25
MU = 1.0 / (HE_X * 3.0 / 4.0 + (1.0 - HE_X) * 2.0)
MH = 1.007947 * 1.660538921e-24
KB = 1.3806488e-16
MBAR_OVER_KB = MU * MH / KB
RHO = 1.0e-24


def _write_table(path, alpha=0.5, lam0=1e-23, t_ref=1e6):
    logT = np.linspace(4.0, 8.0, 41)
    logL = math.log10(lam0) + alpha * (logT - math.log10(t_ref))
    with open(path, "w") as fh:
        fh.write("# logT logLambda\n")
        for a, b in zip(logT, logL):
            fh.write(f"{a} {b}\n")


def _dedt_ref(e, alpha=0.5, lam0=1e-23, t_ref=1e6):
    T = MBAR_OVER_KB * (GAMMA - 1.0) * e
    lam = lam0 * (T / t_ref) ** alpha
    x_h_over_mh2 = ((1.0 - HE_X) / MH) ** 2
    return -lam * x_h_over_mh2 * RHO


def _setup(tmp_path, integrator, tlim, nlim=1, max_dt=None):
    table = tmp_path / "powerlaw.cool"
    _write_table(str(table))
    deck = DECK.format(tlim=tlim, nlim=nlim, integrator=integrator,
                       table=str(table), max_dt=max_dt or tlim)
    pin = ParameterInput.from_string(deck)
    # set gas state: rho=RHO, T=1e6 via pressure
    pin.set("problem/diffusion", "amp", 0.0)
    sim = Simulation(pin, quiet=True)
    e0 = 1e6 / (MBAR_OVER_KB * (GAMMA - 1.0))  # specific internal energy
    import jax.numpy as jnp
    u = np.array(sim.u)  # writable copy
    u[:, IDN] = RHO
    u[:, 1:4] = 0.0
    u[:, 4] = RHO * e0
    sim.u = jnp.asarray(u)
    return sim, e0


@pytest.mark.parametrize("integrator,tol", [
    ("townsend", 1e-8),   # exact for piecewise power laws
    ("rk45", 1e-6),
    ("rk12", 1e-4),
])
def test_cooling_integrators_match_exact(tmp_path, integrator, tol):
    t_end = 3.0e13  # ~0.3 cooling times
    sim, e0 = _setup(tmp_path, integrator, tlim=t_end)
    sim.run()
    assert sim.ncycle == 1  # single application at full dt
    w = sim.prim()
    sl = sim.mesh.interior_slices
    e_sim = (w[sl][:, IPR] / (RHO * (GAMMA - 1.0))).ravel()

    sol = solve_ivp(lambda t, y: _dedt_ref(y), (0.0, t_end), [e0],
                    rtol=1e-12, atol=1e-6)
    e_exact = sol.y[0, -1]
    rel = abs(e_sim.mean() - e_exact) / e_exact
    assert e_sim.std() < 1e-8 * e0  # uniform box stays uniform
    assert rel < tol, f"{integrator}: rel err {rel:.2e} (cooled to " \
                      f"{e_sim.mean()/e0:.4f} vs exact {e_exact/e0:.4f})"


def test_cooling_timestep_estimate(tmp_path):
    sim, e0 = _setup(tmp_path, "townsend", tlim=1e30, nlim=1, max_dt=1e30)
    sim.pin.set("cooling", "cfl", 0.1)
    # rebuild cooling with positive cfl
    from athenapk_tpu.srcterms.tabular_cooling import TabularCooling
    sim.pkg.cooling.cooling_time_cfl = 0.1
    _, prim = sim.pkg.cons_to_prim(sim.u)
    dt = float(sim.pkg.cooling.estimate_timestep(prim, sim.mesh))
    tcool = e0 / abs(_dedt_ref(e0))
    np.testing.assert_allclose(dt, 0.1 * tcool, rtol=1e-6)


def test_cooling_table_selftest(tmp_path):
    """Deck-triggered table validation (``TestCoolingTable`` analog,
    reference ``tabular_cooling.cpp:666-722``): <cooling>test_filename
    makes the driver dump de/dt over a log-spaced (rho, pres) grid at
    startup; values must match the analytic power law the table encodes
    and scale as rho (de/dt = -Lambda(T) (X/m_h)^2 rho)."""
    table = tmp_path / "powerlaw.cool"
    _write_table(str(table))
    out = tmp_path / "cooling_table_test.dat"
    deck = DECK.format(tlim=1.0, nlim=0, integrator="townsend",
                       table=str(table), max_dt=1.0)
    pin = ParameterInput.from_string(deck)
    pin.set("cooling", "test_filename", str(out))
    pin.set("cooling", "test_rho0", "1.0e-26")
    pin.set("cooling", "test_rho1", "1.0e-22")
    pin.set("cooling", "test_n_rho", "5")
    pin.set("cooling", "test_pres0", "1.0e-14")
    pin.set("cooling", "test_pres1", "1.0e-10")
    pin.set("cooling", "test_n_pres", "9")
    Simulation(pin, quiet=True)

    data = np.genfromtxt(str(out))
    assert data.shape == (45, 4)
    rho, pres, internal_e, de_dt = data.T
    np.testing.assert_allclose(internal_e, pres / (rho * (GAMMA - 1.0)),
                               rtol=1e-10)
    T = MBAR_OVER_KB * (GAMMA - 1.0) * internal_e
    in_table = (T >= 1.0e4) & (T <= 1.0e8)
    assert in_table.sum() >= 20
    expect = _dedt_ref(internal_e) / RHO * rho
    np.testing.assert_allclose(de_dt[in_table], expect[in_table],
                               rtol=1e-6)
    # below-table temperatures cool at zero rate (DeDt contract)
    assert (de_dt[T < 1.0e4] == 0.0).all()
