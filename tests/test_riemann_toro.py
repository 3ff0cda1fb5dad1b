"""The reference riemann_hydro suite's Toro problems (Toro Table 10.1
cases 1, 6, 7): L2 error of rho vs the exact self-similar solution."""

import numpy as np
import pytest

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.core.indices import IDN
from athenapk_tpu.driver import Simulation
from athenapk_tpu.utils.exact_riemann import sample

DECK = """
<job>
problem_id = sod

<problem/sod>
rho_l = {rho_l}
pres_l = {p_l}
u_l = {u_l}
rho_r = {rho_r}
pres_r = {p_r}
u_r = {u_r}
x_discont = {x0}

<parthenon/mesh>
nghost = 2
nx1 = 256
x1min = 0.0
x1max = 1.0
ix1_bc = outflow
ox1_bc = outflow
nx2 = 1
x2min = -0.5
x2max = 0.5
nx3 = 1
x3min = -0.5
x3max = 0.5

<parthenon/time>
integrator = rk2
cfl = 0.4
tlim = {t_end}
nlim = 100000
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = {riemann}
reconstruction = plm
gamma = 1.4
"""

# Toro Table 10.1 cases 1, 6, 7 (as the reference suite)
TORO = [
    # rho_l, u_l, p_l, rho_r, u_r, p_r, x0, t_end
    (1.0, 0.75, 1.0, 0.125, 0.0, 0.1, 0.5, 0.2),
    (1.4, 0.0, 1.0, 1.0, 0.0, 1.0, 0.5, 2.0),
    (1.4, 0.1, 1.0, 1.0, 0.1, 1.0, 0.5, 2.0),
]


@pytest.mark.parametrize("case", range(3))
@pytest.mark.parametrize("riemann", ["hlle", "hllc"])
def test_toro_shock_tube(case, riemann):
    rho_l, u_l, p_l, rho_r, u_r, p_r, x0, t_end = TORO[case]
    deck = DECK.format(rho_l=rho_l, u_l=u_l, p_l=p_l, rho_r=rho_r,
                       u_r=u_r, p_r=p_r, x0=x0, t_end=t_end,
                       riemann=riemann)
    pin = ParameterInput.from_string(deck)
    sim = Simulation(pin, quiet=True).run()
    g = sim.mesh.nghost
    w = sim.prim()
    rho = w[:, IDN, 0, 0, g:-g].reshape(-1)
    x, _, _ = sim.mesh.cell_centers()
    xg = x[:, g:-g].reshape(-1)
    order = np.argsort(xg)
    xg, rho = xg[order], rho[order]
    xi = (xg - x0) / sim.t
    rho_exact, _, _ = sample(xi, rho_l, u_l, p_l, rho_r, u_r, p_r, 1.4)
    err = np.sqrt(np.mean((rho - rho_exact) ** 2))
    # contact cases: only numerical diffusion of the contact contributes;
    # HLLE smears contacts far more than HLLC (that contrast is the point
    # of the reference suite)
    tol = {0: 0.02, 1: 0.12, 2: 0.12}[case]
    if riemann == "hllc" and case > 0:
        tol = 0.06
    assert err < tol, f"Toro case {case} {riemann}: L2 {err:.3e}"
    if riemann == "hllc" and case == 1:
        # HLLC resolves the stationary contact (near-)exactly
        assert err < 1e-6, f"stationary contact not exact: {err:.2e}"
