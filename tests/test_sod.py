"""End-to-end 1D Sod shock tube vs the exact Riemann solution.

Mirrors the reference riemann_hydro suite protocol
(``tst/regression/test_suites/riemann_hydro/riemann_hydro.py``): run the
deck, compare rho to the exact self-similar solution in L2.
"""

import numpy as np
import pytest

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.core.indices import IDN, IV1, IPR
from athenapk_tpu.driver import Simulation
from athenapk_tpu.utils.exact_riemann import sample

SOD_DECK = """
<job>
problem_id = sod

<problem/sod>
rho_l = 1.0
pres_l = 1.0
u_l = 0.0
rho_r = 0.125
pres_r = 0.1
u_r = 0.0
x_discont = 0.5

<parthenon/mesh>
nghost = 3
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

<parthenon/meshblock>
nx1 = 64
nx2 = 1
nx3 = 1

<parthenon/time>
integrator = vl2
cfl = 0.4
tlim = 0.25
nlim = 10000
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hlle
reconstruction = plm
gamma = 1.4
"""


def _run_sod(**over):
    overrides = [f"{k}={v}" for k, v in over.items()]
    pin = ParameterInput.from_string(SOD_DECK, overrides=overrides)
    sim = Simulation(pin, quiet=True).run()
    return sim


def _l2_error_rho(sim):
    mesh = sim.mesh
    w = sim.prim()
    # flatten blocks to global x
    g = mesh.nghost
    rho = w[:, IDN, 0, 0, g:-g].reshape(-1)
    x, _, _ = mesh.cell_centers()
    xg = x[:, g:-g].reshape(-1)
    order = np.argsort(xg)
    xg, rho = xg[order], rho[order]
    xi = (xg - 0.5) / sim.t
    rho_exact, _, _ = sample(xi, 1.0, 0.0, 1.0, 0.125, 0.0, 0.1, 1.4)
    return np.sqrt(np.mean((rho - rho_exact) ** 2))


@pytest.mark.parametrize("riemann,recon,integ,tol", [
    ("hlle", "plm", "vl2", 0.012),
    ("hllc", "plm", "rk2", 0.012),
    ("hllc", "ppm", "rk3", 0.012),
    ("llf", "plm", "rk2", 0.02),
    ("hlle", "dc", "rk1", 0.035),
    ("hllc", "weno3", "rk2", 0.012),
    ("hllc", "limo3", "rk2", 0.012),
    ("hllc", "wenoz", "rk3", 0.012),
])
def test_sod_shock_tube(riemann, recon, integ, tol):
    sim = _run_sod(**{"hydro/riemann": riemann,
                      "hydro/reconstruction": recon,
                      "parthenon/time/integrator": integ})
    err = _l2_error_rho(sim)
    assert err < tol, f"L2 rho error {err} exceeds {tol}"


def test_sod_block_invariance():
    """Solution must not depend on the meshblock decomposition
    (the reference tests serial-vs-2-rank equality; here 1 vs 4 blocks)."""
    sim1 = _run_sod(**{"parthenon/meshblock/nx1": 256})
    sim4 = _run_sod(**{"parthenon/meshblock/nx1": 64})
    g = sim1.mesh.nghost
    w1 = sim1.prim()[:, :, 0, 0, g:-g].transpose(1, 0, 2).reshape(5, -1)
    w4 = sim4.prim()[:, :, 0, 0, g:-g].transpose(1, 0, 2).reshape(5, -1)
    np.testing.assert_allclose(w1, w4, rtol=1e-12, atol=1e-13)
