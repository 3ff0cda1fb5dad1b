"""Diffusion regression tests vs analytic Gaussian solutions.

Mirrors the reference ``diffusion`` suite
(``tst/regression/test_suites/diffusion/diffusion.py``): a Gaussian
profile diffusing under viscosity / resistivity / conduction must match
the analytic self-similar solution; both the unsplit and the RKL2
super-time-stepped integrators are exercised.
"""

import math
import os

import numpy as np
import pytest

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.core.indices import IV2, IB2, IPR, IDN
from athenapk_tpu.driver import Simulation

DECK = """
<job>
problem_id = diffusion

<problem/diffusion>
iprob = {iprob}
t0 = 0.5
amp = 1e-6
Bx = {Bx}
By = 0.0

<parthenon/mesh>
nghost = 2
nx1 = 64
x1min = -1.0
x1max = 1.0
nx2 = 1
x2min = -1.0
x2max = 1.0
nx3 = 1
x3min = -1.0
x3max = 1.0

<parthenon/meshblock>
nx1 = 64

<parthenon/time>
integrator = rk2
cfl = 0.4
tlim = 0.2
nlim = 100000
ncycle_out = 0

<hydro>
fluid = {fluid}
eos = adiabatic
riemann = none
reconstruction = dc
gamma = 2.0

<diffusion>
integrator = {diffint}
conduction = {conduction}
conduction_coeff = fixed
thermal_diff_coeff_code = 0.25
viscosity = {viscosity}
viscosity_coeff = fixed
mom_diff_coeff_code = 0.25
resistivity = {resistivity}
resistivity_coeff = fixed
ohm_diff_coeff_code = 0.25
rkl2_max_dt_ratio = 200.0
"""


def _run(iprob, fluid, conduction="none", viscosity="none",
         resistivity="none", diffint="unsplit", Bx=0.0):
    deck = DECK.format(iprob=iprob, fluid=fluid, conduction=conduction,
                       viscosity=viscosity, resistivity=resistivity,
                       diffint=diffint, Bx=Bx)
    pin = ParameterInput.from_string(deck)
    return Simulation(pin, quiet=True).run()


def _gauss(x, coeff, t0):
    """Initial free-space Gaussian at pseudo-time t0 (matches the pgen IC,
    which does NOT include periodic images)."""
    return 1e-6 / math.sqrt(4 * math.pi * coeff * t0) * np.exp(
        -x ** 2 / (4 * coeff * t0))


def _heat_exact(ic, coeff, t, L=2.0):
    """Exact periodic heat-equation evolution of the sampled IC (spectral).

    The linear-regime diffusion of the truncated Gaussian on a periodic
    domain; exact up to the (2nd-order) spatial discretization error of the
    solver itself."""
    n = ic.size
    k = 2.0 * np.pi * np.fft.rfftfreq(n, d=L / n)
    return np.fft.irfft(np.fft.rfft(ic) * np.exp(-coeff * k ** 2 * t), n=n)


def _profile(sim, comp):
    g = sim.mesh.nghost
    w = sim.prim()
    q = w[:, comp, 0, 0, g:-g].reshape(-1)
    x, _, _ = sim.mesh.cell_centers()
    xg = x[:, g:-g].reshape(-1)
    order = np.argsort(xg)
    return xg[order], q[order]


@pytest.mark.parametrize("diffint", ["unsplit", "rkl2"])
def test_viscous_gaussian(diffint):
    sim = _run(30, "euler", viscosity="isotropic", diffint=diffint)
    x, v2 = _profile(sim, IV2)
    ref = _heat_exact(_gauss(x, 0.25, 0.5), 0.25, sim.t)
    err = np.abs(v2 - ref).mean() / np.abs(ref).max()
    assert err < 5e-3, f"viscous Gaussian rel-L1 {err:.2e}"


def test_resistive_gaussian():
    sim = _run(40, "glmmhd", resistivity="ohmic")
    x, b2 = _profile(sim, IB2)
    ref = _heat_exact(_gauss(x, 0.25, 0.5), 0.25, sim.t)
    err = np.abs(b2 - ref).mean() / np.abs(ref).max()
    assert err < 5e-3, f"resistive Gaussian rel-L1 {err:.2e}"


@pytest.mark.parametrize("diffint", ["unsplit", "rkl2"])
def test_conduction_gaussian_iso(diffint):
    """iprob=10 with Bx=0 -> isotropic conduction of the temperature
    Gaussian; with gamma=2 the effective diffusivity equals chi."""
    sim = _run(10, "glmmhd", conduction="isotropic", diffint=diffint)
    g = sim.mesh.nghost
    w = sim.prim()
    T = (w[:, IPR, 0, 0, g:-g] / w[:, IDN, 0, 0, g:-g]).reshape(-1)
    x, _, _ = sim.mesh.cell_centers()
    xg = x[:, g:-g].reshape(-1)
    order = np.argsort(xg)
    xg, T = xg[order], T[order]
    # T = (gamma-1)*(1 + gaussian); gamma-1 = 1
    ref = 1.0 + _heat_exact(_gauss(xg, 0.25, 0.5), 0.25, sim.t)
    err = np.abs(T - ref).mean() / np.abs(ref - 1.0).max()
    assert err < 5e-3, f"conduction Gaussian rel-L1 {err:.2e}"


def test_conduction_aniso_along_b():
    """iprob=10 with Bx=1: anisotropic conduction along x with
    eff coeff = chi * Bx^2 (saturation negligible at amp=1e-6)."""
    sim = _run(10, "glmmhd", conduction="anisotropic", Bx=1.0)
    g = sim.mesh.nghost
    w = sim.prim()
    T = (w[:, IPR, 0, 0, g:-g] / w[:, IDN, 0, 0, g:-g]).reshape(-1)
    x, _, _ = sim.mesh.cell_centers()
    xg = x[:, g:-g].reshape(-1)
    order = np.argsort(xg)
    xg, T = xg[order], T[order]
    ref_pert = _heat_exact(_gauss(xg, 0.25, 0.5), 0.25, sim.t)
    pert = T - 1.0  # T = eint = 1 + gaussian for gamma=2, rho=1
    err = np.abs(pert - ref_pert).mean() / ref_pert.max()
    assert err < 2e-2, f"aniso conduction rel-L1 {err:.2e}"
