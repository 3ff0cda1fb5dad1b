"""Viscous + resistive + conductive linear-wave decay vs linear theory
(reference ``tst/regression/test_suites/diffusion_linwave3d``): evolve
the 3D L-slow-mode MHD wave with unsplit isotropic viscosity,
conduction, and Ohmic resistivity, fit the decay rate of max|v2| from
the history output, and gate the relative error against the analytic
slow-mode rate (Ryu et al. eq 3.14 with the conduction term)."""

import os

import numpy as np
import pytest

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.driver import Simulation

_NU = 0.01
_KAPPA = 2.0 * _NU
_ETA = _KAPPA

DECK = """
<job>
problem_id = linear_wave_mhd

<problem/linear_wave>
compute_error = false
dump_max_v2 = true
amp = 1.0e-4
wave_flag = 2
vflow = 0.0

<parthenon/mesh>
nghost = 2
nx1 = {nx1}
x1min = 0.0
x1max = 3.0
nx2 = {nx2}
x2min = 0.0
x2max = 1.5
nx3 = {nx3}
x3min = 0.0
x3max = 1.5

<parthenon/meshblock>
nx1 = {nx1}
nx2 = {nx2}
nx3 = {nx3}

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 3.0
nlim = 100000
ncycle_out = 0

<hydro>
fluid = glmmhd
eos = adiabatic
riemann = hlld
reconstruction = plm
gamma = 1.666666666666667

<diffusion>
integrator = unsplit
conduction = isotropic
conduction_coeff = fixed
thermal_diff_coeff_code = {kappa}
viscosity = isotropic
viscosity_coeff = fixed
mom_diff_coeff_code = {nu}
resistivity = ohmic
resistivity_coeff = fixed
ohm_diff_coeff_code = {eta}

<parthenon/output2>
file_type = hst
dt = 0.03
"""


def _decay_rate(res, tmp_path):
    deck = DECK.format(nx1=2 * res, nx2=res, nx3=res,
                       kappa=_KAPPA, nu=_NU, eta=_ETA)
    pin = ParameterInput.from_string(deck)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        Simulation(pin, quiet=True).run()
        hst = np.genfromtxt("linear_wave_mhd.out2.hst")
    finally:
        os.chdir(cwd)
    tt = hst[:, 0]
    max_vy = hst[:, -1]          # MaxAbsV2 is the appended extra column
    yy = np.log(np.abs(max_vy))
    # weighted least squares as in the reference suite
    w = np.sqrt(max_vy)
    A = np.vander(tt, 2)
    W = np.diag(w)
    coef, *_ = np.linalg.lstsq(W @ A, W @ yy, rcond=None)
    return -coef[0]


@pytest.mark.slow
@pytest.mark.parametrize("res,tol", [(16, 0.22), (32, 0.05)])
def test_linwave3d_decay_rate(res, tol, tmp_path):
    ksqr = (2.0 * np.pi) ** 2
    # Ryu et al. eq 3.14 + conduction term (gamma = 5/3):
    # (4 nu + 3 eta / 4 + 4 kappa / 5) * (2/15) * k^2
    rate = (4.0 * _NU + 3.0 * _ETA / 4.0 + _KAPPA * 4.0 / 5.0) \
        * (2.0 / 15.0) * ksqr
    fit = _decay_rate(res, tmp_path)
    rel = abs(rate / fit - 1.0)
    assert rel < tol, (f"decay rate rel err {rel:.3f} > {tol} "
                       f"(fit {fit:.4e} vs analytic {rate:.4e})")
