"""Gaussian anisotropic-conduction convergence (reference
``tst/regression/test_suites/aniso_therm_cond_gauss_conv``): a 1e-6
temperature Gaussian diffusing along B at several field orientations
must converge to the analytic heat-kernel solution at second order
(L1 rate <= -1.98 over 128/256/512), for both the unsplit and the RKL2
diffusion integrators; a perpendicular field must yield no diffusion."""

import itertools
import math

import numpy as np
import pytest

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.driver import Simulation

TLIM = 2.0

DECK = """
<job>
problem_id = diffusion

<problem/diffusion>
iprob = 10
Bx = {Bx}
By = {By}

<parthenon/mesh>
nghost = 2
nx1 = {res}
x1min = -6.0
x1max = 6.0
nx2 = 32
x2min = -1.0
x2max = 1.0
nx3 = 1
x3min = -0.5
x3max = 0.5

<parthenon/meshblock>
nx1 = {res}
nx2 = 32
nx3 = 1

<parthenon/time>
integrator = {hyd_int}
cfl = 0.3
tlim = {tlim}
nlim = 1000000
ncycle_out = 0

<hydro>
fluid = glmmhd
riemann = none
eos = adiabatic
reconstruction = dc
gamma = 2.0

<diffusion>
integrator = {int_cfg}
conduction = {conduction}
conduction_coeff = fixed
thermal_diff_coeff_code = 0.25
rkl2_max_dt_ratio = 400.0
"""


def _field(field_cfg):
    return {"none": (0.0, 0.0), "aligned": (1.0, 0.0),
            "angle": (1 / math.sqrt(2), 1 / math.sqrt(2)),
            "perp": (0.0, 1.0)}[field_cfg]


def _run_gauss(res, field_cfg, int_cfg):
    Bx, By = _field(field_cfg)
    deck = DECK.format(
        res=res, Bx=Bx, By=By, tlim=TLIM,
        hyd_int="rk2" if int_cfg == "unsplit" else "rk1",
        int_cfg=int_cfg,
        conduction="isotropic" if field_cfg == "none" else "anisotropic")
    pin = ParameterInput.from_string(deck)
    sim = Simulation(pin, quiet=True).run()
    g = sim.mesh.nghost
    w = np.asarray(sim.prim()[sim.mesh.interior_slices])
    T = w[:, 4]  # gamma = 2, rho = 1 -> p = e = T
    x, _, _ = sim.mesh.cell_centers()
    xg = x[:, g:-g].reshape(-1)  # single meshblock: interior x1 centers
    T_x = T.mean(axis=(0, 1, 2))  # uniform along y (reference samples
    return xg, T_x  # one y-slice; the mean is the same to roundoff)


def _ref_profile(x, field_cfg):
    """Analytic heat kernel at t = t0 + tlim with the effective
    parallel diffusivity (``aniso_therm_cond_gauss_conv.py:127-133``);
    a perpendicular field conducts nothing along x, so its reference
    is the initial (t0 = 0.5) profile."""
    Bx, _ = _field(field_cfg)
    eff = 0.25 if Bx == 0.0 else 0.25 * Bx * Bx
    t = 0.5 + (0.0 if field_cfg == "perp" else TLIM)
    return 1.0 + 1e-6 / math.sqrt(4 * math.pi * eff * t) * np.exp(
        -(x ** 2) / (4.0 * eff * t))


RES_CFGS = [128, 256, 512]


@pytest.mark.slow
@pytest.mark.parametrize("int_cfg", ["unsplit", "rkl2"])
@pytest.mark.parametrize("field_cfg", ["none", "aligned", "angle"])
def test_gauss_conv(field_cfg, int_cfg):
    """Second-order convergence of the diffusing Gaussian
    (rate <= -1.98, ``aniso_therm_cond_gauss_conv.py:183-195``)."""
    errs = []
    for res in RES_CFGS:
        x, T = _run_gauss(res, field_cfg, int_cfg)
        errs.append(np.mean(np.abs(T - _ref_profile(x, field_cfg))))
    rate = np.polyfit(np.log(RES_CFGS), np.log(errs), 1)[0]
    assert rate < -1.98, (
        f"{field_cfg}/{int_cfg} converges at {rate:.2f} (need <= -1.98); "
        f"L1 = {errs}")


@pytest.mark.slow
@pytest.mark.parametrize("int_cfg", ["unsplit", "rkl2"])
def test_gauss_perp_no_diffusion(int_cfg):
    """A field perpendicular to the gradient must not conduct: the
    profile stays at its initial state to truncation level."""
    x, T = _run_gauss(256, "perp", int_cfg)
    err = np.max(np.abs(T - _ref_profile(x, "perp")))
    # initial peak perturbation is 1e-6/sqrt(4*pi*0.25*0.5) ~ 8e-7;
    # require the profile to hold to <1% of that
    assert err < 8e-9, f"perp field diffused: max dev {err:.2e}"
