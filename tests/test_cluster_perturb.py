"""Cluster initial perturbations (``<problem/cluster/init_perturb>``,
reference ``cluster.cpp:374-458`` infrastructure + ``:658-815``): a
few-modes velocity field normalized to rms sigma_v and a divergence-free
magnetic field B = curl(A) normalized to rms sigma_b."""

import math

import numpy as np

from tests.test_agn_feedback import BASE, _interior_centers
from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.core.indices import (IDN, IM1, IM2, IM3, IEN,
                                       IB1, IB2, IB3)
from athenapk_tpu.driver import Simulation


def test_init_perturb_rms_and_divb():
    sigma_v, sigma_b = 7.5e-2, 2.5e-3
    pin = ParameterInput.from_string(BASE + f"""
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
""")
    sim = Simulation(pin, quiet=True)
    u = np.asarray(sim.cons())
    sl = sim.mesh.interior_slices
    ui = u[sl]
    vol = sim.mesh.cell_volume
    V = 1.0  # unit box

    rho = ui[:, IDN]
    v2 = ((ui[:, IM1] / rho) ** 2 + (ui[:, IM2] / rho) ** 2
          + (ui[:, IM3] / rho) ** 2)
    rms_v = math.sqrt(float(v2.sum()) * vol / V)
    assert abs(rms_v - sigma_v) / sigma_v < 1e-12, \
        f"rms v = {rms_v:.6e} expected {sigma_v:.6e}"

    b2 = ui[:, IB1] ** 2 + ui[:, IB2] ** 2 + ui[:, IB3] ** 2
    rms_b = math.sqrt(float(b2.sum()) * vol / V)
    assert abs(rms_b - sigma_b) / sigma_b < 1e-12, \
        f"rms B = {rms_b:.6e} expected {sigma_b:.6e}"

    # energy accounting: IEN == p/(gm1) + KE + ME with uniform p=1
    gm1 = 5.0 / 3.0 - 1.0
    eint = ui[:, IEN] - 0.5 * rho * v2 - 0.5 * b2
    assert np.abs(eint - 1.0 / gm1).max() < 1e-12

    # curl construction: central-difference divB vanishes to roundoff
    # away from the single-block boundary layer (commuting mixed
    # central differences)
    dx = sim.mesh.dx1
    b1, b2c, b3 = ui[:, IB1], ui[:, IB2], ui[:, IB3]

    def cd(q, ax):
        return (np.roll(q, -1, axis=ax) - np.roll(q, 1, axis=ax)) / (2 * dx)

    # array dims are [nb, z, y, x]: dBx/dx + dBy/dy + dBz/dz
    divb = cd(b1, 3) + cd(b2c, 2) + cd(b3, 1)
    inner = divb[:, 2:-2, 2:-2, 2:-2]
    scale = np.abs(np.stack([b1, b2c, b3])).max() / dx
    assert np.abs(inner).max() / scale < 1e-12, \
        f"divB/scale = {np.abs(inner).max() / scale:.2e}"

    # the fields must actually be nontrivial and 3-D structured
    assert float(np.abs(ui[:, IM3]).max()) > 0
    assert float(np.abs(ui[:, IB3]).max()) > 0
