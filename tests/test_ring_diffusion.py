"""Sharma & Hammett anisotropic-conduction ring tests (reference
``tst/regression/test_suites/aniso_therm_cond_ring_conv`` and
``_multid``): heat pulse on a circular field, limited (lim4) transverse
fluxes must keep T >= background, errors vs the pure-diffusion end
state must converge, and the three plane orientations (iprob 20/21/22)
must be exactly symmetric."""

import numpy as np
import pytest

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.driver import Simulation

DECK = """
<job>
problem_id = diffusion

<problem/diffusion>
iprob = {iprob}

<parthenon/mesh>
nghost = 2
nx1 = {nx1}
x1min = -1.0
x1max = 1.0
nx2 = {nx2}
x2min = -1.0
x2max = 1.0
nx3 = {nx3}
x3min = -1.0
x3max = 1.0

<parthenon/meshblock>
nx1 = {mb1}
nx2 = {mb2}
nx3 = {mb3}

<parthenon/time>
integrator = rk1
cfl = 0.3
tlim = 200.0
nlim = 1000000
ncycle_out = 0

<hydro>
fluid = glmmhd
riemann = none
eos = adiabatic
reconstruction = dc
gamma = 2.0

<diffusion>
integrator = {integrator}
conduction = anisotropic
conduction_coeff = fixed
thermal_diff_coeff_code = 0.01
rkl2_max_dt_ratio = 100.0
"""


def _run_ring(iprob, res, integrator, thin=8):
    if iprob == 20:
        dims = (res, res, 1) if thin is None else (res, res, thin)
    elif iprob == 21:
        dims = (thin, res, res)
    else:
        dims = (res, thin, res)
    mb = dims
    deck = DECK.format(iprob=iprob, nx1=dims[0], nx2=dims[1], nx3=dims[2],
                       mb1=mb[0], mb2=mb[1], mb3=mb[2],
                       integrator=integrator)
    pin = ParameterInput.from_string(deck)
    sim = Simulation(pin, quiet=True).run()
    w = np.asarray(sim.prim()[sim.mesh.interior_slices])
    T = w[:, 4].ravel()  # gamma = 2, rho = 1 -> p = e = T
    x, y, z = sim.mesh.cell_centers_mesh()
    ks, ke, js, je, is_, ie = sim.mesh.interior
    xyz = np.broadcast_arrays(x, y, z)
    x, y, z = (q[:, ks:ke + 1, js:je + 1, is_:ie + 1] for q in xyz)
    ab = {20: (x, y), 21: (y, z), 22: (z, x)}[iprob]
    r = np.sqrt(ab[0] ** 2 + ab[1] ** 2).ravel()
    T_ref = np.where(np.abs(r - 0.6) < 0.1, 10.1667, 10.0)
    L1 = np.mean(np.abs(T - T_ref))
    L2 = np.sqrt(np.mean((T - T_ref) ** 2))
    return T, L1, L2


@pytest.mark.slow
def test_ring_convergence_rkl2():
    """L1/L2 errors vs the pure-diffusion end state converge with
    resolution — the reference gates verbatim (L1 rate <= -0.53,
    L2 rate <= -0.35, L2@256 <= 0.0264 over 32..256,
    ``aniso_therm_cond_ring_conv.py:104-125``) — and limiting keeps
    T >= background (min T < 10 fails)."""
    res_cfgs = [32, 64, 128, 256]
    errs = []
    for res in res_cfgs:
        T, L1, L2 = _run_ring(20, res, "rkl2", thin=None)
        assert T.min() >= 10.0 - 1e-10, \
            f"res {res}: T dips below background ({T.min():.6f})"
        errs.append([L1, L2])
    errs = np.array(errs)
    l1_rate = np.polyfit(np.log(res_cfgs), np.log(errs[:, 0]), 1)[0]
    l2_rate = np.polyfit(np.log(res_cfgs), np.log(errs[:, 1]), 1)[0]
    assert l1_rate < -0.53, f"L1 not converging: rate {l1_rate:.2f}"
    assert l2_rate < -0.35, f"L2 not converging: rate {l2_rate:.2f}"
    assert errs[-1, 1] < 0.0264, f"L2@256 too large: {errs[-1, 1]:.4f}"


@pytest.mark.slow
def test_ring_multid_orientations():
    """2D vs thin-3D agreement (4 decimals) and exact symmetry of the
    three 3D plane orientations (14 decimals)
    (``aniso_therm_cond_ring_multid.py:143-154``)."""
    res = 32
    _, l1_2d, l2_2d = _run_ring(20, res, "unsplit", thin=None)
    errs3d = [(_run_ring(ip, res, "unsplit")[1:]) for ip in (20, 21, 22)]
    np.testing.assert_almost_equal(l1_2d, errs3d[0][0], 4,
                                   "L1 2D vs 3D too different")
    np.testing.assert_almost_equal(l2_2d, errs3d[0][1], 4,
                                   "L2 2D vs 3D too different")
    np.testing.assert_almost_equal(np.array(errs3d[0]),
                                   np.array(errs3d[1]), 14,
                                   "iprob 20 vs 21 orientation asymmetry")
    np.testing.assert_almost_equal(np.array(errs3d[1]),
                                   np.array(errs3d[2]), 14,
                                   "iprob 21 vs 22 orientation asymmetry")
