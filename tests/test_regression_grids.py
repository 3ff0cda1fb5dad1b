"""Reference regression method grids as slow-marked parity suites.

Mirrors the reference CI grids (``tst/regression/CMakeLists.txt``):

* ``riemann_hydro`` — 13 method combos x 3 Toro shock tubes
  (``riemann_hydro.py:22-55``); the reference only plots, we addition-
  ally assert the L2 error against the exact self-similar solution.
* ``convergence`` — 10 method combos x resolutions on the 3D hydro
  linear wave (``convergence.py:34-45``), with the hard gate
  RMS-L1(VL2+PLM+HLLE, res 64) <= 1.547584e-08 (``convergence.py:163``).
* ``mhd_convergence`` — 12 method combos x resolutions on the 3D
  GLM-MHD linear wave (``mhd_convergence.py:34-47``).

Default resolutions are [16, 32] per method (order checks) plus the
hydro gate row at 64; set ``GRID_RES=16,32,64,128`` to run the
reference's full resolution ladder.  Run with ``-m slow``.
"""

import os

import numpy as np
import pytest

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.core.indices import IDN
from athenapk_tpu.driver import Simulation
from athenapk_tpu.utils.exact_riemann import sample

pytestmark = pytest.mark.slow

# ------------------------------------------------------------------ Toro grid
TORO_DECK = """
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
nghost = {nghost}
nx1 = {nx1}
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
integrator = {integrator}
cfl = 0.4
tlim = {t_end}
nlim = 100000
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = {riemann}
reconstruction = {recon}
gamma = 1.4
"""

# the reference's 13 method combos (riemann_hydro.py:22-36)
TORO_METHODS = [
    dict(nx1=1024, integrator="vl2", recon="plm", riemann="hllc"),
    dict(nx1=64, integrator="rk1", recon="dc", riemann="hlle"),
    dict(nx1=64, integrator="rk1", recon="dc", riemann="hllc"),
    dict(nx1=64, integrator="vl2", recon="plm", riemann="hlle"),
    dict(nx1=64, integrator="vl2", recon="plm", riemann="hllc"),
    dict(nx1=64, integrator="rk3", recon="weno3", riemann="hlle"),
    dict(nx1=64, integrator="rk3", recon="weno3", riemann="hllc"),
    dict(nx1=64, integrator="rk3", recon="limo3", riemann="hlle"),
    dict(nx1=64, integrator="rk3", recon="limo3", riemann="hllc"),
    dict(nx1=64, integrator="rk3", recon="ppm", riemann="hlle"),
    dict(nx1=64, integrator="rk3", recon="ppm", riemann="hllc"),
    dict(nx1=64, integrator="rk3", recon="wenoz", riemann="hlle"),
    dict(nx1=64, integrator="rk3", recon="wenoz", riemann="hllc"),
]

# Toro Table 10.1 cases 1, 6, 7 (riemann_hydro.py:40-55)
TORO_CASES = [
    (1.0, 0.75, 1.0, 0.125, 0.0, 0.1, 0.5, 0.2),
    (1.4, 0.0, 1.0, 1.0, 0.0, 1.0, 0.5, 2.0),
    (1.4, 0.1, 1.0, 1.0, 0.1, 1.0, 0.5, 2.0),
]


@pytest.mark.parametrize("mi", range(len(TORO_METHODS)))
@pytest.mark.parametrize("case", range(3))
def test_toro_method_grid(mi, case):
    m = TORO_METHODS[mi]
    rho_l, u_l, p_l, rho_r, u_r, p_r, x0, t_end = TORO_CASES[case]
    nghost = 3 if m["recon"] in ("ppm", "wenoz") else 2
    deck = TORO_DECK.format(nghost=nghost, t_end=t_end, rho_l=rho_l,
                            u_l=u_l, p_l=p_l, rho_r=rho_r, u_r=u_r,
                            p_r=p_r, x0=x0, **m)
    sim = Simulation(ParameterInput.from_string(deck), quiet=True).run()
    g = sim.mesh.nghost
    rho = sim.prim()[:, IDN, 0, 0, g:-g].reshape(-1)
    x, _, _ = sim.mesh.cell_centers()
    xg = x[:, g:-g].reshape(-1)
    order = np.argsort(xg)
    xg, rho = xg[order], rho[order]
    rho_exact, _, _ = sample((xg - x0) / sim.t, rho_l, u_l, p_l,
                             rho_r, u_r, p_r, 1.4)
    err = float(np.sqrt(np.mean((rho - rho_exact) ** 2)))
    # error bands: case 0 is a full shock tube; cases 1/2 are isolated
    # contacts where only contact diffusion contributes (HLLE smears
    # them far more than HLLC — the reference suite's point)
    if case == 0:
        tol = 0.05 if m["nx1"] == 64 else 0.02
    else:
        tol = 0.30 if m["riemann"] == "hlle" else 0.12
    assert err < tol, f"method {mi} case {case}: L2 {err:.3e} >= {tol}"
    if m["riemann"] == "hllc" and case == 1 and m["recon"] != "dc":
        # stationary contact: HLLC keeps it (near-)exact
        assert err < 1e-5, f"stationary contact: {err:.2e}"


# ---------------------------------------------------------- convergence grids
WAVE_DECK = """
<job>
problem_id = {problem_id}

<problem/linear_wave>
compute_error = true
wave_flag = 0
amp = 1.0e-6
vflow = 0.0
test = true

<parthenon/mesh>
nghost = 0
nx1 = {nx1}
x1min = 0.0
x1max = 3.0
nx2 = {nx2}
x2min = 0.0
x2max = 1.5
nx3 = {nx3}
x3min = 0.0
x3max = 1.5

<parthenon/time>
integrator = {integrator}
cfl = 0.3
tlim = 1.0
nlim = 100000
ncycle_out = 0

<hydro>
fluid = {fluid}
eos = adiabatic
riemann = {riemann}
reconstruction = {recon}
gamma = 1.666666666666667
"""

# reference convergence.py:34-45 (hydro, default riemann hlle)
HYDRO_METHODS = [
    ("rk1", "dc", "hlle"),
    ("rk1", "dc", "llf"),
    ("vl2", "plm", "hlle"),
    ("vl2", "weno3", "hlle"),
    ("rk2", "plm", "hlle"),
    ("rk2", "weno3", "hlle"),
    ("rk3", "ppm", "hlle"),
    ("rk3", "weno3", "hlle"),
    ("rk3", "limo3", "hlle"),
    ("rk3", "wenoz", "hlle"),
]

# reference mhd_convergence.py:34-47 (GLM-MHD, default riemann hlle)
MHD_METHODS = [
    ("rk1", "dc", "hlle"),
    ("rk1", "dc", "llf"),
    ("vl2", "plm", "hlle"),
    ("vl2", "weno3", "hlle"),
    ("rk2", "plm", "hlle"),
    ("rk2", "ppm", "hlle"),
    ("rk2", "weno3", "hlle"),
    ("rk2", "limo3", "hlle"),
    ("rk3", "ppm", "hlle"),
    ("rk3", "weno3", "hlle"),
    ("rk3", "limo3", "hlle"),
    ("rk3", "wenoz", "hlle"),
]

GATE = 1.547584e-08  # convergence.py:163


def _grid_res():
    return [int(r) for r in
            os.environ.get("GRID_RES", "16,32").split(",")]


def _run_wave(problem_id, fluid, integrator, recon, riemann, res):
    deck = WAVE_DECK.format(problem_id=problem_id, fluid=fluid,
                            integrator=integrator, recon=recon,
                            riemann=riemann, nx1=2 * res, nx2=res, nx3=res)
    sim = Simulation(ParameterInput.from_string(deck), quiet=True).run()
    return float(sim.linear_wave_errors["rms"])


# minimum measured convergence order between successive resolutions
_MIN_ORDER = {"dc": 0.6, "plm": 1.3, "weno3": 1.6, "limo3": 1.6,
              "ppm": 1.6, "wenoz": 1.6}


@pytest.mark.parametrize("mi", range(len(HYDRO_METHODS)))
def test_convergence_grid_hydro(mi):
    integrator, recon, riemann = HYDRO_METHODS[mi]
    errs = [(_run_wave("linear_wave", "euler", integrator, recon,
                       riemann, r), r) for r in _grid_res()]
    for (e0, r0), (e1, r1) in zip(errs, errs[1:]):
        order = np.log(e0 / e1) / np.log(r1 / r0)
        assert order > _MIN_ORDER[recon], \
            f"{integrator}/{recon}/{riemann}: order {order:.2f} " \
            f"({r0}->{r1}: {e0:.3e}->{e1:.3e})"


def test_convergence_grid_hydro_gate():
    """The reference CI hard gate (convergence.py:162-164).

    The reference parses the value back from linearwave-errors.dat
    (7 significant digits), so compare at the file's print precision —
    our full-precision RMS matches the gate constant to all 7 printed
    digits (NOTES_r2.md precision table)."""
    rms = _run_wave("linear_wave", "euler", "vl2", "plm", "hlle", 64)
    assert float(f"{rms:.6e}") <= GATE, \
        f"RMS-L1 {rms:.6e} > gate {GATE:.6e}"


@pytest.mark.parametrize("mi", range(len(MHD_METHODS)))
def test_convergence_grid_mhd(mi):
    integrator, recon, riemann = MHD_METHODS[mi]
    errs = [(_run_wave("linear_wave_mhd", "glmmhd", integrator, recon,
                       riemann, r), r) for r in _grid_res()]
    for (e0, r0), (e1, r1) in zip(errs, errs[1:]):
        order = np.log(e0 / e1) / np.log(r1 / r0)
        assert order > _MIN_ORDER[recon], \
            f"{integrator}/{recon}/{riemann}: order {order:.2f} " \
            f"({r0}->{r1}: {e0:.3e}->{e1:.3e})"
