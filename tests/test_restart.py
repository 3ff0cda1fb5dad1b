"""Bitwise-identical checkpoint/resume (the reference guarantees bitwise
AMR restarts, CHANGELOG.md:50; here: uniform-mesh + OU forcing state)."""

import os

import numpy as np

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.driver import Simulation, run_from_restart, \
    write_restart_file

DECK = """
<job>
problem_id = turbulence

<problem/turbulence>
rho0 = 1.0
p0 = 1.0
kpeak = 2.0
corr_time = 0.5
rseed = 1234
sol_weight = 1.0
accel_rms = 0.5
num_modes = 2

<modes>
k_1_0 = 2
k_1_1 = 0
k_1_2 = 0
k_2_0 = 1
k_2_1 = 1
k_2_2 = 0

<parthenon/mesh>
nghost = 2
nx1 = 16
x1min = 0.0
x1max = 1.0
nx2 = 16
x2min = 0.0
x2max = 1.0
nx3 = 16
x3min = 0.0
x3max = 1.0

<parthenon/meshblock>
nx1 = 8
nx2 = 8
nx3 = 8

<parthenon/time>
integrator = rk2
cfl = 0.3
tlim = {tlim}
nlim = {nlim}
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hlle
reconstruction = plm
gamma = 1.666666666666667
"""


def test_bitwise_restart(tmp_path):
    os.chdir(tmp_path)
    # full run: 6 cycles straight through
    pin_a = ParameterInput.from_string(DECK.format(tlim=100.0, nlim=6))
    sim_a = Simulation(pin_a, quiet=True).run()

    # split run: 3 cycles, checkpoint, resume 3 more
    pin_b = ParameterInput.from_string(DECK.format(tlim=100.0, nlim=3))
    sim_b = Simulation(pin_b, quiet=True).run()
    ckpt = str(tmp_path / "mid.rhdf")
    write_restart_file(sim_b, ckpt)
    sim_c = run_from_restart(ckpt, overrides=["parthenon/time/nlim=6"],
                             quiet=True)

    assert sim_c.ncycle == 6
    np.testing.assert_array_equal(np.asarray(sim_a.u), np.asarray(sim_c.u))
    assert sim_a.t == sim_c.t


def test_restart_seeds_dt_growth_cap(tmp_path):
    """A resumed run must honor the 2x-growth cap relative to the
    checkpointed dt (advisor finding: restart['dt'] was ignored)."""
    os.chdir(tmp_path)
    pin = ParameterInput.from_string(DECK.format(tlim=100.0, nlim=3))
    sim = Simulation(pin, quiet=True).run()
    sim.tm_dt = 1.0e-6  # pretend the last cycle ran at a tiny dt
    ckpt = str(tmp_path / "cap.rhdf")
    write_restart_file(sim, ckpt)
    sim2 = run_from_restart(
        ckpt, overrides=[f"parthenon/time/nlim={sim.ncycle + 1}"],
        quiet=True)
    assert sim2.ncycle == sim.ncycle + 1
    assert sim2.tm_dt <= 2.0e-6 * (1 + 1e-12)
