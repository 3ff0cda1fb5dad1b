"""Tracer particle advection correctness (reference particle_advection
suite): uniform flow moves tracers ballistically; periodic wrap exact."""

import numpy as np

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.driver import Simulation

DECK = """
<job>
problem_id = advection

<problem/advection>
vx = 1.0
vy = 0.5
vz = 0.25
rho_ratio = 0.0
rho_radius = 0.0
rho0 = 1.0
p0 = 1.0

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
cfl = 0.4
tlim = 0.0577350269189626
nlim = 1000
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hllc
reconstruction = plm
gamma = 1.666666666666667

<tracers>
enabled = true
initial_seed_method = random_per_block
initial_num_tracers_per_cell = 0.05
initial_rng_seed = 42
"""


def test_tracer_uniform_advection():
    pin = ParameterInput.from_string(DECK)
    sim = Simulation(pin, quiet=True)
    ts0 = {k: np.asarray(v) for k, v in sim.tracer_state.items()}
    sim.run()
    ts = sim.tracer_state
    # advection pgen rescales tlim by diag/|v|; final t known from sim.t
    t = sim.t
    for comp, v in (("x", 1.0), ("y", 0.5), ("z", 0.25)):
        expect = (ts0[comp] + v * t) % 1.0
        got = np.asarray(ts[comp])
        err = np.abs((got - expect + 0.5) % 1.0 - 0.5)
        assert err.max() < 1e-10, f"{comp}: max err {err.max():.2e}"
    # sampled fields present and sane
    np.testing.assert_allclose(np.asarray(ts["rho"]), 1.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ts["vel_x"]), 1.0, rtol=1e-10)
