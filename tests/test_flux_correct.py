"""First-order flux correction keeps a strong blast positive where the
uncorrected higher-order update would need rescue (reference
``first_order_flux_correct`` option)."""

import numpy as np

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.core.indices import IDN, IPR
from athenapk_tpu.driver import Simulation

DECK = """
<job>
problem_id = blast

<problem/blast>
radius_outer = 0.1
radius_inner = 0.05
pressure_ratio = 1.0e6
density_ratio = 1.0

<parthenon/mesh>
nghost = 3
nx1 = 64
x1min = -0.5
x1max = 0.5
nx2 = 64
x2min = -0.5
x2max = 0.5
nx3 = 1
x3min = -0.5
x3max = 0.5

<parthenon/meshblock>
nx1 = 64
nx2 = 64

<parthenon/time>
integrator = rk2
cfl = 0.3
tlim = 3.0e-3
nlim = 200
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hllc
reconstruction = ppm
gamma = 1.666666666666667
first_order_flux_correct = true
"""


def test_strong_blast_stays_positive():
    pin = ParameterInput.from_string(DECK)
    sim = Simulation(pin, quiet=True).run()
    w = sim.prim()
    sl = sim.mesh.interior_slices
    assert np.isfinite(w[sl]).all()
    assert w[sl][:, IDN].min() > 0.0
    assert w[sl][:, IPR].min() > 0.0
