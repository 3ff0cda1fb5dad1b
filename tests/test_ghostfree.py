"""Ghost-free periodic fast path (nghost=0, single mesh-spanning block).

For an all-periodic uniform mesh the cyclic ``jnp.roll`` shifts used by
every stencil ARE the periodic boundary condition, so the ghost zones and
the boundary-fill pass can be dropped entirely.  The interior physics must
be bitwise identical to the ghosted single-block path: ghosts there hold
exact copies of the wrapped interior values, so every stencil sees the
same inputs.  (This is the TPU-native bench configuration: at 256^3 the
lane dimension is exactly 2 tiles wide with zero padding.)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.driver import Simulation

DECK = """
<job>
problem_id = linear_wave_mhd

<problem/linear_wave>
compute_error = false
wave_flag = 0
amp = 1.0e-3
vflow = 0.5
test = true

<parthenon/mesh>
nghost = {nghost}
nx1 = 16
x1min = 0.0
x1max = 3.0
nx2 = 8
x2min = 0.0
x2max = 1.5
nx3 = 8
x3min = 0.0
x3max = 1.5

<parthenon/meshblock>
nx1 = 16
nx2 = 8
nx3 = 8

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 0.1
nlim = 5
ncycle_out = 0

<hydro>
fluid = glmmhd
eos = adiabatic
riemann = hlld
reconstruction = {recon}
gamma = 1.666666666666667
"""


def _final_interior(nghost, recon):
    pin = ParameterInput.from_string(DECK.format(nghost=nghost, recon=recon))
    sim = Simulation(pin, quiet=True).run()
    u = np.asarray(sim.u)
    g = nghost
    if g == 0:
        return u[0]
    return u[0, :, g:-g, g:-g, g:-g]


@pytest.mark.parametrize("recon,g", [("plm", 2), ("ppm", 3)])
def test_ghostfree_matches_ghosted(recon, g):
    a = _final_interior(0, recon)
    b = _final_interior(g, recon)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)


def test_ghostfree_rejects_nonperiodic():
    from athenapk_tpu.core.mesh import Mesh
    with pytest.raises(ValueError, match="periodic"):
        Mesh(nx1=16, nx2=16, nx3=16, mbnx1=16, mbnx2=16, mbnx3=16,
             x1min=0.0, x1max=1.0, x2min=0.0, x2max=1.0,
             x3min=0.0, x3max=1.0, nghost=0, ix1_bc="outflow",
             ox1_bc="outflow")


def test_ghostfree_rejects_multiblock():
    from athenapk_tpu.core.mesh import Mesh
    with pytest.raises(ValueError, match="single"):
        Mesh(nx1=16, nx2=16, nx3=16, mbnx1=8, mbnx2=16, mbnx3=16,
             x1min=0.0, x1max=1.0, x2min=0.0, x2max=1.0,
             x3min=0.0, x3max=1.0, nghost=0)
