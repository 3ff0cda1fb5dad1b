"""Reference convergence gate, run at the reference's real resolutions.

The reference CI hard gate (``tst/regression/test_suites/convergence/
convergence.py:162-164``) is: RMS-L1 error of VL2+PLM+HLLE on the 3D hydro
linear wave at linear resolution 64 (grid 128x64x64, row ``data[10,4]``)
must be <= 1.547584e-08.  This script reproduces that protocol for a
method x resolution x dtype matrix and prints a table, so the precision
strategy (f64-on-CPU gates vs f32 production TPU runs) is validated
against the real threshold rather than loosened proxies.

Usage (CPU, f64 + f32):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/convergence_gate.py
Options via env:
    GATE_RES="16,32,64"   resolutions (default)
    GATE_MHD=1            also run the GLM-MHD wave (HLLD+PLM+VL2)
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from athenapk_tpu.config.parameter_input import ParameterInput  # noqa: E402
from athenapk_tpu.driver import Simulation  # noqa: E402

GATE = 1.547584e-08  # convergence.py:163

DECK = """
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


def run_one(problem_id, fluid, riemann, recon, integrator, res, dtype):
    deck = DECK.format(problem_id=problem_id, fluid=fluid, riemann=riemann,
                       recon=recon, integrator=integrator,
                       nx1=2 * res, nx2=res, nx3=res)
    pin = ParameterInput.from_string(deck)
    t0 = time.time()
    sim = Simulation(pin, quiet=True)
    if dtype != "float64":
        sim.u = sim.u.astype(jnp.dtype(dtype))
    sim.run()
    rms = float(sim.linear_wave_errors["rms"])
    return rms, sim.ncycle, time.time() - t0


def main():
    res_list = [int(r) for r in
                os.environ.get("GATE_RES", "16,32,64").split(",")]
    combos = [("linear_wave", "euler", "hlle", "plm", "vl2")]
    if os.environ.get("GATE_MHD"):
        combos.append(("linear_wave_mhd", "glmmhd", "hlld", "plm", "vl2"))
        combos.append(("linear_wave_mhd", "glmmhd", "hlld", "ppm", "vl2"))
    results = []
    print(f"{'method':38s} {'res':>4s} {'dtype':>8s} {'RMS-L1':>12s} "
          f"{'vs gate':>9s} {'cycles':>6s} {'wall':>7s}")
    for (pid, fluid, riemann, recon, integ) in combos:
        for dtype in ("float64", "float32"):
            prev = None
            for res in res_list:
                rms, ncyc, wall = run_one(pid, fluid, riemann, recon, integ,
                                          res, dtype)
                order = (f"o={np.log2(prev / rms):.2f}"
                         if prev else "")
                gate_s = ""
                if res == 64 and pid == "linear_wave":
                    gate_s = "PASS" if rms <= GATE else "FAIL"
                name = f"{fluid}/{riemann}/{recon}/{integ}"
                print(f"{name:38s} {res:4d} {dtype:>8s} {rms:12.4e} "
                      f"{gate_s:>9s} {ncyc:6d} {wall:6.1f}s {order}",
                      flush=True)
                results.append(dict(method=name, res=res, dtype=dtype,
                                    rms=rms, ncycles=ncyc))
                prev = rms
    with open("convergence_gate.json", "w") as f:
        json.dump({"gate": GATE, "results": results}, f, indent=1)
    print("wrote convergence_gate.json")


if __name__ == "__main__":
    main()
