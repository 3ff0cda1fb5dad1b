"""On-device (TPU, f32, production fused path) linear-wave convergence
ladder — VERDICT r4 item 5 / reference CI gate
``tst/regression/test_suites/convergence/convergence.py:162-164``.

The reference gates RMS-L1 <= 1.547584e-08 for VL2+PLM+HLLE at 128-class
resolution in f64.  The TPU production path is f32 (f64 is emulated and
~10x slower): at the reference's amp=1e-6 the f32 ROUNDOFF FLOOR on an
O(1) background is ~6e-8 absolute — the same order as the gate — so the
amp=1e-6 ladder documents where the f32 floor cuts in, and an amp=1e-3
ladder (discretization error >> f32 noise) gates the actual convergence
ORDER of the on-device path.  Results go to docs/tpu_convergence_r5.log
and are summarized in docs/performance.md.

Run ON TPU (one client): timeout 1800 python scripts/tpu_convergence.py
"""

import json
import os
import sys

os.environ.setdefault("ATHENAPK_DISABLE_X64", "1")
os.environ.setdefault("ATHENAPK_PALLAS_SWEEP", "1")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from athenapk_tpu.config.parameter_input import ParameterInput  # noqa: E402
from athenapk_tpu.driver import Simulation  # noqa: E402

DECK = """
<job>
problem_id = linear_wave

<problem/linear_wave>
compute_error = true
wave_flag = 0
amp = {amp}
vflow = 0.0
test = true

<parthenon/mesh>
nghost = 2
nx1 = {n}
x1min = 0.0
x1max = 3.0
nx2 = {n2}
x2min = 0.0
x2max = 1.5
nx3 = {n2}
x3min = 0.0
x3max = 1.5

<parthenon/meshblock>
nx1 = {n}
nx2 = {n2}
nx3 = {n2}

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 1.0
nlim = 100000
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hlle
reconstruction = plm
gamma = 1.666666666666667
precision = single
"""

REFERENCE_GATE_F64_128 = 1.547584e-08   # convergence.py:162-164


def run_one(n, amp):
    pin = ParameterInput.from_string(DECK.format(n=n, n2=n // 2, amp=amp))
    sim = Simulation(pin, quiet=True).run()
    err = float(sim.linear_wave_errors["rms"])
    merged = sim.mesh.nblocks == 1 and sim.mesh.nghost == 0
    print(f"N={n:3d} amp={amp:.0e}: RMS-L1 = {err:.6e} "
          f"(ghost-free merged={merged}, "
          f"device={jax.devices()[0].platform})", flush=True)
    return err


def main():
    out = {"device": jax.devices()[0].platform,
           "path": "production f32 fused (v1 lane-sweep via auto-select)",
           "ladders": {}}
    for amp in (1e-6, 1e-3):
        errs = {n: run_one(n, amp) for n in (16, 32, 64)}
        orders = {f"{a}->{b}":
                  float(__import__("math").log2(errs[a] / errs[b]))
                  for a, b in ((16, 32), (32, 64))}
        out["ladders"][f"amp={amp:.0e}"] = {
            "rms_l1": errs, "orders": orders}
        print(f"  orders: {orders}", flush=True)
    a3 = out["ladders"]["amp=1e-03"]["orders"]
    gate_order = min(a3.values())
    out["gate"] = {
        "criterion": "measured order >= 1.9 on the amp=1e-3 ladder "
                     "(discretization-dominated; f32 floor documented "
                     "by the amp=1e-6 ladder)",
        "measured_min_order": gate_order,
        "pass": gate_order >= 1.9,
        "reference_f64_gate_at_128": REFERENCE_GATE_F64_128,
        "f32_floor_note": "amp=1e-6 errors bottom out near the f32 "
                          "roundoff floor (~6e-8 abs on O(1) fields); "
                          "f64 gates run on CPU (tests/test_convergence)",
    }
    log = "/root/repo/docs/tpu_convergence_r5.log"
    with open(log, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {log}; gate pass={out['gate']['pass']}", flush=True)
    return 0 if out["gate"]["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
