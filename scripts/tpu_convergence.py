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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
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


def _f64_cpu_ladder(amp):
    """The SAME ladder, f64 on CPU, in a subprocess (this process is
    f32/x64-off for Mosaic) — the apples-to-apples yardstick."""
    import subprocess
    code = (
        "import sys, json, math; sys.path.insert(0, '/root/repo');\n"
        "from athenapk_tpu.config.parameter_input import ParameterInput\n"
        "from athenapk_tpu.driver import Simulation\n"
        f"DECK = {DECK!r}\n"
        "errs = {}\n"
        "for n in (16, 32, 64):\n"
        f"    deck = DECK.format(n=n, n2=n//2, amp={amp!r}).replace("
        "'precision = single', 'precision = double')\n"
        "    sim = Simulation(ParameterInput.from_string(deck),"
        " quiet=True).run()\n"
        "    errs[n] = float(sim.linear_wave_errors['rms'])\n"
        "print('F64JSON ' + json.dumps(errs))\n")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("ATHENAPK_DISABLE_X64", None)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1200)
    for line in r.stdout.splitlines():
        if line.startswith("F64JSON "):
            return {int(k): v for k, v in json.loads(line[8:]).items()}
    raise RuntimeError(f"f64 CPU ladder failed: {r.stderr[-500:]}")


def main():
    import math
    out = {"device": jax.devices()[0].platform,
           "path": "production f32 fused (v1 lane-sweep via auto-select)",
           "ladders": {}}
    for amp in (1e-6, 1e-3):
        errs = {n: run_one(n, amp) for n in (16, 32, 64)}
        orders = {f"{a}->{b}": float(math.log2(errs[a] / errs[b]))
                  for a, b in ((16, 32), (32, 64))}
        out["ladders"][f"amp={amp:.0e}"] = {
            "rms_l1": errs, "orders": orders}
        print(f"  orders: {orders}", flush=True)
    # apples-to-apples gate: the on-device f32 production path must
    # reproduce the f64-CPU errors of the SAME ladder wherever
    # discretization error dominates (amp=1e-3: err >= 5e-5 >> the
    # ~6e-8 f32 floor).  This is strictly stronger than an absolute
    # order gate — it certifies the fused TPU path converges exactly
    # like the gold-standard path does.
    f64 = _f64_cpu_ladder(1e-3)
    f32 = out["ladders"]["amp=1e-03"]["rms_l1"]
    rel = {n: abs(f32[n] / f64[n] - 1.0) for n in f64}
    out["f64_cpu_amp=1e-03"] = {
        "rms_l1": f64,
        "orders": {f"{a}->{b}": float(math.log2(f64[a] / f64[b]))
                   for a, b in ((16, 32), (32, 64))},
        "f32_vs_f64_rel": rel,
    }
    print(f"  f32 vs f64 rel err: {rel}", flush=True)
    out["gate"] = {
        "criterion": "on-device f32 RMS-L1 within 1% of the f64-CPU "
                     "value at every rung of the amp=1e-3 ladder "
                     "(discretization-dominated regime)",
        "max_rel_deviation": max(rel.values()),
        "pass": max(rel.values()) < 1e-2,
        "reference_f64_gate_at_128": REFERENCE_GATE_F64_128,
        "f32_floor_note": "at the reference's amp=1e-6 the f32 path "
                          "hits its roundoff floor (~1.9e-7 at N=64, "
                          "consistent with eps_f32 on O(1) fields); the "
                          "1.547584e-08 f64 gate is enforced on the CPU "
                          "f64 path (tests/test_convergence.py)",
    }
    log = "/root/repo/docs/tpu_convergence_r5.log"
    with open(log, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {log}; gate pass={out['gate']['pass']}", flush=True)
    return 0 if out["gate"]["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
