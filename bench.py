"""Benchmark: zone-cycles/wallsecond on the reference's headline config.

Protocol mirrors the reference performance suite
(``tst/regression/test_suites/performance/performance.py:32-54`` +
``inputs/linear_wave3d.in``): 3D MHD linear wave at 256^3, HLLD + PPM,
10 cycles with the first 2 excluded (``perf_cycle_offset=2``).

Baseline: AthenaPK on 1x A100 sustains order-4e7 zone-cycles/s for
higher-order MHD (SURVEY §6; CI artifacts are ground truth).  vs_baseline
is measured against 4.0e7.

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.
"""

import json
import os
import subprocess
import sys
import time

import jax

# Fused Pallas lane-sweep flux path: default ON for the f32 bench (2.5x
# the XLA flux phase, bitwise-identical output).  Mosaic lowering
# requires x64 globally OFF, so the pallas mode skips the x64 enable
# (the bench computes in f32 regardless); BENCH_PALLAS=0 reverts to the
# pure-XLA path.
_PALLAS = (os.environ.get("BENCH_PALLAS", "1") == "1"
           and os.environ.get("BENCH_DTYPE", "float32") == "float32")
if _PALLAS:
    os.environ["ATHENAPK_PALLAS_SWEEP"] = "1"
    os.environ["ATHENAPK_DISABLE_X64"] = "1"
    os.environ.setdefault("ATHENAPK_PALLAS_TY", "32")
else:
    jax.config.update("jax_enable_x64", True)
# persistent compile cache: remote TPU compiles are slow; repeat runs hit disk
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

A100_BASELINE_ZCPS = 4.0e7

def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_bench(n: int, mb: int, ncycles: int = 10, warmup: int = 2,
              dtype: str = "float64"):
    from athenapk_tpu.config.parameter_input import ParameterInput
    from athenapk_tpu.driver import Simulation

    # Reference protocol: cubic 256^3 mesh (performance.py:33).  The
    # all-periodic linear wave runs in the ghost-free layout (nghost=0,
    # one mesh-spanning block): cyclic rolls ARE the periodic BC, the
    # lane dimension is exactly 256 = 2 tiles with zero padding, and
    # there is no boundary-fill pass.  mb == n selects that layout; any
    # other mb uses the ghosted multi-block layout (nghost=3 for PPM).
    ny = int(os.environ.get("BENCH_NY", str(n)))
    mby = int(os.environ.get("BENCH_MBY", str(mb if mb != n else ny)))
    ghostfree = (mb == n and mby == ny)
    nghost = 0 if ghostfree else 3
    deck = f"""
<job>
problem_id = linear_wave_mhd

<problem/linear_wave>
compute_error = false
wave_flag = 0
amp = 1.0e-6
vflow = 0.0
test = true

<parthenon/mesh>
nghost = {nghost}
nx1 = {n}
x1min = 0.0
x1max = 3.0
nx2 = {ny}
x2min = 0.0
x2max = 1.5
nx3 = {ny}
x3min = 0.0
x3max = 1.5

<parthenon/meshblock>
nx1 = {mb}
nx2 = {mby}
nx3 = {mby}

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 100.0
nlim = {ncycles}
ncycle_out = 0
perf_cycle_offset = {warmup}

<hydro>
fluid = glmmhd
eos = adiabatic
riemann = hlld
reconstruction = ppm
gamma = 1.666666666666667
"""
    import jax.numpy as jnp
    pin = ParameterInput.from_string(deck)
    sim = Simulation(pin, quiet=True)
    if dtype != "float64":
        sim.u = sim.u.astype(jnp.dtype(dtype))
    zones = sim.mesh.nx1 * sim.mesh.nx2 * sim.mesh.nx3
    log(f"bench: {sim.mesh.nx1}x{sim.mesh.nx2}x{sim.mesh.nx3} "
        f"zones={zones} blocks={sim.mesh.nblocks} "
        f"mb=({mb},{mby},{mby}) device={jax.devices()[0].platform}")

    # warm-up cycles individually (compiles both graphs), then the
    # measured cycles as ONE on-device lax.scan call: zero host sync
    dt, dt_hyp = sim._estimate()
    dt = float(dt)
    dt_hyp = float(dt_hyp)
    tlim = 1.0e9
    for cyc in range(warmup):
        c_h = sim.pkg.c_h_from_dt_hyp(dt_hyp)
        sim.u, dts = sim.pkg.step_with_dt(sim.u, dt, c_h, sim.t)
        sim.t += dt
        dt = min(2.0 * dt, float(dts[0]))
        dt_hyp = float(dts[1])
    counted = ncycles - warmup
    # compile the scan outside the timed region (advance_cycles donates
    # its input buffer, so warm up on a copy)
    out = sim.pkg.advance_cycles(jnp.copy(sim.u), sim.t, dt, dt_hyp, tlim,
                                 n_cycles=counted)
    out[0].block_until_ready()
    sim.u.block_until_ready()
    t_start = time.time()
    u_f, t_f, _, _, taken = sim.pkg.advance_cycles(
        sim.u, sim.t, dt, dt_hyp, tlim, n_cycles=counted)
    u_f.block_until_ready()
    wall = time.time() - t_start
    sim.u = u_f
    assert int(taken) == counted
    desc = f"{sim.mesh.nx1}x{sim.mesh.nx2}x{sim.mesh.nx3}"
    if ghostfree:
        desc += " ghost-free"
    if _PALLAS:
        desc += " fused-sweep"
    return zones * counted / wall, wall, counted, desc


def _tpu_alive(timeout=180):
    """Probe the TPU in a subprocess (the axon tunnel can wedge after a
    device fault; a hung client would stall the whole bench)."""
    code = ("import jax, jax.numpy as jnp; "
            "x=(jnp.ones(4)*2).sum(); x.block_until_ready(); print('OKOK')")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True)
        return b"OKOK" in r.stdout
    except Exception:
        return False


def main():
    # Default: the reference performance-suite grid — 256^3, 10 cycles,
    # 2-cycle warm-up (performance.py:32-54) — in the ghost-free layout
    # (single 256^3 block, nghost=0: exact lane alignment, no ghost pass).
    n = int(os.environ.get("BENCH_N", "256"))
    mb = int(os.environ.get("BENCH_MB", str(n)))
    # TPU f64 is emulated via f32-pair rewriting with pathological compile
    # times; the production TPU path runs f32 (correctness gates run f64 on
    # CPU in tests/).  Override with BENCH_DTYPE=float64.
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    device_note = "tpu"
    # tunnel wedges self-heal after minutes; be patient before giving up
    # the real-hardware number (BENCH_TPU_RETRIES x BENCH_TPU_WAIT s)
    alive = _tpu_alive()
    retries = int(os.environ.get("BENCH_TPU_RETRIES", "4"))
    for i in range(retries):
        if alive:
            break
        wait = int(os.environ.get("BENCH_TPU_WAIT", "300"))
        log(f"TPU probe failed (try {i + 1}/{retries}); tunnel may be "
            f"wedged — waiting {wait}s")
        time.sleep(wait)
        alive = _tpu_alive()
    if not alive:
        log("TPU unavailable (tunnel wedged?) — falling back to CPU")
        jax.config.update("jax_platforms", "cpu")
        device_note = "cpu-fallback"
    tries = [(n, mb), (128, 128), (64, 64)]
    value = None
    for nn, mm in tries:
        try:
            zcps, wall, counted, desc = run_bench(nn, mm, dtype=dtype)
            log(f"bench ok: {zcps:.4e} zone-cycles/s "
                f"({counted} cycles in {wall:.2f}s)")
            value = zcps
            break
        except Exception as e:  # noqa: BLE001 — fall back to smaller size
            log(f"bench at {nn} failed: {type(e).__name__}: {e}")
    if value is None:
        print(json.dumps({"metric": "zone-cycles/s (3D MHD HLLD+PPM)",
                          "value": 0.0, "unit": "zone-cycles/s",
                          "vs_baseline": 0.0}))
        return 1
    print(json.dumps({
        "metric": f"zone-cycles/s (3D MHD linear wave, HLLD+PPM+VL2, "
                  f"{dtype}, grid {desc}, {device_note})",
        "value": value,
        "unit": "zone-cycles/s",
        "vs_baseline": value / A100_BASELINE_ZCPS,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
