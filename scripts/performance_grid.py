"""Performance grid runner — replicates the reference performance suite
(``tst/regression/test_suites/performance/performance.py:32-54``): 3D
linear wave over {fluid x reconstruction x integrator x block-size},
parsing ``zone-cycles/wallsecond`` from each run.

Usage:  python scripts/performance_grid.py [--n 244] [--quick]
Writes results to ``performance_grid.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# fused Pallas lane-sweep: auto-selected for f32 TPU runs, which needs
# x64 globally off (Mosaic); GRID_DTYPE=float64 reverts to the f64 XLA
# path, ATHENAPK_PALLAS_SWEEP=0 forces XLA at f32.
_DTYPE = os.environ.get("GRID_DTYPE", "float32")
if _DTYPE == "float32":
    os.environ["ATHENAPK_DISABLE_X64"] = "1"
else:
    jax.config.update("jax_enable_x64", True)
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# the reference grid (hydro + MHD method combos); block sizes adapted to
# lane-aligned widths (padded NX = 128)
HYDRO_COMBOS = [
    ("euler", "rk1", "dc", "hlle"),
    ("euler", "vl2", "plm", "hlle"),
    ("euler", "rk2", "plm", "hlle"),
    ("euler", "rk3", "ppm", "hlle"),
    ("euler", "rk3", "wenoz", "hlle"),
]
MHD_COMBOS = [
    ("glmmhd", "vl2", "plm", "hlle"),
    ("glmmhd", "vl2", "weno3", "hlle"),
    ("glmmhd", "rk2", "weno3", "hlle"),
    ("glmmhd", "rk3", "weno3", "hlle"),
    ("glmmhd", "rk2", "limo3", "hlle"),
    ("glmmhd", "rk3", "wenoz", "hlle"),
    ("glmmhd", "vl2", "ppm", "hlld"),
]


def run_one(fluid, integ, recon, riemann, n, dtype, ncycles=10, warmup=2,
            mb=None, merge="auto"):
    import time

    import jax.numpy as jnp

    from athenapk_tpu.config.parameter_input import ParameterInput
    from athenapk_tpu.driver import Simulation

    # mb == n (default): ghost-free layout (nghost=0, one mesh-spanning
    # block — exact lane alignment, see bench.py).  Smaller mb: the
    # ghosted multi-block layout, matching the reference's meshblock
    # sweep (performance.py:33-40).
    mb = n if mb is None else mb
    nghost = 0 if mb == n else (3 if recon in ("ppm", "wenoz") else 2)
    mb_block = "" if mb == n else f"""
<parthenon/meshblock>
nx1 = {mb}
nx2 = {mb}
nx3 = {mb}
"""
    deck = f"""
<job>
problem_id = linear_wave_mhd

<problem/linear_wave>
compute_error = false
wave_flag = 0
amp = 1.0e-6
test = true

<parthenon/mesh>
nghost = {nghost}
nx1 = {n}
x1min = 0.0
x1max = 3.0
nx2 = {n}
x2min = 0.0
x2max = 1.5
nx3 = {n}
x3min = 0.0
x3max = 1.5
{mb_block}
<parthenon/time>
integrator = {integ}
cfl = 0.3
tlim = 100.0
nlim = {ncycles}
ncycle_out = 0

<hydro>
fluid = {fluid}
eos = adiabatic
riemann = {riemann}
reconstruction = {recon}
gamma = 1.666666666666667
"""
    if fluid == "euler":
        deck = deck.replace("problem_id = linear_wave_mhd",
                            "problem_id = linear_wave")
    pin = ParameterInput.from_string(deck)
    pin.apply_overrides([f"parthenon/mesh/merge_blocks={merge}"])
    sim = Simulation(pin, quiet=True)
    merged = mb != n and sim.mesh.nblocks == 1
    if dtype != "float64":
        sim.u = sim.u.astype(jnp.dtype(dtype))
    zones = sim.mesh.nx1 * sim.mesh.nx2 * sim.mesh.nx3
    dt, dt_hyp = sim._estimate()
    dt = float(dt)
    dt_hyp = float(dt_hyp)
    # warm-up cycles host-stepped, then the timed window runs fully
    # on-device via the lax.scan cycle loop (the bench.py protocol)
    for _ in range(warmup):
        c_h = sim.pkg.c_h_from_dt_hyp(dt_hyp)
        sim.u, dts = sim.pkg.step_with_dt(sim.u, dt, c_h, sim.t)
        sim.t += dt
        dt = min(2.0 * dt, float(dts[0]))
        dt_hyp = float(dts[1])
    counted = ncycles - warmup
    tlim = 1.0e9
    out = sim.pkg.advance_cycles(jnp.copy(sim.u), sim.t, dt, dt_hyp,
                                 tlim, n_cycles=counted)
    out[0].block_until_ready()
    sim.u.block_until_ready()
    t_start = time.time()
    u_f, _, dt_f, _, taken = sim.pkg.advance_cycles(
        sim.u, sim.t, dt, dt_hyp, tlim, n_cycles=counted)
    u_f.block_until_ready()
    wall = time.time() - t_start
    if int(taken) != counted:
        raise RuntimeError(
            f"scan stopped early: taken={int(taken)}/{counted}, "
            f"dt={float(dt_f):.3e}, "
            f"finite={bool(jnp.isfinite(u_f).all())}")
    return zones * counted / wall, merged


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--dtype", default=_DTYPE)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--mb-sweep", action="store_true",
                    help="also sweep meshblock sizes {64,128,256} on the "
                         "headline combo (reference performance.py:33-40)")
    ap.add_argument("--mb-only", action="store_true",
                    help="re-measure ONLY the meshblock-sweep rows, "
                         "merging into the existing performance_grid.json "
                         "(keeps the 12 method rows and the refined rows)")
    args = ap.parse_args()
    if args.mb_only:
        args.mb_sweep = True

    fused = (args.dtype == "float32"
             and os.environ.get("ATHENAPK_PALLAS_SWEEP") != "0"
             and jax.default_backend() == "tpu")
    combos = [] if args.mb_only else [
        (f, i, r, rs, None, "auto") for f, i, r, rs
        in HYDRO_COMBOS + MHD_COMBOS]
    if args.quick:
        combos = combos[1:2] + combos[-1:]
    if args.mb_sweep:
        # production rows (auto-merge: single-chip uniform meshes solve
        # as one mesh-spanning block regardless of meshblock size) PLUS
        # unmerged diagnostic rows that keep the blocked-layout numbers
        # comparable with the reference's per-meshblock sweep
        for mb in (64, 128, 256):
            if mb != args.n:
                combos += [("glmmhd", "vl2", "ppm", "hlld", mb, "auto"),
                           ("glmmhd", "vl2", "ppm", "hlld", mb, "false")]
    results = []
    for fluid, integ, recon, riemann, mb, merge in combos:
        try:
            zcps, merged = run_one(fluid, integ, recon, riemann, args.n,
                                   args.dtype, mb=mb, merge=merge)
            print(f"{fluid:7s} {integ:4s} {recon:6s} {riemann:5s} "
                  f"mb={mb or args.n:4d}"
                  f"{' merged' if merged else '':7s}: "
                  f"{zcps:.4e} zone-cycles/s", flush=True)
            row = dict(fluid=fluid, integrator=integ,
                       reconstruction=recon, riemann=riemann,
                       meshblock=mb or args.n,
                       dtype=args.dtype, fused=fused,
                       zone_cycles_per_s=zcps)
            if mb is not None and mb != args.n:
                row["merged"] = merged
            results.append(row)
        except Exception as e:  # noqa: BLE001
            print(f"{fluid} {integ} {recon} {riemann} mb={mb}: "
                  f"FAILED {e}", flush=True)
    grid = "performance_grid.json"
    if args.mb_only and os.path.exists(grid):
        # merge: keep every existing row this run did not re-measure
        # (rows from before the merged-flag era count as unmerged)
        new_keys = {(r["meshblock"], bool(r.get("merged")))
                    for r in results}
        old = [r for r in json.load(open(grid))
               if r.get("mesh") == "refined"
               or r["meshblock"] == args.n
               or (r["meshblock"], bool(r.get("merged"))) not in new_keys]
        results = old + results
    with open(grid, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
