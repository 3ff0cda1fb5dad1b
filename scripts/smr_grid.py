"""Refined-mesh rows for performance_grid.json (VERDICT r3 item 1).

Sweeps the blast_3d_amr-class SMR bench (bench.run_bench_smr: VL2+PLM+
HLLE hydro, 128^3 base + level-1 center, static two-level topology) over
the reference's AMR meshblock sizes 16/32/64 (matching the sweep in
/root/reference/tst/regression/test_suites/performance/performance.py)
and appends the measured rows to performance_grid.json under
``mesh: "refined"`` (uniform rows carry no ``mesh`` key).

Run ON TPU (one client):  timeout 1800 python scripts/smr_grid.py
"""

import json
import os
import sys

os.environ.setdefault("ATHENAPK_DISABLE_X64", "1")
os.environ.setdefault("ATHENAPK_PALLAS_SWEEP", "1")

import jax                                                # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

import bench                                              # noqa: E402

GRID = "/root/repo/performance_grid.json"

mbs = [int(x) for x in os.environ.get("SMR_GRID_MBS",
                                      "32,64,16").split(",")]
rows = json.load(open(GRID))
# drop ONLY the refined rows being re-measured — a single-mb run must
# not destroy the rest of the sweep (advisor r4 finding 1)
rows = [r for r in rows
        if r.get("mesh") != "refined" or r.get("meshblock") not in mbs]

for mb in mbs:
    # 32 first (bench default — step graph usually in .jax_cache), 16
    # LAST: its 960-leaf composed graph is the slowest remote compile
    # by far, and a wedge there must not cost the other rows.
    zcps, wall, counted, desc = bench.run_bench_smr(n=128, mb=mb)
    print(f"mb={mb}: {zcps:.4e} zc/s ({counted} cycles in {wall:.2f}s)"
          f" [{desc}]", flush=True)
    rows.append({
        "fluid": "euler",
        "integrator": "vl2",
        "reconstruction": "plm",
        "riemann": "hlle",
        "meshblock": mb,
        "dtype": "float32",
        "fused": True,
        "mesh": "refined",
        "geometry": desc,
        "zone_cycles_per_s": zcps,
    })
    with open(GRID, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")      # match performance_grid.py's terminator
    print("grid updated", flush=True)
