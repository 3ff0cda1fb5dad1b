"""Diagnose why stage(fill(x)) costs ~3x the sum of its parts.

Measures, for each composition, wall time + XLA cost analysis + an HLO
op histogram; also tries an optimization_barrier between fill and stage.

Run ON TPU (one client): timeout 2400 python scripts/fill_compose_diag.py
"""

import os
import sys
import time

os.environ["ATHENAPK_DISABLE_X64"] = "1"

import jax                                                # noqa: E402
import jax.numpy as jnp                                   # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from athenapk_tpu.config.parameter_input import ParameterInput  # noqa
from athenapk_tpu.amr.driver import SmrSimulation              # noqa
from scripts.smr_profile import DECK                           # noqa


def histo(txt):
    import re
    counts = {}
    for m in re.finditer(r"^\s*(?:ROOT )?%?[\w.-]+(?:\.\d+)? = \S+ (\w[\w-]*)\(",
                         txt, re.M):
        op = m.group(1)
        counts[op] = counts.get(op, 0) + 1
    keep = {k: v for k, v in counts.items()
            if k in ("fusion", "dot", "copy", "dynamic-update-slice",
                     "dynamic-slice", "custom-call", "gather", "scatter",
                     "transpose", "convert", "concatenate", "slice",
                     "while", "all-gather", "bitcast")}
    return keep


def bench(label, fn, state, reps=20):
    lowered = jax.jit(fn).lower(state)
    comp = lowered.compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    out = comp(state)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = comp(state)
    jax.block_until_ready(out)
    dtms = (time.time() - t0) / reps * 1e3
    gb = ca.get("bytes accessed", 0) / 1e9
    gf = ca.get("flops", 0) / 1e9
    print(f"{label:<34} {dtms:8.2f} ms  {gb:7.2f} GB  {gf:7.2f} GF  "
          f"{histo(comp.as_text())}", flush=True)
    return dtms


def main():
    pin = ParameterInput.from_string(DECK)
    sim = SmrSimulation(pin, quiet=True)
    sim.run()
    st = sim._stepper_now()
    state = sim.state
    dt = jnp.float32(1e-4)
    c_h = jnp.float32(1.0)
    recon = st.cfg.reconstruction
    need_prim = st._need_prim()
    fill = st.state_mgr.fill_ghosts

    def stage(stt):
        u_news, slabs = {}, {}
        for lev in stt:
            u_new, _, sl = st._fused_stage_faces(recon, lev, need_prim)(
                stt[lev], stt[lev], 0.0, 1.0, dt, c_h)
            u_news[lev] = u_new
            slabs[lev] = sl
        return st._slab_flux_correct(u_news, slabs, scale=dt)

    bench("fill alone", fill, state)
    bench("stage+corr alone", stage, state)
    bench("stage(fill(x))", lambda s: stage(fill(s)), state)
    bench("stage(BARRIER(fill(x)))",
          lambda s: stage(jax.lax.optimization_barrier(fill(s))), state)
    bench("fill(BARRIER(stage(x)))",
          lambda s: fill(jax.lax.optimization_barrier(stage(s))), state)

    def step_bar(s):
        x = stage(jax.lax.optimization_barrier(fill(s)))
        x = stage(jax.lax.optimization_barrier(fill(x)))
        return x
    bench("barrier 2x(fill;stage)", step_bar, state)


if __name__ == "__main__":
    main()
