"""Bisect the stage+fill interaction cost inside the jitted SMR step.

Run ON TPU (one client): timeout 1500 python scripts/fill_chain_profile.py
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


def timeit(label, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dtms = (time.time() - t0) / reps * 1e3
    print(f"{label:<52} {dtms:8.2f} ms", flush=True)
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

    timeit("fill alone", jax.jit(fill), state)
    timeit("stage+corr alone", jax.jit(stage), state)
    timeit("fill(fill(x))", jax.jit(lambda s: fill(fill(s))), state)
    timeit("stage(fill(x))", jax.jit(lambda s: stage(fill(s))), state)
    timeit("fill(stage(x))", jax.jit(lambda s: fill(stage(s))), state)
    timeit("fill(stage(fill(stage(x))))",
           jax.jit(lambda s: fill(stage(fill(stage(s))))), state)
    timeit("full step", jax.jit(st._step), state, dt, c_h)


if __name__ == "__main__":
    main()
