"""Phase breakdown of the refined-mesh (SMR) step at the bench geometry.

Times, each as a separately-jitted call with block_until_ready:
  - full step            (the production dispatch)
  - fill_ghosts only
  - per-level stage+faces kernels only (no correction, no fill)
  - slab flux correction only
  - estimate_dt

Run ON TPU (one client):  timeout 900 python scripts/smr_profile.py
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

from athenapk_tpu.config.parameter_input import ParameterInput  # noqa: E402
from athenapk_tpu.amr.driver import SmrSimulation              # noqa: E402

N = int(os.environ.get("PROF_N", "128"))
MB = int(os.environ.get("PROF_MB", "32"))

DECK = f"""
<job>
problem_id = blast

<parthenon/mesh>
refinement = static
numlevel = 2
nghost = 2
nx1 = {N}
x1min = -0.5
x1max = 0.5
nx2 = {N}
x2min = -0.5
x2max = 0.5
nx3 = {N}
x3min = -0.5
x3max = 0.5

<parthenon/static_refinement0>
x1min = -0.25
x1max = 0.25
x2min = -0.25
x2max = 0.25
x3min = -0.25
x3max = 0.25
level = 1

<parthenon/meshblock>
nx1 = {MB}
nx2 = {MB}
nx3 = {MB}

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 100.0
nlim = 2
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hlle
reconstruction = plm
gamma = 1.666666666666667
precision = single

<problem/blast>
pressure_ambient = 0.001
pressure_ratio = 1.6e4
radius_outer = 0.12
density_ambient = 1.0
density_ratio = 1.0
"""


def timeit(label, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dtms = (time.time() - t0) / reps * 1e3
    print(f"{label:<46} {dtms:8.2f} ms", flush=True)
    return dtms


def main():
    pin = ParameterInput.from_string(DECK)
    sim = SmrSimulation(pin, quiet=True)
    sim.run()                                   # warm-up: 2 cycles
    st = sim._stepper_now()
    state = sim.state
    nlv = {k: v.shape[0] for k, v in state.items()}
    zones = sum(v.shape[0] for v in state.values()) * MB ** 3
    print(f"geometry: {N}^3 base, mb={MB}^3, leaves={nlv}, "
          f"zones/cycle={zones}", flush=True)

    dt = jnp.float32(1e-4)
    c_h = jnp.float32(1.0)

    mode = ("split" if os.environ.get("ATHENAPK_SMR_STEP") == "split"
            else "composed")
    t_step = timeit(f"step production dispatch ({mode})",
                    st.step, state, dt, c_h)

    fill = jax.jit(st.state_mgr.fill_ghosts)
    t_fill = timeit("fill_ghosts (one pass)", fill, state)

    recon = st.cfg.reconstruction
    need_prim = st._need_prim()

    def stages_only(stt):
        outs = {}
        for lev in stt:
            u_new, _, sl = st._fused_stage_faces(recon, lev, need_prim)(
                stt[lev], stt[lev], 0.0, 1.0, dt, c_h)
            outs[lev] = (u_new, sl)
        return outs

    stage_j = jax.jit(stages_only)
    t_stage = timeit("per-level stage+faces kernels (one stage)",
                     stage_j, state)

    def corr_only(stt):
        outs = stages_only(stt)
        u_news = {lev: o[0] for lev, o in outs.items()}
        slabs = {lev: o[1] for lev, o in outs.items()}
        return st._slab_flux_correct(u_news, slabs, scale=dt)

    corr_j = jax.jit(corr_only)
    t_corr = timeit("stage + slab flux correction", corr_j, state)

    t_dt = timeit("estimate_dt", jax.jit(st._estimate_dt_impl), state)

    # DC first stage (vl2 stage 1 uses dc recon)
    def stage_dc(stt):
        outs = {}
        for lev in stt:
            u_new, _, sl = st._fused_stage_faces("dc", lev, need_prim)(
                stt[lev], stt[lev], 0.0, 1.0, dt, c_h)
            outs[lev] = (u_new, sl)
        return outs

    t_dc = timeit("per-level stage+faces kernels (dc stage)",
                  jax.jit(stage_dc), state)

    print(f"\naccounting: step={t_step:.1f}ms vs "
          f"dc_stage({t_dc:.1f}) + plm_stage({t_stage:.1f}) + "
          f"2*corr_delta({t_corr - t_stage:.1f}) + 2*fill({t_fill:.1f}) "
          f"= {t_dc + t_stage + 2 * (t_corr - t_stage) + 2 * t_fill:.1f}ms; "
          f"dt adds {t_dt:.1f}ms/cycle", flush=True)
    print(f"implied zc/s at (step+dt): "
          f"{zones / ((t_step + t_dt) / 1e3):.3e}", flush=True)


if __name__ == "__main__":
    main()
