"""Reproduce the 56ms-vs-0.17ms fill discrepancy in one process."""

import os
import sys
import time

os.environ["ATHENAPK_DISABLE_X64"] = "1"

import jax                                                # noqa: E402
import jax.numpy as jnp                                   # noqa: E402
import numpy as np                                        # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from athenapk_tpu.config.parameter_input import ParameterInput  # noqa
from athenapk_tpu.amr.driver import SmrSimulation              # noqa
from athenapk_tpu.amr import SmrMesh, SmrState                 # noqa
from athenapk_tpu.core.mesh import Mesh                        # noqa
from scripts.smr_profile import DECK, N, MB                    # noqa


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


pin = ParameterInput.from_string(DECK)
sim = SmrSimulation(pin, quiet=True)
sim.run()
st = sim._stepper_now()
state = sim.state
print("state dtypes/shapes:",
      {k: (v.dtype, v.shape) for k, v in state.items()}, flush=True)

timeit("sim: st.fill_ghosts (prejitted)", st.fill_ghosts, state)
timeit("sim: jit(state_mgr.fill_ghosts)",
       jax.jit(st.state_mgr.fill_ghosts), state)

base = Mesh(nx1=N, nx2=N, nx3=N, mbnx1=MB, mbnx2=MB, mbnx3=MB,
            x1min=-0.5, x1max=0.5, x2min=-0.5, x2max=0.5,
            x3min=-0.5, x3max=0.5, nghost=2)
sm = SmrMesh(base, [(-0.25, 0.25, -0.25, 0.25, -0.25, 0.25, 1)])
st2 = SmrState(sm, 5)
rng = np.random.default_rng(0)
state2 = {lev: jnp.asarray(
    rng.normal(size=(len(ids), 5) + base.block_shape),
    dtype=jnp.float32) for lev, ids in sm.level_ids.items()}
timeit("fresh: jit(SmrState.fill_ghosts) random state",
       jax.jit(st2.fill_ghosts), state2)
timeit("fresh mgr on sim state", jax.jit(st2.fill_ghosts), state)
timeit("sim mgr on random state",
       jax.jit(st.state_mgr.fill_ghosts), state2)
print("custom_bcs:", st.state_mgr.custom_bcs, flush=True)
b = st.state_mgr.smesh.base
print("BCs:", b.ix1_bc, b.ox1_bc, b.ix2_bc, b.ox2_bc, b.ix3_bc,
      b.ox3_bc, flush=True)
