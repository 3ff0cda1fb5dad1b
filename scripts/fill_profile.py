"""Per-pass / per-axis breakdown of the slab-assembly SMR ghost fill at
the AMR bench geometry, plus XLA cost analysis of the whole fill.

Run ON TPU (one client): timeout 900 python scripts/fill_profile.py
"""

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

from athenapk_tpu.amr import SmrMesh, SmrState            # noqa: E402
from athenapk_tpu.core.mesh import Mesh                   # noqa: E402

N = int(os.environ.get("PROF_N", "128"))
MB = int(os.environ.get("PROF_MB", "32"))


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
    base = Mesh(nx1=N, nx2=N, nx3=N, mbnx1=MB, mbnx2=MB, mbnx3=MB,
                x1min=-0.5, x1max=0.5, x2min=-0.5, x2max=0.5,
                x3min=-0.5, x3max=0.5, nghost=2)
    sm = SmrMesh(base, [(-0.25, 0.25, -0.25, 0.25, -0.25, 0.25, 1)])
    st = SmrState(sm, 5)
    rng = np.random.default_rng(0)
    state = {lev: jnp.asarray(
        rng.normal(size=(len(ids), 5) + base.block_shape),
        dtype=jnp.float32) for lev, ids in sm.level_ids.items()}
    print("leaves:", {k: v.shape[0] for k, v in state.items()}, flush=True)

    fill = jax.jit(st.fill_ghosts)
    t = timeit("full fill", fill, state)
    ca = fill.lower(state).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"cost analysis: {ca.get('bytes accessed', 0)/1e9:.2f} GB "
          f"accessed, {ca.get('flops', 0)/1e9:.2f} GFLOP", flush=True)

    levs = sorted(sm.level_ids)
    act_axes = [ax for ax in (3, 2, 1) if st.act[ax]]

    def pass_a(s):
        out = dict(s)
        for lev in levs[1:]:
            for ax in act_axes:
                out[lev] = st._fill_axis(out, lev, ax, ())
        return out

    def pass_b(s):
        out = dict(s)
        for lev in levs:
            for i, ax in enumerate(act_axes):
                out[lev] = st._fill_axis(out, lev, ax,
                                         tuple(act_axes[:i]))
        return out

    ta = timeit("pass A (interior-transverse, fine levels)",
                jax.jit(pass_a), state)
    tb = timeit("pass B (all levels, expanding extents)",
                jax.jit(pass_b), state)

    # pass B per (lev, axis)
    for lev in levs:
        for i, ax in enumerate(act_axes):
            def one(s, lev=lev, i=i, ax=ax):
                out = dict(s)
                out[lev] = st._fill_axis(out, lev, ax,
                                         tuple(act_axes[:i]))
                return out
            timeit(f"  pass B lev={lev} axis={ax} ext={act_axes[:i]}",
                   jax.jit(one), state)
    print(f"accounting: A={ta:.1f} + B={tb:.1f} vs full={t:.1f}",
          flush=True)


if __name__ == "__main__":
    main()
