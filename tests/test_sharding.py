"""Multi-device correctness on the 8-device virtual CPU mesh: the explicit
shard_map halo path and the GSPMD path must both reproduce the
single-device step bitwise (the reference's serial-vs-2-rank CI check)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from athenapk_tpu.core.mesh import Mesh
from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons
from athenapk_tpu.solver.hydro_pkg import HydroConfig, HydroPackage


def _setup(**mesh_kw):
    kw = dict(nx1=16, nx2=16, nx3=32, mbnx1=8, mbnx2=8, mbnx3=4,
              x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
              nghost=2)
    kw.update(mesh_kw)
    mesh = Mesh(**kw)
    cfg = HydroConfig(fluid="glmmhd", riemann="hlld", reconstruction="plm",
                      integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(mesh, cfg, eos)
    rng = np.random.default_rng(3)
    w = np.ones((mesh.nblocks, 9) + mesh.block_shape)
    w[:, 0] = 1.0 + 0.1 * rng.random(w[:, 0].shape)
    w[:, 1:4] = 0.1 * rng.standard_normal(w[:, 1:4].shape)
    w[:, 4] = 0.5 + 0.1 * rng.random(w[:, 4].shape)
    w[:, 5:8] = 0.2 * rng.standard_normal(w[:, 5:8].shape)
    u = jnp.asarray(np.asarray(prim_to_cons(eos, w, "glmmhd")))
    u = pkg.apply_boundaries(u)
    return mesh, cfg, eos, pkg, u


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_shard_map_step_matches_single_device():
    from athenapk_tpu.parallel.halo import make_sharded_step
    from athenapk_tpu.parallel.mesh_sharding import (make_device_mesh,
                                                     shard_state)

    mesh, cfg, eos, pkg, u = _setup()
    dt = jnp.asarray(1e-3)
    c_h = jnp.asarray(1.0)
    ref = np.asarray(pkg.step(u, dt, c_h))

    dmesh = make_device_mesh(jax.devices()[:8])
    u_sh = shard_state(u, mesh, dmesh)
    step_fn, dt_fn = make_sharded_step(pkg, dmesh)
    got = np.asarray(step_fn(u_sh, dt, c_h))
    # partitioned programs fuse in a different order: one-ULP tolerance
    np.testing.assert_allclose(ref, got, rtol=1e-14, atol=1e-14)

    # the pmin-reduced dt matches the single-device reduction
    dts = dt_fn(u_sh)
    _, prim = pkg.cons_to_prim(u)
    dts_ref = pkg.estimate_timestep(prim)
    np.testing.assert_allclose(float(dts[0]), float(dts_ref[0]), rtol=1e-15)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gspmd_step_matches_single_device():
    from athenapk_tpu.parallel.mesh_sharding import (
        make_block_sharding, make_device_mesh, replicated, shard_state)

    mesh, cfg, eos, pkg, u = _setup()
    dt = jnp.asarray(1e-3)
    c_h = jnp.asarray(1.0)
    ref = np.asarray(pkg.step(u, dt, c_h))

    dmesh = make_device_mesh(jax.devices()[:8])
    u_sh = shard_state(u, mesh, dmesh)
    bsh = make_block_sharding(dmesh)
    rep = replicated(dmesh)
    step = jax.jit(pkg._step, in_shardings=(bsh, rep, rep),
                   out_shardings=bsh)
    got = np.asarray(step(u_sh, dt, c_h))
    np.testing.assert_allclose(ref, got, rtol=1e-13, atol=1e-13)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_shard_map_step_nonperiodic_z():
    """Physical BCs on the SHARDED axis: outflow-z is applied only on the
    edge devices (the reference applies physical BCs only on blocks that
    touch the domain boundary)."""
    from athenapk_tpu.parallel.halo import make_sharded_step
    from athenapk_tpu.parallel.mesh_sharding import (make_device_mesh,
                                                     shard_state)

    mesh, cfg, eos, pkg, u = _setup(ix3_bc="outflow", ox3_bc="outflow")
    dt = jnp.asarray(1e-3)
    c_h = jnp.asarray(1.0)
    ref = np.asarray(pkg.step(u, dt, c_h))

    dmesh = make_device_mesh(jax.devices()[:8])
    u_sh = shard_state(u, mesh, dmesh)
    step_fn, _ = make_sharded_step(pkg, dmesh)
    got = np.asarray(step_fn(u_sh, dt, c_h))
    np.testing.assert_allclose(ref, got, rtol=1e-14, atol=1e-14)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("bcs", [
    {},                                          # fully periodic
    {"ix2_bc": "outflow", "ox2_bc": "outflow",   # physical BCs on BOTH
     "ix3_bc": "outflow", "ox3_bc": "outflow"},  # sharded axes
])
def test_shard_map_step_2d_mesh(bcs):
    """2-D (z, y) device-mesh decomposition (pod layout): ppermute halos
    along both sharded block-grid axes; matches single-device bitwise."""
    from athenapk_tpu.parallel.halo import (from_grid, grid_sharding,
                                            make_device_mesh_2d,
                                            make_sharded_step_grid, to_grid)

    mesh, cfg, eos, pkg, u = _setup(**bcs)
    dt = jnp.asarray(1e-3)
    c_h = jnp.asarray(1.0)
    ref = np.asarray(pkg.step(u, dt, c_h))

    dmesh = make_device_mesh_2d(jax.devices(), (4, 2))
    ug = jax.device_put(to_grid(u, mesh), grid_sharding(dmesh))
    step_fn, dt_fn = make_sharded_step_grid(pkg, dmesh)
    got = np.asarray(from_grid(step_fn(ug, dt, c_h), mesh))
    np.testing.assert_allclose(ref, got, rtol=1e-14, atol=1e-14)

    dts = dt_fn(ug)
    _, prim = pkg.cons_to_prim(u)
    dts_ref = pkg.estimate_timestep(prim)
    np.testing.assert_allclose(float(dts[0]), float(dts_ref[0]), rtol=1e-15)


def test_sharded_smr_step():
    """Refined-mesh stepping under GSPMD: the per-level block axis is
    sharded over the device mesh; ghost-fill and flux-correction
    gathers lower to collectives (SURVEY §2c ghost exchange row:
    'coarse-fine = gather+prolong' under sharding).  Result must match
    the single-device step bitwise."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import (Mesh as JMesh, NamedSharding,
                              PartitionSpec as P)
    from athenapk_tpu.amr import SmrMesh
    from athenapk_tpu.amr.smr_hydro import SmrHydro
    from athenapk_tpu.core.mesh import Mesh
    from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons
    from athenapk_tpu.solver.hydro_pkg import HydroConfig

    base = Mesh(nx1=32, nx2=32, nx3=32, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=3)
    sm = SmrMesh(base, [(0.4, 0.6, 0.4, 0.6, 0.4, 0.6, 1)])
    # both levels' block counts (56, 64) divide the 8-device mesh
    cfg = HydroConfig(fluid="euler", riemann="hllc",
                      reconstruction="plm", integrator="rk2")
    eos = EOS(gamma=5.0 / 3.0)
    sh = SmrHydro(sm, cfg, eos)
    state = {}
    for lev, ids in sm.level_ids.items():
        w = np.zeros((len(ids), 5) + base.block_shape)
        for li, gid in enumerate(ids):
            x, y, z = sm.cell_centers_leaf(gid)
            r2 = (x - 0.3) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
            w[li, 0] = 1.0 + np.broadcast_to(np.exp(-r2 / 0.01),
                                             base.block_shape)
            w[li, 1] = 1.0
            w[li, 4] = 1.0
        state[lev] = jnp.asarray(np.asarray(
            prim_to_cons(eos, jnp.asarray(w), "euler")))
    state = sh.state_mgr.fill_ghosts(state)
    dt = float(sh.estimate_dt(state))

    ref = dict(state)
    for _ in range(2):
        ref = sh.step(ref, dt, jnp.asarray(0.0))

    jm = JMesh(np.array(jax.devices()), ("blocks",))
    shd = NamedSharding(jm, P("blocks"))
    out = {k: jax.device_put(v, shd) for k, v in state.items()}
    step_sharded = jax.jit(sh._step)
    for _ in range(2):
        out = step_sharded(out, jnp.asarray(dt), jnp.asarray(0.0))
    for k in out:
        assert out[k].sharding.spec == P("blocks")
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(ref[k]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_tracers_match_single_device():
    """Sharded tracer advection (per-shard pools + ppermute handoff,
    SURVEY swarms / hydro_driver.cpp:617-660) reproduces the
    single-device global-sort migration BITWISE across many
    shard-boundary crossings, and its lowering contains NO full-pool
    all-gather/all-to-all — only the one-hop collective-permutes (plus
    the scalar n_lost all-reduce)."""
    from athenapk_tpu.config.parameter_input import ParameterInput
    from athenapk_tpu.parallel.mesh_sharding import make_device_mesh
    from athenapk_tpu.tracers import Tracers
    from athenapk_tpu.tracers.sharded import make_sharded_tracer_ops

    mesh = Mesh(nx1=16, nx2=16, nx3=64, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=2)
    cfg = HydroConfig(fluid="euler", riemann="hllc",
                      reconstruction="plm", integrator="rk2")
    pin = ParameterInput.from_string("""
<job>
problem_id = advection
<tracers>
enabled = true
initial_seed_method = random_per_block
initial_num_tracers_per_cell = 0.05
initial_rng_seed = 7
""")
    tr = Tracers(pin, mesh, cfg)
    state = tr.seed()
    assert state is not None

    # constant-velocity prim: interp returns the exact velocities
    nvar = 5
    prim = np.zeros((mesh.nblocks, nvar) + mesh.block_shape)
    prim[:, 0] = 1.0
    prim[:, 1] = 0.30
    prim[:, 2] = 0.15
    prim[:, 3] = 0.45      # crosses a z shard boundary every ~3 steps
    prim[:, 4] = 1.0
    prim = jnp.asarray(prim)
    state = tr.fill(state, prim)

    dt = 0.2               # dz/step = 0.09 < block z extent 0.125
    ref = {k: v for k, v in state.items()}
    for _ in range(10):
        ref = tr.advect(ref, prim, dt)
        ref = tr.fill(ref, prim)

    dmesh = make_device_mesh(jax.devices()[:8])
    advect_fn, fill_fn = make_sharded_tracer_ops(tr, dmesh)
    got = {k: v for k, v in state.items()}
    for _ in range(10):
        got = advect_fn(got, prim, jnp.asarray(dt))
        got = fill_fn(got, prim)

    def by_id(st):
        act = np.asarray(st["active"]).ravel()
        ids = np.asarray(st["id"]).ravel()[act]
        order = np.argsort(ids)
        return {k: np.asarray(v).ravel()[act][order]
                for k, v in st.items() if k != "n_lost"}

    a, b = by_id(ref), by_id(got)
    assert int(np.asarray(got["n_lost"])) == 0
    assert a["id"].size == b["id"].size > 0
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    # collective audit: one-hop permutes only, no full-pool gathers
    hlo = (jax.jit(advect_fn)
           .lower(got, prim, jnp.asarray(dt)).compile().as_text())
    assert "collective-permute" in hlo
    assert "all-to-all" not in hlo
    gathers = [ln for ln in hlo.splitlines()
               if "all-gather" in ln and "all-gather-start" in ln
               or ln.strip().startswith("%all-gather")
               or " all-gather(" in ln]
    assert not gathers, f"unexpected all-gather in lowering: {gathers[:3]}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_tracers_nonperiodic_z_deactivation():
    """Non-periodic z under sharding: particles leaving the domain are
    deactivated (Parthenon swarm outflow behavior) on the shard where
    they live, and never wrap through the ppermute ring."""
    from athenapk_tpu.config.parameter_input import ParameterInput
    from athenapk_tpu.parallel.mesh_sharding import make_device_mesh
    from athenapk_tpu.tracers import Tracers
    from athenapk_tpu.tracers.sharded import make_sharded_tracer_ops

    mesh = Mesh(nx1=16, nx2=16, nx3=64, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=2, ix3_bc="outflow", ox3_bc="outflow")
    cfg = HydroConfig(fluid="euler", riemann="hllc",
                      reconstruction="plm", integrator="rk2")
    pin = ParameterInput.from_string("""
<job>
problem_id = advection
<tracers>
enabled = true
initial_seed_method = random_per_block
initial_num_tracers_per_cell = 0.05
initial_rng_seed = 11
""")
    tr = Tracers(pin, mesh, cfg)
    state = tr.seed()
    prim = np.zeros((mesh.nblocks, 5) + mesh.block_shape)
    prim[:, 0] = 1.0
    prim[:, 3] = 0.5          # +z drift toward the outflow face
    prim[:, 4] = 1.0
    prim = jnp.asarray(prim)
    state = tr.fill(state, prim)
    n0 = int(np.asarray(state["active"]).sum())

    dmesh = make_device_mesh(jax.devices()[:8])
    advect_fn, fill_fn = make_sharded_tracer_ops(tr, dmesh)
    ref = {k: v for k, v in state.items()}
    got = {k: v for k, v in state.items()}
    for _ in range(12):           # 12 * 0.1 * 0.5 = 0.6 of the domain
        ref = tr.advect(ref, prim, 0.1)
        got = advect_fn(got, prim, jnp.asarray(0.1))
    na_ref = int(np.asarray(ref["active"]).sum())
    na_got = int(np.asarray(got["active"]).sum())
    assert na_got == na_ref < n0, "outflow should deactivate leavers"
    # deactivated count recorded identically
    assert int(np.asarray(got["n_lost"])) == int(np.asarray(ref["n_lost"]))
    # surviving particles identical
    def by_id(st):
        act = np.asarray(st["active"]).ravel()
        ids = np.asarray(st["id"]).ravel()[act]
        order = np.argsort(ids)
        return {k: np.asarray(v).ravel()[act][order]
                for k, v in st.items() if k != "n_lost"}
    a, b = by_id(ref), by_id(got)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
