"""Static mesh refinement: coarse-fine ghost fill exactness + a two-level
advection evolution.

A globally linear field filled only in block interiors must reproduce
exactly in every face-ghost cell after ``fill_ghosts``: same-level copies
trivially, average restriction and minmod prolongation by linear
exactness — any nonzero error flags broken offset algebra."""

import numpy as np
import jax.numpy as jnp
import pytest

from athenapk_tpu.amr import SmrMesh, SmrState  # noqa: F401
from athenapk_tpu.core.mesh import Mesh


def _f(x, y, z):
    return 1.0 + 2.0 * x + 3.0 * y + 4.0 * z


@pytest.fixture(scope="module")
def smr():
    base = Mesh(nx1=32, nx2=32, nx3=32, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=2)
    sm = SmrMesh(base, [(0.4, 0.6, 0.4, 0.6, 0.4, 0.6, 1)])
    return base, sm


def test_leaf_structure(smr):
    base, sm = smr
    assert sm.level_ids[0].size == 56
    assert sm.level_ids[1].size == 64


def test_ghost_fill_linear_exact(smr):
    base, sm = smr
    st = SmrState(sm, 1)
    g = base.nghost
    state = {}
    for lev, ids in sm.level_ids.items():
        arr = np.full((len(ids), 1) + base.block_shape, -999.0)
        for li, gid in enumerate(ids):
            x, y, z = sm.cell_centers_leaf(gid)
            vals = np.broadcast_to(_f(x, y, z), base.block_shape)
            arr[li, 0, g:-g, g:-g, g:-g] = vals[g:-g, g:-g, g:-g]
        state[lev] = jnp.asarray(arr)

    filled = st.fill_ghosts(state)

    nz = ny = nx = 8
    sls = [(slice(g, g + nz), slice(g, g + ny), slice(0, g)),
           (slice(g, g + nz), slice(g, g + ny), slice(g + nx, None)),
           (slice(g, g + nz), slice(0, g), slice(g, g + nx)),
           (slice(g, g + nz), slice(g + ny, None), slice(g, g + nx)),
           (slice(0, g), slice(g, g + ny), slice(g, g + nx)),
           (slice(g + nz, None), slice(g, g + ny), slice(g, g + nx))]
    for lev, ids in sm.level_ids.items():
        a = np.asarray(filled[lev])
        for (li, face, kind, payload) in st._plans[lev]:
            if kind == "same":
                continue  # may wrap the (non-periodic) linear function
            gid = ids[li]
            x, y, z = sm.cell_centers_leaf(gid)
            expect = np.broadcast_to(_f(x, y, z), base.block_shape)
            d = float(np.abs(a[li, 0][sls[face]]
                             - expect[sls[face]]).max())
            assert d < 1e-12, (lev, li, face, kind, d)
    # same-level: interior (non-wrapping) pairs must be exact
    for lev, ids in sm.level_ids.items():
        a = np.asarray(filled[lev])
        for (li, face, kind, payload) in st._plans[lev]:
            if kind != "same":
                continue
            gid = ids[li]
            x, y, z = sm.cell_centers_leaf(gid)
            # ghost centers stay inside the domain <=> no wrap
            gx = [x.min(), x.max(), y.min(), y.max(), z.min(), z.max()]
            if min(gx) < 0.0 or max(gx) > 1.0:
                continue
            expect = np.broadcast_to(_f(x, y, z), base.block_shape)
            d = float(np.abs(a[li, 0][sls[face]]
                             - expect[sls[face]]).max())
            assert d < 1e-12, (lev, li, face, kind, d)


def test_smr_evolution_conserves_mass(smr):
    """Blob advecting through the refined patch: flux correction keeps
    total mass machine-exact; uniform flow is exactly invariant."""
    import jax.numpy as jnp
    from athenapk_tpu.amr.smr_hydro import SmrHydro
    from athenapk_tpu.solver.hydro_pkg import HydroConfig
    from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons

    base, _ = smr
    base3 = Mesh(nx1=32, nx2=32, nx3=32, mbnx1=8, mbnx2=8, mbnx3=8,
                 x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                 nghost=3)
    sm = SmrMesh(base3, [(0.4, 0.6, 0.4, 0.6, 0.4, 0.6, 1)])
    cfg = HydroConfig(fluid="euler", riemann="hllc", reconstruction="ppm",
                      integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    sh = SmrHydro(sm, cfg, eos)
    state = {}
    for lev, ids in sm.level_ids.items():
        w = np.zeros((len(ids), 5) + base3.block_shape)
        for li, gid in enumerate(ids):
            x, y, z = sm.cell_centers_leaf(gid)
            r2 = (x - 0.2) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
            w[li, 0] = 1.0 + np.broadcast_to(np.exp(-r2 / 0.01),
                                             base3.block_shape)
            w[li, 1] = 1.0
            w[li, 4] = 1.0
        state[lev] = jnp.asarray(np.asarray(
            prim_to_cons(eos, jnp.asarray(w), "euler")))
    state = sh.state_mgr.fill_ghosts(state)
    m0 = float(sh.total_mass(state))
    dt = float(sh.estimate_dt(state))
    for _ in range(8):
        state = sh.step(state, dt, jnp.asarray(0.0))
    m1 = float(sh.total_mass(state))
    assert abs(m1 - m0) / m0 < 1e-13
    assert all(bool(jnp.isfinite(v).all()) for v in state.values())

    # uniform invariance
    state2 = {}
    for lev, ids in sm.level_ids.items():
        w = np.zeros((len(ids), 5) + base3.block_shape)
        w[:, 0] = 1.0
        w[:, 1] = 0.3
        w[:, 4] = 0.7
        state2[lev] = jnp.asarray(np.asarray(
            prim_to_cons(eos, jnp.asarray(w), "euler")))
    state2 = sh.state_mgr.fill_ghosts(state2)
    s0 = {k: np.array(v) for k, v in state2.items()}
    g = base3.nghost
    for _ in range(3):
        state2 = sh.step(state2, dt, jnp.asarray(0.0))
    for k in state2:
        np.testing.assert_array_equal(
            np.asarray(state2[k][:, :, g:-g, g:-g, g:-g]),
            s0[k][:, :, g:-g, g:-g, g:-g])


def test_regions_from_deck():
    from athenapk_tpu.amr import SmrMesh
    from athenapk_tpu.amr.smr import smr_regions_from_deck
    from athenapk_tpu.config.parameter_input import ParameterInput

    deck = """
<parthenon/mesh>
refinement = static

<parthenon/static_refinement0>
x1min = 0.4
x1max = 0.6
x2min = 0.4
x2max = 0.6
x3min = 0.4
x3max = 0.6
level = 1
"""
    pin = ParameterInput.from_string(deck)
    regions = smr_regions_from_deck(pin)
    assert regions == [(0.4, 0.6, 0.4, 0.6, 0.4, 0.6, 1)]
    base = Mesh(nx1=32, nx2=32, nx3=32, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=2)
    sm = SmrMesh(base, regions)
    assert sm.level_ids[1].size == 64


def test_three_level_nested():
    """Nested static regions (levels 1+2): a level-0 block's coarse
    neighbor may have far-side children refined deeper — only the 4
    face-touching children are required leaves (2:1 balance constrains
    faces, not whole octets)."""
    base = Mesh(nx1=32, nx2=32, nx3=32, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=3)
    sm = SmrMesh(base, [(0.25, 0.75, 0.25, 0.75, 0.25, 0.75, 1),
                        (0.4, 0.6, 0.4, 0.6, 0.4, 0.6, 2)])
    assert sm.max_level == 2
    assert sum(ids.size for ids in sm.level_ids.values()) > 64
    st = SmrState(sm, 1)
    # uniform field survives the three-kind fill exactly
    state = {lev: jnp.full((ids.size, 1) + base.block_shape, 3.5)
             for lev, ids in sm.level_ids.items()}
    filled = st.fill_ghosts(state)
    for v in filled.values():
        np.testing.assert_array_equal(np.asarray(v), 3.5)


def test_smr_glmmhd_step():
    """GLM-MHD on a refined mesh: uniform magnetized flow is exactly
    invariant (incl. the psi damping path) and a perturbed run
    conserves mass through the level boundary."""
    from athenapk_tpu.amr.smr_hydro import SmrHydro
    from athenapk_tpu.solver.hydro_pkg import HydroConfig
    from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons

    base = Mesh(nx1=16, nx2=16, nx3=16, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=3)
    sm = SmrMesh(base, [(0.5, 1.0, 0.5, 1.0, 0.5, 1.0, 1)])
    cfg = HydroConfig(fluid="glmmhd", riemann="hlld",
                      reconstruction="plm", integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    sh = SmrHydro(sm, cfg, eos)

    def mk(perturb):
        state = {}
        for lev, ids in sm.level_ids.items():
            w = np.zeros((len(ids), 9) + base.block_shape)
            w[:, 0] = 1.0
            w[:, 1] = 0.5
            w[:, 4] = 1.0
            w[:, 5] = 0.3   # Bx
            w[:, 6] = 0.2   # By
            if perturb:
                for li, gid in enumerate(ids):
                    x, y, z = sm.cell_centers_leaf(gid)
                    r2 = (x - 0.3) ** 2 + (y - 0.3) ** 2 + (z - 0.3) ** 2
                    w[li, 0] += np.broadcast_to(
                        0.3 * np.exp(-r2 / 0.01), base.block_shape)
            state[lev] = jnp.asarray(np.asarray(
                prim_to_cons(eos, jnp.asarray(w), "glmmhd")))
        from athenapk_tpu.amr.smr import SmrState
        return SmrState(sm, 9).fill_ghosts(state)

    dt = 0.002
    c_h = jnp.asarray(0.3 * (min(sm.dx(sm.max_level)) / dt))
    s_u = mk(False)
    g = base.nghost
    ref = {k: np.array(v) for k, v in s_u.items()}
    for _ in range(3):
        s_u = sh.step(s_u, dt, c_h)
    for k in s_u:
        np.testing.assert_allclose(
            np.asarray(s_u[k][:, :, g:-g, g:-g, g:-g]),
            ref[k][:, :, g:-g, g:-g, g:-g], atol=1e-13)

    s_p = mk(True)
    m0 = float(sh.total_mass(s_p))
    for _ in range(4):
        s_p = sh.step(s_p, dt, c_h)
    m1 = float(sh.total_mass(s_p))
    assert abs(m1 - m0) / m0 < 1e-13
    assert all(bool(jnp.isfinite(v).all()) for v in s_p.values())


def test_smr_nonperiodic_bcs():
    """Non-periodic refined meshes: reflecting walls conserve mass to
    rounding; uniform flow-free gas with outflow BCs is exactly
    invariant (physical-BC faces + BC-derived corners)."""
    from athenapk_tpu.amr.smr_hydro import SmrHydro
    from athenapk_tpu.solver.hydro_pkg import HydroConfig
    from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons

    def mk(bc):
        base = Mesh(nx1=16, nx2=16, nx3=16, mbnx1=8, mbnx2=8, mbnx3=8,
                    x1min=-0.5, x1max=0.5, x2min=-0.5, x2max=0.5,
                    x3min=-0.5, x3max=0.5, nghost=3,
                    ix1_bc=bc, ox1_bc=bc, ix2_bc=bc, ox2_bc=bc,
                    ix3_bc=bc, ox3_bc=bc)
        sm = SmrMesh(base, [(-0.25, 0.25, -0.25, 0.25, -0.25, 0.25, 1)])
        return base, sm

    eos = EOS(gamma=5.0 / 3.0)
    cfg = HydroConfig(fluid="euler", riemann="hllc",
                      reconstruction="plm", integrator="rk2")

    # reflecting: nothing leaves the box
    base, sm = mk("reflecting")
    sh = SmrHydro(sm, cfg, eos)
    state = {}
    for lev, ids in sm.level_ids.items():
        w = np.zeros((len(ids), 5) + base.block_shape)
        for li, gid in enumerate(ids):
            x, y, z = sm.cell_centers_leaf(gid)
            r = np.sqrt(x * x + y * y + z * z)
            w[li, 0] = 1.0
            w[li, 4] = np.broadcast_to(np.where(r < 0.12, 20.0, 0.1),
                                       base.block_shape)
        state[lev] = jnp.asarray(np.asarray(
            prim_to_cons(eos, jnp.asarray(w), "euler")))
    state = sh.state_mgr.fill_ghosts(state)
    m0 = float(sh.total_mass(state))
    dt = float(sh.estimate_dt(state))
    for _ in range(8):
        state = sh.step(state, dt, jnp.asarray(0.0))
    assert abs(float(sh.total_mass(state)) - m0) / m0 < 1e-13
    assert all(bool(jnp.isfinite(v).all()) for v in state.values())

    # outflow: uniform gas exactly invariant
    base, sm = mk("outflow")
    sh = SmrHydro(sm, cfg, eos)
    state = {}
    for lev, ids in sm.level_ids.items():
        w = np.zeros((len(ids), 5) + base.block_shape)
        w[:, 0] = 1.0
        w[:, 4] = 1.0
        state[lev] = jnp.asarray(np.asarray(
            prim_to_cons(eos, jnp.asarray(w), "euler")))
    state = sh.state_mgr.fill_ghosts(state)
    s0 = {k: np.array(v) for k, v in state.items()}
    g = base.nghost
    for _ in range(3):
        state = sh.step(state, 0.005, jnp.asarray(0.0))
    for k in state:
        np.testing.assert_array_equal(
            np.asarray(state[k][:, :, g:-g, g:-g, g:-g]),
            s0[k][:, :, g:-g, g:-g, g:-g])


@pytest.mark.slow
def test_smr_advection_second_order():
    """Smooth advection through an x-facing coarse-fine interface
    converges at 2nd order in the base resolution (the region must be
    block-aligned at both resolutions so the refined geometry matches)."""
    from athenapk_tpu.amr.smr_hydro import SmrHydro
    from athenapk_tpu.solver.hydro_pkg import HydroConfig
    from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons

    eos = EOS(gamma=5.0 / 3.0)
    cfg = HydroConfig(fluid="euler", riemann="hllc",
                      reconstruction="ppm", integrator="vl2", cfl=0.3)

    def rho_exact(x, t):
        return 1.0 + 0.1 * np.sin(2 * np.pi * (x - t))

    def run(n):
        base = Mesh(nx1=n, nx2=n, nx3=n, mbnx1=8, mbnx2=8, mbnx3=8,
                    x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                    nghost=3)
        sm = SmrMesh(base, [(0.5, 1.0, 0.5, 1.0, 0.5, 1.0, 1)])
        assert len(sm.level_ids) == 2   # genuinely mixed-level
        sh = SmrHydro(sm, cfg, eos)
        state = {}
        for lev, ids in sm.level_ids.items():
            w = np.zeros((len(ids), 5) + base.block_shape)
            for li, gid in enumerate(ids):
                x, y, z = sm.cell_centers_leaf(gid)
                w[li, 0] = np.broadcast_to(rho_exact(x, 0.0),
                                           base.block_shape)
                w[li, 1] = 1.0
                w[li, 4] = 1.0
            state[lev] = jnp.asarray(np.asarray(
                prim_to_cons(eos, jnp.asarray(w), "euler")))
        state = sh.state_mgr.fill_ghosts(state)
        t_end = 0.1
        nsteps = int(np.ceil(t_end / float(sh.estimate_dt(state))))
        dt = t_end / nsteps
        for _ in range(nsteps):
            state = sh.step(state, dt, jnp.asarray(0.0))
        g = base.nghost
        err = 0.0
        for lev, ids in sm.level_ids.items():
            d1, d2, d3 = sm.dx(lev)
            rho = np.asarray(state[lev][:, 0, g:-g, g:-g, g:-g])
            for li, gid in enumerate(ids):
                x, y, z = sm.cell_centers_leaf(gid)
                ex = np.broadcast_to(rho_exact(x, t_end),
                                     base.block_shape)[g:-g, g:-g, g:-g]
                err += np.abs(rho[li] - ex).sum() * d1 * d2 * d3
        return err

    e16 = run(16)
    e32 = run(32)
    assert e16 / e32 > 3.5, (e16, e32, e16 / e32)


def test_ghost_fill_contract_edges_depth1():
    """Pin the corner-fill contract (smr.py _fill_corners): after
    fill_ghosts, every ghost cell in a face slab EXTENDED TRANSVERSALLY
    BY ONE CELL (the '(face-normal, one-transverse) depth-1' region the
    diffusion cross-stencils read) holds the exact field value.  A
    linear field is reproduced exactly by both conservative transfer
    operators, so any stale cell shows as an O(1) error.  Triple
    corners (3-axis diagonals) are explicitly OUT of contract."""
    import numpy as np
    import jax.numpy as jnp
    from athenapk_tpu.amr.smr import SmrState

    base = Mesh(nx1=32, nx2=32, nx3=32, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=2)
    sm = SmrMesh(base, [(0.3, 0.7, 0.3, 0.7, 0.3, 0.7, 1)])
    f = lambda x, y, z: 1.0 + 0.3 * x - 0.2 * y + 0.1 * z  # noqa: E731

    state = {}
    for lev, ids in sm.level_ids.items():
        blocks = []
        for gid in ids:
            xs, ys, zs = sm.cell_centers_leaf(gid)
            blocks.append(f(xs, ys, zs)[None])
        state[lev] = jnp.asarray(np.stack(blocks))
    state = SmrState(sm, 1).fill_ghosts(state)

    g = base.nghost
    nz, ny, nx = base.mbnx3, base.mbnx2, base.mbnx1
    bad = []
    for lev, ids in sm.level_ids.items():
        u = np.asarray(state[lev])
        for li, gid in enumerate(ids):
            xs, ys, zs = sm.cell_centers_leaf(gid)
            exact = f(xs, ys, zs)
            got = u[li, 0]
            err = np.abs(got - exact)
            # contract region: face slabs widened by 1 transverse cell
            mask = np.zeros_like(err, bool)
            core = [slice(g, g + nz), slice(g, g + ny), slice(g, g + nx)]
            wide = [slice(g - 1, g + nz + 1), slice(g - 1, g + ny + 1),
                    slice(g - 1, g + nx + 1)]
            for ax in range(3):
                for sl_n in (slice(0, g), slice([nz, ny, nx][ax] + g,
                                                [nz, ny, nx][ax] + 2 * g)):
                    reg = list(wide)
                    reg[ax] = sl_n
                    # keep the OTHER two dims: one widened, one core
                    for other in range(3):
                        if other == ax:
                            continue
                        r2 = list(reg)
                        for third in range(3):
                            if third not in (ax, other):
                                r2[third] = core[third]
                        mask[tuple(r2)] = True
            # exclude ghosts whose centers leave the (periodic) domain
            inside = ((xs > 0) & (xs < 1) & (ys > 0) & (ys < 1)
                      & (zs > 0) & (zs < 1))
            mask &= inside
            m = err[mask].max() if mask.any() else 0.0
            if m > 1e-12:
                bad.append((lev, li, float(m)))
    assert not bad, f"stale in-contract ghosts: {bad[:5]}"
