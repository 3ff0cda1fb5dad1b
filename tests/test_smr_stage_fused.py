"""Whole-stage fused kernel on refined meshes.

``make_fused_stage_faces`` fuses cons->prim + the three transpose-free
sweeps + boundary-face capture + the 2S stage axpy into one kernel; the
coarse-fine slab correction is then applied to ``u_new`` scaled by
``beta_dt`` — algebraically identical to correcting the negdiv first.
These tests run interpret mode on CPU and gate semantics against both
the sweep+axpy fused path and the pure XLA path (the reference serves
all meshes with one sweep + update chain, ``src/hydro/hydro.cpp:1026``
+ ``UpdateWithFluxDivergence``).
"""

import numpy as np
import pytest

from tests.test_pallas_sweep import _smr_blob


def _mk(fluid="euler"):
    from athenapk_tpu.amr.smr import SmrMesh
    from athenapk_tpu.core.mesh import Mesh
    from athenapk_tpu.eos.adiabatic import EOS
    from athenapk_tpu.solver.hydro_pkg import HydroConfig

    base = Mesh(nx1=16, nx2=16, nx3=16, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=3)
    sm = SmrMesh(base, [(0.0, 0.5, 0.0, 0.5, 0.0, 0.5, 1)])
    eos = EOS(gamma=5.0 / 3.0)
    riemann = "hllc" if fluid == "euler" else "hlld"
    cfg = HydroConfig(fluid=fluid, riemann=riemann, reconstruction="ppm",
                      integrator="vl2", cfl=0.3)
    return base, sm, eos, cfg


def _run(monkeypatch, base, sm, eos, cfg, sweep, stage, source=None,
         nsteps=3):
    import jax.numpy as jnp
    from athenapk_tpu.amr.smr_hydro import SmrHydro

    monkeypatch.setenv("ATHENAPK_PALLAS_SWEEP", sweep)
    monkeypatch.setenv("ATHENAPK_PALLAS_STAGE", stage)
    sh = SmrHydro(sm, cfg, eos, problem_source_unsplit=source)
    st = sh.state_mgr.fill_ghosts(_smr_blob(base, sm, eos))
    m0 = float(sh.total_mass(st))
    dt = jnp.float32(float(sh.estimate_dt(st)))
    for _ in range(nsteps):
        st = sh.step(st, dt, jnp.float32(0.0))
    return st, m0, float(sh.total_mass(st))


def _gate(base, st_ref, st_got, tol=2e-5):
    g = base.nghost
    for lev in st_ref:
        a = np.asarray(st_ref[lev][:, :, g:-g, g:-g, g:-g])
        b = np.asarray(st_got[lev][:, :, g:-g, g:-g, g:-g])
        assert np.isfinite(b).all()
        rel = np.abs(b - a).max() / np.abs(a).max()
        assert rel < tol, f"lev {lev}: rel={rel:.2e}"


def test_smr_stage_fused_matches_xla(monkeypatch):
    """3 VL2 cycles on a 2-level mesh: stage-fused == sweep-fused ==
    XLA (f32 roundoff), and mass is conserved through the coarse-fine
    correction applied post-axpy."""
    base, sm, eos, cfg = _mk()
    st_x, m0x, m1x = _run(monkeypatch, base, sm, eos, cfg, "0", "1")
    st_v, _, _ = _run(monkeypatch, base, sm, eos, cfg, "1", "0")
    st_s, m0s, m1s = _run(monkeypatch, base, sm, eos, cfg, "1", "1")
    _gate(base, st_x, st_s)
    # stage vs sweep+axpy: identical arithmetic up to axpy fusion order
    _gate(base, st_v, st_s, tol=1e-6)
    assert abs(m1s - m0s) / abs(m0s) < 1e-5


@pytest.mark.slow
def test_smr_stage_fused_with_prim_source(monkeypatch):
    """emit_prim path: a prim-consuming per-level source (cluster-style
    signature) sees the kernel-emitted prim; results match the XLA
    path."""
    import jax.numpy as jnp

    def source(state, prims, beta_dt, t):
        # velocity-dependent friction: needs prim, touches every level
        out = {}
        for lev in state:
            u = state[lev]
            rho = prims[lev][:, 0]
            out[lev] = u.at[:, 1].add(-0.1 * beta_dt * rho
                                      * prims[lev][:, 1])
        return out

    base, sm, eos, cfg = _mk()
    st_x, _, _ = _run(monkeypatch, base, sm, eos, cfg, "0", "1",
                      source=source)
    st_s, _, _ = _run(monkeypatch, base, sm, eos, cfg, "1", "1",
                      source=source)
    _gate(base, st_x, st_s)


@pytest.mark.slow
def test_smr_stage_fused_glmmhd(monkeypatch):
    """GLM-MHD (9-var) with the Dedner psi epilogue outside the kernel."""
    import jax.numpy as jnp
    from athenapk_tpu.amr.smr_hydro import SmrHydro
    from athenapk_tpu.eos.adiabatic import prim_to_cons

    base, sm, eos, cfg = _mk("glmmhd")

    def blob():
        state = {}
        for lev, ids in sm.level_ids.items():
            w = np.zeros((len(ids), 9) + base.block_shape)
            for li, gid in enumerate(ids):
                x, y, z = sm.cell_centers_leaf(gid)
                r2 = (x - 0.4) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
                w[li, 0] = 1.0 + np.broadcast_to(np.exp(-r2 / 0.01),
                                                 base.block_shape)
                w[li, 1] = 0.3
                w[li, 4] = 1.0
                w[li, 5] = 0.2
                w[li, 6] = 0.1
            state[lev] = jnp.asarray(np.asarray(prim_to_cons(
                eos, jnp.asarray(w), "glmmhd")), jnp.float32)
        return state

    def run(sweep, stage):
        monkeypatch.setenv("ATHENAPK_PALLAS_SWEEP", sweep)
        monkeypatch.setenv("ATHENAPK_PALLAS_STAGE", stage)
        sh = SmrHydro(sm, cfg, eos)
        st = sh.state_mgr.fill_ghosts(blob())
        dt = jnp.float32(float(sh.estimate_dt(st)))
        for _ in range(2):
            st = sh.step(st, dt, jnp.float32(0.4))
        return st

    _gate(base, run("0", "1"), run("1", "1"))


def _uniform_pkg(monkeypatch, sweep, stage, fluid="euler", source=None,
                 glmmhd_source="dedner_plain"):
    from athenapk_tpu.core.mesh import Mesh
    from athenapk_tpu.eos.adiabatic import EOS
    from athenapk_tpu.solver.hydro_pkg import HydroConfig, HydroPackage

    monkeypatch.setenv("ATHENAPK_PALLAS_SWEEP", sweep)
    monkeypatch.setenv("ATHENAPK_PALLAS_STAGE", stage)
    mesh = Mesh(nx1=32, nx2=16, nx3=16, mbnx1=16, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=3)
    riemann = "hllc" if fluid == "euler" else "hlld"
    cfg = HydroConfig(fluid=fluid, riemann=riemann, reconstruction="ppm",
                      integrator="vl2", glmmhd_source=glmmhd_source)
    eos = EOS(gamma=5.0 / 3.0)
    return mesh, HydroPackage(mesh, cfg, eos,
                              problem_source_unsplit=source), eos


def _uniform_state(mesh, pkg, eos, fluid="euler"):
    import jax
    import jax.numpy as jnp
    from athenapk_tpu.eos.adiabatic import prim_to_cons

    nvar = 5 if fluid == "euler" else 9
    rng = np.random.default_rng(11)
    shape = (mesh.nblocks, nvar) + mesh.block_shape
    w = np.ones(shape)
    w[:, 1:4] = 0.3 * rng.standard_normal((shape[0], 3) + shape[2:])
    w[:, 4] = 1.0 + 0.2 * rng.random((shape[0],) + shape[2:])
    if fluid == "glmmhd":
        w[:, 5:8] = 0.2 * rng.standard_normal((shape[0], 3) + shape[2:])
        w[:, 8] = 0.01 * rng.standard_normal((shape[0],) + shape[2:])
    u = jnp.asarray(np.asarray(prim_to_cons(eos, jnp.asarray(w), fluid)),
                    jnp.float32)
    return jax.jit(pkg.apply_boundaries)(u)


def test_uniform_stage_emit_prim_source_matches_xla(monkeypatch):
    """Uniform path: a prim-consuming problem source (turbulence/
    cluster-style signature) no longer blocks stage fusion — the kernel
    emits the stage-start prim for the epilogue."""
    import jax.numpy as jnp

    def source(u, prim, mesh_, beta_dt, t):
        return u.at[:, 1].add(-0.1 * beta_dt * prim[:, 0] * prim[:, 1])

    mesh, pkg_x, eos = _uniform_pkg(monkeypatch, "0", "1", source=source)
    u0 = _uniform_state(mesh, pkg_x, eos)
    dt = jnp.float32(1e-3)
    ref = np.asarray(pkg_x._step(u0, dt, jnp.float32(0.0)))

    _, pkg_f, _ = _uniform_pkg(monkeypatch, "1", "1", source=source)
    assert pkg_f._use_fused_stage(jnp.float32)
    assert pkg_f._stage_needs_prim()
    got = np.asarray(pkg_f._step(u0, dt, jnp.float32(0.0)))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 1e-5, f"stage+emit_prim source rel={rel:.2e}"


def test_uniform_stage_extended_dedner_matches_xla(monkeypatch):
    """Extended Dedner divB source runs on the stage path via the
    emitted prim (previously gated off)."""
    import jax.numpy as jnp

    mesh, pkg_x, eos = _uniform_pkg(monkeypatch, "0", "1",
                                    fluid="glmmhd",
                                    glmmhd_source="dedner_extended")
    u0 = _uniform_state(mesh, pkg_x, eos, "glmmhd")
    dt, c_h = jnp.float32(1e-3), jnp.float32(0.8)
    ref = np.asarray(pkg_x._step(u0, dt, c_h))

    _, pkg_f, _ = _uniform_pkg(monkeypatch, "1", "1", fluid="glmmhd",
                               glmmhd_source="dedner_extended")
    assert pkg_f._use_fused_stage(jnp.float32)
    got = np.asarray(pkg_f._step(u0, dt, c_h))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 1e-5, f"stage+extended-dedner rel={rel:.2e}"


@pytest.mark.slow
def test_smr_extended_dedner_matches_uniform_semantics(monkeypatch):
    """The refined-mesh driver honors glmmhd_source=dedner_extended
    (previously silently degraded to plain damping): XLA vs stage-fused
    equality with the extended terms active."""
    import jax.numpy as jnp
    from athenapk_tpu.amr.smr_hydro import SmrHydro
    from athenapk_tpu.eos.adiabatic import prim_to_cons
    from athenapk_tpu.solver.hydro_pkg import HydroConfig

    base, sm, eos, _ = _mk("glmmhd")
    cfg = HydroConfig(fluid="glmmhd", riemann="hlld",
                      reconstruction="ppm", integrator="vl2",
                      glmmhd_source="dedner_extended")

    def blob():
        state = {}
        for lev, ids in sm.level_ids.items():
            w = np.zeros((len(ids), 9) + base.block_shape)
            for li, gid in enumerate(ids):
                x, y, z = sm.cell_centers_leaf(gid)
                r2 = (x - 0.4) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
                w[li, 0] = 1.0 + np.broadcast_to(np.exp(-r2 / 0.01),
                                                 base.block_shape)
                w[li, 1] = 0.3
                w[li, 4] = 1.0
                w[li, 5] = 0.2
                w[li, 7] = 0.1
                w[li, 8] = 0.02
            state[lev] = jnp.asarray(np.asarray(prim_to_cons(
                eos, jnp.asarray(w), "glmmhd")), jnp.float32)
        return state

    def run(sweep, stage):
        monkeypatch.setenv("ATHENAPK_PALLAS_SWEEP", sweep)
        monkeypatch.setenv("ATHENAPK_PALLAS_STAGE", stage)
        sh = SmrHydro(sm, cfg, eos)
        st = sh.state_mgr.fill_ghosts(blob())
        dt = jnp.float32(float(sh.estimate_dt(st)))
        for _ in range(2):
            st = sh.step(st, dt, jnp.float32(0.4))
        return st

    st_x = run("0", "1")
    st_s = run("1", "1")
    _gate(base, st_x, st_s)
    # the extended terms must actually DO something vs plain damping
    cfg_plain = HydroConfig(fluid="glmmhd", riemann="hlld",
                            reconstruction="ppm", integrator="vl2",
                            glmmhd_source="dedner_plain")
    monkeypatch.setenv("ATHENAPK_PALLAS_SWEEP", "0")
    sh_p = SmrHydro(sm, cfg_plain, eos)
    st_p = sh_p.state_mgr.fill_ghosts(blob())
    dt = jnp.float32(float(sh_p.estimate_dt(st_p)))
    for _ in range(2):
        st_p = sh_p.step(st_p, dt, jnp.float32(0.4))
    g = base.nghost
    diff = max(float(np.abs(np.asarray(st_x[lev] - st_p[lev])
                            [:, :, g:-g, g:-g, g:-g]).max())
               for lev in st_x)
    assert diff > 0.0, "extended Dedner had no effect on SMR"


def test_halo_slabs_chunked_small_tiles():
    """_halo_slabs must deliver the full 2h halo even when the tile is
    SMALLER than the stencil width (t < h needs ceil(h/t) roll chunks;
    the old single-roll form silently returned a short slab and Pallas
    padded the block reads with garbage -> NaNs on 22^3 SMR blocks)."""
    import jax.numpy as jnp
    from athenapk_tpu.solver.pallas_sweep import _halo_slabs

    rng = np.random.default_rng(3)
    q = rng.standard_normal((2, 5, 12, 10, 6)).astype(np.float32)
    for axis, n in ((2, 12), (3, 10)):
        for t in (1, 2, 3, 4):
            if n % t:
                continue
            for h in (1, 2, 3, 4):
                got = np.asarray(_halo_slabs(jnp.asarray(q), t, h, axis))
                nb_t = n // t
                for i in range(nb_t):
                    lo = [(i * t - k) % n for k in range(h, 0, -1)]
                    hi = [((i + 1) * t + k) % n for k in range(h)]
                    want = np.take(q, lo + hi, axis=axis)
                    sl = [slice(None)] * got.ndim
                    sl[axis] = i
                    np.testing.assert_array_equal(
                        got[tuple(sl)], want,
                        err_msg=f"axis={axis} t={t} h={h} tile={i}")


def test_stage_faces_tile_smaller_than_stencil(monkeypatch):
    """stage+faces with tz < h (forced tz=2, ppm h=3): the 22^3 SMR
    block shape that NaN'd before the chunked-halo fix, both with the
    auto-picked tiles and a forced sub-stencil tz (the picker now
    prefers tz >= h, so the forced case pins the chunked-halo kernel
    path against regressions)."""
    import jax
    import jax.numpy as jnp
    from athenapk_tpu.core.mesh import Mesh
    from athenapk_tpu.eos.adiabatic import prim_to_cons
    from athenapk_tpu.eos.adiabatic import EOS
    from athenapk_tpu.solver.hydro_pkg import HydroConfig, HydroPackage
    from athenapk_tpu.solver import pallas_sweep as ps

    mesh = Mesh(nx1=32, nx2=32, nx3=32, mbnx1=16, mbnx2=16, mbnx3=16,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=3)
    g = mesh.nghost
    cfg = HydroConfig(fluid="euler", riemann="hllc", reconstruction="ppm",
                      integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(mesh, cfg, eos)
    rng = np.random.default_rng(7)
    shape = (mesh.nblocks, cfg.nvar) + mesh.block_shape
    w = np.ones(shape)
    w[:, 1:4] = 0.3 * rng.standard_normal((shape[0], 3) + shape[2:])
    w[:, 4] = 1.0 + 0.2 * rng.random((shape[0],) + shape[2:])
    u0 = jnp.asarray(np.asarray(prim_to_cons(eos, jnp.asarray(w),
                                             "euler")), jnp.float32)
    u0 = jax.jit(pkg.apply_boundaries)(u0)
    u1 = u0 * jnp.float32(1.02)
    gam0, gam1, bdt = (jnp.float32(v) for v in (0.3, 0.7, 2e-3))
    c_h = jnp.float32(0.0)

    u0f, prim = jax.jit(pkg._cons_to_prim)(u0)
    fluxes = jax.jit(
        lambda p, c: pkg._compute_fluxes(p, c, "ppm"))(prim, c_h)
    nd_ref = -np.asarray(jax.jit(pkg._flux_divergence)(fluxes))
    u_ref = np.asarray(gam0 * u0f + gam1 * u1) + float(bdt) * nd_ref
    sl = (slice(None), slice(None), slice(g, -g), slice(g, -g),
          slice(g, -g))

    for tz in (8, 2):   # 8 -> auto pick (>= h preferred); 2 -> t < h
        if tz < 3:      # force the sub-stencil tile past the picker
            monkeypatch.setattr(ps, "_fit_tz",
                                lambda *a, **k: 2)
        fn = ps.make_fused_stage_faces(
            mesh.block_shape, (mesh.dx1, mesh.dx2, mesh.dx3), cfg, eos,
            pkg._positivity_mask, "ppm", g, tz=tz, interpret=True)
        u_new, _, faces = jax.jit(
            lambda a, b: fn(a, b, gam0, gam1, bdt, c_h))(u0, u1)
        assert np.isfinite(np.asarray(u_new)).all(), f"tz={tz}"
        rel = np.abs(np.asarray(u_new)[sl] - u_ref[sl]).max() \
            / np.abs(u_ref[sl]).max()
        assert rel < 1e-5, f"tz={tz}: u_new rel={rel:.2e}"
        nzi = mesh.mbnx3
        fz = np.asarray(fluxes[3])
        want_z = np.stack([fz[:, :, g], fz[:, :, g + nzi]], axis=-1)
        dz = np.abs(np.asarray(faces[3])[:, :, g:-g, g:-g]
                    - want_z[:, :, g:-g, g:-g]).max()
        assert dz < 1e-6, f"tz={tz}: z faces diff={dz:.2e}"


def test_stage_faces_kernel_slabs_match_fluxes():
    """Direct kernel check: the face slabs equal the interior boundary
    planes of the raw Riemann fluxes and u_new equals the XLA stage."""
    import jax
    import jax.numpy as jnp
    from athenapk_tpu.core.mesh import Mesh
    from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons, cons_to_prim
    from athenapk_tpu.solver.hydro_pkg import HydroConfig, HydroPackage
    from athenapk_tpu.solver import pallas_sweep as ps

    mesh = Mesh(nx1=32, nx2=16, nx3=16, mbnx1=16, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=3)
    g = mesh.nghost
    cfg = HydroConfig(fluid="euler", riemann="hllc", reconstruction="ppm",
                      integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(mesh, cfg, eos)
    rng = np.random.default_rng(7)
    shape = (mesh.nblocks, cfg.nvar) + mesh.block_shape
    w = np.ones(shape)
    w[:, 1:4] = 0.3 * rng.standard_normal((shape[0], 3) + shape[2:])
    w[:, 4] = 1.0 + 0.2 * rng.random((shape[0],) + shape[2:])
    u0 = jnp.asarray(np.asarray(prim_to_cons(eos, jnp.asarray(w),
                                             "euler")), jnp.float32)
    u0 = jax.jit(pkg.apply_boundaries)(u0)
    u1 = u0 * jnp.float32(1.02)
    gam0, gam1, bdt = (jnp.float32(v) for v in (0.3, 0.7, 2e-3))
    c_h = jnp.float32(0.0)

    u0f, prim = jax.jit(pkg._cons_to_prim)(u0)
    fluxes = jax.jit(
        lambda p, c: pkg._compute_fluxes(p, c, "ppm"))(prim, c_h)
    nd_ref = -np.asarray(jax.jit(pkg._flux_divergence)(fluxes))
    u_ref = np.asarray(gam0 * u0f + gam1 * u1) + float(bdt) * nd_ref

    fn = ps.make_fused_stage_faces(
        mesh.block_shape, (mesh.dx1, mesh.dx2, mesh.dx3), cfg, eos,
        pkg._positivity_mask, "ppm", g, tz=8, ty=8, interpret=True,
        emit_prim=True)
    u_new, prim_k, faces = jax.jit(
        lambda a, b: fn(a, b, gam0, gam1, bdt, c_h))(u0, u1)

    sl = (slice(None), slice(None), slice(g, -g), slice(g, -g),
          slice(g, -g))
    rel = np.abs(np.asarray(u_new)[sl] - u_ref[sl]).max() \
        / np.abs(u_ref[sl]).max()
    assert rel < 1e-6, f"stage-faces u_new rel={rel:.2e}"
    rel_p = np.abs(np.asarray(prim_k) - np.asarray(prim)).max()
    assert rel_p < 1e-6, f"emitted prim diff={rel_p:.2e}"

    nzi, nyi, nxi = mesh.mbnx3, mesh.mbnx2, mesh.mbnx1
    fx = np.asarray(fluxes[1])
    want_x = np.stack([fx[..., g], fx[..., g + nxi]], axis=-1)
    assert np.abs(np.asarray(faces[1])[:, :, g:-g, g:-g]
                  - want_x[:, :, g:-g, g:-g]).max() < 1e-6
    fy = np.asarray(fluxes[2])
    want_y = np.stack([fy[:, :, :, g], fy[:, :, :, g + nyi]], axis=-1)
    assert np.abs(np.asarray(faces[2])[:, :, g:-g, g:-g]
                  - want_y[:, :, g:-g, g:-g]).max() < 1e-6
    fz = np.asarray(fluxes[3])
    want_z = np.stack([fz[:, :, g], fz[:, :, g + nzi]], axis=-1)
    assert np.abs(np.asarray(faces[3])[:, :, g:-g, g:-g]
                  - want_z[:, :, g:-g, g:-g]).max() < 1e-6
