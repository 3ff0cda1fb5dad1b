"""Mosaic compile + run validation of the Pallas kernels on the REAL TPU.

Interpret mode (the CPU test suite) checks semantics only; Mosaic's
layout/lowering passes can still reject or miscompile a kernel that
interprets fine.  This script compiles and runs every kernel variant on
the device on SMALL shapes, comparing against the XLA path computed on
the same device, simplest kernel first (a Pallas fault can wedge the
axon tunnel — partial results must survive, so every line is flushed).

Run (ONE process, never concurrently with another TPU client):

    timeout 900 python scripts/tpu_kernel_validation.py

Env: ATHENAPK_DISABLE_X64=1 is forced (Mosaic requires global x64 off).
"""

import os
import sys
import time

os.environ["ATHENAPK_DISABLE_X64"] = "1"
os.environ.pop("ATHENAPK_PALLAS_SWEEP", None)

import numpy as np                                        # noqa: E402
import jax                                                # noqa: E402
import jax.numpy as jnp                                   # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

# VALIDATE_INTERPRET=1: CPU smoke of this harness (semantics only)
INTERPRET = os.environ.get("VALIDATE_INTERPRET") == "1"

from athenapk_tpu.core.mesh import Mesh                   # noqa: E402
from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons  # noqa: E402
from athenapk_tpu.solver.hydro_pkg import (HydroConfig,   # noqa: E402
                                           HydroPackage)
from athenapk_tpu.solver import pallas_sweep as ps        # noqa: E402


def log(msg):
    print(msg, flush=True)


def mk_state(mesh, cfg, eos, seed=3):
    rng = np.random.default_rng(seed)
    shape = (mesh.nblocks, cfg.nvar) + mesh.block_shape
    w = np.ones(shape, np.float32)
    w[:, 1:4] = 0.3 * rng.standard_normal((shape[0], 3) + shape[2:])
    w[:, 4] = 1.0 + 0.2 * rng.random((shape[0],) + shape[2:])
    if cfg.fluid == "glmmhd":
        w[:, 5:8] = 0.2 * rng.standard_normal((shape[0], 3) + shape[2:])
        w[:, 8] = 0.01 * rng.standard_normal((shape[0],) + shape[2:])
    u = jnp.asarray(np.asarray(prim_to_cons(eos, jnp.asarray(w),
                                            cfg.fluid)), jnp.float32)
    return u


def meshes():
    gf = Mesh(nx1=128, nx2=16, nx3=16, mbnx1=128, mbnx2=16, mbnx3=16,
              x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
              nghost=0)
    gh = Mesh(nx1=32, nx2=16, nx3=16, mbnx1=16, mbnx2=8, mbnx3=8,
              x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
              nghost=3)
    d2 = Mesh(nx1=32, nx2=16, nx3=1, mbnx1=16, mbnx2=8, mbnx3=1,
              x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
              nghost=3)
    return gf, gh, d2


CHECKS = []


def check(name):
    def deco(fn):
        CHECKS.append((name, fn))
        return fn
    return deco


def _negdiv_ref(pkg, prim, c_h, recon="ppm"):
    return -np.asarray(jax.jit(
        lambda p, c: pkg._flux_divergence(
            pkg._compute_fluxes(p, c, recon)))(prim, c_h))


def _rel(got, ref, sl=None):
    if sl is not None:
        got, ref = got[sl], ref[sl]
    return float(np.abs(got - ref).max() / np.abs(ref).max())


@check("probe")
def _probe():
    x = (jnp.ones(8) * 2).sum()
    x.block_until_ready()
    if not INTERPRET:
        assert jax.devices()[0].platform != "cpu", "not on TPU"
    return 0.0


@check("v1 negdiv (round-2 proven)")
def _v1():
    gf, _, _ = meshes()
    cfg = HydroConfig(fluid="glmmhd", riemann="hlld",
                      reconstruction="ppm", integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(gf, cfg, eos)
    u = mk_state(gf, cfg, eos)
    _, prim = jax.jit(pkg._cons_to_prim)(u)
    c_h = jnp.float32(1.3)
    ref = _negdiv_ref(pkg, prim, c_h)
    fn = ps.make_fused_negdiv(gf, cfg, eos, pkg._positivity_mask,
                              "ppm", tz=1, ty=8, interpret=INTERPRET)
    got = np.asarray(jax.jit(fn)(prim, c_h))
    return _rel(got, ref)


@check("v1 negdiv lane-packed (multi-block, r4)")
def _v1_packed():
    # AMR-class geometry where packing triggers: 32^3 mesh of 8^3
    # blocks, g=3 ppm -> lane extent 14, pack k=64 -> 896 lanes (7x128)
    gh = Mesh(nx1=32, nx2=32, nx3=32, mbnx1=8, mbnx2=8, mbnx3=8,
              x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
              nghost=3)
    g = gh.nghost
    cfg = HydroConfig(fluid="glmmhd", riemann="hlld",
                      reconstruction="ppm", integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(gh, cfg, eos)
    assert ps._pick_pack(gh.nblocks, 8 + 2 * g, cfg.nvar) > 1
    u = jax.jit(pkg.apply_boundaries)(mk_state(gh, cfg, eos))
    _, prim = jax.jit(pkg._cons_to_prim)(u)
    c_h = jnp.float32(1.3)
    ref = _negdiv_ref(pkg, prim, c_h)
    fn = ps.make_fused_negdiv(gh, cfg, eos, pkg._positivity_mask,
                              "ppm", tz=1, ty=8, interpret=INTERPRET)
    got = np.asarray(jax.jit(fn)(prim, c_h))
    sl = (slice(None), slice(None), slice(g, -g), slice(g, -g),
          slice(g, -g))
    return _rel(got, ref, sl)


@check("v2 negdiv ghost-free")
def _v2_gf():
    gf, _, _ = meshes()
    cfg = HydroConfig(fluid="glmmhd", riemann="hlld",
                      reconstruction="ppm", integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(gf, cfg, eos)
    u = mk_state(gf, cfg, eos)
    _, prim = jax.jit(pkg._cons_to_prim)(u)
    c_h = jnp.float32(1.3)
    ref = _negdiv_ref(pkg, prim, c_h)
    fn = ps.make_fused_negdiv_v2(gf, cfg, eos, pkg._positivity_mask,
                                 "ppm", tz=8, ty=8, interpret=INTERPRET)
    got = np.asarray(jax.jit(fn)(prim, c_h))
    return _rel(got, ref)


@check("v2 negdiv ghosted")
def _v2_gh():
    _, gh, _ = meshes()
    g = gh.nghost
    cfg = HydroConfig(fluid="euler", riemann="hllc",
                      reconstruction="ppm", integrator="rk2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(gh, cfg, eos)
    u = jax.jit(pkg.apply_boundaries)(mk_state(gh, cfg, eos))
    _, prim = jax.jit(pkg._cons_to_prim)(u)
    c_h = jnp.float32(0.0)
    ref = _negdiv_ref(pkg, prim, c_h)
    fn = ps.make_fused_negdiv_v2(gh, cfg, eos, pkg._positivity_mask,
                                 "ppm", tz=8, ty=8, interpret=INTERPRET)
    got = np.asarray(jax.jit(fn)(prim, c_h))
    sl = (slice(None), slice(None), slice(g, -g), slice(g, -g),
          slice(g, -g))
    return _rel(got, ref, sl)


@check("v2 negdiv 2-D")
def _v2_2d():
    _, _, d2 = meshes()
    g = d2.nghost
    cfg = HydroConfig(fluid="glmmhd", riemann="hlld",
                      reconstruction="ppm", integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(d2, cfg, eos)
    u = jax.jit(pkg.apply_boundaries)(mk_state(d2, cfg, eos))
    _, prim = jax.jit(pkg._cons_to_prim)(u)
    c_h = jnp.float32(1.1)
    ref = _negdiv_ref(pkg, prim, c_h)
    fn = ps.make_fused_negdiv_v2(d2, cfg, eos, pkg._positivity_mask,
                                 "ppm", interpret=INTERPRET)
    got = np.asarray(jax.jit(fn)(prim, c_h))
    sl = (slice(None), slice(None), slice(None), slice(g, -g),
          slice(g, -g))
    return _rel(got, ref, sl)


@check("v2 faces (SMR correction)")
def _v2_faces():
    _, gh, _ = meshes()
    g = gh.nghost
    cfg = HydroConfig(fluid="euler", riemann="hllc",
                      reconstruction="ppm", integrator="rk2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(gh, cfg, eos)
    u = jax.jit(pkg.apply_boundaries)(mk_state(gh, cfg, eos))
    _, prim = jax.jit(pkg._cons_to_prim)(u)
    c_h = jnp.float32(0.0)
    fluxes = jax.jit(
        lambda p, c: pkg._compute_fluxes(p, c, "ppm"))(prim, c_h)
    ref_nd = -np.asarray(jax.jit(pkg._flux_divergence)(fluxes))
    fn = ps.make_fused_negdiv_faces_v2(
        gh.block_shape, (gh.dx1, gh.dx2, gh.dx3), cfg, eos,
        pkg._positivity_mask, "ppm", g, tz=8, ty=8, interpret=INTERPRET)
    nd, faces = jax.jit(fn)(prim, c_h)
    sl = (slice(None), slice(None), slice(g, -g), slice(g, -g),
          slice(g, -g))
    rel = _rel(np.asarray(nd), ref_nd, sl)
    # face slabs: interior boundary planes of the raw fluxes
    nzi = gh.mbnx3
    nyi = gh.mbnx2
    nxi = gh.mbnx1
    fx = np.asarray(fluxes[1])
    want_x = np.stack([fx[..., g], fx[..., g + nxi]], axis=-1)
    rel = max(rel, _rel(np.asarray(faces[1])[:, :, g:-g, g:-g],
                        want_x[:, :, g:-g, g:-g]))
    fy = np.asarray(fluxes[2])
    want_y = np.stack([fy[:, :, :, g], fy[:, :, :, g + nyi]], axis=-1)
    rel = max(rel, _rel(np.asarray(faces[2])[:, :, g:-g, g:-g],
                        want_y[:, :, g:-g, g:-g]))
    fz = np.asarray(fluxes[3])
    want_z = np.stack([fz[:, :, g], fz[:, :, g + nzi]], axis=-1)
    rel = max(rel, _rel(np.asarray(faces[3])[:, :, g:-g, g:-g],
                        want_z[:, :, g:-g, g:-g]))
    return rel


def _stage_faces_on(gh, recon, riemann):
    """stage+faces vs the XLA path on a given ghosted mesh — used for
    both the generic SMR-layout check and the realistic AMR block
    sizes (16^3 g=2 plm / 32^3 g=3 ppm — VERDICT r3 weak item 7: the
    bench-geometry validation never covered the block sizes the AMR
    decks actually run, blast_3d_amr.in uses 8-32^3 blocks)."""
    g = gh.nghost
    cfg = HydroConfig(fluid="euler", riemann=riemann,
                      reconstruction=recon, integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(gh, cfg, eos)
    u0 = jax.jit(pkg.apply_boundaries)(mk_state(gh, cfg, eos))
    u1 = u0 * jnp.float32(1.02)
    gam0, gam1, bdt = (jnp.float32(v) for v in (0.3, 0.7, 2e-3))
    c_h = jnp.float32(0.0)
    u0f, prim = jax.jit(pkg._cons_to_prim)(u0)
    fluxes = jax.jit(
        lambda p, c: pkg._compute_fluxes(p, c, recon))(prim, c_h)
    nd_ref = -np.asarray(jax.jit(pkg._flux_divergence)(fluxes))
    u_ref = np.asarray(gam0 * u0f + gam1 * u1) + float(bdt) * nd_ref
    fn = ps.make_fused_stage_faces(
        gh.block_shape, (gh.dx1, gh.dx2, gh.dx3), cfg, eos,
        pkg._positivity_mask, recon, g, tz=8, ty=8, interpret=INTERPRET,
        emit_prim=True)
    u_new, prim_k, faces = jax.jit(
        lambda a, b: fn(a, b, gam0, gam1, bdt, c_h))(u0, u1)
    sl = (slice(None), slice(None), slice(g, -g), slice(g, -g),
          slice(g, -g))
    rel = _rel(np.asarray(u_new), u_ref, sl)
    rel = max(rel, _rel(np.asarray(prim_k), np.asarray(prim), sl))
    for d, hi in ((1, gh.mbnx1), (2, gh.mbnx2), (3, gh.mbnx3)):
        F = np.asarray(fluxes[d])
        idx_lo = [slice(None)] * 5
        idx_lo[5 - d] = g          # array axes: [nb, nvar, z, y, x]
        idx_hi = [slice(None)] * 5
        idx_hi[5 - d] = g + hi
        want = np.stack([F[tuple(idx_lo)], F[tuple(idx_hi)]], axis=-1)
        rel = max(rel, _rel(np.asarray(faces[d])[:, :, g:-g, g:-g],
                            want[:, :, g:-g, g:-g]))
    return rel


@check("stage+faces AMR block 16^3 (g=2, plm)")
def _stage_faces_mb16():
    gh = Mesh(nx1=32, nx2=32, nx3=16, mbnx1=16, mbnx2=16, mbnx3=16,
              x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
              nghost=2)
    return _stage_faces_on(gh, "plm", "hlle")


@check("stage+faces AMR block 32^3 (g=3, ppm)")
def _stage_faces_mb32():
    gh = Mesh(nx1=64, nx2=32, nx3=32, mbnx1=32, mbnx2=32, mbnx3=32,
              x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
              nghost=3)
    return _stage_faces_on(gh, "ppm", "hllc")


@check("stage+faces kernel (SMR layout)")
def _stage_faces():
    _, gh, _ = meshes()
    g = gh.nghost
    cfg = HydroConfig(fluid="euler", riemann="hllc",
                      reconstruction="ppm", integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(gh, cfg, eos)
    u0 = jax.jit(pkg.apply_boundaries)(mk_state(gh, cfg, eos))
    u1 = u0 * jnp.float32(1.02)
    gam0, gam1, bdt = (jnp.float32(v) for v in (0.3, 0.7, 2e-3))
    c_h = jnp.float32(0.0)
    u0f, prim = jax.jit(pkg._cons_to_prim)(u0)
    fluxes = jax.jit(
        lambda p, c: pkg._compute_fluxes(p, c, "ppm"))(prim, c_h)
    nd_ref = -np.asarray(jax.jit(pkg._flux_divergence)(fluxes))
    u_ref = np.asarray(gam0 * u0f + gam1 * u1) + float(bdt) * nd_ref
    fn = ps.make_fused_stage_faces(
        gh.block_shape, (gh.dx1, gh.dx2, gh.dx3), cfg, eos,
        pkg._positivity_mask, "ppm", g, tz=8, ty=8, interpret=INTERPRET,
        emit_prim=True)
    u_new, prim_k, faces = jax.jit(
        lambda a, b: fn(a, b, gam0, gam1, bdt, c_h))(u0, u1)
    sl = (slice(None), slice(None), slice(g, -g), slice(g, -g),
          slice(g, -g))
    rel = _rel(np.asarray(u_new), u_ref, sl)
    rel = max(rel, _rel(np.asarray(prim_k), np.asarray(prim), sl))
    fx = np.asarray(fluxes[1])
    want_x = np.stack([fx[..., g], fx[..., g + gh.mbnx1]], axis=-1)
    rel = max(rel, _rel(np.asarray(faces[1])[:, :, g:-g, g:-g],
                        want_x[:, :, g:-g, g:-g]))
    fy = np.asarray(fluxes[2])
    want_y = np.stack([fy[:, :, :, g], fy[:, :, :, g + gh.mbnx2]],
                      axis=-1)
    rel = max(rel, _rel(np.asarray(faces[2])[:, :, g:-g, g:-g],
                        want_y[:, :, g:-g, g:-g]))
    fz = np.asarray(fluxes[3])
    want_z = np.stack([fz[:, :, g], fz[:, :, g + gh.mbnx3]], axis=-1)
    rel = max(rel, _rel(np.asarray(faces[3])[:, :, g:-g, g:-g],
                        want_z[:, :, g:-g, g:-g]))
    return rel


@check("stage+faces lane-packed vs unpacked (bench mb=32 g=2)")
def _stage_faces_pack_ab():
    """Bitwise A/B of the r4 lane-packed stage+faces kernel against
    ATHENAPK_PALLAS_PACK=0 at the AMR bench block geometry (interiors
    and face slabs must match exactly: packing is pure data movement
    around the unchanged kernel math)."""
    gh = Mesh(nx1=64, nx2=32, nx3=32, mbnx1=32, mbnx2=32, mbnx3=32,
              x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
              nghost=2)
    g = gh.nghost
    cfg = HydroConfig(fluid="euler", riemann="hlle",
                      reconstruction="plm", integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(gh, cfg, eos)
    u0 = jax.jit(pkg.apply_boundaries)(mk_state(gh, cfg, eos))
    u1 = u0 * jnp.float32(1.02)
    gam0, gam1, bdt = (jnp.float32(v) for v in (0.3, 0.7, 2e-3))
    c_h = jnp.float32(0.0)

    def run():
        fn = ps.make_fused_stage_faces(
            gh.block_shape, (gh.dx1, gh.dx2, gh.dx3), cfg, eos,
            pkg._positivity_mask, "plm", g, tz=8, ty=8,
            interpret=INTERPRET, emit_prim=True)
        return jax.jit(lambda a, b: fn(a, b, gam0, gam1, bdt, c_h))(
            u0, u1)

    u_p, prim_p, faces_p = run()
    os.environ["ATHENAPK_PALLAS_PACK"] = "0"
    try:
        u_u, prim_u, faces_u = run()
    finally:
        os.environ.pop("ATHENAPK_PALLAS_PACK", None)
    sl = (slice(None), slice(None), slice(g, -g), slice(g, -g),
          slice(g, -g))
    rel = _rel(np.asarray(u_p), np.asarray(u_u), sl)
    rel = max(rel, _rel(np.asarray(prim_p), np.asarray(prim_u), sl))
    for d in (1, 2, 3):
        rel = max(rel, _rel(np.asarray(faces_p[d])[:, :, g:-g, g:-g],
                            np.asarray(faces_u[d])[:, :, g:-g, g:-g]))
    return rel


@check("stage kernel ghost-free (glmmhd)")
def _stage_gf():
    gf, _, _ = meshes()
    cfg = HydroConfig(fluid="glmmhd", riemann="hlld",
                      reconstruction="ppm", integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(gf, cfg, eos)
    u0 = mk_state(gf, cfg, eos)
    u1 = u0 * jnp.float32(1.01)
    c_h = jnp.float32(1.3)
    gam0, gam1, bdt = (jnp.float32(v) for v in (0.25, 0.75, 1e-3))

    def xla(u0, u1):
        u0f, prim = pkg._cons_to_prim(u0)
        div = pkg._flux_divergence(pkg._compute_fluxes(prim, c_h, "ppm"))
        return gam0 * u0f + gam1 * u1 - bdt * div

    ref = np.asarray(jax.jit(xla)(u0, u1))
    st = ps.make_fused_stage(gf, cfg, eos, pkg._positivity_mask,
                             "ppm", tz=8, ty=8, interpret=INTERPRET)
    got = np.asarray(jax.jit(st)(u0, u1, gam0, gam1, bdt, c_h))
    return _rel(got, ref)


@check("full step stage path (ghosted)")
def _stage_step():
    _, gh, _ = meshes()
    cfg = HydroConfig(fluid="euler", riemann="hllc",
                      reconstruction="ppm", integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    u0 = mk_state(gh, cfg, eos)
    dt, c_h = jnp.float32(1e-4), jnp.float32(0.0)
    os.environ.pop("ATHENAPK_PALLAS_SWEEP", None)
    pkg_ref = HydroPackage(gh, cfg, eos)
    u0 = jax.jit(pkg_ref.apply_boundaries)(u0)
    ref = np.asarray(jax.jit(pkg_ref._step)(u0, dt, c_h))
    os.environ["ATHENAPK_PALLAS_SWEEP"] = "1"
    os.environ["ATHENAPK_PALLAS_STAGE"] = "1"   # opt-in since r3
    try:
        pkg_f = HydroPackage(gh, cfg, eos)
        assert pkg_f._use_fused_stage(jnp.float32)
        got = np.asarray(jax.jit(pkg_f._step)(u0, dt, c_h))
    finally:
        os.environ.pop("ATHENAPK_PALLAS_SWEEP", None)
        os.environ.pop("ATHENAPK_PALLAS_STAGE", None)
    return _rel(got, ref)


@check("step_with_dt fused-dt path")
def _stage_dt():
    gf, _, _ = meshes()
    cfg = HydroConfig(fluid="glmmhd", riemann="hlld",
                      reconstruction="ppm", integrator="vl2", max_dt=0.5)
    eos = EOS(gamma=5.0 / 3.0)
    u = mk_state(gf, cfg, eos)
    dt, c_h = jnp.float32(1e-4), jnp.float32(1.2)
    os.environ.pop("ATHENAPK_PALLAS_SWEEP", None)
    u_ref, dts_ref = HydroPackage(gf, cfg, eos).step_with_dt(
        u, dt, c_h, 0.0)
    os.environ["ATHENAPK_PALLAS_SWEEP"] = "1"
    os.environ["ATHENAPK_PALLAS_STAGE"] = "1"   # opt-in since r3
    try:
        pkg_f = HydroPackage(gf, cfg, eos)
        assert pkg_f._use_fused_stage_dt(jnp.float32)
        u_f, dts_f = pkg_f.step_with_dt(u, dt, c_h, 0.0)
    finally:
        os.environ.pop("ATHENAPK_PALLAS_SWEEP", None)
        os.environ.pop("ATHENAPK_PALLAS_STAGE", None)
    rel = float(jnp.abs(u_f - u_ref).max() / jnp.abs(u_ref).max())
    ddt = abs(float(dts_f[0]) - float(dts_ref[0]))
    return max(rel, ddt)


def main():
    log(f"device: {jax.devices()[0].platform} "
        f"({len(jax.devices())} visible)")
    tol = 1e-2  # loose: branch-point flips under FMA contraction; the
    #             CPU suite gates exact semantics, this gates lowering
    failures = 0
    for name, fn in CHECKS:
        t0 = time.time()
        try:
            rel = fn()
            ok = rel < tol
            log(f"{'PASS' if ok else 'FAIL'} {name}: rel={rel:.2e} "
                f"({time.time() - t0:.1f}s)")
            failures += 0 if ok else 1
        except Exception as e:  # noqa: BLE001
            log(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]} "
                f"({time.time() - t0:.1f}s)")
            failures += 1
    log(f"{len(CHECKS) - failures}/{len(CHECKS)} kernels validated")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
