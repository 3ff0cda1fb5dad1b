"""Pallas fused flux kernel vs the XLA whole-array path (interpret mode on
CPU; the TPU build runs the same kernel compiled by Mosaic)."""

import numpy as np
import jax.numpy as jnp
import pytest

from athenapk_tpu.core.mesh import Mesh
from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons
from athenapk_tpu.solver.hydro_pkg import HydroConfig, HydroPackage
from athenapk_tpu.solver.pallas_flux import make_fused_divflux


@pytest.mark.parametrize("fluid,riemann,recon,nghost", [
    ("glmmhd", "hlld", "ppm", 3),
    ("euler", "hllc", "plm", 2),
])
def test_fused_divflux_matches_xla(fluid, riemann, recon, nghost):
    mesh = Mesh(nx1=16, nx2=16, nx3=16, mbnx1=16, mbnx2=16, mbnx3=16,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=nghost)
    cfg = HydroConfig(fluid=fluid, riemann=riemann, reconstruction=recon)
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(mesh, cfg, eos)
    rng = np.random.default_rng(0)
    nvar = cfg.nvar
    w = np.ones((1, nvar) + mesh.block_shape)
    w[:, 0] = 1.0 + 0.1 * rng.random(w[:, 0].shape)
    w[:, 1:4] = 0.1 * rng.standard_normal(w[:, 1:4].shape)
    w[:, 4] = 0.5 + 0.1 * rng.random(w[:, 4].shape)
    if fluid == "glmmhd":
        w[:, 5:8] = 0.2 * rng.standard_normal(w[:, 5:8].shape)
    u = jnp.asarray(np.asarray(prim_to_cons(eos, w, fluid)))
    u = pkg.apply_boundaries(u)
    _, prim = pkg.cons_to_prim(u)
    c_h = jnp.asarray(1.0)

    div_ref = -pkg._flux_divergence(pkg._compute_fluxes(prim, c_h, recon))
    fused = make_fused_divflux(mesh, cfg, eos, pkg._positivity_mask,
                               tz=4, interpret=True)
    div_pl = fused(prim, c_h)

    g3 = mesh.ng3
    ks, ke, js, je, is_, ie = mesh.interior
    r = np.asarray(div_ref)[:, :, g3:g3 + 16, js:je + 1, is_:ie + 1]
    g = np.asarray(div_pl)[:, :, :, js:je + 1, is_:ie + 1]
    err = np.abs(r - g).max() / (np.abs(r).max() + 1e-30)
    assert err < 1e-12, f"fused/XLA mismatch {err:.2e}"


def test_lane_sweep_matches_xla():
    """Per-direction lane-sweep fused kernel (pallas_sweep) matches the
    XLA whole-array path on the ghost-free periodic layout (interpret
    mode; on-device enablement is the ATHENAPK_PALLAS_SWEEP bench knob).

    Tolerance note: HLLD/limiter branch points may flip under f32 FMA
    contraction inside the kernel jit — both branches are valid at the
    degeneracy — so comparison is at a loose relative tolerance on a
    generic (all-velocities-nonzero) state."""
    import numpy as np
    import jax.numpy as jnp
    from athenapk_tpu.core.mesh import Mesh
    from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons
    from athenapk_tpu.solver.hydro_pkg import HydroConfig, HydroPackage
    from athenapk_tpu.solver.pallas_sweep import make_fused_negdiv

    n = 16
    mesh = Mesh(nx1=n, nx2=n, nx3=n, mbnx1=n, mbnx2=n, mbnx3=n,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=0)
    cfg = HydroConfig(fluid="glmmhd", riemann="hlld",
                      reconstruction="ppm", integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(mesh, cfg, eos)
    x, y, z = mesh.cell_centers_mesh()
    w = np.zeros((1, cfg.nvar, n, n, n))
    w[:, 0] = 1.0 + 0.1 * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y) \
        * np.ones_like(z)
    w[:, 1] = 0.3 + 0.2 * np.sin(2 * np.pi * z)
    w[:, 2] = 0.2 + 0.1 * np.cos(2 * np.pi * x) * np.ones_like(y + z)
    w[:, 3] = -0.15 + 0.1 * np.sin(2 * np.pi * y) * np.ones_like(x + z)
    w[:, 4] = 0.6
    w[:, 5] = 1.0
    w[:, 6] = 0.5
    w[:, 7] = 0.1
    u = jnp.asarray(np.asarray(prim_to_cons(eos, jnp.asarray(w),
                                            "glmmhd")), jnp.float32)
    _, prim = pkg._cons_to_prim(u)
    c_h = jnp.asarray(1.3, jnp.float32)

    ref = -np.asarray(pkg._flux_divergence(
        pkg._compute_fluxes(prim, c_h, "ppm")))
    fused = make_fused_negdiv(mesh, cfg, eos, pkg._positivity_mask,
                              "ppm", tz=1, ty=8, interpret=True)
    got = np.asarray(fused(prim, c_h))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 3e-3, f"fused sweep deviates: rel={rel:.2e}"


def test_lane_sweep_ghosted_matches_xla():
    """Fused sweep on the GHOSTED multi-block layout: the per-block
    cyclic roll semantics (wrap garbage in the ghost rim) are identical
    to the XLA path, so interiors must agree."""
    import numpy as np
    import jax.numpy as jnp
    from athenapk_tpu.core.mesh import Mesh
    from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons
    from athenapk_tpu.solver.hydro_pkg import HydroConfig, HydroPackage
    from athenapk_tpu.solver.pallas_sweep import make_fused_negdiv

    n, mb, g = 16, 8, 3
    mesh = Mesh(nx1=n, nx2=n, nx3=n, mbnx1=mb, mbnx2=mb, mbnx3=mb,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=g)
    cfg = HydroConfig(fluid="glmmhd", riemann="hlld",
                      reconstruction="ppm", integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    pkg = HydroPackage(mesh, cfg, eos)
    x, y, z = mesh.cell_centers_mesh()
    w = np.zeros((mesh.nblocks, cfg.nvar) + mesh.block_shape)
    w[:, 0] = 1.0 + 0.1 * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y) \
        * np.ones_like(z)
    w[:, 1] = 0.3 + 0.2 * np.sin(2 * np.pi * z) * np.ones_like(x + y)
    w[:, 2] = 0.2 + 0.1 * np.cos(2 * np.pi * x) * np.ones_like(y + z)
    w[:, 3] = -0.15 + 0.1 * np.sin(2 * np.pi * y) * np.ones_like(x + z)
    w[:, 4] = 0.6
    w[:, 5] = 1.0
    w[:, 6] = 0.5
    w[:, 7] = 0.1
    u = jnp.asarray(np.asarray(prim_to_cons(eos, jnp.asarray(w),
                                            "glmmhd")), jnp.float32)
    u = pkg.apply_boundaries(u)
    _, prim = pkg._cons_to_prim(u)
    c_h = jnp.asarray(1.3, jnp.float32)

    ref = -np.asarray(pkg._flux_divergence(
        pkg._compute_fluxes(prim, c_h, "ppm")))
    fused = make_fused_negdiv(mesh, cfg, eos, pkg._positivity_mask,
                              "ppm", tz=1, ty=8, interpret=True)
    got = np.asarray(fused(prim, c_h))
    sl = (slice(None), slice(None), slice(g, -g), slice(g, -g),
          slice(g, -g))
    rel = np.abs(got[sl] - ref[sl]).max() / np.abs(ref[sl]).max()
    assert rel < 3e-3, f"ghosted fused sweep deviates: rel={rel:.2e}"


def test_full_step_fused_matches_xla(monkeypatch):
    """A full VL2 step with ATHENAPK_PALLAS_SWEEP=1 (interpret mode on
    CPU) matches the XLA step on interiors — the end-to-end contract of
    the _stage_update fused branch."""
    import numpy as np
    import jax.numpy as jnp
    from athenapk_tpu.core.mesh import Mesh
    from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons
    from athenapk_tpu.solver.hydro_pkg import HydroConfig, HydroPackage

    n = 16
    mesh = Mesh(nx1=n, nx2=n, nx3=n, mbnx1=n, mbnx2=n, mbnx3=n,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=0)
    cfg = HydroConfig(fluid="glmmhd", riemann="hlld",
                      reconstruction="ppm", integrator="vl2")
    eos = EOS(gamma=5.0 / 3.0)
    x, y, z = mesh.cell_centers_mesh()
    w = np.zeros((1, cfg.nvar, n, n, n))
    w[:, 0] = 1.0 + 0.05 * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y) \
        * np.ones_like(z)
    w[:, 1] = 0.3 + 0.1 * np.sin(2 * np.pi * z) * np.ones_like(x + y)
    w[:, 2] = 0.2
    w[:, 3] = -0.1
    w[:, 4] = 0.6
    w[:, 5] = 1.0
    w[:, 6] = 0.5
    w[:, 7] = 0.1
    u0 = jnp.asarray(np.asarray(prim_to_cons(eos, jnp.asarray(w),
                                             "glmmhd")), jnp.float32)
    dt, c_h = 1e-3, 1.3

    monkeypatch.delenv("ATHENAPK_PALLAS_SWEEP", raising=False)
    ref = np.asarray(HydroPackage(mesh, cfg, eos)._step(
        u0, jnp.float32(dt), jnp.float32(c_h)))

    monkeypatch.setenv("ATHENAPK_PALLAS_SWEEP", "1")
    monkeypatch.setenv("ATHENAPK_PALLAS_TY", "8")
    got = np.asarray(HydroPackage(mesh, cfg, eos)._step(
        u0, jnp.float32(dt), jnp.float32(c_h)))

    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 1e-5, f"fused full step deviates: rel={rel:.2e}"
