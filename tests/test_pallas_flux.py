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
