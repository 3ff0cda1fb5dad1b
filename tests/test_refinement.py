"""Refinement operators + tagging criteria."""

import numpy as np
import jax.numpy as jnp

from athenapk_tpu.refinement import (restrict_average, prolongate_minmod,
                                     check_refinement, RefinementConfig)


def test_restrict_prolong_roundtrip_constant():
    q = jnp.full((2, 8, 8, 8), 3.25)
    fine = prolongate_minmod(q, dims=3)
    assert fine.shape == (2, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(fine), 3.25)
    coarse = restrict_average(fine, dims=3)
    np.testing.assert_allclose(np.asarray(coarse), 3.25, rtol=1e-15)


def test_prolong_linear_exact_interior():
    """Linear profiles are reconstructed exactly (2nd-order prolongation)."""
    n = 8
    x = (np.arange(n) + 0.5) / n
    q = jnp.asarray(np.broadcast_to(2.0 + 3.0 * x, (1, n, n, n)))
    fine = prolongate_minmod(q, dims=3)
    xf = (np.arange(2 * n) + 0.5) / (2 * n)
    expect = 2.0 + 3.0 * xf
    got = np.asarray(fine)[0, 5, 5, 2:-2]
    np.testing.assert_allclose(got, expect[2:-2], rtol=1e-12)


def test_restriction_conserves():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((3, 8, 8, 8)))
    coarse = restrict_average(q, dims=3)
    np.testing.assert_allclose(float(coarse.mean()), float(q.mean()),
                               rtol=1e-14)


def test_prolong_conserves():
    """Cell-average-preserving: restrict(prolong(q)) == q."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.random((2, 8, 8, 8)))
    back = restrict_average(prolongate_minmod(q, dims=3), dims=3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(q), atol=1e-14)


def test_maxdensity_tagging():
    from athenapk_tpu.core.mesh import Mesh
    mesh = Mesh(nx1=16, nx2=16, nx3=1, mbnx1=8, mbnx2=8, mbnx3=1,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1)
    prim = np.ones((4, 5, 1, mesh.NY, mesh.NX))
    prim[2, 0] = 5.0  # block 2 dense
    prim[3, 0] = 0.01  # block 3 empty
    cfg = RefinementConfig(method="maxdensity",
                           maxdensity_refine_above=2.0,
                           maxdensity_deref_below=0.1)
    tags = np.asarray(check_refinement(cfg, jnp.asarray(prim), mesh))
    assert tags.tolist() == [0, 0, 1, -1]
