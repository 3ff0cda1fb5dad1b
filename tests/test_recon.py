import jax.numpy as jnp
import numpy as np
import pytest

from athenapk_tpu.recon import RECONSTRUCTIONS, reconstruct

SCHEMES = list(RECONSTRUCTIONS)


def _field(n=32):
    rng = np.random.default_rng(42)
    q = rng.uniform(1.0, 2.0, size=(1, 2, 1, 1, n))
    return jnp.asarray(q)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_constant_preservation(scheme):
    q = jnp.full((1, 1, 1, 1, 16), 2.5)
    mask = jnp.zeros((1,), dtype=bool)
    qm, qp = reconstruct(scheme, q, -1, 0.1, positivity_mask=mask)
    np.testing.assert_allclose(np.asarray(qm), 2.5, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(qp), 2.5, rtol=1e-13)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_monotone_bounds(scheme):
    """Limited schemes should not produce wild over/undershoots on random
    monotone-ish data; edge values stay within global min/max (interior)."""
    q = _field()
    mask = jnp.zeros((2,), dtype=bool)
    qm, qp = reconstruct(scheme, q, -1, 1.0 / 32, positivity_mask=mask)
    interior = slice(3, -3)
    lo, hi = float(q.min()), float(q.max())
    # WENO schemes can overshoot slightly; allow small tolerance
    tol = 0.3 * (hi - lo) if scheme in ("weno3", "wenoz") else 1e-10
    assert float(qm[..., interior].min()) >= lo - tol
    assert float(qp[..., interior].max()) <= hi + tol


@pytest.mark.parametrize("scheme", ["plm", "ppm", "weno3", "limo3", "wenoz"])
def test_linear_exactness(scheme):
    """All >=2nd-order schemes reconstruct a linear profile exactly
    (away from boundaries where the rolled stencil wraps)."""
    n = 32
    dx = 1.0 / n
    x = (np.arange(n) + 0.5) * dx
    q = jnp.asarray((2.0 + 3.0 * x).reshape(1, 1, 1, 1, n))
    mask = jnp.zeros((1,), dtype=bool)
    qm, qp = reconstruct(scheme, q, -1, dx, positivity_mask=mask)
    xm = x - dx / 2
    xp = x + dx / 2
    sl = slice(3, -3)
    np.testing.assert_allclose(np.asarray(qm)[0, 0, 0, 0, sl],
                               (2.0 + 3.0 * xm)[sl], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(qp)[0, 0, 0, 0, sl],
                               (2.0 + 3.0 * xp)[sl], rtol=1e-10)
