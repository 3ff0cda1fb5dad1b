"""Prolongation / restriction operators for coarse<->fine block transfers
(reference ``src/hydro/prolongation/custom_ops.hpp:49-190`` and Parthenon's
``RestrictAverage``).

* ``restrict_average``: fine -> coarse by averaging 2^d children.
* ``prolongate_minmod``: coarse -> fine with per-dimension minmod-limited
  linear slopes (Stone et al. 2020 eq 5); fine values are
  coarse -+ slope/4 per active dimension, which keeps them within the
  coarse neighborhood bounds by construction of minmod.

These operate on whole arrays [..., nz, ny, nx]; the AMR machinery
(level-grouped block tables, remeshing, coarse-fine flux correction)
builds on them.
"""

from __future__ import annotations

import jax.numpy as jnp


def _minmod(a, b):
    return jnp.where(a * b > 0.0,
                     jnp.where(jnp.abs(a) < jnp.abs(b), a, b), 0.0)


def _interleave(lo, hi, ax):
    """Interleave along axis (negative ax): [lo0, hi0, lo1, hi1, ...]."""
    pair_ax = lo.ndim + ax + 1  # position just after ax (ax is negative)
    stacked = jnp.stack([lo, hi], axis=pair_ax)
    shape = list(lo.shape)
    shape[ax] = shape[ax] * 2
    return stacked.reshape(shape)


def restrict_average(q, dims=3):
    """[..., 2nz, 2ny, 2nx] -> [..., nz, ny, nx] (or fewer active dims).

    Pair averages via reshape+sum rather than strided slices: this jax
    version lowers strided basic indexing to HLO gather, which the TPU
    backend can serialize; the reshape form stays pure
    reshape/reduce (bitwise-identical arithmetic: 0.5*(a+b))."""
    for k in range(1, dims + 1):
        ax = q.ndim - k          # x, then y, then z
        n = q.shape[ax]
        shape = q.shape[:ax] + (n // 2, 2) + q.shape[ax + 1:]
        q = 0.5 * jnp.sum(q.reshape(shape), axis=ax + 1)
    return q


def prolongate_minmod(q, dims=3):
    """[..., nz, ny, nx] -> doubled along each active dim with
    minmod-limited linear reconstruction."""
    axes = [-1, -2, -3][:dims]
    # compute all slopes on the coarse grid first
    slopes = {ax: _minmod(jnp.roll(q, -1, ax) - q, q - jnp.roll(q, 1, ax))
              for ax in axes}
    out = q
    expanded = []
    for ax in axes:
        s = slopes[ax]
        # expand the slope along previously-expanded axes (piecewise const)
        for prev in expanded:
            s = _interleave(s, s, prev)
        out = _interleave(out - s / 4.0, out + s / 4.0, ax)
        expanded.append(ax)
    return out
