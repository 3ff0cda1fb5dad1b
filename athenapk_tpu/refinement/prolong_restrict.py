"""Prolongation / restriction operators for coarse<->fine block transfers
(reference ``src/hydro/prolongation/custom_ops.hpp:49-190`` and Parthenon's
``RestrictAverage``).

* ``restrict_average``: fine -> coarse by averaging 2^d children.
* ``prolongate_minmod``: coarse -> fine with minmod-limited linear
  slopes (Stone et al. 2020 eq 5) plus the reference's multi-D
  simultaneous limiter (``custom_ops.hpp:120-158``, AMReX-style): all
  per-dimension slopes are scaled by ONE factor
  ``alpha = min(1, (qmax - fc)/dqmax, (fc - qmin)/dqmax)`` where
  ``dqmax = sum_d |s_d|/4`` is the largest possible fine-cell offset
  and qmin/qmax run over the 3^d coarse neighborhood — so no fine
  value can leave the local coarse bounds even when several dimensions'
  slopes add up (per-dimension minmod alone guarantees this only in
  1-D).

These operate on whole arrays [..., nz, ny, nx]; the AMR machinery
(level-grouped block tables, remeshing, coarse-fine flux correction)
builds on them.
"""

from __future__ import annotations

import itertools

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
    minmod-limited linear reconstruction and the multi-D simultaneous
    alpha limiter (``custom_ops.hpp:120-158``).

    On a uniform grid the coarse-to-fine-center distances are dx/4 in
    every direction, so each fine corner value is
    ``fc + sum_d (+-alpha*s_d/4)`` with the offset sum grouped before
    the add (the reference's FP-symmetry grouping,
    ``custom_ops.hpp:160-184``).  Slope/neighborhood lookups use cyclic
    rolls — callers prolong ghosted arrays, so wrap contamination lands
    outside the region they keep (same contract as the sweep kernels).
    """
    axes = [-1, -2, -3][:dims]
    # per-dimension minmod slopes on the coarse grid
    slopes = {ax: _minmod(jnp.roll(q, -1, ax) - q, q - jnp.roll(q, 1, ax))
              for ax in axes}
    contrib = {ax: slopes[ax] / 4.0 for ax in axes}
    if dims > 1:
        # largest possible |fine - fc| if every slope pushes one way
        dqmax = sum(jnp.abs(c) for c in contrib.values())
        # min/max over the 3^d coarse neighborhood: the box reduce is
        # separable into sequential per-axis reduces of (roll+1, self,
        # roll-1)
        qmin = q
        qmax = q
        for ax in axes:
            qmin = jnp.minimum(jnp.minimum(jnp.roll(qmin, -1, ax), qmin),
                               jnp.roll(qmin, 1, ax))
            qmax = jnp.maximum(jnp.maximum(jnp.roll(qmax, -1, ax), qmax),
                               jnp.roll(qmax, 1, ax))
        # one scaling factor limits all slopes simultaneously; dqmax=0
        # (flat) keeps alpha=1 (the where guards the 0/0)
        safe = jnp.where(dqmax > 0.0, dqmax, 1.0)
        alpha = jnp.minimum(
            1.0, jnp.minimum((qmax - q) / safe, (q - qmin) / safe))
        contrib = {ax: alpha * c for ax, c in contrib.items()}
    # corner values on the coarse grid: fc + grouped signed offset sum
    corners = {}
    for signs in itertools.product((-1, 1), repeat=dims):
        off = None
        for s, ax in zip(signs, axes):
            t = contrib[ax] if s > 0 else -contrib[ax]
            off = t if off is None else off + t
        corners[signs] = q + off
    # assemble the fine array by interleaving one axis at a time
    for pos, ax in enumerate(axes):
        nxt = {}
        for key in corners:
            if key[pos] != -1:
                continue
            hi_key = key[:pos] + (1,) + key[pos + 1:]
            rest = key[:pos] + (0,) + key[pos + 1:]
            nxt[rest] = _interleave(corners[key], corners[hi_key], ax)
        corners = nxt
    return corners[(0,) * dims]
