"""Reconstruction schemes, vectorized over whole block-batched arrays.

Each scheme maps cell averages ``q`` to per-cell left/right edge values
``(qm, qp)`` along one axis:

* ``qm[i]`` = value at the left face of cell i  (the reference's ``qr_i``)
* ``qp[i]`` = value at the right face of cell i (the reference's ``ql_ip1``)

so the Riemann state at face i+1/2 is ``L = qp[i]``, ``R = qm[i+1]``.

This is the TPU-native re-design of the reference's per-pencil scratch-pad
kernels (``src/recon/*_simple.hpp``): instead of team-scratch line buffers
we compute full shifted-array expressions that XLA fuses into a single
VPU-bound elementwise pass per direction.

Schemes (algorithm provenance, matching the reference's method choices):
  dc     — donor cell (piecewise constant), ``src/recon/dc_simple.hpp``
  plm    — piecewise linear, van-Leer harmonic-mean limiter,
           ``src/recon/plm_simple.hpp:20-70``
  ppm    — piecewise parabolic with Colella–Sekora 2008 extrema-preserving
           limiter (McCorquodale–Colella variant), ``src/recon/ppm_simple.hpp``
  weno3  — 3rd-order ESWENO (Yamaleev–Carpenter 2009) with PLUTO-style
           eps = dx^2, ``src/recon/weno3_simple.hpp``
  limo3  — Cada–Torrilhon 2009 third-order limiter function,
           ``src/recon/limo3_simple.hpp``
  wenoz  — 5th-order WENO-Z+ (Borges 2008 / Acker 2016),
           ``src/recon/wenoz_simple.hpp``

All operate on uniform grids only (as the reference).  Shifts use jnp.roll;
wrapped values only ever land outside the valid face range (ghost zones
guarantee the interior stencils are correct), so they never affect results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.indices import IDN, IPR


def _sh(q, n, axis):
    """shifted view: _sh(q, n)[i] == q[i+n]."""
    return jnp.roll(q, -n, axis=axis)


# --------------------------------------------------------------------------- dc
def dc(q, axis, dx):
    return q, q


# -------------------------------------------------------------------------- plm
def plm(q, axis, dx):
    qm1 = _sh(q, -1, axis)
    qp1 = _sh(q, +1, axis)
    dql = q - qm1
    dqr = qp1 - q
    dq2 = dql * dqr
    denom = jnp.where(dq2 > 0.0, dql + dqr, 1.0)
    dqm = jnp.where(dq2 > 0.0, dq2 / denom, 0.0)
    return q - dqm, q + dqm


# -------------------------------------------------------------------------- ppm
def ppm(q, axis, dx):
    """PPM with CS08 smooth-extrema-preserving limiter (uniform grid).

    Vectorized form of the pointwise algorithm in
    ``src/recon/ppm_simple.hpp:38-164``; see CW84 eq 1.6, CD11 eqs 84-85,
    CS08 eqs 22-25, MC11 eq 27.
    """
    C2 = 1.25
    qm2 = _sh(q, -2, axis)
    qm1 = _sh(q, -1, axis)
    qp1 = _sh(q, +1, axis)
    qp2 = _sh(q, +2, axis)

    # sign with sgn(0)=+1 (C++ SIGN/copysign semantics); avoids
    # bitcast-based copysign which the TPU x64 rewriter can't handle
    sgn = lambda x: jnp.where(x >= 0.0, 1.0, -1.0)

    qa0 = q - qm1
    qb0 = qp1 - q
    dd_im1 = 0.5 * qa0 + 0.5 * (qm1 - qm2)
    dd = 0.5 * qb0 + 0.5 * qa0
    dd_ip1 = 0.5 * (qp2 - qp1) + 0.5 * qb0

    # interface averages (CW eq 1.6)
    dph = 0.5 * (qm1 + q) + (dd_im1 - dd) / 6.0
    dph_ip1 = 0.5 * (q + qp1) + (dd - dd_ip1) / 6.0

    d2qc_im1 = qm2 + q - 2.0 * qm1
    d2qc = qm1 + qp1 - 2.0 * q
    d2qc_ip1 = q + qp2 - 2.0 * qp1

    # limit i-1/2 face value at local extrema (CD 4.3.1)
    qa_t = dph - qm1
    qb_t = q - dph
    qa = 3.0 * (qm1 + q - 2.0 * dph)
    qb = d2qc_im1
    qc = d2qc
    same = (sgn(qa) == sgn(qb)) & (sgn(qa) == sgn(qc))
    qd = jnp.where(
        same,
        sgn(qa) * jnp.minimum(C2 * jnp.abs(qb),
                              jnp.minimum(C2 * jnp.abs(qc), jnp.abs(qa))),
        0.0)
    dph = jnp.where(qa_t * qb_t < 0.0, 0.5 * (qm1 + q) - qd / 6.0, dph)

    # limit i+1/2 face value
    qa_t = dph_ip1 - q
    qb_t = qp1 - dph_ip1
    qa = 3.0 * (q + qp1 - 2.0 * dph_ip1)
    qb = d2qc
    qc = d2qc_ip1
    same = (sgn(qa) == sgn(qb)) & (sgn(qa) == sgn(qc))
    qd = jnp.where(
        same,
        sgn(qa) * jnp.minimum(C2 * jnp.abs(qb),
                              jnp.minimum(C2 * jnp.abs(qc), jnp.abs(qa))),
        0.0)
    dph_ip1 = jnp.where(qa_t * qb_t < 0.0, 0.5 * (q + qp1) - qd / 6.0, dph_ip1)

    d2qf = 6.0 * (dph + dph_ip1 - 2.0 * q)

    qm = dph        # left edge candidate
    qp = dph_ip1    # right edge candidate

    dqf_minus = q - qm      # (CS eq 25)
    dqf_plus = qp - q

    extrema = (dqf_minus * dqf_plus <= 0.0) | ((qp1 - q) * (q - qm1) <= 0.0)

    qa = d2qc_im1
    qb = d2qc
    qc = d2qc_ip1
    qd = d2qf
    same = (sgn(qa) == sgn(qb)) & (sgn(qa) == sgn(qc)) & (sgn(qa) == sgn(qd))
    qe = jnp.where(
        same,
        sgn(qd) * jnp.minimum(jnp.minimum(C2 * jnp.abs(qa), C2 * jnp.abs(qb)),
                              jnp.minimum(C2 * jnp.abs(qc), jnp.abs(qd))),
        0.0)  # (CS eq 22)

    # roundoff guard for the limited second-derivative ratio (MC eq 27)
    mag_m = jnp.maximum(jnp.abs(qm1), jnp.abs(qm2))
    mag_p = jnp.maximum(jnp.maximum(jnp.abs(q), jnp.abs(qp1)), jnp.abs(qp2))
    big = jnp.abs(qd) > 1.0e-12 * jnp.maximum(mag_m, mag_p)
    rho = jnp.where(big, qe / jnp.where(big, qd, 1.0), 0.0)

    tmp_m = q - rho * dqf_minus   # (CS eq 23)
    tmp_p = q + rho * dqf_plus
    tmp2_m = q - 2.0 * dqf_plus
    tmp2_p = q + 2.0 * dqf_minus

    limit_sm = rho <= (1.0 - 1.0e-12)
    qm = jnp.where(extrema & limit_sm, tmp_m, qm)
    qp = jnp.where(extrema & limit_sm, tmp_p, qp)

    over_m = jnp.abs(dqf_minus) >= 2.0 * jnp.abs(dqf_plus)
    over_p = jnp.abs(dqf_plus) >= 2.0 * jnp.abs(dqf_minus)
    qm = jnp.where(~extrema & over_m, tmp2_m, qm)
    qp = jnp.where(~extrema & over_p, tmp2_p, qp)

    return qm, qp


# ------------------------------------------------------------------------ weno3
def weno3(q, axis, dx):
    qm1 = _sh(q, -1, axis)
    qp1 = _sh(q, +1, axis)
    dx2 = dx * dx

    beta0 = (qp1 - q) ** 2
    beta1 = (q - qm1) ** 2
    tau = (qp1 - 2.0 * q + qm1) ** 2  # YC09 eq 22

    ind0 = tau / (beta0 + dx2)
    ind1 = tau / (beta1 + dx2)

    # right edge (qL_{i+1/2})
    f0 = q + qp1
    f1 = -qm1 + 3.0 * q
    a0 = (1.0 + ind0) * (2.0 / 3.0)
    a1 = (1.0 + ind1) / 3.0
    qp = (a0 * f0 + a1 * f1) / (2.0 * (a0 + a1))

    # left edge (qR_{i-1/2}) — mirrored stencil
    f0 = q + qm1
    f1 = -qp1 + 3.0 * q
    a0 = (1.0 + ind1) * (2.0 / 3.0)
    a1 = (1.0 + ind0) / 3.0
    qm = (a0 * f0 + a1 * f1) / (2.0 * (a0 + a1))

    return qm, qp


# ------------------------------------------------------------------------ limo3
_TINY = 1.0e-20  # matches Athena TINY_NUMBER usage in the CT09 theta ratio


def _limo3_phi(dvp, dvm, dx):
    """CT09 third-order limiter with asymptotic-region switch (eqs 2.8,
    3.13, 3.17, 3.22); see ``src/recon/limo3_simple.hpp``.  The switch
    width is dtype-aware: with the reference's fixed 10*eps(f64), an
    f32 run cannot represent 1 +- eps and the smooth blend region
    degenerates to a hard jump."""
    r = 0.1
    eps = 10.0 * jnp.finfo(jnp.asarray(dvp).dtype).eps
    theta = dvm / (dvp + _TINY)
    qq = (2.0 + theta) / 3.0
    phi = jnp.maximum(
        0.0, jnp.minimum(qq, jnp.maximum(-0.5 * theta,
                                         jnp.minimum(2.0 * theta,
                                                     jnp.minimum(qq, 1.6)))))
    eta = (dvm * dvm + dvp * dvp) / ((r * dx) ** 2)
    blend = 0.5 * ((1.0 - (eta - 1.0) / eps) * qq +
                   (1.0 + (eta - 1.0) / eps) * phi)
    return jnp.where(eta <= 1.0 - eps, qq,
                     jnp.where(eta >= 1.0 + eps, phi, blend))


def _minmod(a, b):
    return jnp.where(a * b > 0.0,
                     jnp.where(jnp.abs(a) < jnp.abs(b), a, b), 0.0)


def limo3(q, axis, dx, positivity_mask=None):
    """LimO3; ``positivity_mask`` is a STATIC per-variable bool sequence
    [nvar] marking fields (rho, p) that fall back to minmod if an edge
    value goes non-positive (reference ``ensure_positivity`` for
    IDN/IPR).  The mask is applied via an in-trace iota compare so the
    function stays Pallas-legal (a closed-over device array would be a
    captured constant, which Mosaic rejects)."""
    qm1 = _sh(q, -1, axis)
    qp1 = _sh(q, +1, axis)
    dqp = qp1 - q
    dqm = q - qm1
    qp = q + 0.5 * dqp * _limo3_phi(dqp, dqm, dx)
    qm = q - 0.5 * dqm * _limo3_phi(dqm, dqp, dx)

    if positivity_mask is not None and any(bool(m) for m in positivity_mask):
        dqmm = _minmod(dqp, dqm)
        qp_safe = q + 0.5 * dqmm
        qm_safe = q - 0.5 * dqmm
        bad = (qp <= 0.0) | (qm <= 0.0)
        # var axis is always ndim-4 ([..., nvar, nz, ny, nx]); build the
        # static mask from an iota compare (Mosaic-legal, no captures)
        vid = jax.lax.broadcasted_iota(jnp.int32, bad.shape, bad.ndim - 4)
        mask = None
        for v, m in enumerate(positivity_mask):
            if bool(m):
                eq = vid == v
                mask = eq if mask is None else (mask | eq)
        use_safe = bad & mask
        qp = jnp.where(use_safe, qp_safe, qp)
        qm = jnp.where(use_safe, qm_safe, qm)
    return qm, qp


# ------------------------------------------------------------------------ wenoz
def wenoz(q, axis, dx):
    """WENO-Z+ (Del Zanna 2007 smoothness indicators, Acker 2016 weights);
    see ``src/recon/wenoz_simple.hpp``."""
    qm2 = _sh(q, -2, axis)
    qm1 = _sh(q, -1, axis)
    qp1 = _sh(q, +1, axis)
    qp2 = _sh(q, +2, axis)

    b_hi = 13.0 / 12.0
    b_lo = 0.25
    beta0 = b_hi * (qm2 + q - 2.0 * qm1) ** 2 + b_lo * (qm2 + 3.0 * q - 4.0 * qm1) ** 2
    beta1 = b_hi * (qm1 + qp1 - 2.0 * q) ** 2 + b_lo * (qm1 - qp1) ** 2
    beta2 = b_hi * (qp2 + q - 2.0 * qp1) ** 2 + b_lo * (qp2 + 3.0 * q - 4.0 * qp1) ** 2

    # Reference uses 1e-42; TPU f64 is emulated with f32-pair arithmetic
    # whose exponent range is f32's (~1e-38 min normal), so 1e-42 would
    # flush to zero and produce 0/0. 1e-30 is equally negligible vs any
    # physical beta (amp^2-scaled) while staying representable on TPU.
    # In f32 runs 1e-30 is too small the other way: ind = tau/epsL can
    # reach ~2e19 and ind^2 overflows f32 (inf - inf -> NaN in the
    # weight sums), so use 1e-18 there (still << any f32-resolvable
    # beta, which is quantized at ~(eps_f32*q)^2 ~ 1e-14).
    epsL = 1.0e-30 if q.dtype == jnp.float64 else 1.0e-18
    tau5 = jnp.abs(beta0 - beta2)
    ind0 = tau5 / (beta0 + epsL)
    ind1 = tau5 / (beta1 + epsL)
    ind2 = tau5 / (beta2 + epsL)

    # right edge
    f0 = 2.0 * qm2 - 7.0 * qm1 + 11.0 * q
    f1 = -qm1 + 5.0 * q + 2.0 * qp1
    f2 = 2.0 * q + 5.0 * qp1 - qp2
    a0 = 0.1 * (1.0 + ind0 * ind0)
    a1 = 0.6 * (1.0 + ind1 * ind1)
    a2 = 0.3 * (1.0 + ind2 * ind2)
    qp = (f0 * a0 + f1 * a1 + f2 * a2) / (6.0 * (a0 + a1 + a2))

    # left edge — mirrored
    f0 = 2.0 * qp2 - 7.0 * qp1 + 11.0 * q
    f1 = -qp1 + 5.0 * q + 2.0 * qm1
    f2 = 2.0 * q + 5.0 * qm1 - qm2
    a0 = 0.1 * (1.0 + ind2 * ind2)
    a1 = 0.6 * (1.0 + ind1 * ind1)
    a2 = 0.3 * (1.0 + ind0 * ind0)
    qm = (f0 * a0 + f1 * a1 + f2 * a2) / (6.0 * (a0 + a1 + a2))

    return qm, qp


RECONSTRUCTIONS = {
    "dc": dc,
    "plm": plm,
    "ppm": ppm,
    "weno3": weno3,
    "limo3": limo3,
    "wenoz": wenoz,
}

# ghost zones needed (reference ``recon_need_nghost``: dc/plm/weno3/limo3 -> 2,
# ppm/wenoz -> 3; see src/hydro/hydro.cpp reconstruction parsing)
_NGHOST = {"dc": 2, "plm": 2, "weno3": 2, "limo3": 2, "ppm": 3, "wenoz": 3}


def nghost_for(recon: str) -> int:
    return _NGHOST[recon]


def reconstruct(recon: str, q, axis, dx, positivity_mask=None):
    """Dispatch; q is [..., nvar, nz, ny, nx], axis in {-3,-2,-1} or absolute."""
    fn = RECONSTRUCTIONS[recon]
    if recon == "limo3":
        return fn(q, axis, dx, positivity_mask=positivity_mask)
    return fn(q, axis, dx)
