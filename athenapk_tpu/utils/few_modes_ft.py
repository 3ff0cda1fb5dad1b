"""Few-modes inverse Fourier transform + Ornstein-Uhlenbeck forcing.

TPU-native re-design of the reference ``src/utils/few_modes_ft.{hpp,cpp}``:
an explicit (non-FFT) inverse transform of <=~100 modes.  The reference
builds per-block phase tables and loops over modes per cell
(``few_modes_ft.cpp:230-248``); here the factorized phases become one
complex einsum over (modes x cells) — a batched matmul the MXU executes
directly (the TPU-friendliest possible formulation of this operator).

The OU state (var_hat) and the RNG live on the host: mode counts are tiny
and the reference also draws its randoms sequentially on the host with a
Mersenne-Twister (``few_modes_ft.cpp:208-220``); determinism and restart
fidelity are preserved by storing the numpy bit-generator state.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class FewModesFT:
    def __init__(self, mesh, num_modes: int, k_vec, k_peak: float,
                 sol_weight: float, t_corr: float, rseed: int,
                 fill_ghosts: bool = False):
        self.mesh = mesh
        self.num_modes = num_modes
        self.k_vec = np.asarray(k_vec, dtype=np.float64)  # [3, M]
        assert self.k_vec.shape == (3, num_modes)
        self.k_peak = k_peak
        assert sol_weight == -1.0 or 0.0 <= sol_weight <= 1.0
        self.sol_weight = sol_weight
        self.t_corr = t_corr
        self.fill_ghosts = fill_ghosts
        self.rng = np.random.default_rng(rseed)
        self.var_hat = np.zeros((3, num_modes), dtype=np.complex128)
        self._phases = None  # lazy: (phase_i, phase_j, phase_k) jnp arrays

    # ------------------------------------------------------------- phases
    def set_phases(self):
        """Per-block factorized phase tables (``SetPhases``,
        ``few_modes_ft.cpp:87-160``): phase_d[b, idx, m] = exp(i k_d x_d);
        the kx=0 modes carry the 1/2 factor of the half-complex sum."""
        mesh = self.mesh
        g = mesh.nghost if self.fill_ghosts else 0
        M = self.num_modes

        def phases_for(axis_n, gn, block_n, origin_cells):
            # global cell indices for each block along this axis
            idx = np.arange(-g if self.fill_ghosts else 0,
                            block_n + g if self.fill_ghosts else block_n)
            out = np.empty((mesh.nblocks, len(idx), M), dtype=np.complex128)
            for b in range(mesh.nblocks):
                gidx = (origin_cells[b] + idx) % gn
                w = self.k_vec[axis_n][None, :] * 2.0 * np.pi / gn
                out[b] = np.exp(1j * w * gidx[:, None])
            return out

        origins = np.array([[ (b % mesh.nb1) * mesh.mbnx1,
                              ((b // mesh.nb1) % mesh.nb2) * mesh.mbnx2,
                              (b // (mesh.nb1 * mesh.nb2)) * mesh.mbnx3 ]
                            for b in range(mesh.nblocks)])
        pi = phases_for(0, mesh.nx1, mesh.mbnx1, origins[:, 0])
        pj = phases_for(1, mesh.nx2, mesh.mbnx2, origins[:, 1])
        pk = phases_for(2, mesh.nx3, mesh.mbnx3, origins[:, 2])
        # kx==0 modes: halve once (the reference applies 0.5 on phases_i)
        half = np.where(self.k_vec[0] == 0.0, 0.5, 1.0)
        pi = pi * half[None, None, :]
        self._phases = (jnp.asarray(pi), jnp.asarray(pj), jnp.asarray(pk))

    # ------------------------------------------------------------ generate
    def generate(self, dt: float):
        """Evolve the OU process and return the real-space field
        [3, nblocks, nz, ny, nx] (interior-only unless fill_ghosts)."""
        self.update_var_hat(dt)
        return self.inverse_transform()

    def update_var_hat(self, dt: float):
        """Evolve the OU spectrum one step (host-side; no realspace
        transform — callers with multiple phase tables, e.g. refined
        meshes, evolve once and transform per level).

        Spectrum: parabolic (k/kpeak)^2 (2-(k/kpeak)^2); Gaussian complex
        amplitudes via Marsaglia polar; optional solenoidal projection;
        OU drift c=exp(-dt/t_corr) (``Generate``, ``few_modes_ft.cpp:197-330``).
        """
        M = self.num_modes
        # Marsaglia polar draws (sequential host RNG, like the reference)
        r = np.empty((3, M, 2))
        for n in range(3):
            for m in range(M):
                while True:
                    v1, v2 = self.rng.uniform(-1.0, 1.0, 2)
                    s = v1 * v1 + v2 * v2
                    if 0.0 < s < 1.0:
                        break
                r[n, m] = (v1, v2)
        kmag = np.sqrt((self.k_vec ** 2).sum(axis=0))
        tmp = np.maximum((kmag / self.k_peak) ** 2
                         * (2.0 - (kmag / self.k_peak) ** 2), 0.0)
        v_sqr = (r ** 2).sum(axis=-1)
        norm = np.sqrt(-2.0 * np.log(v_sqr) / v_sqr)
        var_hat_new = tmp[None, :] * norm * (r[..., 0] + 1j * r[..., 1])

        # hermitian symmetry for kx=0 conjugate pairs
        for m in range(M):
            if self.k_vec[0, m] == 0.0:
                for m2 in range(m):
                    if (self.k_vec[1, m] == -self.k_vec[1, m2]
                            and self.k_vec[2, m] == -self.k_vec[2, m2]):
                        var_hat_new[:, m] = np.conj(var_hat_new[:, m2])

        # solenoidal/compressive projection
        if self.sol_weight >= 0.0:
            khat = self.k_vec / np.where(kmag == 0.0, 1.0, kmag)
            dot = (var_hat_new * khat).sum(axis=0)
            s = self.sol_weight
            var_hat_new = s * var_hat_new + (1.0 - 2.0 * s) * dot[None, :] * khat

        c_drift = np.exp(-dt / self.t_corr)
        c_diff = np.sqrt(1.0 - c_drift * c_drift)
        self.var_hat = self.var_hat * c_drift + var_hat_new * c_diff

    def inverse_transform(self, phases=None):
        """acc[n,b,k,j,i] = 2 Re sum_m vhat[n,m] Pi[b,i,m] Pj[b,j,m] Pk[b,k,m]
        — evaluated as complex einsum (batched matmuls on the MXU)."""
        if phases is None:
            if self._phases is None:
                self.set_phases()
            phases = self._phases
        pi, pj, pk = phases
        vh = jnp.asarray(self.var_hat)
        # combine k and j first: [b, nz, ny, M]
        pkj = jnp.einsum("bkm,bjm->bkjm", pk, pj)
        # then fold in i and the mode amplitude: [3, b, nz, ny, nx]
        acc = jnp.einsum("nm,bkjm,bim->nbkji", vh, pkj, pi)
        return 2.0 * acc.real

    # -------------------------------------------------------------- state
    def get_state(self):
        """(var_hat, rng_state) for checkpoint/restart."""
        return self.var_hat.copy(), self.rng.bit_generator.state

    def set_state(self, var_hat, rng_state):
        self.var_hat = np.asarray(var_hat, dtype=np.complex128)
        self.rng.bit_generator.state = rng_state


class FewModesFTSmr:
    """Few-modes OU forcing on a refined mesh: ONE shared OU spectrum
    (so the driving field is a single global realization, exactly the
    reference's per-rank-shared `var_hat`) with per-level phase tables
    evaluated at each leaf's own cell positions.

    Phase convention matches the uniform path (cell left edges on the
    root grid, ``few_modes_ft.cpp:87-160``): a level-0 leaf sees exactly
    the phases a uniform mesh would, and finer leaves sample the same
    continuous modes at their finer positions — the acceleration field
    is continuous across level boundaries by construction.
    """

    def __init__(self, smesh, num_modes: int, k_vec, k_peak: float,
                 sol_weight: float, t_corr: float, rseed: int,
                 ghost: int = 0):
        self.smesh = smesh
        b = smesh.base
        # spectral/OU machinery shared with the uniform class (phases of
        # the inner object are never built; we pass per-level tables)
        self._ou = FewModesFT(b, num_modes, k_vec, k_peak, sol_weight,
                              t_corr, rseed)
        self.num_modes = num_modes
        # ghost > 0: evaluate the analytic phases on ghost-extended
        # index ranges too (the SMR analog of the uniform
        # ``fill_ghosts``) — used by init_perturb's curl(A)
        self.ghost = ghost
        self._phases = {lev: self._level_phases(lev)
                        for lev in smesh.level_ids}

    def _level_phases(self, lev):
        sm = self.smesh
        b = sm.base
        ids = sm.level_ids[lev]
        M = self.num_modes
        k_vec = self._ou.k_vec
        scale = 1 << lev
        g = self.ghost

        def tab(axis, lx, mbn):
            idx = np.arange(-g, mbn + g)
            out = np.empty((len(ids), len(idx), M), dtype=np.complex128)
            gn = (b.nx1, b.nx2, b.nx3)[axis] * scale
            for li, gid in enumerate(ids):
                frac = (int(lx[gid]) * mbn + idx) / gn
                out[li] = np.exp(
                    2j * np.pi * k_vec[axis][None, :] * frac[:, None])
            return out

        pi = tab(0, sm.lx1, b.mbnx1)
        pj = tab(1, sm.lx2, b.mbnx2)
        pk = tab(2, sm.lx3, b.mbnx3)
        half = np.where(k_vec[0] == 0.0, 0.5, 1.0)
        pi = pi * half[None, None, :]
        return (jnp.asarray(pi), jnp.asarray(pj), jnp.asarray(pk))

    def rebind(self, smesh):
        """Rebuild the per-level phase tables for a NEW leaf topology
        (adaptive remesh) while keeping the OU spectrum + RNG state —
        the driving field is continuous across remeshes."""
        self.smesh = smesh
        self._phases = {lev: self._level_phases(lev)
                        for lev in smesh.level_ids}

    def generate(self, dt: float):
        """-> {level: acc[3, nb_lev, nz, ny, nx]} (interior cells)."""
        self._ou.update_var_hat(dt)
        return {lev: self._ou.inverse_transform(ph)
                for lev, ph in self._phases.items()}

    # state passthrough (checkpoint/restart)
    def get_state(self):
        return self._ou.get_state()

    def set_state(self, var_hat, rng_state):
        self._ou.set_state(var_hat, rng_state)


def make_random_modes(num_modes: int, k_peak: float, rseed: int = 31224):
    """Random mode set within the parabolic band (``MakeRandomModes``,
    ``few_modes_ft.cpp:250-312``): kx>=0 half-space, |k| in [kpeak/2, 2kpeak],
    no duplicates."""
    rng = np.random.default_rng(rseed)
    k_low = int(np.floor(k_peak / 2))
    k_high = int(np.ceil(2 * k_peak))
    modes = []
    attempts = 0
    while len(modes) < num_modes and attempts < 1_000_000:
        attempts += 1
        k = rng.integers(-k_high, k_high + 1, 3)
        kmag = np.sqrt((k ** 2).sum())
        ampl = (kmag / k_peak) ** 2 * (2.0 - (kmag / k_peak) ** 2)
        if (ampl < 0 or kmag < k_low or kmag > k_high or k[0] < 0
                or any((k == m).all() for m in modes)):
            continue
        modes.append(k)
    if len(modes) < num_modes:
        raise RuntimeError("mode generation failed")
    return np.asarray(modes, dtype=np.float64).T  # [3, M]
