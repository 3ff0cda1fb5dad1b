"""Cluster problem generator + source dispatch (reference
``src/pgen/cluster.cpp``).

Round-1 scope: gravity (NFW/BCG/SMBH), ACCEPT entropy, HSE initialization,
uniform gas/B-field init, gravitational source term, cluster clips
(density floor / velocity & temperature ceilings inside a clip radius).
AGN feedback/triggering and the magnetic tower live in
``agn_feedback.py`` (kinetic/thermal/magnetic injection).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ...core.indices import (IDN, IM1, IM2, IM3, IEN, IB1, IB2, IB3,
                             IV1, IV2, IV3, IPR, GLMMHD)
from ...utils.units import Units, mean_molecular_weights
from .entropy_profiles import ACCEPTEntropyProfile
from .gravity import ClusterGravity, gravitational_field_source
from .hse import HydrostaticEquilibriumSphere

import weakref

_cache = weakref.WeakKeyDictionary()


class _ClusterPkg:
    def __init__(self, pin, mesh=None):
        self.units = Units(pin)
        he_x = pin.get_real("hydro", "He_mass_fraction")
        self.mu, self.mu_e = mean_molecular_weights(he_x)
        self.gamma = pin.get_real("hydro", "gamma")
        self.gravity = ClusterGravity(pin, self.units)
        self.entropy = ACCEPTEntropyProfile(pin, self.units)
        self.hse = HydrostaticEquilibriumSphere(
            pin, self.units, self.gravity, self.entropy, self.mu, self.mu_e)
        c = "problem/cluster/gravity"
        self.gravity_srcterm = pin.get_or_add_bool(c, "gravity_srcterm", True)
        # clips (cluster_clips.cpp)
        cl = "problem/cluster/clips"
        self.clip_r = pin.get_or_add_real(cl, "clip_r", -1.0)
        self.clip_dfloor = pin.get_or_add_real(cl, "dfloor", -1.0)
        self.clip_vceil = pin.get_or_add_real(cl, "vceil", float("inf"))
        self.clip_vAceil = pin.get_or_add_real(cl, "vAceil", float("inf"))
        self.clip_Tceil = pin.get_or_add_real(cl, "Tceil", float("inf"))
        self.mbar_over_kb = self.mu * self.units.mh() / \
            self.units.k_boltzmann()
        # AGN subsystem (optional)
        from .agn_feedback import AGNFeedback
        from .agn_triggering import AGNTriggering
        from .magnetic_tower import MagneticTower
        from .jet_coords import JetCoords
        self.jet_coords = JetCoords(pin)
        self.magnetic_tower = MagneticTower(pin, self.units, self.jet_coords)
        self.agn_feedback = AGNFeedback(pin, self.units, self.jet_coords,
                                        self.magnetic_tower,
                                        self.mbar_over_kb, self.gamma)
        self.agn_triggering = AGNTriggering(pin, self.units,
                                            self.mbar_over_kb, self.gamma)
        if self.agn_triggering.mode != "NONE":
            self.agn_feedback.triggering = self.agn_triggering
        from .snia_stellar_feedback import SNIAFeedback, StellarFeedback
        self.snia_feedback = SNIAFeedback(pin, self.units, self.gravity)
        self.stellar_feedback = StellarFeedback(pin, self.units, self.mu,
                                                self.mbar_over_kb)

        # HSE self-test output (reference test_he_sphere.dat)
        h = "problem/cluster/hydrostatic_equilibrium"
        if pin.get_or_add_bool(h, "test_he_sphere", False):
            r0 = pin.get_or_add_real(h, "test_he_sphere_r_start",
                                     1e-3 * self.units.kpc())
            r1 = pin.get_or_add_real(h, "test_he_sphere_r_end",
                                     4000 * self.units.kpc())
            n_r = pin.get_or_add_integer(h, "test_he_sphere_n_r", 4000)
            self.hse.generate_p_rho_profile(r0, r1, n_r).write(
                "test_he_sphere.dat")


def _pkg(pin):
    if pin not in _cache:
        _cache[pin] = _ClusterPkg(pin)
    return _cache[pin]


def register_defaults(pin):
    return _pkg(pin)


def init_user_mesh_data(pin):
    _pkg(pin)


def _init_cons(pin, pkg, cfg, xb, yb, zb, min_dx, profile=None):
    """Cluster initial conserved state on broadcast coordinate arrays
    ``xb/yb/zb`` of shape [nb, NZ, NY, NX] (shared by the uniform and
    refined-mesh generators)."""
    gm1 = pkg.gamma - 1.0
    mhd = cfg.fluid == GLMMHD
    u = np.zeros((xb.shape[0], cfg.nvar) + xb.shape[1:])
    r = np.sqrt(xb ** 2 + yb ** 2 + zb ** 2)

    ug = "problem/cluster/uniform_gas"
    if pin.get_or_add_bool(ug, "init_uniform_gas", False):
        rho = pin.get_real(ug, "rho")
        ux = pin.get_real(ug, "ux")
        uy = pin.get_real(ug, "uy")
        uz = pin.get_real(ug, "uz")
        pres = pin.get_real(ug, "pres")
        u[:, IDN] = rho
        u[:, IM1] = rho * ux
        u[:, IM2] = rho * uy
        u[:, IM3] = rho * uz
        u[:, IEN] = pres / gm1 + 0.5 * rho * (ux ** 2 + uy ** 2 + uz ** 2)
    else:
        p_r = np.interp(r.ravel(), profile.r, profile.p).reshape(r.shape)
        k_r = np.asarray(pkg.entropy.k_from_r(jnp.asarray(r)))
        rho = np.asarray(pkg.hse.rho_from_p_k(p_r, k_r))
        u[:, IDN] = rho
        u[:, IEN] = p_r / gm1

    if mhd:
        ub = "problem/cluster/uniform_b_field"
        if pin.get_or_add_bool(ub, "init_uniform_b_field", False):
            bx = pin.get_real(ub, "bx")
            by = pin.get_real(ub, "by")
            bz = pin.get_real(ub, "bz")
            u[:, IB1] += bx
            u[:, IB2] += by
            u[:, IB3] += bz
        db = "problem/cluster/dipole_b_field"
        if pin.get_or_add_bool(db, "init_dipole_b_field", False):
            mx = pin.get_real(db, "mx")
            my = pin.get_real(db, "my")
            mz = pin.get_real(db, "mz")
            # dipole field from vector potential A = m x r / r^3
            r3 = np.maximum(r, min_dx / 2) ** 3
            u[:, IB1] += (3 * xb * (mx * xb + my * yb + mz * zb) / r ** 2
                          - mx) / r3
            u[:, IB2] += (3 * yb * (mx * xb + my * yb + mz * zb) / r ** 2
                          - my) / r3
            u[:, IB3] += (3 * zb * (mx * xb + my * yb + mz * zb) / r ** 2
                          - mz) / r3
        # initial magnetic tower (fixed-field injection at t=0)
        tw = pkg.magnetic_tower
        if tw.initial_field != 0.0 and tw.l_scale > 0:
            bx_t, by_t, bz_t = tw.unit_field(
                jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(zb), 0.0)
            u[:, IB1] += tw.initial_field * np.asarray(bx_t)
            u[:, IB2] += tw.initial_field * np.asarray(by_t)
            u[:, IB3] += tw.initial_field * np.asarray(bz_t)
        u[:, IEN] += 0.5 * (u[:, IB1] ** 2 + u[:, IB2] ** 2 + u[:, IB3] ** 2)
    return u


def problem_generator(pin, mesh, cfg, eos):
    pkg = _pkg(pin)
    x, y, z = mesh.cell_centers_mesh()
    shape = (mesh.nblocks,) + mesh.block_shape
    xb = np.broadcast_to(x, shape)
    yb = np.broadcast_to(y, shape)
    zb = np.broadcast_to(z, shape)
    profile = None
    if not pin.get_or_add_bool("problem/cluster/uniform_gas",
                               "init_uniform_gas", False):
        profile = pkg.hse.profile_for_mesh(mesh)
    u = _init_cons(pin, pkg, cfg, xb, yb, zb, mesh.min_dx,
                   profile=profile)
    return _apply_init_perturb(pin, mesh, cfg, np.asarray(u))


def _perturb_scale(pin, ip, tag):
    """Single length scale from l_peak or k_peak (cluster.cpp:380-393)."""
    l_peak = pin.get_or_add_real(ip, f"l_peak_{tag}", -1.0)
    k_peak = pin.get_or_add_real(ip, f"k_peak_{tag}", -1.0)
    if not ((l_peak > 0.0) != (k_peak > 0.0)):
        raise ValueError(
            f"init_perturb needs exactly one of l_peak_{tag}/k_peak_{tag}")
    if l_peak > 0.0:
        lx = pin.get_real("parthenon/mesh", "x1max") \
            - pin.get_real("parthenon/mesh", "x1min")
        k_peak = lx / l_peak       # assumes a cubic box (as the reference)
    return k_peak


def _apply_init_perturb(pin, mesh, cfg, u):
    """Initial velocity/magnetic perturbations from a few-modes field
    (``cluster.cpp:374-458`` infrastructure + ``:658-815`` application):
    v = FewModesFT field normalized to rms sigma_v (momenta = rho*v,
    KE added); B = curl(A) of a solenoidal few-modes vector potential
    normalized to rms sigma_b (ME added)."""
    ip = "problem/cluster/init_perturb"
    sigma_v = pin.get_or_add_real(ip, "sigma_v", 0.0)
    sigma_b = pin.get_or_add_real(ip, "sigma_b", 0.0)
    if sigma_v == 0.0 and sigma_b == 0.0:
        return u
    from ...utils.few_modes_ft import FewModesFT, make_random_modes
    ks, ke, js, je, is_, ie = mesh.interior
    sl = (slice(ks, ke + 1), slice(js, je + 1), slice(is_, ie + 1))
    vol = mesh.cell_volume
    lxyz = ((mesh.x1max - mesh.x1min) * (mesh.x2max - mesh.x2min)
            * (mesh.x3max - mesh.x3min))

    if sigma_v != 0.0:
        k_peak = _perturb_scale(pin, ip, "v")
        n_modes = pin.get_or_add_integer(ip, "num_modes_v", 40)
        sol_w = pin.get_or_add_real(ip, "sol_weight_v", 1.0)
        rseed = pin.get_or_add_integer(ip, "rseed_v", 1)
        fm = FewModesFT(mesh, n_modes,
                        make_random_modes(n_modes, k_peak, rseed),
                        k_peak, sol_w, 1e-10, rseed)
        v = np.asarray(fm.generate(1.0))       # [3, nb, nzi, nyi, nxi]
        mom = u[:, IM1:IM3 + 1][(slice(None), slice(None)) + sl]
        if np.any(mom != 0.0):
            raise ValueError("init_perturb sigma_v requires zero initial "
                             "velocity (cluster.cpp:699)")
        rho = u[:, IDN][(slice(None),) + sl]
        for n, c in enumerate((IM1, IM2, IM3)):
            u[:, c][(slice(None),) + sl] = rho * v[n]
        v2_sum = float((v ** 2).sum() * vol)
        v_norm = math.sqrt(v2_sum / lxyz / sigma_v ** 2)
        ke_ = np.zeros_like(rho)
        for c in (IM1, IM2, IM3):
            u[:, c][(slice(None),) + sl] /= v_norm
            ke_ += u[:, c][(slice(None),) + sl] ** 2
        u[:, IEN][(slice(None),) + sl] += 0.5 * ke_ / rho

    if sigma_b != 0.0:
        if cfg.fluid != GLMMHD:
            raise ValueError("init_perturb sigma_b requires fluid=glmmhd")
        g = mesh.nghost
        if g < 1:
            raise ValueError("init_perturb sigma_b needs nghost >= 1 "
                             "(curl of the vector potential)")
        k_peak = _perturb_scale(pin, ip, "b")
        n_modes = pin.get_or_add_integer(ip, "num_modes_b", 40)
        rseed = pin.get_or_add_integer(ip, "rseed_b", 2)
        # vector potential: solenoidal by construction (sol_weight 1),
        # ghost-filled so the curl's central differences are valid on
        # every interior cell
        fm = FewModesFT(mesh, n_modes,
                        make_random_modes(n_modes, k_peak, rseed),
                        k_peak, 1.0, 1e-10, rseed, fill_ghosts=True)
        a = np.asarray(fm.generate(1.0))   # [3, nb, nzi+2g, nyi+2g, ...]
        bexist = u[:, IB1:IB3 + 1][(slice(None), slice(None)) + sl]
        if np.any(bexist != 0.0):
            raise ValueError("init_perturb sigma_b requires zero initial "
                             "B (cluster.cpp:766)")

        def d(comp, axis):
            # central difference of A_comp along axis (1=z,2=y,3=x of
            # the ghost-extended [nb, nz+2g, ny+2g, nx+2g] array)
            ax = {3: 1, 2: 2, 1: 3}[axis]
            q = a[comp]
            lo = [slice(g, -g)] * 3
            hi = [slice(g, -g)] * 3
            lo[ax - 1] = slice(g - 1, -g - 1)
            hi[ax - 1] = slice(g + 1, None if g == 1 else -g + 1)
            dx = (mesh.dx1, mesh.dx2, mesh.dx3)[axis - 1]
            return (q[(slice(None),) + tuple(hi)]
                    - q[(slice(None),) + tuple(lo)]) / (2.0 * dx)

        # B = curl A (cluster.cpp:768-781)
        b1 = d(2, 2) - d(1, 3)     # dAz/dy - dAy/dz
        b2 = d(0, 3) - d(2, 1)     # dAx/dz - dAz/dx
        b3 = d(1, 1) - d(0, 2)     # dAy/dx - dAx/dy
        b2_sum = float((b1 ** 2 + b2 ** 2 + b3 ** 2).sum() * vol)
        b_norm = math.sqrt(b2_sum / lxyz / sigma_b ** 2)
        for c, bb in ((IB1, b1), (IB2, b2), (IB3, b3)):
            u[:, c][(slice(None),) + sl] = bb / b_norm
        u[:, IEN][(slice(None),) + sl] += 0.5 * (
            b1 ** 2 + b2 ** 2 + b3 ** 2) / b_norm ** 2
    return u


def problem_generator_smr(pin, smesh, cfg, eos):
    """Refined-mesh cluster init: ONE global HSE profile sampled at the
    finest level's dx (a per-leaf adapter would redo the RK4 profile
    integration once per leaf), then per-leaf evaluation at each leaf's
    own cell centers.  Reference: ``cluster.cpp`` ProblemGenerator runs
    per MeshBlock at any level against the shared PRhoProfile."""
    import types
    pkg = _pkg(pin)
    base = smesh.base
    profile = None
    if not pin.get_or_add_bool("problem/cluster/uniform_gas",
                               "init_uniform_gas", False):
        fine = types.SimpleNamespace(
            min_dx=min(smesh.dx(smesh.max_level)),
            x1min=base.x1min, x1max=base.x1max,
            x2min=base.x2min, x2max=base.x2max,
            x3min=base.x3min, x3max=base.x3max)
        profile = pkg.hse.profile_for_mesh(fine)
    state = {}
    bs = base.block_shape
    for lev, ids in sorted(smesh.level_ids.items()):
        xs = np.empty((len(ids),) + bs)
        ys = np.empty_like(xs)
        zs = np.empty_like(xs)
        for li, gid in enumerate(ids):
            x, y, z = smesh.cell_centers_leaf(gid)
            xs[li] = np.broadcast_to(x, bs)
            ys[li] = np.broadcast_to(y, bs)
            zs[li] = np.broadcast_to(z, bs)
        state[lev] = jnp.asarray(_init_cons(
            pin, pkg, cfg, xs, ys, zs, min(smesh.dx(lev)), profile=profile))
    return _apply_init_perturb_smr(pin, smesh, cfg, state)


def _apply_init_perturb_smr(pin, smesh, cfg, state):
    """``cluster.cpp:377-461`` perturbations on a refined mesh: the
    SAME few-modes realization as the uniform path (shared OU spectrum
    + ``FewModesFTSmr`` cross-level phase tables — a level-l leaf
    samples the identical continuous modes at its own cell positions),
    normalized by the volume-weighted rms over ALL leaves.  A
    fully-refined mesh reproduces the uniform-at-2x field
    (``tests/test_cluster_smr.py``)."""
    ip = "problem/cluster/init_perturb"
    sigma_v = pin.get_or_add_real(ip, "sigma_v", 0.0)
    sigma_b = pin.get_or_add_real(ip, "sigma_b", 0.0)
    if sigma_v == 0.0 and sigma_b == 0.0:
        return state
    from ...utils.few_modes_ft import FewModesFTSmr, make_random_modes
    base = smesh.base
    ks, ke, js, je, is_, ie = base.interior
    sl = (slice(ks, ke + 1), slice(js, je + 1), slice(is_, ie + 1))
    lxyz = ((base.x1max - base.x1min) * (base.x2max - base.x2min)
            * (base.x3max - base.x3min))

    def vol(lev):
        d1, d2, d3 = smesh.dx(lev)
        return d1 * d2 * d3

    out = {lev: np.array(u) for lev, u in state.items()}

    if sigma_v != 0.0:
        k_peak = _perturb_scale(pin, ip, "v")
        n_modes = pin.get_or_add_integer(ip, "num_modes_v", 40)
        sol_w = pin.get_or_add_real(ip, "sol_weight_v", 1.0)
        rseed = pin.get_or_add_integer(ip, "rseed_v", 1)
        fm = FewModesFTSmr(smesh, n_modes,
                           make_random_modes(n_modes, k_peak, rseed),
                           k_peak, sol_w, 1e-10, rseed)
        v = {lev: np.asarray(a) for lev, a in fm.generate(1.0).items()}
        v2_sum = sum(float((a ** 2).sum()) * vol(lev)
                     for lev, a in sorted(v.items()))
        v_norm = math.sqrt(v2_sum / lxyz / sigma_v ** 2)
        for lev, u in out.items():
            mom = u[:, IM1:IM3 + 1][(slice(None), slice(None)) + sl]
            if np.any(mom != 0.0):
                raise ValueError("init_perturb sigma_v requires zero "
                                 "initial velocity (cluster.cpp:699)")
            rho = u[:, IDN][(slice(None),) + sl]
            ke_ = np.zeros_like(rho)
            for n, c in enumerate((IM1, IM2, IM3)):
                u[:, c][(slice(None),) + sl] = rho * v[lev][n] / v_norm
                ke_ += u[:, c][(slice(None),) + sl] ** 2
            u[:, IEN][(slice(None),) + sl] += 0.5 * ke_ / rho

    if sigma_b != 0.0:
        if cfg.fluid != GLMMHD:
            raise ValueError("init_perturb sigma_b requires fluid=glmmhd")
        k_peak = _perturb_scale(pin, ip, "b")
        n_modes = pin.get_or_add_integer(ip, "num_modes_b", 40)
        rseed = pin.get_or_add_integer(ip, "rseed_b", 2)
        # ghost=1: analytic phases on the 1-cell-extended index range so
        # the curl's central differences are valid on every interior
        # cell (the SMR analog of the uniform fill_ghosts=True)
        fm = FewModesFTSmr(smesh, n_modes,
                           make_random_modes(n_modes, k_peak, rseed),
                           k_peak, 1.0, 1e-10, rseed, ghost=1)
        a = {lev: np.asarray(q) for lev, q in fm.generate(1.0).items()}
        b = {}
        b2_sum = 0.0
        for lev, q in sorted(a.items()):
            dx1, dx2, dx3 = smesh.dx(lev)

            def d(comp, axis):
                # central difference of ghost(1)-extended A along axis
                lo = [slice(1, -1)] * 3
                hi = [slice(1, -1)] * 3
                ax = {3: 1, 2: 2, 1: 3}[axis]
                lo[ax - 1] = slice(0, -2)
                hi[ax - 1] = slice(2, None)
                dxa = (dx1, dx2, dx3)[axis - 1]
                return (q[(comp,) + (slice(None),) + tuple(hi)]
                        - q[(comp,) + (slice(None),) + tuple(lo)]) \
                    / (2.0 * dxa)

            b1 = d(2, 2) - d(1, 3)     # dAz/dy - dAy/dz
            b2 = d(0, 3) - d(2, 1)     # dAx/dz - dAz/dx
            b3 = d(1, 1) - d(0, 2)     # dAy/dx - dAx/dy
            b[lev] = (b1, b2, b3)
            b2_sum += float((b1 ** 2 + b2 ** 2 + b3 ** 2).sum()) * vol(lev)
        b_norm = math.sqrt(b2_sum / lxyz / sigma_b ** 2)
        for lev, u in out.items():
            bexist = u[:, IB1:IB3 + 1][(slice(None), slice(None)) + sl]
            if np.any(bexist != 0.0):
                raise ValueError("init_perturb sigma_b requires zero "
                                 "initial B (cluster.cpp:766)")
            b1, b2, b3 = b[lev]
            for c, bb in ((IB1, b1), (IB2, b2), (IB3, b3)):
                u[:, c][(slice(None),) + sl] = bb / b_norm
            u[:, IEN][(slice(None),) + sl] += 0.5 * (
                b1 ** 2 + b2 ** 2 + b3 ** 2) / b_norm ** 2
    return {lev: jnp.asarray(u) for lev, u in out.items()}


def _interior_mask(mesh):
    """[1, NZ, NY, NX] bool: True on interior cells.  Global reductions
    (accretion rate, tower energy) must not count ghost copies — a block
    boundary through the accretion region would otherwise double-count
    cells (ghosts hold neighbor copies)."""
    m = np.zeros((1,) + mesh.block_shape, dtype=bool)
    ks, ke, js, je, is_, ie = mesh.interior
    m[:, ks:ke + 1, js:je + 1, is_:ie + 1] = True
    return jnp.asarray(m)


def problem_source_unsplit(pin, mesh, cfg, eos):
    """Cluster unsplit (per-stage) source dispatch
    (``ClusterUnsplitSrcTerm``, cluster.cpp:63-84): gravity + AGN
    feedback (incl. fixed-field tower) + SNIA.  Stellar feedback and
    clips are SPLIT sources — once per cycle at full dt on the final
    state (``ClusterSplitSrcTerm`` registered ProblemSourceFirstOrder,
    main.cpp:106) — because the one-shot density reset must see the
    persisted state, not a discarded 2S half-register."""
    pkg = _pkg(pin)
    x, y, z = mesh.cell_centers_mesh()
    shape = (mesh.nblocks,) + mesh.block_shape
    xb = jnp.asarray(np.broadcast_to(x, shape))
    yb = jnp.asarray(np.broadcast_to(y, shape))
    zb = jnp.asarray(np.broadcast_to(z, shape))
    r = jnp.sqrt(xb ** 2 + yb ** 2 + zb ** 2)
    mhd = cfg.fluid == GLMMHD
    pkg.agn_feedback._mesh_cell_volume = mesh.cell_volume
    valid = _interior_mask(mesh)

    def src(u, prim, mesh_, beta_dt, t):
        if pkg.gravity_srcterm:
            u = gravitational_field_source(pkg.gravity, u, prim, mesh_,
                                           beta_dt, xb, yb, zb)
        u = pkg.agn_feedback.apply(u, prim, beta_dt, t, xb, yb, zb, mhd,
                                   valid=valid)
        u = pkg.snia_feedback.apply(u, prim, beta_dt, r)
        return u

    return src


def problem_source_first_order(pin, mesh, cfg, eos):
    """Cluster split sources (``ClusterSplitSrcTerm``, cluster.cpp:85-93,
    registered as ProblemSourceFirstOrder, main.cpp:106): stellar
    feedback + cluster clips, once per cycle at full dt on the final
    state.  Returns None when neither is configured so eligible decks
    keep the fused-dt fast path."""
    pkg = _pkg(pin)
    if pkg.stellar_feedback.disabled and pkg.clip_r <= 0.0:
        return None
    from ...eos.adiabatic import cons_to_prim
    x, y, z = mesh.cell_centers_mesh()
    shape = (mesh.nblocks,) + mesh.block_shape
    r = jnp.asarray(np.broadcast_to(np.sqrt(x ** 2 + y ** 2 + z ** 2),
                                    shape))
    gm1 = pkg.gamma - 1.0
    mhd = cfg.fluid == GLMMHD

    def src(u, dt, t):
        u, prim = cons_to_prim(eos, u, cfg.fluid, cfg.nscalars)
        u = pkg.stellar_feedback.apply(u, prim, dt, r)
        return _apply_clips(pkg, u, r, gm1, mhd)

    return src


def problem_source_first_order_smr(pin, smesh, cfg, eos):
    """Split sources on refined meshes: per-level stellar feedback +
    clips with per-leaf radii (see ``problem_source_first_order``)."""
    pkg = _pkg(pin)
    if pkg.stellar_feedback.disabled and pkg.clip_r <= 0.0:
        return None
    from ...eos.adiabatic import cons_to_prim
    gm1 = pkg.gamma - 1.0
    mhd = cfg.fluid == GLMMHD
    rs = {}
    for lev, ids in sorted(smesh.level_ids.items()):
        bs = smesh.base.block_shape
        arr = np.empty((len(ids),) + bs)
        for li, gid in enumerate(ids):
            x, y, z = smesh.cell_centers_leaf(gid)
            arr[li] = np.broadcast_to(np.sqrt(x ** 2 + y ** 2 + z ** 2),
                                      bs)
        rs[lev] = jnp.asarray(arr)

    def src(state, dt, t):
        out = {}
        for lev, u in state.items():
            u, prim = cons_to_prim(eos, u, cfg.fluid, cfg.nscalars)
            u = pkg.stellar_feedback.apply(u, prim, dt, rs[lev])
            out[lev] = _apply_clips(pkg, u, rs[lev], gm1, mhd)
        return out

    return src


def problem_source_unsplit_smr(pin, smesh, cfg, eos):
    """Cluster sources on a refined mesh: per-leaf coordinate arrays per
    level, volume-weighted cross-level global reductions (the scalar
    ``cell_volume`` of the uniform path is wrong on mixed-level meshes —
    reference reduces across ranks/levels in ``hydro_driver.cpp:360-449``).

    Returns ``src(state, prims, beta_dt, t) -> state`` over the per-level
    state dict.  Stellar feedback + clips are split sources
    (``problem_source_first_order_smr``)."""
    pkg = _pkg(pin)
    mhd = cfg.fluid == GLMMHD
    valid = _interior_mask(smesh.base)

    coords = {}
    for lev, ids in sorted(smesh.level_ids.items()):
        bs = smesh.base.block_shape
        xs = np.empty((len(ids),) + bs)
        ys = np.empty_like(xs)
        zs = np.empty_like(xs)
        for li, gid in enumerate(ids):
            x, y, z = smesh.cell_centers_leaf(gid)
            xs[li] = np.broadcast_to(x, bs)
            ys[li] = np.broadcast_to(y, bs)
            zs[li] = np.broadcast_to(z, bs)
        d1, d2, d3 = smesh.dx(lev)
        coords[lev] = (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs),
                       d1 * d2 * d3)

    def src(state, prims, beta_dt, t):
        levs = sorted(state.keys())
        groups = []
        for lev in levs:
            xb, yb, zb, vol = coords[lev]
            groups.append(dict(u=state[lev], prim=prims[lev],
                               x=xb, y=yb, z=zb, vol=vol, valid=valid))
        if pkg.gravity_srcterm:
            for g in groups:
                g["u"] = gravitational_field_source(
                    pkg.gravity, g["u"], g["prim"], None, beta_dt,
                    g["x"], g["y"], g["z"])
        new_u = pkg.agn_feedback.apply_groups(groups, beta_dt, t, mhd)
        out = {}
        for lev, g, u in zip(levs, groups, new_u):
            r = jnp.sqrt(g["x"] ** 2 + g["y"] ** 2 + g["z"] ** 2)
            out[lev] = pkg.snia_feedback.apply(u, g["prim"], beta_dt, r)
        return out

    return src


_r_cache = {}


def _r_of(mesh):
    if id(mesh) not in _r_cache:
        x, y, z = mesh.cell_centers_mesh()
        shape = (mesh.nblocks,) + mesh.block_shape
        _r_cache[id(mesh)] = jnp.asarray(
            np.broadcast_to(np.sqrt(x ** 2 + y ** 2 + z ** 2), shape))
    return _r_cache[id(mesh)]


def estimate_timestep(pin, mesh, cfg, eos, prim, t):
    """Accretion-time dt constraint (``ClusterEstimateTimestep``,
    cluster.cpp:95-116 + ``AGNTriggering::EstimateTimeStep``,
    agn_triggering.cpp:555-585): ``accretion_cfl * cold_t_acc`` for
    COLD_GAS; ``accretion_cfl * M_region / Mdot`` for the Bondi modes
    (computed from the current prim — the reference uses the previous
    cycle's reduced values and skips the first cycle)."""
    pkg = _pkg(pin)
    trig = pkg.agn_triggering
    if trig.mode == "NONE":
        return jnp.inf
    if trig.mode == "COLD_GAS":
        return trig.accretion_cfl * trig.cold_t_acc
    r = _r_of(mesh)
    valid = _interior_mask(mesh)
    mdot = trig.rate_from_partials(
        trig.accretion_partials(prim, r, mesh.cell_volume, valid))
    m_reg = trig.region_mass(prim, r, mesh.cell_volume, valid)
    return trig.accretion_cfl * m_reg / jnp.maximum(mdot, 1e-300)


def estimate_timestep_factory(pin, mesh, cfg, eos):
    """Build-time form of ``estimate_timestep``: returns None when no
    triggering is configured, keeping eligible decks on the fused-dt
    fast path."""
    pkg = _pkg(pin)
    if pkg.agn_triggering.mode == "NONE":
        return None
    return lambda prim, t: estimate_timestep(pin, mesh, cfg, eos, prim, t)


def estimate_timestep_smr(pin, smesh, cfg, eos):
    """SMR-aware accretion dt constraint: volume-weighted cross-level
    partials (see ``estimate_timestep``).  Returns ``fn(state, t)`` or
    None when no triggering is configured."""
    pkg = _pkg(pin)
    trig = pkg.agn_triggering
    if trig.mode == "NONE":
        return None
    if trig.mode == "COLD_GAS":
        cap = trig.accretion_cfl * trig.cold_t_acc
        return lambda state, t: cap
    from ...eos.adiabatic import cons_to_prim
    valid = _interior_mask(smesh.base)
    coords = {}
    for lev, ids in sorted(smesh.level_ids.items()):
        bs = smesh.base.block_shape
        arr = np.empty((len(ids),) + bs)
        for li, gid in enumerate(ids):
            x, y, z = smesh.cell_centers_leaf(gid)
            arr[li] = np.broadcast_to(np.sqrt(x ** 2 + y ** 2 + z ** 2),
                                      bs)
        d1, d2, d3 = smesh.dx(lev)
        coords[lev] = (jnp.asarray(arr), d1 * d2 * d3)

    def fn(state, t):
        parts = None
        m_reg = 0.0
        for lev, u in state.items():
            _, prim = cons_to_prim(eos, u, cfg.fluid, cfg.nscalars)
            r, vol = coords[lev]
            p = trig.accretion_partials(prim, r, vol, valid)
            parts = p if parts is None else {
                k: parts[k] + p[k] for k in parts}
            m_reg = m_reg + trig.region_mass(prim, r, vol, valid)
        mdot = trig.rate_from_partials(parts)
        return trig.accretion_cfl * m_reg / jnp.maximum(mdot, 1e-300)

    return fn


def _apply_clips(pkg, u, r, gm1, mhd):
    """Cluster clips (``cluster_clips.cpp``): inside clip_r, apply density
    floor and velocity/Alfven/temperature ceilings."""
    if pkg.clip_r <= 0.0:
        return u
    inside = r < pkg.clip_r
    rho = u[:, IDN]
    if pkg.clip_dfloor > 0.0:
        new_rho = jnp.where(inside & (rho < pkg.clip_dfloor),
                            pkg.clip_dfloor, rho)
        u = u.at[:, IDN].set(new_rho)
        rho = new_rho
    if math.isfinite(pkg.clip_vceil):
        v2 = (u[:, IM1] ** 2 + u[:, IM2] ** 2 + u[:, IM3] ** 2) / rho ** 2
        v = jnp.sqrt(v2)
        over = inside & (v > pkg.clip_vceil)
        fac = jnp.where(over, pkg.clip_vceil / jnp.maximum(v, 1e-30), 1.0)
        ke_old = 0.5 * rho * v2
        for c in (IM1, IM2, IM3):
            u = u.at[:, c].multiply(fac)
        ke_new = ke_old * fac ** 2
        u = u.at[:, IEN].add(-(ke_old - ke_new))
    if mhd and math.isfinite(pkg.clip_vAceil):
        # Alfven-speed ceiling implemented as a density *raise*
        b2 = u[:, IB1] ** 2 + u[:, IB2] ** 2 + u[:, IB3] ** 2
        rho_min = b2 / (pkg.clip_vAceil ** 2)
        new_rho = jnp.where(inside & (rho < rho_min), rho_min, rho)
        u = u.at[:, IDN].set(new_rho)
        rho = new_rho
    if math.isfinite(pkg.clip_Tceil):
        ke = 0.5 * (u[:, IM1] ** 2 + u[:, IM2] ** 2 + u[:, IM3] ** 2) / rho
        me = (0.5 * (u[:, IB1] ** 2 + u[:, IB2] ** 2 + u[:, IB3] ** 2)
              if mhd else 0.0)
        eint = u[:, IEN] - ke - me
        e_ceil = pkg.clip_Tceil / pkg.mbar_over_kb / gm1 * rho
        over = inside & (eint > e_ceil)
        u = u.at[:, IEN].set(jnp.where(over, e_ceil + ke + me, u[:, IEN]))
    return u


def history_columns(pin, mesh, cfg, eos):
    """Cluster history reductions (``cluster_reductions.cpp:18-100`` +
    the agn_feedback_power column): cold-gas mass below a temperature
    threshold and max radial extent of the AGN jet tracer."""
    import jax.numpy as jnp
    pkg = _pkg(pin)
    gm1 = pkg.gamma - 1.0
    cols = []
    r = "problem/cluster/reductions"
    cold_thresh = pin.get_or_add_real(r, "cold_temp_threshold", -1.0)
    # reference key is agn_tracer_thresh (cluster.cpp:323-324); the old
    # repo spelling is honored as a fallback
    tracer_thresh = pin.get_or_add_real(r, "agn_tracer_thresh", -1.0)
    if tracer_thresh < 0.0:
        tracer_thresh = pin.get_or_add_real(r, "agn_tracer_threshold", -1.0)
    if cold_thresh > 0.0:
        e_thresh = cold_thresh / pkg.mbar_over_kb / gm1

        def _cold_gas(u, w, mesh_):
            sl = mesh_.interior_slices
            wi = w[sl]
            internal_e = wi[:, IPR] / (gm1 * wi[:, IDN])
            return jnp.sum(jnp.where(internal_e < e_thresh,
                                     wi[:, IDN], 0.0)) * mesh_.cell_volume

        cols.append(("cold_mass", _cold_gas))
    if tracer_thresh >= 0.0 and cfg.nscalars > 0:
        from ...core.indices import NGLMMHD, NHYDRO
        nbase = NGLMMHD if cfg.fluid == GLMMHD else NHYDRO
        x, y, z = mesh.cell_centers_mesh()
        shape = (mesh.nblocks,) + mesh.block_shape
        r2 = jnp.asarray(np.broadcast_to(x**2 + y**2 + z**2, shape))
        sl = mesh.interior_slices
        isl = tuple([sl[0]] + list(sl[2:]))
        r2i = r2[isl]

        def _agn_extent(u, w, mesh_):
            # tracer CONCENTRATION cons(scalar)/cons(rho) above thresh
            # (cluster_reductions.cpp:92)
            ui = u[mesh_.interior_slices]
            conc = ui[:, nbase] / ui[:, IDN]
            return jnp.sqrt(jnp.max(jnp.where(conc > tracer_thresh,
                                              r2i, 0.0)))

        cols.append(("agn_extent", _agn_extent))

    xh, yh, zh = mesh.cell_centers_mesh()
    shape_h = (mesh.nblocks,) + mesh.block_shape
    r_all = jnp.asarray(np.sqrt(np.broadcast_to(
        xh ** 2 + yh ** 2 + zh ** 2, shape_h)))

    valid_h = _interior_mask(mesh)

    def _feedback_power(u, w, mesh_):
        fb = pkg.agn_feedback
        if fb.triggering is None:
            mdot = jnp.asarray(0.0)
        else:
            mdot = fb.triggering.accretion_rate(u, w, r_all,
                                                mesh_.cell_volume,
                                                valid=valid_h)
        power, _ = fb.power_and_mass_rate(mdot)
        return jnp.asarray(power)

    cols.append(("agn_feedback_power", _feedback_power))
    return cols
