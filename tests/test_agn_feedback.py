"""Cluster AGN feedback accounting tests.

Pytest analogs of the reference regression suites
``cluster_hydro_agn_feedback`` (thermal/kinetic energy+mass accounting
vs the analytic injection rates,
``tst/regression/test_suites/cluster_hydro_agn_feedback/``),
``cluster_magnetic_tower`` (tower field vs the closed-form Li et al.
profile and injected magnetic energy vs the requested power,
``tst/regression/test_suites/cluster_magnetic_tower/``), and the
Bondi-mode half of ``cluster_agn_triggering`` (accretion rate vs the
analytic Bondi formula + proportional mass removal,
``src/pgen/cluster/agn_triggering.cpp:352-358``).

All runs are uniform gas, periodic BCs (hydro conserves mass/energy
exactly, so any change is the source terms'), f64 on CPU.
"""

import math

import numpy as np

from athenapk_tpu.config.parameter_input import ParameterInput
from athenapk_tpu.core.indices import IDN, IM1, IM2, IM3, IEN, IB1, IB2, IB3
from athenapk_tpu.driver import Simulation

# Same unit system as tests/test_cluster.py (Mpc / 1e14 Msun / Gyr-ish).
UNITS = """
<units>
code_length_cgs = 3.085677580962325e+24
code_mass_cgs = 1.98841586e+47
code_time_cgs = 3.15576e+16
"""

BASE = """
<job>
problem_id = cluster

<parthenon/mesh>
nghost = 2
nx1 = 32
x1min = -0.5
x1max = 0.5
nx2 = 32
x2min = -0.5
x2max = 0.5
nx3 = 32
x3min = -0.5
x3max = 0.5

<parthenon/meshblock>
nx1 = 32
nx2 = 32
nx3 = 32

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 100.0
ncycle_out = 0

<hydro>
eos = adiabatic
riemann = hlle
reconstruction = plm
gamma = 1.6666666666666667
He_mass_fraction = 0.25

<problem/cluster/uniform_gas>
init_uniform_gas = true
rho = 1.0
ux = 0.0
uy = 0.0
uz = 0.0
pres = 1.0
""" + UNITS


def _totals(sim):
    """Interior-summed (mass, energy, momentum_vec, ME)."""
    u = np.asarray(sim.cons())
    sl = sim.mesh.interior_slices
    ui = u[sl]
    vol = sim.mesh.cell_volume
    mass = ui[:, IDN].sum() * vol
    en = ui[:, IEN].sum() * vol
    mom = np.array([ui[:, IM1].sum(), ui[:, IM2].sum(),
                    ui[:, IM3].sum()]) * vol
    me = 0.0
    if ui.shape[1] > IB3:
        me = 0.5 * (ui[:, IB1] ** 2 + ui[:, IB2] ** 2
                    + ui[:, IB3] ** 2).sum() * vol
    return mass, en, mom, me


def _interior_centers(sim):
    mesh = sim.mesh
    x, y, z = mesh.cell_centers_mesh()
    shape = (mesh.nblocks,) + mesh.block_shape
    xb = np.broadcast_to(x, shape)
    yb = np.broadcast_to(y, shape)
    zb = np.broadcast_to(z, shape)
    sl = mesh.interior_slices
    sl3 = (sl[0],) + sl[2:]  # centers have no var axis
    return xb[sl3], yb[sl3], zb[sl3]


def test_thermal_feedback_accounting():
    """Thermal-only fixed power: dE = P*t and dM = P/(eff c^2)*t, both
    scaled by the discrete/analytic deposition-volume ratio (the dump
    divides by the analytic sphere volume, ``agn_feedback.cpp``)."""
    P, eff, r_th = 1e-2, 1e-3, 0.2
    pin = ParameterInput.from_string(BASE + f"""
<hydro>
fluid = euler

<parthenon/time>
nlim = 12

<problem/cluster/agn_feedback>
fixed_power = {P}
efficiency = {eff}
thermal_fraction = 1.0
kinetic_fraction = 0.0
magnetic_fraction = 0.0
thermal_radius = {r_th}
""")
    sim = Simulation(pin, quiet=True)
    m0, e0, p0, _ = _totals(sim)
    sim.run()
    m1, e1, p1, _ = _totals(sim)
    t = sim.t

    x, y, z = _interior_centers(sim)
    n_in = int((x ** 2 + y ** 2 + z ** 2 <= r_th ** 2).sum())
    v_disc = n_in * sim.mesh.cell_volume
    v_anl = 4.0 / 3.0 * math.pi * r_th ** 3
    vfac = v_disc / v_anl

    c2 = sim.units.speed_of_light() ** 2 if hasattr(sim, "units") else None
    if c2 is None:
        from athenapk_tpu.utils.units import Units
        c2 = Units(pin).speed_of_light() ** 2
    de_exp = P * t * vfac
    dm_exp = P / (eff * c2) * t * vfac
    assert abs((e1 - e0) - de_exp) / de_exp < 2e-3, \
        f"dE={e1 - e0:.6e} expected {de_exp:.6e}"
    assert abs((m1 - m0) - dm_exp) / dm_exp < 1e-6, \
        f"dM={m1 - m0:.6e} expected {dm_exp:.6e}"
    # symmetric deposition on a symmetric grid: no net momentum
    assert np.abs(p1 - p0).max() < 1e-10


def test_kinetic_feedback_accounting():
    """Kinetic-only fixed power: paired jet slabs receive mass, momentum
    and energy; net momentum stays zero, dE/dM follow the analytic rates
    scaled by the discrete slab volume."""
    P, eff = 1e-3, 1e-3
    rj, thick, off = 0.2, 0.125, 0.0625
    pin = ParameterInput.from_string(BASE + f"""
<hydro>
fluid = euler

<parthenon/time>
nlim = 12

<problem/cluster/agn_feedback>
fixed_power = {P}
efficiency = {eff}
thermal_fraction = 0.0
kinetic_fraction = 1.0
magnetic_fraction = 0.0
kinetic_jet_radius = {rj}
kinetic_jet_thickness = {thick}
kinetic_jet_offset = {off}
""")
    sim = Simulation(pin, quiet=True)
    m0, e0, p0, _ = _totals(sim)
    sim.run()
    m1, e1, p1, _ = _totals(sim)
    t = sim.t

    # discrete slab volume (jet axis = z: no precession configured)
    x, y, z = _interior_centers(sim)
    in_jet = ((np.sqrt(x ** 2 + y ** 2) < rj) & (np.abs(z) >= off)
              & (np.abs(z) <= off + thick))
    v_disc = int(in_jet.sum()) * sim.mesh.cell_volume
    v_anl = 2.0 * thick * math.pi * rj ** 2
    vfac = v_disc / v_anl

    from athenapk_tpu.utils.units import Units
    c2 = Units(pin).speed_of_light() ** 2
    de_exp = P * t * vfac
    dm_exp = P / (eff * c2) * t * vfac
    assert abs((e1 - e0) - de_exp) / de_exp < 2e-3, \
        f"dE={e1 - e0:.6e} expected {de_exp:.6e}"
    assert abs((m1 - m0) - dm_exp) / dm_exp < 1e-6, \
        f"dM={m1 - m0:.6e} expected {dm_exp:.6e}"
    # opposing slabs: net momentum cancels (jet momentum is O(1e-1))
    assert np.abs(p1 - p0).max() < 1e-10


def test_magnetic_tower_initial_field_matches_analytic():
    """t=0 tower injection must reproduce the closed-form Li et al.
    (2006) field (independent numpy evaluation here; reference suite
    compares the same closed forms, ``cluster_magnetic_tower.py``)."""
    B0, alpha, ls = 1e-3, 2.5, 0.15
    pin = ParameterInput.from_string(BASE + f"""
<hydro>
fluid = glmmhd

<parthenon/time>
nlim = 0

<problem/cluster/magnetic_tower>
potential_type = li
li_alpha = {alpha}
l_scale = {ls}
initial_field = {B0}
""")
    sim = Simulation(pin, quiet=True)
    u = np.asarray(sim.cons())
    sl = sim.mesh.interior_slices
    x, y, z = _interior_centers(sim)

    # independent evaluation (jet axis = z)
    r = np.sqrt(x ** 2 + y ** 2)
    rl, hl = r / ls, z / ls
    ex = np.exp(-rl ** 2 - hl ** 2)
    b_r = 2.0 * hl * rl * ex
    b_th = alpha * rl * ex
    b_h = 2.0 * (1.0 - rl ** 2) * ex
    with np.errstate(invalid="ignore", divide="ignore"):
        cth = np.where(r > 0, x / np.where(r > 0, r, 1.0), 0.0)
        sth = np.where(r > 0, y / np.where(r > 0, r, 1.0), 0.0)
    want = np.stack([B0 * (b_r * cth - b_th * sth),
                     B0 * (b_r * sth + b_th * cth),
                     B0 * b_h])
    got = np.stack([u[sl][:, IB1], u[sl][:, IB2], u[sl][:, IB3]])
    scale = np.abs(want).max()
    assert scale > 0.5 * B0
    assert np.abs(got - want).max() / scale < 1e-12, \
        f"tower field mismatch linf={np.abs(got - want).max():.3e}"
    # magnetic energy must be accounted in IEN: E - p/(gm1) == ME density
    me = 0.5 * (got ** 2).sum(axis=0)
    gm1 = 5.0 / 3.0 - 1.0
    eint = u[sl][:, IEN] - me
    assert np.abs(eint - 1.0 / gm1).max() < 1e-12


def test_magnetic_tower_power_accounting():
    """Power-scaled tower: each stage solves f*linear + f^2*quad =
    P_mag*beta_dt on the DISCRETE grid sums, so the cumulative magnetic
    energy follows P_mag*t to integrator order (reference reduction,
    ``hydro_driver.cpp:409-449``)."""
    P = 1e-4
    pin = ParameterInput.from_string(BASE + f"""
<hydro>
fluid = glmmhd

<parthenon/time>
nlim = 10

<problem/cluster/agn_feedback>
fixed_power = {P}
efficiency = 1e-3
thermal_fraction = 0.0
kinetic_fraction = 0.0
magnetic_fraction = 1.0

<problem/cluster/magnetic_tower>
potential_type = li
li_alpha = 2.5
l_scale = 0.15
initial_field = 0.0
""")
    sim = Simulation(pin, quiet=True)
    m0, e0, _, me0 = _totals(sim)
    sim.run()
    m1, e1, _, me1 = _totals(sim)
    t = sim.t
    assert t > 0
    dme_exp = P * t
    # B starts at 0 (quad branch) and the field the tower injects into
    # evolves between stages: integrator-order accounting, loose gate
    assert abs((me1 - me0) - dme_exp) / dme_exp < 5e-2, \
        f"dME={me1 - me0:.6e} expected {dme_exp:.6e}"
    # total energy gains exactly what the tower deposits into IEN
    assert abs((e1 - e0) - dme_exp) / dme_exp < 5e-2


def test_boosted_bondi_rate_and_mass_removal():
    """BOOSTED_BONDI on uniform gas: Mdot = alpha 2pi G^2 M^2 rho/cs^3
    (v=0), removed mass = Mdot*t, re-injected (1-eff)*Mdot*t through the
    thermal dump (reference ``agn_triggering.cpp:352-358``)."""
    alpha, m_smbh, r_acc, eff, r_th = 100.0, 1e-2, 0.2, 1e-6, 0.2
    pin = ParameterInput.from_string(BASE + f"""
<hydro>
fluid = euler

<parthenon/time>
nlim = 10

<problem/cluster/gravity>
m_smbh = {m_smbh}

<problem/cluster/agn_triggering>
triggering_mode = BOOSTED_BONDI
accretion_radius = {r_acc}
bondi_alpha = {alpha}

<problem/cluster/agn_feedback>
fixed_power = 0.0
efficiency = {eff}
thermal_fraction = 1.0
kinetic_fraction = 0.0
magnetic_fraction = 0.0
thermal_radius = {r_th}
""")
    sim = Simulation(pin, quiet=True)
    m0 = _totals(sim)[0]
    sim.run()
    m1 = _totals(sim)[0]
    t = sim.t

    from athenapk_tpu.utils.units import Units
    un = Units(pin)
    G = un.gravitational_constant()
    gamma = 5.0 / 3.0
    cs = math.sqrt(gamma * 1.0 / 1.0)
    mdot = (alpha * 2.0 * math.pi * G ** 2 * m_smbh ** 2 * 1.0
            / (cs ** 2) ** 1.5)
    assert mdot > 0

    x, y, z = _interior_centers(sim)
    n_in = int((x ** 2 + y ** 2 + z ** 2 <= r_th ** 2).sum())
    vfac = (n_in * sim.mesh.cell_volume) / (4.0 / 3.0 * math.pi * r_th ** 3)
    dm_exp = mdot * t * ((1.0 - eff) * vfac - 1.0)
    assert abs((m1 - m0) - dm_exp) / (mdot * t) < 2e-2, \
        f"dM={m1 - m0:.6e} expected {dm_exp:.6e} (mdot*t={mdot * t:.3e})"


def test_snia_feedback_accounting():
    """SNIA thermal+mass deposition follows the Hernquist BCG profile:
    dE = P_m * t * sum(rho_bcg) * vol, dM likewise (reference
    ``snia_feedback.cpp`` deposits per unit BCG stellar mass);
    profile evaluated independently here."""
    P_m, M_m = 1e-3, 1e-4
    m_bcg, r_bcg = 7.5e-4, 4e-3  # code units (1e14 Msun / Mpc)
    pin = ParameterInput.from_string(BASE + f"""
<hydro>
fluid = euler

<parthenon/time>
nlim = 8

<problem/cluster/gravity>
which_bcg_g = HERNQUIST
gravity_srcterm = false
m_bcg_s = {m_bcg}
r_bcg_s = {r_bcg}

<problem/cluster/snia_feedback>
power_per_bcg_mass = {P_m}
mass_rate_per_bcg_mass = {M_m}
""")
    sim = Simulation(pin, quiet=True)
    m0, e0, _, _ = _totals(sim)
    sim.run()
    m1, e1, _, _ = _totals(sim)
    t = sim.t

    x, y, z = _interior_centers(sim)
    r = np.sqrt(x ** 2 + y ** 2 + z ** 2)
    rho_bcg = m_bcg * r_bcg / (2.0 * math.pi * r * (r + r_bcg) ** 3)
    s = rho_bcg.sum() * sim.mesh.cell_volume
    dm_exp = M_m * t * s
    de_exp = P_m * t * s
    assert abs((m1 - m0) - dm_exp) / dm_exp < 1e-8, \
        f"dM={m1 - m0:.6e} expected {dm_exp:.6e}"
    assert abs((e1 - e0) - de_exp) / de_exp < 2e-3, \
        f"dE={e1 - e0:.6e} expected {de_exp:.6e}"


def test_stellar_feedback_accounting():
    """Stellar feedback converts cold dense gas above the density
    threshold (inside the shell) to heat: density resets to the
    threshold, removed mass enters as efficiency*c^2 thermal energy
    minus the advected internal energy (reference
    ``stellar_feedback.cpp:110-165`` one-shot semantics)."""
    from athenapk_tpu.utils.units import Units

    pin0 = ParameterInput.from_string(BASE)
    un = Units(pin0)
    he = 0.25
    mu = 1.0 / (he * 3.0 / 4.0 + (1 - he) * 2.0)
    mbar = mu * un.mh()
    mbar_over_kb = mbar / un.k_boltzmann()
    gamma = 5.0 / 3.0
    rho0, pres0 = 1.0, 1.0
    n0 = rho0 / mbar
    temp0 = mbar_over_kb * pres0 / rho0
    n_th = 0.9 * n0
    t_th = 2.0 * temp0
    eff = 1e-4   # eff*c^2 >> eint/mass: conversion must net-heat
    r_st, r_ex = 0.3, 0.1

    pin = ParameterInput.from_string(BASE + f"""
<hydro>
fluid = euler

<parthenon/time>
nlim = 1

<problem/cluster/stellar_feedback>
stellar_radius = {r_st}
exclusion_radius = {r_ex}
efficiency = {eff}
number_density_threshold = {n_th}
temperature_threshold = {t_th}
""")
    sim = Simulation(pin, quiet=True)
    m0, e0, _, _ = _totals(sim)
    sim.run()
    m1, e1, _, _ = _totals(sim)

    x, y, z = _interior_centers(sim)
    r = np.sqrt(x ** 2 + y ** 2 + z ** 2)
    sel = (r <= r_st) & (r > r_ex)
    drho = (n_th * mbar - rho0)          # < 0
    dm_exp = drho * sel.sum() * sim.mesh.cell_volume
    assert dm_exp < 0
    eint_spec = pres0 / ((gamma - 1.0) * rho0)
    de_exp = (eint_spec - eff * un.speed_of_light() ** 2) * dm_exp
    assert de_exp > 0  # removed mass must net HEAT the gas
    assert abs((m1 - m0) - dm_exp) / abs(dm_exp) < 1e-4, \
        f"dM={m1 - m0:.6e} expected {dm_exp:.6e}"
    assert abs((e1 - e0) - de_exp) / abs(de_exp) < 1e-3, \
        f"dE={e1 - e0:.6e} expected {de_exp:.6e}"


def test_accretion_dt_constraint():
    """ProblemEstimateTimestep analog (``ClusterEstimateTimestep``,
    cluster.cpp:95-116): COLD_GAS caps dt at accretion_cfl*cold_t_acc;
    Bondi modes at accretion_cfl*M_region/Mdot."""
    cap = 1e-5
    pin = ParameterInput.from_string(BASE + f"""
<hydro>
fluid = euler

<parthenon/time>
nlim = 2

<problem/cluster/agn_triggering>
triggering_mode = COLD_GAS
accretion_radius = 0.2
cold_temp_thresh = 1e12
cold_t_acc = {cap / 0.1}
accretion_cfl = 0.1

<problem/cluster/agn_feedback>
efficiency = 1e-3
thermal_fraction = 1.0
thermal_radius = 0.2
""")
    sim = Simulation(pin, quiet=True)
    sim.run()
    assert sim.ncycle == 2
    assert abs(sim.t - 2 * cap) / (2 * cap) < 1e-12, \
        f"dt not capped: t={sim.t:.3e} expected {2 * cap:.3e}"

    # Bondi mode: direct functional check of the cap formula
    import math as _math
    from athenapk_tpu.pgen.cluster.pgen import estimate_timestep, _pkg
    pin2 = ParameterInput.from_string(BASE + """
<hydro>
fluid = euler

<parthenon/time>
nlim = 1

<problem/cluster/gravity>
m_smbh = 1e-2

<problem/cluster/agn_triggering>
triggering_mode = BOOSTED_BONDI
accretion_radius = 0.2
bondi_alpha = 100.0
accretion_cfl = 0.25
""")
    sim2 = Simulation(pin2, quiet=True)
    import jax.numpy as jnp
    _, prim = sim2.pkg.cons_to_prim(sim2.u)
    got = float(estimate_timestep(pin2, sim2.mesh, sim2.cfg, sim2.eos,
                                  prim, 0.0))
    from athenapk_tpu.utils.units import Units
    un = Units(pin2)
    G = un.gravitational_constant()
    cs = _math.sqrt(5.0 / 3.0)
    mdot = 100.0 * 2.0 * _math.pi * G ** 2 * 1e-4 / cs ** 3
    x, y, z = _interior_centers(sim2)
    m_reg = float(((x ** 2 + y ** 2 + z ** 2) < 0.04).sum()
                  * sim2.mesh.cell_volume)
    want = 0.25 * m_reg / mdot
    assert abs(got - want) / want < 1e-10, f"{got} vs {want}"


def test_agn_tracer_injection_and_extent():
    """enable_tracer marks jet-launching material with passive-scalar
    concentration 1 (``agn_feedback.cpp:371-376``); the agn_extent
    history reduction reports the max radius of tracer concentration
    above agn_tracer_thresh (``cluster_reductions.cpp:77-99``)."""
    rj, thick, off = 0.2, 0.125, 0.0625
    pin = ParameterInput.from_string(BASE + f"""
<hydro>
fluid = euler
nscalars = 1

<parthenon/time>
nlim = 4

<problem/cluster/agn_feedback>
fixed_power = 1e-3
efficiency = 1e-3
thermal_fraction = 0.0
kinetic_fraction = 1.0
magnetic_fraction = 0.0
kinetic_jet_radius = {rj}
kinetic_jet_thickness = {thick}
kinetic_jet_offset = {off}
enable_tracer = true

<problem/cluster/reductions>
agn_tracer_thresh = 0.01
""")
    sim = Simulation(pin, quiet=True)
    sim.run()
    u = np.asarray(sim.cons())
    sl = sim.mesh.interior_slices
    ui = u[sl]
    conc = ui[:, 5] / ui[:, 0]
    x, y, z = _interior_centers(sim)
    in_jet = ((np.sqrt(x ** 2 + y ** 2) < rj) & (np.abs(z) >= off)
              & (np.abs(z) <= off + thick))
    # jet-region cells were reset to concentration 1 at the last stage
    assert conc[in_jet].min() > 0.99, \
        f"jet conc min {conc[in_jet].min():.3f}"
    assert conc[~in_jet].max() < 0.99  # only short advective leakage

    # the history reduction sees the tracer extent
    from athenapk_tpu.pgen.cluster.pgen import history_columns
    cols = dict(history_columns(sim.pin, sim.mesh, sim.cfg, sim.eos))
    import jax.numpy as jnp
    _, w = sim.pkg.cons_to_prim(sim.u)
    ext = float(cols["agn_extent"](jnp.asarray(sim.u), w, sim.mesh))
    r_jet_max = math.sqrt(rj ** 2 + (off + thick) ** 2)
    assert 0.5 * (off + thick) < ext < 1.5 * r_jet_max, \
        f"agn_extent {ext:.3f} vs jet max radius {r_jet_max:.3f}"


def test_tower_mass_injection_toggle():
    """enable_magnetic_tower_mass_injection=false renormalizes the mass
    fractions over thermal+kinetic (``agn_feedback.cpp:72-82``)."""
    from athenapk_tpu.pgen.cluster.pgen import _pkg
    pin = ParameterInput.from_string(BASE + """
<hydro>
fluid = glmmhd

<problem/cluster/agn_feedback>
fixed_power = 1e-3
thermal_fraction = 0.25
kinetic_fraction = 0.25
magnetic_fraction = 0.5
enable_magnetic_tower_mass_injection = false
""")
    fb = _pkg(pin).agn_feedback
    assert abs(fb.thermal_fraction - 0.25) < 1e-14
    assert abs(fb.magnetic_fraction - 0.5) < 1e-14
    assert abs(fb.thermal_mass_fraction - 0.5) < 1e-14
    assert abs(fb.kinetic_mass_fraction - 0.5) < 1e-14
    assert fb.magnetic_mass_fraction == 0.0


def test_booth_schaye_boost():
    """BOOTH_SCHAYE: alpha = (n/n0)^beta above n0, 1 below
    (``agn_triggering.cpp`` Booth & Schaye 2009 boost)."""
    import jax.numpy as jnp
    pin = ParameterInput.from_string(BASE + """
<hydro>
fluid = euler

<problem/cluster/gravity>
m_smbh = 1e-2

<problem/cluster/agn_triggering>
triggering_mode = BOOTH_SCHAYE
accretion_radius = 0.2
bondi_n0 = 0.5
bondi_beta = 2.0
""")
    from athenapk_tpu.pgen.cluster.agn_triggering import AGNTriggering
    from athenapk_tpu.utils.units import Units
    un = Units(pin)
    he = 0.25
    mu = 1.0 / (he * 3.0 / 4.0 + (1 - he) * 2.0)
    mbar_over_kb = mu * un.mh() / un.k_boltzmann()
    trig = AGNTriggering(pin, un, mbar_over_kb, 5.0 / 3.0)

    rho, pres = 1.0, 1.0
    cs = math.sqrt(5.0 / 3.0 * pres / rho)
    n = rho / (mbar_over_kb * un.k_boltzmann())
    p = {"w": jnp.asarray(1.0), "w_rho": jnp.asarray(rho),
         "w_v": jnp.asarray(0.0), "w_cs": jnp.asarray(cs)}
    got = float(trig.rate_from_partials(p))
    G = un.gravitational_constant()
    boost = max(1.0, (n / 0.5) ** 2.0)
    want = boost * 2.0 * math.pi * G ** 2 * 1e-4 * rho / cs ** 3
    assert abs(got - want) / want < 1e-12
