"""Parthenon-compatible .phdf schema: the reference's analysis toolchain
(phdf reader / phdf_diff / compare_analytic, reimplemented clean-room at
scripts/parthenon_tools) must load our dumps directly — uniform AND
mixed-level (VERDICT r3 item 2; reference usage at
tst/regression/test_suites/cluster_hse/cluster_hse.py:184,521)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/scripts")

from parthenon_tools import compare_analytic, phdf, phdf_diff  # noqa: E402

from athenapk_tpu.config.parameter_input import ParameterInput  # noqa: E402
from athenapk_tpu.driver import Simulation, run_from_file  # noqa: E402


@pytest.fixture()
def sod_dump(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sim = run_from_file(
        "/root/reference/inputs/sod.in",
        overrides=["parthenon/mesh/nx1=64", "parthenon/meshblock/nx1=32",
                   "parthenon/time/nlim=2", "parthenon/output0/dt=100.0"],
        quiet=True)
    # count 0 = the t=0 dump; count 1 = the forced final dump, which
    # matches the live post-run state
    return sim, str(tmp_path / "sod.out_prim.00001.phdf")


def test_phdf_reader_loads_uniform_dump(sod_dump):
    sim, fname = sod_dump
    data = phdf.phdf(fname)
    assert data.NumBlocks == 2
    assert data.NumDims == 1
    assert data.MaxLevel == 0
    assert list(data.MeshBlockSize) == [32, 1, 1]
    # faces span each block with uniform spacing dx = 1/64
    assert data.xf.shape == (2, 33)
    np.testing.assert_allclose(np.diff(data.xf), 1.0 / 64.0)
    # centers midway between faces
    np.testing.assert_allclose(
        data.x, 0.5 * (data.xf[:, :-1] + data.xf[:, 1:]))
    # the suites' exact call pattern (riemann_hydro.py:127-135)
    comps = data.GetComponents(data.Info["ComponentNames"], flatten=False)
    assert set(comps) == {"prim_density", "prim_velocity_1",
                          "prim_velocity_2", "prim_velocity_3",
                          "prim_pressure"}
    assert comps["prim_density"].shape == (2, 1, 1, 32)
    zz, yy, xx = data.GetVolumeLocations()
    assert xx.shape == (2 * 32,)
    # values match the live simulation state
    w = sim.prim()
    sl = sim.mesh.interior_slices
    rho_blocks = np.asarray(w)[sl][:, 0]
    np.testing.assert_allclose(comps["prim_density"], rho_blocks,
                               rtol=1e-6)
    # flattened component order matches flattened volume locations:
    # density is monotone non-increasing along x in Sod
    rho_flat = data.GetComponents(["prim_density"])["prim_density"]
    order = np.argsort(xx, kind="stable")
    assert (np.diff(rho_flat[order]) <= 1e-10).all()


def test_compare_analytic_initial_sod(tmp_path, monkeypatch):
    """compare_analytic (cluster_hse.py:549 pattern) on a t=0 sod dump
    against the exact discontinuous initial condition."""
    monkeypatch.chdir(tmp_path)
    run_from_file(
        "/root/reference/inputs/sod.in",
        overrides=["parthenon/mesh/nx1=64", "parthenon/meshblock/nx1=64",
                   "parthenon/time/nlim=0", "parthenon/output0/dt=100.0"],
        quiet=True)
    fname = str(tmp_path / "sod.out_prim.00000.phdf")

    analytic = {
        "prim_density": lambda Z, Y, X, t: np.where(X < 0.5, 1.0, 0.125),
        "prim_pressure": lambda Z, Y, X, t: np.where(X < 0.5, 1.0, 0.1),
        "prim_velocity_1": lambda Z, Y, X, t: np.zeros_like(X),
    }
    assert compare_analytic.compare_analytic(
        fname, analytic,
        err_func=lambda gold, test: compare_analytic.norm_err_func(
            gold, test, norm_ord=np.inf, relative=False), tol=1e-12,
        quiet=True)


def test_phdf_diff(sod_dump, tmp_path):
    _, fname = sod_dump
    # identical files agree
    assert phdf_diff.compare([fname, fname], quiet=True) == 0
    # a perturbed copy is flagged
    import shutil
    import h5py
    other = str(tmp_path / "perturbed.phdf")
    shutil.copy(fname, other)
    with h5py.File(other, "r+") as f:
        d = f["prim"][()]
        d[0, 0, 0, 0, 5] *= 1.5
        del f["prim"]
        f.create_dataset("prim", data=d)
    assert phdf_diff.compare([fname, other], quiet=True,
                             tol=1e-8, relative=True, one=True) > 0
    # ... but passes under a loose tolerance (the cluster_hse call shape)
    assert phdf_diff.compare([fname, other], check_metadata=False,
                             tol=5e-1, relative=True, quiet=True,
                             one=True) == 0


def test_phdf_reader_loads_mixed_level_dump(tmp_path, monkeypatch):
    """Adaptive blast dump: Levels/LogicalLocations + per-block face
    coordinates at each block's own spacing."""
    monkeypatch.chdir(tmp_path)
    run_from_file(
        "/root/repo/inputs/blast_3d_smr.in",
        overrides=["parthenon/mesh/nx1=32", "parthenon/mesh/nx2=32",
                   "parthenon/mesh/nx3=32", "parthenon/meshblock/nx1=8",
                   "parthenon/meshblock/nx2=8", "parthenon/meshblock/nx3=8",
                   "parthenon/output1/file_type=hdf5",
                   "parthenon/output1/variables=prim",
                   "parthenon/output1/dt=-1.0",
                   "parthenon/time/nlim=2"], quiet=True)
    data = phdf.phdf(str(tmp_path / "blast.out1.00000.phdf"))
    levels = np.asarray(data.Levels)
    assert set(levels) == {0, 1}
    assert data.MaxLevel == 1
    # face spacing halves per level
    dx_by_level = {lev: float(np.diff(data.xf[levels == lev][0]).mean())
                   for lev in (0, 1)}
    np.testing.assert_allclose(dx_by_level[0], 2.0 * dx_by_level[1])
    comps = data.GetComponents(["prim_density"], flatten=False)
    assert comps["prim_density"].shape == (len(levels), 8, 8, 8)
    assert np.isfinite(comps["prim_density"]).all()
    # LogicalLocations consistent with block origins
    lls = np.asarray(data.LogicalLocations)
    b0 = np.where(levels == 0)[0][0]
    assert data.xf[b0, 0] == pytest.approx(
        -0.5 + lls[b0, 0] * 8 * dx_by_level[0])


def test_lw_implode_symmetry_via_phdf(tmp_path, monkeypatch):
    """Re-verify the lw_implode symmetry suite through the vendored
    reader (the reference's lw_implode_symmetry.py:53 reads the final
    prim dump through phdf and checks the diagonal reflection)."""
    monkeypatch.chdir(tmp_path)
    deck = """
<job>
problem_id = lw_implode

<problem/lw_implode>
d_in = 0.125
p_in = 0.14
d_out = 1.0
p_out = 1.0

<parthenon/mesh>
nghost = 2
nx1 = 32
x1min = 0.0
x1max = 0.25
nx2 = 32
x2min = 0.0
x2max = 0.25
nx3 = 1
x3min = -0.5
x3max = 0.5
ix1_bc = reflecting
ox1_bc = reflecting
ix2_bc = reflecting
ox2_bc = reflecting

<parthenon/meshblock>
nx1 = 32
nx2 = 32

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 0.1
nlim = 40
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hllc
reconstruction = plm
gamma = 1.4

<parthenon/output0>
file_type = hdf5
variables = prim
dt = 100.0
id = prim
"""
    pin = ParameterInput.from_string(deck)
    Simulation(pin, quiet=True).run()
    data = phdf.phdf(str(tmp_path / "lw_implode.out_prim.00000.phdf"))
    comps = data.GetComponents(
        ["prim_density", "prim_velocity_1", "prim_velocity_2"],
        flatten=False)
    rho = comps["prim_density"][0, 0]       # [ny, nx]
    v1 = comps["prim_velocity_1"][0, 0]
    v2 = comps["prim_velocity_2"][0, 0]
    # diagonal (x,y) -> (y,x) reflection symmetry, bitwise
    assert np.array_equal(rho, rho.T)
    assert np.array_equal(v1, v2.T)


def test_phdf_swarm_read(tmp_path, monkeypatch):
    """GetSwarm on a tracer dump (particle_advection.py:76-80 pattern)."""
    monkeypatch.chdir(tmp_path)
    deck = """
<job>
problem_id = advection

<problem/advection>
vx = 1.0
vy = 0.5
vz = 0.25
rho_ratio = 0.0
rho_radius = 0.0
rho0 = 1.0
p0 = 1.0

<parthenon/mesh>
nghost = 2
nx1 = 16
x1min = 0.0
x1max = 1.0
nx2 = 16
x2min = 0.0
x2max = 1.0
nx3 = 16
x3min = 0.0
x3max = 1.0

<parthenon/meshblock>
nx1 = 8
nx2 = 8
nx3 = 8

<parthenon/time>
integrator = rk2
cfl = 0.4
tlim = 1.0
nlim = 2
ncycle_out = 0

<hydro>
fluid = euler
eos = adiabatic
riemann = hllc
reconstruction = plm
gamma = 1.666666666666667

<tracers>
enabled = true
initial_seed_method = random_per_block
initial_num_tracers_per_cell = 0.05
rng_seed = 7

<parthenon/output0>
file_type = hdf5
variables = prim
dt = 100.0
id = prim
swarms = tracers
tracers_variables = id, x, y, z
"""
    pin = ParameterInput.from_string(deck)
    Simulation(pin, quiet=True).run()
    data = phdf.phdf(str(tmp_path / "advection.out_prim.00000.phdf"))
    tracers = data.GetSwarm("tracers")
    ids = tracers.Get("id")
    assert len(ids) > 0
    assert tracers.x.shape == ids.shape
    assert (np.sort(ids) == np.arange(len(ids))).all()
    assert ((tracers.x >= 0.0) & (tracers.x <= 1.0)).all()
