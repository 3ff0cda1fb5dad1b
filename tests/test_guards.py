"""Guards + output-cadence semantics pinned by the round-1 advisor review.

- Reflecting BCs with GLM-MHD must hard-error (the reference refuses:
  'Reflecting boundary conditions for MHD need special treatment',
  src/bvals/boundary_conditions_apk.hpp) instead of silently flipping only
  the normal momentum.
- Refined-mesh hdf5 output blocks without a 'dt' key are final-output-only,
  matching the uniform driver's semantics.
"""

import glob

import pytest

from athenapk_tpu.core.mesh import Mesh
from athenapk_tpu.eos.adiabatic import EOS
from athenapk_tpu.solver.hydro_pkg import HydroConfig, HydroPackage


def _mesh(**bcs):
    return Mesh(nx1=16, nx2=16, nx3=16, mbnx1=16, mbnx2=16, mbnx3=16,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=2, **bcs)


def test_reflecting_mhd_rejected():
    mesh = _mesh(ix1_bc="reflecting", ox1_bc="reflecting")
    cfg = HydroConfig(fluid="glmmhd", riemann="hlle", reconstruction="plm",
                      integrator="vl2", cfl=0.3)
    with pytest.raises(ValueError, match="[Rr]eflecting"):
        HydroPackage(mesh, cfg, EOS(gamma=5.0 / 3.0))


def test_reflecting_hydro_allowed():
    mesh = _mesh(ix1_bc="reflecting", ox1_bc="reflecting")
    cfg = HydroConfig(fluid="euler", riemann="hlle", reconstruction="plm",
                      integrator="vl2", cfl=0.3)
    HydroPackage(mesh, cfg, EOS(gamma=5.0 / 3.0))  # must not raise


def test_smr_hdf5_without_dt_is_final_only(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from athenapk_tpu.driver import run_from_file
    run_from_file(
        "/root/repo/inputs/blast_3d_smr.in",
        overrides=["parthenon/mesh/nx1=16", "parthenon/mesh/nx2=16",
                   "parthenon/mesh/nx3=16", "parthenon/meshblock/nx1=8",
                   "parthenon/meshblock/nx2=8", "parthenon/meshblock/nx3=8",
                   "parthenon/output1/file_type=hdf5",
                   "parthenon/output1/variables=prim",
                   "parthenon/time/nlim=3"], quiet=True)
    dumps = sorted(glob.glob(str(tmp_path / "blast.out1.*.phdf")))
    assert len(dumps) == 1, f"expected only the forced final dump: {dumps}"
