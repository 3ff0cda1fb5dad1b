"""History output: interior-only reductions + unified uniform/SMR schema
(VERDICT round-2 item 10; reference ``HydroHst`` hydro.cpp:145-208)."""

import os

import jax.numpy as jnp
import numpy as np

from athenapk_tpu.core.mesh import Mesh
from athenapk_tpu.outputs.history import HistoryOutput, hydro_history_columns


def test_mass_excludes_ghosts():
    """Volume sums must count interior cells only (ghosts are neighbor
    copies; with 8 blocks of 8^3+2g the old full-array sum gave 3.375x)."""
    mesh = Mesh(nx1=16, nx2=16, nx3=16, mbnx1=8, mbnx2=8, mbnx3=8,
                x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                nghost=2)
    u = jnp.ones((8, 5) + mesh.block_shape)
    cols = dict((c[0], c) for c in hydro_history_columns("euler"))
    mass = float(cols["mass"][1](u, u, mesh))
    np.testing.assert_allclose(mass, 1.0, rtol=1e-14)


def test_smr_hst_uses_full_schema(tmp_path):
    """The refined-mesh driver writes the SAME .hst schema as the uniform
    one (mass/momenta/KE/tot-E), with the mass column equal to the
    volume-weighted cross-level total."""
    from athenapk_tpu.driver import run_from_file
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = run_from_file("/root/repo/inputs/blast_3d_smr.in",
                            ["parthenon/mesh/nx1=32",
                             "parthenon/mesh/nx2=32",
                             "parthenon/mesh/nx3=32",
                             "parthenon/meshblock/nx1=8",
                             "parthenon/meshblock/nx2=8",
                             "parthenon/meshblock/nx3=8",
                             "parthenon/time/nlim=2",
                             "parthenon/time/ncycle_out=0"],
                            quiet=True)
        with open("blast.out0.hst") as fh:
            lines = fh.readlines()
    finally:
        os.chdir(cwd)
    header = lines[1]
    for col in ("[3]=mass", "[4]=1-mom", "[5]=2-mom", "[6]=3-mom",
                "[7]=KE", "[8]=tot-E"):
        assert col in header, f"missing column {col}: {header}"
    row = np.array(lines[2].split(), dtype=float)
    np.testing.assert_allclose(row[2], float(sim.total_mass()), rtol=1e-12)
