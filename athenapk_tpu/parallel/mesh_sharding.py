"""Multi-chip distribution of the block-structured mesh.

TPU-native counterpart of the reference's MPI domain decomposition
(SURVEY §2d: MeshBlocks distributed over ranks, halo exchange + scalar
allreduces as the only inter-rank traffic; ``AddBoundaryExchangeTasks``
``src/hydro/hydro_driver.cpp:567``).

Design: GSPMD.  The state array ``[nblocks, nvar, NZ, NY, NX]`` is sharded
over the leading block axis on a 1-D ``jax.sharding.Mesh`` (axis ``"blocks"``).
Because block ordering is x-fastest/z-slowest (``core.mesh.Mesh``), an even
shard over ``nblocks`` is a contiguous slab decomposition in z: the
roll-based ghost exchange along the z block-grid axis becomes an XLA
``collective-permute`` of face slabs over ICI, while x/y exchanges stay
device-local.  Scalar reductions (dt min, c_h, history sums) lower to
``all-reduce``.  No application code changes — the same jitted ``step``
runs 1-chip or N-chip; only the shardings differ.

Constraint: ``mesh.nb3 % n_devices == 0`` (blocks divide evenly over the
device axis).  For 2-D device meshes (pods), shard over (nb3, nb2) —
planned extension.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P


def make_device_mesh(devices: Optional[Sequence] = None,
                     axis_name: str = "blocks") -> DeviceMesh:
    devices = list(devices if devices is not None else jax.devices())
    return DeviceMesh(np.array(devices), (axis_name,))

def make_block_sharding(dmesh: DeviceMesh, axis_name: str = "blocks"
                        ) -> NamedSharding:
    """Sharding for [nblocks, nvar, NZ, NY, NX] over the block axis."""
    return NamedSharding(dmesh, P(axis_name))


def replicated(dmesh: DeviceMesh) -> NamedSharding:
    return NamedSharding(dmesh, P())


def shard_state(u, mesh, dmesh: DeviceMesh, axis_name: str = "blocks"):
    """Place the state on the device mesh, sharded over blocks.

    Validates the z-slab divisibility constraint so each device owns whole
    z-layers of the block grid (keeps x/y halo exchange device-local).
    """
    ndev = dmesh.devices.size
    if mesh.nblocks % ndev != 0:
        raise ValueError(
            f"nblocks={mesh.nblocks} not divisible by {ndev} devices")
    per = mesh.nblocks // ndev
    layer = mesh.nb1 * mesh.nb2
    if per % layer != 0 and ndev > 1:
        raise ValueError(
            f"blocks-per-device {per} must be a multiple of one z-layer "
            f"({layer} blocks) for slab decomposition; adjust meshblock "
            f"size or device count")
    return jax.device_put(u, make_block_sharding(dmesh, axis_name))
