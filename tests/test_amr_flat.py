"""Flat leaf-axis sharded-AMR layout (``AmrHydro(layout="flat")``,
the default for sharded meshes).

The slot-padded per-level layout bounds imbalance by one CHUNK per
level (up to D-1 real leaves between devices when a level's count
doesn't divide the device count).  The flat layout concatenates ALL
levels' leaves into one leaf-major array and deals them so device ``i``
holds ``N//D + (i < N%D)`` real leaves — exact ±1 global balance, the
TPU analog of Parthenon's SFC chunk load balancing
(``parthenon/src/mesh/mesh.cpp`` LoadBalancingAndAMR).  Pads are
interleaved per device and never touched by compute: the stepper
gathers each level's rows at STATIC indices inside the jit, runs the
per-level step, and scatters back via a static inverse-permutation
gather.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _mk_amr(sharding, layout="flat"):
    from athenapk_tpu.amr import SmrMesh
    from athenapk_tpu.amr.remesh import AmrHydro
    from athenapk_tpu.core.mesh import Mesh as CMesh
    from athenapk_tpu.eos.adiabatic import EOS
    from athenapk_tpu.refinement import RefinementConfig
    from athenapk_tpu.solver.hydro_pkg import HydroConfig

    base = CMesh(nx1=24, nx2=24, nx3=24, mbnx1=8, mbnx2=8, mbnx3=8,
                 x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                 nghost=2)
    # 27 coarse blocks; refine one corner -> 26 coarse + 8 fine = 34
    # total leaves: neither level nor total divides an 8-device mesh
    sm = SmrMesh(base, [(0.0, 0.32, 0.0, 0.32, 0.0, 0.32, 1)])
    eos = EOS(gamma=5.0 / 3.0)
    amr = AmrHydro(sm, HydroConfig(fluid="euler", riemann="hllc",
                                   reconstruction="plm", integrator="rk2"),
                   eos, RefinementConfig(method="maxdensity",
                                         maxdensity_refine_above=1e30),
                   sharding=sharding, layout=layout)
    return amr, eos


def _uniform_state(amr, eos):
    from athenapk_tpu.amr.smr import SmrState
    from athenapk_tpu.eos.adiabatic import prim_to_cons

    sm = amr.smesh
    st = {}
    rng = np.random.default_rng(7)
    for lev, ids in sm.level_ids.items():
        shape = (len(ids), 5) + sm.base.block_shape
        w = np.ones(shape)
        w[:, 1:4] = 0.1 * rng.standard_normal((shape[0], 3) + shape[2:])
        w[:, 4] = 1.0 + 0.1 * rng.random(((shape[0],) + shape[2:]))
        st[lev] = jnp.asarray(np.asarray(prim_to_cons(
            eos, jnp.asarray(w), "euler")))
    return SmrState(sm, 5).fill_ghosts(st)


def test_flat_placement_exact_balance():
    devs = jax.devices()[:8]
    D = 8
    dmesh = Mesh(np.asarray(devs), ("blocks",))
    shd = NamedSharding(dmesh, P("blocks"))
    amr, eos = _mk_amr(shd)

    counts = {lev: len(ids) for lev, ids in amr.smesh.level_ids.items()}
    N = sum(counts.values())
    assert sorted(counts.values()) == [8, 26] and N == 34

    state = {lev: jnp.arange(c, dtype=jnp.float32)[:, None, None, None,
                                                   None]
             * jnp.ones((c, 5, 12, 12, 12))
             for lev, c in counts.items()}
    placed = amr._place(state)

    # ONE flat array, sharded over the device mesh, padded to D*ceil(N/D)
    assert not isinstance(placed, dict)
    assert placed.shape[0] == -(-N // D) * D
    assert placed.sharding.spec == P("blocks")

    # exact ±1 real-leaf balance: N//D or N//D + 1 per device
    got = amr.device_leaf_counts(placed)
    vals = [got.get(d, 0) for d in devs]
    assert sum(vals) == N
    assert max(vals) - min(vals) <= 1
    assert set(vals) <= {N // D, N // D + 1}

    # round trip: exact_state recovers every level bit-for-bit
    ex = amr.exact_state(placed)
    for lev, c in counts.items():
        assert ex[lev].shape[0] == c
        np.testing.assert_array_equal(np.asarray(ex[lev]),
                                      np.asarray(state[lev]))

    # idempotent re-place
    placed2 = amr._place(placed)
    assert placed2.shape == placed.shape


@pytest.mark.slow
def test_flat_advance_bitwise_vs_unsharded():
    """2 advance cycles on the uneven-count mesh: the flat sharded run
    equals the unsharded run bitwise on every level."""
    devs = jax.devices()[:8]
    dmesh = Mesh(np.asarray(devs), ("blocks",))
    shd = NamedSharding(dmesh, P("blocks"))

    amr_a, eos = _mk_amr(None)
    st_a = _uniform_state(amr_a, eos)
    st_a = amr_a.advance(st_a, 2)

    amr_b, _ = _mk_amr(shd)
    st_b = _uniform_state(amr_b, eos)
    st_b = amr_b._place(st_b)
    st_b = amr_b.advance(st_b, 2)
    ex = amr_b.exact_state(st_b)

    for lev in st_a:
        np.testing.assert_array_equal(np.asarray(st_a[lev]),
                                      np.asarray(ex[lev]),
                                      err_msg=f"level {lev}")


@pytest.mark.slow
def test_flat_adaptive_remesh_balance():
    """Adaptive evolution with remeshes under the flat layout: after
    every remesh the NEW leaf population is re-dealt with exact ±1
    balance, and results match the unsharded adaptive run bitwise."""
    from athenapk_tpu.amr import SmrMesh
    from athenapk_tpu.amr.remesh import AmrHydro
    from athenapk_tpu.amr.smr import SmrState
    from athenapk_tpu.core.mesh import Mesh as CMesh
    from athenapk_tpu.eos.adiabatic import EOS, prim_to_cons
    from athenapk_tpu.refinement import RefinementConfig
    from athenapk_tpu.solver.hydro_pkg import HydroConfig

    base = CMesh(nx1=16, nx2=16, nx3=16, mbnx1=8, mbnx2=8, mbnx3=8,
                 x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                 nghost=2)
    eos = EOS(gamma=5.0 / 3.0)
    cfg = HydroConfig(fluid="euler", riemann="hllc",
                      reconstruction="plm", integrator="rk2")
    rcfg = RefinementConfig(method="maxdensity",
                            maxdensity_refine_above=1.3,
                            maxdensity_deref_below=1.05)

    def blob_state(sm):
        st = {}
        for lev, ids in sm.level_ids.items():
            shape = (len(ids), 5) + sm.base.block_shape
            w = np.ones(shape)
            w[:, 1:4] = 0.0
            w[:, 4] = 1.0
            st[lev] = jnp.asarray(np.asarray(prim_to_cons(
                eos, jnp.asarray(w), "euler")))
        # density bump in one corner block so the criterion refines it
        st[0] = st[0].at[0, 0].mul(1.5)
        return SmrState(sm, 5).fill_ghosts(st)

    sm_a = SmrMesh(base, [], max_level=1)
    amr_a = AmrHydro(sm_a, cfg, eos, rcfg, derefine_count=1)
    st_a = amr_a.advance(blob_state(sm_a), 3)

    jm = Mesh(np.asarray(jax.devices()[:8]), ("blocks",))
    shd = NamedSharding(jm, P("blocks"))
    sm_b = SmrMesh(base, [], max_level=1)
    amr_b = AmrHydro(sm_b, cfg, eos, rcfg, derefine_count=1, sharding=shd)
    st_b = amr_b.advance(blob_state(sm_b), 3)

    assert amr_b.smesh.max_level > 0  # the remesh actually refined
    got = amr_b.device_leaf_counts(st_b)
    vals = [got.get(d, 0) for d in jax.devices()[:8]]
    N = amr_b.smesh.levels.size
    assert sum(vals) == N and max(vals) - min(vals) <= 1

    ex = amr_b.exact_state(st_b)
    for lev in amr_a.exact_state(st_a):
        np.testing.assert_array_equal(np.asarray(st_a[lev]),
                                      np.asarray(ex[lev]),
                                      err_msg=f"level {lev}")
