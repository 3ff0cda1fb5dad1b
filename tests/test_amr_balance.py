"""Sharded-AMR leaf placement with slot padding
(``AmrHydro._place`` / ``_PaddedStepper``).

GSPMD can only place arrays whose sharded axis divides the device
count — bare ``device_put`` of an uneven leaf population crashes — so
each level's leaf axis is padded to the next multiple of D and sliced
back to the exact leaf count inside the stepper's jit.  Real-row
results are bitwise-identical to the unsharded run and per-level
real-leaf imbalance is bounded by one chunk (ceil(c/D) rows).  TPU
analog of Parthenon's SFC chunk balancing
(``parthenon/src/mesh/mesh.cpp`` LoadBalancing).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _real_chunks(c, D):
    """Per-device real-leaf counts for a slot-padded level: slots/D rows
    per device, clipped at the exact count c."""
    s = -(-c // D)
    return np.array([max(0, min(s * (i + 1), c) - s * i) for i in range(D)])


def _mk_amr(sharding):
    from athenapk_tpu.amr import SmrMesh
    from athenapk_tpu.amr.remesh import AmrHydro
    from athenapk_tpu.core.mesh import Mesh as CMesh
    from athenapk_tpu.eos.adiabatic import EOS
    from athenapk_tpu.refinement import RefinementConfig
    from athenapk_tpu.solver.hydro_pkg import HydroConfig

    base = CMesh(nx1=24, nx2=24, nx3=24, mbnx1=8, mbnx2=8, mbnx3=8,
                 x1min=0, x1max=1, x2min=0, x2max=1, x3min=0, x3max=1,
                 nghost=2)
    # 27 coarse blocks; refine one corner block -> 26 coarse + 8 fine:
    # the coarse level does not divide an 8-device mesh
    sm = SmrMesh(base, [(0.0, 0.32, 0.0, 0.32, 0.0, 0.32, 1)])
    eos = EOS(gamma=5.0 / 3.0)
    amr = AmrHydro(sm, HydroConfig(fluid="euler", riemann="hllc",
                                   reconstruction="plm", integrator="rk2"),
                   eos, RefinementConfig(method="maxdensity",
                                         maxdensity_refine_above=1e30),
                   sharding=sharding, layout="padded")
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


def test_padded_placement_balance():
    devs = jax.devices()[:8]
    D = 8
    dmesh = Mesh(np.asarray(devs), ("blocks",))
    shd = NamedSharding(dmesh, P("blocks"))
    amr, eos = _mk_amr(shd)

    counts = {lev: len(ids) for lev, ids in amr.smesh.level_ids.items()}
    assert sorted(counts.values()) == [8, 26]
    assert any(c % D for c in counts.values())  # placement used to crash

    state = {lev: jnp.zeros((c, 5, 12, 12, 12))
             for lev, c in counts.items()}
    placed = amr._place(state)

    # slot shapes are padded to multiples of D and actually distributed
    for lev, v in placed.items():
        assert v.shape[0] % D == 0 and v.shape[0] >= counts[lev]
        assert v.sharding.spec == P("blocks")

    # per-device real totals match the chunk-clipping prediction and
    # stay within one chunk of ideal balance per level
    want_arr = sum(_real_chunks(c, D) for c in counts.values())
    got = amr.device_leaf_counts(placed)
    assert {d: got.get(d, 0) for d in devs} == \
        {d: int(want_arr[i]) for i, d in enumerate(devs)}
    max_chunk = max(-(-c // D) for c in counts.values())
    assert want_arr.max() - want_arr.min() <= \
        sum(1 for c in counts.values() if c % D) * max_chunk

    # _place is idempotent on already-padded state
    placed2 = amr._place(placed)
    for lev in placed:
        assert placed2[lev].shape == placed[lev].shape

    # exact_state strips the padding back off
    ex = amr.exact_state(placed)
    for lev, c in counts.items():
        assert ex[lev].shape[0] == c


@pytest.mark.slow
def test_padded_advance_bitwise_vs_unsharded():
    """2 advance cycles on the uneven-count SMR mesh: sharded
    slot-padded run equals the unsharded run bitwise on real rows."""
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
    st_b = amr_b.exact_state(st_b)

    for lev in st_a:
        np.testing.assert_array_equal(np.asarray(st_a[lev]),
                                      np.asarray(st_b[lev]),
                                      err_msg=f"level {lev}")
