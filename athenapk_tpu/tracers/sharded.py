"""Sharded tracer advection: per-shard fixed-capacity pools with
neighbor-shard handoff via ``jax.lax.ppermute`` (SURVEY §2c swarms;
reference swarm MPI routing ``src/hydro/hydro_driver.cpp:617-660``).

The fluid state shards over the block axis in z-layer chunks
(``parallel/halo.py``); tracer arrays ``[nblocks, cap]`` shard the same
way.  A particle moves at the fluid velocity, so per cycle it travels
less than one cell (CFL < 1) — far less than one block — hence a
particle can only ever hop to a RING-ADJACENT shard.  Migration is
therefore:

1. route in-shard movers with the same ``scatter_pool`` sort the
   single-device path uses (local, no collective);
2. pack the (at most one block-layer of) leavers into fixed-capacity
   transfer buffers and ``ppermute`` them one hop up/down the ring —
   the direct ICI analog of Parthenon's per-neighbor swarm
   Send/Receive, with NO full-pool all-gather or all-to-all;
3. merge received buffers into the extended local pool and scatter.

Ring wrap = periodic z; on non-periodic z the domain BCs have already
deactivated leavers, so the wrap legs carry empty buffers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from .tracers import particle_fields, scatter_pool

try:  # jax >= 0.8 moved shard_map to the top level
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_sharded_tracer_ops(tracers, dmesh, axis_name: str = "blocks"):
    """(advect_fn, fill_fn) over a 1-D block-axis device mesh.

    ``advect_fn(state, prim, dt) -> state`` and
    ``fill_fn(state, prim) -> state`` take globally-sharded arrays
    (tracer fields ``P(axis_name)`` on the block axis, prim likewise);
    ``n_lost`` is kept replicated via ``psum``.
    """
    mesh = tracers.mesh
    n_dev = int(dmesh.devices.size)
    nb = mesh.nblocks
    if nb % n_dev:
        raise ValueError(f"nblocks={nb} not divisible by {n_dev} devices")
    nb_local = nb // n_dev
    layer = mesh.nb1 * mesh.nb2
    if nb_local % layer:
        raise ValueError(
            f"shard boundary must fall on block z-layers: local count "
            f"{nb_local} is not a multiple of nb1*nb2={layer}")
    cap = tracers.cap
    # worst case: every particle in the shard's boundary z-layer leaves
    # in the same direction within one cycle
    xfer = layer * cap

    def _origins(gid0):
        g = gid0 + jnp.arange(nb_local, dtype=jnp.int32)
        ibx = g % mesh.nb1
        iby = (g // mesh.nb1) % mesh.nb2
        ibz = g // (mesh.nb1 * mesh.nb2)
        return (mesh.x1min + ibx * (mesh.mbnx1 * mesh.dx1),
                mesh.x2min + iby * (mesh.mbnx2 * mesh.dx2),
                mesh.x3min + ibz * (mesh.mbnx3 * mesh.dx3))

    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def _pack(state, mask):
        """Compact the masked particles into an [xfer, ...] buffer."""
        flat = mask.reshape(-1)
        rank = jnp.cumsum(flat) - 1
        slot = jnp.where(flat, rank, xfer).astype(jnp.int32)  # OOB drops
        bufs = {}
        for name in particle_fields(state):
            q = state[name].reshape((-1,) + state[name].shape[2:])
            bufs[name] = (jnp.zeros((xfer + 1,) + q.shape[1:], q.dtype)
                          .at[slot].set(q, mode="drop")[:xfer])
        return bufs

    def _migrate_local(state):
        idx = lax.axis_index(axis_name)
        gid0 = (idx * nb_local).astype(jnp.int32)
        gid = tracers._dest_gid(state)
        active = state["active"]
        shard = gid // nb_local
        d = jnp.mod(shard - idx, n_dev)
        go_up = active & (d == 1)
        if n_dev > 2:
            go_dn = active & (d == n_dev - 1)
            # a multi-hop mover would violate the CFL invariant; drop it
            # (counted) rather than corrupt a neighbor's pool
            stray = active & (d != 0) & ~go_up & ~go_dn
        else:
            # n_dev <= 2: up and down are the same neighbor — route all
            # leavers up so nothing is sent twice; d in {0, 1} always
            go_dn = jnp.zeros_like(active)
            stray = jnp.zeros_like(active)

        buf_up = _pack(state, go_up)
        buf_dn = _pack(state, go_dn)
        recv_up = {k: lax.ppermute(v, axis_name, fwd)
                   for k, v in buf_up.items()}   # arrives from idx-1
        recv_dn = {k: lax.ppermute(v, axis_name, bwd)
                   for k, v in buf_dn.items()}   # arrives from idx+1

        # extended pool: local stayers + both received buffers
        names = particle_fields(state)
        fields = {}
        for name in names:
            q = state[name].reshape((-1,) + state[name].shape[2:])
            fields[name] = jnp.concatenate(
                [q, recv_up[name], recv_dn[name]], axis=0)
        stay = active & (d == 0)
        key_loc = jnp.where(stay, gid - gid0, nb_local).reshape(-1)

        def _recv_key(buf):
            g = tracers._dest_gid(buf)
            return jnp.where(buf["active"], g - gid0, nb_local)

        key = jnp.concatenate(
            [key_loc, _recv_key(recv_up), _recv_key(recv_dn)]
        ).astype(jnp.int32)
        # received keys are in [0, nb_local) by the one-hop invariant;
        # map any (bug-level) out-of-range key to the inactive sentinel
        # so it can only drop, never corrupt another block's slots
        key = jnp.where((key >= 0) & (key <= nb_local), key, nb_local)
        routed, n_overflow = scatter_pool(fields, key, nb_local, cap)
        out = dict(state)
        out.update(routed)
        # RAW local accumulation — _advect_local psums the cycle's
        # whole n_lost delta once (domain-BC deactivations land on
        # n_lost before migration, so the psum must cover both)
        lost = n_overflow + jnp.sum(stray).astype(jnp.int32)
        out["n_lost"] = state["n_lost"] + lost
        return out

    def _advect_local(state, prim_local, dt):
        idx = lax.axis_index(axis_name)
        org = _origins((idx * nb_local).astype(jnp.int32))
        n0 = state["n_lost"]
        out = tracers._advect_impl(state, prim_local, dt, origins=org,
                                   migrate=_migrate_local)
        out["n_lost"] = n0 + lax.psum(out["n_lost"] - n0, axis_name)
        return out

    def _fill_local(state, prim_local):
        idx = lax.axis_index(axis_name)
        org = _origins((idx * nb_local).astype(jnp.int32))
        return tracers._fill_impl(state, prim_local, origins=org)

    def _specs(state):
        return {k: (P() if jnp.ndim(state[k]) == 0 else P(axis_name))
                for k in state}

    # memoize the jitted shard_map wrappers per state structure —
    # rebuilding them per call would retrace/recompile every cycle
    _cache = {}

    def _get(kind, state):
        key = (kind, tuple(sorted(state)))
        if key not in _cache:
            sp = _specs(state)
            if kind == "advect":
                f = shard_map(_advect_local, mesh=dmesh,
                              in_specs=(sp, P(axis_name), P()),
                              out_specs=sp)
            else:
                f = shard_map(_fill_local, mesh=dmesh,
                              in_specs=(sp, P(axis_name)), out_specs=sp)
            _cache[key] = jax.jit(f)
        return _cache[key]

    def advect_fn(state, prim, dt):
        return _get("advect", state)(state, prim, jnp.asarray(dt))

    def fill_fn(state, prim):
        return _get("fill", state)(state, prim)

    return advect_fn, fill_fn
