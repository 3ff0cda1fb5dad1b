"""Static mesh refinement: level-grouped blocks with coarse-fine coupling.

The TPU-native counterpart of Parthenon's SMR (SURVEY §2c "Block-structured
mesh + AMR"): leaf blocks (from the native forest manager) are grouped by
level into fixed-shape batched arrays; every ghost cell's provenance
(same-level copy / prolongation from a coarse neighbor / restriction from
fine neighbors) is precomputed on the host into gather index maps, so the
runtime ghost fill is pure `take`+arithmetic — static shapes, jit-friendly,
and under sharding the gathers become collectives.

Scope (round 1): 3D periodic domains, 2:1-balanced static leaf sets, same
global dt on all levels, cell-centered minmod prolongation / average
restriction (athenapk_tpu.refinement).  Coarse-fine flux correction at
level boundaries replaces the coarse face flux with the restricted fine
fluxes (conservation).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..core.amr_forest import AmrForest
from ..core.mesh import Mesh
from ..refinement.prolong_restrict import prolongate_minmod, restrict_average


def smr_regions_from_deck(pin):
    """Collect ``<parthenon/static_refinement{N}>`` blocks from a parsed
    input deck into SmrMesh region tuples (x0,x1,y0,y1,z0,z1,level).

    Mirrors the reference deck syntax (e.g. inputs/cluster/cluster.in:47-63
    with ``<parthenon/mesh> refinement = static``).
    """
    regions = []
    for name in sorted(pin.blocks):
        if not name.startswith("parthenon/static_refinement"):
            continue
        regions.append((
            pin.get_real(name, "x1min"), pin.get_real(name, "x1max"),
            pin.get_real(name, "x2min"), pin.get_real(name, "x2max"),
            pin.get_real(name, "x3min"), pin.get_real(name, "x3max"),
            pin.get_integer(name, "level")))
    return regions


def _periodicity(base: Mesh):
    return (base.ix1_bc == "periodic", base.ix2_bc == "periodic",
            base.ix3_bc == "periodic")


_ROWMM_MAX = 1 << 22   # one-hot matrix size cap (nb*k entries)


def _rowmm_ok(x, k):
    return (k > 0 and x.shape[0] * k <= _ROWMM_MAX
            and jnp.issubdtype(x.dtype, jnp.floating)
            and os.environ.get("ATHENAPK_SMR_ROWMM") != "0")


def _dus(x, idx, vals):
    """``x.at[idx].set(vals)`` for an all-static-slice ``idx`` via one
    dynamic-update-slice.  This jax version lowers ``.at[slices].set``
    to HLO scatter (even with static, unique indices); DUS keeps the
    write a single in-place region update.  ``vals`` must exactly match
    the slice extents (no strides)."""
    starts = []
    for ax, sl in enumerate(idx):
        starts.append(0 if sl == slice(None) else (sl.start or 0))
    starts += [0] * (x.ndim - len(starts))
    return jax.lax.dynamic_update_slice(x, vals, tuple(starts))


def _take_rows(x, idx):
    """``x[idx]`` on the leading (leaf) axis without an HLO gather.

    TPU lowers leaf-axis gathers/scatters with index arrays to
    sequential per-index loops; ~300 of them made the slab fill
    dispatch-bound (56 ms against ~2 ms of actual slab traffic at the
    AMR bench geometry).  The index arrays are compile-time constants,
    so each row move becomes a static 0/1 matrix contraction on the
    MXU instead.  Exact: one-hot rows pick out single values and
    ``Precision.HIGHEST`` keeps the f32 mantissa intact (0*v terms add
    exact zeros for finite v).  Falls back to fancy indexing for huge
    leaf counts (the one-hot is O(nb*k)) or under
    ``ATHENAPK_SMR_ROWMM=0``.
    """
    idx = np.asarray(idx)
    if not _rowmm_ok(x, idx.size):
        return x[idx]
    m = np.zeros((idx.size, x.shape[0]), dtype=x.dtype)
    m[np.arange(idx.size), idx] = 1
    return jnp.einsum("ij,j...->i...", jnp.asarray(m), x,
                      precision=jax.lax.Precision.HIGHEST)


def _set_rows(x, idx, vals):
    """``x.at[idx].set(vals)`` on the leaf axis without an HLO scatter
    (same rationale and fallbacks as ``_take_rows``); ``idx`` must be
    unique.  The embed multiplies every ``vals`` row by 0/1 and sums,
    so a non-finite value in one written row contaminates the OTHER
    written rows of the same batch (0*nan==nan) — fill inputs are
    finite by construction (FOFC rescues non-finite cells before the
    next fill); untouched rows keep ``x`` via the select.
    """
    idx = np.asarray(idx)
    if not _rowmm_ok(x, idx.size):
        return x.at[idx].set(vals)
    nb = x.shape[0]
    p = np.zeros((nb, idx.size), dtype=x.dtype)
    p[idx, np.arange(idx.size)] = 1
    emb = jnp.einsum("ij,j...->i...", jnp.asarray(p), vals,
                     precision=jax.lax.Precision.HIGHEST)
    mask = np.zeros((nb,) + (1,) * (x.ndim - 1), bool)
    mask[idx] = True
    return jnp.where(jnp.asarray(mask), emb, x)


class SmrMesh:
    """Leaf-block geometry for a static refined mesh.

    Built from a base ``Mesh`` (whose meshblock defines the per-block cell
    count at every level) plus refinement regions [(x1min,x1max,...,level)].
    """

    def __init__(self, base: Mesh, regions, max_level=None):
        if base.ndim < 1:
            raise ValueError("SMR needs at least a 1-D mesh")
        self.base = base
        # max_level: refinement ceiling (the deck's <parthenon/mesh>
        # numlevel - 1); defaults to the deepest static region
        region_max = max((r[-1] for r in regions), default=0)
        if max_level is None:
            max_level = region_max
        if max_level < region_max:
            raise ValueError("max_level below deepest static region")
        forest = AmrForest(base.nb1, base.nb2, base.nb3, ndim=base.ndim,
                           max_level=max_level,
                           periodic=_periodicity(base))
        # iteratively refine blocks intersecting each region up to its
        # level; inactive dimensions never refine (scale factor 1)
        act2 = base.nx2 > 1
        act3 = base.nx3 > 1
        for _ in range(region_max):
            levels, lx1, lx2, lx3 = forest.leaves()
            tags = np.zeros(forest.num_leaves, np.int32)
            for (x0, x1, y0, y1, z0, z1, lev) in regions:
                for i in range(forest.num_leaves):
                    if levels[i] >= lev:
                        continue
                    s = 1 << levels[i]
                    w1 = (base.x1max - base.x1min) / (base.nb1 * s)
                    w2 = (base.x2max - base.x2min) / (
                        base.nb2 * (s if act2 else 1))
                    w3 = (base.x3max - base.x3min) / (
                        base.nb3 * (s if act3 else 1))
                    bx0 = base.x1min + lx1[i] * w1
                    by0 = base.x2min + lx2[i] * w2
                    bz0 = base.x3min + lx3[i] * w3
                    if (bx0 < x1 and bx0 + w1 > x0 and by0 < y1
                            and by0 + w2 > y0 and bz0 < z1
                            and bz0 + w3 > z0):
                        tags[i] = 1
            if not tags.any():
                break
            forest.update(tags)
        self._adopt_forest(forest)

    def _adopt_forest(self, forest):
        self.forest = forest
        self.levels, self.lx1, self.lx2, self.lx3 = forest.leaves()
        self.max_level = int(self.levels.max())
        # only levels that actually hold leaves (a fully-refined mesh has
        # no level-0 blocks; empty batches would break the reductions)
        self.level_ids = {lev: ids for lev in range(self.max_level + 1)
                          if (ids := np.where(self.levels == lev)[0]).size}
        # lookup: (level, lx1, lx2, lx3) -> global leaf id
        self._by_loc = {(int(l), int(a), int(b), int(c)): i
                        for i, (l, a, b, c) in enumerate(
                            zip(self.levels, self.lx1, self.lx2, self.lx3))}

    @classmethod
    def from_leaf_table(cls, base: Mesh, levels, lx1, lx2, lx3,
                        max_level=None):
        """Rebuild a mesh matching a saved leaf table (restart path):
        replay refine-only tags on a fresh forest until the leaf set
        matches.  Any 2:1-balanced leaf set is reachable this way."""
        levels = np.asarray(levels)
        if max_level is None:
            max_level = int(levels.max())
        forest = AmrForest(base.nb1, base.nb2, base.nb3, ndim=base.ndim,
                           max_level=max_level,
                           periodic=_periodicity(base))
        target = {(int(l), int(a), int(b), int(c))
                  for l, a, b, c in zip(levels, lx1, lx2, lx3)}
        for _ in range(max_level + 1):
            cur_lev, ca, cb, cc = forest.leaves()
            tags = np.zeros(forest.num_leaves, np.int32)
            for i in range(forest.num_leaves):
                key = (int(cur_lev[i]), int(ca[i]), int(cb[i]),
                       int(cc[i]))
                if key not in target:
                    tags[i] = 1   # some target leaf is deeper here
            if not tags.any():
                break
            forest.update(tags)
        sm = cls.__new__(cls)
        sm.base = base
        sm._adopt_forest(forest)
        got = {(int(l), int(a), int(b), int(c)) for l, a, b, c in
               zip(sm.levels, sm.lx1, sm.lx2, sm.lx3)}
        if got != target:
            raise ValueError("leaf table replay failed (table not "
                             "2:1-balanced or level out of range)")
        return sm

    @classmethod
    def from_forest(cls, base: Mesh, forest):
        """Wrap an existing (already refined/updated) forest — the dynamic
        AMR path, where ``forest.update`` has just been applied."""
        sm = cls.__new__(cls)
        sm.base = base
        sm._adopt_forest(forest)
        return sm

    def _scales(self, level):
        """Per-dimension refinement scale: 2^level on active dims, 1 on
        inactive (a 2-D mesh never refines z)."""
        b = self.base
        s = 1 << level
        return (s, s if b.nx2 > 1 else 1, s if b.nx3 > 1 else 1)

    def dx(self, level):
        b = self.base
        s1, s2, s3 = self._scales(level)
        return (b.dx1 / s1, b.dx2 / s2, b.dx3 / s3)

    def min_dx(self, level):
        """Minimum cell width over ACTIVE dims at a level (the SMR
        analog of ``Mesh.min_dx``)."""
        b = self.base
        d = self.dx(level)
        return min(d[i] for i, n in enumerate((b.nx1, b.nx2, b.nx3))
                   if n > 1)

    def find(self, level, a, b, c):
        """Leaf id at location, or -1."""
        return self._by_loc.get((level, a, b, c), -1)

    def wrap(self, level, a, b, c):
        """Wrap a neighbor location periodically; ``None`` when it
        crosses a non-periodic domain boundary (physical-BC face)."""
        per = _periodicity(self.base)
        s1, s2, s3 = self._scales(level)
        ext = (self.base.nb1 * s1, self.base.nb2 * s2,
               self.base.nb3 * s3)
        out = []
        for v, e, p in zip((a, b, c), ext, per):
            if 0 <= v < e:
                out.append(v)
            elif p:
                out.append(v % e)
            else:
                return None
        return tuple(out)

    def block_origin(self, leaf_id):
        lev = int(self.levels[leaf_id])
        s1, s2, s3 = self._scales(lev)
        w1 = self.base.dx1 * self.base.mbnx1 / s1
        w2 = self.base.dx2 * self.base.mbnx2 / s2
        w3 = self.base.dx3 * self.base.mbnx3 / s3
        return (self.base.x1min + self.lx1[leaf_id] * w1,
                self.base.x2min + self.lx2[leaf_id] * w2,
                self.base.x3min + self.lx3[leaf_id] * w3)

    def cell_centers_leaf(self, leaf_id):
        """Ghost-inclusive cell centers (x, y, z broadcastable) for a leaf."""
        b = self.base
        lev = int(self.levels[leaf_id])
        d1, d2, d3 = self.dx(lev)
        x0, y0, z0 = self.block_origin(leaf_id)
        x = x0 + (np.arange(b.NX) - b.ng1 + 0.5) * d1
        y = y0 + (np.arange(b.NY) - b.ng2 + 0.5) * d2
        z = z0 + (np.arange(b.NZ) - b.ng3 + 0.5) * d3
        return (x[None, None, :], y[None, :, None], z[:, None, None])


class SmrState:
    """Per-level batched state + precomputed ghost-fill plans."""

    def __init__(self, smesh: SmrMesh, nvar: int, custom_bcs=None):
        self.smesh = smesh
        self.nvar = nvar
        # problem-registered BCs (cloud inflow etc.): {bc_name:
        # fn(u, didx, gsl, lev, axis, lo) -> u} applied to the per-level
        # batched array; the refined-mesh analog of the uniform path's
        # custom registry (core/boundaries.py:87-91)
        self.custom_bcs = custom_bcs or {}
        b = smesh.base
        self.block_shape = b.block_shape
        # per-array-axis descriptors (axis 1=z, 2=y, 3=x of the
        # [nvar, NZ, NY, NX] block layout); inactive dimensions
        # (2-D/1-D decks) carry no ghosts, never halve, and have no
        # faces — the machinery below is dimension-generic through them
        self.ndim = b.ndim
        self.n_of = {3: b.mbnx1, 2: b.mbnx2, 1: b.mbnx3}
        self.g_of = {3: b.ng1, 2: b.ng2, 1: b.ng3}
        self.act = {3: True, 2: b.nx2 > 1, 1: b.nx3 > 1}
        self.half_of = {ax: (n // 2 if self.act[ax] else n)
                        for ax, n in self.n_of.items()}
        self.nfaces = 2 * self.ndim
        self.noct = 1 << self.ndim          # children per refinement
        active_mb = [self.n_of[ax] for ax in (1, 2, 3) if self.act[ax]]
        if b.nghost > min(active_mb) // 2:
            raise ValueError("SMR requires nghost <= meshblock/2 (the "
                             "restricted fine slab must cover the ghosts)")
        # plans[level] = list of fill ops; built lazily below
        self._plans = {lev: self._build_plan(lev)
                       for lev in smesh.level_ids}
        self._batch = self._build_batches()

    def _obit(self, oc):
        """Octant bit per array axis (forest encoding: x=bit0, y=bit1,
        z=bit2; inactive bits are always 0 since oc < 2^ndim)."""
        return {3: oc & 1, 2: (oc >> 1) & 1, 1: (oc >> 2) & 1}

    def _build_batches(self):
        """Group plan ops into batched gathers: one (gather, set) per
        (level, face[, octant]) instead of per block — shrinks the op
        graph (and jit compile time) by ~nblocks."""
        loc_of = {}
        for lev, ids in self.smesh.level_ids.items():
            for li, gid in enumerate(ids):
                loc_of[gid] = (lev, li)
        batch = {}
        for lev, plan in self._plans.items():
            same = {f: ([], []) for f in range(self.nfaces)}
            coarse = {}
            fine = {f: ([], []) for f in range(self.nfaces)}
            for (li, face, kind, payload) in plan:
                if kind == "same":
                    slev, sli = loc_of[payload]
                    same[face][0].append(li)
                    same[face][1].append(sli)
                elif kind == "coarse":
                    cgid, octant = payload
                    _, cli = loc_of[cgid]
                    d, s = coarse.setdefault((face, octant), ([], []))
                    d.append(li)
                    s.append(cli)
                elif kind == "fine":
                    kids = sorted(payload)  # by octant
                    fine[face][0].append(li)
                    fine[face][1].append([loc_of[kid][1]
                                          for (_, kid) in kids])
            phys = {f: [] for f in range(self.nfaces)}
            for (li, face, kind, payload) in plan:
                if kind == "phys":
                    phys[face].append(li)
            batch[lev] = {
                "phys": {f: np.asarray(d, np.int32)
                         for f, d in phys.items() if d},
                "same": {f: (np.asarray(d, np.int32),
                             np.asarray(s, np.int32))
                         for f, (d, s) in same.items() if d},
                "coarse": {k: (np.asarray(d, np.int32),
                               np.asarray(s, np.int32))
                           for k, (d, s) in coarse.items()},
                "fine": {f: (np.asarray(d, np.int32),
                             np.asarray(s, np.int32))
                         for f, (d, s) in fine.items() if d},
            }
        return batch

    # ---------------------------------------------------------------- plans
    def _build_plan(self, lev):
        """For each block at this level and each of the 6 faces, record the
        provenance: ('same', src_leaf) | ('coarse', src_leaf, octant) |
        ('fine', [src leaves in face order]).

        Ghost fill then runs face-by-face with batched gathers per kind.
        """
        sm = self.smesh
        ops = []  # (block_local_idx, face, kind, payload)
        ids = sm.level_ids[lev]
        offsets = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0),
                   (0, 0, -1), (0, 0, 1)][:self.nfaces]
        for loc_i, gid in enumerate(ids):
            a, b_, c = int(sm.lx1[gid]), int(sm.lx2[gid]), int(sm.lx3[gid])
            for face, (dx, dy, dz) in enumerate(offsets):
                loc = sm.wrap(lev, a + dx, b_ + dy, c + dz)
                if loc is None:
                    # crosses a non-periodic domain boundary
                    ops.append((loc_i, face, "phys", None))
                    continue
                na, nb_, nc = loc
                same = sm.find(lev, na, nb_, nc)
                if same >= 0:
                    ops.append((loc_i, face, "same", same))
                    continue
                coarse = sm.find(lev - 1, na // 2, nb_ // 2, nc // 2) \
                    if lev > 0 else -1
                if coarse >= 0:
                    # octant of MY neighbor-location within the coarse block
                    octant = (na & 1) | ((nb_ & 1) << 1) | ((nc & 1) << 2)
                    ops.append((loc_i, face, "coarse", (coarse, octant)))
                    continue
                # fine neighbors: only the 2^(ndim-1) children of the
                # neighbor location TOUCHING my face must be leaves at
                # lev+1 (the far-side children may themselves be refined
                # deeper — legal under 2:1 balance, which constrains
                # only face-adjacent leaves).  Inactive dims never split
                # (the forest's lx stays 0 and its octant bit is 0).
                b = sm.base
                fa = 2 * na
                fb = 2 * nb_ if b.nx2 > 1 else nb_
                fc = 2 * nc if b.nx3 > 1 else nc
                bit = face // 2          # octant bit along the face axis
                want = 1 if face % 2 == 0 else 0
                kids = []
                for oc in range(self.noct):
                    if (oc >> bit) & 1 != want:
                        continue
                    ka = fa + (oc & 1)
                    kb = fb + ((oc >> 1) & 1)
                    kc = fc + ((oc >> 2) & 1)
                    kid = sm.find(lev + 1, ka, kb, kc)
                    if kid >= 0:
                        kids.append((oc, kid))
                if len(kids) == self.noct // 2:
                    ops.append((loc_i, face, "fine", kids))
                else:
                    raise RuntimeError(
                        f"SMR neighbor resolution failed at level {lev} "
                        f"block {gid} face {face}")
        return ops

    # ------------------------------------------------------------ ghost fill
    def fill_ghosts(self, state):
        """state: {level: [nb_lev, nvar, NZ, NY, NX]} -> ghost-filled.

        Slab-assembly formulation (round 4): the original scatter
        formulation chained ~260 full-array ``.at[].set`` updates per
        level whose operands stayed live (later passes re-read the
        pre-update binding), so XLA copy-inserted nearly every one —
        ~24 GB of HBM writes per fill at the AMR bench geometry, 20x
        the cost of the actual solve.  Here every ghost slab is
        assembled out-of-place from slab-sized gathers (sources are
        pre-SLICED to strips before the leaf-axis gather, never
        gather-then-slice on whole blocks) and each level array is
        written by two dynamic-update-slices per axis whose operand is
        dead at the write — in-place for XLA, ~60x less traffic.

        Two passes:
          A. interior-transverse face fill on every level except the
             coarsest (provides valid face ghosts for pass-B
             restriction reads into parents);
          B. per level COARSEST FIRST (the parent is fully filled —
             corners included — before any child prolongs from it),
             axes sequential with expanding transverse extents
             (x interior; y carries x ghosts; z carries x+y), which
             reproduces the scatter path's corner semantics: same and
             prolongation corners exact, fine-restricted edges valid
             to transverse depth nghost//2.

        Kind sources: same/fine read source INTERIORS only (order-
        free); prolongation margins read the parent's already-complete
        fill.  ``ATHENAPK_SMR_FILL=scatter`` selects the original
        formulation (kept for A/B and as the reference semantics).
        """
        mode = os.environ.get("ATHENAPK_SMR_FILL")
        if mode == "scatter":
            return self._fill_ghosts_scatter(state)
        if mode == "buffered" and not self.custom_bcs:
            # write-once buffer composition: bitwise-identical
            # (test_smr_fill_ab) and slightly faster standalone
            # (8.3 vs 9.7 ms at the AMR bench geometry), but it
            # composes WORSE with the stage kernels (76 vs 45 ms per
            # composed step) — kept opt-in, not the default.  Custom
            # BCs are arbitrary functions of the whole level array
            # applied mid-sweep; only the sequential formulation can
            # serve their reads.
            return self._fill_ghosts_buffered(state)
        return self._fill_ghosts_sequential(state)

    def _fill_ghosts_sequential(self, state):
        """Slab assembly with per-axis array writes (the reference
        sequencing made explicit; serves custom-BC decks and
        ``ATHENAPK_SMR_FILL=sequential`` A/B runs)."""
        out = dict(state)
        act_axes = [ax for ax in (3, 2, 1) if self.act[ax]]
        levs = sorted(self.smesh.level_ids)
        for lev in levs[1:]:                          # pass A
            for ax in act_axes:
                out[lev] = self._fill_axis(out, lev, ax, ())
        for lev in levs:                              # pass B
            for i, ax in enumerate(act_axes):
                out[lev] = self._fill_axis(out, lev, ax,
                                           tuple(act_axes[:i]))
        for lev in levs:                              # pass C: phys last
            for ax in act_axes:
                out[lev] = self._fill_axis(out, lev, ax,
                                           tuple(a for a in act_axes
                                                 if a != ax),
                                           phys_only=True)
        return out

    def _fill_ghosts_buffered(self, state):
        """Write-once formulation (round 4, ``ATHENAPK_SMR_FILL=
        buffered``): every slab of every pass is assembled into a
        standalone BUFFER,
        reading only the ORIGINAL state plus chronologically earlier
        buffers (``_buffered_read`` composes the newest covering buffer
        per ghost sub-box — exactly the value the sequential path's
        array would have held at that point).  Each level array is then
        written by ONE dead-operand dynamic-update-slice chain at the
        very end.

        Why: with per-axis array writes, each level array is read and
        re-written ~10 times per fill; XLA cannot prove the update
        operands dead across the ~600-fusion graph and copy-inserts
        most of them (7.2 GB of HBM traffic measured standalone at the
        AMR bench geometry, 37 GB when composed with the stage
        kernels, vs ~0.2 GB of actual slab data).  Pass-A slabs are
        never written to the arrays at all — pass B rewrites every
        face at equal-or-wider extents, so their only consumers are
        pass-B restriction reads, served from the buffers.

        MEASURED OUTCOME (why this is not the default): standalone
        8.3 ms vs sequential's 9.7 — both fills are bound by the ~150
        small one-hot row-move contractions, not by the array updates —
        but COMPOSED with the lane-packed stage kernels the step
        regresses to 76 ms vs 45 (the sub-box concat trees defeat the
        fusion/aliasing pattern that makes the sequential fill cheap
        in-graph).  Kept as a lever and as executable documentation of
        the sequential path's read semantics (the bitwise A/B in
        test_smr_fill_ab.py pins the two together)."""
        act_axes = [ax for ax in (3, 2, 1) if self.act[ax]]
        levs = sorted(self.smesh.level_ids)
        bufs = []   # chronological: (lev, axis, lo, exts, write, gidx, slab)

        def read(l, idx):
            return self._buffered_read(state, bufs, l, idx)

        def run_pass(lev, ax, exts, write, phys_only=False):
            slabs, custom_ops = self._assemble_axis(
                read, lev, ax, exts, phys_only=phys_only)
            assert not custom_ops  # custom BCs take the sequential path
            for lo, (gidx, slab) in slabs.items():
                bufs.append((lev, ax, lo, frozenset(exts), write,
                             gidx, slab))

        for lev in levs[1:]:                          # pass A
            for ax in act_axes:
                run_pass(lev, ax, (), write=False)
        for lev in levs:                              # pass B
            for i, ax in enumerate(act_axes):
                run_pass(lev, ax, tuple(act_axes[:i]), write=True)
        for lev in levs:                              # pass C: phys last
            for ax in act_axes:
                run_pass(lev, ax,
                         tuple(a for a in act_axes if a != ax),
                         write=True, phys_only=True)
        out = dict(state)
        for lev in levs:
            u = out[lev]
            for (l2, _, _, _, write, gidx, slab) in bufs:
                if write and l2 == lev:
                    u = _dus(u, gidx, slab)
            out[lev] = u
        return out

    def _buffered_read(self, state, bufs, lev, idx):
        """Read region ``idx`` (full-array coords) of level ``lev`` as
        the sequential path would see it: per ghost sub-box, the value
        of the chronologically NEWEST buffer covering it, else the
        original (stale-ghost) state.  Requests are decomposed at the
        interior boundaries per axis (<= 3^ndim sub-boxes, re-joined by
        concatenation); slices clamp like basic indexing."""
        n_of, g_of, act = self.n_of, self.g_of, self.act

        def split(ax, s):
            g, n = g_of[ax], n_of[ax]
            lo = 0 if s.start is None else max(s.start, 0)
            hi = 2 * g + n if s.stop is None else min(s.stop, 2 * g + n)
            cuts = ((-1, lo, min(hi, g)),
                    (0, max(lo, g), min(hi, g + n)),
                    (1, max(lo, g + n), hi))
            return [(z, (a, b)) for z, a, b in cuts if a < b]

        def fetch(zones):
            if all(z == 0 or not act[ax]
                   for ax, (z, _) in zones.items()):
                sl = ((slice(None), slice(None))
                      + tuple(slice(*zones[ax][1]) for ax in (1, 2, 3)))
                return state[lev][sl]
            for (blev, a, lo_b, exts, _, _, slab) in reversed(bufs):
                if blev != lev or zones[a][0] != (-1 if lo_b else 1):
                    continue
                if not all(z == 0 or t == a or t in exts or not act[t]
                           for t, (z, _) in zones.items()):
                    continue
                sl = [slice(None), slice(None), None, None, None]
                for t in (1, 2, 3):
                    z, (p, q) = zones[t]
                    if not act[t] or t in exts:
                        off = 0
                    elif t == a:
                        off = 0 if lo_b else g_of[t] + n_of[t]
                    else:
                        off = g_of[t]
                    sl[t + 1] = slice(p - off, q - off)
                return slab[tuple(sl)]
            # no writer yet: stale original ghosts (slab-base reads)
            sl = ((slice(None), slice(None))
                  + tuple(slice(*zones[ax][1]) for ax in (1, 2, 3)))
            return state[lev][sl]

        def rec(ax, zones):
            if ax == 4:
                return fetch(zones)
            s = idx[ax + 1]
            if not act[ax]:
                lo = 0 if s.start is None else max(s.start, 0)
                hi = (n_of[ax] if s.stop is None
                      else min(s.stop, n_of[ax]))
                zones = dict(zones)
                zones[ax] = (0, (lo, hi))
                return rec(ax + 1, zones)
            parts = []
            for z, rng in split(ax, s):
                z2 = dict(zones)
                z2[ax] = (z, rng)
                parts.append(rec(ax + 1, z2))
            return (parts[0] if len(parts) == 1
                    else jnp.concatenate(parts, axis=ax + 1))

        return rec(1, {})

    # ------------------------------------------------- slab-assembly fill
    def _fill_axis(self, out, lev, axis, ext_axes, phys_only=False):
        """Sequential-mode axis fill: assemble the lo/hi ghost slabs of
        ``axis`` reading the CURRENT level arrays (``out``), then write
        them + custom BCs into the level array.  Returns the new level
        array; all reads of the old array precede the two writes."""
        def read(l, idx):
            return out[l][idx]

        new_slabs, custom_ops = self._assemble_axis(read, lev, axis,
                                                    ext_axes, phys_only)
        u = out[lev]
        for gidx, slab in new_slabs.values():
            u = _dus(u, gidx, slab)
        for bc, d, gsl, ax_, lo_ in custom_ops:
            u = self.custom_bcs[bc](u, d, gsl, lev, ax_, lo_)
        return u

    def _assemble_axis(self, read, lev, axis, ext_axes, phys_only=False):
        """Assemble the lo/hi ghost slabs of ``axis`` for one level.
        ``read(level, idx5)`` serves every source read (the sequential
        path passes direct array indexing; the buffered path passes
        ``_buffered_read``).  ``ext_axes``: transverse axes whose ghost
        columns are included (already filled this round).
        ``phys_only``: pass C — re-apply only the physical/custom BCs
        at full transverse extent so boundary corners are consistently
        BC-derived (the scatter path's 'extended runs LAST' rule).
        Returns ({lo: (ghost_region_idx, slab)}, custom_ops)."""
        sm = self.smesh
        n_of, g_of, act = self.n_of, self.g_of, self.act
        half_of = self.half_of
        n, g = n_of[axis], g_of[axis]
        h = half_of[axis]
        gc = (g + 1) // 2            # coarse cells covering g fine ghosts
        fr = g // 2                  # restrict transverse corner depth
        batch = self._batch[lev]

        def tsl(ax, child=False, child_ext=()):
            """Transverse slice for axis ``ax`` in full-array coords:
            ghost-extended if already swept (or requested via
            ``child_ext`` for child strips), else interior."""
            if not act[ax]:
                return slice(0, n_of[ax])
            if child:
                if ax in child_ext:
                    return slice(g_of[ax] - 2 * fr,
                                 g_of[ax] + n_of[ax] + 2 * fr)
                return slice(g_of[ax], g_of[ax] + n_of[ax])
            if ax in ext_axes:
                return slice(0, n_of[ax] + 2 * g_of[ax])
            return slice(g_of[ax], g_of[ax] + n_of[ax])

        def vsl(sl_axis):
            """Full [nb, nvar, z, y, x] index with ``sl_axis`` on the
            fill axis and the pass's transverse extents elsewhere."""
            idx = [slice(None), slice(None), None, None, None]
            for ax in (1, 2, 3):
                idx[ax + 1] = sl_axis if ax == axis else tsl(ax)
            return tuple(idx)

        new_slabs = {}
        custom_ops = []
        for lo in (True, False):
            face = 2 * (3 - axis) + (0 if lo else 1)
            if phys_only and face not in batch["phys"]:
                continue
            ghost = slice(0, g) if lo else slice(g + n, 2 * g + n)
            slab = read(lev, vsl(ghost))              # old content base
            touched = False

            # ---- same-level copies (sources: interiors only)
            if not phys_only and face in batch["same"]:
                d, s = batch["same"][face]
                src = slice(n, n + g) if lo else slice(g, 2 * g)
                strip = read(lev, vsl(src))
                slab = _set_rows(slab, d, _take_rows(strip, s))
                touched = True

            # ---- fine restriction (children interiors + round-A face
            # ghosts to transverse depth 2*fr, one ext axis at a time —
            # the scatter path's (b) redo semantics)
            if not phys_only and face in batch["fine"]:
                d, kidmat = batch["fine"][face]
                nops, nk = kidmat.shape
                bit = face // 2
                want = 1 if lo else 0
                ocs = [oc for oc in range(self.noct)
                       if (oc >> bit) & 1 == want]
                csrc = (slice(g + n - 2 * g, g + n) if lo
                        else slice(g, 3 * g))
                for ext in (None,) + tuple(t for t in ext_axes
                                           if act[t] and fr > 0):
                    cext = (ext,) if ext is not None else ()
                    idx = [slice(None), slice(None), None, None, None]
                    for ax in (1, 2, 3):
                        idx[ax + 1] = (csrc if ax == axis
                                       else tsl(ax, child=True,
                                                child_ext=cext))
                    strip = _take_rows(read(lev + 1, tuple(idx)),
                                       kidmat.reshape(-1))
                    rest = restrict_average(strip, dims=self.ndim)
                    half = {ax: (half_of[ax] + (2 * fr if ax == ext
                                                else 0)) if act[ax]
                            else n_of[ax] for ax in (1, 2, 3)}
                    half[axis] = g
                    rest = rest.reshape((nops, nk, self.nvar,
                                         half[1], half[2], half[3]))
                    ag_n = {ax: n_of[ax] + (2 * fr if ax == ext else 0)
                            for ax in (1, 2, 3)}
                    ag_n[axis] = g
                    agg = jnp.zeros((nops, self.nvar, ag_n[1], ag_n[2],
                                     ag_n[3]), dtype=rest.dtype)
                    for j, oc in enumerate(ocs):
                        ob = self._obit(oc)
                        psl = [slice(None), slice(None), None, None,
                               None]
                        for ax in (1, 2, 3):
                            if ax == axis:
                                psl[ax + 1] = slice(0, g)
                            else:
                                off = (ob[ax] * half_of[ax]
                                       if act[ax] else 0)
                                psl[ax + 1] = slice(off, off + half[ax])
                        agg = _dus(agg, tuple(psl), rest[:, j])
                    # placement into the slab (slab transverse coords:
                    # ext axes span [0, n+2g) -> offset g-fr; interior
                    # axes span [0, n) -> offset 0)
                    ssl = [slice(None), slice(None), None, None, None]
                    for ax in (1, 2, 3):
                        if ax == axis:
                            ssl[ax + 1] = slice(0, g)
                        elif ax == ext:
                            ssl[ax + 1] = slice(g_of[ax] - fr,
                                                g_of[ax] - fr + ag_n[ax])
                        elif ax in ext_axes and act[ax]:
                            ssl[ax + 1] = slice(g_of[ax],
                                                g_of[ax] + n_of[ax])
                        else:
                            ssl[ax + 1] = slice(0, ag_n[ax])
                    reg = (slice(None),) + tuple(ssl[1:])
                    slab = _dus(slab, reg,
                                _set_rows(slab[reg], d, agg))
                    touched = True

            # ---- coarse prolongation (parent fully filled: margins and
            # ghost-extended spans read completed parent ghosts).  The
            # octant groups of a face share sel and strip SHAPE (only
            # the parent read offsets differ), so all groups batch into
            # ONE take + prolong + set — each one-hot row-move runs at
            # trivial MXU utilization and the fill is bound by their
            # COUNT, not their size
            cgroups = {} if phys_only else {
                oct_: ds for (f, oct_), ds in batch["coarse"].items()
                if f == face}
            sel = None
            ogroups = []
            for oct_, (d, s) in cgroups.items():
                ob = self._obit(oct_)
                o_ax = g + ob[axis] * h
                csl = (slice(o_ax + h - gc - 1, o_ax + h + 1) if lo
                       else slice(o_ax - 1, o_ax + gc + 1))
                idx = [slice(None), slice(None), None, None, None]
                sel = [slice(None), slice(None), None, None, None]
                clamped = False
                for ax in (1, 2, 3):
                    if ax == axis:
                        idx[ax + 1] = csl
                        sel[ax + 1] = (slice(2 * gc + 2 - g, 2 * gc + 2)
                                       if lo else slice(2, 2 + g))
                    elif not act[ax]:
                        idx[ax + 1] = slice(0, n_of[ax])
                        sel[ax + 1] = slice(0, n_of[ax])
                    else:
                        o_t = g_of[ax] + ob[ax] * half_of[ax]
                        if ax in ext_axes:
                            idx[ax + 1] = slice(o_t - gc - 1,
                                                o_t + half_of[ax] + gc + 1)
                            sel[ax + 1] = slice(
                                2 * gc + 2 - g_of[ax],
                                2 * gc + 2 + n_of[ax] + g_of[ax])
                        else:
                            idx[ax + 1] = slice(o_t - 1,
                                                o_t + half_of[ax] + 1)
                            sel[ax + 1] = slice(2, 2 + n_of[ax])
                    sl = idx[ax + 1]
                    ext_full = (n_of[ax] + 2 * g_of[ax] if act[ax]
                                else n_of[ax])
                    clamped |= sl.start < 0 or sl.stop > ext_full
                ogroups.append((tuple(idx), d, s, clamped))
            if ogroups and not any(cl for *_, cl in ogroups):
                parts = [read(lev - 1, idx) for idx, *_ in ogroups]
                nbp = parts[0].shape[0]
                big = (jnp.concatenate(parts, axis=0)
                       if len(parts) > 1 else parts[0])
                s_cat = np.concatenate(
                    [np.asarray(s) + k * nbp
                     for k, (_, _, s, _) in enumerate(ogroups)])
                d_cat = np.concatenate(
                    [np.asarray(d) for _, d, _, _ in ogroups])
                strip = _take_rows(big, s_cat)
                fine = prolongate_minmod(strip, dims=self.ndim)
                slab = _set_rows(slab, d_cat, fine[tuple(sel)])
                touched = True
            elif ogroups:
                # a clamped read (g=1-class extents) changes per-octant
                # strip shapes: keep the unbatched path
                for idx, d, s, _ in ogroups:
                    strip = _take_rows(read(lev - 1, idx), s)
                    fine = prolongate_minmod(strip, dims=self.ndim)
                    slab = _set_rows(slab, d, fine[tuple(sel)])
                touched = True

            # ---- physical BCs (own-edge broadcast / mirror; custom
            # hooks deferred to after the full-array write)
            if face in batch["phys"]:
                d = batch["phys"][face]
                b = sm.base
                bc = (b.ix1_bc, b.ox1_bc, b.ix2_bc, b.ox2_bc,
                      b.ix3_bc, b.ox3_bc)[face]
                if bc == "outflow":
                    esl = (slice(g, g + 1) if lo
                           else slice(g + n - 1, g + n))
                    edge = _take_rows(read(lev, vsl(esl)), d)
                    slab = _set_rows(
                        slab, d,
                        jnp.broadcast_to(edge, (d.size, self.nvar)
                                         + slab.shape[2:]))
                    touched = True
                elif bc == "reflecting":
                    from ..core.indices import IM1, IM2, IM3
                    mom_of_axis = {3: IM1, 2: IM2, 1: IM3}
                    msl = slice(g, 2 * g) if lo else slice(n, n + g)
                    mirror = jnp.flip(_take_rows(read(lev, vsl(msl)), d),
                                      axis=axis - 4)
                    signs = [1.0] * self.nvar
                    signs[mom_of_axis[axis]] = -1.0
                    slab = _set_rows(
                        slab, d,
                        jnp.asarray(signs, dtype=mirror.dtype).reshape(
                            (1, self.nvar, 1, 1, 1)) * mirror)
                    touched = True
                elif bc in self.custom_bcs:
                    gsl = tuple(vsl(ghost)[2:])
                    custom_ops.append((bc, d, gsl, axis, lo))
                else:
                    raise ValueError(
                        f"unsupported refined-mesh BC '{bc}' (periodic/"
                        "outflow/reflecting or a problem-registered "
                        "custom BC)")
            if touched:
                new_slabs[lo] = (vsl(ghost), slab)

        return new_slabs, custom_ops

    def _fill_ghosts_scatter(self, state):
        """Original scatter formulation (reference semantics; selected
        via ``ATHENAPK_SMR_FILL=scatter``).

        Fill order (standard AMR sweep): (1) coarse ghosts overlying fine
        regions via restriction, (2) same-level slab copies, (3) fine
        ghosts adjacent to coarse regions via minmod prolongation — so the
        prolongation stencil sees already-valid coarse ghosts.
        """
        sm = self.smesh
        n_of, g_of = self.n_of, self.g_of
        half_of, act = self.half_of, self.act
        out = dict(state)

        def ghost_slab(face):
            """(slice into my block, axis, lo) for the face's ghost slab
            (transverse extent: interior only; corners come via the
            dimension-sweep of repeated fills)."""
            sl = [slice(None)] + [slice(g_of[ax], g_of[ax] + n_of[ax])
                                  for ax in (1, 2, 3)]
            axis = 3 - face // 2
            lo = face % 2 == 0
            g, n = g_of[axis], n_of[axis]
            sl[axis] = slice(0, g) if lo else slice(g + n, 2 * g + n)
            return tuple(sl), axis, lo

        def src_slab(axis, lo):
            """Interior slab of the same-level source block."""
            sl = [slice(None)] + [slice(g_of[ax], g_of[ax] + n_of[ax])
                                  for ax in (1, 2, 3)]
            g, n = g_of[axis], n_of[axis]
            sl[axis] = slice(n, n + g) if lo else slice(g, 2 * g)
            return tuple(sl)

        # batched passes: one gather+scatter per (level, face[, octant])
        for kind_pass in ("fine", "same", "coarse"):
            for lev in sorted(sm.level_ids):
                u = out[lev]
                groups = self._batch[lev][kind_pass]
                if kind_pass == "same":
                    for face, (d, s) in groups.items():
                        gsl, axis, lo = ghost_slab(face)
                        src = out[lev][s][(slice(None),)
                                          + src_slab(axis, lo)]
                        u = u.at[(d,) + gsl].set(src)
                elif kind_pass == "coarse":
                    for (face, octant), (d, s) in groups.items():
                        gsl, axis, lo = ghost_slab(face)
                        ob = self._obit(octant)
                        cu = out[lev - 1][s]
                        # coarse source region: the octant's half plus a
                        # 1-cell minmod margin on ACTIVE axes
                        rsl = [slice(None), slice(None)]
                        for ax in (1, 2, 3):
                            if act[ax]:
                                h = half_of[ax]
                                o = g_of[ax] + ob[ax] * h
                                rsl.append(slice(o - 1, o + h + 1))
                            else:
                                rsl.append(slice(0, n_of[ax]))
                        fine = prolongate_minmod(cu[tuple(rsl)],
                                                 dims=self.ndim)
                        # fine covers virtual neighbor cells [-2, n+2)
                        # on active axes (margin doubles to 2)
                        sel = [slice(None), slice(None)] + [
                            slice(2, n_of[ax] + 2) if act[ax]
                            else slice(0, n_of[ax]) for ax in (1, 2, 3)]
                        g, n = g_of[axis], n_of[axis]
                        sel[axis + 1] = (slice(n - g + 2, n + 2) if lo
                                         else slice(2, 2 + g))
                        u = u.at[(d,) + gsl].set(fine[tuple(sel)])
                else:  # fine (2^(ndim-1) face-touching kids per op)
                    for face, (d, kidmat) in groups.items():
                        gsl, axis, lo = ghost_slab(face)
                        nops = kidmat.shape[0]
                        bit = face // 2
                        want = 1 if face % 2 == 0 else 0
                        ocs = [oc for oc in range(self.noct)
                               if (oc >> bit) & 1 == want]
                        ku = out[lev + 1][kidmat.reshape(-1)]
                        ksl = (slice(None), slice(None)) + tuple(
                            slice(g_of[ax], g_of[ax] + n_of[ax])
                            for ax in (1, 2, 3))
                        rest = restrict_average(
                            ku[ksl], dims=self.ndim).reshape(
                            nops, len(ocs), self.nvar,
                            half_of[1], half_of[2], half_of[3])
                        agg = jnp.zeros((nops, self.nvar, n_of[1],
                                         n_of[2], n_of[3]),
                                        dtype=u.dtype)
                        for idx, oc in enumerate(ocs):
                            ob = self._obit(oc)
                            psl = (slice(None), slice(None)) + tuple(
                                slice(ob[ax] * half_of[ax],
                                      (ob[ax] + 1) * half_of[ax])
                                if act[ax] else slice(0, n_of[ax])
                                for ax in (1, 2, 3))
                            agg = agg.at[psl].set(rest[:, idx])
                        vsl = [slice(None), slice(None)] + [
                            slice(0, n_of[ax]) for ax in (1, 2, 3)]
                        g, n = g_of[axis], n_of[axis]
                        vsl[axis + 1] = (slice(n - g, n) if lo
                                         else slice(0, g))
                        u = u.at[(d,) + gsl].set(agg[tuple(vsl)])
                out[lev] = u
        out = self._apply_phys(out, extended=False)
        out = self._fill_corners(out)
        return self._apply_phys(out, extended=True)

    def _apply_phys(self, out, extended):
        """Physical BCs (outflow / reflecting) on faces that cross a
        non-periodic domain boundary; mirrors the uniform-path semantics
        (core/boundaries.py:79-97): outflow broadcasts the edge cell,
        reflecting mirrors the interior with the normal momentum sign
        flipped.  ``extended`` includes the transverse ghost columns
        (round-2 corners) and runs LAST so boundary corners are
        consistently BC-derived."""
        sm = self.smesh
        b = sm.base
        n_of, g_of = self.n_of, self.g_of
        bc_of_face = (b.ix1_bc, b.ox1_bc, b.ix2_bc, b.ox2_bc,
                      b.ix3_bc, b.ox3_bc)
        from ..core.indices import IM1, IM2, IM3
        mom_of_axis = {3: IM1, 2: IM2, 1: IM3}
        for lev in sm.level_ids:
            u = out[lev]
            groups = self._batch[lev].get("phys", {})
            for face, didx in groups.items():
                bc = bc_of_face[face]
                axis = 3 - face // 2
                lo = face % 2 == 0
                g, n = g_of[axis], n_of[axis]
                base_sl = [slice(None)] + [None] * 3
                for ax in (1, 2, 3):
                    base_sl[ax] = (slice(None) if extended
                                   else slice(g_of[ax],
                                              g_of[ax] + n_of[ax]))
                gsl = list(base_sl)
                gsl[axis] = slice(0, g) if lo else slice(g + n, 2 * g + n)
                blocks = u[didx]
                if bc == "outflow":
                    esl = list(base_sl)
                    esl[axis] = (slice(g, g + 1) if lo
                                 else slice(g + n - 1, g + n))
                    edge = blocks[(slice(None),) + tuple(esl)]
                    ghost = jnp.broadcast_to(
                        edge, blocks[(slice(None),) + tuple(gsl)].shape)
                elif bc == "reflecting":
                    msl = list(base_sl)
                    msl[axis] = slice(g, 2 * g) if lo else slice(n, n + g)
                    mirror = jnp.flip(
                        blocks[(slice(None),) + tuple(msl)], axis=axis - 4)
                    signs = [1.0] * self.nvar
                    signs[mom_of_axis[axis]] = -1.0
                    ghost = jnp.asarray(signs, dtype=u.dtype).reshape(
                        (self.nvar, 1, 1, 1)) * mirror
                elif bc in self.custom_bcs:
                    u = self.custom_bcs[bc](u, didx, tuple(gsl), lev,
                                            axis, lo)
                    continue
                else:
                    raise ValueError(
                        f"unsupported refined-mesh BC '{bc}' (periodic/"
                        "outflow/reflecting or a problem-registered "
                        "custom BC)")
                u = u.at[(didx,) + tuple(gsl)].set(ghost)
            out[lev] = u
        return out

    # ----------------------------------------------------- edge/corner fill
    def _fill_corners(self, out):
        """Round 2 after the face fill: extend each face fill
        transversally so edge/corner ghost cells hold valid data.

        Per level ascending: (a) prolongation redo with both transverse
        selections widened by g (the coarse level below is already
        fully corner-filled), (b) restriction redo widened by g//2 in
        one transverse dim at a time (reading the kids' round-1 face
        ghosts), (c) same-level directional sweep (y-faces carry the
        x-ghost columns, z-faces carry x+y) propagating everything.

        Same/prolongation-sourced corners are exact; fine-restricted
        edges are valid to transverse depth g//2 and triple corners
        over fine regions stay stale — the diffusion cross-stencils
        read at most (face-normal, one-transverse) depth-1 cells, which
        this covers.
        """
        sm = self.smesh
        b = sm.base
        g = b.nghost
        n_of, g_of = self.n_of, self.g_of
        half_of, act = self.half_of, self.act
        R = 2
        fr = g // 2
        if g > 2 * R:
            raise ValueError("SMR corner fill supports nghost <= 4")
        if self.ndim == 1:
            return out    # no transverse dims, no corners

        def strip(axis, lo):
            n = n_of[axis]
            return slice(0, g) if lo else slice(g + n, 2 * g + n)

        for lev in sorted(sm.level_ids):
            u = out[lev]
            # ---- (a) prolongation redo: ACTIVE transverse dims widened
            for (face, octant), (d, s) in self._batch[lev]["coarse"].items():
                axis = 3 - face // 2
                lo = face % 2 == 0
                ob = self._obit(octant)
                cu = out[lev - 1][s]
                rsl = [slice(None), slice(None)]
                for ax in (1, 2, 3):
                    if act[ax]:
                        h = half_of[ax]
                        o = g_of[ax] + ob[ax] * h
                        rsl.append(slice(o - R, o + h + R))
                    else:
                        rsl.append(slice(0, n_of[ax]))
                fine = prolongate_minmod(cu[tuple(rsl)], dims=self.ndim)
                gsl = [slice(None)] * 4
                sel = [slice(None), slice(None), None, None, None]
                for ax in (1, 2, 3):
                    n = n_of[ax]
                    if act[ax]:
                        gsl[ax] = slice(0, 2 * g + n)
                        sel[ax + 1] = slice(2 * R - g, 2 * R + n + g)
                    else:
                        gsl[ax] = slice(0, n)
                        sel[ax + 1] = slice(0, n)
                n = n_of[axis]
                gsl[axis] = strip(axis, lo)
                sel[axis + 1] = (slice(n - g + 2 * R, n + 2 * R) if lo
                                 else slice(2 * R, 2 * R + g))
                u = u.at[(d,) + tuple(gsl)].set(fine[tuple(sel)])
            # ---- (b) restriction redo: one ACTIVE transverse dim at a
            # time (reads the kids' round-1 face ghosts)
            for face, (d, kidmat) in self._batch[lev]["fine"].items():
                axis = 3 - face // 2
                lo = face % 2 == 0
                bit = face // 2
                want = 1 if face % 2 == 0 else 0
                ocs = [oc for oc in range(self.noct)
                       if (oc >> bit) & 1 == want]
                nops = kidmat.shape[0]
                for ext in (t for t in (1, 2, 3)
                            if t != axis and act[t]):
                    ksl = [slice(None), slice(None), None, None, None]
                    half = {}
                    for ax in (1, 2, 3):
                        n = n_of[ax]
                        if ax == ext:
                            ksl[ax + 1] = slice(g - 2 * fr, g + n + 2 * fr)
                            half[ax] = n // 2 + 2 * fr
                        elif act[ax]:
                            ksl[ax + 1] = slice(g_of[ax], g_of[ax] + n)
                            half[ax] = n // 2
                        else:
                            ksl[ax + 1] = slice(0, n)
                            half[ax] = n
                    ku = out[lev + 1][kidmat.reshape(-1)]
                    rest = restrict_average(
                        ku[tuple(ksl)], dims=self.ndim).reshape(
                        (nops, len(ocs), self.nvar,
                         half[1], half[2], half[3]))
                    ag_n = {ax: n_of[ax] + (2 * fr if ax == ext else 0)
                            for ax in (1, 2, 3)}
                    agg = jnp.zeros((nops, self.nvar, ag_n[1], ag_n[2],
                                     ag_n[3]), dtype=u.dtype)
                    for idx, oc in enumerate(ocs):
                        obit = self._obit(oc)
                        psl = [slice(None), slice(None), None, None, None]
                        for ax in (1, 2, 3):
                            off = (obit[ax] * half_of[ax] if act[ax]
                                   else 0)
                            psl[ax + 1] = slice(off, off + half[ax])
                        agg = agg.at[tuple(psl)].set(rest[:, idx])
                    gsl = [slice(None)] * 4
                    vsl = [slice(None), slice(None), None, None, None]
                    for ax in (1, 2, 3):
                        n = n_of[ax]
                        if ax == ext:
                            gsl[ax] = slice(g - fr, g + n + fr)
                        else:
                            gsl[ax] = slice(g_of[ax], g_of[ax] + n)
                        vsl[ax + 1] = slice(0, ag_n[ax])
                    n = n_of[axis]
                    gsl[axis] = strip(axis, lo)
                    vsl[axis + 1] = (slice(n - g, n) if lo
                                     else slice(0, g))
                    u = u.at[(d,) + tuple(gsl)].set(agg[tuple(vsl)])
            out[lev] = u
            # ---- (c) same-level sweep: y carries x-ghosts, z carries x+y
            for dirpass, ext_axes in ((1, (3,)), (2, (3, 2))):
                if 2 * dirpass >= self.nfaces:
                    break     # that face direction doesn't exist
                groups = self._batch[lev]["same"]
                for face in (2 * dirpass, 2 * dirpass + 1):
                    if face not in groups:
                        continue
                    d, s = groups[face]
                    axis = 3 - face // 2
                    lo = face % 2 == 0
                    gsl = [slice(None)] * 4
                    ssl = [slice(None)] * 4
                    for ax in (1, 2, 3):
                        n = n_of[ax]
                        ext = slice(0, 2 * g + n) if ax in ext_axes \
                            else slice(g_of[ax], g_of[ax] + n)
                        gsl[ax] = ext
                        ssl[ax] = ext
                    n = n_of[axis]
                    gsl[axis] = strip(axis, lo)
                    ssl[axis] = slice(n, n + g) if lo else slice(g, 2 * g)
                    src = out[lev][s][(slice(None),) + tuple(ssl)]
                    u = u.at[(d,) + tuple(gsl)].set(src)
                    out[lev] = u
        return out
