"""Dynamic AMR: retag -> forest update -> block data transfer.

The TPU-native counterpart of the reference's adaptive remeshing
(Parthenon's ``Mesh::LoadBalancingAndAdaptiveMeshRefinement``, driven by
the tagging criteria in ``src/refinement/gradient.cpp`` / ``other.cpp``
and ``<parthenon/mesh> refinement = adaptive`` decks like
``inputs/blast_3d_amr.in``):

1. evaluate the configured refinement criterion per leaf block
   (``athenapk_tpu.refinement.check_refinement``, batched on device),
2. apply the tags to the native C++ forest (2:1 balance +
   sibling-complete derefinement happen there),
3. transfer block data old->new along the forest's transfer map:
   COPY (same leaf), PROLONG (conservative minmod prolongation of one
   octant of an old coarse block), RESTRICT (average-restriction of the
   2^d old children into the merged coarse block),
4. regroup leaves by level and refill ghosts.

Both transfer operators preserve block means, so total mass/energy are
conserved across a remesh to rounding.

Design note: mesh topology changes are host-side events (as in the
reference, where they reallocate MeshBlocks); the per-level batched
arrays change shape, so the jitted step functions retrace per mesh
"shape signature".  ``AmrHydro`` caches steppers by signature — a blast
wave that plateaus at a few distinct leaf-count configurations pays a
handful of compiles.  Block-data transfers run ON DEVICE as batched
gathers grouped by (kind, octant): only the transfer-map indices are
computed host-side; the data never round-trips through host numpy.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.amr_forest import COPY, PROLONG, RESTRICT
from ..eos.adiabatic import cons_to_prim
from ..refinement.criteria import check_refinement
from ..refinement.prolong_restrict import prolongate_minmod, restrict_average
from .smr import SmrMesh, SmrState
from .smr_hydro import SmrHydro


def _edge_pad(interior, base):
    """Edge-replicate the interior into the ghost shell (device-side):
    face ghosts are refilled by fill_ghosts; corner/edge ghosts are
    never read by the dimension-split hyperbolic update but must hold
    valid (non-zero-density) states.  Inactive dims carry no ghosts."""
    return jnp.pad(interior,
                   ((0, 0), (0, 0), (base.ng3, base.ng3),
                    (base.ng2, base.ng2), (base.ng1, base.ng1)),
                   mode="edge")


def remesh(smesh: SmrMesh, state, tags, custom_bcs=None):
    """Apply per-leaf AMR tags; -> (new SmrMesh, transferred state).

    ``state``: {level: [nb_lev, nvar, NZ, NY, NX]} with valid interiors.
    ``tags``: int array over GLOBAL leaf ids (+1 refine / 0 / -1 derefine).
    Ghosts of the returned state are refilled.

    Transfers are batched device gathers grouped by kind (and by octant
    for prolong/restrict), so a remesh costs O(levels * 9) device ops
    rather than O(leaves) host copies.  Dimension-generic: on 2-D/1-D
    meshes children halve only the active dims (2^ndim per parent).
    """
    base = smesh.base
    ndim = base.ndim
    nz, ny, nx = base.mbnx3, base.mbnx2, base.mbnx1
    g3, g2, g1 = base.ng3, base.ng2, base.ng1
    act2, act3 = base.nx2 > 1, base.nx3 > 1
    hz = nz // 2 if act3 else nz
    hy = ny // 2 if act2 else ny
    hx = nx // 2
    noct = 1 << ndim
    isl = (slice(None), slice(None), slice(g3, g3 + nz),
           slice(g2, g2 + ny), slice(g1, g1 + nx))

    # snapshot old table before the forest mutates
    old_by_loc = dict(smesh._by_loc)
    old_loc_of = {}
    for lev, ids in smesh.level_ids.items():
        for li, gid in enumerate(ids):
            old_loc_of[gid] = (lev, li)
    old = dict(state)
    nvar = next(iter(old.values())).shape[1]
    dtype = next(iter(old.values())).dtype

    kind, old_id, octant = smesh.forest.update(
        np.ascontiguousarray(tags, np.int32))
    new_sm = SmrMesh.from_forest(base, smesh.forest)

    new_state = {}
    for lev, ids in new_sm.level_ids.items():
        out = jnp.zeros((len(ids), nvar) + base.block_shape, dtype)
        # ---- group the transfer map by kind / octant (host, indices only)
        copy_dst, copy_src = [], []
        pro = {oc: ([], []) for oc in range(noct)}  # octant -> (dst, src)
        res_dst = []
        res_kids = {oc: [] for oc in range(noct)}   # octant -> old fine li
        for li, gid in enumerate(ids):
            k = int(kind[gid])
            if k == COPY:
                copy_dst.append(li)
                copy_src.append(old_loc_of[int(old_id[gid])][1])
            elif k == PROLONG:
                oc = int(octant[gid])
                pro[oc][0].append(li)
                pro[oc][1].append(old_loc_of[int(old_id[gid])][1])
            elif k == RESTRICT:
                a, b, c = (int(new_sm.lx1[gid]), int(new_sm.lx2[gid]),
                           int(new_sm.lx3[gid]))
                res_dst.append(li)
                for oc in range(noct):
                    cx, cy, cz = oc & 1, (oc >> 1) & 1, (oc >> 2) & 1
                    kid = old_by_loc[(lev + 1, 2 * a + cx,
                                      (2 * b if act2 else b) + cy,
                                      (2 * c if act3 else c) + cz)]
                    res_kids[oc].append(old_loc_of[kid][1])
            else:  # pragma: no cover
                raise RuntimeError(f"unknown transfer kind {k}")

        # ---- batched device transfers
        if copy_dst:
            out = out.at[jnp.asarray(copy_dst)].set(
                old[lev][jnp.asarray(copy_src)])
        for oc in range(noct):
            dst, src = pro[oc]
            if not dst:
                continue
            ox, oy, oz = oc & 1, (oc >> 1) & 1, (oc >> 2) & 1
            reg = old[lev - 1][jnp.asarray(src)][
                :, :,
                (slice(g3 + oz * hz - 1, g3 + (oz + 1) * hz + 1)
                 if act3 else slice(0, nz)),
                (slice(g2 + oy * hy - 1, g2 + (oy + 1) * hy + 1)
                 if act2 else slice(0, ny)),
                slice(g1 + ox * hx - 1, g1 + (ox + 1) * hx + 1)]
            fine = prolongate_minmod(reg, dims=ndim)
            # fine covers virtual cells [-2, n+2) on active dims;
            # interior = [2, n+2)
            interior = fine[:, :,
                            slice(2, nz + 2) if act3 else slice(0, nz),
                            slice(2, ny + 2) if act2 else slice(0, ny),
                            slice(2, nx + 2)]
            out = out.at[jnp.asarray(dst)].set(_edge_pad(interior, base))
        if res_dst:
            merged = jnp.zeros((len(res_dst), nvar, nz, ny, nx), dtype)
            for oc in range(noct):
                cx, cy, cz = oc & 1, (oc >> 1) & 1, (oc >> 2) & 1
                kids = old[lev + 1][jnp.asarray(res_kids[oc])][isl]
                rest = restrict_average(kids, dims=ndim)
                merged = merged.at[:, :,
                                   cz * hz:(cz + 1) * hz,
                                   cy * hy:(cy + 1) * hy,
                                   cx * hx:(cx + 1) * hx].set(rest)
            out = out.at[jnp.asarray(res_dst)].set(_edge_pad(merged, base))
        new_state[lev] = out

    new_state = SmrState(new_sm, nvar,
                         custom_bcs=custom_bcs).fill_ghosts(new_state)
    return new_sm, new_state


class _PaddedStepper:
    """Slot-padding adapter around ``SmrHydro`` for sharded leaf axes.

    GSPMD placement requires the sharded leaf axis to divide the device
    count, so ``AmrHydro._place`` pads each level to the next multiple
    of D.  This adapter makes the padded layout transparent to the
    stepper: every entry point slices each level back to its exact leaf
    count INSIDE the jitted program (so the computation stays
    distributed and results on real rows are bitwise-identical to the
    unsharded run) and re-pads step outputs to the slot shape."""

    def __init__(self, inner: SmrHydro, owner: "AmrHydro"):
        self._inner = inner
        self._owner = owner
        self.smesh = inner.smesh
        self.cfg = inner.cfg
        self.sts = inner.sts
        self.diffusion = inner.diffusion
        # split sources act on the {level: array} layout; the sharded
        # stepper wrappers don't re-expose them (sharded runs are the
        # dryrun/test path — deck-driven SmrSimulation never wraps)
        self.problem_source_first_order = None
        self.problem_source_strang = None
        counts = {lev: len(ids)
                  for lev, ids in inner.smesh.level_ids.items()}
        self._counts = counts
        self._slots = {lev: owner._nslots(c) for lev, c in counts.items()}
        import jax as _jax
        self.step = _jax.jit(self._step_padded)

    def _slice(self, state):
        return {lev: v[:self._counts[lev]] for lev, v in state.items()}

    def _pad(self, state):
        out = {}
        for lev, v in state.items():
            ns = self._slots[lev]
            if v.shape[0] < ns:
                padrows = jnp.broadcast_to(
                    v[:1], (ns - v.shape[0],) + v.shape[1:])
                v = jnp.concatenate([v, padrows], axis=0)
            out[lev] = v
        return out

    def _step_padded(self, state, dt, c_h, t=0.0):
        return self._pad(self._inner._step(self._slice(state), dt, c_h, t))

    def estimate_dt(self, state):
        return self._inner.estimate_dt(self._slice(state))

    def estimate_dt_with_diff(self, state, dt_hyp=None):
        return self._inner.estimate_dt_with_diff(self._slice(state),
                                                 dt_hyp=dt_hyp)

    def sts_half_step(self, state, tau, dt_diff):
        return self._pad(self._inner.sts_half_step(self._slice(state),
                                                   tau, dt_diff))

    def total_mass(self, state):
        return self._inner.total_mass(self._slice(state))


class _FlatStepper:
    """Flat leaf-axis adapter around ``SmrHydro`` — exact ±1 balance.

    The slot-padded layout (``_PaddedStepper``) bounds imbalance by one
    CHUNK per level: when a level's count doesn't divide the device
    count, up to D-1 real leaves separate the fullest and emptiest
    device.  This adapter instead concatenates ALL levels' leaves into
    ONE leaf-major array of ``D * ceil(N/D)`` rows and deals them so
    device ``i`` holds ``N//D + (i < N%D)`` REAL leaves (its remaining
    rows are untouched pads) — the TPU analog of Parthenon's SFC chunk
    load balancing (``parthenon/src/mesh/mesh.cpp``
    LoadBalancingAndAdaptiveMeshRefinement), with the ±1 guarantee the
    per-level layout cannot give.

    Every stepper entry point gathers each level's rows at STATIC
    indices inside the jit (XLA lowers the row gather to a copy /
    collective-permute), runs the per-level step, and maps the results
    back with a static inverse-permutation gather.  Real-row results
    match the unsharded run bitwise in most configurations; XLA may
    fuse (FMA-contract) differently across the reshard boundary, so
    the guaranteed contract is ≤1 ulp — use ``layout="padded"`` where
    strict bitwise reproducibility matters more than exact balance.
    """

    def __init__(self, inner: SmrHydro, owner: "AmrHydro"):
        import jax as _jax

        self._inner = inner
        self._owner = owner
        self.smesh = inner.smesh
        self.cfg = inner.cfg
        self.sts = inner.sts
        self.diffusion = inner.diffusion
        # see _PaddedStepper: split sources not re-exposed under sharding
        self.problem_source_first_order = None
        self.problem_source_strang = None
        D = owner._ndev()
        self._levels = sorted(inner.smesh.level_ids)
        counts = {lev: len(inner.smesh.level_ids[lev])
                  for lev in self._levels}
        self._counts = counts
        N = sum(counts.values())
        s = -(-N // D)
        self._N, self._nrows = N, D * s
        # balanced deal: device i owns rows [i*s, (i+1)*s) and holds
        # n_i = N//D + (i < N%D) real leaves at its first n_i rows
        n = np.full(D, N // D, np.int64)
        n[: N % D] += 1
        r_of_k = np.concatenate(
            [np.arange(n[i]) + i * s for i in range(D)])
        self._r_of_k = r_of_k                       # global leaf k -> row
        idx, o = {}, 0
        for lev in self._levels:
            idx[lev] = jnp.asarray(r_of_k[o:o + counts[lev]])
            o += counts[lev]
        self._idx = idx
        # inverse: row -> index into (real rows ++ pad source rows)
        inv = np.zeros(D * s, np.int64)
        inv[r_of_k] = np.arange(N)
        pad_rows = np.setdiff1d(np.arange(D * s), r_of_k)
        inv[pad_rows] = N + np.arange(pad_rows.size)
        self._inv = jnp.asarray(inv)
        self._npad = int(pad_rows.size)
        self.step = self._entry(inner._step)
        self.sts_half_step = self._entry(inner.sts_half_step)
        self._dt_j = _jax.jit(
            lambda f: inner.estimate_dt(self._split(f)))

    def _split(self, flat):
        # pin each level's rows back onto the leaf axis of the device
        # mesh: keeps the partitioned compute pattern (and hence XLA's
        # fusion/FMA choices) identical to the per-level layouts, so
        # real-row results stay bitwise-equal to the unsharded run
        from jax.sharding import NamedSharding, PartitionSpec as P
        shd = NamedSharding(self._owner.sharding.mesh, P("blocks"))
        return {lev: jax.lax.with_sharding_constraint(
            flat[self._idx[lev]], shd) for lev in self._levels}

    def _join(self, state):
        rows = jnp.concatenate([state[lev] for lev in self._levels],
                               axis=0)
        if self._npad:
            # pads replicate row 0 (benign finite data, never computed on)
            rows = jnp.concatenate(
                [rows, jnp.broadcast_to(rows[:1],
                                        (self._npad,) + rows.shape[1:])],
                axis=0)
        return rows[self._inv]

    def _entry(self, fn):
        import jax as _jax

        jfn = _jax.jit(lambda flat, *a: self._join(fn(self._split(flat),
                                                      *a)))
        return lambda state, *a: jfn(self._ensure(state), *a)

    def _ensure(self, state):
        return self.place(state) if isinstance(state, dict) else state

    def place(self, state):
        """dict or flat -> flat array pinned to the device mesh."""
        import jax as _jax

        if isinstance(state, dict):
            state = self._join({lev: v[:self._counts[lev]]
                                for lev, v in state.items()})
        return _jax.device_put(state, self._owner.sharding)

    def exact(self, state):
        """dict or flat -> {level: [n_leaves_lev, ...]} exact views.

        The flat path materializes on HOST first: eagerly-dispatched
        ops on a multi-device sharded array launch per-device collective
        programs whose thread rendezvous can deadlock outside jit (seen
        as an XLA CPU all-reduce rendezvous abort).  ``exact`` feeds
        host-side events only (tagging, remesh transfers, IO), so the
        device->host round trip is the correct boundary; compute stays
        inside the jitted entry points."""
        if isinstance(state, dict):
            return {lev: v[:self._counts[lev]]
                    for lev, v in state.items()}
        flat = np.asarray(jax.device_get(state))
        out, o = {}, 0
        for lev in self._levels:
            c = self._counts[lev]
            out[lev] = jnp.asarray(flat[self._r_of_k[o:o + c]])
            o += c
        return out

    def estimate_dt(self, state):
        return self._dt_j(self._ensure(state))

    def estimate_dt_with_diff(self, state, dt_hyp=None):
        return self._inner.estimate_dt_with_diff(
            self._split(self._ensure(state)), dt_hyp=dt_hyp)

    def total_mass(self, state):
        return self._inner.total_mass(self._split(self._ensure(state)))


class AmrHydro:
    """Adaptive-mesh hydro driver: step + periodic retag/remesh.

    Wraps ``SmrHydro`` steppers cached per mesh shape signature (the
    per-level leaf counts) so repeated visits to a mesh configuration
    reuse the compiled step.
    """

    def __init__(self, smesh: SmrMesh, cfg, eos, refine_cfg,
                 check_interval=1, derefine_count=10, cooling=None,
                 diffusion=None, problem_source_factory=None,
                 problem_first_order_factory=None,
                 problem_strang_factory=None,
                 sharding=None, custom_bcs=None, problem_check=None,
                 layout="flat"):
        self.smesh = smesh
        self.cfg = cfg
        self.eos = eos
        self.cooling = cooling
        self.diffusion = diffusion
        # device placement for the per-level leaf axis (a NamedSharding
        # with P("blocks")); re-applied after every remesh so the new
        # leaf population is rebalanced over the device mesh (the analog
        # of Parthenon's AMR load balancing: leaves are laid out in the
        # forest's SFC order and dealt to devices in contiguous chunks)
        self.sharding = sharding
        # leaf-axis layout under sharding: "flat" (default — one
        # leaf-major array over all levels, exact ±1 real-leaf balance)
        # or "padded" (per-level slot padding, chunk-bounded balance)
        if layout not in ("flat", "padded"):
            raise ValueError(f"unknown AMR layout {layout!r}")
        self.layout = layout
        self.custom_bcs = custom_bcs
        # pgen per-block refinement check (ProblemCheckRefinementBlock,
        # reference main.cpp:76-77): fn(prim, base) -> [nblocks] tags,
        # combined with the <refinement> criterion via elementwise max
        self.problem_check = problem_check
        # factory(smesh) -> src(state, prims, beta_dt, t): per-leaf
        # coordinate closures must be rebuilt when the mesh changes
        self.problem_source_factory = problem_source_factory
        # factory(smesh) -> src(state, dt, t) | None: first-order split
        # sources (once per cycle at full dt on the last stage) and
        # Strang split sources (applied before stage 1 AND after the
        # last stage by the driver loop)
        self.problem_first_order_factory = problem_first_order_factory
        self.problem_strang_factory = problem_strang_factory
        self.refine_cfg = refine_cfg
        self.check_interval = max(1, int(check_interval))
        # a leaf must request derefinement this many CONSECUTIVE checks
        # before it may merge (Parthenon's derefine_count; damps
        # refine/derefine flapping at marginal criteria)
        self.derefine_count = max(1, int(derefine_count))
        self._deref_counts = {}
        self._steppers = {}
        self._tag_fns = {}
        self._stepper = self._get_stepper()

    def _signature(self):
        """Full leaf-table identity — ghost plans and flux-correction
        sites depend on the topology, not just the per-level counts."""
        sm = self.smesh
        return (sm.levels.tobytes(), sm.lx1.tobytes(), sm.lx2.tobytes(),
                sm.lx3.tobytes())

    def _get_stepper(self):
        sig = self._signature()
        st = self._steppers.get(sig)
        if st is None:
            src = (self.problem_source_factory(self.smesh)
                   if self.problem_source_factory is not None else None)
            src_fo = (self.problem_first_order_factory(self.smesh)
                      if self.problem_first_order_factory is not None
                      else None)
            src_strang = (self.problem_strang_factory(self.smesh)
                          if self.problem_strang_factory is not None
                          else None)
            st = SmrHydro(self.smesh, self.cfg, self.eos,
                          cooling=self.cooling,
                          diffusion=self.diffusion,
                          problem_source_unsplit=src,
                          problem_source_first_order=src_fo,
                          problem_source_strang=src_strang,
                          custom_bcs=self.custom_bcs)
            if self.sharding is not None:
                st = (_FlatStepper(st, self) if self.layout == "flat"
                      else _PaddedStepper(st, self))
            self._steppers[sig] = st
        return st

    # ------------------------------------------------------------------ tags
    def _tag_fn(self, shape):
        """Jitted per-level-shape tag computation.  The eager version
        dispatched each jnp op separately — over the remote TPU tunnel
        that is one round trip PER OP per cycle, which dominated the
        whole adaptive run (~7 s/cycle measured at the r5 adaptive
        bench); jitted it is ONE dispatch per level per check."""
        fn = self._tag_fns.get(shape)
        if fn is None:
            import jax as _jax
            base = self.smesh.base   # static across remeshes

            def f(u):
                _, prim = cons_to_prim(self.eos, u, self.cfg.fluid,
                                       self.cfg.nscalars)
                t = check_refinement(self.refine_cfg, prim, base)
                if self.problem_check is not None:
                    t = jnp.maximum(t, self.problem_check(prim, base))
                return t

            fn = _jax.jit(f)
            self._tag_fns[shape] = fn
        return fn

    def dispatch_tags(self, state):
        """Dispatch the per-level tag kernels WITHOUT reading: ->
        [(leaf_ids, device_array)].  The pipelined driver calls this
        right after the step dispatch; the blocking read then overlaps
        the step's device execution instead of adding tunnel round
        trips."""
        sm = self.smesh
        state = self.exact_state(state)
        return [(ids, self._tag_fn(state[lev].shape)(state[lev]))
                for lev, ids in sm.level_ids.items()]

    def assemble_tags(self, parts):
        """Blocking read of ``dispatch_tags`` results -> global array."""
        tags = np.zeros(self.smesh.levels.size, np.int32)
        for ids, dev in parts:
            tags[ids] = np.asarray(dev)
        return tags

    def compute_tags(self, state):
        """Global per-leaf tag array from the configured criterion."""
        return self.assemble_tags(self.dispatch_tags(state))

    # --------------------------------------------------------------- evolve
    def maybe_remesh(self, state, tags=None):
        """Retag + remesh if any change; -> (state, changed?).

        ``tags``: optionally the precomputed global tag array for THIS
        state (the pipelined driver computes tags on device right after
        the step dispatch and reads them with the cycle's one blocking
        fetch — the tags describe the same post-step state either way,
        this just removes per-cycle tunnel round trips)."""
        if tags is None:
            tags = self.compute_tags(state)
        # apply derefinement counters (keyed by leaf location so they
        # survive remeshes of other blocks)
        sm = self.smesh
        new_counts = {}
        for i in range(tags.size):
            if tags[i] >= 0:
                continue
            key = (int(sm.levels[i]), int(sm.lx1[i]), int(sm.lx2[i]),
                   int(sm.lx3[i]))
            c = self._deref_counts.get(key, 0) + 1
            new_counts[key] = c
            if c < self.derefine_count:
                tags[i] = 0
        self._deref_counts = new_counts
        if not tags.any():
            return state, False
        old_leaves = self.smesh.levels.size
        old_tbl = (self.smesh.levels.tobytes(), self.smesh.lx1.tobytes(),
                   self.smesh.lx2.tobytes(), self.smesh.lx3.tobytes())
        self.smesh, state = remesh(self.smesh, self.exact_state(state),
                                   tags, custom_bcs=self.custom_bcs)
        new_tbl = (self.smesh.levels.tobytes(), self.smesh.lx1.tobytes(),
                   self.smesh.lx2.tobytes(), self.smesh.lx3.tobytes())
        changed = old_tbl != new_tbl or old_leaves != self.smesh.levels.size
        if changed:
            self._stepper = self._get_stepper()
            # rebalance: deal the new leaf population over the device
            # mesh (contiguous SFC chunks per device)
            state = self._place(state)
        return state, changed

    def advance(self, state, ncycles, c_h=0.0):
        """ncycles of (maybe_remesh -> dt -> step)."""
        for n in range(ncycles):
            if n % self.check_interval == 0:
                state, _ = self.maybe_remesh(state)
            dt = self._stepper.estimate_dt(state)
            state = self._stepper.step(state, dt, jnp.asarray(c_h))
            state = self._place(state)
        return state

    # ------------------------------------------------- sharded placement
    # GSPMD can only place arrays whose sharded axis divides the device
    # count, so the leaf axis of each level is SLOT-PADDED to the next
    # multiple of D before ``device_put`` and sliced back to the exact
    # leaf count *inside* the stepper's jit (``_PaddedStepper``) —
    # results on real rows are bitwise-identical to the unsharded run,
    # and per-level real-leaf imbalance is bounded by a single chunk
    # (ceil(c/D) rows).  Octree fine levels always hold a multiple of 8
    # leaves, so on the typical 8-per-host mesh only the root level even
    # carries pads.  (The exact-±1 endgame is a flat leaf-axis layout —
    # per-level device rings don't work: jit refuses inputs on
    # differently-ordered rings, and the step combines levels through
    # the ghost fill.  TPU analog of Parthenon's SFC chunk balancing,
    # ``parthenon/src/mesh/mesh.cpp`` LoadBalancing.)

    def _ndev(self):
        return len(list(self.sharding.mesh.devices.flat))

    def _nslots(self, c):
        D = self._ndev()
        return -(-c // D) * D

    def _place(self, state):
        """Pin the leaf population to the device mesh.  Layout "flat":
        one leaf-major array over all levels, dealt for exact ±1
        real-leaf balance (``_FlatStepper.place``).  Layout "padded":
        slot-pad each level's leaf axis to a multiple of the device
        count.  Idempotent either way.  Pad rows duplicate row 0
        (benign finite data); they are never computed on and are
        stripped by ``exact_state``."""
        if self.sharding is None:
            return state
        if self.layout == "flat":
            return self._stepper.place(state)
        import jax
        counts = {lev: len(ids) for lev, ids in self.smesh.level_ids.items()}
        out = {}
        for lev, v in state.items():
            ns = self._nslots(counts[lev])
            if v.shape[0] < ns:
                pad = jnp.broadcast_to(v[:1], (ns - v.shape[0],) + v.shape[1:])
                v = jnp.concatenate([v, pad], axis=0)
            out[lev] = jax.device_put(v, self.sharding)
        return out

    def exact_state(self, state):
        """Strip padding -> {level: [n_leaves_lev, ...]} exact views
        (flat layout: per-level static row gathers)."""
        if not isinstance(state, dict):
            return self._stepper.exact(state)
        counts = {lev: len(ids) for lev, ids in self.smesh.level_ids.items()}
        return {lev: v[:counts[lev]] if v.shape[0] != counts[lev] else v
                for lev, v in state.items()}

    def device_leaf_counts(self, state):
        """Actual per-device REAL-leaf totals (balance diagnostic)."""
        out = {}
        if not isinstance(state, dict):
            st = self._stepper
            real = np.zeros(state.shape[0], bool)
            real[st._r_of_k] = True
            for sh in state.addressable_shards:
                lo = sh.index[0].start or 0
                hi = sh.index[0].stop if sh.index[0].stop is not None \
                    else state.shape[0]
                out[sh.device] = out.get(sh.device, 0) \
                    + int(real[lo:hi].sum())
            return out
        counts = {lev: len(ids) for lev, ids in self.smesh.level_ids.items()}
        for lev, v in state.items():
            c = counts[lev]
            for sh in v.addressable_shards:
                lo = sh.index[0].start or 0
                hi = sh.index[0].stop if sh.index[0].stop is not None \
                    else v.shape[0]
                n = max(0, min(hi, c) - lo)
                out[sh.device] = out.get(sh.device, 0) + n
        return out

    def total_mass(self, state):
        return self._stepper.total_mass(state)
