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
handful of compiles.  Transfers here are host-side numpy; a device-side
batched gather is a planned optimization.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.amr_forest import COPY, PROLONG, RESTRICT
from ..eos.adiabatic import cons_to_prim
from ..refinement.criteria import check_refinement
from ..refinement.prolong_restrict import prolongate_minmod, restrict_average
from .smr import SmrMesh, SmrState
from .smr_hydro import SmrHydro


def remesh(smesh: SmrMesh, state, tags):
    """Apply per-leaf AMR tags; -> (new SmrMesh, transferred state).

    ``state``: {level: [nb_lev, nvar, NZ, NY, NX]} with valid interiors.
    ``tags``: int array over GLOBAL leaf ids (+1 refine / 0 / -1 derefine).
    Ghosts of the returned state are refilled.
    """
    base = smesh.base
    g = base.nghost
    nz, ny, nx = base.mbnx3, base.mbnx2, base.mbnx1
    hz, hy, hx = nz // 2, ny // 2, nx // 2

    # snapshot old table before the forest mutates
    old_by_loc = dict(smesh._by_loc)
    old_loc_of = {}
    for lev, ids in smesh.level_ids.items():
        for li, gid in enumerate(ids):
            old_loc_of[gid] = (lev, li)
    old_np = {lev: np.asarray(state[lev]) for lev in state}
    nvar = next(iter(old_np.values())).shape[1]

    kind, old_id, octant = smesh.forest.update(
        np.ascontiguousarray(tags, np.int32))
    new_sm = SmrMesh.from_forest(base, smesh.forest)

    def old_block(gid):
        lev, li = old_loc_of[gid]
        return old_np[lev][li]

    new_state = {}
    for lev, ids in new_sm.level_ids.items():
        out = np.zeros((len(ids), nvar) + base.block_shape,
                       dtype=next(iter(old_np.values())).dtype)
        for li, gid in enumerate(ids):
            k = int(kind[gid])
            if k == COPY:
                out[li] = old_block(int(old_id[gid]))
            elif k == PROLONG:
                oc = int(octant[gid])
                ox, oy, oz = oc & 1, (oc >> 1) & 1, (oc >> 2) & 1
                cu = old_block(int(old_id[gid]))
                reg = cu[:,
                         g + oz * hz - 1:g + (oz + 1) * hz + 1,
                         g + oy * hy - 1:g + (oy + 1) * hy + 1,
                         g + ox * hx - 1:g + (ox + 1) * hx + 1]
                fine = np.asarray(prolongate_minmod(jnp.asarray(reg),
                                                    dims=3))
                # fine covers virtual cells [-2, n+2); interior = [2, n+2)
                out[li, :, g:g + nz, g:g + ny, g:g + nx] = \
                    fine[:, 2:nz + 2, 2:ny + 2, 2:nx + 2]
            elif k == RESTRICT:
                # merged coarse leaf: assemble from the 2^d old children
                a = int(new_sm.lx1[gid])
                b = int(new_sm.lx2[gid])
                c = int(new_sm.lx3[gid])
                clev = int(new_sm.levels[gid])
                for oc in range(8):
                    cx, cy, cz = oc & 1, (oc >> 1) & 1, (oc >> 2) & 1
                    kid = old_by_loc[(clev + 1, 2 * a + cx, 2 * b + cy,
                                      2 * c + cz)]
                    ku = old_block(kid)
                    rest = np.asarray(restrict_average(
                        jnp.asarray(ku[:, g:g + nz, g:g + ny, g:g + nx]),
                        dims=3))
                    out[li, :,
                        g + cz * hz:g + (cz + 1) * hz,
                        g + cy * hy:g + (cy + 1) * hy,
                        g + cx * hx:g + (cx + 1) * hx] = rest
            else:  # pragma: no cover
                raise RuntimeError(f"unknown transfer kind {k}")
            if k != COPY:
                # edge-replicate the fresh interior into the ghost shell:
                # face ghosts are refilled below; corner/edge ghosts are
                # never read by the dimension-split hyperbolic update but
                # must hold valid (non-zero-density) states
                out[li] = np.pad(
                    out[li, :, g:g + nz, g:g + ny, g:g + nx],
                    ((0, 0), (g, g), (g, g), (g, g)), mode="edge")
        new_state[lev] = jnp.asarray(out)

    new_state = SmrState(new_sm, nvar).fill_ghosts(new_state)
    return new_sm, new_state


class AmrHydro:
    """Adaptive-mesh hydro driver: step + periodic retag/remesh.

    Wraps ``SmrHydro`` steppers cached per mesh shape signature (the
    per-level leaf counts) so repeated visits to a mesh configuration
    reuse the compiled step.
    """

    def __init__(self, smesh: SmrMesh, cfg, eos, refine_cfg,
                 check_interval=1, derefine_count=10, cooling=None,
                 diffusion=None, problem_source_factory=None):
        self.smesh = smesh
        self.cfg = cfg
        self.eos = eos
        self.cooling = cooling
        self.diffusion = diffusion
        # factory(smesh) -> src(state, prims, beta_dt, t): per-leaf
        # coordinate closures must be rebuilt when the mesh changes
        self.problem_source_factory = problem_source_factory
        self.refine_cfg = refine_cfg
        self.check_interval = max(1, int(check_interval))
        # a leaf must request derefinement this many CONSECUTIVE checks
        # before it may merge (Parthenon's derefine_count; damps
        # refine/derefine flapping at marginal criteria)
        self.derefine_count = max(1, int(derefine_count))
        self._deref_counts = {}
        self._steppers = {}
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
            st = SmrHydro(self.smesh, self.cfg, self.eos,
                          cooling=self.cooling,
                          diffusion=self.diffusion,
                          problem_source_unsplit=src)
            self._steppers[sig] = st
        return st

    # ------------------------------------------------------------------ tags
    def compute_tags(self, state):
        """Global per-leaf tag array from the configured criterion."""
        sm = self.smesh
        tags = np.zeros(sm.levels.size, np.int32)
        for lev, ids in sm.level_ids.items():
            _, prim = cons_to_prim(self.eos, state[lev], self.cfg.fluid,
                                   self.cfg.nscalars)
            t = np.asarray(check_refinement(self.refine_cfg, prim,
                                            sm.base))
            tags[ids] = t
        return tags

    # --------------------------------------------------------------- evolve
    def maybe_remesh(self, state):
        """Retag + remesh if any change; -> (state, changed?)."""
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
        self.smesh, state = remesh(self.smesh, state, tags)
        new_tbl = (self.smesh.levels.tobytes(), self.smesh.lx1.tobytes(),
                   self.smesh.lx2.tobytes(), self.smesh.lx3.tobytes())
        changed = old_tbl != new_tbl or old_leaves != self.smesh.levels.size
        if changed:
            self._stepper = self._get_stepper()
        return state, changed

    def advance(self, state, ncycles, c_h=0.0):
        """ncycles of (maybe_remesh -> dt -> step)."""
        for n in range(ncycles):
            if n % self.check_interval == 0:
                state, _ = self.maybe_remesh(state)
            dt = self._stepper.estimate_dt(state)
            state = self._stepper.step(state, dt, jnp.asarray(c_h))
        return state

    def total_mass(self, state):
        return self._stepper.total_mass(state)
