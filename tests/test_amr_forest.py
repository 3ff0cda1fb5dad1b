"""Native AMR forest manager: refinement bookkeeping, 2:1 balance,
sibling-complete derefinement, transfer maps."""

import numpy as np

from athenapk_tpu.core.amr_forest import AmrForest, COPY, PROLONG, RESTRICT


def test_uniform_init():
    f = AmrForest(2, 2, 2, ndim=3)
    assert f.num_leaves == 8
    levels, lx1, lx2, lx3 = f.leaves()
    assert (levels == 0).all()


def test_refine_one_block():
    f = AmrForest(2, 2, 2, ndim=3)
    tags = np.zeros(8, np.int32)
    tags[0] = 1
    kind, old_id, octant = f.update(tags)
    assert f.num_leaves == 7 + 8  # one block -> 8 children
    assert (kind == PROLONG).sum() == 8
    assert (kind == COPY).sum() == 7
    # the 8 prolongs come from old block 0 with octants 0..7
    oct_set = sorted(octant[kind == PROLONG].tolist())
    assert oct_set == list(range(8))
    assert (old_id[kind == PROLONG] == 0).all()


def test_derefine_requires_all_siblings():
    f = AmrForest(2, 2, 2, ndim=3)
    tags = np.zeros(8, np.int32)
    tags[0] = 1
    f.update(tags)
    n = f.num_leaves
    # tag only some of the new fine blocks for derefinement: nothing merges
    levels = f.leaves()[0]
    tags = np.zeros(n, np.int32)
    fine_ids = np.where(levels == 1)[0]
    tags[fine_ids[:4]] = -1
    f.update(tags)
    assert f.num_leaves == n  # unchanged
    # now tag all 8 siblings: they merge back
    levels = f.leaves()[0]
    tags = np.zeros(f.num_leaves, np.int32)
    tags[np.where(levels == 1)[0]] = -1
    kind, old_id, octant = f.update(tags)
    assert f.num_leaves == 8
    assert (kind == RESTRICT).sum() == 1


def test_two_to_one_balance():
    """Refining a block twice forces its neighbors to refine too."""
    f = AmrForest(4, 4, 1, ndim=2, periodic=(True, True, True))
    assert f.num_leaves == 16
    # refine block at (0,0) to level 1
    tags = np.zeros(16, np.int32)
    levels, lx1, lx2, _ = f.leaves()
    b0 = int(np.where((lx1 == 0) & (lx2 == 0))[0][0])
    tags[b0] = 1
    f.update(tags)
    # refine one of its level-1 children again: level-0 neighbors of the
    # parent must be forced to level 1 (2:1)
    levels, lx1, lx2, _ = f.leaves()
    child = int(np.where((levels == 1) & (lx1 == 0) & (lx2 == 0))[0][0])
    tags = np.zeros(f.num_leaves, np.int32)
    tags[child] = 1
    f.update(tags)
    levels, lx1, lx2, _ = f.leaves()
    assert levels.max() == 2
    # proper 2:1 check: every pair of geometrically adjacent leaves must
    # differ by at most one level (periodic domain of root size 4x4)
    L = 4.0  # root units

    def bounds(lev, x, y):
        w = 1.0 / (1 << lev)
        return x * w, (x + 1) * w, y * w, (y + 1) * w

    leaves = list(zip(levels.tolist(), lx1.tolist(), lx2.tolist()))
    for i, (la, xa, ya) in enumerate(leaves):
        ax0, ax1, ay0, ay1 = bounds(la, xa, ya)
        for lb, xb, yb in leaves[i + 1:]:
            if abs(la - lb) <= 1:
                continue
            bx0, bx1, by0, by1 = bounds(lb, xb, yb)
            # adjacency incl. periodic wrap
            def touches(a0, a1, b0, b1):
                for off in (-L, 0.0, L):
                    if a0 + off <= b1 + 1e-12 and b0 <= a1 + off + 1e-12:
                        return True
                return False
            if touches(ax0, ax1, bx0, bx1) and touches(ay0, ay1, by0, by1):
                raise AssertionError(
                    f"2:1 violated: L{la}({xa},{ya}) touches "
                    f"L{lb}({xb},{yb})")
