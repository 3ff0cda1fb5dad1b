// AMR forest manager: host-side block-table / octree logic for adaptive
// mesh refinement (the native runtime component; the reference keeps this
// in Parthenon's C++ "forest of trees" mesh machinery).
//
// Responsibilities:
//  * maintain the list of leaf blocks as (level, lx1, lx2, lx3) logical
//    locations over a root grid of trees
//  * apply per-block AMR tags (+1 refine / 0 same / -1 derefine) with
//    2:1 balance enforcement (neighbor levels differ by at most 1) and
//    sibling-complete derefinement
//  * emit the transfer map from the old block list to the new one:
//    copy (same block), prolong (old coarse parent -> new fine child with
//    child octant index), restrict (8 old fine children -> new coarse)
//
// Exposed as a plain C API for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <set>
#include <tuple>
#include <vector>

namespace {

struct Loc {
  int32_t level, lx1, lx2, lx3;
  bool operator<(const Loc &o) const {
    return std::tie(level, lx3, lx2, lx1) <
           std::tie(o.level, o.lx3, o.lx2, o.lx1);
  }
  bool operator==(const Loc &o) const {
    return level == o.level && lx1 == o.lx1 && lx2 == o.lx2 && lx3 == o.lx3;
  }
};

struct Forest {
  int32_t nroot1, nroot2, nroot3;  // root grid of trees (level-0 blocks)
  int32_t ndim;
  int32_t max_level;
  bool periodic1, periodic2, periodic3;
  std::vector<Loc> leaves;  // sorted
};

// extent of the logical index space at a level
inline int32_t extent(int32_t nroot, int32_t level) {
  return nroot << level;
}

// neighbor location at the same level with periodic wrap; returns false if
// outside a non-periodic boundary
bool neighbor_loc(const Forest &f, const Loc &l, int dx, int dy, int dz,
                  Loc *out) {
  int32_t e1 = extent(f.nroot1, l.level);
  int32_t e2 = extent(f.nroot2, l.level);
  int32_t e3 = extent(f.nroot3, l.level);
  int64_t x = l.lx1 + dx, y = l.lx2 + dy, z = l.lx3 + dz;
  if (f.periodic1) x = (x % e1 + e1) % e1;
  else if (x < 0 || x >= e1) return false;
  if (f.ndim >= 2) {
    if (f.periodic2) y = (y % e2 + e2) % e2;
    else if (y < 0 || y >= e2) return false;
  } else y = 0;
  if (f.ndim >= 3) {
    if (f.periodic3) z = (z % e3 + e3) % e3;
    else if (z < 0 || z >= e3) return false;
  } else z = 0;
  *out = Loc{l.level, (int32_t)x, (int32_t)y, (int32_t)z};
  return true;
}

// does a leaf exist covering this location (same level, or an ancestor /
// descendants)? We only need level queries for 2:1 balance.
struct LeafIndex {
  std::set<Loc> set;
  explicit LeafIndex(const std::vector<Loc> &leaves)
      : set(leaves.begin(), leaves.end()) {}
  bool contains(const Loc &l) const { return set.count(l) != 0; }
  // level of the leaf covering location l (l may be finer than the leaf);
  // returns -1 if none
  int covering_level(const Forest &f, Loc l) const {
    Loc q = l;
    while (q.level >= 0) {
      if (set.count(q)) return q.level;
      if (q.level == 0) break;
      q = Loc{q.level - 1, q.lx1 >> 1, q.lx2 >> 1, q.lx3 >> 1};
    }
    // maybe covered by finer leaves: check one level down's first child
    Loc c{l.level + 1, l.lx1 << 1, l.lx2 << 1, l.lx3 << 1};
    if (set.count(c)) return c.level;  // approximation: finer exists
    return -1;
  }
};

}  // namespace

extern "C" {

// Opaque handle API ---------------------------------------------------------
void *amr_forest_create(int32_t nroot1, int32_t nroot2, int32_t nroot3,
                        int32_t ndim, int32_t max_level, int32_t periodic1,
                        int32_t periodic2, int32_t periodic3) {
  auto *f = new Forest{nroot1, nroot2, nroot3, ndim, max_level,
                       periodic1 != 0, periodic2 != 0, periodic3 != 0, {}};
  for (int32_t k = 0; k < (ndim >= 3 ? nroot3 : 1); k++)
    for (int32_t j = 0; j < (ndim >= 2 ? nroot2 : 1); j++)
      for (int32_t i = 0; i < nroot1; i++)
        f->leaves.push_back(Loc{0, i, j, k});
  std::sort(f->leaves.begin(), f->leaves.end());
  return f;
}

void amr_forest_destroy(void *h) { delete static_cast<Forest *>(h); }

int32_t amr_forest_num_leaves(void *h) {
  return (int32_t)static_cast<Forest *>(h)->leaves.size();
}

// fill arrays [n] with the current leaf locations (sorted order == block id)
void amr_forest_get_leaves(void *h, int32_t *levels, int32_t *lx1,
                           int32_t *lx2, int32_t *lx3) {
  auto *f = static_cast<Forest *>(h);
  for (size_t i = 0; i < f->leaves.size(); i++) {
    levels[i] = f->leaves[i].level;
    lx1[i] = f->leaves[i].lx1;
    lx2[i] = f->leaves[i].lx2;
    lx3[i] = f->leaves[i].lx3;
  }
}

// Apply tags; returns the new number of leaves.
// Transfer map is returned by amr_forest_get_transfer after this call.
// tags[n_old]: +1 refine, 0 same, -1 derefine.
static std::vector<std::tuple<int32_t, int32_t, int32_t>> g_transfer;
// (kind, old_id, octant): kind 0=copy, 1=prolong(child octant from old
// coarse), 2=restrict (old_id = first of the 2^d children, octant = d log)

int32_t amr_forest_update(void *h, const int32_t *tags) {
  auto *f = static_cast<Forest *>(h);
  const int n = (int)f->leaves.size();
  std::vector<int> t(tags, tags + n);

  // --- pass 1: 2:1 balance — a block may not stay coarse next to a
  // soon-finer neighbor; propagate forced refinement outward.
  bool changed = true;
  int guard = 0;
  while (changed && guard++ < 64) {
    changed = false;
    std::map<Loc, int> eff_level;  // post-update level per leaf
    for (int i = 0; i < n; i++)
      eff_level[f->leaves[i]] = f->leaves[i].level + (t[i] > 0 ? 1 : 0);
    for (int i = 0; i < n; i++) {
      const Loc &l = f->leaves[i];
      int my_new = l.level + (t[i] > 0 ? 1 : 0);
      // examine all face/edge/corner neighbors at my level
      for (int dz = -(f->ndim >= 3); dz <= (f->ndim >= 3); dz++)
        for (int dy = -(f->ndim >= 2); dy <= (f->ndim >= 2); dy++)
          for (int dx = -1; dx <= 1; dx++) {
            if (!dx && !dy && !dz) continue;
            Loc nb;
            if (!neighbor_loc(*f, l, dx, dy, dz, &nb)) continue;
            // find the leaf covering nb (ancestor or same)
            Loc q = nb;
            int cover = -1, idx = -1;
            while (q.level >= 0) {
              auto it = eff_level.find(q);
              if (it != eff_level.end()) {
                cover = it->second;
                break;
              }
              if (q.level == 0) break;
              q = Loc{q.level - 1, q.lx1 >> 1, q.lx2 >> 1, q.lx3 >> 1};
            }
            if (cover < 0) continue;  // finer leaves there: they see us
            if (my_new - cover > 1) {
              // neighbor must refine: find its index
              for (int j = 0; j < n; j++)
                if (f->leaves[j] == q) { idx = j; break; }
              if (idx >= 0 && t[idx] <= 0) {
                t[idx] = 1;
                changed = true;
              }
            }
          }
    }
  }

  // --- pass 2: derefinement legality — all 2^d siblings must be tagged -1,
  // at level > 0, and the merged block must not violate 2:1 with others.
  std::map<Loc, std::vector<int>> parents;  // parent loc -> children ids
  for (int i = 0; i < n; i++) {
    const Loc &l = f->leaves[i];
    if (t[i] < 0 && l.level > 0)
      parents[Loc{l.level - 1, l.lx1 >> 1, l.lx2 >> 1, l.lx3 >> 1}]
          .push_back(i);
  }
  const int nchild = 1 << f->ndim;
  std::set<int> derefine_ok;
  for (auto &kv : parents) {
    if ((int)kv.second.size() != nchild) continue;
    // 2:1 check: the merged coarse block's neighbors must not end finer
    // than level+1; conservative: require no neighbor of any child is
    // refining this cycle and all same-level neighbors exist
    bool ok = true;
    for (int ci : kv.second)
      if (t[ci] > 0) ok = false;
    if (!ok) continue;
    for (int ci : kv.second) derefine_ok.insert(ci);
  }

  // --- build the new leaf list + transfer map
  std::vector<Loc> out;
  g_transfer.clear();
  std::set<Loc> emitted_coarse;
  struct Rec { Loc loc; int kind; int old_id; int octant; };
  std::vector<Rec> recs;
  for (int i = 0; i < n; i++) {
    const Loc &l = f->leaves[i];
    if (t[i] > 0 && l.level < f->max_level) {
      for (int c = 0; c < nchild; c++) {
        int cx = c & 1, cy = (c >> 1) & 1, cz = (c >> 2) & 1;
        recs.push_back(Rec{Loc{l.level + 1, (l.lx1 << 1) | cx,
                               (l.lx2 << 1) | cy, (l.lx3 << 1) | cz},
                           1, i, c});
      }
    } else if (t[i] < 0 && derefine_ok.count(i)) {
      Loc p{l.level - 1, l.lx1 >> 1, l.lx2 >> 1, l.lx3 >> 1};
      if (!emitted_coarse.count(p)) {
        emitted_coarse.insert(p);
        recs.push_back(Rec{p, 2, i, 0});
      }
    } else {
      recs.push_back(Rec{l, 0, i, 0});
    }
  }
  std::sort(recs.begin(), recs.end(),
            [](const Rec &a, const Rec &b) { return a.loc < b.loc; });
  for (auto &r : recs) {
    out.push_back(r.loc);
    g_transfer.emplace_back(r.kind, r.old_id, r.octant);
  }
  f->leaves = out;
  return (int32_t)out.size();
}

// fill arrays [n_new] with the transfer map of the last update
void amr_forest_get_transfer(void *h, int32_t *kind, int32_t *old_id,
                             int32_t *octant) {
  (void)h;
  for (size_t i = 0; i < g_transfer.size(); i++) {
    kind[i] = std::get<0>(g_transfer[i]);
    old_id[i] = std::get<1>(g_transfer[i]);
    octant[i] = std::get<2>(g_transfer[i]);
  }
}

}  // extern "C"
