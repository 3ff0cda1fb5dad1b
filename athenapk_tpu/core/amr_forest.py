"""ctypes bindings for the native AMR forest manager (native/amr_forest.cc).

The host-side block-table logic (the reference keeps this in Parthenon's
C++ forest-of-trees mesh): leaf bookkeeping, 2:1-balanced refinement /
sibling-complete derefinement, and the old->new transfer map that drives
the device-side prolongation/restriction (``athenapk_tpu.refinement``).

Builds the shared library on first use (g++, no external deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libamr_forest.so")

_lib = None

COPY, PROLONG, RESTRICT = 0, 1, 2


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_NATIVE_DIR, "amr_forest.cc"))):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.amr_forest_create.restype = ctypes.c_void_p
    lib.amr_forest_create.argtypes = [ctypes.c_int32] * 8
    lib.amr_forest_destroy.argtypes = [ctypes.c_void_p]
    lib.amr_forest_num_leaves.restype = ctypes.c_int32
    lib.amr_forest_num_leaves.argtypes = [ctypes.c_void_p]
    i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
    lib.amr_forest_get_leaves.argtypes = [ctypes.c_void_p] + [i32p] * 4
    lib.amr_forest_update.restype = ctypes.c_int32
    lib.amr_forest_update.argtypes = [ctypes.c_void_p, i32p]
    lib.amr_forest_get_transfer.argtypes = [ctypes.c_void_p] + [i32p] * 3
    _lib = lib
    return lib


class AmrForest:
    """Leaf-block table with 2:1-balanced refine/derefine updates."""

    def __init__(self, nroot1, nroot2, nroot3, ndim=3, max_level=10,
                 periodic=(True, True, True)):
        lib = _load()
        self._h = lib.amr_forest_create(
            nroot1, nroot2, nroot3, ndim, max_level,
            int(periodic[0]), int(periodic[1]), int(periodic[2]))
        self._lib = lib

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.amr_forest_destroy(self._h)
            self._h = None

    @property
    def num_leaves(self) -> int:
        return int(self._lib.amr_forest_num_leaves(self._h))

    def leaves(self):
        """-> (levels, lx1, lx2, lx3) int32 arrays [n]."""
        n = self.num_leaves
        levels = np.empty(n, np.int32)
        lx1 = np.empty(n, np.int32)
        lx2 = np.empty(n, np.int32)
        lx3 = np.empty(n, np.int32)
        self._lib.amr_forest_get_leaves(self._h, levels, lx1, lx2, lx3)
        return levels, lx1, lx2, lx3

    def update(self, tags):
        """Apply AMR tags; -> (kind, old_id, octant) transfer arrays
        [n_new] with kind in {COPY, PROLONG, RESTRICT}."""
        tags = np.ascontiguousarray(tags, np.int32)
        assert tags.size == self.num_leaves
        n_new = int(self._lib.amr_forest_update(self._h, tags))
        kind = np.empty(n_new, np.int32)
        old_id = np.empty(n_new, np.int32)
        octant = np.empty(n_new, np.int32)
        self._lib.amr_forest_get_transfer(self._h, kind, old_id, octant)
        return kind, old_id, octant
