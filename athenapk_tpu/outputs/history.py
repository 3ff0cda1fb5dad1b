"""History (.hst) output: volume-integrated scalar reductions over time.

Mirrors the reference's history machinery (``HistoryOutputVar`` registration
at ``src/hydro/hydro.cpp:422-441`` and Parthenon's ``.hst`` ASCII writer):
a CSV-ish text file with a commented header, one row per history dump.

Default columns match AthenaPK's Hydro package history: time, dt, mass,
1/2/3-mom, KE, total E, (ME, relative divB for MHD).  All reductions run
over INTERIOR cells only (ghosts hold neighbor copies and must not be
counted).

Multi-level (SMR/AMR) meshes write through the same machinery: a column
is either ``(label, fn)`` with ``fn(u, w, mesh) -> scalar`` summed over
level groups (volume-weighted sums are additive), or
``(label, partial_fn, finalize)`` where the tuple partials are summed
across groups before ``finalize`` — used for ratio reductions (relDivB).
"""

from __future__ import annotations

import os
from typing import Callable, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.indices import (IDN, IM1, IM2, IM3, IEN, IB1, IB2, IB3, GLMMHD)


def _interior(q, mesh):
    """Interior view of a [nb, nz, ny, nx] per-variable array."""
    sl = mesh.interior_slices
    return q[tuple([sl[0]] + list(sl[2:]))]


def hydro_history_columns(fluid: str):
    """Standard Hydro history columns; see module docstring for the
    column protocol."""
    cols: List[Tuple] = []

    def vol_sum(q, mesh):
        # f32-state precision strategy (SURVEY §7 hard part 4 / VERDICT
        # r3 item 6): per-block partial sums on device in the state
        # dtype, then an f64 combine over the block axis on the host —
        # keeps f64 accumulation even when x64 is globally off (the TPU
        # fused-kernel path).  Costs one [nblocks] transfer per column
        # per hst dump.  Measured (scripts/precision_table.py, NOTES_r4
        # table): XLA's tree reduction makes the plain f32 volume sum
        # surprisingly safe (~9.7 digits at 2M zones), but the relDivB
        # partials gain ~2.6 digits (4.1 -> 6.7) from the f64 combine;
        # a device-side Kahan scan measured no better (6.9) and adds a
        # sequential dependency chain — rejected.
        parts = np.asarray(jnp.sum(_interior(q, mesh), axis=(1, 2, 3)),
                           dtype=np.float64)
        return float(parts.sum()) * mesh.cell_volume

    cols.append(("mass", lambda u, w, mesh: vol_sum(u[:, IDN], mesh)))
    cols.append(("1-mom", lambda u, w, mesh: vol_sum(u[:, IM1], mesh)))
    cols.append(("2-mom", lambda u, w, mesh: vol_sum(u[:, IM2], mesh)))
    cols.append(("3-mom", lambda u, w, mesh: vol_sum(u[:, IM3], mesh)))
    cols.append(("KE", lambda u, w, mesh: vol_sum(
        0.5 * (u[:, IM1] ** 2 + u[:, IM2] ** 2 + u[:, IM3] ** 2) / u[:, IDN],
        mesh)))
    cols.append(("tot-E", lambda u, w, mesh: vol_sum(u[:, IEN], mesh)))
    if fluid == GLMMHD:
        cols.append(("ME", lambda u, w, mesh: vol_sum(
            0.5 * (u[:, IB1] ** 2 + u[:, IB2] ** 2 + u[:, IB3] ** 2), mesh)))
        cols.append(("relDivB", _rel_divb_partial,
                     lambda p: p[0] / (p[1] + 1e-30)))
    return cols


def _rel_divb_partial(u, w, mesh):
    """(num, den) partials of the volume-averaged relative divB
    (cell-centered central differences; ``HydroHst`` at hydro.cpp:145-208).
    Volume-weighted so mixed-level groups combine correctly (the weight
    cancels on uniform meshes)."""
    from ..solver.hydro_pkg import _AXIS_OF_DIR

    b = [u[:, IB1], u[:, IB2], u[:, IB3]]
    bmag = jnp.sqrt(b[0] ** 2 + b[1] ** 2 + b[2] ** 2)
    divb = jnp.zeros_like(b[0])
    dims = [1] + ([2] if mesh.nx2 > 1 else []) + ([3] if mesh.nx3 > 1 else [])
    for d in dims:
        ax = _AXIS_OF_DIR[d] - 1  # u[:, var] drops the var axis
        divb = divb + (jnp.roll(b[d - 1], -1, axis=ax)
                       - jnp.roll(b[d - 1], 1, axis=ax)) / (2 * mesh.dx[d - 1])
    vol = mesh.cell_volume
    # f64 host combine of per-block partials (see vol_sum)
    num_p = np.asarray(jnp.sum(jnp.abs(_interior(divb, mesh)),
                               axis=(1, 2, 3)), dtype=np.float64)
    den_p = np.asarray(jnp.sum(_interior(bmag, mesh), axis=(1, 2, 3)),
                       dtype=np.float64)
    num = float(num_p.sum()) * mesh.min_dx * vol
    den = float(den_p.sum()) * vol
    return (num, den)


class HistoryOutput:
    def __init__(self, filename: str, fluid: str, dt: float,
                 extra_columns: Sequence = ()):
        self.filename = filename
        self.dt = dt
        self.columns = hydro_history_columns(fluid) + list(extra_columns)
        self.next_time = 0.0
        self._wrote_header = False

    def due(self, t: float) -> bool:
        # dt < 0 (no <output>/dt in the deck) means write every cycle —
        # the historical SMR-driver behavior; reference decks always set
        # dt, so this is a fallback rather than a common path.
        return self.dt < 0.0 or t >= self.next_time

    def _header(self):
        if self._wrote_header:
            return
        os.makedirs(os.path.dirname(self.filename) or ".", exist_ok=True)
        with open(self.filename, "w") as fh:
            fh.write("#  History data\n")
            labels = ["[1]=time", "[2]=dt"] + [
                f"[{i + 3}]={col[0]}" for i, col in
                enumerate(self.columns)]
            fh.write("# " + "  ".join(labels) + "\n")
        self._wrote_header = True

    def write(self, t, dt, u, w, mesh):
        self.write_groups(t, dt, [(u, w, mesh)])

    def write_groups(self, t, dt, groups):
        """Write one row from per-level groups [(u, w, mesh_like), ...].

        ``mesh_like`` needs cell_volume / interior_slices / dx / min_dx /
        nx2 / nx3.  Plain columns are summed across groups; partial
        columns sum their tuples before finalize."""
        self._header()
        vals = []
        for col in self.columns:
            fn = col[1]
            parts = [fn(u, w, m) for (u, w, m) in groups]
            if len(col) == 3:
                summed = tuple(sum(p[i] for p in parts)
                               for i in range(len(parts[0])))
                vals.append(float(col[2](summed)))
            else:
                vals.append(float(sum(parts)))
        with open(self.filename, "a") as fh:
            row = [f"{float(t):.14e}", f"{float(dt):.14e}"] + [
                f"{v:.14e}" for v in vals]
            fh.write("  ".join(row) + "\n")
        while self.dt > 0.0 and self.next_time <= t:
            self.next_time += self.dt
