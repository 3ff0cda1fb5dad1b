"""Sod shock tube problem generator (reference ``src/pgen/sod.cpp``)."""

from __future__ import annotations

import numpy as np

from ..core.indices import IDN, IV1, IPR
from ..eos.adiabatic import prim_to_cons


def problem_generator(pin, mesh, cfg, eos):
    p = "problem/sod"
    rho_l = pin.get_or_add_real(p, "rho_l", 1.0)
    pres_l = pin.get_or_add_real(p, "pres_l", 1.0)
    u_l = pin.get_or_add_real(p, "u_l", 0.0)
    rho_r = pin.get_or_add_real(p, "rho_r", 0.125)
    pres_r = pin.get_or_add_real(p, "pres_r", 0.1)
    u_r = pin.get_or_add_real(p, "u_r", 0.0)
    x_discont = pin.get_or_add_real(p, "x_discont", 0.5)

    x, _, _ = mesh.cell_centers_mesh()
    left = x < x_discont
    prim = np.zeros((mesh.nblocks, cfg.nvar) + mesh.block_shape)
    prim[:, IDN] = np.where(left, rho_l, rho_r)
    prim[:, IV1] = np.where(left, u_l, u_r)
    prim[:, IPR] = np.where(left, pres_l, pres_r)
    return np.asarray(prim_to_cons(eos, prim, cfg.fluid, cfg.nscalars))
