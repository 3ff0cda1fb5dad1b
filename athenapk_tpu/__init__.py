"""athenapk_tpu: a TPU-native block-structured (magneto)hydrodynamics framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of AthenaPK
(parthenon-hpc-lab/athenapk): finite-volume Godunov hydro + GLM-MHD with
DC/PLM/PPM/WENO3/LimO3/WENOZ reconstruction, LLF/HLLE/HLLC/HLLD Riemann
solvers, RK1/RK2/RK3/VL2 integrators, diffusion, cooling, turbulence
driving, tracers, and static/adaptive mesh refinement -- designed TPU-first:

* State is a pytree of block-batched arrays ``[nblocks, nvar, nz, ny, nx]``.
* One jit-compiled ``step`` per (fluid, reconstruction, riemann, integrator)
  combination (the reference's compile-time template product, AthenaPK
  ``src/hydro/hydro.cpp:380-420``, becomes Python closure specialization).
* Distribution is ``shard_map`` over the block axis of a ``jax.sharding.Mesh``
  with halo exchange as ICI collectives (the reference's MPI ghost-zone
  machinery, ``src/hydro/hydro_driver.cpp:506-567``).

Precision: simulations default to float64 (enabled lazily below); the
reference uses double throughout and its convergence gates (~1e-8 L1)
require it.
"""

import os as _os

import jax as _jax

# f64 is required for the convergence-grade numerics (reference uses
# Real=double everywhere). Enable before any arrays are created.
# ATHENAPK_DISABLE_X64=1 opts out for pure-f32 production runs: Mosaic
# (Pallas) lowering emits 64-bit index types when x64 is globally on and
# its layout pass rejects them, so the fused lane-sweep kernels require
# this knob.
if _os.environ.get("ATHENAPK_DISABLE_X64") != "1":
    _jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from .config.parameter_input import ParameterInput  # noqa: E402,F401
