"""Problem generator registry.

The reference dispatches pgen callbacks by ``<job> problem_id``
(``src/main.cpp:60-123``); here each problem is a module exposing
``problem_generator(pin, mesh, cfg, eos) -> cons`` plus optional hooks:

  * ``user_work_after_loop(pin, mesh, cfg, eos, sim)`` — e.g. error norms
  * ``problem_source_unsplit/strang`` — source-term closures
  * ``estimate_timestep`` — extra dt constraint
"""

from importlib import import_module

_PGEN_MODULES = {
    "sod": "athenapk_tpu.pgen.sod",
    "linear_wave": "athenapk_tpu.pgen.linear_wave",
    "linear_wave_mhd": "athenapk_tpu.pgen.linear_wave_mhd",
    "cpaw": "athenapk_tpu.pgen.cpaw",
    "orszag_tang": "athenapk_tpu.pgen.orszag_tang",
    "blast": "athenapk_tpu.pgen.blast",
    "advection": "athenapk_tpu.pgen.advection",
    "kh": "athenapk_tpu.pgen.kh",
    "field_loop": "athenapk_tpu.pgen.field_loop",
    "lw_implode": "athenapk_tpu.pgen.lw_implode",
    "diffusion": "athenapk_tpu.pgen.diffusion",
    "rand_blast": "athenapk_tpu.pgen.rand_blast",
    "turbulence": "athenapk_tpu.pgen.turbulence",
    "cloud": "athenapk_tpu.pgen.cloud",
    "cluster": "athenapk_tpu.pgen.cluster",
}


def get_pgen(problem_id: str):
    if problem_id not in _PGEN_MODULES:
        raise ValueError(f"unknown problem_id '{problem_id}'")
    return import_module(_PGEN_MODULES[problem_id])
