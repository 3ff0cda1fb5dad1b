"""Galaxy-cluster application package (reference ``src/pgen/cluster.cpp`` +
``src/pgen/cluster/``): NFW/BCG/SMBH gravity, ACCEPT entropy profile,
hydrostatic-equilibrium initialization, AGN feedback/triggering, magnetic
tower, SN Ia + stellar feedback, cluster clips."""

from .pgen import (problem_generator, init_user_mesh_data,  # noqa: F401
                   problem_source_unsplit, register_defaults,
                   problem_source_first_order,
                   problem_source_first_order_smr,
                   estimate_timestep, estimate_timestep_smr,
                   estimate_timestep_factory,
                   problem_generator_smr, problem_source_unsplit_smr,
                   history_columns)
from .gravity import ClusterGravity  # noqa: F401
from .entropy_profiles import ACCEPTEntropyProfile  # noqa: F401
from .hse import HydrostaticEquilibriumSphere  # noqa: F401
