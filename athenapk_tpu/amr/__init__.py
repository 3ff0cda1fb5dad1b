from .smr import SmrMesh, SmrState  # noqa: F401
from .smr_hydro import SmrHydro  # noqa: F401
