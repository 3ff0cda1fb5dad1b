from .history import HistoryOutput  # noqa: F401
from .hdf5 import write_phdf  # noqa: F401
