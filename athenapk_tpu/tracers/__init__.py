from .tracers import Tracers  # noqa: F401
